"""Chained-timing + HW parity for the v5 panel-round-trip kernels.

The v5 tier covers constant-tap complex grids beyond the v4 resident
budget (N > 2048): tier A keeps the direction field in VMEM scratch
and round-trips x/r panels through HBM with explicit DMA (10 state
planes/iteration); tier B round-trips everything (16 planes).  This
probe measures true device time (R solves chained in one program, one
readback -- the bench.py methodology) against the v2 two-kernel
pipeline that previously served these sizes (410-482 GFLOPS at
N=2896/4096, NOTES_R3 envelope), and pins HW bit-parity vs v2 at
matched block rows.

    timeout 3000 python -u benchmarks/exp_stream5.py > /tmp/s5.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.ops.auto import _v5_config, _v5_real_config
    from tpcg.ops.stream_cg import (prepare_stream,
                                    stream_cg_const_planes)
    from tpcg.ops.stream_cg_v5 import stream_cg_v5_const_planes
    from tpcg.ops import stream_cg_real as sr
    from tpcg.ops.stream_cg_v5_real import stream_cg_v5_real_planes
    from tpcg.problems import helm_fe, plane_wave_rhs, poisson

    R = 4

    def chain(solver):
        def body(x0c, _):
            x, hist = solver(x0c)
            x0n = x0c + (1e-30 * hist[-1]).astype(x0c.dtype)
            return x0n, hist[-1]
        return jax.jit(lambda x_: lax.scan(
            lambda c, _: body(c, None), x_, None, length=R)[1])

    def timeit(name, solver, x0p, iters, flops):
        fn = chain(solver)
        try:
            h = np.asarray(fn(x0p))
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return
        assert np.all(np.isfinite(h)), (name, h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x0p))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (R * iters)
        print(f"{name}: {dt * 1e6:7.1f} us/it  "
              f"{flops / dt / 1e9:7.1f} GFLOPS (chained x{R})",
              flush=True)

    # ---- HW bit-parity vs v2 at matched Bv (N=2560, both tiers) ------
    N, k, piters = 2560, 40.0, 120
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    strips2 = jax.device_put(strips2)
    bp = jax.device_put(jnp.asarray(
        np.stack([b.real, b.imag]).astype(np.float32)))
    x0p = jnp.zeros_like(bp)
    Bv = 128
    h2 = np.asarray(jax.jit(
        lambda b_, x_: stream_cg_const_planes(
            A.offsets, A.grid, taps, strips2, b_, x_, piters,
            block_rows=Bv)[1])(bp, x0p))
    for dres in (True, False):
        for qx in (False, True):
            h5 = np.asarray(jax.jit(
                lambda b_, x_, dres=dres, qx=qx:
                stream_cg_v5_const_planes(
                    A.offsets, A.grid, taps, strips2, b_, x_, piters,
                    d_resident=dres, qx=qx, block_rows=Bv)[1])(bp, x0p))
            rel = np.max(np.abs(h5 - h2) / (np.abs(h2) + 1e-30))
            print(f"N={N} v5 dres={int(dres)} qx={int(qx)} vs v2 "
                  f"Bv={Bv} ({piters} it): max rel {rel:.2e}",
                  flush=True)

    # ---- chained timing ----------------------------------------------
    for N, iters in ((2560, 1000), (3072, 500), (4096, 500)):
        A = helm_fe(N, k, eps=k)
        b = plane_wave_rhs(N, k)
        taps, strips2 = prepare_stream(A)
        strips2 = jax.device_put(strips2)
        bp = jax.device_put(jnp.asarray(
            np.stack([b.real, b.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        flops = 8 * nnz + 40 * n
        cfg = _v5_config(N, N)
        assert cfg is not None, N
        dres, bv = cfg
        for bvc in sorted({bv, 64}, reverse=True):
            for qx in (False, True):
                timeit(f"N={N} const v5 dres={int(dres)} qx={int(qx)} "
                       f"Bv={bvc:<3}",
                       lambda x_, d=dres, b_=bvc, q=qx:
                       stream_cg_v5_const_planes(
                           A.offsets, A.grid, taps, strips2, bp, x_,
                           iters, d_resident=d, qx=q, block_rows=b_),
                       x0p, iters, flops)

    # ---- REAL v5 (previously v2-real at ~180 GFLOPS beyond v4) -------
    for N, iters in ((3072, 1000), (4096, 500)):
        Ar = poisson(N, dtype=np.float64)
        rb = jax.device_put(jnp.asarray(
            np.random.default_rng(0).standard_normal((N, N))
            .astype(np.float32)))
        rx0 = jnp.zeros_like(rb)
        rtaps, rstrips = sr.prepare_stream_real(Ar)
        rstrips = jax.device_put(rstrips)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(Ar.coef)))
        rflops = 2 * nnz + 10 * n
        cfg = _v5_real_config(N, N)
        assert cfg is not None, N
        dres, bv = cfg
        for qx in (False, True):
            timeit(f"N={N} real  v5 dres={int(dres)} qx={int(qx)} "
                   f"Bv={bv:<3}",
                   lambda x_, d=dres, q=qx, b_=bv:
                   stream_cg_v5_real_planes(
                       Ar.offsets, Ar.grid, rtaps, rstrips, rb, x_,
                       iters, d_resident=d, qx=q, block_rows=b_),
                   rx0, iters, rflops)
        timeit(f"N={N} real  v2 (old path)    ",
               lambda x_: sr.stream_cg_real_planes(
                   Ar.offsets, Ar.grid, rtaps, rstrips, rb, x_, iters),
               rx0, iters, rflops)


if __name__ == "__main__":
    sys.exit(main())
