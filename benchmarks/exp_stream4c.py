"""Chained-timing (true device time) for the v4 resident kernels.

The 1000-iteration single-readback probes (exp_stream4*.py) each pay
one ~28 ms tunnel round-trip, inflating per-iteration time by ~28 us.
Here R solves chain in ONE device program (1e-30 perturbation so XLA
cannot CSE the repeats, like bench.py) with one readback, giving the
true device us/it for the headline table.

    timeout 3000 python -u benchmarks/exp_stream4c.py > /tmp/s4c.log 2>&1
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
    from tpcg.ops.auto import _v4_config, _v4_real_config, _v4_sym_config
    from tpcg.ops.stream_cg import prepare_stream, prepare_stream_coef
    from tpcg.ops.stream_cg_v4 import (stream_cg_v4_coef_planes,
                                       stream_cg_v4_const_planes)
    from tpcg.ops.stream_cg_v4_sym import (prepare_stream_sym,
                                           stream_cg_v4_sym_planes)
    from tpcg.ops import stream_cg_real as sr
    from tpcg.ops import stream_cg_v4_real as sr4
    from tpcg.problems import (helm_fe, helm_fe_var, plane_wave_rhs,
                               poisson)

    R = 4

    def chain(solver, bp, x0p):
        def body(x0c, _):
            x, hist = solver(bp, x0c)
            x0n = x0c + (1e-30 * hist[-1]).astype(x0c.dtype)
            return x0n, hist[-1]
        return jax.jit(lambda b_, x_: lax.scan(
            lambda c, _: body(c, None), x_, None, length=R)[1])

    def timeit(name, solver, bp, x0p, iters, flops):
        fn = chain(solver, bp, x0p)
        try:
            h = np.asarray(fn(bp, x0p))
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return
        assert np.all(np.isfinite(h)), (name, h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(bp, x0p))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (R * iters)
        print(f"{name}: {dt * 1e6:7.1f} us/it  "
              f"{flops / dt / 1e9:7.1f} GFLOPS (chained x{R})",
              flush=True)

    for N in (768, 1024, 1536, 2048):
        iters, k = 1000, 40.0
        A = helm_fe(N, k, eps=k)
        b = plane_wave_rhs(N, k)
        taps, strips2 = prepare_stream(A)
        bp = jax.device_put(jnp.asarray(
            np.stack([b.real, b.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        flops = 8 * nnz + 40 * n
        kq, bv = _v4_config(N, N, coef=False)
        timeit(f"N={N} const v4 kq={int(kq)} Bv={bv:<3}",
               lambda b_, x_, kq=kq, bv=bv: stream_cg_v4_const_planes(
                   A.offsets, A.grid, taps, strips2, b_, x_, iters,
                   keep_q=kq, q_hbm=not kq, block_rows=bv),
               bp, x0p, iters, flops)
        rng = np.random.default_rng(0)
        C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
        Av = helm_fe_var(N, k, C, rho=0.1)
        half, cpl = prepare_stream_sym(Av)
        cpl = jax.device_put(cpl)
        scfg = _v4_sym_config(N, N)
        if scfg is not None:
            kq, bv = scfg
            timeit(f"N={N} sym   v4 kq={int(kq)} Bv={bv:<3}",
                   lambda b_, x_, kq=kq, bv=bv: stream_cg_v4_sym_planes(
                       Av.offsets, Av.grid, half, cpl, b_, x_, iters,
                       keep_q=kq, q_hbm=not kq, block_rows=bv),
                   bp, x0p, iters, flops)

    for N in (1024, 2048, 2896):
        iters = 1000 if N <= 2048 else 500
        Ar = poisson(N, dtype=np.float64)
        rb = jax.device_put(jnp.asarray(
            np.random.default_rng(0).standard_normal((N, N))
            .astype(np.float32)))
        rx0 = jnp.zeros_like(rb)
        rtaps, rstrips = sr.prepare_stream_real(Ar)
        rstrips = jax.device_put(rstrips)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(Ar.coef)))
        kq, bv = _v4_real_config(N, N)
        timeit(f"N={N} real  v4 kq={int(kq)} Bv={bv:<3}",
               lambda b_, x_, kq=kq, bv=bv: sr4.stream_cg_v4_real_planes(
                   Ar.offsets, Ar.grid, rtaps, rstrips, b_, x_, iters,
                   keep_q=kq, block_rows=bv), rb, rx0, iters,
               2 * nnz + 10 * n)


if __name__ == "__main__":
    sys.exit(main())
