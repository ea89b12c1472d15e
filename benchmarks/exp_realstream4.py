"""Probe: VMEM-resident REAL streaming CG (stream_cg_v4_real) vs the
v2 real streaming kernel and the XLA DIA path, N=1024/2048/2896
(Poisson 5-point).  Decides the planner's real-path crossovers.

    timeout 3000 python -u benchmarks/exp_realstream4.py > /tmp/rs4.log 2>&1
"""
import os
import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(f, *args):
    np.asarray(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import tpcg.ops.stream_cg_real as sr
    import tpcg.ops.stream_cg_v4_real as sr4
    from tpcg import block_cg
    from tpcg.problems.poisson import poisson

    for N, iters in ((1024, 1000), (2048, 1000), (2896, 500)):
        A = poisson(N, dtype=np.float64)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        rng = np.random.default_rng(0)
        b = rng.standard_normal((N, N)).astype(np.float32)
        bp = jax.device_put(jnp.asarray(b))
        x0p = jnp.zeros_like(bp)
        flops = 2 * nnz + 10 * n
        taps, strips2 = sr.prepare_stream_real(A)
        strips2 = jax.device_put(strips2)
        keep_q = sr4._fits_keep_q(N, N)

        # XLA DIA comparator
        try:
            A32 = dataclasses.replace(A, coef=jnp.asarray(
                np.asarray(A.coef).astype(np.float32)))
            A32 = jax.device_put(A32)
            bf = jax.device_put(jnp.asarray(b.reshape(-1)))
            fx = jax.jit(lambda M, b_: block_cg(M, b_, n_iterations=iters)
                         .residual_history[-1])
            dtx = bench(fx, A32, bf)
            print(f"N={N} xla-dia      : {dtx/iters*1e6:7.1f} us/it "
                  f"{flops/(dtx/iters)/1e9:7.1f} GFLOPS", flush=True)
        except Exception as ex:
            print(f"N={N} xla-dia: FAILED {type(ex).__name__}", flush=True)

        cases = [("real v2      ",
                  jax.jit(lambda b_, x_: sr.stream_cg_real_planes(
                      A.offsets, A.grid, taps, strips2, b_, x_, iters)))]
        for bv in (64, 128, 256):
            if N % bv or N // bv < 2:
                continue
            cases.append((
                f"real v4 Bv={bv:<4}",
                jax.jit(lambda b_, x_, bv=bv: sr4.stream_cg_v4_real_planes(
                    A.offsets, A.grid, taps, strips2, b_, x_, iters,
                    block_rows=bv, keep_q=keep_q))))
        if N == 2896:  # only _pick_block_rows divisors work
            cases.append((
                "real v4 Bv=16  ",
                jax.jit(lambda b_, x_: sr4.stream_cg_v4_real_planes(
                    A.offsets, A.grid, taps, strips2, b_, x_, iters,
                    block_rows=16, keep_q=keep_q))))
        hists = {}
        for name, fn in cases:
            try:
                h = np.asarray(fn(bp, x0p)[1])
            except Exception as ex:
                print(f"N={N} {name}: FAILED {type(ex).__name__}: "
                      f"{str(ex)[:160]}", flush=True)
                continue
            assert np.all(np.isfinite(h)), (name, h[-5:])
            hists[name] = h
            dt = bench(lambda b_, x_: fn(b_, x_)[1][-1], bp, x0p) / iters
            print(f"N={N} {name}: {dt*1e6:7.1f} us/it "
                  f"{flops/dt/1e9:7.1f} GFLOPS (keep_q={keep_q})",
                  flush=True)
        base = "real v2      "
        for name in hists:
            if name != base and base in hists:
                rel = (np.abs(hists[name] - hists[base])
                       / (np.abs(hists[base]) + 1e-30))
                print(f"N={N} parity {name.strip()} vs v2: "
                      f"max rel {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
