"""Fat-block batched streaming (all RHS per grid step) vs the
per-RHS-step batched kernel and the sequential loop.

Uses a CONVERGING diffusion-dominated configuration (k=8, rho=0.5) so
the history-parity column is meaningful: on the k=40 indefinite
Helmholtz the f32 solve diverges (true relative residual > 30 for
every path) and reduction-order noise amplifies chaotically, so
history parity there says nothing about kernel correctness
(benchmarks/exp_batchdiv.py is the evidence probe).

    timeout 3000 python -u benchmarks/exp_batchfat.py > /tmp/bf.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (
        prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched, stream_cg_coef_planes_batched_fat)
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    iters = 500
    for N in (1024, 2048):
        k = 8.0
        rng = np.random.default_rng(0)
        C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
        A = helm_fe_var(N, k, C, rho=0.5)
        noff = len(A.offsets)
        n = N * N
        coefp = jax.device_put(prepare_stream_coef(A))
        bg = plane_wave_rhs(N, k)

        single_j = jax.jit(lambda b_, x_: stream_cg_coef_planes(
            A.offsets, A.grid, coefp, b_, x_, iters))
        bp1 = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        x01 = jnp.zeros_like(bp1)
        h1 = np.asarray(single_j(bp1, x01)[1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(single_j(bp1, x01)[1][-1])
            ts.append(time.perf_counter() - t0)
        t_seq1 = min(ts)
        print(f"N={N} single-RHS: {t_seq1 / iters * 1e6:8.1f} us/it",
              flush=True)

        for nb in (2, 4, 8):
            B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
            bp = jax.device_put(jnp.asarray(
                np.stack([B.real, B.imag]).astype(np.float32)))
            x0p = jnp.zeros_like(bp)
            for name, maker in [
                ("perRHS-step", lambda b_, x_:
                 stream_cg_coef_planes_batched(
                     A.offsets, A.grid, coefp, b_, x_, iters)),
                ("fat-Bv32", lambda b_, x_:
                 stream_cg_coef_planes_batched_fat(
                     A.offsets, A.grid, coefp, b_, x_, iters,
                     block_rows=32)),
                ("fat-Bv64", lambda b_, x_:
                 stream_cg_coef_planes_batched_fat(
                     A.offsets, A.grid, coefp, b_, x_, iters,
                     block_rows=64)),
                ("fat-Bv128", lambda b_, x_:
                 stream_cg_coef_planes_batched_fat(
                     A.offsets, A.grid, coefp, b_, x_, iters,
                     block_rows=128)),
            ]:
                fn = jax.jit(maker)
                try:
                    hb = np.asarray(fn(bp, x0p)[1])
                except Exception as e:
                    print(f"N={N} b={nb} {name}: FAILED "
                          f"{str(e)[:120]}", flush=True)
                    continue
                # gate the first 100 iterations: reduction-order noise
                # (seeded ~1e-6 by the differently-fused delta0 glue)
                # grows chaotically with iteration count, so late-history
                # parity between correct paths is meaningless -- see
                # exp_batchdiv.py / exp_batchdiv2.py (end-of-solve true
                # residuals match)
                rel = np.abs(hb[:, 0] - h1) / (np.abs(h1) + 1e-30)
                ok = np.all(np.isfinite(hb)) and rel[:100].max() < 1e-2
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(fn(bp, x0p)[1][-1])
                    ts.append(time.perf_counter() - t0)
                t_b = min(ts)
                planes = (20 + 2 * noff / nb)
                gbs = iters * nb * planes * n * 4 / t_b / 1e9
                print(f"N={N} b={nb} {name}: {t_b / iters * 1e6:8.1f} "
                      f"us/it ({t_b / iters / nb * 1e6:7.1f} /rhs, "
                      f"{gbs:5.0f} GB/s model) vs seq "
                      f"{nb * t_seq1 / iters * 1e6:8.1f} -> "
                      f"{nb * t_seq1 / t_b:5.2f}x  parity "
                      f"{'OK' if ok else 'FAIL %.3g' % rel.max()}",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
