"""Batched vs sequential multi-RHS streaming CG (VERDICT r2 item 1).

Measures, at N in {1024, 2048} and b in {2, 4, 8}:
  * sequential: the planner's current per-RHS host loop over the
    single-RHS streaming kernel (b separate device solves), and
  * batched: the (G, nb)-grid kernels where the coefficient planes (and
    const-tap strips) are fetched once per row block for the whole batch,
for both the variable-coefficient and constant-tap paths, with a
history-parity gate per RHS against the single-RHS kernel.

    timeout 3600 python -u benchmarks/exp_batchstream.py [--const]
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
        prepare_stream, prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched, stream_cg_const_planes,
        stream_cg_const_planes_batched)
    from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs

    do_const = "--const" in sys.argv
    iters = 500
    for N in (1024, 2048):
        k = 40.0
        if do_const:
            A = helm_fe(N, k, eps=k)
            taps, strips2 = prepare_stream(A)
            op_arg = strips2
            single = lambda bp1, x01: stream_cg_const_planes(
                A.offsets, A.grid, taps, strips2, bp1, x01, iters)
            batched = lambda bp, x0p: stream_cg_const_planes_batched(
                A.offsets, A.grid, taps, strips2, bp, x0p, iters)
            label = "const"
        else:
            rng = np.random.default_rng(0)
            C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
            A = helm_fe_var(N, k, C, rho=0.1)
            coefp = jax.device_put(prepare_stream_coef(A))
            single = lambda bp1, x01: stream_cg_coef_planes(
                A.offsets, A.grid, coefp, bp1, x01, iters)
            batched = lambda bp, x0p: stream_cg_coef_planes_batched(
                A.offsets, A.grid, coefp, bp, x0p, iters)
            label = "coef"

        bg = plane_wave_rhs(N, k)
        noff = len(A.offsets)
        n = N * N

        single_j = jax.jit(single)
        # per-RHS sequential timing (one RHS; multiply by b)
        bp1 = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        x01 = jnp.zeros_like(bp1)
        h1 = np.asarray(single_j(bp1, x01)[1])
        assert np.all(np.isfinite(h1)), h1
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(single_j(bp1, x01)[1][-1])
            ts.append(time.perf_counter() - t0)
        t_seq1 = min(ts)
        print(f"N={N} {label} single-RHS: {t_seq1 / iters * 1e6:8.1f} "
              f"us/it", flush=True)

        for nb in (2, 4, 8):
            B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
            bp = jax.device_put(jnp.asarray(
                np.stack([B.real, B.imag]).astype(np.float32)))
            x0p = jnp.zeros_like(bp)
            batched_j = jax.jit(batched)
            hb = np.asarray(batched_j(bp, x0p)[1])
            # parity gate: RHS 0 of the batch vs the single-RHS kernel
            rel = np.abs(hb[:, 0] - h1) / (np.abs(h1) + 1e-30)
            ok = np.all(np.isfinite(hb)) and rel.max() < 1e-2
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(batched_j(bp, x0p)[1][-1])
                ts.append(time.perf_counter() - t0)
            t_b = min(ts)
            planes_per_rhs = 10 + (0 if do_const else 2 * noff) / nb
            gbs = iters * nb * planes_per_rhs * n * 4 / t_b / 1e9
            print(f"N={N} {label} b={nb}: batched "
                  f"{t_b / iters * 1e6:8.1f} us/it "
                  f"({t_b / iters / nb * 1e6:7.1f} us/it/rhs, "
                  f"{gbs:6.0f} GB/s moved) vs sequential "
                  f"{nb * t_seq1 / iters * 1e6:8.1f} us/it -> "
                  f"{nb * t_seq1 / t_b:5.2f}x  parity "
                  f"{'OK' if ok else 'FAIL ' + str(rel.max())}",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
