"""Probe: MXU (banded lane-matmul) fused CG vs the VPU fused kernel.

The headline bench (N=128 helm_fem, 5000 it) is latency-bound on serial
VPU work; this measures whether moving the stencil apply onto the MXU
(tpcg/ops/fused_cg_mxu.py) buys iteration time.  Run on the real TPU:

    timeout 1800 python -u benchmarks/exp_mxu.py

Prints per-config us/it + GFLOPS, with a 100-iteration history-parity
check against the independent XLA streaming program first.
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
    from tpcg.ops import block_cg_planes, make_pair_operator
    from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
    from tpcg.ops.fused_cg_mxu import fused_cg_stencil_mxu, prepare_mxu
    from tpcg.problems import helm_fe, plane_wave_rhs

    for N in (128, 256):
        k = 12.0
        iters = 5000 if N == 128 else 2000
        S = helm_fe(N, k, eps=k)
        nnz = int(np.count_nonzero(np.asarray(S.coef)))
        n = N * N
        bg = plane_wave_rhs(N, k)
        b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                        .astype(np.float32))
        x0 = jnp.zeros_like(b)

        coef3 = prepare_coef3(S)
        H, strips3, _ = prepare_mxu(S)

        gate = 100
        Pp = make_pair_operator(S, dtype=jnp.float32)
        b_flat = b.reshape(2, n, 1)

        @jax.jit
        def xla_hist(Pp, b_flat):
            return block_cg_planes(Pp, b_flat,
                                   n_iterations=gate).residual_history

        @jax.jit
        def mxu_hist(H, sb3, st3, b, x0):
            return fused_cg_stencil_mxu(S.offsets, (N, N), H,
                                        (sb3, st3), b, x0, gate)[1]

        hx = np.asarray(xla_hist(Pp, b_flat))[:, 0]
        hm = np.asarray(mxu_hist(H, strips3[0], strips3[1], b, x0))[:, 0]
        rel = np.abs(hm - hx) / (np.abs(hx) + 1e-30)
        print(f"N={N} parity mxu-vs-xla max rel {rel.max():.2e}",
              flush=True)
        if not (np.all(np.isfinite(hm)) and rel.max() < 1e-2):
            print("PARITY FAIL -- skipping timing", flush=True)
            continue

        @jax.jit
        def run_vpu(coef3, b, x0):
            return fused_cg_stencil(S.offsets, coef3, b, x0, iters)[1][-1]

        @jax.jit
        def run_mxu(H, sb3, st3, b, x0):
            return fused_cg_stencil_mxu(S.offsets, (N, N), H,
                                        (sb3, st3), b, x0, iters)[1][-1]

        flops_it = 8 * nnz + 2 * 8 * n + 3 * 8 * n
        for name, fn, args in [
            ("vpu", run_vpu, (coef3, b, x0)),
            ("mxu", run_mxu, (H, strips3[0], strips3[1], b, x0)),
        ]:
            r = np.asarray(fn(*args))     # warmup/compile + residency
            assert np.all(np.isfinite(r)), (name, r)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"N={N} {name}: {dt / iters * 1e6:8.2f} us/it  "
                  f"{iters * flops_it / dt / 1e9:8.1f} GFLOPS",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
