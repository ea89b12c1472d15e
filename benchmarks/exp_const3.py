"""Probe: fused_cg_const_planes with operands as jit ARGUMENTS (the
zero-arg-jit closure constants were what killed the N=1024 remote
compile -- 8 MB of baked HLO constants, code_len ~30 MB).  Measures
N=512 and N=1024 against the XLA streaming path.
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
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    from tpcg.ops.fused_cg_const import prepare_const, fused_cg_const_planes
    from tpcg.problems import helm_fe, plane_wave_rhs

    iters = 2000
    for N in (512, 1024):
        k = 12.0
        A = helm_fe(N, k, eps=k)
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        n = N * N
        bg = plane_wave_rhs(N, k)
        flops = iters * (8 * nnz + 5 * 8 * n)
        stream_bytes = (3 * 9 * n + 2 * 8 * n) * 4

        P = make_pair_operator(A, dtype=jnp.float32)
        b2 = jnp.asarray(np.stack([bg.real, bg.imag])
                         .reshape(2, n)[:, :, None].astype(np.float32))
        fs = jax.jit(lambda b: block_cg_planes(
            P, b, n_iterations=iters).residual_history)
        hist_s = np.asarray(fs(b2))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fs(b2))
            ts.append(time.perf_counter() - t0)
        dts = min(ts)
        print(f"N={N} stream: {dts*1e3:8.2f} ms  "
              f"{flops/dts/1e9:7.1f} GFLOPS  "
              f"{iters*stream_bytes/dts/1e9:6.1f} GB/s", flush=True)

        cr, ci, s4 = prepare_const(A)
        bp = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag])[:, None].astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        s4 = jax.device_put(s4)
        try:
            fc = jax.jit(lambda s4, bp, x0p: fused_cg_const_planes(
                A.offsets, A.grid, cr, ci, s4, bp, x0p, iters)[1])
            hist_c = np.asarray(fc(s4, bp, x0p))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fc(s4, bp, x0p))
                ts.append(time.perf_counter() - t0)
            dtc = min(ts)
            rel = (np.abs(hist_c[:, 0] - hist_s[:, 0]).max()
                   / hist_s[0, 0])
            print(f"N={N} const : {dtc*1e3:8.2f} ms  "
                  f"{flops/dtc/1e9:7.1f} GFLOPS  "
                  f"{iters*stream_bytes/dtc/1e9:6.1f} GB/s-eff  "
                  f"hist-rel-dev {rel:.2e}", flush=True)
        except Exception as e:
            print(f"N={N} const FAILED: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
