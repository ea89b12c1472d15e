"""Probe: HBM-streaming fused CG (tpcg/ops/stream_cg.py) vs the XLA
streaming path at large N.  Reports real-traffic roofline fraction
(the kernel moves 20 f32 planes = 80 bytes/complex-unknown/iteration)
and the effective bandwidth under the XLA cost model (172 B/unknown:
27 coefficient planes + 16 state planes)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_GBS = 820.0   # v5e


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    from tpcg.ops.stream_cg import prepare_stream, stream_cg_const_planes
    from tpcg.problems import helm_fe, plane_wave_rhs

    for N, iters in ((512, 2000), (1024, 2000), (2048, 1000)):
        k = 12.0
        A = helm_fe(N, k, eps=k)
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        n = N * N
        bg = plane_wave_rhs(N, k)
        flops = iters * (8 * nnz + 5 * 8 * n)
        model_bytes = (3 * 9 * n + 2 * 8 * n) * 4     # XLA path, per iter
        real_bytes = 20 * n * 4                       # stream kernel

        P = make_pair_operator(A, dtype=jnp.float32)
        b2 = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag])
            .reshape(2, n)[:, :, None].astype(np.float32)))
        if N <= 1024:
            fs = jax.jit(lambda b: block_cg_planes(
                P, b, n_iterations=iters).residual_history)
            hist_s = np.asarray(fs(b2))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fs(b2))
                ts.append(time.perf_counter() - t0)
            dts = min(ts)
            print(f"N={N} xla-stream: {dts*1e3:8.2f} ms  "
                  f"{flops/dts/1e9:7.1f} GFLOPS  "
                  f"{iters*model_bytes/dts/1e9:6.1f} GB/s", flush=True)
        else:
            hist_s = None

        taps, strips2 = prepare_stream(A)
        bp = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        strips2 = jax.device_put(strips2)
        try:
            fc = jax.jit(lambda s2, bp, x0p: stream_cg_const_planes(
                A.offsets, A.grid, taps, s2, bp, x0p, iters)[1])
            hist_c = np.asarray(fc(strips2, bp, x0p))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fc(strips2, bp, x0p))
                ts.append(time.perf_counter() - t0)
            dtc = min(ts)
            msg = (f"N={N} stream-krnl: {dtc*1e3:8.2f} ms  "
                   f"{flops/dtc/1e9:7.1f} GFLOPS  "
                   f"real {iters*real_bytes/dtc/1e9:6.1f} GB/s "
                   f"({iters*real_bytes/dtc/1e9/HBM_GBS*100:.0f}% roof)  "
                   f"eff {iters*model_bytes/dtc/1e9:6.1f} GB/s")
            if hist_s is not None:
                rel100 = (np.abs(hist_c[:101] - hist_s[:101, 0]).max()
                          / hist_s[0, 0])
                msg += f"  hist100-rel {rel100:.2e}"
            print(msg, flush=True)
        except Exception as e:
            print(f"N={N} stream-krnl FAILED: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
