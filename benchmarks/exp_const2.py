"""Probe 2b: fused_cg_const at large N -- residency, parity, roofline.

2000 iterations so the ~28 ms per-call round-trip is amortized.  For
N=1024 tries compile variants to find what the remote Mosaic compiler
accepts (straight 100MB limit failed earlier).
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
    from tpcg.ops.fused_cg_const import fused_cg_const
    from tpcg.problems import helm_fe, plane_wave_rhs

    iters = 2000
    for N in (512, 1024):
        k = 12.0
        A = helm_fe(N, k, eps=k)
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        n = N * N
        bg = plane_wave_rhs(N, k)
        flops = iters * (8 * nnz + 5 * 8 * n)
        # bytes/iter the XLA streaming path must move (coef3 + ~6 state
        # passes, f32 planes)
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

        got = False
        for tag, kw in (("v100", {}),
                        ("v128", {"vmem_limit_bytes": 127 * 1024 * 1024})):
            if got or (N < 1024 and tag != "v100"):
                continue
            try:
                import tpcg.ops.fused_cg_const as fcc
                if kw:
                    # monkey-patch the compiler params for the retry
                    orig = fcc.pltpu.CompilerParams
                    fcc.pltpu.CompilerParams = (
                        lambda **k2: orig(**{**k2, **kw}))
                fc = jax.jit(lambda: fused_cg_const(
                    A, bg[None], n_iterations=iters)[1])
                hist_c = np.asarray(fc())
                if kw:
                    fcc.pltpu.CompilerParams = orig
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(fc())
                    ts.append(time.perf_counter() - t0)
                dtc = min(ts)
                rel = (np.abs(hist_c[:, 0] - hist_s[:, 0]).max()
                       / hist_s[0, 0])
                print(f"N={N} const({tag}): {dtc*1e3:8.2f} ms  "
                      f"{flops/dtc/1e9:7.1f} GFLOPS  "
                      f"{iters*stream_bytes/dtc/1e9:6.1f} GB/s-eff  "
                      f"hist-rel-dev {rel:.2e}", flush=True)
                got = True
            except Exception as e:
                print(f"N={N} const({tag}) FAILED: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
