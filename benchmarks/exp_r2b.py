"""Round-2b probes, one TPU process:

1. headline config (N=128, b=1, 5000 it): fused_cg_stencil vs
   fused_cg_const -- is the const kernel the better bench.py path?
2. fused-packed capacity at b=32/48/64 -- print the real failure.
3. N=1024 fused_cg_const -- print the real failure.
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
    from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
    from tpcg.ops.fused_cg_const import fused_cg_const
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k = 128, 12.0
    iters = 5000
    A = helm_fe(N, k, eps=k)
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    n = N * N
    coef3 = prepare_coef3(A)
    bg = plane_wave_rhs(N, k)
    b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None].astype(np.float32))
    x0 = jnp.zeros_like(b)
    fpi = 8 * nnz + 5 * 8 * n

    # --- 1. stencil vs const at the headline config ---------------------
    fs = jax.jit(lambda c, b, x: fused_cg_stencil(
        A.offsets, c, b, x, iters)[1])
    h_s = np.asarray(fs(coef3, b, x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fs(coef3, b, x0))
        ts.append(time.perf_counter() - t0)
    print(f"stencil N=128 b=1: {min(ts)*1e3:.2f} ms "
          f"{iters*fpi/min(ts)/1e9:.1f} GFLOPS", flush=True)

    try:
        fc = jax.jit(lambda: fused_cg_const(A, bg[None],
                                            n_iterations=iters)[1])
        h_c = np.asarray(fc())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fc())
            ts.append(time.perf_counter() - t0)
        rel = np.abs(h_c[:, 0] - h_s[:, 0]).max() / h_s[0, 0]
        print(f"const   N=128 b=1: {min(ts)*1e3:.2f} ms "
              f"{iters*fpi/min(ts)/1e9:.1f} GFLOPS  hist-rel {rel:.2e}",
              flush=True)
    except Exception as e:
        print(f"const N=128 FAILED: {str(e)[:300]}", flush=True)

    # --- 2. packed capacity at b>=32 -------------------------------------
    for nb in (32, 48, 64):
        B = np.stack([(r + 1) * bg for r in range(nb)])
        bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
        x0b = jnp.zeros_like(bp)
        try:
            fn = jax.jit(lambda c, b, x, nb=nb: fused_cg_stencil(
                A.offsets, c, b, x, 1000)[1][-1])
            rn = np.asarray(fn(coef3, bp, x0b))
            assert np.all(np.isfinite(rn)), rn
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(coef3, bp, x0b))
                ts.append(time.perf_counter() - t0)
            gf = 1000 * nb * fpi / min(ts) / 1e9
            print(f"packed b={nb}: {min(ts)*1e3:.2f} ms {gf:.1f} GFLOPS",
                  flush=True)
        except Exception as e:
            print(f"packed b={nb} FAILED: {str(e)[:400]}", flush=True)

    # --- 3. N=1024 const diagnosis ---------------------------------------
    N2 = 1024
    A2 = helm_fe(N2, k, eps=k)
    bg2 = plane_wave_rhs(N2, k)
    try:
        f2 = jax.jit(lambda: fused_cg_const(A2, bg2[None],
                                            n_iterations=500)[1][-1])
        rn = np.asarray(f2())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f2())
            ts.append(time.perf_counter() - t0)
        n2 = N2 * N2
        nnz2 = int(np.count_nonzero(np.asarray(A2.coef)))
        gf = 500 * (8 * nnz2 + 40 * n2) / min(ts) / 1e9
        print(f"const N=1024: {min(ts)*1e3:.2f} ms {gf:.1f} GFLOPS "
              f"finite={np.isfinite(rn).all()}", flush=True)
    except Exception as e:
        print(f"const N=1024 FAILED: {str(e)[:1200]}", flush=True)


if __name__ == "__main__":
    main()
