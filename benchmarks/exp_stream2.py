"""Probe: streaming-CG v2 (self-contained iteration: in-kernel
alpha/beta + side-output halos, zero per-iteration XLA glue).

a) full solve at N=512/1024/2048 (+ parity vs XLA streaming at 1024),
b) block_rows sweep at N=1024,
c) isolated K1-only / K2-only loops.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_GBS = 820.0


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
    from jax import lax
    import tpcg.ops.stream_cg as sc
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    from tpcg.problems import helm_fe, plane_wave_rhs

    k = 12.0
    for N, iters in ((512, 2000), (1024, 2000), (2048, 1000)):
        A = helm_fe(N, k, eps=k)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        bg = plane_wave_rhs(N, k)
        flops = iters * (8 * nnz + 40 * n)
        model_bytes = (3 * 9 * n + 2 * 8 * n) * 4
        real_bytes = 20 * n * 4
        taps, strips2 = sc.prepare_stream(A)
        bp = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        strips2 = jax.device_put(strips2)
        try:
            f = jax.jit(lambda s2, b, x: sc.stream_cg_const_planes(
                A.offsets, A.grid, taps, s2, b, x, iters)[1])
            hist_c = np.asarray(f(strips2, bp, x0p))
            dt = bench(lambda *a: f(*a)[-1], strips2, bp, x0p)
            msg = (f"N={N}: {dt*1e3:8.2f} ms  {flops/dt/1e9:6.1f} GFLOPS "
                   f" {dt/iters*1e6:6.1f} us/it  "
                   f"real {iters*real_bytes/dt/1e9:5.1f} GB/s "
                   f"({iters*real_bytes/dt/1e9/HBM_GBS*100:.0f}%)  "
                   f"eff {iters*model_bytes/dt/1e9:6.1f} GB/s")
            if N == 1024:
                P = make_pair_operator(A, dtype=jnp.float32)
                b2 = jax.device_put(jnp.asarray(
                    np.stack([bg.real, bg.imag])
                    .reshape(2, n)[:, :, None].astype(np.float32)))
                fs = jax.jit(lambda b: block_cg_planes(
                    P, b, n_iterations=100).residual_history)
                hs = np.asarray(fs(b2))[:, 0]
                rel = (np.abs(hist_c[:101] - hs) / (np.abs(hs) + 1e-30))
                msg += f"  hist100-rel {rel.max():.2e}"
            print(msg, flush=True)
        except Exception as e:
            print(f"N={N} FAILED: {str(e)[:300]}", flush=True)

    # --- Bv sweep + isolated kernels at N=1024 -------------------------
    N, iters = 1024, 1000
    A = helm_fe(N, k, eps=k)
    n = N * N
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    bg = plane_wave_rhs(N, k)
    flops = iters * (8 * nnz + 40 * n)
    taps, strips2 = sc.prepare_stream(A)
    bp = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag]).astype(np.float32)))
    x0p = jnp.zeros_like(bp)
    strips2 = jax.device_put(strips2)
    for bv in (64, 256):
        try:
            f = jax.jit(lambda s2, b, x, bv=bv: sc.stream_cg_const_planes(
                A.offsets, A.grid, taps, s2, b, x, iters,
                block_rows=bv)[1][-1])
            dt = bench(f, strips2, bp, x0p)
            print(f"Bv={bv}: {dt/iters*1e6:6.1f} us/it "
                  f"{flops/dt/1e9:6.1f} GFLOPS", flush=True)
        except Exception as e:
            print(f"Bv={bv} FAILED: {str(e)[:200]}", flush=True)

    Bv = 128
    G = N // Bv
    P1 = 1
    k1f, k2f = sc._build_kernels(A.offsets, A.grid, taps, Bv)
    one2 = jnp.ones((2, 1), jnp.float32)
    zero2 = jnp.zeros((2, 1), jnp.float32)
    al4 = jnp.asarray([[1e-7], [0.0], [0.0], [0.0]], jnp.float32)

    def k1_loop(s2, r0, d0):
        Sr0 = sc._boundary(r0, G, Bv, P1, N)
        Sd0 = sc._boundary(d0, G, Bv, P1, N)

        def body(c, _):
            d, Sd = c
            dnew, q, Sdn, al = k1f(s2, zero2, one2, r0, d, Sr0, Sd)
            return (dnew, Sdn), al[0, 0]

        (_, _), h = lax.scan(body, (d0, Sd0), None, length=iters)
        return h[-1]

    def k2_loop(x0, r0):
        def body(c, _):
            x, r = c
            xn, rn, Srn, bt, dn, hh = k2f(al4, one2, x, r0, r, x0)
            return (xn, rn), hh[0, 0]

        (_, _), h = lax.scan(body, (x0, r0), None, length=iters)
        return h[-1]

    t = bench(jax.jit(k1_loop), strips2, bp, x0p + 1e-3)
    print(f"K1-only: {t/iters*1e6:6.1f} us/it", flush=True)
    t = bench(jax.jit(k2_loop), bp, bp * 0.5)
    print(f"K2-only: {t/iters*1e6:6.1f} us/it", flush=True)


if __name__ == "__main__":
    main()
