"""Probe: variable-coefficient HBM-streaming CG (stream-coef path) vs
the XLA planes path at N=1024, plus parity check.

Traffic model per iteration: 10 state planes + 2*noff coefficient
planes in K1 (helm_fe_var: noff=7 -> 24 planes ~ 96 B/unknown) vs the
XLA path's ~43 planes.
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
    import tpcg.ops.stream_cg as sc
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    omega = 12.0
    for N, iters in ((1024, 1000), (2048, 500)):
        rng = np.random.default_rng(0)
        C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
        A = helm_fe_var(N, omega, C, rho=0.1)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        noff = len(A.offsets)
        bg = plane_wave_rhs(N, omega)
        flops = iters * (8 * nnz + 40 * n)
        real_bytes = (20 + 2 * noff) * n * 4
        coefp = jax.device_put(sc.prepare_stream_coef(A))
        bp = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        try:
            f = jax.jit(lambda cp, b, x: sc.stream_cg_coef_planes(
                A.offsets, A.grid, cp, b, x, iters)[1])
            hist_c = np.asarray(f(coefp, bp, x0p))
            dt = bench(lambda *a: f(*a)[-1], coefp, bp, x0p)
            msg = (f"N={N} stream-coef: {dt*1e3:8.2f} ms "
                   f"{flops/dt/1e9:6.1f} GFLOPS {dt/iters*1e6:6.1f} us/it "
                   f"real {iters*real_bytes/dt/1e9:5.1f} GB/s "
                   f"({iters*real_bytes/dt/1e9/HBM_GBS*100:.0f}%)")
            if N == 1024:
                P = make_pair_operator(A, dtype=jnp.float32)
                b2 = jax.device_put(jnp.asarray(
                    np.stack([bg.real, bg.imag])
                    .reshape(2, n)[:, :, None].astype(np.float32)))
                gi = 100
                fs = jax.jit(lambda b: block_cg_planes(
                    P, b, n_iterations=gi).residual_history)
                hs = np.asarray(fs(b2))[:, 0]
                rel = (np.abs(hist_c[:gi + 1] - hs)
                       / (np.abs(hs) + 1e-30))
                msg += f"  hist100-rel {rel.max():.2e}"
                # XLA planes path timing on the same problem
                fx = jax.jit(lambda b: block_cg_planes(
                    P, b, n_iterations=iters).residual_history[-1])
                dtx = bench(fx, b2)
                msg += (f"  | xla: {dtx/iters*1e6:6.1f} us/it "
                        f"{flops/dtx/1e9:6.1f} GFLOPS")
            print(msg, flush=True)
        except Exception as e:
            print(f"N={N} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__" and "--batch" not in sys.argv:
    main()


def batch_sweep():
    """Multi-RHS coefficient-amortization sweep at N=1024."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import tpcg.ops.stream_cg as sc
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    N, iters, omega = 1024, 500, 12.0
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, omega, C, rho=0.1)
    n = N * N
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    coefp = jax.device_put(sc.prepare_stream_coef(A))
    bg = plane_wave_rhs(N, omega)
    for nb in (1, 2, 4):
        B = np.stack([bg * (1 + 0.2j * k) for k in range(nb)])
        bp = jax.device_put(jnp.asarray(
            np.stack([B.real, B.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        flops = iters * nb * (8 * nnz + 40 * n)
        try:
            f = jax.jit(lambda cp, b, x: sc.stream_cg_coef_planes_batched(
                A.offsets, A.grid, cp, b, x, iters)[1])
            np.asarray(f(coefp, bp, x0p))
            dt = bench(lambda *a: f(*a)[-1], coefp, bp, x0p)
            print(f"nb={nb}: {dt/iters*1e6:7.1f} us/it "
                  f"({dt/iters/nb*1e6:6.1f} us/it/rhs) "
                  f"{flops/dt/1e9:6.1f} GFLOPS total", flush=True)
        except Exception as e:
            print(f"nb={nb} FAILED: {str(e)[:250]}", flush=True)


if __name__ == "__main__" and "--batch" in sys.argv:
    batch_sweep()
