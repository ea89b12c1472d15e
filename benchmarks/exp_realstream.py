"""Probe: REAL HBM-streaming CG (stream_cg_real) vs the XLA stencil
path at N=1024/2048 (Poisson 5-point), const-tap and coef modes,
plus on-TPU history parity."""
import os
import sys
import time
import dataclasses

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
    import tpcg.ops.stream_cg_real as sr
    from tpcg import block_cg
    from tpcg.problems.poisson import poisson

    for N, iters in ((1024, 2000), (2048, 1000)):
        A = poisson(N, dtype=np.float64)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        rng = np.random.default_rng(0)
        b = rng.standard_normal((N, N)).astype(np.float32)
        bp = jax.device_put(jnp.asarray(b))
        x0p = jnp.zeros_like(bp)
        flops = iters * (2 * nnz + 10 * n)
        taps, strips2 = sr.prepare_stream_real(A)
        strips2 = jax.device_put(strips2)
        coefp = jax.device_put(sr.prepare_stream_coef_real(A))

        hs = None
        try:
            A32 = dataclasses.replace(A, coef=jnp.asarray(
                np.asarray(A.coef).astype(np.float32)))
            A32 = jax.device_put(A32)
            bf = jax.device_put(jnp.asarray(b.reshape(-1)))
            gi = 100
            fx = jax.jit(lambda M, b: block_cg(M, b, n_iterations=gi)
                         .residual_history)
            hs = np.asarray(fx(A32, bf))
            fx2 = jax.jit(lambda M, b: block_cg(M, b, n_iterations=iters)
                          .residual_history[-1])
            dtx = bench(fx2, A32, bf)
            print(f"N={N} xla-dia: {dtx/iters*1e6:7.1f} us/it "
                  f"{flops/dtx/1e9:6.1f} GFLOPS", flush=True)
        except Exception as e:
            print(f"N={N} xla FAILED: {str(e)[:200]}", flush=True)

        def call_const(a, b_, x):
            return sr.stream_cg_real_planes(A.offsets, A.grid, taps, a,
                                            b_, x, iters)[1]

        def call_coef(a, b_, x):
            return sr.stream_cg_real_coef_planes(A.offsets, A.grid, a,
                                                 b_, x, iters)[1]

        for tag, fn, arg, nplanes in (("const", call_const, strips2, 10),
                                      ("coef", call_coef, coefp, 15)):
            try:
                f = jax.jit(fn)
                hist = np.asarray(f(arg, bp, x0p))
                dt = bench(lambda *a: f(*a)[-1], arg, bp, x0p)
                gbs = iters * nplanes * n * 4 / dt / 1e9
                msg = (f"N={N} {tag:5s}:  {dt/iters*1e6:7.1f} us/it "
                       f"{flops/dt/1e9:6.1f} GFLOPS  {gbs:5.1f} GB/s "
                       f"({gbs/HBM_GBS*100:.0f}%)")
                if hs is not None:
                    rel = (np.abs(hist[:101] - hs[:101])
                           / (np.abs(hs[:101]) + 1e-30))
                    msg += f"  hist100-rel {rel.max():.2e}"
                print(msg, flush=True)
            except Exception as e:
                print(f"N={N} {tag} FAILED: {str(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
