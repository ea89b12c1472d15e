"""Probe: v4 block-rows sweep at N=1024 complex (Bv=256 won the real
sweep; check the complex kernel) + chunk-size sensitivity.

    timeout 1800 python -u benchmarks/exp_stream4b.py > /tmp/s4b.log 2>&1
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
    from tpcg.ops.stream_cg import prepare_stream, prepare_stream_coef
    from tpcg.ops.stream_cg_v4 import (stream_cg_v4_coef_planes,
                                       stream_cg_v4_const_planes)
    from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs

    N, iters, k = 1024, 1000, 40.0
    bg = plane_wave_rhs(N, k)
    bp = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag]).astype(np.float32)))
    x0p = jnp.zeros_like(bp)
    n = N * N
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    Av = helm_fe_var(N, k, C, rho=0.1)
    coefp = jax.device_put(prepare_stream_coef(Av))
    Ac = helm_fe(N, k, eps=k)
    taps, strips2 = prepare_stream(Ac)
    nnz_c = int(np.count_nonzero(np.asarray(Ac.coef)))
    nnz_v = int(np.count_nonzero(np.asarray(Av.coef)))

    cases = []
    for bv in (128, 256):
        for chunk in (512, 1000):
            cases.append((
                f"const Bv={bv} chunk={chunk:<4}",
                jax.jit(lambda b_, x_, bv=bv, ch=chunk:
                        stream_cg_v4_const_planes(
                            Ac.offsets, Ac.grid, taps, strips2, b_, x_,
                            iters, block_rows=bv, chunk=ch)), nnz_c))
    cases.append((
        "coef  Bv=256 chunk=512 ",
        jax.jit(lambda b_, x_: stream_cg_v4_coef_planes(
            Av.offsets, Av.grid, coefp, b_, x_, iters,
            block_rows=256)), nnz_v))
    for name, fn, nnz in cases:
        try:
            h = np.asarray(fn(bp, x0p)[1])
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
            continue
        assert np.all(np.isfinite(h)), (name, h[-5:])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(bp, x0p)[1][-1])
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / iters
        flops = 8 * nnz + 40 * n
        print(f"{name}: {dt * 1e6:7.1f} us/it  "
              f"{flops / dt / 1e9:7.1f} GFLOPS", flush=True)


if __name__ == "__main__":
    sys.exit(main())
