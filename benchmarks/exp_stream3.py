"""Stream v3 (merged one-kernel iteration) vs v2 on the real TPU.

For N in {1024, 2048}, const-tap and variable-coefficient paths:
per-iteration time (round-trip amortized over `iters`), achieved GB/s
on the bytes each version actually moves, GFLOPS, and a history-parity
gate v3-vs-v2 (expected EXACT: same arithmetic).

    timeout 3000 python -u benchmarks/exp_stream3.py > /tmp/s3.log 2>&1
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
    from tpcg.ops.stream_cg import (prepare_stream, prepare_stream_coef,
                                    stream_cg_coef_planes,
                                    stream_cg_const_planes)
    from tpcg.ops.stream_cg_v3 import (stream_cg_v3_coef_planes,
                                       stream_cg_v3_const_planes)
    from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs

    iters = 1000
    for N in (1024, 2048):
        k = 40.0
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
        keep_r = N <= 1024

        nnz_c = int(np.count_nonzero(np.asarray(Ac.coef)))
        nnz_v = int(np.count_nonzero(np.asarray(Av.coef)))
        noff_v = len(Av.offsets)

        # plane-transfers per iteration (read+write, 4 B planes)
        pt_v2_const = 20
        pt_v3_const = 12 if keep_r else 14
        pt_v2_coef = 20 + 2 * noff_v
        pt_v3_coef = (12 if keep_r else 14) + 2 * noff_v

        cases = [
            ("const v2", jax.jit(lambda b_, x_: stream_cg_const_planes(
                Ac.offsets, Ac.grid, taps, strips2, b_, x_, iters)),
             nnz_c, pt_v2_const),
            ("const v3", jax.jit(lambda b_, x_: stream_cg_v3_const_planes(
                Ac.offsets, Ac.grid, taps, strips2, b_, x_, iters,
                keep_r=keep_r)), nnz_c, pt_v3_const),
            ("coef  v2", jax.jit(lambda b_, x_: stream_cg_coef_planes(
                Av.offsets, Av.grid, coefp, b_, x_, iters)),
             nnz_v, pt_v2_coef),
            ("coef  v3", jax.jit(lambda b_, x_: stream_cg_v3_coef_planes(
                Av.offsets, Av.grid, coefp, b_, x_, iters,
                keep_r=keep_r)), nnz_v, pt_v3_coef),
        ]
        hists = {}
        for name, fn, nnz, pt in cases:
            try:
                h = np.asarray(fn(bp, x0p)[1])
            except Exception as ex:
                print(f"N={N} {name}: FAILED {type(ex).__name__}: "
                      f"{str(ex)[:200]}", flush=True)
                continue
            assert np.all(np.isfinite(h)), (name, h[-5:])
            hists[name] = h
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(bp, x0p)[1][-1])
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / iters
            flops = 8 * nnz + 40 * n
            gbs = pt * n * 4 / dt / 1e9
            print(f"N={N} {name}: {dt * 1e6:7.1f} us/it  "
                  f"{flops / dt / 1e9:7.1f} GFLOPS  "
                  f"{gbs:6.0f} GB/s on {pt} planes (keep_r={keep_r})",
                  flush=True)
        for pair in (("const v2", "const v3"), ("coef  v2", "coef  v3")):
            if pair[0] in hists and pair[1] in hists:
                a, b = hists[pair[0]], hists[pair[1]]
                rel = np.abs(a - b) / (np.abs(a) + 1e-30)
                print(f"N={N} parity {pair[1]} vs {pair[0]}: "
                      f"max rel {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
