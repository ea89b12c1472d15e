"""Stream v4 (VMEM-resident multi-iteration kernel) vs v3/v2 on TPU.

v4 keeps x/r/d(/q) in VMEM scratch across K iterations: steady-state
HBM state traffic is ZERO for the const path (vs v3's 12 planes/it) and
coef planes stream once per iteration for the coef path (vs v2's 34
total).  Measures us/it (round-trip amortized), GFLOPS, and pins
history parity vs v2 (expected EXACT: identical arithmetic).

    timeout 3000 python -u benchmarks/exp_stream4.py > /tmp/s4.log 2>&1
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
    from tpcg.ops.stream_cg_v4 import (stream_cg_v4_coef_planes,
                                       stream_cg_v4_const_planes)
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
        keep_q = 8 * n * 4 <= 88 * 1024 * 1024

        nnz_c = int(np.count_nonzero(np.asarray(Ac.coef)))
        nnz_v = int(np.count_nonzero(np.asarray(Av.coef)))

        cases = [
            ("const v2        ",
             jax.jit(lambda b_, x_: stream_cg_const_planes(
                 Ac.offsets, Ac.grid, taps, strips2, b_, x_, iters)),
             nnz_c),
            ("const v3        ",
             jax.jit(lambda b_, x_: stream_cg_v3_const_planes(
                 Ac.offsets, Ac.grid, taps, strips2, b_, x_, iters,
                 keep_r=keep_r, block_rows=64 if N >= 2048 else None)),
             nnz_c),
        ]
        for bv in (32, 64, 128):
            if N % bv or N // bv < 2:
                continue
            cases.append((
                f"const v4 Bv={bv:<4}",
                jax.jit(lambda b_, x_, bv=bv: stream_cg_v4_const_planes(
                    Ac.offsets, Ac.grid, taps, strips2, b_, x_, iters,
                    block_rows=bv, keep_q=keep_q)),
                nnz_c))
        cases.append((
            "coef  v2        ",
            jax.jit(lambda b_, x_: stream_cg_coef_planes(
                Av.offsets, Av.grid, coefp, b_, x_, iters)), nnz_v))
        if not keep_q:
            cases.append((
                "coef  v3        ",
                jax.jit(lambda b_, x_: stream_cg_v3_coef_planes(
                    Av.offsets, Av.grid, coefp, b_, x_, iters,
                    keep_r=keep_r, block_rows=32)), nnz_v))
        else:
            for bv in (64, 128):
                cases.append((
                    f"coef  v4 Bv={bv:<4}",
                    jax.jit(lambda b_, x_, bv=bv:
                            stream_cg_v4_coef_planes(
                                Av.offsets, Av.grid, coefp, b_, x_,
                                iters, block_rows=bv)), nnz_v))

        hists = {}
        for name, fn, nnz in cases:
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
            print(f"N={N} {name}: {dt * 1e6:7.1f} us/it  "
                  f"{flops / dt / 1e9:7.1f} GFLOPS "
                  f"(keep_q={keep_q})", flush=True)
        for base in ("const v2        ", "coef  v2        "):
            for name in hists:
                if name != base and name[:5] == base[:5]:
                    rel = (np.abs(hists[name] - hists[base])
                           / (np.abs(hists[base]) + 1e-30))
                    print(f"N={N} parity {name.strip()} vs v2: "
                          f"max rel {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
