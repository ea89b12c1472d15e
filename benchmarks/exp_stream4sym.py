"""Probe: symmetric half-plane coefficient streaming (v4-sym) vs the
per-plane coef kernels at N=1024 (keep_q) and N=2048 (recompute tier,
where keep_q cannot fit and v3 was the round-3 incumbent at 962 us/it).

    timeout 3000 python -u benchmarks/exp_stream4sym.py > /tmp/s4s.log 2>&1
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
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes)
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_coef_planes
    from tpcg.ops.stream_cg_v4 import stream_cg_v4_coef_planes
    from tpcg.ops.stream_cg_v4_sym import (prepare_stream_sym,
                                           stream_cg_v4_sym_planes)
    from tpcg.problems import helm_fe_var, plane_wave_rhs

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
        half, cplanes = prepare_stream_sym(Av)
        cplanes = jax.device_put(cplanes)
        nnz_v = int(np.count_nonzero(np.asarray(Av.coef)))
        keep_q = 8 * n * 4 <= 88 * 1024 * 1024

        cases = [("coef v2          ",
                  jax.jit(lambda b_, x_: stream_cg_coef_planes(
                      Av.offsets, Av.grid, coefp, b_, x_, iters)))]
        if keep_q:
            cases.append(("coef v4          ",
                          jax.jit(lambda b_, x_: stream_cg_v4_coef_planes(
                              Av.offsets, Av.grid, coefp, b_, x_, iters,
                              block_rows=128))))
        else:
            cases.append(("coef v3          ",
                          jax.jit(lambda b_, x_: stream_cg_v3_coef_planes(
                              Av.offsets, Av.grid, coefp, b_, x_, iters,
                              keep_r=True, block_rows=32))))
        bvs = (64, 128, 256) if keep_q else (32, 64)
        for bv in bvs:
            if N % bv or N // bv < 2:
                continue
            cases.append((
                f"sym  v4 Bv={bv:<4}  ",
                jax.jit(lambda b_, x_, bv=bv: stream_cg_v4_sym_planes(
                    Av.offsets, Av.grid, half, cplanes, b_, x_, iters,
                    block_rows=bv, keep_q=keep_q))))
        hists = {}
        for name, fn in cases:
            try:
                h = np.asarray(fn(bp, x0p)[1])
            except Exception as ex:
                print(f"N={N} {name}: FAILED {type(ex).__name__}: "
                      f"{str(ex)[:160]}", flush=True)
                continue
            assert np.all(np.isfinite(h)), (name, h[-5:])
            hists[name] = h
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(bp, x0p)[1][-1])
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / iters
            flops = 8 * nnz_v + 40 * n
            print(f"N={N} {name}: {dt * 1e6:7.1f} us/it  "
                  f"{flops / dt / 1e9:7.1f} GFLOPS (keep_q={keep_q})",
                  flush=True)
        base = "coef v2          "
        for name in hists:
            if name != base and base in hists:
                m = min(101, len(hists[name]))
                rel = (np.abs(hists[name][:m] - hists[base][:m])
                       / (np.abs(hists[base][:m]) + 1e-30))
                print(f"N={N} parity[0:100] {name.strip()} vs v2: "
                      f"max rel {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
