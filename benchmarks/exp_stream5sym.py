"""Chained-timing + HW parity for the v5-sym panel-round-trip kernel.

v5-sym is the VARIABLE-coefficient large-N tier (round-5 item 1): the
v5 explicit-DMA state-panel machinery with the v4-sym half coefficient
planes streamed through the normal Pallas grid pipeline.  Before it,
symmetric var-coeff grids beyond the v4-sym resident budget fell to
v3/v2 (~400-585 GFLOPS) while same-size const-tap grids got 853-945
from v5.  This probe:

  * pins HW parity at N=2048 against the coef-v2 oracle and against
    v4-sym at matched block_rows (same emit_q add order -> bit-equal
    expected on hardware),
  * measures true device time (R solves chained in one program, one
    readback -- the bench.py methodology) at N=2560/3072/4096 against
    the v3-coef incumbent.

Reference operator class: variable-wave-speed Helmholtz
(``helmFE_var.py:9-331``, ``p_h-PY_C-CL-multi-GPU.py:616-1330``).

    timeout 3000 python -u benchmarks/exp_stream5sym.py > /tmp/s5s.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.ops.auto import _v5_sym_config
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes)
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_coef_planes
    from tpcg.ops.stream_cg_v4_sym import (prepare_stream_sym,
                                           stream_cg_v4_sym_planes)
    from tpcg.ops.stream_cg_v5_sym import stream_cg_v5_sym_planes
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    R = 4
    k = 40.0

    def problem(N):
        bg = plane_wave_rhs(N, k)
        bp = jax.device_put(jnp.asarray(
            np.stack([bg.real, bg.imag]).astype(np.float32)))
        rng = np.random.default_rng(0)
        C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
        Av = helm_fe_var(N, k, C, rho=0.1)
        half, cplanes = prepare_stream_sym(Av)
        cplanes = jax.device_put(cplanes)
        return Av, half, cplanes, bp, jnp.zeros_like(bp)

    def chain(solver):
        # ops (coefficient planes + RHS) ride as jit ARGUMENTS -- closure
        # constants bake multi-hundred-MB literals into the HLO and the
        # remote-compile request dies with HTTP 413 (verify SKILL.md)
        def body(ops, x0c):
            x, hist = solver(ops, x0c)
            return x0c + (1e-30 * hist[-1]).astype(x0c.dtype), hist[-1]
        return jax.jit(lambda ops, x_: lax.scan(
            lambda c, _: body(ops, c), x_, None, length=R)[1])

    def timeit(name, solver, ops, x0p, iters, flops):
        fn = chain(solver)
        try:
            h = np.asarray(fn(ops, x0p))
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return
        assert np.all(np.isfinite(h)), (name, h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(ops, x0p))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (R * iters)
        print(f"{name}: {dt * 1e6:7.1f} us/it  "
              f"{flops / dt / 1e9:7.1f} GFLOPS (chained x{R})",
              flush=True)

    # ---- HW parity at N=2048 (both tiers/modes) ----------------------
    if "--noparity" in sys.argv:
        sizes = [int(s) for a in sys.argv[1:] if a.startswith("--sizes=")
                 for s in a.split("=")[1].split(",")]
        run_timing(problem, timeit, sizes or [2560, 3072, 4096])
        return
    N, piters = 2048, 120
    Av, half, cplanes, bp, x0p = problem(N)
    coefp = jax.device_put(prepare_stream_coef(Av))
    Bv = 32  # the v4-sym recompute tier's planner Bv at this size
    h2 = np.asarray(jax.jit(
        lambda b_, x_: stream_cg_coef_planes(
            Av.offsets, Av.grid, coefp, b_, x_, piters)[1])(bp, x0p))
    h4 = np.asarray(jax.jit(
        lambda b_, x_: stream_cg_v4_sym_planes(
            Av.offsets, Av.grid, half, cplanes, b_, x_, piters,
            keep_q=False, block_rows=Bv)[1])(bp, x0p))
    rel = np.max(np.abs(h4 - h2) / (np.abs(h2) + 1e-30))
    print(f"N={N} v4-sym Bv={Bv} vs coef-v2 ({piters} it): "
          f"max rel {rel:.2e}", flush=True)
    for dres in (True, False):
        for qx in (False, True):
            h5 = np.asarray(jax.jit(
                lambda b_, x_, d=dres, q=qx: stream_cg_v5_sym_planes(
                    Av.offsets, Av.grid, half, cplanes, b_, x_, piters,
                    d_resident=d, qx=q, block_rows=Bv)[1])(bp, x0p))
            r4 = np.max(np.abs(h5 - h4) / (np.abs(h4) + 1e-30))
            r2 = np.max(np.abs(h5 - h2) / (np.abs(h2) + 1e-30))
            print(f"N={N} v5-sym dres={int(dres)} qx={int(qx)} Bv={Bv}: "
                  f"vs v4-sym max rel {r4:.2e}  vs coef-v2 {r2:.2e}",
                  flush=True)

    run_timing(problem, timeit)


def run_timing(problem, timeit, sizes=(2560, 3072, 4096)):
    """Chained timing beyond the v4-sym budget: v5-sym (planner config)
    vs the v3/v2 coef incumbents."""
    import jax
    from tpcg.ops.auto import _v5_sym_config
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes)
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_coef_planes
    from tpcg.ops.stream_cg_v5_sym import stream_cg_v5_sym_planes

    iters_of = {2560: 400, 3072: 300, 4096: 200}
    for N in sizes:
        iters = iters_of.get(N, 200)
        Av, half, cplanes, bp, x0p = problem(N)
        n = N * N
        nnz_v = int(np.count_nonzero(np.asarray(Av.coef)))
        flops = 8 * nnz_v + 40 * n
        cfg = _v5_sym_config(N, N, len(half))
        print(f"N={N}: planner _v5_sym_config = {cfg}", flush=True)
        assert cfg is not None, N
        dres, bv = cfg
        for qx in (True, False):
            timeit(f"N={N} sym v5 dres={int(dres)} qx={int(qx)} "
                   f"Bv={bv:<3}",
                   lambda ops, x_, d=dres, b_=bv, q=qx:
                   stream_cg_v5_sym_planes(
                       Av.offsets, Av.grid, half, ops[0], ops[1], x_,
                       iters, d_resident=d, qx=q, block_rows=b_),
                   (cplanes, bp), x0p, iters, flops)
        coefp = jax.device_put(prepare_stream_coef(Av))
        timeit(f"N={N} coef v3 (old tier)   ",
               lambda ops, x_: stream_cg_v3_coef_planes(
                   Av.offsets, Av.grid, ops[0], ops[1], x_, iters,
                   keep_r=True, block_rows=32),
               (coefp, bp), x0p, iters, flops)
        timeit(f"N={N} coef v2 (fallback)   ",
               lambda ops, x_: stream_cg_coef_planes(
                   Av.offsets, Av.grid, ops[0], ops[1], x_, iters),
               (coefp, bp), x0p, iters, flops)


if __name__ == "__main__":
    sys.exit(main())
