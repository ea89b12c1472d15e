"""Headline benchmark: single-precision complex CG on the Helmholtz FE
matrix -- the reference's ``helm_fem`` configuration (report Table I:
n = 16384 = 128^2, nnz = 113,666; report Fig. 5 baseline: 2.390 GFLOPS on
an RTX 2080S at 5000 iterations, 1 RHS).

The complex system runs as two float32 planes (``tpcg.ops.cplx``); the
whole 5000-iteration solve executes inside one VMEM-resident Pallas
kernel (``tpcg.ops.fused_cg``) -- matrix and all CG state stay on-chip,
zero HBM traffic per iteration.  FLOP accounting follows report Table II
(complex: SpMV 8*nnz, dot 8*n x2, axpy-class 8*n x3 per iteration).
Timing starts with device buffers resident and the program compiled, like
the reference's protocol.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k = 128, 12.0
    iters = 5000
    A = helm_fe(N, k, eps=k)
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    n = N * N
    coef3 = prepare_coef3(A)
    bg = plane_wave_rhs(N, k)
    b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                    .astype(np.float32))
    x0 = jnp.zeros_like(b)

    # Timing protocol: SLOPE over two chain lengths.  R independent
    # whole solves run back-to-back in ONE device program with one
    # scalar readback; per-solve device time = (t(R2) - t(R1)) /
    # (R2 - R1).  Rationale: block_until_ready does not fence on this
    # tunneled backend, so the only sync is a device->host readback --
    # which costs a fixed ~27 ms round-trip through the tunnel (an
    # artifact of this connection, not of the chip: an empty 5000-trip
    # kernel loop times identically to zero work plus the round-trip;
    # benchmarks/exp_floor.py).  A single 5000-iteration solve is ~8 ms
    # of device time, so one solve per readback would report the tunnel,
    # and even total/R at R=8 still charges ~3.4 ms of tunnel to every
    # solve (~30% of the truth).  The slope cancels every fixed
    # per-readback term exactly and reports pure device time -- which is
    # what the reference's protocol reports too (kernel times on
    # device-resident buffers, report section V).  Each solve is chained
    # through a ~1e-33 perturbation of the next initial guess so XLA
    # cannot CSE the repeats into one.
    R1, R2 = 2, 10

    # packed=True: lane-packed COCG scalars (dot reductions as one MXU
    # ones-contraction at Precision.HIGHEST instead of the vector reduce
    # tree) -- 2.32 vs 2.85 us/it measured at this config, parity vs the
    # XLA oracle 7.8e-4 over the 100-it gate window (round-5 notes /
    # benchmarks/exp_fused128.py attribution: the apply is ~2.2 us/it of
    # the total, so this runs within ~5% of the kernel's own apply floor)
    def make_many(R):
        @jax.jit
        def solve_many(coef3, b, x0):
            def body(x0c, _):
                x, hist = fused_cg_stencil(A.offsets, coef3, b, x0c,
                                           iters, packed=True)
                last = hist[-1]
                # data-dependent (but numerically negligible) chaining
                x0n = x0c + (1e-30 * last[0]).astype(x0c.dtype)
                return x0n, last
            _, lasts = jax.lax.scan(body, x0, None, length=R)
            return lasts
        return solve_many

    solve_many_1, solve_many_2 = make_many(R1), make_many(R2)

    # warmup: compile + make buffers resident
    for fn in (solve_many_1, solve_many_2):
        rn = np.asarray(fn(coef3, b, x0))
        assert np.all(np.isfinite(rn)), rn

    # Parity gate: the compiled fused kernel's residual history must match
    # an independent XLA streaming program (block_cg_planes) on the same
    # problem before any GFLOPS are reported -- a miscompiled-but-finite
    # kernel must not produce a benchmark number.  Mirrors the reference's
    # cross-implementation oracle strategy (SURVEY.md section 4.5).
    from tpcg.ops import block_cg_planes, make_pair_operator
    from tpcg.ops.fused_cg import fused_cg_stencil

    gate_iters = 100

    @jax.jit
    def fused_hist(coef3, b, x0):
        return fused_cg_stencil(A.offsets, coef3, b, x0, gate_iters)[1]

    P = make_pair_operator(A, dtype=jnp.float32)
    b_flat = b.reshape(2, n, 1)

    @jax.jit
    def stream_hist(P, b_flat):
        return block_cg_planes(P, b_flat,
                               n_iterations=gate_iters).residual_history

    hf = np.asarray(fused_hist(coef3, b, x0))[:, 0]
    hs = np.asarray(stream_hist(P, b_flat))[:, 0]
    rel = np.abs(hf - hs) / (np.abs(hs) + 1e-30)
    if not (np.all(np.isfinite(hf)) and rel.max() <= 1e-2):
        raise SystemExit(
            f"PARITY FAIL: fused vs streaming residual history diverges "
            f"(max rel {rel.max():.3e} over {gate_iters} iterations); "
            "refusing to report GFLOPS")

    reps = 4
    t = {}
    for R, fn in ((R1, solve_many_1), (R2, solve_many_2)):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(coef3, b, x0))
            times.append(time.perf_counter() - t0)
        t[R] = min(times)
    dt = (t[R2] - t[R1]) / (R2 - R1)

    flops_per_iter = 8 * nnz + 2 * 8 * n + 3 * 8 * n
    gflops = iters * flops_per_iter / dt / 1e9
    baseline = 2.390  # RTX 2080S, report Fig. 5 (helm_fem)
    print(json.dumps({
        "metric": "cg_gflops_helm_fem_c64_5000it",
        "value": round(gflops, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / baseline, 3),
    }))


if __name__ == "__main__":
    main()
