"""Headline benchmark: single-precision complex CG on the Helmholtz FE
matrix -- the reference's ``helm_fem`` configuration (report Table I:
n = 16384 = 128^2, nnz = 113,666; report Fig. 5 baseline: 2.390 GFLOPS on
an RTX 2080S at 5000 iterations, 1 RHS).

The complex system runs in the two-plane float32 representation
(``tpcg.ops.cplx``), Karatsuba 3-SpMV complex matvec, whole solve in one
on-device ``lax.scan``.  FLOP accounting follows report Table II (complex:
SpMV 8*nnz, dot 8*n x2, axpy-class 8*n x3 per iteration).  Timing starts
with device buffers resident and the program compiled, like the
reference's protocol.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops import block_cg_planes, make_pair_operator, to_planes
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k = 128, 12.0
    iters = 5000
    A = helm_fe(N, k, eps=k)
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    n = N * N
    P = make_pair_operator(A, dtype=jnp.float32)
    b = to_planes(plane_wave_rhs(N, k).reshape(-1), jnp.float32)

    @jax.jit
    def solve(P, b):
        res = block_cg_planes(P, b, n_iterations=iters)
        return res.x, res.residual_history[-1]

    # warmup: compile + make buffers resident.  NB: on this backend
    # block_until_ready does not reliably fence; a device->host readback of
    # the (tiny) final residual is the synchronisation point, so each
    # timed rep includes one transfer round-trip.
    rn = np.asarray(solve(P, b)[1])
    assert np.all(np.isfinite(rn))

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(solve(P, b)[1])
        times.append(time.perf_counter() - t0)
    dt = min(times)

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
