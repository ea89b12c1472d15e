"""N=2048 divergence profile for the batched streaming kernels on the
CONVERGING k=8/rho=0.5 problem: first-divergence point, growth, and
end-of-solve true residual.  Companion to exp_batchdiv.py (N=1024,
diverging k=40 problem).

    timeout 3000 python -u benchmarks/exp_batchdiv2.py > /tmp/bdiv3.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from exp_batchdiv import _np_shift2d, true_resid  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (
        prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched_fat)
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    N, k, nb = 2048, 8.0, 2
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.5)
    coefp = jax.device_put(prepare_stream_coef(A))
    bg = plane_wave_rhs(N, k)
    B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
    bp = jax.device_put(jnp.asarray(
        np.stack([B.real, B.imag]).astype(np.float32)))
    x0p = jnp.zeros_like(bp)
    bp1 = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag]).astype(np.float32)))
    x01 = jnp.zeros_like(bp1)

    for iters in (30, 120):
        h1 = np.asarray(jax.jit(lambda b_, x_: stream_cg_coef_planes(
            A.offsets, A.grid, coefp, b_, x_, iters))(bp1, x01)[1])
        hf = np.asarray(jax.jit(
            lambda b_, x_: stream_cg_coef_planes_batched_fat(
                A.offsets, A.grid, coefp, b_, x_, iters,
                block_rows=128))(bp, x0p)[1])
        rel = np.abs(hf[:, 0] - h1) / (np.abs(h1) + 1e-30)
        first = int(np.argmax(rel > 0)) if rel.max() > 0 else -1
        print(f"iters={iters:4d} fat128: rel[0..4]="
              f"{np.array2string(rel[:5], precision=2)} "
              f"first_nonzero={first} max={rel.max():.3g} "
              f"at_it={int(rel.argmax())}", flush=True)

    iters = 500
    x1, h1 = jax.jit(lambda b_, x_: stream_cg_coef_planes(
        A.offsets, A.grid, coefp, b_, x_, iters))(bp1, x01)
    xf, hf = jax.jit(lambda b_, x_: stream_cg_coef_planes_batched_fat(
        A.offsets, A.grid, coefp, b_, x_, iters,
        block_rows=128))(bp, x0p)
    h1 = np.asarray(h1)
    hf = np.asarray(hf)
    print(f"hist single [0, 100, 250, 500]: "
          f"{h1[0]:.3e} {h1[100]:.3e} {h1[250]:.3e} {h1[-1]:.3e}",
          flush=True)
    print(f"hist fat128 [0, 100, 250, 500]: "
          f"{hf[0, 0]:.3e} {hf[100, 0]:.3e} {hf[250, 0]:.3e} "
          f"{hf[-1, 0]:.3e}", flush=True)
    print(f"true-resid single: {true_resid(A, np.asarray(x1), B[0]):.4e}",
          flush=True)
    print(f"true-resid fat128: "
          f"{true_resid(A, np.asarray(xf)[:, 0], B[0]):.4e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
