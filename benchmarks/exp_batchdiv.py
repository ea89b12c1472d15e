"""Divergence profile: batched streaming kernels vs single-RHS, short
horizon.  Distinguishes a genuine kernel bug (wrong at iteration 1)
from f32 reduction-order drift (starts ~1e-7, grows over iterations).
Also compares END-OF-SOLVE quality: true residual ||b - A x|| after
500 iterations for each path.

    timeout 3000 python -u benchmarks/exp_batchdiv.py > /tmp/bdiv.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _np_shift2d(x, dm, dj):
    """Host twin of tpcg.sparse._shift2d: out[m,j] = x[m+dm, j+dj], 0-fill."""
    y = np.zeros_like(x)
    sv = slice(max(0, -dm), x.shape[0] - max(0, dm))
    tv = slice(max(0, dm), x.shape[0] + min(0, dm))
    sh = slice(max(0, -dj), x.shape[1] - max(0, dj))
    th = slice(max(0, dj), x.shape[1] + min(0, dj))
    y[sv, sh] = x[tv, th]
    return y


def true_resid(A, x2, B0):
    """x2: (2, Nv, Nh) f32 planes -> ||b - A x|| / ||b|| in f64 (host)."""
    x = (np.asarray(x2[0], np.float64) + 1j * np.asarray(x2[1], np.float64))
    coef = np.asarray(A.coef).astype(np.complex128)
    q = np.zeros_like(x)
    for s, (dm, dj) in enumerate(A.offsets):
        q += coef[s] * _np_shift2d(x, dm, dj)
    r = B0.astype(np.complex128) - q
    return np.linalg.norm(r) / np.linalg.norm(B0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (
        prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched, stream_cg_coef_planes_batched_fat)
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    N, k, nb = 1024, 40.0, 2
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    coefp = jax.device_put(prepare_stream_coef(A))
    bg = plane_wave_rhs(N, k)
    B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
    bp = jax.device_put(jnp.asarray(
        np.stack([B.real, B.imag]).astype(np.float32)))
    x0p = jnp.zeros_like(bp)
    bp1 = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag]).astype(np.float32)))
    x01 = jnp.zeros_like(bp1)

    for iters in (5, 30, 120):
        h1 = np.asarray(jax.jit(lambda b_, x_: stream_cg_coef_planes(
            A.offsets, A.grid, coefp, b_, x_, iters))(bp1, x01)[1])
        hb = np.asarray(jax.jit(
            lambda b_, x_: stream_cg_coef_planes_batched(
                A.offsets, A.grid, coefp, b_, x_, iters))(bp, x0p)[1])
        hf = np.asarray(jax.jit(
            lambda b_, x_: stream_cg_coef_planes_batched_fat(
                A.offsets, A.grid, coefp, b_, x_, iters,
                block_rows=128))(bp, x0p)[1])
        for name, h in (("perRHS", hb[:, 0]), ("fat128", hf[:, 0])):
            rel = np.abs(h - h1) / (np.abs(h1) + 1e-30)
            first = int(np.argmax(rel > 0)) if rel.max() > 0 else -1
            print(f"iters={iters:4d} {name}: rel[0..4]="
                  f"{np.array2string(rel[:5], precision=2)} "
                  f"first_nonzero={first} max={rel.max():.3g} "
                  f"at_it={int(rel.argmax())}", flush=True)

    # end-of-solve quality after 500 its
    iters = 500
    x1, _ = jax.jit(lambda b_, x_: stream_cg_coef_planes(
        A.offsets, A.grid, coefp, b_, x_, iters))(bp1, x01)
    xb, _ = jax.jit(lambda b_, x_: stream_cg_coef_planes_batched(
        A.offsets, A.grid, coefp, b_, x_, iters))(bp, x0p)
    xf, _ = jax.jit(lambda b_, x_: stream_cg_coef_planes_batched_fat(
        A.offsets, A.grid, coefp, b_, x_, iters,
        block_rows=128))(bp, x0p)
    print(f"true-resid single: {true_resid(A, np.asarray(x1), B[0]):.4e}",
          flush=True)
    print(f"true-resid perRHS: "
          f"{true_resid(A, np.asarray(xb)[:, 0], B[0]):.4e}", flush=True)
    print(f"true-resid fat128: "
          f"{true_resid(A, np.asarray(xf)[:, 0], B[0]):.4e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
