"""Debug the batched streaming kernel's hardware parity failure.

Small N=256 runs comparing the (G, nb)-grid batched kernels against the
single-RHS kernels per RHS, including nb=1 (isolates the 2-D grid from
the batching itself).

    timeout 1500 python -u benchmarks/exp_batch_dbg.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (
        prepare_stream, prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched, stream_cg_const_planes,
        stream_cg_const_planes_batched)
    from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs

    N, iters, k = 256, 20, 12.0
    bg = plane_wave_rhs(N, k)

    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    Av = helm_fe_var(N, k, C, rho=0.1)
    coefp = jax.device_put(prepare_stream_coef(Av))
    Ac = helm_fe(N, k, eps=k)
    taps, strips2 = prepare_stream(Ac)

    for label, A, single, batched in [
        ("coef", Av,
         jax.jit(lambda bp, x0: stream_cg_coef_planes(
             Av.offsets, Av.grid, coefp, bp, x0, iters)),
         jax.jit(lambda bp, x0: stream_cg_coef_planes_batched(
             Av.offsets, Av.grid, coefp, bp, x0, iters))),
        ("const", Ac,
         jax.jit(lambda bp, x0: stream_cg_const_planes(
             Ac.offsets, Ac.grid, taps, strips2, bp, x0, iters)),
         jax.jit(lambda bp, x0: stream_cg_const_planes_batched(
             Ac.offsets, Ac.grid, taps, strips2, bp, x0, iters))),
    ]:
        for nb in (1, 2, 4):
            B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
            bp = jnp.asarray(np.stack([B.real, B.imag])
                             .astype(np.float32))
            x0p = jnp.zeros_like(bp)
            xb, hb = batched(bp, x0p)
            hb = np.asarray(hb)
            xb = np.asarray(xb)
            worst = 0.0
            worst_x = 0.0
            for r in range(nb):
                xs, hs = single(bp[:, r], x0p[:, r])
                hs = np.asarray(hs)
                rel = np.abs(hb[:, r] - hs) / (np.abs(hs) + 1e-30)
                worst = max(worst, float(rel.max()))
                dx = np.abs(xb[:, r] - np.asarray(xs)).max()
                worst_x = max(worst_x, float(dx))
            print(f"{label} nb={nb}: hist relmax {worst:.3e}  "
                  f"x absmax {worst_x:.3e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
