"""Probe: why is fused_cg_const slow when compiled?

Times fused_cg (general, coef in VMEM) vs fused_cg_const with the
boundary-correction pieces selectively disabled, N=128, B=1, 200 its.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, reps=3):
    out = fn()
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
    from tpcg.ops.fused_cg_const import fused_cg_const
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k, iters = 128, 12.0, 200
    A = helm_fe(N, k, eps=k)
    bg = plane_wave_rhs(N, k)
    coef3 = prepare_coef3(A)
    b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None].astype(np.float32))
    x0 = jnp.zeros_like(b)

    f_gen = jax.jit(lambda: fused_cg_stencil(A.offsets, coef3, b, x0,
                                             iters)[1][-1])
    dt = timeit(f_gen)
    print(f"general   : {dt*1e3:8.2f} ms", flush=True)

    for parts in (("rows", "cols"), (), ("rows",), ("cols",)):
        try:
            f = jax.jit(lambda parts=parts: fused_cg_const(
                A, bg[None], n_iterations=iters, _parts=parts)[1][-1])
            dt = timeit(f)
            print(f"const {str(parts):16s}: {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"const {str(parts):16s}: FAILED {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
