"""Bisect the Mosaic crash in the butterfly kernel: which op kills the
remote compiler?  Each candidate compiles a tiny kernel in try/except."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = 1024, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    m8 = jnp.asarray(rng.integers(-1, 2, size=(R, C)).astype(np.int8))
    m32 = m8.astype(jnp.int32)
    mf = m8.astype(jnp.float32)

    def run(name, kernel, *args):
        try:
            pk = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024))
            out = np.asarray(jax.jit(pk)(*args))
            print(f"{name}: OK (sum {out.sum():.3f})", flush=True)
            return True
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}", flush=True)
            return False

    # 1. lane roll f32
    run("roll-lane-f32", lambda x_ref, y_ref:
        y_ref.__setitem__(..., pltpu.roll(x_ref[...], 3, 1)), x)
    # 2. sublane roll f32
    run("roll-sublane-f32", lambda x_ref, y_ref:
        y_ref.__setitem__(..., pltpu.roll(x_ref[...], 16, 0)), x)
    # 3. int8 mask select
    run("select-int8", lambda x_ref, m_ref, y_ref:
        y_ref.__setitem__(..., jnp.where(m_ref[...] > 0, x_ref[...],
                                         -x_ref[...])), x, m8)
    # 4. int32 mask select
    run("select-int32", lambda x_ref, m_ref, y_ref:
        y_ref.__setitem__(..., jnp.where(m_ref[...] > 0, x_ref[...],
                                         -x_ref[...])), x, m32)
    # 5. one full stage, int8 mask, lane axis
    def stage_lane(x_ref, m_ref, y_ref):
        t = x_ref[...]
        mk = m_ref[...]
        up = pltpu.roll(t, C - 3, 1)
        dn = pltpu.roll(t, 3, 1)
        y_ref[...] = jnp.where(mk > 0, up, jnp.where(mk < 0, dn, t))
    run("stage-lane-int8", stage_lane, x, m8)
    # 6. one full stage, sublane axis
    def stage_sub(x_ref, m_ref, y_ref):
        t = x_ref[...]
        mk = m_ref[...]
        up = pltpu.roll(t, R - 64, 0)
        dn = pltpu.roll(t, 64, 0)
        y_ref[...] = jnp.where(mk > 0, up, jnp.where(mk < 0, dn, t))
    run("stage-sublane-int8", stage_sub, x, m8)
    # 7. 17 chained stages, f32 masks
    mf17 = jnp.asarray(rng.integers(-1, 2, size=(17, R, C))
                       .astype(np.float32))
    shifts = [(1 << (k % 7), 1) if k % 2 == 0 else (1 << (k % 10), 0)
              for k in range(17)]

    def chain17(x_ref, m_ref, y_ref):
        t = x_ref[...]
        for k, (s, ax) in enumerate(shifts):
            mk = m_ref[k]
            up = pltpu.roll(t, s, ax)
            dn = pltpu.roll(t, (R if ax == 0 else C) - s, ax)
            t = jnp.where(mk > 0, up, jnp.where(mk < 0, dn, t))
        y_ref[...] = t
    run("chain17-f32mask", chain17, x, mf17)
    # 8. 17 chained stages, int8 masks
    m817 = jnp.asarray(rng.integers(-1, 2, size=(17, R, C)).astype(np.int8))
    run("chain17-int8mask", chain17, x, m817)
    # 9. dynamic leading index into 4-D int8
    m4d = jnp.asarray(rng.integers(-1, 2, size=(4, 17, R, C))
                      .astype(np.int8))

    def dyn4d(x_ref, m_ref, y_ref):
        def body(l, t):
            mk = m_ref[l, 0]
            return jnp.where(mk > 0, -t, t)
        y_ref[...] = lax.fori_loop(0, 4, body, x_ref[...])
    run("dyn4d-int8", dyn4d, x, m4d)


if __name__ == "__main__":
    main()
