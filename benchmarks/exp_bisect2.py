"""Bisect 2: which part of the fused-const structure fails at N>=768?

Minimal kernels replicating the fused_cg_const shapes, across grid sizes
and lane alignments.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
        (1, -1), (1, 0), (1, 1)]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mini(nv, nh, iters=50, with_scalar=False, with_hist=False):
        P = 1
        pv, ph = nv + 2 * P, nh + 2 * P

        def kernel(b_ref, out_ref, hist_ref, dpad, acc):
            dpad[...] = jnp.zeros((1, pv, ph), jnp.float32)
            dpad[:, P:P + nv, P:P + nh] = b_ref[...]
            acc[...] = jnp.zeros((1, nv, nh), jnp.float32)

            def body(it, delta):
                q = jnp.zeros((1, nv, nh), jnp.float32)
                for s, (dm, dj) in enumerate(OFFS):
                    q = q + (0.1 + 0.01 * s) * dpad[
                        :, P + dm:P + dm + nv, P + dj:P + dj + nh]
                acc[...] = acc[...] + q
                if with_scalar:
                    dq = jnp.sum(q[0] * q[0])
                    a = delta / jnp.where(dq == 0, 1.0, dq)
                    dpad[:, P:P + nv, P:P + nh] = \
                        dpad[:, P:P + nv, P:P + nh] + a * q
                    if with_hist:
                        hist_ref[pl.ds(it + 1, 1), 0:1] = jnp.full(
                            (1, 1), jnp.sqrt(jnp.abs(dq)))
                    return dq
                return delta

            lax.fori_loop(0, iters, body, jnp.float32(1.0))
            out_ref[...] = acc[...]

        b = jnp.ones((1, nv, nh), jnp.float32)
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((1, nv, nh), jnp.float32),
                       jax.ShapeDtypeStruct((iters + 1, 1), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((1, pv, ph), jnp.float32),
                            pltpu.VMEM((1, nv, nh), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(b)

    for tag, nv, nh, ws, wh in (
            ("512-base", 512, 512, False, False),
            ("768-base", 768, 768, False, False),
            ("768-scalar", 768, 768, True, False),
            ("768-scalar-hist", 768, 768, True, True),
            ("1024-base", 1024, 1024, False, False),
            ("768x896-lane128", 768, 896, True, True),
            ("1024x1152-lane128", 1024, 1152, True, True),
            ("640-scalar-hist", 640, 640, True, True),
    ):
        try:
            out, hist = mini(nv, nh, with_scalar=ws, with_hist=wh)
            s = float(np.asarray(out).sum())
            print(f"{tag}: OK sum={s:.1f}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
