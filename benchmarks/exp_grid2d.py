"""Micro-probes for the (G, nb) 2-D grid batched-kernel failure.

 a) dynamic SMEM indexing by the inner grid coordinate (acc[., b])
 b) held-constant BlockSpec index maps: is an input block re-fetched
    when its index is unchanged across inner steps (coef reuse)?
 c) per-b SMEM input blocks (static [0,0] indexing) as the alternative

    timeout 900 python -u benchmarks/exp_grid2d.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, NB = 4, 3
    Bv, nh = 8, 128

    # --- (a) dynamic SMEM accumulate indexed by program_id(1) ----------
    def ka(x_ref, out_ref, acc):
        i = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[0, b] = 0.0

        acc[0, b] += jnp.sum(x_ref[0, 0])

        @pl.when(i == G - 1)
        def _():
            out_ref[0, b] = acc[0, b]

    x = jnp.asarray(np.arange(NB * G * Bv * nh, dtype=np.float32)
                    .reshape(1, NB, G * Bv, nh) / 1e3)
    blk = pl.BlockSpec((1, 1, Bv, nh), lambda i, b: (0, b, i, 0))
    outa = pl.pallas_call(
        ka, grid=(G, NB),
        in_specs=[blk],
        out_specs=pl.BlockSpec((1, NB), lambda i, b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, NB), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, NB), jnp.float32)],
    )(x)
    want = np.asarray(x).reshape(NB, G * Bv * nh).sum(axis=1)
    got = np.asarray(outa)[0]
    print("a) dyn-SMEM acc:", got, "want", want,
          "OK" if np.allclose(got, want, rtol=1e-5) else "FAIL",
          flush=True)

    # --- (b) held-index fetch skipping: bandwidth test -----------------
    # big "coef" array whose block index depends only on i; if Mosaic
    # skips the re-fetch across the NB inner steps, the run should take
    # ~1/NB of the naive traffic time.
    NV, NH, NBB = 2048, 2048, 8
    Bv2 = 128
    G2 = NV // Bv2
    coef = jnp.asarray(np.ones((18, NV, NH), np.float32))
    state = jnp.asarray(np.ones((NBB, Bv2, NH), np.float32))

    def kb(c_ref, s_ref, o_ref):
        o_ref[0] = s_ref[0] + c_ref[0, 0]

    cblk = pl.BlockSpec((18, Bv2, NH), lambda i, b: (0, i, 0))
    sblk = pl.BlockSpec((1, Bv2, NH), lambda i, b: (b, 0, 0))
    ob = pl.BlockSpec((1, Bv2, NH), lambda i, b: (b, 0, 0))

    run = jax.jit(lambda c, s: pl.pallas_call(
        kb, grid=(G2, NBB),
        in_specs=[cblk, sblk], out_specs=ob,
        out_shape=jax.ShapeDtypeStruct((NBB, Bv2, NH), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(c, s))
    np.asarray(run(coef, state))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(coef, state))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    cbytes = coef.size * 4
    print(f"b) held-index sweep: {dt * 1e3:.1f} ms; "
          f"naive coef traffic {NBB}x{cbytes / 1e6:.0f} MB -> "
          f"{NBB * cbytes / dt / 1e9:.0f} GB/s-equiv "
          f"(>>800 means re-fetch skipped)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
