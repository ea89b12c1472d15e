"""Microbenchmark: butterfly-stage throughput for the routing-network
SpMV design (general-sparse item).

One "stage" = cyclic roll of a (1024, 128) f32 grid (lane or sublane
axis) + three-way select against an int8 routing mask.  The full design
needs ~layers x 33 stages per SpMV; the go/no-go threshold is
~0.5 us/stage (-> ~11 GFLOPS effective on the m_t1-size random matrix).

Also probes the per-layer tail: product accumulate y += v * routed(x).
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

    R, C = 1024, 128
    STAGES = 17          # one rotation-network worth (probe unit)
    LAYERS = 16

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    # mask: -1 / 0 / +1 per element per stage per layer
    m = jnp.asarray(rng.integers(-1, 2,
                                 size=(LAYERS, STAGES, R, C))
                    .astype(np.int8))
    v = jnp.asarray(rng.standard_normal((LAYERS, R, C)).astype(np.float32))
    shifts = [(1 << (k % 7), 1) if k % 2 == 0 else (1 << (k % 10), 0)
              for k in range(STAGES)]

    import jax.lax as lax

    def kernel(x_ref, m_ref, v_ref, y_ref):
        def body(l, y):
            t = x_ref[...]
            for k, (s, ax) in enumerate(shifts):
                mk = m_ref[l, k]
                up = pltpu.roll(t, s, ax)
                dn = pltpu.roll(t, (R if ax == 0 else C) - s, ax)
                t = jnp.where(mk > 0, up, jnp.where(mk < 0, dn, t))
            return y + v_ref[l] * t
        y_ref[...] = lax.fori_loop(0, LAYERS, body,
                                   jnp.zeros((R, C), jnp.float32))

    pk = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    try:
        f = jax.jit(pk)
        out = np.asarray(f(x0, m, v))
        assert np.all(np.isfinite(out))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x0, m, v))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        n_stage = LAYERS * STAGES
        print(f"butterfly: {dt*1e3:.3f} ms total, "
              f"{dt/n_stage*1e6:.3f} us/stage "
              f"({n_stage} stages of (1024,128))", flush=True)
        print(f"-> est SpMV(random m_t1, 270 layers x 33 stages): "
              f"{dt/n_stage*270*33*1e3:.2f} ms", flush=True)
    except Exception as e:
        print("butterfly FAILED:", str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
