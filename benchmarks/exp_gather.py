"""Microbenchmark: raw gather throughput on the TPU, to size the
general-sparse SpMV design (VERDICT round-1 item #2).

Candidates:
  A. XLA take_along_axis axis=0 on a (R, 128) f32 operand (sublane gather)
  B. same inside a Pallas kernel (Mosaic tpu.dynamic_gather)
  C. Pallas lane gather (axis=1)
  D. two-stage (axis=0 then axis=1) Pallas gather -- the arbitrary-gather
     building block
  E. the current EllMatrix jnp.take path at the same element count

Prints elements/s for each; decision threshold ~2 Gelem/s for the
conflict-free layered ELL design to beat the reference's 7.9 GFLOPS.
"""
import time

import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out)                      # sync (block_until_ready broken)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C, L = 768, 128, 32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    Q = jnp.asarray(rng.integers(0, R, size=(L, R, C)).astype(np.int32))
    S = jnp.asarray(rng.integers(0, C, size=(L, R, C)).astype(np.int32))
    V = jnp.asarray(rng.standard_normal((L, R, C)).astype(np.float32))
    elems = L * R * C

    # --- A: XLA sublane gather ------------------------------------------
    @jax.jit
    def xla_sub(X, Q, V):
        acc = jnp.zeros_like(X)
        for l in range(L):
            acc = acc + V[l] * jnp.take_along_axis(X, Q[l], axis=0)
        return acc

    dt = timeit(xla_sub, X, Q, V)
    print(f"A xla-sublane: {dt*1e3:.3f} ms  {elems/dt/1e9:.3f} Gelem/s",
          flush=True)

    # --- B: Pallas sublane gather ---------------------------------------
    def k_sub(x_ref, q_ref, v_ref, y_ref):
        acc = jnp.zeros((R, C), jnp.float32)
        x = x_ref[...]
        for l in range(L):
            acc += v_ref[l] * jnp.take_along_axis(x, q_ref[l], axis=0)
        y_ref[...] = acc

    pk_sub = pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    try:
        dt = timeit(jax.jit(pk_sub), X, Q, V)
        print(f"B pallas-sublane: {dt*1e3:.3f} ms  "
              f"{elems/dt/1e9:.3f} Gelem/s", flush=True)
    except Exception as e:
        print("B pallas-sublane FAILED:", str(e)[:300], flush=True)

    # --- C: Pallas lane gather ------------------------------------------
    def k_lane(x_ref, s_ref, v_ref, y_ref):
        acc = jnp.zeros((R, C), jnp.float32)
        x = x_ref[...]
        for l in range(L):
            acc += v_ref[l] * jnp.take_along_axis(x, s_ref[l], axis=1)
        y_ref[...] = acc

    pk_lane = pl.pallas_call(
        k_lane,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    try:
        dt = timeit(jax.jit(pk_lane), X, S, V)
        print(f"C pallas-lane: {dt*1e3:.3f} ms  "
              f"{elems/dt/1e9:.3f} Gelem/s", flush=True)
    except Exception as e:
        print("C pallas-lane FAILED:", str(e)[:300], flush=True)

    # --- D: Pallas two-stage gather --------------------------------------
    def k_two(x_ref, q_ref, s_ref, v_ref, y_ref):
        acc = jnp.zeros((R, C), jnp.float32)
        x = x_ref[...]
        for l in range(L):
            t = jnp.take_along_axis(x, q_ref[l], axis=0)
            acc += v_ref[l] * jnp.take_along_axis(t, s_ref[l], axis=1)
        y_ref[...] = acc

    pk_two = pl.pallas_call(
        k_two,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    try:
        dt = timeit(jax.jit(pk_two), X, Q, S, V)
        print(f"D pallas-two-stage: {dt*1e3:.3f} ms  "
              f"{elems/dt/1e9:.3f} Gelem/s", flush=True)
    except Exception as e:
        print("D pallas-two-stage FAILED:", str(e)[:300], flush=True)

    # --- E: current flat jnp.take path at same element count -------------
    n = R * C
    flat_idx = jnp.asarray(rng.integers(0, n, size=(n, L)).astype(np.int32))
    xf = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))

    @jax.jit
    def xla_take(xf, flat_idx, vf):
        return jnp.sum(vf * jnp.take(xf, flat_idx, axis=0), axis=1)

    dt = timeit(xla_take, xf, flat_idx, vf)
    print(f"E xla-flat-take: {dt*1e3:.3f} ms  "
          f"{elems/dt/1e9:.3f} Gelem/s", flush=True)


if __name__ == "__main__":
    main()
