"""Routing-SpMV stage-cost attribution (VERDICT round-3 weak #4).

Where does the routed SpMV's time go?  Three kernel variants on the
m_t1-class random matrix (n=97,578, ~100 nnz/row -> L layers x S Benes
stages on a (rows, 128) grid):

  production : the shipping kernel (mask stream + unpack + selects)
  rolls-only : the butterfly's DATA MOVEMENT alone -- same two
               pltpu.rolls per stage, no mask input/unpack/select.
               This is the irreducible cost of Benes routing at this
               size; the gap to production is everything selects/unpack
               could ever save.
  batch b=4  : the production kernel carrying a (4, rows, 128) RHS
               block -- masks/side-masks amortize across the block.

Timing: N back-to-back SpMVs chained through the output inside one jit
(one readback; single calls are tunnel-RT dominated, see
.claude/skills/verify/SKILL.md).  The production variant is correctness
-gated against scipy first.

    timeout 3600 python -u benchmarks/exp_route2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_general_sparse import random_spd  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import tpcg.ops.routing as rt
    from tpcg.ops.route_spmv import (C, DeviceRouted, _routed_kernel_call,
                                     _stage)
    from tpcg.ops.routing import benes_strides

    n = 97578
    Ar = random_spd(n, 100)
    cache = os.path.join(os.path.dirname(__file__),
                         f"_routed_{n}_{Ar.nnz}.npz")
    t0 = time.perf_counter()
    if os.path.exists(cache):
        z = np.load(cache)
        R = rt.RoutedSpmv(masks=z["masks"], vals=z["vals"], n=int(z["n"]))
    else:
        R = rt.build_routing_spmv(Ar.astype(np.float32))
        np.savez(cache, masks=R.masks, vals=R.vals, n=R.n)
    print(f"# preprocessing/load: {time.perf_counter() - t0:.1f}s, "
          f"{R.n_layers} layers, m={R.m}", flush=True)
    D = DeviceRouted(R)
    masks, vals = jax.device_put(D.masks), jax.device_put(D.vals)
    L, W, rows, _ = D.masks.shape
    strides = benes_strides(rows * C)
    nnz = Ar.nnz
    print(f"# L={L} layers x {len(strides)} stages, grid ({rows},{C})",
          flush=True)

    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    xp = jnp.zeros(D.m, jnp.float32).at[:n].set(jnp.asarray(x))
    xg = jax.device_put(xp.reshape(rows, C))

    # correctness gate on the production kernel
    y = np.asarray(jax.jit(
        lambda m, v, g: _routed_kernel_call(m, v, g, False)
    )(masks, vals, xg)).reshape(-1)[:n]
    ref = Ar @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel
    print(f"# production matvec rel err {rel:.2e}", flush=True)

    def rolls_only_call(vals, xg):
        """Movement floor: both rolls per stage, sum, no masks."""
        def kernel(x_ref, v_ref, y_ref):
            l = pl.program_id(0)

            @pl.when(l == 0)
            def _():
                y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)

            t = x_ref[...]
            for s in strides:
                if s < C:
                    up = pltpu.roll(t, C - s, 1)
                    dn = pltpu.roll(t, s, 1)
                else:
                    up = pltpu.roll(t, rows - s // C, 0)
                    dn = pltpu.roll(t, s // C, 0)
                t = 0.5 * (up + dn)
            y_ref[...] = y_ref[...] + v_ref[0] * t

        xspec = pl.BlockSpec(xg.shape, lambda l: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[xspec,
                      pl.BlockSpec((1, rows, C), lambda l: (l, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(xg.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xg, vals)

    REPS = 50

    def timeit(name, call, args, nrhs=1):
        @jax.jit
        def many(*a):
            def body(g, _):
                out = call(*a[:-1], g)
                # feed the output back in so XLA cannot collapse reps
                return out * 1e-20 + a[-1], out[..., 0, 0]
            return lax.scan(body, a[-1], None, length=REPS)[1]

        r0 = np.asarray(many(*args))
        assert np.all(np.isfinite(r0)), (name, r0)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(many(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / REPS / nrhs
        gf = (2 * nnz + 2 * n) / dt / 1e9
        print(f"{name:12s}: {dt * 1e3:6.2f} ms/SpMV/RHS   "
              f"{gf:5.1f} GFLOPS", flush=True)
        return dt

    timeit("production",
           lambda m, v, g: _routed_kernel_call(m, v, g, False),
           (masks, vals, xg))
    timeit("rolls-only", lambda v, g: rolls_only_call(v, g),
           (vals, xg))

    xb = jnp.stack([xg * (1.0 + 0.01 * i) for i in range(4)])
    xb = jax.device_put(xb)
    timeit("batch-b4",
           lambda m, v, g: _routed_kernel_call(m, v, g, False),
           (masks, vals, xb), nrhs=4)


if __name__ == "__main__":
    sys.exit(main())
