"""Routing-SpMV round 3: two-stages-per-pass fusion + deep RHS batching.

Round-4 attribution (exp_route2.py): production 3.63 ms/SpMV on the
m_t1-class = 1.95 ms irreducible roll movement + 1.68 ms select/unpack;
b=4 batching amortizes to 2.25 ms/RHS.  Two follow-ups from the round-4
verdict:

1. **two-stage fusion** -- compose adjacent butterfly stages so the
   select/unpack overhead is paid once per PAIR.  The algebra is
   pre-committed here so the measurement is honest: t2[j] picks from
   {t0[j], t0[j^s1], t0[j^s2], t0[j^s1^s2]}, and materializing the
   composite partner costs 6 f32 rolls + 2 mask rolls + 7 selects per
   pair vs the sequential 4 rolls + 4 selects -- MORE of the measured
   movement floor, not less.  Expected SLOWER; measured to close the
   verdict item with data rather than arithmetic.

2. **deeper RHS batches** -- b=8 / b=16 single-pass blocks (round 4
   measured only b=4).  The mask stream and unpack amortize ~b-fold;
   the resident t/y planes grow linearly (b=16 -> 16 MB of state on
   the m_t1 grid, still comfortably VMEM).

Also prints the per-(layer, stage) exchange-activity fraction: if many
stages were identity, a host-precomputed skip table could gate whole
stages; the number decides whether that path is worth building.

    timeout 3600 python -u benchmarks/exp_route3.py > /tmp/r3.log 2>&1
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
    from tpcg.ops.route_spmv import (C, DeviceRouted, STAGES_PER_WORD,
                                     _routed_kernel_call, _stage)
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

    # stage-activity stats: fraction of (layer, stage) pairs with ANY
    # exchange, and the mean per-stage exchange density
    act = (R.masks != 0)
    stage_any = act.any(axis=2)
    print(f"# stage activity: {stage_any.mean() * 100:.1f}% of "
          f"(layer,stage) pairs exchange at all; mean exchange density "
          f"{act.mean() * 100:.1f}%", flush=True)

    D = DeviceRouted(R)
    masks, vals = jax.device_put(D.masks), jax.device_put(D.vals)
    L, W, rows, _ = D.masks.shape
    strides = benes_strides(rows * C)
    nnz = Ar.nnz

    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    xp = jnp.zeros(D.m, jnp.float32).at[:n].set(jnp.asarray(x))
    xg = jax.device_put(xp.reshape(rows, C))
    ref = Ar @ x

    def gate(name, y):
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 1e-4, (name, rel)
        print(f"# {name} rel err {rel:.2e}", flush=True)

    # ---- two-stage fused kernel ---------------------------------------
    def fused2_call(masks, vals, xg):
        def roll_pair(t, s, ax_rows):
            if s < C:
                return (pltpu.roll(t, C - s, 1), pltpu.roll(t, s, 1))
            return (pltpu.roll(t, ax_rows - s // C, 0),
                    pltpu.roll(t, s // C, 0))

        def kernel(x_ref, m_ref, v_ref, y_ref):
            l = pl.program_id(0)

            @pl.when(l == 0)
            def _():
                y_ref[...] = jnp.zeros(y_ref.shape, jnp.float32)

            t = x_ref[...]
            lane = lax.broadcasted_iota(jnp.int32, (rows, C), 1)
            row = lax.broadcasted_iota(jnp.int32, (rows, C), 0)
            side = {s: ((lane & s) == 0 if s < C
                        else (row & (s // C)) == 0)
                    for s in set(strides)}

            def ex_of(k):
                word = m_ref[0, k // STAGES_PER_WORD]
                return jax.lax.shift_right_logical(
                    word, jnp.int32(k % STAGES_PER_WORD)) & 1

            k = 0
            while k < len(strides):
                if k + 1 >= len(strides):
                    t = _stage(t, ex_of(k), strides[k], rows,
                               side[strides[k]])
                    k += 1
                    continue
                s1, s2 = strides[k], strides[k + 1]
                ex1, ex2 = ex_of(k), ex_of(k + 1)
                # partner planes: P1[j] = t0[j^s1]
                u, d = roll_pair(t, s1, rows)
                P1 = jnp.where(side[s1], u, d)
                # t1 at j and at j^s2
                t1 = jnp.where(ex1 == 1, P1, t)
                u, d = roll_pair(t, s2, rows)
                t0_s2 = jnp.where(side[s2], u, d)
                u, d = roll_pair(P1, s2, rows)
                P1_s2 = jnp.where(side[s2], u, d)
                u, d = roll_pair(ex1, s2, rows)
                ex1_s2 = jnp.where(side[s2], u, d)
                t1_s2 = jnp.where(ex1_s2 == 1, P1_s2, t0_s2)
                t = jnp.where(ex2 == 1, t1_s2, t1)
                k += 2
            y_ref[...] = y_ref[...] + v_ref[0] * t

        xspec = pl.BlockSpec(xg.shape, lambda l: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[
                xspec,
                pl.BlockSpec((1, W, rows, C), lambda l: (l, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, C), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(xg.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xg, masks, vals)

    # correctness gates
    y = np.asarray(jax.jit(
        lambda m, v, g: _routed_kernel_call(m, v, g, False)
    )(masks, vals, xg)).reshape(-1)[:n]
    gate("production", y)
    try:
        y2 = np.asarray(jax.jit(fused2_call)(masks, vals, xg)) \
            .reshape(-1)[:n]
        gate("fused-2stage", y2)
        fused_ok = True
    except Exception as ex:
        print(f"# fused-2stage FAILED {type(ex).__name__}: "
              f"{str(ex)[:140]}", flush=True)
        fused_ok = False

    # slope over two chain lengths: the fixed ~27 ms readback otherwise
    # charges 27/REPS ms to every SpMV (verify SKILL.md)
    REPS1, REPS2 = 10, 50

    def timeit(name, call, args, nrhs=1):
        def make(REPS):
            @jax.jit
            def many(*a):
                def body(g, _):
                    out = call(*a[:-1], g)
                    return out * 1e-20 + a[-1], out[..., 0, 0]
                return lax.scan(body, a[-1], None, length=REPS)[1]
            return many

        t = {}
        for REPS in (REPS1, REPS2):
            many = make(REPS)
            r0 = np.asarray(many(*args))
            assert np.all(np.isfinite(r0)), (name, r0)
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(many(*args))
                ts.append(time.perf_counter() - t0)
            t[REPS] = min(ts)
        dt = (t[REPS2] - t[REPS1]) / (REPS2 - REPS1) / nrhs
        gf = (2 * nnz + 2 * n) / dt / 1e9
        print(f"{name:14s}: {dt * 1e3:6.2f} ms/SpMV/RHS   "
              f"{gf:5.1f} GFLOPS", flush=True)
        return dt

    timeit("production",
           lambda m, v, g: _routed_kernel_call(m, v, g, False),
           (masks, vals, xg))
    if fused_ok:
        timeit("fused-2stage", fused2_call, (masks, vals, xg))
    for b in (4, 8, 16):
        xb = jax.device_put(
            jnp.stack([xg * (1.0 + 0.01 * i) for i in range(b)]))
        timeit(f"batch-b{b}",
               lambda m, v, g: _routed_kernel_call(m, v, g, False),
               (masks, vals, xb), nrhs=b)


if __name__ == "__main__":
    sys.exit(main())
