"""Device-time attribution of a FULL distributed FGMRES iteration.

Round-4 measured the ORAS preconditioner application alone (4.04 /
5.62 ms chained at M=2 / M=4, ``exp_prec_tpu.py``) and wall-clock
iteration times that are tunnel-dominated (~86 ms/it,
``exp_hsolver_tpu.py``).  This probe closes the gap: it chains WHOLE
fused Arnoldi chunks (the exact per-chunk recursion of
``tpcg.parallel.fgmres`` chunk mode: preconditioner, halo matvec,
2-pass classical Gram-Schmidt, basis update) back-to-back in ONE device
program with one readback, plus isolated stage programs, so the full
per-iteration device cost decomposes as

    total = prec + ax_op + (CGS dots + lincombs + basis update)

Setup is hsolver's own builder path (``build_operator`` /
``build_preconditioner`` / ``SchwarzPrec``) at the reference protocol
configs M=2/M=4, W=34, CGMaxIT=256, k=20 (``p_h-PY_C-CL-multi-GPU.py:
3607, 3639-3675``; timing protocol :3708-3712, 1807-1827).  Planes
layout, fused-Pallas subdomain CG (the production single-device path).

Timing is SLOPE-based: every program is measured at two chain lengths
and the per-step cost is (t(L2) - t(L1)) / (L2 - L1).  A single
readback through the tunnel costs a fixed ~28 ms (verify SKILL.md /
exp_floor.py); dividing one run by its chain length adds 28/L ms of
phantom per-step cost -- at L=8 that is +3.5 ms/it, LARGER than the
true stage costs here (it made the round-4 exp_prec_tpu numbers ~8x
too big and this probe's first draft attributed negative time to
ax_op).  The slope cancels every fixed term exactly.

    timeout 3000 python -u benchmarks/exp_hsolver_dev.py > /tmp/hsdev.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

C = 8        # Arnoldi steps per fused chunk (production fgmres_chunk)
NC = 4       # chunks per Arnoldi program -> K = NC*C Krylov budget
L1, L2 = 2, 8   # chain lengths for the slope (stage = L scan steps;
                # full = L whole K-iteration Arnoldi restarts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.parallel import Decomposition, SchwarzPrec, make_partition
    from tpcg.parallel.fgmres import _lincomb_dev_planes
    from tpcg.parallel.hsolver import (build_operator,
                                       build_preconditioner)
    from tpcg.utils.config import HelmholtzConfig

    K = NC * C   # Krylov budget for the chained-chunk program

    def timeit(name, make_fn, *args, per_step=1):
        """Slope timing: make_fn(L) -> jitted chain of L steps; cost of
        one step = (min-of-3 t(L2) - min-of-3 t(L1)) / (L2 - L1), then
        / per_step inner iterations."""
        try:
            fns = {L: make_fn(L) for L in (L1, L2)}
            hs = {L: np.asarray(fns[L](*args)) for L in (L1, L2)}
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return None
        for L in (L1, L2):
            assert np.all(np.isfinite(hs[L])), (name, L, hs[L])
        t = {}
        for L in (L1, L2):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fns[L](*args))
                ts.append(time.perf_counter() - t0)
            t[L] = min(ts)
        dt = (t[L2] - t[L1]) / (L2 - L1) / per_step
        print(f"{name}: {dt * 1e3:8.3f} ms/it  "
              f"(slope over L={L1}/{L2}; raw {t[L1] * 1e3:.1f}/"
              f"{t[L2] * 1e3:.1f} ms)", flush=True)
        return dt

    for M in (2, 4):
        cfg = HelmholtzConfig(k=20.0, M_subd=M, W_subd=34, use_cg=2,
                              cg_max_it=256)
        part = make_partition(cfg.M_subd, cfg.W_subd, cfg.overlap)
        decomp = Decomposition(part)
        S = part.sdsz
        Sglob, coef_np, b_global = build_operator(cfg, decomp)
        offsets = Sglob.offsets
        coef = jax.device_put(jnp.asarray(np.stack(
            [coef_np.real, coef_np.imag,
             coef_np.real + coef_np.imag]).astype(np.float32)))
        P_block = build_preconditioner(cfg, decomp, coef_np, offsets)
        sp = SchwarzPrec(decomp, P_block, method="block_cg",
                         cg_iterations=cfg.cg_max_it, cg_tol=cfg.cg_tol,
                         restricted=True, averaging=True, planes=True,
                         kernel="fused")
        assert not isinstance(sp._pair, tuple)
        wdot = decomp.wdot_planes
        norm = decomp.norm_planes

        rng = np.random.default_rng(0)
        z = jax.device_put(jnp.asarray(
            rng.standard_normal((2, M, M, S, S)).astype(np.float32)))
        pair, lu = jax.device_put(sp._pair), jax.device_put(sp._lu)

        def mv(c, x):
            return decomp.ax_op_planes(c, offsets, x)

        print(f"== M={M} W=34 S={S} nsubd={M * M} CGMaxIT=256 "
              f"chunk={C} ==", flush=True)

        # ---- stage 1: preconditioner alone (exp_prec_tpu twin) -------
        def make_prec(L):
            @jax.jit
            def prec_chain(pair, lu, z0):
                def body(zc, _):
                    v = sp.apply_with(pair, lu, zc)
                    return zc + (1e-30 * v[0, 0, 0, 0, 0]) \
                        * jnp.ones_like(zc), v[0, 0, 0, 0, 0]
                return lax.scan(body, z0, None, length=L)[1]
            return prec_chain

        t_prec = timeit("  prec (ORAS fused)      ", make_prec,
                        pair, lu, z)

        # ---- stage 2: preconditioner + halo matvec --------------------
        def make_pm(L):
            @jax.jit
            def pm_chain(c, pair, lu, z0):
                def body(zc, _):
                    v = sp.apply_with(pair, lu, zc)
                    pp = mv(c, v)
                    return zc + (1e-30 * pp[0, 0, 0, 0, 0]) \
                        * jnp.ones_like(zc), pp[0, 0, 0, 0, 0]
                return lax.scan(body, z0, None, length=L)[1]
            return pm_chain

        t_pm = timeit("  prec + ax_op           ", make_pm,
                      coef, pair, lu, z)

        # ---- stage 3: CGS tail on a K+1 basis --------------------------
        VV0 = jax.device_put(jnp.asarray(rng.standard_normal(
            (K + 1, 2, M, M, S, S)).astype(np.float32)))

        def make_cgs(L):
            @jax.jit
            def cgs_chain(VV, p0):
                active = jnp.ones((K + 1,), jnp.float32)

                def body(pc, _):
                    d1 = wdot(VV, pc) * active
                    pp = pc - _lincomb_dev_planes(d1, VV)
                    d2 = wdot(VV, pp) * active
                    pp = pp - _lincomb_dev_planes(d2, VV)
                    h = norm(pp)
                    safe = jnp.where(h == 0, 1.0, h)
                    return pp / safe.astype(pp.dtype), h
                return lax.scan(body, p0, None, length=L)[1]
            return cgs_chain

        t_cgs = timeit("  2-pass CGS + update    ", make_cgs, VV0, z)

        # ---- full fused Arnoldi chunks, chained ------------------------
        def chunk(ops, VV, MV, kk0):
            c, pair_, lu_ = ops
            hsubs = []
            for t in range(C):
                kk = kk0 + t
                zz = VV[kk]
                v = sp.apply_with(pair_, lu_, zz)
                active = (jnp.arange(K + 1) <= kk).astype(jnp.float32)
                MV = MV.at[kk].set(v)
                pp = mv(c, v)
                d1 = wdot(VV, pp) * active
                pp = pp - _lincomb_dev_planes(d1, VV)
                d2 = wdot(VV, pp) * active
                pp = pp - _lincomb_dev_planes(d2, VV)
                h_sub = jnp.asarray(norm(pp))
                safe = jnp.where(h_sub == 0, jnp.ones_like(h_sub), h_sub)
                VV = VV.at[kk + 1].set(pp / safe.astype(pp.dtype))
                hsubs.append(h_sub)
            return VV, MV, jnp.stack(hsubs)

        b = jnp.asarray(np.stack(
            [np.asarray(b_global.real), np.asarray(b_global.imag)]))
        bg = jax.device_put(jnp.asarray(np.stack(
            [decomp.crop_grid(b_global).real,
             decomp.crop_grid(b_global).imag]).astype(np.float32)))

        def make_full(L):
            # L whole K-iteration Arnoldi programs restarted
            # back-to-back (b perturbed so XLA cannot CSE the restarts);
            # per-step = one K-iteration Arnoldi, so per_step=K inner
            # iterations in the slope
            @jax.jit
            def full_chain(c, pair_, lu_, b0):
                def restart(bc, _):
                    nb = norm(bc)
                    VV = jnp.zeros((K + 1, 2, M, M, S, S), jnp.float32)
                    VV = VV.at[0].set(bc / nb.astype(bc.dtype))
                    MV = jnp.zeros_like(VV)

                    def body(carry, kk0):
                        VV, MV = carry
                        VV, MV, hs = chunk((c, pair_, lu_), VV, MV, kk0)
                        return (VV, MV), hs
                    (VV, _MV), hs = lax.scan(body, (VV, MV),
                                             jnp.arange(NC) * C)
                    return bc + (1e-30 * jnp.ravel(hs)[-1]) \
                        * jnp.ones_like(bc), hs
                return lax.scan(restart, b0, None, length=L)[1]
            return full_chain

        t_full = timeit(f"  FULL Arnoldi iteration ", make_full,
                        coef, pair, lu, bg, per_step=K)

        if None not in (t_prec, t_pm, t_cgs, t_full):
            t_ax = t_pm - t_prec
            t_other = t_full - t_pm
            print(f"  attribution: prec {t_prec * 1e3:.3f} ms "
                  f"({100 * t_prec / t_full:.0f}%), ax_op "
                  f"{t_ax * 1e3:.3f} ms ({100 * t_ax / t_full:.0f}%), "
                  f"CGS/update {t_other * 1e3:.3f} ms "
                  f"({100 * t_other / t_full:.0f}%)  "
                  f"[isolated CGS: {t_cgs * 1e3:.3f} ms]", flush=True)


if __name__ == "__main__":
    sys.exit(main())
