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

    timeout 3000 python -u benchmarks/exp_hsolver_dev.py > /tmp/hsdev.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

C = 8        # Arnoldi steps per fused chunk (production fgmres_chunk)
NC = 4       # chunks chained back-to-back -> NC*C iterations/readback
R = 8        # chain length for the isolated stage programs


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

    def timeit(name, fn, *args, nit=1):
        try:
            h = np.asarray(fn(*args))
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return None
        assert np.all(np.isfinite(h)), (name, h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / nit
        print(f"{name}: {dt * 1e3:8.3f} ms/it", flush=True)
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
        @jax.jit
        def prec_chain(pair, lu, z0):
            def body(zc, _):
                v = sp.apply_with(pair, lu, zc)
                return zc + (1e-30 * v[0, 0, 0, 0, 0]) * jnp.ones_like(zc), \
                    v[0, 0, 0, 0, 0]
            return lax.scan(body, z0, None, length=R)[1]

        t_prec = timeit("  prec (ORAS fused)      ", prec_chain,
                        pair, lu, z, nit=R)

        # ---- stage 2: preconditioner + halo matvec --------------------
        @jax.jit
        def pm_chain(c, pair, lu, z0):
            def body(zc, _):
                v = sp.apply_with(pair, lu, zc)
                pp = mv(c, v)
                return zc + (1e-30 * pp[0, 0, 0, 0, 0]) * jnp.ones_like(zc), \
                    pp[0, 0, 0, 0, 0]
            return lax.scan(body, z0, None, length=R)[1]

        t_pm = timeit("  prec + ax_op           ", pm_chain,
                      coef, pair, lu, z, nit=R)

        # ---- stage 3: CGS tail on a K+1 basis --------------------------
        VV0 = jax.device_put(jnp.asarray(rng.standard_normal(
            (K + 1, 2, M, M, S, S)).astype(np.float32)))

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
            return lax.scan(body, p0, None, length=R)[1]

        t_cgs = timeit("  2-pass CGS + update    ", cgs_chain, VV0, z,
                       nit=R)

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

        @jax.jit
        def full_chain(c, pair_, lu_, b0):
            nb = norm(b0)
            VV = jnp.zeros((K + 1, 2, M, M, S, S), jnp.float32)
            VV = VV.at[0].set(b0 / nb.astype(b0.dtype))
            MV = jnp.zeros_like(VV)

            def body(carry, kk0):
                VV, MV = carry
                VV, MV, hs = chunk((c, pair_, lu_), VV, MV, kk0)
                return (VV, MV), hs
            (_VV, _MV), hs = lax.scan(body, (VV, MV),
                                      jnp.arange(NC) * C)
            return hs

        t_full = timeit(f"  FULL Arnoldi iteration ", full_chain,
                        coef, pair, lu, bg, nit=NC * C)

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
