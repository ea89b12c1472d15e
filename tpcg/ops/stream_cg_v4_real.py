"""VMEM-resident multi-iteration streaming CG for REAL systems.

Real single-plane twin of :mod:`tpcg.ops.stream_cg_v4`: one pallas call
runs K iterations with grid ``(K, 2, G)`` and the whole CG state in
VMEM scratch.  Real f32 planes are 4x smaller than the complex
two-plane pairs, so the budgets stretch much further: all of x/r/d/q
stay resident up to ~2400^2 nodes (N = 2048 parabolic_fem-class grids
included -- single stencil apply, ZERO steady-state HBM traffic), and
the recompute-q tier covers ~2900^2.

Semantics identical to ``stream_cg_real`` (same block order, same
accumulation order, same freeze guard) -- bit-exact at matched
block_rows, pinned by tests.  Serves the reference's real CG
(``kernel/real/*.cl``, ``clcg.c:111-466`` with isComplex=0) at sizes
beyond VMEM; residual history = sqrt(<r, r>) per iteration
(``cl.py:120``), fixed iteration count (``clcg.c:297``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .stream_cg import _check_block_rows, _pick_block_rows
from .stream_cg_real import (_boundary1, _build_k1_real_coef,
                             _build_k1_real_const, prepare_stream_real,
                             prepare_stream_coef_real)
from .stream_cg_v4 import _CHUNK, _KEEPQ_BYTES, _RESIDENT_BYTES, _chunks

_F = jnp.float32


def _build_resident_real(offsets, grid, Bv, K, keep_q, interpret,
                         taps=None, q_hbm=False):
    """K-iteration resident real kernel (taps None -> coef variant,
    requires keep_q).  step(op_arg, beta1, delta1, x, r, d, Sr, Sd) ->
    (xn, rn, dn, beta' (1,1), delta' (1,1), hist (K,1)).
    q_hbm (keep_q=False only): explicit-DMA q round-trip through an
    HBM buffer instead of the phase-1 recompute (see stream_cg_v4)."""
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)
    const = taps is not None
    assert const or keep_q, "coef variant requires keep_q"
    assert not (keep_q and q_hbm)
    if const:
        c, lc, rc = taps
        W = min(nh, 128)
        igroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if c[s] != 0.0:
                igroups.setdefault(c[s], []).append((dm, dj))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    if const:
        op_specs = [pl.BlockSpec((noff, 1, nh),
                                 lambda it, ph, j: (0, 0, 0))] * 2
    else:
        op_specs = [pl.BlockSpec(
            (noff, Bv, nh),
            lambda it, ph, j: (0, jnp.where(ph == 0, j, G - 1), 0))]
    r_in = pl.BlockSpec((Bv, nh),
                        lambda it, ph, j:
                        (jnp.where((it == 0) & (ph == 0), j, G - 1), 0))
    d_in = pl.BlockSpec((Bv, nh),
                        lambda it, ph, j:
                        (jnp.where((it == 0) & (ph == 0), j, G - 1), 0))
    x_in = pl.BlockSpec((Bv, nh),
                        lambda it, ph, j:
                        (jnp.where((it == 0) & (ph == 1), j,
                                   jnp.where(it == 0, 0, G - 1)), 0))
    s_p1 = pl.BlockSpec((1, 2 * P, nh),
                        lambda it, ph, j:
                        (jnp.where((it == 0) & (ph == 0),
                                   jnp.minimum(j + 1, G - 1), G - 1),
                         0, 0))
    x_out = pl.BlockSpec((Bv, nh),
                         lambda it, ph, j:
                         (jnp.where((it == K - 1) & (ph == 1), j, 0),
                          0))
    r_out = pl.BlockSpec((Bv, nh),
                         lambda it, ph, j:
                         (jnp.where((it == K - 1) & (ph == 1), j, 0),
                          0))
    d_out = pl.BlockSpec((Bv, nh),
                         lambda it, ph, j:
                         (jnp.where((it == K - 1) & (ph == 0), j,
                                    G - 1), 0))

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, ph, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(*refs):
        beta0_ref, delta0_ref = refs[0:2]
        nin = 9 if const else 8
        if const:
            sb_ref, st_ref = refs[2:4]
            x_ref, r_ref, d_ref, sr_ref, sd_ref = refs[4:9]
        else:
            coef_ref = refs[2]
            x_ref, r_ref, d_ref, sr_ref, sd_ref = refs[3:8]
        nout = 7 if q_hbm else 6
        outs = refs[nin:nin + nout]
        scr = refs[nin + nout:]
        if q_hbm:
            (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref, hist_ref,
             qo_ref) = outs
            x_scr, r_scr, d_scr, q_scr, dp, al, dqa, dda, bd, qb, \
                sems = scr
        else:
            (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref,
             hist_ref) = outs
            x_scr, r_scr, d_scr, q_scr, dp, al, dqa, dda, bd = scr
            qo_ref = qb = sems = None

        def q_out_dma(blk):
            return pltpu.make_async_copy(
                q_scr, qo_ref.at[pl.ds(blk * Bv, Bv), :], sems.at[2])

        def q_in_dma(blk, slot):
            return pltpu.make_async_copy(
                qo_ref.at[pl.ds(blk * Bv, Bv), :], qb.at[slot],
                sems.at[slot])
        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        def qrows():
            return pl.ds(j * Bv, Bv) if keep_q else slice(0, Bv)

        def emit_q():
            q = jnp.zeros((Bv, nh), _F)
            if const:
                for g, offs in igroups.items():
                    sx = dp[P + offs[0][0]:P + offs[0][0] + Bv,
                            P + offs[0][1]:P + offs[0][1] + nh]
                    for (dm, dj) in offs[1:]:
                        sx = sx + dp[P + dm:P + dm + Bv,
                                     P + dj:P + dj + nh]
                    q = q + g * sx
                q_scr[qrows(), :] = q
                lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
                lm = (lanes == 0).astype(_F)
                rm = (lanes == W - 1).astype(_F)
                alw = jnp.zeros((Bv, W), _F)
                arw = jnp.zeros((Bv, W), _F)
                for s, (dm, dj) in enumerate(offsets):
                    if lc[s] != 0.0:
                        alw = alw + lc[s] * dp[P + dm:P + dm + Bv,
                                               P + dj:P + dj + W]
                    if rc[s] != 0.0:
                        arw = arw + rc[s] * dp[P + dm:P + dm + Bv,
                                               P + nh - W + dj:
                                               P + nh + dj]
                q_scr[qrows(), 0:W] = q_scr[qrows(), 0:W] + alw * lm
                q_scr[qrows(), nh - W:nh] = \
                    q_scr[qrows(), nh - W:nh] + arw * rm
                rTl = (nv if keep_q else Bv) - 1

                @pl.when(j == 0)
                def _():
                    rb = jnp.zeros((1, nh), _F)
                    for s, (dm, dj) in enumerate(offsets):
                        rb = rb + sb_ref[s] * dp[P + dm:P + dm + 1,
                                                 P + dj:P + dj + nh]
                    q_scr[0:1, :] = q_scr[0:1, :] + rb

                @pl.when(j == G - 1)
                def _():
                    rt = jnp.zeros((1, nh), _F)
                    for s, (dm, dj) in enumerate(offsets):
                        rt = rt + st_ref[s] * dp[P + Bv - 1 + dm:
                                                 P + Bv + dm,
                                                 P + dj:P + dj + nh]
                    q_scr[rTl:rTl + 1, :] = q_scr[rTl:rTl + 1, :] + rt
            else:
                for s, (dm, dj) in enumerate(offsets):
                    q = q + coef_ref[s] * dp[P + dm:P + dm + Bv,
                                             P + dj:P + dj + nh]
                q_scr[qrows(), :] = q
            return q

        @pl.when((it == 0) & (ph == 0) & (j == 0))
        def _():
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = delta0_ref[0, 0]
            dp[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        @pl.when(ph == 0)
        def _():
            @pl.when(j == 0)
            def _():
                dqa[0, 0] = 0.0

            @pl.when(it == 0)
            def _():
                r_scr[pl.ds(j * Bv, Bv), :] = r_ref[...]
                d_scr[pl.ds(j * Bv, Bv), :] = d_ref[...]

            bt = bd[0, 0]
            dn = (r_scr[pl.ds(j * Bv, Bv), :]
                  + bt * d_scr[pl.ds(j * Bv, Bv), :])
            to = jnp.maximum(j * Bv - P, 0)
            dp[0:P, P:P + nh] = jnp.where(
                j > 0, d_scr[pl.ds(to, P), :], 0.0)
            dp[P:P + Bv, P:P + nh] = dn
            bo = jnp.minimum((j + 1) * Bv, nv - P)

            @pl.when(it == 0)
            def _():
                bh = sr_ref[0, 0:P, :] + bt * sd_ref[0, 0:P, :]
                dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bh, 0.0)

            @pl.when(it > 0)
            def _():
                bh = r_scr[pl.ds(bo, P), :] + bt * d_scr[pl.ds(bo, P), :]
                dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bh, 0.0)

            d_scr[pl.ds(j * Bv, Bv), :] = dn

            @pl.when(it == K - 1)
            def _():
                dn_ref[...] = dn

            if q_hbm:
                @pl.when(j > 0)
                def _():
                    q_out_dma(j - 1).wait()

            # dot form mirrors stream_cg_real exactly: const dots the
            # corrected read-back, coef dots the fused values
            qv = emit_q()
            if q_hbm:
                q_out_dma(j).start()
            qf = q_scr[qrows(), :] if const else qv
            dqa[0, 0] += jnp.sum(dn * qf)

            @pl.when(j == G - 1)
            def _():
                dq = dqa[0, 0]
                de = bd[1, 0]
                done = (de == 0.0) | (dq == 0.0)
                al[0, 0] = jnp.where(done, 0.0,
                                     de / jnp.where(done, 1.0, dq))
                al[1, 0] = jnp.where(done, 1.0, 0.0)

        @pl.when(ph == 1)
        def _():
            @pl.when(j == 0)
            def _():
                dda[0, 0] = 0.0

            a = al[0, 0]
            dn = d_scr[pl.ds(j * Bv, Bv), :]
            if q_hbm:
                slot = j % 2

                @pl.when(j == 0)
                def _():
                    q_out_dma(G - 1).wait()
                    q_in_dma(0, 0).start()

                @pl.when(j + 1 < G)
                def _():
                    q_in_dma(j + 1, (j + 1) % 2).start()

                q_in_dma(j, slot).wait()
            elif not keep_q:
                to = jnp.maximum(j * Bv - P, 0)
                bo = jnp.minimum((j + 1) * Bv, nv - P)
                dp[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[pl.ds(to, P), :], 0.0)
                dp[P:P + Bv, P:P + nh] = dn
                dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, d_scr[pl.ds(bo, P), :], 0.0)
                emit_q()
            q = qb[slot] if q_hbm else q_scr[qrows(), :]

            @pl.when(it == 0)
            def _():
                x_scr[pl.ds(j * Bv, Bv), :] = x_ref[...]

            nx = x_scr[pl.ds(j * Bv, Bv), :] + a * dn
            x_scr[pl.ds(j * Bv, Bv), :] = nx
            nr = r_scr[pl.ds(j * Bv, Bv), :] - a * q
            r_scr[pl.ds(j * Bv, Bv), :] = nr
            dda[0, 0] += jnp.sum(nr * nr)

            @pl.when(it == K - 1)
            def _():
                xn_ref[...] = nx
                rn_ref[...] = nr

            @pl.when(j == G - 1)
            def _():
                dnew = dda[0, 0]
                done = al[1, 0] > 0.5
                de = bd[1, 0]
                bd[0, 0] = jnp.where(
                    done, 0.0,
                    dnew / jnp.where(done | (de == 0.0), 1.0, de))
                bd[1, 0] = dnew
                hist_ref[it, 0] = jnp.sqrt(dnew)

                @pl.when(it == K - 1)
                def _():
                    betan_ref[0, 0] = bd[0, 0]
                    deltan_ref[0, 0] = dnew

    scratch = [pltpu.VMEM((nv, nh), _F),                      # x
               pltpu.VMEM((nv, nh), _F),                      # r
               pltpu.VMEM((nv, nh), _F),                      # d(new)
               pltpu.VMEM((nv if keep_q else Bv, nh), _F),    # q
               pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),      # dp
               pltpu.SMEM((2, 1), _F),                        # alpha+done
               pltpu.SMEM((1, 1), _F),                        # <d,q> acc
               pltpu.SMEM((1, 1), _F),                        # <r,r> acc
               pltpu.SMEM((2, 1), _F)]                        # beta,delta
    out_specs = [x_out, r_out, d_out, smem_out((1, 1)),
                 smem_out((1, 1)), smem_out((K, 1))]
    out_shape = [jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((1, 1), _F),
                 jax.ShapeDtypeStruct((1, 1), _F),
                 jax.ShapeDtypeStruct((K, 1), _F)]
    if q_hbm:
        scratch = scratch + [pltpu.VMEM((2, Bv, nh), _F),
                             pltpu.SemaphoreType.DMA((3,))]
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((nv, nh), _F))

    def step(op_arg, beta1, delta1, x, r, d, Sr, Sd):
        ops = list(op_arg) if const else [op_arg]
        ret = pl.pallas_call(
            kernel,
            grid=(K, 2, G),
            in_specs=[smem_in, smem_in] + op_specs
            + [x_in, r_in, d_in, s_p1, s_p1],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, *ops, x, r, d, Sr, Sd)
        return ret[:6] if q_hbm else ret

    return step


def _v4_loop_real(get_step, init_k1, op_init, op_arg, bp, x0p,
                  n_iterations, nv, nh, G, Bv, P, chunk):
    zero1 = jnp.zeros((1, 1), _F)
    one1 = jnp.ones((1, 1), _F)
    zeros_v = jnp.zeros((nv, nh), _F)
    zeros_s = jnp.zeros((G, 2 * P, nh), _F)

    Sx0 = _boundary1(x0p, G, Bv, P, nh)
    _, q0, _, _ = init_k1(op_init, zero1, one1, x0p, zeros_v, Sx0,
                          zeros_s)
    r0 = bp - q0
    delta0 = jnp.sum(r0 * r0)

    x, r, d = x0p, r0, zeros_v
    Sr, Sd = _boundary1(r0, G, Bv, P, nh), zeros_s
    beta1, delta1 = zero1, delta0.reshape(1, 1)
    hists = [jnp.sqrt(delta0)[None]]
    sizes = _chunks(n_iterations, chunk)
    for i, K in enumerate(sizes):
        step = get_step(K)
        x, r, d, beta1, delta1, hk = step(op_arg, beta1, delta1, x, r,
                                          d, Sr, Sd)
        if i + 1 < len(sizes):
            Sr = _boundary1(r, G, Bv, P, nh)
            Sd = _boundary1(d, G, Bv, P, nh)
        hists.append(hk[:, 0])
    return x, jnp.concatenate(hists)


def _fits_keep_q(nv, nh):
    return 4 * nv * nh * 4 <= _KEEPQ_BYTES


def stream_cg_v4_real_planes(offsets, grid, taps, strips2, bp, x0p,
                             n_iterations: int, block_rows: int = None,
                             keep_q: bool = None, q_hbm: bool = False,
                             chunk: int = _CHUNK,
                             interpret: bool = False):
    """VMEM-resident const-tap real streaming CG.  Same contract as
    ``stream_cg_real_planes``; ``q_hbm`` (keep_q=False only) replaces
    the phase-1 recompute with an explicit-DMA HBM round-trip of q."""
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v4_real_planes")
    G = nv // Bv
    if keep_q is None:
        keep_q = _fits_keep_q(nv, nh)
    if keep_q:
        q_hbm = False
    if not keep_q and 3 * nv * nh * 4 > _RESIDENT_BYTES:
        raise ValueError(
            f"grid {grid} exceeds the v4 resident VMEM budget; use "
            "stream_cg_real (plan_stencil_cg picks automatically)")
    init_k1 = _build_k1_real_const(offsets, grid, taps, Bv, interpret)
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_resident_real(offsets, grid, Bv, K,
                                            keep_q, interpret,
                                            taps=taps, q_hbm=q_hbm)
        return steps[K]

    return _v4_loop_real(get_step, init_k1, strips2, strips2, bp, x0p,
                         n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v4_real_coef_planes(offsets, grid, coefp, bp, x0p,
                                  n_iterations: int,
                                  block_rows: int = None,
                                  chunk: int = _CHUNK,
                                  interpret: bool = False):
    """VMEM-resident per-node-coefficient real streaming CG (requires
    the keep_q budget; coefficients stream once per iteration)."""
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v4_real_coef_planes")
    G = nv // Bv
    if not _fits_keep_q(nv, nh):
        raise ValueError(
            f"grid {grid} exceeds the v4 keep_q VMEM budget (the coef "
            "variant cannot recompute q without re-streaming the "
            "coefficients); use stream_cg_real")
    init_k1 = _build_k1_real_coef(offsets, grid, Bv, interpret)
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_resident_real(offsets, grid, Bv, K, True,
                                            interpret, taps=None)
        return steps[K]

    return _v4_loop_real(get_step, init_k1, coefp, coefp, bp, x0p,
                         n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v4_real(stencil, b, x0=None, n_iterations: int = 10,
                      block_rows: int = None, chunk: int = _CHUNK,
                      interpret: bool = False, const_taps: bool = None):
    """Convenience wrapper: real (Nv, Nh) grid in / out."""
    nv, nh = stencil.grid
    b = np.asarray(b).reshape(nv, nh).astype(np.float32)
    bp = jnp.asarray(b)
    x0p = (jnp.zeros((nv, nh), np.float32) if x0 is None
           else jnp.asarray(np.asarray(x0).reshape(nv, nh)
                            .astype(np.float32)))
    if const_taps is not False:
        try:
            taps, strips2 = prepare_stream_real(stencil)
            return stream_cg_v4_real_planes(
                stencil.offsets, stencil.grid, taps, strips2, bp, x0p,
                n_iterations, block_rows=block_rows, chunk=chunk,
                interpret=interpret)
        except ValueError:
            if const_taps is True:
                raise
    coefp = prepare_stream_coef_real(stencil)
    return stream_cg_v4_real_coef_planes(
        stencil.offsets, stencil.grid, coefp, bp, x0p, n_iterations,
        block_rows=block_rows, chunk=chunk, interpret=interpret)
