"""HBM-streaming fused CG for REAL stencil systems (large N).

Real twin of :mod:`tpcg.ops.stream_cg`: CG state (x, r, d, q) is single
float32 planes in HBM and each iteration is exactly two grid-blocked
Pallas kernels with zero per-iteration XLA glue -- in-kernel SMEM
alpha/beta, boundary rows travelling through side outputs read by the
neighbouring block via shifted BlockSpec index maps.

  K1:  d_new = r + beta * d     (block rows + P halo rows)
       q     = A d_new
       dq    = <d_new, q>       (SMEM accumulator)
       alpha = delta / dq       (last grid step)
  K2:  x    += alpha * d_new
       r    -= alpha * q
       delta'= <r, r>
       beta  = delta' / delta   (last grid step)

Two coefficient modes, mirroring the complex module:
  * const taps  : interior coefficients are compile-time scalars; the
    boundary deviations stream as four thin strips (rows as (1, Nh)
    strips, columns as masked W=128-wide edge blocks).  5 state-plane
    HBM moves per unknown per iteration, zero matrix traffic.
  * coef planes : per-node (noff, Nv, Nh) coefficients ride the same
    row-block pipeline (variable-coefficient / general real stencils).

Serves the reference's real CG configurations (``kernel/real/*.cl``,
``clcg.c:111-466`` with isComplex=0) at sizes beyond VMEM: Poisson
(``p_h-PY_C-CL-multi-GPU.py:1637-1677``) and parabolic_fem-class FE
bands (report Table I).  Residual-history semantics identical to
``tpcg.cg.block_cg`` (fixed iteration count, exact-convergence freeze
guard, delta = <r, r>, history = sqrt(delta)).
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

_F = jnp.float32


def _boundary1(v, G, Bv, P, nh):
    """(nv, nh) -> (G, 2P, nh): each block's own first/last P rows."""
    v3 = v.reshape(G, Bv, nh)
    return jnp.concatenate([v3[:, :P, :], v3[:, Bv - P:, :]], axis=1)


def split_const_stencil_real(stencil):
    """Real Stencil2D -> (const taps (noff,), strips dict) -- same
    contract as ``fused_cg_const.split_const_stencil`` but float."""
    c = np.asarray(stencil.coef)
    assert not np.iscomplexobj(c), "use tpcg.ops.stream_cg for complex"
    noff, nv, nh = c.shape
    interior = c[:, 2:-2, 2:-2]
    consts = interior[:, 0, 0].copy()
    if not np.allclose(interior, consts[:, None, None], rtol=1e-12,
                       atol=1e-14):
        raise ValueError("stencil interior is not constant-coefficient")
    full = np.broadcast_to(consts[:, None, None], c.shape)
    delta = c - full
    if not np.allclose(delta[:, 1:-1, 1:-1], 0.0, atol=1e-14):
        raise ValueError("boundary deviation wider than one ring")
    strips = {
        "bot": delta[:, 0, :].copy(),
        "top": delta[:, nv - 1, :].copy(),
        "left": delta[:, 1:nv - 1, 0].copy(),
        "right": delta[:, 1:nv - 1, nh - 1].copy(),
    }
    return consts, strips


def prepare_stream_real(stencil, dtype=np.float32):
    """Host-side preprocessing for the const-tap real streaming path.

    Returns (taps, strips2): taps = (c, lc, rc) python float tuples
    (interior + left/right edge taps); strips2 = (sb, st) jnp
    (noff, 1, Nh) bottom/top row corrections with the corner lanes
    adjusted for the uniform edge application (exactly the complex
    module's scheme).  Raises ValueError for non-constant edges.
    """
    consts, strips = split_const_stencil_real(stencil)
    nh = stencil.grid[1]

    def _edge_const(a, name):
        if not np.allclose(a, a[:, :1], rtol=1e-12, atol=1e-14):
            raise ValueError(f"{name} edge coefficients not constant")
        return a[:, 0].copy()

    lc = _edge_const(strips["left"], "left")
    rc = _edge_const(strips["right"], "right")
    sb = strips["bot"].copy()
    st = strips["top"].copy()
    sb[:, 0] -= lc
    sb[:, nh - 1] -= rc
    st[:, 0] -= lc
    st[:, nh - 1] -= rc
    taps = (tuple(float(v) for v in consts),
            tuple(float(v) for v in lc),
            tuple(float(v) for v in rc))
    strips2 = (jnp.asarray(sb[:, None, :].astype(dtype)),
               jnp.asarray(st[:, None, :].astype(dtype)))
    return taps, strips2


def prepare_stream_coef_real(stencil, dtype=np.float32):
    """(noff, Nv, Nh) coefficient planes (pass as a jit ARGUMENT)."""
    c = np.asarray(stencil.coef)
    assert not np.iscomplexobj(c)
    return jnp.asarray(c.astype(dtype))


def _specs(G, Bv, P, nh, noff):
    blk = pl.BlockSpec((Bv, nh), lambda i: (i, 0))
    sblk = pl.BlockSpec((1, 2 * P, nh), lambda i: (i, 0, 0))
    sblk_m1 = pl.BlockSpec((1, 2 * P, nh),
                           lambda i: (jnp.maximum(i - 1, 0), 0, 0))
    sblk_p1 = pl.BlockSpec((1, 2 * P, nh),
                           lambda i: (jnp.minimum(i + 1, G - 1), 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    return blk, sblk, sblk_m1, sblk_p1, smem_in, smem_out


def _k1_head(beta_ref, r_ref, d_ref, srm_ref, srp_ref, sdm_ref, sdp_ref,
             dnew_ref, sdn_ref, dp, i, G, Bv, P, nh):
    """Shared K1 prologue: d_new on block + halo rows, staged into the
    padded scratch; boundary side output."""
    bt = beta_ref[0, 0]
    tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
    bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
    dn = r_ref[...] + bt * d_ref[...]
    trow = tm * (srm_ref[0, P:2 * P, :] + bt * sdm_ref[0, P:2 * P, :])
    brow = bm * (srp_ref[0, 0:P, :] + bt * sdp_ref[0, 0:P, :])
    dnew_ref[...] = dn
    sdn_ref[0, 0:P, :] = dn[0:P]
    sdn_ref[0, P:2 * P, :] = dn[Bv - P:Bv]
    dp[0:P, P:P + nh] = trow
    dp[P:P + Bv, P:P + nh] = dn
    dp[P + Bv:2 * P + Bv, P:P + nh] = brow
    return dn


def _k1_tail(q, dn, q_ref, dq_acc, al_ref, delta_ref, i, G):
    """Shared K1 epilogue: write q, accumulate <d, q>, alpha at the
    last grid step with the exact-convergence freeze guard."""
    q_ref[...] = q
    dq_acc[0, 0] += jnp.sum(dn * q)

    @pl.when(i == G - 1)
    def _():
        dq = dq_acc[0, 0]
        de = delta_ref[0, 0]
        done = (de == 0.0) | (dq == 0.0)
        al_ref[0, 0] = jnp.where(done, 0.0, de / jnp.where(done, 1.0, dq))
        al_ref[1, 0] = jnp.where(done, 1.0, 0.0)


def _build_k1_real_const(offsets, grid, taps, Bv, interpret=False):
    """Const-tap K1: q = A d via compile-time scalars + strip/edge
    corrections (taps with equal coefficients grouped)."""
    nv, nh = grid
    c, lc, rc = taps
    P = _pad_for(offsets)
    G = nv // Bv
    W = min(nh, 128)
    noff = len(offsets)
    blk, sblk, sblk_m1, sblk_p1, smem_in, smem_out = _specs(
        G, Bv, P, nh, noff)
    strip = pl.BlockSpec((noff, 1, nh), lambda i: (0, 0, 0))

    def k1_kernel(beta_ref, delta_ref, r_ref, d_ref, srm_ref, srp_ref,
                  sdm_ref, sdp_ref, sb_ref, st_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dp, dq_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dq_acc[0, 0] = 0.0
            dp[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        dn = _k1_head(beta_ref, r_ref, d_ref, srm_ref, srp_ref,
                      sdm_ref, sdp_ref, dnew_ref, sdn_ref, dp,
                      i, G, Bv, P, nh)
        # grouped interior taps (equal coefficients share one multiply)
        igroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if c[s] != 0.0:
                igroups.setdefault(c[s], []).append((dm, dj))
        q = jnp.zeros((Bv, nh), _F)
        for g, offs in igroups.items():
            sx = dp[P + offs[0][0]:P + offs[0][0] + Bv,
                    P + offs[0][1]:P + offs[0][1] + nh]
            for (dm, dj) in offs[1:]:
                sx = sx + dp[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            q = q + g * sx
        # uniform left/right edge taps: masked W-wide one-hot blocks
        lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
        lm = (lanes == 0).astype(_F)
        rm = (lanes == W - 1).astype(_F)
        al = jnp.zeros((Bv, W), _F)
        ar = jnp.zeros((Bv, W), _F)
        for s, (dm, dj) in enumerate(offsets):
            if lc[s] != 0.0:
                al = al + lc[s] * dp[P + dm:P + dm + Bv,
                                     P + dj:P + dj + W]
            if rc[s] != 0.0:
                ar = ar + rc[s] * dp[P + dm:P + dm + Bv,
                                     P + nh - W + dj:P + nh + dj]
        q_ref[...] = q
        # RMW through the ref (a value-level scatter-add is a Mosaic
        # pitfall; static-sliced ref updates lower cleanly)
        q_ref[:, 0:W] = q_ref[:, 0:W] + al * lm
        q_ref[:, nh - W:nh] = q_ref[:, nh - W:nh] + ar * rm

        # bottom / top row strips (first / last block only)
        @pl.when(i == 0)
        def _():
            rb = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                rb = rb + sb_ref[s] * dp[P + dm:P + dm + 1,
                                         P + dj:P + dj + nh]
            q_ref[0:1, :] = q_ref[0:1, :] + rb

        @pl.when(i == G - 1)
        def _():
            rt = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                rt = rt + st_ref[s] * dp[P + Bv - 1 + dm:P + Bv + dm,
                                         P + dj:P + dj + nh]
            q_ref[Bv - 1:Bv, :] = q_ref[Bv - 1:Bv, :] + rt

        _k1_tail(q_ref[...], dn, q_ref, dq_acc, al_ref, delta_ref, i, G)

    def k1(strips2, beta1, delta1, r, d, Sr, Sd):
        sb, st = strips2
        return pl.pallas_call(
            k1_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, blk, blk, sblk_m1, sblk_p1,
                      sblk_m1, sblk_p1, strip, strip],
            out_specs=(blk, blk, sblk, smem_out(2)),
            out_shape=(jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, 1), _F)),
            scratch_shapes=[pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.SMEM((1, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, r, d, Sr, Sr, Sd, Sd, sb, st)

    return k1


def _build_k1_real_coef(offsets, grid, Bv, interpret=False):
    """Per-node-coefficient K1 (coefficients stream with the state)."""
    nv, nh = grid
    P = _pad_for(offsets)
    G = nv // Bv
    noff = len(offsets)
    blk, sblk, sblk_m1, sblk_p1, smem_in, smem_out = _specs(
        G, Bv, P, nh, noff)
    cblk = pl.BlockSpec((noff, Bv, nh), lambda i: (0, i, 0))

    def k1_kernel(beta_ref, delta_ref, coef_ref, r_ref, d_ref,
                  srm_ref, srp_ref, sdm_ref, sdp_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dp, dq_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dq_acc[0, 0] = 0.0
            dp[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        dn = _k1_head(beta_ref, r_ref, d_ref, srm_ref, srp_ref,
                      sdm_ref, sdp_ref, dnew_ref, sdn_ref, dp,
                      i, G, Bv, P, nh)
        q = jnp.zeros((Bv, nh), _F)
        for s, (dm, dj) in enumerate(offsets):
            q = q + coef_ref[s] * dp[P + dm:P + dm + Bv,
                                     P + dj:P + dj + nh]
        _k1_tail(q, dn, q_ref, dq_acc, al_ref, delta_ref, i, G)

    def k1(coefp, beta1, delta1, r, d, Sr, Sd):
        return pl.pallas_call(
            k1_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, cblk, blk, blk, sblk_m1,
                      sblk_p1, sblk_m1, sblk_p1],
            out_specs=(blk, blk, sblk, smem_out(2)),
            out_shape=(jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, 1), _F)),
            scratch_shapes=[pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.SMEM((1, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, coefp, r, d, Sr, Sr, Sd, Sd)

    return k1


def _make_k2_real(nv, nh, G, Bv, P, interpret=False):
    blk, sblk, _, _, smem_in, smem_out = _specs(G, Bv, P, nh, 0)

    def k2_kernel(al_ref, delta_ref, x_ref, d_ref, r_ref, q_ref,
                  xn_ref, rn_ref, srn_ref, beta_ref, dn_ref, hist_ref,
                  d_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            d_acc[0, 0] = 0.0

        a = al_ref[0, 0]
        xn_ref[...] = x_ref[...] + a * d_ref[...]
        nr = r_ref[...] - a * q_ref[...]
        rn_ref[...] = nr
        srn_ref[0, 0:P, :] = nr[0:P]
        srn_ref[0, P:2 * P, :] = nr[Bv - P:Bv]
        d_acc[0, 0] += jnp.sum(nr * nr)

        @pl.when(i == G - 1)
        def _():
            dnew = d_acc[0, 0]
            done = al_ref[1, 0] > 0.5
            de = delta_ref[0, 0]
            beta_ref[0, 0] = jnp.where(
                done, 0.0, dnew / jnp.where(done | (de == 0.0), 1.0, de))
            dn_ref[0, 0] = dnew
            hist_ref[0, 0] = jnp.sqrt(dnew)

    def k2(alpha_done, delta1, x, d, r, q):
        return pl.pallas_call(
            k2_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, blk, blk, blk, blk],
            out_specs=(blk, blk, sblk, smem_out(1), smem_out(1),
                       smem_out(1)),
            out_shape=(jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((1, 1), _F),
                       jax.ShapeDtypeStruct((1, 1), _F),
                       jax.ShapeDtypeStruct((1, 1), _F)),
            scratch_shapes=[pltpu.SMEM((1, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(alpha_done, delta1, x, d, r, q)

    return k2


def _stream_loop_real(k1, k2, op_arg, bp, x0p, n_iterations,
                      nv, nh, G, Bv, P):
    zero1 = jnp.zeros((1, 1), _F)
    one1 = jnp.ones((1, 1), _F)
    zeros_v = jnp.zeros((nv, nh), _F)
    zeros_s = jnp.zeros((G, 2 * P, nh), _F)

    Sx0 = _boundary1(x0p, G, Bv, P, nh)
    _, q0, _, _ = k1(op_arg, zero1, one1, x0p, zeros_v, Sx0, zeros_s)
    r0 = bp - q0
    delta0 = jnp.sum(r0 * r0)
    Sr0 = _boundary1(r0, G, Bv, P, nh)

    def body(carry, _):
        x, r, d, Sr, Sd, delta1, beta1 = carry
        dnew, q, Sdnew, alpha_done = k1(op_arg, beta1, delta1, r, d,
                                        Sr, Sd)
        xn, rn, Srn, beta_new, delta_new, hist1 = k2(
            alpha_done, delta1, x, dnew, r, q)
        return (xn, rn, dnew, Srn, Sdnew, delta_new, beta_new), hist1

    carry0 = (x0p, r0, zeros_v, Sr0, zeros_s, delta0.reshape(1, 1),
              zero1)
    (x, _, _, _, _, _, _), hist = lax.scan(body, carry0, None,
                                           length=n_iterations)
    return x, jnp.concatenate([jnp.sqrt(delta0)[None], hist[:, 0, 0]])


def stream_cg_real_planes(offsets, grid, taps, strips2, bp, x0p,
                          n_iterations: int, block_rows: int = None,
                          interpret: bool = False):
    """Const-tap real streaming CG.  bp/x0p: (Nv, Nh) float32.
    Returns (x (Nv, Nh), residual_history (n_iterations+1,))."""
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_real_planes")
    G = nv // Bv
    k1 = _build_k1_real_const(offsets, grid, taps, Bv, interpret)
    k2 = _make_k2_real(nv, nh, G, Bv, P, interpret)
    return _stream_loop_real(k1, k2, strips2, bp, x0p, n_iterations,
                             nv, nh, G, Bv, P)


def stream_cg_real_coef_planes(offsets, grid, coefp, bp, x0p,
                               n_iterations: int, block_rows: int = None,
                               interpret: bool = False):
    """Per-node-coefficient real streaming CG (same returns)."""
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_real_coef_planes")
    G = nv // Bv
    k1 = _build_k1_real_coef(offsets, grid, Bv, interpret)
    k2 = _make_k2_real(nv, nh, G, Bv, P, interpret)
    return _stream_loop_real(k1, k2, coefp, bp, x0p, n_iterations,
                             nv, nh, G, Bv, P)


def stream_cg_real(stencil, b, x0=None, n_iterations: int = 10,
                   block_rows: int = None, interpret: bool = False,
                   const_taps: bool = None):
    """Convenience wrapper: real (Nv, Nh) grid in / out.  Tries the
    const-tap path first (falls back to coefficient streaming)."""
    nv, nh = stencil.grid
    b = np.asarray(b).reshape(nv, nh).astype(np.float32)
    bp = jnp.asarray(b)
    x0p = (jnp.zeros((nv, nh), np.float32) if x0 is None
           else jnp.asarray(np.asarray(x0).reshape(nv, nh)
                            .astype(np.float32)))
    if const_taps is not False:
        try:
            taps, strips2 = prepare_stream_real(stencil)
            return stream_cg_real_planes(stencil.offsets, stencil.grid,
                                         taps, strips2, bp, x0p,
                                         n_iterations,
                                         block_rows=block_rows,
                                         interpret=interpret)
        except ValueError:
            if const_taps is True:
                raise
    coefp = prepare_stream_coef_real(stencil)
    return stream_cg_real_coef_planes(stencil.offsets, stencil.grid,
                                      coefp, bp, x0p, n_iterations,
                                      block_rows=block_rows,
                                      interpret=interpret)
