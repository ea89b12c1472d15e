"""MXU-formulated fused CG: the stencil apply as banded lane matmuls.

MEASURED NEGATIVE RESULT (rounds 3-4) -- kept under benchmarks/ as the
documented evidence, NOT dispatched by the planner.  Mosaic in-kernel
matmuls support only DEFAULT (1-pass bf16) and HIGHEST (6-pass)
precision.  Chained true-device timing vs the production VPU fused
kernel (benchmarks/exp_mxu3.py, helm_fe k=12, 2000 it):

    N=128:  vpu 2.9 us/it; mxu highest not faster, default parity 8.9
    N=256:  vpu 7.17 us/it (876 GFLOPS, parity 3e-4 vs XLA)
            mxu highest 13.11 (1.8x slower), default 5.46 but parity 44
    N=384:  vpu 12.51 us/it
            mxu highest 36.30 (2.9x slower), default 10.74, parity 12

The banded H wastes (Nh-3)/Nh of the MXU flops, so the 6-pass tier
loses even where the matmul replaces ~60 VPU ops, and the 1-pass tier's
bf16 taps destroy the residual history (CG recurrences amplify the
rounding).  The formulation itself is exact and correctness-tested
(tests/test_fused_cg.py::test_fused_mxu_matches_general).

Original design notes:

The VMEM-resident fused kernel (``tpcg.ops.fused_cg``) is VPU-bound: the
complex stencil apply is ~60 elementwise vector ops per iteration, and at
the headline N=128 grid (the reference's ``helm_fem`` protocol,
``report`` Fig. 5) the whole iteration is ~8 us of serial VPU work.  This
variant moves the stencil apply onto the MXU:

  For FE stencils on a rectangle, the coefficient of offset (dm, dj) at
  node (i, j) depends only on the *column* j for every interior row
  (left/right impedance columns differ; rows 1..Nv-2 share one profile).
  Therefore  q = sum_dm  x[shifted by dm rows] @ H_dm  EXACTLY, where
  H_dm[j+dj, j] = coef[(dm,dj)](j) is a banded (Nh, Nh) lane-coupling
  matrix -- the lane shifts AND the per-column coefficients ride one
  matmul.  The two boundary rows (0, Nv-1) get explicit strip
  corrections, as in ``stream_cg``.

  Complex arithmetic stays in Karatsuba 3-multiply form, so one apply is
  3 (dm) x 3 (planes) = 9 (Nv, Nh) @ (Nh, Nh) matmuls -- at Nh = 128
  each is a single native MXU tile op.  The banded H wastes Nh/3 of the
  MXU flops; the hope was that the path would pay in the small-grid
  regime where the VPU formulation is latency-bound (it does not --
  see the measured result above).

Numerics are identical to ``fused_cg_stencil`` (same COCG recurrences,
same freeze guard, same history definition); the matmuls run at
``Precision.HIGHEST`` so the f32 taps are applied at full precision.
Reference semantics: ``clcg.c:297-419`` fixed-iteration block CG with
per-RHS scalars; unconjugated dots (``kernel/complex/vdot.cl:15``).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpcg.ops.fused_cg import (_cg_packed_body, _cg_scalar_step, _init_state,
                       _packed_init, _pad_for)

_F = jnp.float32


def prepare_mxu(stencil, dtype=np.float32):
    """Host-side preprocessing: (H, strips3, dms).

    H       : (3, ndm, Nh, Nh) float32 -- banded lane-coupling matrices
              for the [Re, Im, Re+Im] Karatsuba planes, one per distinct
              row offset dm.
    strips3 : (sb3, st3), each (3, noff, 1, Nh) float32 -- the residual
              coefficients of rows 0 / Nv-1 after the column-profile
              application (zero for interior-only deviations).
    dms     : static tuple of distinct row offsets.
    Raises ValueError when interior rows do not share a single
    per-column coefficient profile (then use ``fused_cg_stencil``).
    """
    coef = np.asarray(stencil.coef)
    noff, nv, nh = coef.shape
    offsets = stencil.offsets
    if nv < 4:
        raise ValueError("grid too small for a row-profile split")
    colprof = coef[:, nv // 2, :].copy()            # (noff, nh)
    if not np.allclose(coef[:, 1:nv - 1, :], colprof[:, None, :],
                       rtol=1e-12, atol=1e-14):
        raise ValueError("interior rows do not share a column profile")

    dms = tuple(sorted({dm for dm, dj in offsets}))
    H = np.zeros((3, len(dms), nh, nh), dtype)
    cols = np.arange(nh)
    for s, (dm, dj) in enumerate(offsets):
        t = dms.index(dm)
        src = cols + dj
        valid = (src >= 0) & (src < nh)
        pr = colprof[s].real.astype(dtype)
        pi = colprof[s].imag.astype(dtype)
        H[0, t, src[valid], cols[valid]] += pr[valid]
        H[1, t, src[valid], cols[valid]] += pi[valid]
        H[2, t, src[valid], cols[valid]] += (pr + pi)[valid]

    sb = coef[:, 0, :] - colprof                    # (noff, nh)
    st = coef[:, nv - 1, :] - colprof

    def _strip3(a):
        re = a.real.astype(dtype)
        im = a.imag.astype(dtype)
        return jnp.asarray(np.stack([re, im, re + im])[:, :, None, :])

    return jnp.asarray(H), (_strip3(sb), _strip3(st)), dms


def fused_cg_stencil_mxu(offsets: Tuple[Tuple[int, int], ...],
                         grid: Tuple[int, int], hmats: jnp.ndarray,
                         strips3, b: jnp.ndarray, x0: jnp.ndarray,
                         n_iterations: int, interpret: bool = False,
                         packed: bool = None, precision: str = "high"):
    """MXU twin of :func:`tpcg.ops.fused_cg.fused_cg_stencil`.

    hmats/strips3 : from :func:`prepare_mxu` (pass as jit ARGUMENTS).
    b, x0 : (2, B, Nv, Nh) float32 planes.
    precision : matmul pass count -- "default" (1-pass bf16, fastest,
        too lossy for long CG), "high" (3-pass bf16x3, ~f32 accurate),
        "highest" (6-pass).
    Returns (x, residual_history) exactly like ``fused_cg_stencil``.
    """
    nv, nh = grid
    _, nb, bv, bh = b.shape
    assert (bv, bh) == (nv, nh), (b.shape, grid)
    if packed is None:
        packed = nb >= 2
    if packed and nb > nh:
        packed = False
    P = _pad_for(offsets)
    pv, ph = nv + 2 * P, nh + 2 * P
    dt = b.dtype
    ndm = hmats.shape[1]
    dms = tuple(sorted({dm for dm, dj in offsets}))
    assert ndm == len(dms)
    prec = {"default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[precision]

    def apply_stencil(h_ref, sb_ref, st_ref, dr_pad, di_pad, qr_s, qi_s):
        """q = A d via banded lane matmuls + boundary-row strips; result
        left in the (nb, nv, nh) scratch refs."""
        for r in range(nb):
            m1 = jnp.zeros((nv, nh), dt)
            m2 = jnp.zeros((nv, nh), dt)
            m3 = jnp.zeros((nv, nh), dt)
            for t, dm in enumerate(dms):
                xr = dr_pad[r, P + dm:P + dm + nv, P:P + nh]
                xi = di_pad[r, P + dm:P + dm + nv, P:P + nh]
                m1 = m1 + jnp.dot(xr, h_ref[0, t], precision=prec,
                                  preferred_element_type=_F)
                m2 = m2 + jnp.dot(xi, h_ref[1, t], precision=prec,
                                  preferred_element_type=_F)
                m3 = m3 + jnp.dot(xr + xi, h_ref[2, t], precision=prec,
                                  preferred_element_type=_F)
            qr_s[r] = m1 - m2
            qi_s[r] = m3 - m1 - m2
            # boundary-row strip corrections (rows 0 / Nv-1), Karatsuba
            # on (1, Nh) rows; static-slice RMW on the scratch ref.
            cbr = jnp.zeros((1, nh), dt)
            cbi = jnp.zeros((1, nh), dt)
            ctr = jnp.zeros((1, nh), dt)
            cti = jnp.zeros((1, nh), dt)
            for s, (dm, dj) in enumerate(offsets):
                xb_r = dr_pad[r, P + dm:P + dm + 1, P + dj:P + dj + nh]
                xb_i = di_pad[r, P + dm:P + dm + 1, P + dj:P + dj + nh]
                a1 = sb_ref[0, s] * xb_r
                a2 = sb_ref[1, s] * xb_i
                a3 = sb_ref[2, s] * (xb_r + xb_i)
                cbr = cbr + (a1 - a2)
                cbi = cbi + (a3 - a1 - a2)
                xt_r = dr_pad[r, P + nv - 1 + dm:P + nv + dm,
                              P + dj:P + dj + nh]
                xt_i = di_pad[r, P + nv - 1 + dm:P + nv + dm,
                              P + dj:P + dj + nh]
                b1 = st_ref[0, s] * xt_r
                b2 = st_ref[1, s] * xt_i
                b3 = st_ref[2, s] * (xt_r + xt_i)
                ctr = ctr + (b1 - b2)
                cti = cti + (b3 - b1 - b2)
            qr_s[r, 0:1, :] = qr_s[r, 0:1, :] + cbr
            qi_s[r, 0:1, :] = qi_s[r, 0:1, :] + cbi
            qr_s[r, nv - 1:nv, :] = qr_s[r, nv - 1:nv, :] + ctr
            qi_s[r, nv - 1:nv, :] = qi_s[r, nv - 1:nv, :] + cti

    def kernel(h_ref, sb_ref, st_ref, b_ref, x0_ref, xout_ref, hist_ref,
               xr, xi, rr, ri, dr_pad, di_pad, qr_s, qi_s):
        dr_pad[...] = jnp.zeros((nb, pv, ph), dt)
        di_pad[...] = jnp.zeros((nb, pv, ph), dt)
        dr_pad[:, P:P + nv, P:P + nh] = x0_ref[0]
        di_pad[:, P:P + nv, P:P + nh] = x0_ref[1]
        apply_stencil(h_ref, sb_ref, st_ref, dr_pad, di_pad, qr_s, qi_s)
        q0r = qr_s[...]
        q0i = qi_s[...]

        if packed:
            deltas0 = _packed_init(nb, nv, nh, P, b_ref, x0_ref, xr, xi,
                                   rr, ri, dr_pad, di_pad, hist_ref,
                                   q0r, q0i)

            def read_d_all():
                return (dr_pad[:, P:P + nv, P:P + nh],
                        di_pad[:, P:P + nv, P:P + nh])

            def write_d_all(wr, wi):
                dr_pad[:, P:P + nv, P:P + nh] = wr
                di_pad[:, P:P + nv, P:P + nh] = wi

            def apply_q():
                apply_stencil(h_ref, sb_ref, st_ref, dr_pad, di_pad,
                              qr_s, qi_s)
                return qr_s[...], qi_s[...]

            def body(it, deltas):
                return _cg_packed_body(nb, nv, nh, apply_q, read_d_all,
                                       write_d_all, xr, xi, rr, ri,
                                       hist_ref, it, deltas)

            lax.fori_loop(0, n_iterations, body, deltas0)
            xout_ref[0] = xr[...]
            xout_ref[1] = xi[...]
            return

        deltas0 = _init_state(nb, nv, nh, P, b_ref, x0_ref, xr, xi, rr,
                              ri, dr_pad, di_pad, hist_ref, q0r, q0i)

        def read_d(r):
            return (dr_pad[r, P:P + nv, P:P + nh],
                    di_pad[r, P:P + nv, P:P + nh])

        def write_d(r, wr, wi):
            dr_pad[r, P:P + nv, P:P + nh] = wr
            di_pad[r, P:P + nv, P:P + nh] = wi

        def body(it, deltas):
            apply_stencil(h_ref, sb_ref, st_ref, dr_pad, di_pad,
                          qr_s, qi_s)
            return _cg_scalar_step(it, deltas, nb, qr_s, qi_s, read_d,
                                   write_d, xr, xi, rr, ri, hist_ref)

        lax.fori_loop(0, n_iterations, body, deltas0)
        xout_ref[0] = xr[...]
        xout_ref[1] = xi[...]

    out_shapes = (
        jax.ShapeDtypeStruct((2, nb, nv, nh), dt),
        jax.ShapeDtypeStruct((n_iterations + 1, nb), dt),
    )
    sb3, st3 = strips3
    x, hist = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((nb, nv, nh), dt),    # xr
            pltpu.VMEM((nb, nv, nh), dt),    # xi
            pltpu.VMEM((nb, nv, nh), dt),    # rr
            pltpu.VMEM((nb, nv, nh), dt),    # ri
            pltpu.VMEM((nb, pv, ph), dt),    # d_pad re
            pltpu.VMEM((nb, pv, ph), dt),    # d_pad im
            pltpu.VMEM((nb, nv, nh), dt),    # q re
            pltpu.VMEM((nb, nv, nh), dt),    # q im
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(hmats, sb3, st3, b, x0)
    return x, hist


def fused_cg_mxu(stencil, b, x0=None, n_iterations: int = 10,
                 interpret: bool = False, packed: bool = None):
    """Convenience wrapper: complex grid arrays in / out (mirrors
    ``tpcg.ops.fused_cg.fused_cg``)."""
    nv, nh = stencil.grid
    b = np.asarray(b).reshape(-1, nv, nh)
    nb = b.shape[0]
    H, strips3, _ = prepare_mxu(stencil)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nb, nv, nh), jnp.float32)
    else:
        x0 = np.asarray(x0).reshape(-1, nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return fused_cg_stencil_mxu(stencil.offsets, stencil.grid, H,
                                strips3, bp, x0p, n_iterations,
                                interpret=interpret, packed=packed)
