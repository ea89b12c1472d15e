"""Streaming CG for general BANDED matrices (DIA storage, real f32).

The reference's two largest benchmark matrices (m_t1 n=97,578 ~100
diagonals; parabolic_fem n=525,825 7 diagonals -- report Table I) are
banded but NOT 2-D grid stencils, so the stencil kernel families don't
apply and they previously ran on the XLA shift-multiply path
(``DiaMatrix.matvec``) at ~100 GB/s effective (~57 GFLOPS for the
m_t1 class, benchmarks/GENERAL_SPARSE.md).

This kernel maps the 1-D banded operator onto a COLUMN-MAJOR 2-D grid:
the vector is laid out as ``xg[r, c] = x[c*nv + r]`` over (nv, nh=128)
-- consecutive 1-D indices run DOWN a column -- so a diagonal offset k
becomes a single pure VERTICAL shift (k, 0) against a WRAP-FILLED pad
buffer: the halo rows above/below each column hold the neighbouring
columns' data (``dpd[Ht*nv + r, c] = x[c*nv + r]`` for r in
[-Ht*nv, (Ht+1)*nv), built by ``2*Ht`` lane-rolls of the direction
grid once per iteration), so ``x[i + k]`` is one lane-ALIGNED window
read for every row.  An earlier formulation applied two taps per
diagonal (direct + zero-gated lane-wrap companion) against a
(nh+2)-wide zero pad; that doubled the tap work AND made every window
load lane-unaligned -- the wrap-fill removes both costs for the price
of the 2*Ht halo rolls (Ht = ceil(max|k| / nv), 1-3 for the reference
matrix classes).

The CG state (x/r/d/q, ~0.4 MB per plane at m_t1 size) is fully
VMEM-resident; only the diagonal VALUE planes stream, once per
iteration (~39 MB for the m_t1 class), through a (K, G) grid -- K
iterations per pallas call, G value-blocks per iteration.  The
per-iteration vector updates DEFER one iteration (the same fp ops,
executed at the next iteration's first grid step -- the v5 qx trick),
so there is no separate update phase; the final pending update is
applied in XLA by the wrapper.

Reference semantics: fixed iteration count (``clcg.c:297``), residual
history sqrt(<r,r>) per iteration (``cl.py:120``); serves the CSR
``cg()`` surface (``clcg.h:3-5``) for banded real Matrix Market inputs
(``main.c:20-33``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stream_cg import _mag2_zero, _smith_cdiv

_F = jnp.float32
_NH = 128
# iterations per pallas call (bounds SMEM history + grid size)
_CHUNK = 256
# VMEM budget for the fit rule (the Mosaic limit is 127 MB; leave
# headroom for pipeline staging)
_DIA_VMEM_BYTES = 100 * 1024 * 1024


def _chunks(n, cap):
    out = [cap] * (n // cap)
    if n % cap:
        out.append(n % cap)
    return out or [n]


def _dia_geometry(n, block_rows=None):
    """(nv, Bv) grid geometry -- the ONE place the block-rows rule
    lives (prepare_dia_stream and the fit rules must agree on it)."""
    nv = -(-n // _NH)
    Bv = block_rows
    if Bv is None:
        # largest block size that still gives >= 2 value blocks
        Bv = next((c for c in (256, 128, 64, 32, 16, 8)
                   if -(-nv // c) >= 2), 8)
    return max(-(-nv // Bv), 2) * Bv, Bv


def prepare_dia_stream(dia, block_rows: int = None):
    """Host-side preprocessing: (taps, grid, Bv, value planes).

    taps      : static (k, value-plane index) pairs -- one vertical
                shift per diagonal (applied against the wrap-filled pad
                grid, see module docstring).
    planes    : (ndiag, nv, nh) f32 -- ``planes[d][r, c] =
                data[d, c*nv + r]`` (zero beyond n).
    """
    n = int(dia.n)
    offs = [int(k) for k in dia.offsets]
    nv, Bv = _dia_geometry(n, block_rows)
    data = np.asarray(dia.data, dtype=np.float32)
    planes = np.zeros((len(offs), nv * _NH), np.float32)
    planes[:, :n] = data[:, :n]
    # column-major regrid: plane[r, c] = flat[c*nv + r]
    planes = planes.reshape(len(offs), _NH, nv).transpose(0, 2, 1)
    taps = tuple((k, d) for d, k in enumerate(offs))
    return taps, (nv, _NH), Bv, jnp.asarray(planes)


def _halo_depth(taps, nv):
    """Ht = ceil(max|k| / nv): wrap-fill columns needed on each side."""
    hm = max((abs(k) for k, _ in taps), default=0)
    return -(-hm // nv)


def dia_stream_fits(dia, budget: int = _DIA_VMEM_BYTES) -> bool:
    """Geometry-only VMEM fit rule for the banded-streaming kernel.

    Footprint: 12 full state planes (4 in / 4 out / 4 scratch), the
    wrap-filled pad grid, and the double-buffered coefficient block
    stream.  The reference's largest matrices (m_t1 ~34 MB,
    parabolic_fem ~35 MB) fit with 3x headroom; million-row wide-band
    systems fall back to the XLA shift-multiply path.
    """
    n, offs = int(dia.n), [int(k) for k in dia.offsets]
    nv, Bv = _dia_geometry(n)
    ht = -(-max((abs(k) for k in offs), default=0) // nv)
    plane = nv * _NH * 4
    need = (12 * plane                      # x/r/d/q in+out+scratch
            + (2 * ht + 1) * plane + 8 * _NH * 4   # dpd wrap pad
            + 2 * len(offs) * Bv * _NH * 4)  # coef double-buffer
    return need <= budget


def wrap_pad_grid(xg, ht):
    """((2*Ht+1)*nv, nh) wrap-filled pad of a column-major grid: row
    ``Ht*nv + r`` of lane ``c`` holds ``xg[r mod nv, c + r // nv]``
    (lanes wrap cyclically; the wrapped-over lanes correspond to flat
    indices outside [0, nv*nh) whose coefficients are zero).  XLA twin
    of the kernel's in-VMEM halo fill.  Accepts leading batch axes."""
    parts = [jnp.roll(xg, w, axis=-1) for w in range(ht, 0, -1)]
    parts.append(xg)
    parts += [jnp.roll(xg, -w, axis=-1) for w in range(1, ht + 1)]
    return jnp.concatenate(parts, axis=-2)


def dia_apply_grid(taps, grid, planes, xg):
    """q = A @ x on the column-major grid, XLA formulation (init r0 +
    oracle twin of the kernel's tap application).  ``xg`` may carry
    leading batch axes (the value planes broadcast)."""
    nv, nh = grid
    ht = _halo_depth(taps, nv)
    xp = wrap_pad_grid(xg, ht)
    c0 = ht * nv
    q = jnp.zeros(xg.shape, _F)
    for k, d in taps:
        q = q + planes[d] * xp[..., c0 + k:c0 + k + nv, :]
    return q


def to_dia_grid(x, nv):
    """(n,) -> (nv, 128) column-major grid (zero-padded)."""
    x = jnp.asarray(x, _F)
    xp = jnp.zeros((nv * _NH,), _F).at[:x.shape[0]].set(x)
    return xp.reshape(_NH, nv).T


def from_dia_grid(xg, n):
    """(nv, 128) column-major grid -> (n,)."""
    return xg.T.reshape(-1)[:n]


def _build_dia(taps, grid, Bv, K, interpret):
    """K-iteration banded-streaming kernel -- the nb=1 specialization
    of :func:`_build_dia_batch` (one kernel implementation to
    maintain; the traced program is identical since every (nb*nv, nh)
    shape degenerates to (nv, nh)).

    step(planes, beta1, delta1, x, r, d, q) ->
        (x_pre, r_pre, dnew, q, alpha (1,1), delta (1,1), hist (K,1))
    where x_pre/r_pre trail by the final alpha update (applied by the
    wrapper in XLA) and hist[i] = sqrt(delta_{i+1}) for i < K-1.
    """
    return _build_dia_batch(taps, grid, Bv, K, 1, interpret)


def _dia_batch_nb(taps, grid, Bv, ndiag, nrhs,
                  budget: int = _DIA_VMEM_BYTES) -> int:
    """Largest RHS-batch size (<= min(nrhs, 8)) the fat kernel fits.

    Footprint grows ~linearly in nb (12 state planes + wrap pad per
    RHS) against one shared double-buffered coefficient stream; 8 caps
    the unrolled kernel body size.
    """
    nv, nh = grid
    ht = _halo_depth(taps, nv)
    per_rhs = (12 + 2 * ht + 1) * nv * nh * 4 + 8 * nh * 4
    coef = 2 * ndiag * Bv * nh * 4
    for nb in range(min(nrhs, 8), 1, -1):
        if nb * per_rhs + coef <= budget:
            return nb
    return 1


def _build_dia_batch(taps, grid, Bv, K, nb, interpret):
    """K-iteration nb-RHS fat banded-streaming kernel.

    Same recurrence as :func:`_build_dia` with a STATIC RHS axis
    unrolled in the kernel body: each coefficient block is fetched
    from HBM once per (iteration, row-block) grid step and applied to
    all nb direction grids -- the reference's N_RHS block amortization
    (``kernel/complex/spmv.cl:25-33``, report Fig. 6) -- so per-RHS
    value traffic drops nb-fold.  Per-RHS scalar chains live in SMEM
    (., nb) arrays; state lives in flat (nb*nv, nh) planes (static
    b*nv row offsets keep every access a known-good 2-D slice).

    step(planes, beta1 (1, nb), delta1 (1, nb),
         x, r, d, q  (nb*nv, nh)) ->
        (x_pre, r_pre, dnew, q, alpha (1, nb), delta (1, nb),
         hist (K, nb))
    with the same trailing-update convention as the single-RHS kernel.

    Termination-flag contract: the per-RHS ``done`` flag (``al[1, b]``)
    latches when ``<d,q>`` or delta reaches EXACT zero and freezes that
    RHS's recurrence for the remainder of the chunk.  The pinned oracle
    (``cplx.block_cg_planes``) re-evaluates the guard every iteration
    and would resume if a later ``<d,q>`` were nonzero, so after an
    exact-zero underflow WITH delta nonzero (only reachable via f32
    underflow on a pathological system) the two paths may diverge for
    up to ``chunk`` iterations before the flag resets at the next chunk
    boundary.  For delta == 0 (true convergence) both freeze
    identically; tests pin that case.
    """
    nv, nh = grid
    assert nv % Bv == 0 and Bv % 8 == 0, (nv, Bv)
    G = nv // Bv
    Ht = _halo_depth(taps, nv)
    C0 = Ht * nv
    DS = 2 * C0 + nv + 8          # per-RHS wrap-pad stride (8-aligned)
    ndiag = 1 + max(d for _, d in taps)
    tgroups = {}
    for k, d in taps:
        k8 = (k // 8) * 8
        tgroups.setdefault(k8, []).append((k - k8, d))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    coef_spec = pl.BlockSpec((ndiag, Bv, nh),
                             lambda it, j: (0, j, 0))
    full = pl.BlockSpec((nb * nv, nh), lambda it, j: (0, 0))

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(beta0_ref, delta0_ref, coef_ref, x_ref, r_ref, d_ref,
               q_ref, xn_ref, rn_ref, dn_ref, qn_ref, alphan_ref,
               deltan_ref, hist_ref, x_scr, r_scr, d_scr, q_scr, dpd,
               al, dqa, bd):
        it = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((it == 0) & (j == 0))
        def _():
            x_scr[...] = x_ref[...]
            r_scr[...] = r_ref[...]
            d_scr[...] = d_ref[...]
            q_scr[...] = q_ref[...]
            for b in range(nb):
                al[0, b] = 0.0
                al[1, b] = 0.0
                bd[0, b] = beta0_ref[0, b]
                bd[1, b] = delta0_ref[0, b]
            dpd[...] = jnp.zeros((nb * DS, nh), _F)

        @pl.when(j == 0)
        def _():
            for b in range(nb):
                dqa[0, b] = 0.0

            @pl.when(it > 0)
            def _():
                for b in range(nb):
                    a = al[0, b]
                    s = b * nv
                    x_scr[s:s + nv, :] = (x_scr[s:s + nv, :]
                                          + a * d_scr[s:s + nv, :])
                    nr = r_scr[s:s + nv, :] - a * q_scr[s:s + nv, :]
                    r_scr[s:s + nv, :] = nr
                    dnew_ = jnp.sum(nr * nr)
                    de = bd[1, b]
                    done = al[1, b] > 0.5
                    bd[0, b] = jnp.where(
                        done, 0.0,
                        dnew_ / jnp.where(done | (de == 0.0), 1.0, de))
                    bd[1, b] = jnp.where(done, de, dnew_)
                    hist_ref[it - 1, b] = jnp.sqrt(bd[1, b])

            for b in range(nb):
                s = b * nv
                dn = r_scr[s:s + nv, :] + bd[0, b] * d_scr[s:s + nv, :]
                d_scr[s:s + nv, :] = dn
                p = b * DS + C0
                dpd[p:p + nv, :] = dn
                for w in range(1, Ht + 1):
                    dpd[p + w * nv:p + (w + 1) * nv, :] = \
                        pltpu.roll(dn, nh - w, 1)
                    dpd[p - w * nv:p - (w - 1) * nv, :] = \
                        pltpu.roll(dn, w, 1)

        # one HBM fetch of the value block serves all nb RHS grids
        for b in range(nb):
            qb = jnp.zeros((Bv, nh), _F)
            for k8, items in tgroups.items():
                win = dpd[pl.ds(b * DS + C0 + j * Bv + k8, Bv + 8), :]
                for o, d in items:
                    qb = qb + coef_ref[d] * win[o:o + Bv, :]
            q_scr[pl.ds(b * nv + j * Bv, Bv), :] = qb
            dqa[0, b] += jnp.sum(
                d_scr[pl.ds(b * nv + j * Bv, Bv), :] * qb)

        @pl.when(j == G - 1)
        def _():
            for b in range(nb):
                dq = dqa[0, b]
                de = bd[1, b]
                done = (de == 0.0) | (dq == 0.0) | (al[1, b] > 0.5)
                al[0, b] = jnp.where(done, 0.0,
                                     de / jnp.where(done, 1.0, dq))
                al[1, b] = jnp.where(done, 1.0, 0.0)

            @pl.when(it == K - 1)
            def _():
                xn_ref[...] = x_scr[...]
                rn_ref[...] = r_scr[...]
                dn_ref[...] = d_scr[...]
                qn_ref[...] = q_scr[...]
                for b in range(nb):
                    alphan_ref[0, b] = al[0, b]
                    deltan_ref[0, b] = bd[1, b]

    scratch = [pltpu.VMEM((nb * nv, nh), _F),          # x
               pltpu.VMEM((nb * nv, nh), _F),          # r
               pltpu.VMEM((nb * nv, nh), _F),          # d
               pltpu.VMEM((nb * nv, nh), _F),          # q
               pltpu.VMEM((nb * DS, nh), _F),          # dpd (wrap pads)
               pltpu.SMEM((2, nb), _F),                # alpha+done
               pltpu.SMEM((1, nb), _F),                # <d,q>
               pltpu.SMEM((2, nb), _F)]                # beta,delta

    def step(planes, beta1, delta1, x, r, d, q):
        return pl.pallas_call(
            kernel,
            grid=(K, G),
            in_specs=[smem_in, smem_in, coef_spec] + [full] * 4,
            out_specs=(full, full, full, full, smem_out((1, nb)),
                       smem_out((1, nb)), smem_out((K, nb))),
            out_shape=(jax.ShapeDtypeStruct((nb * nv, nh), _F),
                       jax.ShapeDtypeStruct((nb * nv, nh), _F),
                       jax.ShapeDtypeStruct((nb * nv, nh), _F),
                       jax.ShapeDtypeStruct((nb * nv, nh), _F),
                       jax.ShapeDtypeStruct((1, nb), _F),
                       jax.ShapeDtypeStruct((1, nb), _F),
                       jax.ShapeDtypeStruct((K, nb), _F)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, planes, x, r, d, q)

    return step


def stream_cg_dia_grid(taps, grid, Bv, planes, bg, x0g,
                       n_iterations: int, chunk: int = _CHUNK,
                       interpret: bool = False):
    """Grid-layout solve: bg/x0g are (nv, 128) column-major grids.

    Returns (x_grid, history (n_iterations+1,)).
    """
    nv, nh = grid
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_dia(taps, grid, Bv, K, interpret)
        return steps[K]

    r0 = bg - dia_apply_grid(taps, grid, planes, x0g)
    delta0 = jnp.sum(r0 * r0)
    hists = [jnp.sqrt(delta0)[None]]
    x, r, d = x0g, r0, jnp.zeros_like(bg)
    q = jnp.zeros_like(bg)
    beta = jnp.zeros((1, 1), _F)
    delta = delta0.reshape(1, 1)
    for K in _chunks(n_iterations, chunk):
        step = get_step(K)
        x, r, d, q, alpha, delta_pre, hk = step(planes, beta, delta,
                                                x, r, d, q)
        # the kernel's state trails by the final alpha update
        a = alpha[0, 0]
        x = x + a * d
        r = r - a * q
        delta_new = jnp.sum(r * r)
        done = (delta_pre[0, 0] == 0.0) | (a == 0.0)
        beta = jnp.where(
            done, 0.0,
            delta_new / jnp.where(delta_pre[0, 0] == 0.0, 1.0,
                                  delta_pre[0, 0])).reshape(1, 1)
        delta = delta_new.reshape(1, 1)
        hists.append(hk[:K - 1, 0])
        hists.append(jnp.sqrt(delta_new)[None])
    return x, jnp.concatenate(hists)


def stream_cg_dia_grid_batch(taps, grid, Bv, planes, bgs, x0gs,
                             n_iterations: int, chunk: int = _CHUNK,
                             interpret: bool = False):
    """Batched grid-layout solve through the fat kernel: bgs/x0gs are
    (nb, nv, 128) column-major grids, one coefficient stream shared by
    all nb recurrences.  Returns (x (nb, nv, 128),
    history (n_iterations + 1, nb))."""
    nv, nh = grid
    nb = bgs.shape[0]
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_dia_batch(taps, grid, Bv, K, nb, interpret)
        return steps[K]

    def flat(M):
        return M.reshape(nb * nv, nh)

    r0 = bgs - dia_apply_grid(taps, grid, planes, x0gs)
    delta0 = jnp.sum(r0 * r0, axis=(1, 2))             # (nb,)
    hists = [jnp.sqrt(delta0)[None]]
    x, r = flat(x0gs), flat(r0)
    d = jnp.zeros_like(x)
    q = jnp.zeros_like(x)
    beta = jnp.zeros((1, nb), _F)
    delta = delta0.reshape(1, nb)
    for K in _chunks(n_iterations, chunk):
        step = get_step(K)
        x, r, d, q, alpha, delta_pre, hk = step(planes, beta, delta,
                                                x, r, d, q)
        # the kernel's state trails by the final alpha update (per RHS)
        a = alpha.reshape(nb, 1, 1)
        xg = x.reshape(nb, nv, nh) + a * d.reshape(nb, nv, nh)
        rg = r.reshape(nb, nv, nh) - a * q.reshape(nb, nv, nh)
        delta_new = jnp.sum(rg * rg, axis=(1, 2))
        done = (delta_pre[0] == 0.0) | (alpha[0] == 0.0)
        beta = jnp.where(done, 0.0,
                         delta_new / jnp.where(delta_pre[0] == 0.0, 1.0,
                                               delta_pre[0]))[None]
        delta = delta_new[None]
        x, r = flat(xg), flat(rg)
        hists.append(hk[:K - 1, :])
        hists.append(jnp.sqrt(delta_new)[None])
    return x.reshape(nb, nv, nh), jnp.concatenate(hists, axis=0)


# ====================================================================
# Complex twin (COCG): the mhd1280b class (report Table I -- complex
# n=1,280 band, ~18 diagonals) previously ran the XLA shift-multiply
# pair operator (``block_cg_planes``) at ~13 GFLOPS; at that size the
# whole problem (state + value planes) is VMEM-resident and the XLA
# path's per-op dispatch dominates.  Same column-major wrap-fill
# formulation, two f32 planes per field (``tpcg/ops/cplx.py`` layout:
# never ship complex64 to the device), COCG unconjugated dots
# (``kernel/complex/vdot.cl:15``) and Smith-scaled complex division.
# ====================================================================


def prepare_dia_stream_cplx(dia, block_rows: int = None):
    """Host-side preprocessing for a complex :class:`DiaMatrix`:
    (taps, grid, Bv, value planes (2, ndiag, nv, nh) f32)."""
    n = int(dia.n)
    offs = [int(k) for k in dia.offsets]
    nv, Bv = _dia_geometry(n, block_rows)
    data = np.asarray(dia.data)
    planes = np.zeros((2, len(offs), nv * _NH), np.float32)
    planes[0, :, :n] = data[:, :n].real
    planes[1, :, :n] = data[:, :n].imag
    planes = planes.reshape(2, len(offs), _NH, nv).transpose(0, 1, 3, 2)
    taps = tuple((k, d) for d, k in enumerate(offs))
    return taps, (nv, _NH), Bv, jnp.asarray(planes)


def dia_stream_cplx_fits(dia, budget: int = _DIA_VMEM_BYTES) -> bool:
    """VMEM fit rule for the complex banded-streaming kernel (twice the
    real kernel's state/pad planes + a re/im coefficient stream)."""
    n, offs = int(dia.n), [int(k) for k in dia.offsets]
    nv, Bv = _dia_geometry(n)
    ht = -(-max((abs(k) for k in offs), default=0) // nv)
    plane = nv * _NH * 4
    need = (2 * 12 * plane                       # x/r/d/q in+out+scratch
            + 2 * ((2 * ht + 1) * plane + 8 * _NH * 4)  # dpd wrap pads
            + 2 * 2 * len(offs) * Bv * _NH * 4)  # coef double-buffer
    return need <= budget


def dia_apply_grid_cplx(taps, grid, planes2, xg2):
    """q = A @ x on the column-major grid, complex planes: ``planes2``
    is (2, ndiag, nv, nh), ``xg2`` (2, nv, nh) (or leading batch axes
    before the plane axis are NOT supported -- the plane axis leads).
    XLA twin of the kernel's tap application (r0 init + test oracle)."""
    nv, nh = grid
    ht = _halo_depth(taps, nv)
    xp = wrap_pad_grid(xg2, ht)
    c0 = ht * nv
    qr = jnp.zeros((nv, nh), _F)
    qi = jnp.zeros((nv, nh), _F)
    for k, d in taps:
        wr = xp[0, c0 + k:c0 + k + nv, :]
        wi = xp[1, c0 + k:c0 + k + nv, :]
        qr = qr + planes2[0, d] * wr - planes2[1, d] * wi
        qi = qi + planes2[0, d] * wi + planes2[1, d] * wr
    return jnp.stack([qr, qi])


def _udot2(ar, ai, br, bi):
    """Unconjugated complex dot of two plane pairs (COCG, scalar pair)."""
    return (jnp.sum(ar * br - ai * bi), jnp.sum(ar * bi + ai * br))


def _build_dia_cplx(taps, grid, Bv, K, interpret):
    """K-iteration complex banded-streaming kernel (single RHS).

    Same deferred-update recurrence as :func:`_build_dia_batch` with
    complex (two-plane) state and Smith-scaled complex alpha/beta:

    step(planes2, beta1 (2,1), delta1 (2,1), x, r, d, q (2, nv, nh)) ->
        (x_pre, r_pre, dnew, q, alpha (2,1), delta (2,1), hist (K,1))
    where x_pre/r_pre trail by the final alpha update (applied by the
    wrapper in XLA) and hist[i] = |delta_{i+1}|^(1/2) for i < K-1.
    """
    nv, nh = grid
    assert nv % Bv == 0 and Bv % 8 == 0, (nv, Bv)
    G = nv // Bv
    Ht = _halo_depth(taps, nv)
    C0 = Ht * nv
    DS = 2 * C0 + nv + 8
    ndiag = 1 + max(d for _, d in taps)
    tgroups = {}
    for k, d in taps:
        k8 = (k // 8) * 8
        tgroups.setdefault(k8, []).append((k - k8, d))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    coef_spec = pl.BlockSpec((2, ndiag, Bv, nh),
                             lambda it, j: (0, 0, j, 0))
    full = pl.BlockSpec((2, nv, nh), lambda it, j: (0, 0, 0))

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(beta0_ref, delta0_ref, coef_ref, x_ref, r_ref, d_ref,
               q_ref, xn_ref, rn_ref, dn_ref, qn_ref, alphan_ref,
               deltan_ref, hist_ref, x_scr, r_scr, d_scr, q_scr, dpd,
               al, dqa, bd):
        it = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((it == 0) & (j == 0))
        def _():
            x_scr[...] = x_ref[...]
            r_scr[...] = r_ref[...]
            d_scr[...] = d_ref[...]
            q_scr[...] = q_ref[...]
            al[0, 0] = 0.0
            al[1, 0] = 0.0
            al[2, 0] = 0.0
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = beta0_ref[1, 0]
            bd[2, 0] = delta0_ref[0, 0]
            bd[3, 0] = delta0_ref[1, 0]
            dpd[...] = jnp.zeros((2, DS, nh), _F)

        @pl.when(j == 0)
        def _():
            dqa[0, 0] = 0.0
            dqa[1, 0] = 0.0

            @pl.when(it > 0)
            def _():
                # deferred complex x/r updates with the previous alpha
                ar = al[0, 0]
                ai = al[1, 0]
                dr = d_scr[0, :, :]
                di = d_scr[1, :, :]
                x_scr[0, :, :] = x_scr[0, :, :] + ar * dr - ai * di
                x_scr[1, :, :] = x_scr[1, :, :] + ar * di + ai * dr
                nrr = r_scr[0, :, :] - (ar * q_scr[0, :, :]
                                        - ai * q_scr[1, :, :])
                nri = r_scr[1, :, :] - (ar * q_scr[1, :, :]
                                        + ai * q_scr[0, :, :])
                r_scr[0, :, :] = nrr
                r_scr[1, :, :] = nri
                dnr_, dni_ = _udot2(nrr, nri, nrr, nri)
                done = al[2, 0] > 0.5
                der = bd[2, 0]
                dei = bd[3, 0]
                sdr = jnp.where(done, 1.0, der)
                sdi = jnp.where(done, 1.0, dei)
                br_, bi_ = _smith_cdiv(dnr_, dni_, sdr, sdi)
                bd[0, 0] = jnp.where(done, 0.0, br_)
                bd[1, 0] = jnp.where(done, 0.0, bi_)
                bd[2, 0] = jnp.where(done, der, dnr_)
                bd[3, 0] = jnp.where(done, dei, dni_)
                hist_ref[it - 1, 0] = jnp.sqrt(
                    jnp.sqrt(bd[2, 0] * bd[2, 0] + bd[3, 0] * bd[3, 0]))

            # direction update + wrap-fill pads (both planes)
            br = bd[0, 0]
            bi = bd[1, 0]
            dnr = (r_scr[0, :, :] + br * d_scr[0, :, :]
                   - bi * d_scr[1, :, :])
            dni = (r_scr[1, :, :] + br * d_scr[1, :, :]
                   + bi * d_scr[0, :, :])
            d_scr[0, :, :] = dnr
            d_scr[1, :, :] = dni
            dpd[0, C0:C0 + nv, :] = dnr
            dpd[1, C0:C0 + nv, :] = dni
            for w in range(1, Ht + 1):
                dpd[0, C0 + w * nv:C0 + (w + 1) * nv, :] = \
                    pltpu.roll(dnr, nh - w, 1)
                dpd[1, C0 + w * nv:C0 + (w + 1) * nv, :] = \
                    pltpu.roll(dni, nh - w, 1)
                dpd[0, C0 - w * nv:C0 - (w - 1) * nv, :] = \
                    pltpu.roll(dnr, w, 1)
                dpd[1, C0 - w * nv:C0 - (w - 1) * nv, :] = \
                    pltpu.roll(dni, w, 1)

        # one HBM fetch of the (re, im) value block per grid step
        qbr = jnp.zeros((Bv, nh), _F)
        qbi = jnp.zeros((Bv, nh), _F)
        for k8, items in tgroups.items():
            winr = dpd[0, pl.ds(C0 + j * Bv + k8, Bv + 8), :]
            wini = dpd[1, pl.ds(C0 + j * Bv + k8, Bv + 8), :]
            for o, d in items:
                pr = coef_ref[0, d]
                pi = coef_ref[1, d]
                wr = winr[o:o + Bv, :]
                wi = wini[o:o + Bv, :]
                qbr = qbr + pr * wr - pi * wi
                qbi = qbi + pr * wi + pi * wr
        q_scr[0, pl.ds(j * Bv, Bv), :] = qbr
        q_scr[1, pl.ds(j * Bv, Bv), :] = qbi
        dr_ = d_scr[0, pl.ds(j * Bv, Bv), :]
        di_ = d_scr[1, pl.ds(j * Bv, Bv), :]
        dqa[0, 0] += jnp.sum(dr_ * qbr - di_ * qbi)
        dqa[1, 0] += jnp.sum(dr_ * qbi + di_ * qbr)

        @pl.when(j == G - 1)
        def _():
            dqr = dqa[0, 0]
            dqi = dqa[1, 0]
            der = bd[2, 0]
            dei = bd[3, 0]
            # |.|^2-underflow freeze (stream_cg._mag2_zero): exact-zero
            # tests miss denormal deltas -> post-convergence overflow
            done = ((al[2, 0] > 0.5)
                    | _mag2_zero(der, dei)
                    | _mag2_zero(dqr, dqi))
            sdr = jnp.where(done, 1.0, dqr)
            sdi = jnp.where(done, 1.0, dqi)
            ar_, ai_ = _smith_cdiv(der, dei, sdr, sdi)
            al[0, 0] = jnp.where(done, 0.0, ar_)
            al[1, 0] = jnp.where(done, 0.0, ai_)
            al[2, 0] = jnp.where(done, 1.0, 0.0)

            @pl.when(it == K - 1)
            def _():
                xn_ref[...] = x_scr[...]
                rn_ref[...] = r_scr[...]
                dn_ref[...] = d_scr[...]
                qn_ref[...] = q_scr[...]
                alphan_ref[0, 0] = al[0, 0]
                alphan_ref[1, 0] = al[1, 0]
                deltan_ref[0, 0] = bd[2, 0]
                deltan_ref[1, 0] = bd[3, 0]

    scratch = [pltpu.VMEM((2, nv, nh), _F),          # x
               pltpu.VMEM((2, nv, nh), _F),          # r
               pltpu.VMEM((2, nv, nh), _F),          # d
               pltpu.VMEM((2, nv, nh), _F),          # q
               pltpu.VMEM((2, DS, nh), _F),          # dpd (wrap pads)
               pltpu.SMEM((3, 1), _F),               # alpha+done
               pltpu.SMEM((2, 1), _F),               # <d,q>
               pltpu.SMEM((4, 1), _F)]               # beta,delta

    def step(planes2, beta1, delta1, x, r, d, q):
        return pl.pallas_call(
            kernel,
            grid=(K, G),
            in_specs=[smem_in, smem_in, coef_spec] + [full] * 4,
            out_specs=(full, full, full, full, smem_out((2, 1)),
                       smem_out((2, 1)), smem_out((K, 1))),
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((K, 1), _F)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, planes2, x, r, d, q)

    return step


def stream_cg_dia_grid_cplx(taps, grid, Bv, planes2, bg2, x0g2,
                            n_iterations: int, chunk: int = _CHUNK,
                            interpret: bool = False):
    """Complex grid-layout solve: bg2/x0g2 are (2, nv, 128) plane pairs
    of column-major grids.  Returns (x (2, nv, 128),
    history (n_iterations+1,)) with history = |<r,r>|^(1/2) per
    iteration (matches ``block_cg_planes``)."""
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_dia_cplx(taps, grid, Bv, K, interpret)
        return steps[K]

    r0 = bg2 - dia_apply_grid_cplx(taps, grid, planes2, x0g2)
    d0r, d0i = _udot2(r0[0], r0[1], r0[0], r0[1])
    hists = [jnp.sqrt(jnp.sqrt(d0r * d0r + d0i * d0i))[None]]
    x, r = x0g2, r0
    d = jnp.zeros_like(bg2)
    q = jnp.zeros_like(bg2)
    beta = jnp.zeros((2, 1), _F)
    delta = jnp.stack([d0r, d0i]).reshape(2, 1)
    for K in _chunks(n_iterations, chunk):
        step = get_step(K)
        x, r, d, q, alpha, delta_pre, hk = step(planes2, beta, delta,
                                                x, r, d, q)
        # the kernel's state trails by the final alpha update
        ar = alpha[0, 0]
        ai = alpha[1, 0]
        xr = x[0] + ar * d[0] - ai * d[1]
        xi = x[1] + ar * d[1] + ai * d[0]
        rr = r[0] - (ar * q[0] - ai * q[1])
        ri = r[1] - (ar * q[1] + ai * q[0])
        x = jnp.stack([xr, xi])
        r = jnp.stack([rr, ri])
        dnr, dni = _udot2(rr, ri, rr, ri)
        done = (_mag2_zero(delta_pre[0, 0], delta_pre[1, 0])
                | ((ar == 0.0) & (ai == 0.0)))
        sdr = jnp.where(done, 1.0, delta_pre[0, 0])
        sdi = jnp.where(done, 1.0, delta_pre[1, 0])
        br, bi = _smith_cdiv(dnr, dni, sdr, sdi)
        beta = jnp.stack([jnp.where(done, 0.0, br),
                          jnp.where(done, 0.0, bi)]).reshape(2, 1)
        delta = jnp.stack([dnr, dni]).reshape(2, 1)
        hists.append(hk[:K - 1, 0])
        hists.append(jnp.sqrt(jnp.sqrt(dnr * dnr + dni * dni))[None])
    return x, jnp.concatenate(hists)


def to_dia_grid_cplx(z, nv):
    """complex (n,) -> (2, nv, 128) column-major plane pair."""
    z = np.asarray(z)
    return jnp.stack([to_dia_grid(np.ascontiguousarray(z.real), nv),
                      to_dia_grid(np.ascontiguousarray(z.imag), nv)])


def from_dia_grid_cplx(xg2, n):
    """(2, nv, 128) plane pair -> complex (n,)."""
    return (np.asarray(from_dia_grid(xg2[0], n))
            + 1j * np.asarray(from_dia_grid(xg2[1], n)))


def stream_cg_dia_cplx(dia, b, x0=None, n_iterations: int = 10,
                       block_rows: int = None, chunk: int = _CHUNK,
                       interpret: bool = False):
    """Complex banded-streaming CG on a complex
    :class:`tpcg.sparse.DiaMatrix`.  b, x0 : complex (n,) vectors.
    Returns (x complex (n,), history)."""
    taps, grid, Bv, planes2 = prepare_dia_stream_cplx(dia, block_rows)
    nv, _ = grid
    bg2 = to_dia_grid_cplx(b, nv)
    x0g2 = (jnp.zeros_like(bg2) if x0 is None
            else to_dia_grid_cplx(x0, nv))
    xg2, hist = stream_cg_dia_grid_cplx(taps, grid, Bv, planes2, bg2,
                                        x0g2, n_iterations, chunk=chunk,
                                        interpret=interpret)
    return from_dia_grid_cplx(xg2, int(dia.n)), hist


def stream_cg_dia_cplx_block(dia, B, X0=None, n_iterations: int = 10,
                             block_rows: int = None, chunk: int = _CHUNK,
                             interpret: bool = False):
    """Multi-RHS complex banded-streaming CG: ``B``/``X0`` complex
    (n, nrhs).  Columns run as ONE ``lax.map`` device program of
    single-RHS kernel solves (block CG shares no cross-RHS state; the
    complex kernel has no fat-batch tier yet -- at the mhd1280b scale
    the value stream is VMEM-resident, so there is no coefficient
    traffic for a fat batch to amortize).  Returns
    (X complex (n, nrhs), history (n_iterations+1, nrhs))."""
    taps, grid, Bv, planes2 = prepare_dia_stream_cplx(dia, block_rows)
    nv, _ = grid
    n = int(dia.n)
    B = np.asarray(B)
    nrhs = B.shape[1]
    bgs = jnp.stack([to_dia_grid_cplx(B[:, c], nv) for c in range(nrhs)])
    x0gs = (jnp.zeros_like(bgs) if X0 is None
            else jnp.stack([to_dia_grid_cplx(np.asarray(X0)[:, c], nv)
                            for c in range(nrhs)]))

    def one(args):
        bg2, xg2 = args
        return stream_cg_dia_grid_cplx(taps, grid, Bv, planes2, bg2,
                                       xg2, n_iterations, chunk=chunk,
                                       interpret=interpret)

    xs, hists = jax.lax.map(one, (bgs, x0gs))
    X = np.stack([from_dia_grid_cplx(xs[c], n)
                  for c in range(nrhs)], axis=1)
    return X, np.asarray(hists).T


def stream_cg_dia(dia, b, x0=None, n_iterations: int = 10,
                  block_rows: int = None, chunk: int = _CHUNK,
                  interpret: bool = False):
    """Banded-streaming CG on a real :class:`tpcg.sparse.DiaMatrix`.

    b, x0 : (n,) real vectors.  Returns (x (n,), history).
    """
    taps, grid, Bv, planes = prepare_dia_stream(dia, block_rows)
    nv, _ = grid
    bg = to_dia_grid(b, nv)
    x0g = (jnp.zeros_like(bg) if x0 is None else to_dia_grid(x0, nv))
    xg, hist = stream_cg_dia_grid(taps, grid, Bv, planes, bg, x0g,
                                  n_iterations, chunk=chunk,
                                  interpret=interpret)
    return from_dia_grid(xg, int(dia.n)), hist


def stream_cg_dia_block(dia, B, X0=None, n_iterations: int = 10,
                        block_rows: int = None, chunk: int = _CHUNK,
                        interpret: bool = False):
    """Multi-RHS banded-streaming CG: ``B``/``X0`` are (n, nrhs).

    RHS columns run through the fat batched kernel in blocks of
    ``_dia_batch_nb`` columns (one coefficient stream per block --
    the reference's block-CG amortization, report Fig. 6), the blocks
    themselves as ONE ``lax.map`` device program.  Block CG shares no
    state across RHS columns beyond the operator (``tpcg/cg.py`` runs
    independent recurrences too), so histories equal per-column
    :func:`stream_cg_dia` runs; ragged tails are zero-RHS padded
    (a zero column freezes at delta0 == 0).  Returns
    (X (n, nrhs), history (n_iterations + 1, nrhs)).
    """
    taps, grid, Bv, planes = prepare_dia_stream(dia, block_rows)
    nv, _ = grid
    n = int(dia.n)
    B = jnp.asarray(B, _F)
    nrhs = B.shape[1]
    nb = _dia_batch_nb(taps, grid, Bv, planes.shape[0], nrhs)
    npad = -nrhs % nb
    ntot = nv * _NH

    def regrid(M):       # (n, cols) -> (cols+pad, nv, 128) column-major
        Mp = jnp.zeros((nrhs + npad, ntot), _F).at[:nrhs, :n].set(M.T)
        return Mp.reshape(-1, _NH, nv).transpose(0, 2, 1)

    bgs = regrid(B)
    x0gs = (jnp.zeros_like(bgs) if X0 is None
            else regrid(jnp.asarray(X0, _F)))

    if nb == 1:
        def one(args):
            bg, xg = args
            return stream_cg_dia_grid(taps, grid, Bv, planes, bg[0],
                                      xg[0], n_iterations, chunk=chunk,
                                      interpret=interpret)
    else:
        def one(args):
            bg, xg = args
            return stream_cg_dia_grid_batch(taps, grid, Bv, planes, bg,
                                            xg, n_iterations,
                                            chunk=chunk,
                                            interpret=interpret)

    blocks = (bgs.reshape(-1, nb, nv, _NH), x0gs.reshape(-1, nb, nv, _NH))
    xs, hists = jax.lax.map(one, blocks)
    if nb == 1:
        xs, hists = xs[:, None], hists[:, :, None]
    # (nblk, nb, nv, nh) / (nblk, it+1, nb) -> column-major columns
    X = xs.reshape(-1, nv, _NH).transpose(0, 2, 1) \
          .reshape(-1, ntot)[:nrhs, :n].T
    H = hists.transpose(1, 0, 2).reshape(n_iterations + 1, -1)[:, :nrhs]
    return X, H
