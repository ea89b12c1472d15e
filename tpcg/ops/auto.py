"""Automatic kernel selection for stencil CG solves.

The framework has four execution paths for the fixed-iteration complex
block-CG of the reference (``clcg.c:111-466``), each fastest in a
different regime on TPU:

  vmem-coef  : whole solve in one Pallas kernel with coefficient planes
               resident in VMEM (``fused_cg``) -- the default for any
               grid up to N <= 512, any RHS batch (VMEM coefficient
               reads are nearly free; measured faster than vmem-const
               at every VMEM-resident size).
  vmem-const : whole solve in one Pallas kernel, coefficients folded to
               compile-time scalars (``fused_cg_const``) -- available
               explicitly for constant-interior stencils.
  stream     : constant-coefficient grids beyond VMEM (N >= 1024).
               Tiers, best-fitting picked per grid: the VMEM-resident
               multi-iteration v4 kernel (state in scratch across
               iterations, ~zero steady HBM traffic; 1357/1435/1307
               GFLOPS at N=1024/1536/2048 chained true-device timing),
               the explicit-DMA panel-round-trip v5 kernel beyond the
               v4 budget (945/938/853 GFLOPS at N=2560/3072/4096, and
               793.8 at the column-padded N=2896 -- vs ~430-490 on the
               old v2 fallback), then the merged v3 iteration and the
               two-kernel v2 pipeline.  Lane-unaligned widths
               column-zero-pad to the next 128 multiple, keeping the
               const-tap path via the repositioned right-edge
               correction (cpos).  Multi-RHS runs sequential resident
               solves where those fit (faster per RHS than any batched
               kernel), else the (G, nb)-grid batched kernels.
  stream-coef: variable coefficients beyond VMEM.  Symmetric operators
               (everything CG is defined for) stream only the half
               coefficient planes through the resident v4-sym kernel
               (1064/930 GFLOPS at N=1024/2048); non-symmetric
               stencils fall back to per-plane v4/v3/v2 streaming.
               Multi-RHS runs as one lax.map program of resident
               solves where v4 fits, else the fat batched kernel
               shares one coefficient fetch per row block (the
               reference's block-CG amortization, report Fig. 6).
  stream-real: single-plane kernels for REAL stencils from N >= 1024
               (below that the XLA shift-multiply path is already
               near-roofline): the resident v4 tier where it fits
               (930 GFLOPS at N=2048 chained, 3.4x the v2 pipeline),
               the panel-round-trip real v5 beyond (495.7/502.9 GFLOPS
               at N=3072/4096, 2.4x the old v2-real fallback; the
               direction field stays resident to ~5000^2), v2 beyond
               that.  Unaligned widths column-pad like the complex
               path.  General 1-D BANDED matrices (not grid stencils)
               have their own streaming kernel in stream_cg_dia.py
               (m_t1-class 192 GFLOPS vs 59 on the XLA
               shift-multiply).
  xla        : pure-XLA shift-multiply streaming (``block_cg_planes`` /
               ``block_cg``) -- anything else, any backend; also the
               parity oracle for the Pallas paths.

``plan_stencil_cg`` inspects the stencil once (host side), picks the
path, and returns a plan whose ``solve`` runs the whole loop in a single
device program.  This mirrors the reference hosts' one-time kernel
build + buffer upload (``clcg.c:137-214``, ``cl.py:70-94``) -- planning
is the expensive step, solves are pure device execution.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

# grids up to this many nodes fit the VMEM-resident kernels on v5e
# (empirical: N=512 compiles and runs; N=1024 exceeds VMEM)
_VMEM_NODES = 512 * 512
# real streaming pays off from N=1024 now that the resident v4 kernel
# exists (benchmarks/exp_realstream4.py: v4 404 vs XLA 384 GFLOPS at
# N=1024, 745 vs 179 at N=2048, 296 vs 162 at N=2896)
_REAL_STREAM_NODES = 1024 * 1024
# grids at/above this take the merged v3 streaming iteration (const
# AND coef paths) when its VMEM scratch fits (benchmarks/exp_stream3.py
# + exp_stream3c.py: v3 wins at N=2048 -- const 844->727 us/it
# keep_r=1 Bv=64, coef 1153->962 keep_r=1 Bv=32, both bit-exact vs v2
# at the same Bv; at N<=1024 the two-kernel v2 pipeline is faster).
# v3 is now the fallback tier: the resident v4 kernel supersedes it
# wherever the v4 VMEM budget fits (see _v4_config).
_V3_NODES = 2048 * 2048
# VMEM-resident complex batches beyond this go to the (chunked) XLA
# planes path instead of the fused kernel (benchmarks/BLOCK_RHS.md)
_FUSED_BATCH_MAX = 2


def _pad_rows(stencil, mult=128):
    """Zero-row padding of a stencil to the next multiple of ``mult``
    grid rows, or None when already aligned.

    The padded operator maps pad rows to 0; with b and x0 zero there
    the CG state stays EXACTLY zero on the pads (every update
    multiplies or adds zeros), so solutions and residual histories are
    semantically unchanged -- the pads only contribute +0.0 terms to
    the reductions.  This is what lets awkward grid heights (the
    distributed family N = (W-1)*M + 1, primes, 2896-style 16*odd) use
    the streaming/resident kernels instead of degenerating to the XLA
    path: padding breaks the const-tap edge detection, so padded plans
    land on the coefficient paths (sym for symmetric operators)."""
    import dataclasses
    nv, nh = stencil.grid
    nv2 = -(-nv // mult) * mult
    if nv2 == nv:
        return None
    c = np.asarray(stencil.coef)
    cp = np.zeros((c.shape[0], nv2, nh), c.dtype)
    cp[:, :nv] = c
    return dataclasses.replace(stencil, coef=cp, grid=(nv2, nh))


def _pick_bv_budget(nv, nh, scratch_bytes, win_per_bvnh, cap):
    """Largest viable block_rows whose pipeline windows fit next to the
    resident scratch.  win_per_bvnh is the measured bytes of
    double-buffered block windows per (Bv * nh) element for the kernel
    variant; the 117 MB budget is calibrated on the observed compile
    envelope (N=2048 const Bv=64 fits at ~115 MB estimated, Bv=128
    fails at ~130; N=1536 keep_q Bv=256 fails at ~119, Bv=128 fits)."""
    from .stream_cg import _pick_block_rows
    budget = 117e6
    cands = {c for c in (512, 256, 128, 64, 32, 16, 8) if c <= cap}
    b = _pick_block_rows(nv)
    if b <= cap:
        cands.add(b)
    for c in sorted(cands, reverse=True):
        if (nv % c == 0 and nv // c >= 2
                and scratch_bytes + win_per_bvnh * c * nh <= budget):
            return c
    return None


def _v4_config(nv, nh, coef):
    """(keep_q, block_rows) for the VMEM-resident v4 kernel, or None
    when its scratch cannot fit (then v3/v2 stream).

    Measured on v5e (benchmarks/exp_stream4.py + exp_stream4b.py,
    1000 it, RT-amortized, helm k=40): N=1024 const 161->99 us/it
    (1018 GFLOPS, keep_q Bv=256), coef 191->125 (806, Bv=128; Bv=256
    is slightly slower there); N=2048 const 796->508 (792 GFLOPS,
    q recomputed, Bv=64 -- Bv=128's pipeline buffers overflow next to
    the 101 MB x/r/d scratch).  Bit-exact vs v2/v3 at the same Bv.
    The coef variant needs keep_q (recomputing q would re-stream the
    coefficient planes), so N=2048 coef stays on v3.
    """
    from .stream_cg_v4 import _KEEPQ_BYTES, _RESIDENT_BYTES
    nodes = nv * nh
    keep_q = 8 * nodes * 4 <= _KEEPQ_BYTES
    if not keep_q and (coef or 6 * nodes * 4 > _RESIDENT_BYTES):
        return None
    scratch = (8 if keep_q else 6) * nodes * 4
    # window footprints (bytes per Bv*nh): const = 6 state arrays x
    # 2 planes x 4 B x 2 buffers + pads; coef adds the 9-plane
    # coefficient block windows.  coef caps at 128 because Bv=256
    # measured slightly SLOWER (exp_stream4b.py), not for fit.
    bv = _pick_bv_budget(nv, nh, scratch, 250 if coef else 110,
                         cap=128 if coef else 512)
    return (keep_q, bv) if bv is not None else None


def _v4_sym_config(nv, nh):
    """(keep_q, block_rows) for the symmetric half-plane coefficient
    kernel, or None.  Unlike the general coef variant it has a
    recompute tier (halved planes streamed twice still beat v3's
    state+full-coef traffic): 984 -> 711 us/it at N=2048 with Bv=32
    (Bv=64 overflows next to the coefficient pads); keep_q sizes run
    Bv=256 (855 GFLOPS at N=1024).  benchmarks/exp_stream4sym.py.
    """
    from .stream_cg_v4 import _KEEPQ_BYTES, _RESIDENT_BYTES
    nodes = nv * nh
    keep_q = 8 * nodes * 4 <= _KEEPQ_BYTES
    if not keep_q and 6 * nodes * 4 > _RESIDENT_BYTES:
        return None
    scratch = (8 if keep_q else 6) * nodes * 4
    # state windows + half-plane coefficient windows + the padded
    # coefficient scratch buffers scale together with Bv
    bv = _pick_bv_budget(nv, nh, scratch, 230, cap=256)
    return (keep_q, bv) if bv is not None else None


def _v5_sym_config(nv, nh, nH1):
    """(d_resident, block_rows) for the variable-coefficient panel-
    round-trip kernel (v5-sym), or None.

    Covers SYMMETRIC var-coeff grids beyond the v4-sym resident budget
    (complex nodes > ~2.7M): the v5 explicit-DMA state-panel machinery
    with the half coefficient planes streamed through the normal grid
    pipeline (``tpcg.ops.stream_cg_v5_sym``).  Tier A keeps the
    direction field resident (fits to ~3400^2); tier B round-trips
    everything.  Needs 128-aligned lane widths for the state DMAs.
    nH1 = number of half coefficient planes (centre + one per offset
    pair; 5 for the 9-point Helmholtz stencils).
    """
    from .stream_cg_v5 import _V5_DRES_BYTES
    if nh % 128 != 0:
        return None
    nodes = nv * nh
    d_res = 8 * nodes <= _V5_DRES_BYTES
    scratch = 8 * nodes if d_res else 0
    # bytes per Bv*nh element: state panel staging (rb/xb/rb1/qb
    # double-buffered + xo/ro/q_scr ~88) + double-buffered half-plane
    # coefficient windows (16*nH1) + padded coefficient scratch
    # (8*nH1); tier B adds the d panel stream (~32)
    win = 24 * nH1 + (96 if d_res else 128)
    bv = _pick_bv_budget(nv, nh, scratch, win, cap=64)
    return (d_res, bv) if bv is not None else None


def _v4_real_config(nv, nh):
    """(keep_q, block_rows) for the resident REAL v4 kernel, or None.

    Single f32 planes: x/r/d/q resident up to ~2400^2 (keep_q), the
    recompute tier to ~2900^2.  Measured (exp_realstream4.py): Bv=256
    best at keep_q sizes (745 GFLOPS at N=2048); the recompute tier is
    capped at Bv=64 like the complex kernel.
    """
    from .stream_cg_v4 import _KEEPQ_BYTES, _RESIDENT_BYTES
    nodes = nv * nh
    keep_q = 4 * nodes * 4 <= _KEEPQ_BYTES
    if not keep_q and 3 * nodes * 4 > _RESIDENT_BYTES:
        return None
    scratch = (4 if keep_q else 3) * nodes * 4
    bv = _pick_bv_budget(nv, nh, scratch, 60, cap=512)
    return (keep_q, bv) if bv is not None else None


def _v5_config(nv, nh):
    """(d_resident, block_rows) for the explicit-DMA panel-round-trip
    v5 kernel (complex const), or None.

    v5 covers constant-tap grids beyond the v4 resident budget
    (complex nodes > ~4.2M): tier A keeps the direction field in VMEM
    scratch (one complex field = 8*nodes bytes, fits to ~3600^2) with
    x/r panel round-trips (10 state planes/iteration); tier B
    round-trips everything (16 planes/iteration, any size).  Both
    need 128-aligned lane widths for the HBM<->VMEM DMAs.
    """
    from .stream_cg_v5 import _V5_DRES_BYTES
    if nh % 128 != 0:
        return None
    nodes = nv * nh
    d_res = 8 * nodes <= _V5_DRES_BYTES      # 2 f32 planes * 4 B/node
    scratch = 8 * nodes if d_res else 0
    # panel staging bytes per Bv*nh element, calibrated on the observed
    # compile envelope: tier A Bv=128 fits at N=2560 (measured 871
    # GFLOPS) but overflows at N=3072 (Bv=64 = 827).  Tier B caps at
    # Bv=64 on MEASUREMENT, not fit: N=4096 Bv=64 = 770.7 GFLOPS vs
    # Bv=128 = 528.5 (smaller panels double-buffer better next to the
    # five in-flight panel streams).
    bv = _pick_bv_budget(nv, nh, scratch, 160 if not d_res else 120,
                         cap=128 if d_res else 64)
    return (d_res, bv) if bv is not None else None


def _v5_real_config(nv, nh):
    """(d_resident, block_rows) for the REAL panel-round-trip v5
    kernel, or None.  Covers const-tap real grids beyond the real v4
    budget (nodes > ~8.8M): tier A (single-plane direction field
    resident, 67 MB at 4096^2) to ~5000^2, tier B beyond."""
    if nh % 128 != 0:
        return None
    nodes = nv * nh
    from .stream_cg_v5_real import _V5R_DRES_BYTES
    d_res = 4 * nodes <= _V5R_DRES_BYTES     # 1 f32 plane
    scratch = 4 * nodes if d_res else 0
    bv = _pick_bv_budget(nv, nh, scratch, 80 if not d_res else 60,
                         cap=128 if d_res else 64)
    return (d_res, bv) if bv is not None else None


def _v3_config(nv, nh, coef):
    """(keep_r, block_rows) for the merged v3 kernel, or None if its
    VMEM scratch cannot fit and v2 must be used.

    Scratch is (q, dnew[, r]) f32 planes = (2 or 3) * 2*nv*nh*4 B plus
    the double-buffered pipeline blocks; measured fits at nv*nh=2048^2
    (benchmarks/exp_stream3b/c.py): keep_r needs Bv<=64 (const) /
    Bv<=32 (coef) under the 127 MB limit, no-keep_r fits at the
    default Bv.  Larger grids overflow even without keep_r.
    """
    nodes = nv * nh
    bv = 32 if coef else 64
    if (3 * 2 * nodes * 4 <= 101 * 1024 * 1024
            and nv % bv == 0 and nv // bv >= 2):
        return True, bv
    if 2 * 2 * nodes * 4 <= 70 * 1024 * 1024:
        # coef pipeline blocks at the default Bv=128 overflow next to
        # the 2-plane scratch (measured at N=2048); Bv=64 fits.
        bv64 = 64 if (coef and nv % 64 == 0 and nv // 64 >= 2) else None
        return False, bv64
    return None


def _norm_b(b, nv, nh):
    # squeeze only for inputs WITHOUT a batch axis: an (Nv, Nh) grid or
    # a flat (Nv*Nh,) vector.  Anything else -- explicit (B, Nv, Nh),
    # flat (B*Nv*Nh,), column-stacked (B, Nv*Nh) -- keeps its batch
    # axis in the output (a ``squeeze = ndim < 3`` heuristic silently
    # returned only the first RHS for flat batches).
    b = np.asarray(b)
    squeeze = (b.shape == (nv, nh)
               or (b.ndim == 1 and b.size == nv * nh))
    B = b.reshape(-1, nv, nh)
    return B, squeeze


@dataclass
class StencilCGPlan:
    """A chosen execution path for one (stencil, n_iterations) pair."""
    path: str        # vmem-const | vmem-coef | stream | stream-coef | xla
    grid: tuple
    n_iterations: int
    _solve: Callable = field(repr=False)
    _solve_planes: Optional[Callable] = field(default=None, repr=False)

    def solve(self, b, x0=None):
        """b, x0 : complex (Nv, Nh) or (B, Nv, Nh) arrays.

        Returns ``(x, history)`` with x complex64 shaped like b and
        history ``(n_iterations+1,)`` (single RHS) or
        ``(n_iterations+1, B)``.

        NOTE: this surface is numpy-in/numpy-out -- each call uploads b
        and downloads x through the host.  On a tunneled TPU that
        transfer dominates for large grids (134 MB planes at N=4096
        take ~3 s each way at ~48 MB/s); repeated device-resident
        solves should use :meth:`solve_planes`.
        """
        return self._solve(b, x0)

    def solve_planes(self, bp, x0p=None):
        """Device-resident single-RHS surface for the Pallas stream
        paths: ``bp``/``x0p`` are float32 plane arrays (already on
        device via ``jax.device_put``) -- (2, Nv, Nh) re/im planes for
        the complex paths, single-plane (Nv, Nh) for ``stream-real``.
        Returns device ``(x_planes, history)`` with no host round-trip.
        Jit-safe -- compose it into larger programs.  Raises on paths
        without a planes kernel (vmem/xla: use :meth:`solve`)."""
        if self._solve_planes is None:
            raise ValueError(
                f"path {self.path!r} has no device-resident planes "
                "surface; use plan.solve")
        import jax.numpy as jnp
        if x0p is None:
            x0p = jnp.zeros_like(bp)
        return self._solve_planes(bp, x0p)


def plan_stencil_cg(stencil, n_iterations: int, nb: int = 1,
                    path: Optional[str] = None,
                    interpret: bool = False) -> StencilCGPlan:
    """Pick and prepare the fastest CG path for ``stencil``.

    nb : planned RHS batch size.  Every path handles any batch at solve
         time; the stream paths dispatch batched (G, nb)-grid kernels
         for nb >= 2 (chunked at 16 RHS per program).
    path : force a specific path (mainly for tests/benchmarks).
    interpret : run Pallas kernels in interpret mode (CPU testing).
    """
    import jax
    from jax import default_backend

    nv, nh = stencil.grid
    n = nv * nh
    forced = path is not None
    coef = np.asarray(stencil.coef)
    is_complex = np.iscomplexobj(coef)
    on_accel = default_backend() != "cpu" or interpret

    def _streamable():
        # the streaming kernels need a viable row-block decomposition:
        # prime-ish grid heights (no divisor >= 8) would degenerate to
        # one whole-grid block (VMEM blowup) or lane-starved tiny blocks
        from .stream_cg import _pick_block_rows
        bv = _pick_block_rows(nv)
        return nv // bv >= 2 and bv >= 8

    prepared = None
    if path is None:
        path = "xla"
        if (not is_complex and on_accel and n >= _REAL_STREAM_NODES
                and _streamable()):
            path = "stream-real"
        if is_complex and on_accel:
            if n <= _VMEM_NODES:
                # measured on v5e (helm_fe, 5000/2000 its): the
                # coefficient-planes kernel beats the const-tap variant
                # at every VMEM-resident size (203 vs 179 GFLOPS at
                # N=128, 775 vs 684 at N=512) -- VMEM coefficient reads
                # are nearly free, the const kernel's strip/edge
                # corrections are not.  vmem-const stays available as an
                # explicit path.  For RHS batches past a few, the XLA
                # planes path wins outright (benchmarks/BLOCK_RHS.md:
                # 1305 vs 919 GFLOPS at b=32; its working set tiles,
                # the monolithic kernel's is all-resident) -- route
                # those to "xla" (which chunks batches at 32).
                path = ("vmem-coef" if nb <= _FUSED_BATCH_MAX
                        else "xla")
            elif _streamable():
                # beyond VMEM the coefficient traffic is real HBM bytes:
                # fold constant interiors to compile-time taps.  The
                # probe's result is kept and handed to the solver --
                # prepare_stream scans the whole coefficient array.
                try:
                    from .stream_cg import prepare_stream
                    prepared = prepare_stream(stencil)
                    path = "stream"
                except ValueError:
                    path = "stream-coef"

    if path == "xla" and not forced and on_accel and not _streamable():
        # awkward grid heights beyond VMEM: zero-row padding restores a
        # viable block decomposition (see _pad_rows); only keep the
        # padded plan if it actually lands on a streaming path.  An
        # EXPLICIT path='xla' (the tests' parity-oracle force) is never
        # re-routed -- `forced` above.
        big = ((is_complex and n > _VMEM_NODES)
               or (not is_complex and n >= _REAL_STREAM_NODES))
        padded = _pad_rows(stencil) if big else None
        if padded is not None:
            inner = plan_stencil_cg(padded, n_iterations, nb=nb,
                                    interpret=interpret)
            if inner.path != "xla":
                nv2 = padded.grid[0]

                def solve(b, x0, _inner=inner):
                    B, squeeze = _norm_b(b, nv, nh)
                    Bp = np.zeros((B.shape[0], nv2, nh), B.dtype)
                    Bp[:, :nv] = B
                    X0p = None
                    if x0 is not None:
                        X0, _ = _norm_b(x0, nv, nh)
                        X0p = np.zeros_like(Bp)
                        X0p[:, :nv] = X0
                    x, hist = _inner.solve(Bp, X0p)
                    x = np.asarray(x)[..., :nv, :]
                    if squeeze:
                        return x[0], hist[:, 0]
                    return x, hist

                solve_planes = None
                if inner._solve_planes is not None:
                    import jax.numpy as jnp

                    def solve_planes(bp, x0p, _inner=inner):
                        # pad axis -2 (grid rows) whatever the rank:
                        # complex planes are (2, Nv, Nh), real-path
                        # planes are plain (Nv, Nh)
                        pad = (((0, 0),) * (bp.ndim - 2)
                               + ((0, nv2 - nv), (0, 0)))
                        x, hist = _inner.solve_planes(
                            jnp.pad(bp, pad), jnp.pad(x0p, pad))
                        return x[..., :nv, :], hist

                return StencilCGPlan(path="pad->" + inner.path,
                                     grid=(nv, nh),
                                     n_iterations=n_iterations,
                                     _solve=solve,
                                     _solve_planes=solve_planes)

    solve = _build_solver(stencil, n_iterations, path, interpret,
                          prepared=prepared)
    return StencilCGPlan(path=path, grid=(nv, nh),
                         n_iterations=n_iterations, _solve=solve,
                         _solve_planes=getattr(solve, "_planes", None))


def stencil_cg(stencil, b, x0=None, n_iterations: int = 10,
               path: Optional[str] = None, interpret: bool = False):
    """One-shot convenience: plan + solve (see :func:`plan_stencil_cg`)."""
    b_arr = np.asarray(b)
    nv, nh = stencil.grid
    nb = b_arr.size // (nv * nh)
    plan = plan_stencil_cg(stencil, n_iterations, nb=nb, path=path,
                           interpret=interpret)
    return plan.solve(b, x0)


def _build_solver(stencil, n_iterations, path, interpret, prepared=None):
    import jax
    import jax.numpy as jnp

    nv, nh = stencil.grid

    if path == "vmem-const":
        from .fused_cg_const import prepare_const, fused_cg_const_planes
        cr, ci, strips4 = prepare_const(stencil)
        fn = jax.jit(lambda s4, bp, x0p: fused_cg_const_planes(
            stencil.offsets, stencil.grid, cr, ci, s4, bp, x0p,
            n_iterations, interpret=interpret))

        def solve(b, x0):
            B, squeeze = _norm_b(b, nv, nh)
            bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
            if x0 is None:
                x0p = jnp.zeros_like(bp)
            else:
                X0, _ = _norm_b(x0, nv, nh)
                x0p = jnp.asarray(np.stack([X0.real, X0.imag])
                                  .astype(np.float32))
            x, hist = fn(strips4, bp, x0p)
            x = np.asarray(x)
            hist = np.asarray(hist)
            xc = (x[0] + 1j * x[1]).astype(np.complex64)
            if squeeze:
                return xc[0], hist[:, 0]
            return xc, hist
        return solve

    if path == "vmem-coef":
        from .fused_cg import prepare_coef3, fused_cg_stencil_chunked
        coef3 = prepare_coef3(stencil)
        # chunked: batches beyond the fused kernel's compile cap run as
        # a scan of 16-RHS kernels in one program (no b=32 cliff)
        fn = jax.jit(lambda c3, bp, x0p: fused_cg_stencil_chunked(
            stencil.offsets, c3, bp, x0p, n_iterations,
            interpret=interpret))

        def solve(b, x0):
            B, squeeze = _norm_b(b, nv, nh)
            bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
            if x0 is None:
                x0p = jnp.zeros_like(bp)
            else:
                X0, _ = _norm_b(x0, nv, nh)
                x0p = jnp.asarray(np.stack([X0.real, X0.imag])
                                  .astype(np.float32))
            x, hist = fn(coef3, bp, x0p)
            x = np.asarray(x)
            hist = np.asarray(hist)
            xc = (x[0] + 1j * x[1]).astype(np.complex64)
            if squeeze:
                return xc[0], hist[:, 0]
            return xc, hist
        return solve

    if path in ("stream", "stream-coef"):
        # The (G, nb)-grid batched kernels fetch the coefficient planes
        # (resp. strips) once per row block for the whole batch, with
        # single-RHS-sized pipeline buffers -- per-RHS HBM traffic drops
        # from 10 + 2*noff to 10 + 2*noff/nb planes on the coef path
        # (the reference's block-CG amortization, report Fig. 6).  Cap
        # the batch per program at the SMEM scalar width; larger batches
        # run in chunks.
        _BATCH_CAP = 16
        seq_multi = False
        seq_op = None    # operand for the batched lax.map program
        if path == "stream":
            from .stream_cg import (prepare_stream,
                                    stream_cg_const_planes,
                                    stream_cg_const_planes_batched)
            taps, strips2 = (prepared if prepared is not None
                             else prepare_stream(stencil))
            v4cfg = _v4_config(nv, nh, coef=False)
            v5cfg = _v5_config(nv, nh) if v4cfg is None else None
            v5pad = None
            if v4cfg is None and v5cfg is None and nh % 128 != 0:
                # lane-unaligned width (the N=2896 class): column-zero
                # padding to the next 128 multiple keeps the CONST path
                # (right-edge correction repositioned via cpos + pad
                # zero-mask) instead of degenerating to v3/v2
                nh_pad = -(-nh // 128) * 128
                cfg2 = _v5_config(nv, nh_pad)
                if cfg2 is not None:
                    v5pad = cfg2 + (nh_pad,)
            v3cfg = (_v3_config(nv, nh, coef=False)
                     if v4cfg is None and v5cfg is None
                     and v5pad is None and nv * nh >= _V3_NODES
                     else None)
            if v4cfg is not None:
                # VMEM-resident multi-iteration kernel: zero steady-
                # state HBM traffic (exp_stream4.py / exp_stream4c.py:
                # 1318 GFLOPS at N=1024, 827 at N=2048, chained).
                # Sequential per-RHS v4 solves beat every batched
                # streaming kernel (76-508 us/it/RHS vs 165-850), so
                # multi-RHS loops fn instead of fnb.
                from .stream_cg_v4 import stream_cg_v4_const_planes
                kq, bv = v4cfg
                # where q cannot stay resident, round-trip it through
                # HBM with explicit DMA instead of recomputing: 488 ->
                # 308 us/it at N=2048 (1307 GFLOPS), bit-exact on HW
                # (benchmarks/exp_qhbm notes in NOTES_R3)
                fn_raw = (
                    lambda s2, bp, x0p: stream_cg_v4_const_planes(
                        stencil.offsets, stencil.grid, taps, s2, bp,
                        x0p, n_iterations, keep_q=kq,
                        q_hbm=not kq and nh % 128 == 0,
                        block_rows=bv, interpret=interpret))
                fn = jax.jit(fn_raw)
                seq_multi = True
            elif v5cfg is not None:
                # explicit-DMA panel round-trips beyond the v4 budget:
                # the state planes live in HBM, each phase DMAs row
                # panels in/out (tier A keeps the direction field
                # resident; tier B keeps nothing).  qx mode (q through
                # HBM + deferred x update, ONE apply/iteration) wins at
                # every measured size and is bit-exact vs v2 on HW:
                # 945/938/853 GFLOPS at N=2560/3072/4096 vs the v2
                # fallback's 489/488/494 (benchmarks/exp_stream5.py).
                from .stream_cg_v5 import stream_cg_v5_const_planes
                dres, bv = v5cfg
                fn_raw = (
                    lambda s2, bp, x0p: stream_cg_v5_const_planes(
                        stencil.offsets, stencil.grid, taps, s2, bp,
                        x0p, n_iterations, d_resident=dres, qx=True,
                        block_rows=bv, interpret=interpret))
                fn = jax.jit(fn_raw)
                seq_multi = True
            elif v5pad is not None:
                # column-padded v5 (see above): pads stay exactly zero
                # by construction, so solutions and histories carry
                # only reduction-reassociation-level differences
                from .stream_cg_v5 import (pad_strips,
                                           stream_cg_v5_const_planes)
                dres, bv, nh_pad = v5pad
                strips2 = pad_strips(strips2, nh_pad)
                padw = ((0, 0), (0, 0), (0, nh_pad - nh))

                def fn_raw(s2, bp, x0p, _d=None):
                    x, h = stream_cg_v5_const_planes(
                        stencil.offsets, (nv, nh_pad), taps, s2,
                        jnp.pad(bp, padw), jnp.pad(x0p, padw),
                        n_iterations, d_resident=dres, qx=True,
                        block_rows=bv, cpos=nh - 1,
                        interpret=interpret)
                    return x[..., :nh], h
                fn = jax.jit(fn_raw)
                seq_multi = True
            elif v3cfg is not None:
                # merged one-kernel iteration (q/dnew [+ r] resident in
                # VMEM scratch): 844 -> 727 us/it at N=2048 with
                # keep_r=1 Bv=64, bit-exact vs v2 at the same Bv
                # (benchmarks/exp_stream3c.py).
                from .stream_cg_v3 import stream_cg_v3_const_planes
                kr, bv = v3cfg
                fn = jax.jit(
                    lambda s2, bp, x0p: stream_cg_v3_const_planes(
                        stencil.offsets, stencil.grid, taps, s2, bp,
                        x0p, n_iterations, keep_r=kr, block_rows=bv,
                        interpret=interpret))
            else:
                fn = jax.jit(lambda s2, bp, x0p: stream_cg_const_planes(
                    stencil.offsets, stencil.grid, taps, s2, bp, x0p,
                    n_iterations, interpret=interpret))
            fnb = jax.jit(lambda s2, bp, x0p:
                          stream_cg_const_planes_batched(
                              stencil.offsets, stencil.grid, taps, s2,
                              bp, x0p, n_iterations,
                              interpret=interpret))
        else:
            from .stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes,
                                    stream_cg_coef_planes_batched_fat)
            strips2 = prepare_stream_coef(stencil)
            symprep = None
            try:
                from .stream_cg_v4_sym import (prepare_stream_sym,
                                               stream_cg_v4_sym_planes)
                symprep = prepare_stream_sym(stencil)
            except ValueError:
                pass
            symcfg = (_v4_sym_config(nv, nh) if symprep is not None
                      else None)
            sym5cfg = (_v5_sym_config(nv, nh, len(symprep[0]))
                       if symprep is not None and symcfg is None
                       else None)
            v4cfg = (_v4_config(nv, nh, coef=True)
                     if symcfg is None and sym5cfg is None else None)
            v3cfg = (_v3_config(nv, nh, coef=True)
                     if symcfg is None and sym5cfg is None
                     and v4cfg is None
                     and nv * nh >= _V3_NODES else None)
            if symcfg is not None:
                # CG's symmetry contract halves the coefficient planes:
                # resident state + half-plane streaming (see
                # _v4_sym_config) -- 855 GFLOPS at N=1024, 566 at
                # N=2048 (1.38x v3)
                half_offs, cplanes = symprep
                kq, bv = symcfg
                # cplanes ride as a jit ARGUMENT (closure constants of
                # this size blow up the remote compile request)
                # keep_q=False tier: explicit-DMA q round-trip (and no
                # phase-1 coefficient re-fetch) -- 688 -> 433 us/it at
                # N=2048 (930 GFLOPS), bit-exact on HW
                fn_raw = (
                    lambda cp, bp, x0p: stream_cg_v4_sym_planes(
                        stencil.offsets, stencil.grid, half_offs,
                        cp, bp, x0p, n_iterations, keep_q=kq,
                        q_hbm=not kq and nh % 128 == 0, block_rows=bv,
                        interpret=interpret))
                fn_sym = jax.jit(fn_raw)
                fn = lambda _s2, bp, x0p: fn_sym(cplanes, bp, x0p)
                seq_op = cplanes
                seq_multi = True
            elif sym5cfg is not None:
                # beyond the v4-sym resident budget: explicit-DMA state
                # panel round-trips + half-plane coefficient streaming
                # (the v5 machinery applied to the var-coeff path).  qx
                # mode streams the coefficients ONCE per iteration.
                from .stream_cg_v5_sym import stream_cg_v5_sym_planes
                half_offs, cplanes = symprep
                dres, bv = sym5cfg
                fn_raw = (
                    lambda cp, bp, x0p: stream_cg_v5_sym_planes(
                        stencil.offsets, stencil.grid, half_offs,
                        cp, bp, x0p, n_iterations, d_resident=dres,
                        qx=True, block_rows=bv, interpret=interpret))
                fn_sym = jax.jit(fn_raw)
                fn = lambda _s2, bp, x0p: fn_sym(cplanes, bp, x0p)
                seq_op = cplanes
                seq_multi = True
            elif v4cfg is not None:
                # resident state + coefficients streamed once per
                # iteration: 191->125 us/it at N=1024
                # (benchmarks/exp_stream4.py); sequential per-RHS v4
                # beats the fat batched kernel in this regime too.
                from .stream_cg_v4 import stream_cg_v4_coef_planes
                _, bv = v4cfg
                fn_raw = (
                    lambda cp, bp, x0p: stream_cg_v4_coef_planes(
                        stencil.offsets, stencil.grid, cp, bp, x0p,
                        n_iterations, block_rows=bv,
                        interpret=interpret))
                fn = jax.jit(fn_raw)
                seq_multi = True
            elif v3cfg is not None:
                # 1153 -> 962 us/it at N=2048 with keep_r=1 Bv=32
                # (benchmarks/exp_stream3c.py); needs Bv<=32 to fit
                # the coef pipeline blocks next to the scratch.
                from .stream_cg_v3 import stream_cg_v3_coef_planes
                kr, bv = v3cfg
                fn = jax.jit(
                    lambda cp, bp, x0p: stream_cg_v3_coef_planes(
                        stencil.offsets, stencil.grid, cp, bp, x0p,
                        n_iterations, keep_r=kr, block_rows=bv,
                        interpret=interpret))
            else:
                fn = jax.jit(lambda cp, bp, x0p: stream_cg_coef_planes(
                    stencil.offsets, stencil.grid, cp, bp, x0p,
                    n_iterations, interpret=interpret))
            # fat variant: all RHS share one coefficient fetch per row
            # block (measured >= per-RHS-step everywhere; 1.2-1.37x the
            # sequential loop at N=2048).  Chunk so a viable Bv >= 16
            # exists under the remote compiler's nb*Bv*nh VMEM cap.
            _BATCH_CAP = max(1, min(_BATCH_CAP, (512 * 1024) // (16 * nh)))
            fnb = jax.jit(lambda cp, bp, x0p:
                          stream_cg_coef_planes_batched_fat(
                              stencil.offsets, stencil.grid, cp, bp,
                              x0p, n_iterations, interpret=interpret))

        fn_map = None
        if seq_multi:
            if seq_op is None:
                seq_op = strips2
            from jax import lax as _lax
            fn_map = jax.jit(lambda op, bps, x0ps: _lax.map(
                lambda bx: fn_raw(op, bx[0], bx[1]), (bps, x0ps)))

        def solve(b, x0):
            B, squeeze = _norm_b(b, nv, nh)
            X0 = None if x0 is None else _norm_b(x0, nv, nh)[0]
            nbv = B.shape[0]
            if nbv == 1:
                bp = jnp.asarray(np.stack([B[0].real, B[0].imag])
                                 .astype(np.float32))
                x0p = (jnp.zeros_like(bp) if X0 is None else
                       jnp.asarray(np.stack([X0[0].real, X0[0].imag])
                                   .astype(np.float32)))
                x, hist = fn(strips2, bp, x0p)
                x = np.asarray(x)
                xc = (x[0] + 1j * x[1]).astype(np.complex64)
                if squeeze:
                    return xc, np.asarray(hist)
                return xc[None], np.asarray(hist)[:, None]
            if seq_multi:
                # resident v4 solves are faster per RHS than any
                # batched streaming kernel (exp_stream4.py vs
                # exp_batchfat.py); run the batch as sequential solves
                # inside ONE device program (lax.map: one dispatch, one
                # readback, one compile regardless of B)
                bps = jnp.asarray(np.stack([B.real, B.imag], axis=1)
                                  .astype(np.float32))
                x0ps = (jnp.zeros_like(bps) if X0 is None else
                        jnp.asarray(np.stack([X0.real, X0.imag], axis=1)
                                    .astype(np.float32)))
                xs, hs = fn_map(seq_op, bps, x0ps)
                xs = np.asarray(xs)
                return ((xs[:, 0] + 1j * xs[:, 1]).astype(np.complex64),
                        np.asarray(hs).T)
            xs, hs = [], []
            for lo in range(0, nbv, _BATCH_CAP):
                Bc = B[lo:lo + _BATCH_CAP]
                bp = jnp.asarray(np.stack([Bc.real, Bc.imag])
                                 .astype(np.float32))
                if X0 is None:
                    x0p = jnp.zeros_like(bp)
                else:
                    X0c = X0[lo:lo + _BATCH_CAP]
                    x0p = jnp.asarray(np.stack([X0c.real, X0c.imag])
                                      .astype(np.float32))
                x, hist = fnb(strips2, bp, x0p)
                x = np.asarray(x)
                xs.append((x[0] + 1j * x[1]).astype(np.complex64))
                hs.append(np.asarray(hist))
            return (np.concatenate(xs),
                    np.concatenate(hs, axis=1))
        # device-resident surface (plan.solve_planes): (2, Nv, Nh) f32
        solve._planes = lambda bp, x0p: fn(strips2, bp, x0p)
        return solve

    if path == "stream-real":
        from . import stream_cg_real as sr
        from . import stream_cg_v4_real as sr4
        v4cfg = _v4_real_config(nv, nh)
        v5cfg = _v5_real_config(nv, nh) if v4cfg is None else None
        v5pad = None
        if (nh % 128 != 0 and v5cfg is None
                and (v4cfg is None or not v4cfg[0])):
            # unaligned width where v4 cannot keep q resident (its
            # q_hbm tier is alignment-gated too, so it falls to the
            # slow recompute tier, e.g. real N=2896 = 321 GFLOPS):
            # column-pad to the next 128 multiple and run the v5
            # cpos kernel instead
            nh_pad = -(-nh // 128) * 128
            cfg2 = _v5_real_config(nv, nh_pad)
            if cfg2 is not None:
                v5pad = cfg2 + (nh_pad,)
        try:
            taps, op_arg = sr.prepare_stream_real(stencil)
            if v5pad is not None:
                from .stream_cg_v5 import pad_strips
                from .stream_cg_v5_real import stream_cg_v5_real_planes
                dres, bv, nh_pad = v5pad
                op_arg = pad_strips(op_arg, nh_pad)
                rpadw = ((0, 0), (0, nh_pad - nh))

                def fn_raw(a, bp, x0p):
                    x, h = stream_cg_v5_real_planes(
                        stencil.offsets, (nv, nh_pad), taps, a,
                        jnp.pad(bp, rpadw), jnp.pad(x0p, rpadw),
                        n_iterations, d_resident=dres, block_rows=bv,
                        cpos=nh - 1, interpret=interpret)
                    return x[..., :nh], h
            elif v4cfg is None and v5cfg is not None:
                # explicit-DMA panel round-trips beyond the v4 budget
                # (tier A keeps the direction field resident)
                from .stream_cg_v5_real import stream_cg_v5_real_planes
                dres, bv = v5cfg
                fn_raw = (
                    lambda a, bp, x0p: stream_cg_v5_real_planes(
                        stencil.offsets, stencil.grid, taps, a, bp,
                        x0p, n_iterations, d_resident=dres,
                        block_rows=bv, interpret=interpret))
            elif v4cfg is not None:
                # VMEM-resident multi-iteration kernel: 745 GFLOPS at
                # N=2048 (3.4x v2), 296 at N=2896
                # (benchmarks/exp_realstream4.py); bit-exact vs v2 at
                # matched block_rows
                kq, bv = v4cfg
                # q_hbm requires 128-aligned lanes: unaligned DMA
                # slices (e.g. nh=2896) reproducibly fail the remote
                # Mosaic compile; aligned N=2560 measured 226->174
                # us/it (754 GFLOPS, 1.30x) over recompute
                fn_raw = (
                    lambda a, bp, x0p: sr4.stream_cg_v4_real_planes(
                        stencil.offsets, stencil.grid, taps, a, bp,
                        x0p, n_iterations, keep_q=kq,
                        q_hbm=not kq and nh % 128 == 0,
                        block_rows=bv, interpret=interpret))
            else:
                fn_raw = (
                    lambda a, bp, x0p: sr.stream_cg_real_planes(
                        stencil.offsets, stencil.grid, taps, a, bp,
                        x0p, n_iterations, interpret=interpret))
        except ValueError:
            op_arg = sr.prepare_stream_coef_real(stencil)
            if v4cfg is not None and v4cfg[0]:
                _, bv = v4cfg
                fn_raw = (
                    lambda a, bp, x0p:
                    sr4.stream_cg_v4_real_coef_planes(
                        stencil.offsets, stencil.grid, a, bp, x0p,
                        n_iterations, block_rows=bv,
                        interpret=interpret))
            else:
                fn_raw = (
                    lambda a, bp, x0p: sr.stream_cg_real_coef_planes(
                        stencil.offsets, stencil.grid, a, bp, x0p,
                        n_iterations, interpret=interpret))
        fn = jax.jit(fn_raw)
        from jax import lax as _lax
        fn_map = jax.jit(lambda a, bps, x0ps: _lax.map(
            lambda bx: fn_raw(a, bx[0], bx[1]), (bps, x0ps)))

        def solve(b, x0):
            # multi-RHS = sequential single-RHS solves inside one
            # lax.map device program (see the complex stream path note)
            B, squeeze = _norm_b(b, nv, nh)
            X0 = None if x0 is None else _norm_b(x0, nv, nh)[0]
            if B.shape[0] == 1:
                bp = jnp.asarray(B[0].astype(np.float32))
                x0p = (jnp.zeros_like(bp) if X0 is None else
                       jnp.asarray(X0[0].astype(np.float32)))
                x, hist = fn(op_arg, bp, x0p)
                if squeeze:
                    return np.asarray(x), np.asarray(hist)
                return np.asarray(x)[None], np.asarray(hist)[:, None]
            bps = jnp.asarray(B.astype(np.float32))
            x0ps = (jnp.zeros_like(bps) if X0 is None else
                    jnp.asarray(X0.astype(np.float32)))
            xs, hs = fn_map(op_arg, bps, x0ps)
            return np.asarray(xs), np.asarray(hs).T
        # device-resident surface: real planes are (Nv, Nh) f32
        solve._planes = lambda bp, x0p: fn(op_arg, bp, x0p)
        return solve

    if path == "xla":
        from jax import default_backend
        coef = np.asarray(stencil.coef)
        is_complex = np.iscomplexobj(coef)
        if is_complex and default_backend() != "cpu":
            from .cplx import block_cg_planes_chunked, make_pair_operator
            Pop = make_pair_operator(stencil, dtype=jnp.float32)
            fn = jax.jit(lambda bp, x0p: block_cg_planes_chunked(
                Pop, bp, x0p, n_iterations=n_iterations))

            def solve(b, x0):
                B, squeeze = _norm_b(b, nv, nh)
                n = nv * nh
                bp = jnp.asarray(np.stack([B.real, B.imag])
                                 .reshape(2, -1, n).transpose(0, 2, 1)
                                 .astype(np.float32))
                if x0 is None:
                    x0p = jnp.zeros_like(bp)
                else:
                    X0, _ = _norm_b(x0, nv, nh)
                    x0p = jnp.asarray(np.stack([X0.real, X0.imag])
                                      .reshape(2, -1, n).transpose(0, 2, 1)
                                      .astype(np.float32))
                res = fn(bp, x0p)
                x = np.asarray(res.x)            # (2, n, B)
                hist = np.asarray(res.residual_history)
                xc = ((x[0] + 1j * x[1]).T.reshape(-1, nv, nh)
                      .astype(np.complex64))
                if squeeze:
                    return xc[0], hist[:, 0]
                return xc, hist
            return solve

        from ..cg import block_cg

        def solve(b, x0):
            B, squeeze = _norm_b(b, nv, nh)
            n = nv * nh
            dt = (np.result_type(coef.dtype, np.complex64) if is_complex
                  else np.result_type(coef.dtype, np.float32))
            bm = jnp.asarray(B.reshape(-1, n).T.astype(dt))
            x0m = (jnp.asarray(np.asarray(x0).reshape(-1, n).T.astype(dt))
                   if x0 is not None else None)
            res = block_cg(stencil, bm, x0m, n_iterations=n_iterations)
            x = np.asarray(res.x).T.reshape(-1, nv, nh)
            hist = np.asarray(res.residual_history)
            if squeeze:
                return x[0], hist[:, 0]
            return x, hist
        return solve

    raise ValueError(f"unknown path {path!r}")
