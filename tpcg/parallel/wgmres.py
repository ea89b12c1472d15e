"""Weighted / recursive GMRES (GMRESR-style direction recycling).

==  ``weighted_gmres`` (``p_h-PY_C-CL-multi-GPU.py:3037-3291``): at each
step the new direction is ``A r`` (preconditioned), double-orthogonalised
against the stored ``Ae`` basis (the same correction applied to the ``e``
basis keeps ``Ae[k] = A e[k]``), then ``x += d e[k]``, ``r -= d Ae[k]``
with ``d = <w, r>``.  The residual is recomputed from scratch every 10
iterations (``:3278``), and the solver soft-fails on non-monotonic
residuals (factor 1.25) or ``stall_iterations`` steps of < 2.5% progress
(``:3206-3240``).

Same TPU structure as ``fgmres``: host convergence control, fixed-shape
padded bases, masked batched dots.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from .fgmres import FGMRESResult, _as_complex, _native_lincomb


def weighted_gmres(matvec: Callable, b, M: Optional[Callable] = None,
                   x0=None, tol: float = 1e-6, maxiter: int = 200,
                   restart: Optional[int] = None,
                   require_monotonicity: bool = True,
                   hard_failure: bool = True,
                   no_progress_factor: float = 1.025,
                   stall_iterations: int = 10,
                   norm=None, wdot=None, lincomb=None,
                   callback: Optional[Callable] = None) -> FGMRESResult:
    if norm is None:
        norm = lambda v: jnp.sqrt(jnp.sum((jnp.conj(v) * v).real))
    if wdot is None:
        wdot = lambda V, v: jnp.sum(
            jnp.conj(V) * v, axis=tuple(range(1, V.ndim)))
    if lincomb is None:
        lincomb = _native_lincomb
    if restart is None:
        restart = maxiter

    b = jnp.asarray(b)
    dtype = b.dtype
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
        if M is not None:
            r = M(r)
        recalc_r = False
    else:
        x = jnp.asarray(x0, dtype=dtype)
        r = jnp.zeros_like(b)
        recalc_r = True

    Ae = jnp.zeros((restart,) + b.shape, dtype)
    e = jnp.zeros((restart,) + b.shape, dtype)

    norm_b = float(norm(b))
    last = None
    stall = 0
    residual_norms = []
    kk = 0
    arange = np.arange(restart)
    for iteration in range(maxiter):
        if kk == restart:
            kk = 0
            orth_count = restart
        else:
            orth_count = kk
        if recalc_r:
            r = b - matvec(x)
            if M is not None:
                r = M(r)
        norm_r = float(norm(r))
        residual_norms.append(norm_r)
        if callback is not None and iteration > 0:
            callback(norm_r)
        if norm_r < tol * norm_b:
            return FGMRESResult(x, iteration, residual_norms, True)
        if last is not None:
            # the reference's "hard" mode only prints and keeps iterating
            # (its raise statements are commented out, :3206-3240); the
            # soft mode returns early with the current iterate.
            if norm_r > 1.25 * last and require_monotonicity:
                if hard_failure:
                    print("*** WARNING: non-monotonic residuals in GMRES")
                else:
                    return FGMRESResult(x, iteration, residual_norms, False)
            if stall_iterations and norm_r > last / no_progress_factor:
                stall += 1
                if stall >= stall_iterations:
                    if hard_failure:
                        print("*** WARNING: GMRES stalled")
                        stall = 0
                    else:
                        return FGMRESResult(x, iteration, residual_norms,
                                            False)
            else:
                stall = 0
        last = norm_r

        w = matvec(r)
        if M is not None:
            w = M(w)
        rp = r
        active = (arange <= orth_count)
        for _ in range(2):
            dd = _as_complex(wdot(Ae, w)) * active
            w = w - lincomb(dd, Ae)
            rp = rp - lincomb(dd, e)
            d = 1.0 / float(norm(w))
            w = d * w
            rp = d * rp
        Ae = Ae.at[kk].set(w)
        e = e.at[kk].set(rp)
        d = _as_complex(wdot(w[None], r))[0]
        recalc_r = (iteration + 1) % 10 == 0
        if not recalc_r:
            r = r - lincomb(np.array([d]), w[None])
        x = x + lincomb(np.array([d]), e[kk][None])
        kk += 1
    return FGMRESResult(x, maxiter, residual_norms, False)
