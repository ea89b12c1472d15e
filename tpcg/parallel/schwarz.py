"""One-level (Restricted) Additive Schwarz preconditioner.

==  ``as_prec`` (``p_h-PY_C-CL-multi-GPU.py:1837-2006``): solve every
subdomain's impedance block against the incoming residual, then run the
overlap exchange (RAS zeroing + overlap-add + averaging).

The reference's sub-solver dispatch (``UseCG``) maps as:

  UseCG=0 exact ``spsolve``      -> ``method="dense_lu"``: one dense LU of
     the (identical) subdomain block, batched triangular solves on the MXU.
  UseCG=2 one batched multi-RHS GPU CG (all blocks share P[0])
                                 -> ``method="block_cg"``: the stacked
     subdomain axis *is* the RHS axis of ``tpcg.cg.block_cg`` -- exactly
     the trick the reference plays (identical equal-size blocks), with the
     fixed ``CGMaxIT`` iteration count (default 256, ``:3607``).
  UseCG=1 per-subdomain single-RHS CG -> same numerics as 2 (independent
     per-RHS recurrences make the batched solve bit-identical), so it is an
     alias here; the reference only distinguished them for GPU-dispatch
     granularity.
  UseCG=5 NumPy CG oracle        -> ``tpcg.reference.cg_early_exit`` on
     host (testing only).
  UseCG=6 multi-GPU thread fan-out -> sharding the (M, M) subdomain axes
     over the device mesh: the same ``block_cg`` call, with the batch axis
     distributed by ``jax.sharding`` instead of Python threads
     (``distribute_computations_with_threads``, ``:2142-2181``).

``Robin == 1`` (impedance blocks via ``local_rect``/``helm_fe_var``) is the
reference's default and ours; ``Robin == 0`` (reuse the cropped global A as
the subdomain operator, Dirichlet-ish) is supported by passing that
coefficient crop as ``P``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..cg import block_cg
from ..sparse import Stencil2D
from .halo import Decomposition


@dataclasses.dataclass
class SchwarzPrec:
    """z -> OL_update(P^{-1} z), batched over all subdomains.

    decomp    : Decomposition
    P         : the (shared) subdomain operator as a Stencil2D of shape
                (sdsz, sdsz), or per-subdomain coefficients
                (noff, M, M, S, S) for the variable-coefficient case.
    method    : "block_cg" (device, fixed-iteration CG, UseCG=1/2/6)
                or "dense_lu" (device, exact, UseCG=0).
    cg_iterations : fixed CG iteration count (CGMaxIT, reference :3607).
    restricted / averaging : ORAS flags (Restricted_AS / Averaging).
    """
    decomp: Decomposition
    P: object
    method: str = "block_cg"
    cg_iterations: int = 256
    restricted: bool = True
    averaging: bool = True
    _lu: Optional[tuple] = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        if self.method == "dense_lu":
            import jax.scipy.linalg as jsl
            if isinstance(self.P, Stencil2D):
                dense = np.asarray(self.P.to_scipy().todense())
                lu, piv = jsl.lu_factor(jnp.asarray(dense))
                self._lu = (lu, piv)
            else:
                raise NotImplementedError(
                    "dense_lu needs a shared Stencil2D block")

    def _solve_shared(self, z2d: jnp.ndarray) -> jnp.ndarray:
        """z2d: (n_p, nrhs) -> X (n_p, nrhs) with the shared block."""
        if self.method == "dense_lu":
            import jax.scipy.linalg as jsl
            return jsl.lu_solve(self._lu, z2d)
        res = block_cg(self.P, z2d, n_iterations=self.cg_iterations)
        return res.x

    def _solve_batched_coef(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-subdomain stencil coefficients (VarCoeff path): fixed-
        iteration CG where the matvec applies each subdomain's own block."""
        from ..sparse import _shift2d
        coef, offsets = self.P  # (noff, M, M, S, S), offsets tuple

        def matvec(x):
            y = coef[0] * _shift2d(x, *offsets[0])
            for s in range(1, len(offsets)):
                y = y + coef[s] * _shift2d(x, *offsets[s])
            return y

        def dot(a, b):
            return jnp.sum(a * b, axis=(-2, -1))[..., None, None]

        res = block_cg(matvec, z, n_iterations=self.cg_iterations, dot=dot)
        return res.x

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (M, M, S, S) -> preconditioned correction, same shape."""
        M, S = self.decomp.part.M, self.decomp.part.sdsz
        if isinstance(self.P, tuple):
            r = self._solve_batched_coef(z)
        else:
            # (M, M, S, S) -> (n_p, nsubd): subdomains become the RHS batch
            z2d = z.reshape(M * M, S * S).T
            x2d = self._solve_shared(z2d)
            r = x2d.T.reshape(M, M, S, S)
        return self.decomp.ol_update(r, restricted=self.restricted,
                                     averaging=self.averaging)
