from .cplx import (to_planes, from_planes, cmul, cdiv, cabs,      # noqa: F401
                   udot_planes, PairOperator, make_pair_operator,
                   block_cg_planes, CGPlanesResult)
from .fused_cg import fused_cg, fused_cg_stencil, prepare_coef3  # noqa: F401
from .auto import plan_stencil_cg, stencil_cg, StencilCGPlan     # noqa: F401
