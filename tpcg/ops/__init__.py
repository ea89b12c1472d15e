from .cplx import (to_planes, from_planes, cmul, cdiv, cabs,      # noqa: F401
                   udot_planes, PairOperator, make_pair_operator,
                   block_cg_planes, CGPlanesResult)
