from .partition import Partition, make_partition, make_varsize_partition  # noqa: F401
from .halo import Decomposition                                           # noqa: F401
from .schwarz import SchwarzPrec                                          # noqa: F401
from .fgmres import fgmres, FGMRESResult                                  # noqa: F401
from .wgmres import weighted_gmres                                        # noqa: F401
from .hsolver import (hsolver, HSolverResult, Counter,                    # noqa: F401
                      island_wave_speed, generate_random_guess)
from .dist_cg import distributed_cg, distributed_cg_planes            # noqa: F401
from .varsize import VarsizeDecomposition, varsize_hsolver                # noqa: F401
