from .config import HelmholtzConfig        # noqa: F401
from .timing import save_sweep_output      # noqa: F401
