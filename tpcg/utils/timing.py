"""Timing artifacts.

The reference persists each sweep as ``output_{M_s}_{W_s}_{CGMaxIT}.txt``
via ``np.savetxt`` with a descriptive header and an ``End of Array`` footer
(``p_h-PY_C-CL-multi-GPU.py:3721``); we keep the exact format so downstream
comparisons keep working.
"""
from __future__ import annotations

import numpy as np


def save_sweep_output(m_s: int, w_s: int, cg_max_it: int, times,
                      directory: str = "."):
    path = f"{directory}/output_{m_s}_{w_s}_{cg_max_it}.txt"
    np.savetxt(
        path, np.asarray(times), delimiter=",", fmt="%.2f",
        header=(f"Performance comparison of CG implementations for {m_s} "
                f"subdomain width and {w_s * w_s} total number of "
                f"subdomains and max iteration {cg_max_it}"),
        footer="End of Array")
    return path
