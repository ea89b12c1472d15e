"""Probe: distributed ORAS/FGMRES Helmholtz solve wall time on the real
TPU, sweeping the Arnoldi chunking factor (fgmres_chunk = device-fused
Arnoldi steps per host round-trip).

Round-1 baseline: ~0.13 s/iteration with one host sync per Arnoldi step
on the tunneled chip (~28 ms round-trip each).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.utils.config import HelmholtzConfig
    from tpcg.parallel.hsolver import hsolver, Counter

    for M_s, W_s in ((2, 18), (2, 34)):
        for chunk in (1, 4, 8):
            cfg = HelmholtzConfig(M_subd=M_s, W_subd=W_s, use_cg=2,
                                  cg_max_it=64, fgmres_chunk=chunk)
            t0 = time.perf_counter()
            res = hsolver(cfg, callback=Counter())
            dt_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = hsolver(cfg, callback=Counter())
            dt = time.perf_counter() - t0
            its = max(res.iterations, 1)
            print(f"M={M_s} W={W_s} chunk={chunk}: {its} its, "
                  f"{dt:.2f}s warm ({dt/its*1e3:.0f} ms/it), "
                  f"{dt_cold:.1f}s cold, true resid "
                  f"{res.true_residual:.3e}, wasted prec applies "
                  f"{res.wasted_prec_applies}", flush=True)


if __name__ == "__main__":
    main()
