"""Profiling and roofline accounting.

The reference's observability is wall-clock spans + per-iteration timing
(SURVEY §5); on TPU we add ``jax.profiler`` trace capture and a roofline
calculator for the CG iteration so measured GFLOPS can be judged against
the hardware ceiling (the BASELINE target is >=80% of HBM roofline for
the streaming SpMV path; the fused VMEM kernel is measured against the
VPU ceiling instead).
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block (view with
    tensorboard-plugin-profile or xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class PhaseTimer:
    """Named wall-clock spans, like the reference's time() bracketing
    (``p_h-PY_C-CL-multi-GPU.py:3708-3712``) but structured."""
    spans: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) \
                + time.perf_counter() - t0

    def report(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.spans.items()})


def cg_iteration_flops(n: int, nnz: int, is_complex: bool,
                       n_rhs: int = 1) -> int:
    """FLOPs per CG iteration per report Table II:
    real: SpMV 2*nnz + 2 dots * 2n + 3 axpy * 2n;  complex: x4."""
    per = 2 * nnz + 2 * 2 * n + 3 * 2 * n
    if is_complex:
        per *= 4
    return per * n_rhs


def cg_iteration_bytes(n: int, nnz_streams: int, is_complex: bool,
                       n_rhs: int = 1, dtype_bytes: int = 4) -> int:
    """HBM bytes per iteration for the *streaming* (non-fused) path:
    matrix coefficient streams + ~6 vector reads/writes (r, d, q, x
    traffic).  ``nnz_streams`` = number of coefficient values read per
    iteration (3 * nnz for the Karatsuba complex matvec)."""
    scale = 2 if is_complex else 1
    return dtype_bytes * (nnz_streams + 6 * n * scale * n_rhs)


def roofline_fraction(measured_gflops: float, n: int, nnz: int,
                      is_complex: bool, hbm_gbps: float = 820.0,
                      n_rhs: int = 1) -> float:
    """Fraction of the HBM-bandwidth-limited GFLOPS ceiling achieved by a
    streaming CG iteration (v5e HBM ~820 GB/s)."""
    fl = cg_iteration_flops(n, nnz, is_complex, n_rhs)
    nnz_streams = 3 * nnz if is_complex else nnz
    by = cg_iteration_bytes(n, nnz_streams, is_complex, n_rhs)
    ceiling = hbm_gbps * fl / by  # GFLOPS at full bandwidth
    return measured_gflops / ceiling
