"""Multi-host entry path (tpcg/parallel/multihost.py).

The reference is SPMD from launch via mpirun (``p_helmholtz.py:7``);
tpcg's analogue is jax.distributed + a global mesh.  Real multi-host is
unverifiable on a single-host build box, so these tests pin the
degenerate and single-host behaviours: env wiring is a no-op for one
process, the global mesh spans all (virtual) devices, and the
multihost solver entry is exactly the mesh-sharded solve the sharding
suite proves equal to unsharded.
"""
import numpy as np
import pytest

import jax

from tpcg.parallel.multihost import (global_mesh, hsolver_multihost,
                                     initialize_from_env)
from tpcg.parallel.hsolver import hsolver
from tpcg.utils.config import HelmholtzConfig


def test_initialize_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("NUM_PROCESSES", "1")
    monkeypatch.setenv("PROCESS_ID", "0")
    assert initialize_from_env() is False


def test_global_mesh_spans_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    assert mesh.axis_names == ("sd",)


def test_hsolver_multihost_matches_unsharded(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    cfg = HelmholtzConfig(k=5.0, M_subd=8, W_subd=4, OL=1, use_cg=2,
                          cg_max_it=150, tol=1e-6, restart=60,
                          dtype="complex128", verbose=0)
    res = hsolver_multihost(cfg)
    ref = hsolver(cfg)
    assert res.converged
    assert res.iterations == ref.iterations
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-8)
