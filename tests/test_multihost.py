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


_RANK_SCRIPT = """
import os
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from tpcg.parallel.multihost import initialize_from_env, hsolver_multihost
from tpcg.utils.config import HelmholtzConfig
assert initialize_from_env() is True
assert jax.process_count() == 2 and jax.device_count() == 8
cfg = HelmholtzConfig(k=5.0, M_subd=4, W_subd=4, OL=1, use_cg=2,
                      cg_max_it=150, tol=1e-6, restart=60,
                      dtype="complex128", verbose=0)
res = hsolver_multihost(cfg)
assert res.converged, res.iterations
r = os.environ["PROCESS_ID"]
np.save(os.environ["MH_OUT"] + f"/x_{r}.npy", np.asarray(res.x))
np.save(os.environ["MH_OUT"] + f"/it_{r}.npy", res.iterations)
"""


def test_two_process_distributed_solve(tmp_path):
    """REAL multi-process SPMD validation -- the reference's mpirun
    contract (``p_helmholtz.py:7``) run for real: two jax.distributed
    processes on localhost (CPU, 4 virtual devices each) solve over a
    mesh spanning BOTH processes.  Cross-process collectives ride the
    gloo backend; both ranks must converge, produce the IDENTICAL
    replicated solution, and match the unsharded solve to solver
    tolerance (cross-process reduction order shifts fp at the tol
    boundary, so iteration counts may differ by one -- exactly like
    the reference across MPI rank layouts)."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    script = tmp_path / "rank.py"
    script.write_text(_RANK_SCRIPT)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for r in (0, 1):
        env = {**os.environ,
               "PYTHONPATH": repo + os.pathsep
               + os.environ.get("PYTHONPATH", ""),
               "COORDINATOR_ADDRESS": f"localhost:{port}",
               "NUM_PROCESSES": "2", "PROCESS_ID": str(r),
               "MH_OUT": str(tmp_path),
               "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=580)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    x0 = np.load(tmp_path / "x_0.npy")
    x1 = np.load(tmp_path / "x_1.npy")
    np.testing.assert_array_equal(x0, x1)

    cfg = HelmholtzConfig(k=5.0, M_subd=4, W_subd=4, OL=1, use_cg=2,
                          cg_max_it=150, tol=1e-6, restart=60,
                          dtype="complex128", verbose=0)
    ref = hsolver(cfg)
    xr = np.asarray(ref.x)
    assert np.abs(x0 - xr).max() <= 5e-6 * np.abs(xr).max()
    its = int(np.load(tmp_path / "it_0.npy"))
    assert abs(its - ref.iterations) <= 1, (its, ref.iterations)


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
