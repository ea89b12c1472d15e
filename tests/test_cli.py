"""CLI drivers (``tpcg.cli``): argv parity with ``main.c`` and the big
scripts' ``__main__`` tails, including the UseCG=6 mesh fan-out."""
import os

import numpy as np
import scipy.io
import scipy.sparse as sp

from tpcg.cli import main


def test_cg_cli(tmp_path, capsys, monkeypatch):
    n = 60
    Q = sp.random(n, n, density=0.1, random_state=0, format="csr")
    A = sp.csr_matrix(Q @ Q.T + n * sp.eye(n))
    mtx = tmp_path / "spd.mtx"
    scipy.io.mmwrite(str(mtx), A)
    assert main(["cg", str(mtx), "2", "0", "40"]) == 0
    out = capsys.readouterr().out
    assert "rhs 0: final residual" in out and "rhs 1:" in out


def test_helmholtz_cli_usecg6_builds_mesh(tmp_path, capsys, monkeypatch):
    """UseCG=6 must actually shard over a device mesh
    (``p_h-PY_C-CL-multi-GPU.py:2123-2181``); on the 8-virtual-device CPU
    backend with M_s=2 it uses a 2-device mesh.  Its iteration count must
    match UseCG=2 (same numerics, different placement)."""
    monkeypatch.chdir(tmp_path)
    assert main(["helmholtz", "2", "6", "2,6", "40"]) == 0
    out = capsys.readouterr().out
    its = [int(ln.split("####it:")[1]) for ln in out.splitlines()
           if "####it:" in ln]
    assert len(its) == 2 and its[0] == its[1]
    assert os.path.exists(tmp_path / "output_2_6_40.txt")


def test_helmholtz_cli_multihost_flag(tmp_path, capsys, monkeypatch):
    """--multihost on a single-process job: env bootstrap is a no-op,
    the solve runs on the global mesh (8 virtual devices -> 2-device
    mesh for M_s=2) and converges like the plain run."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    assert main(["helmholtz", "2", "6", "2", "40", "--multihost"]) == 0
    out = capsys.readouterr().out
    its = [int(ln.split("####it:")[1]) for ln in out.splitlines()
           if "####it:" in ln]
    assert len(its) == 1 and its[0] > 0
    assert os.path.exists(tmp_path / "output_2_6_40.txt")


def test_route_cli_roundtrip(tmp_path):
    """route subcommand: build + save tables; RoutedSpmv.load gives the
    same operator."""
    import scipy.io
    import scipy.sparse as sp
    from tpcg.cli import main
    from tpcg.ops.routing import RoutedSpmv

    rng = np.random.default_rng(17)
    n = 120
    rows = np.repeat(np.arange(n), 3)
    cols = rng.integers(0, n, n * 3)
    A = sp.coo_matrix((rng.standard_normal(n * 3), (rows, cols)),
                      shape=(n, n)).tocsr()
    mtx = tmp_path / "r.mtx"
    out = tmp_path / "r.npz"
    scipy.io.mmwrite(str(mtx), A)
    assert main(["route", str(mtx), str(out)]) == 0
    R = RoutedSpmv.load(str(out))
    x = rng.standard_normal(n)
    np.testing.assert_allclose(R.matvec_numpy(x), A @ x, rtol=1e-5,
                               atol=1e-6)
