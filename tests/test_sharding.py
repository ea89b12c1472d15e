"""Multi-device sharding: the distributed operators must produce identical
results when the subdomain grid is sharded over a device mesh (the stand-in
for multi-chip TPU; 8 virtual CPU devices from conftest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpcg.parallel import Decomposition, make_partition, hsolver
from tpcg.problems import helm_fe, plane_wave_rhs
from tpcg.utils.config import HelmholtzConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def make_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("sd",))


def test_sharded_halo_and_matvec_match_single_device():
    part = make_partition(8, 4, 1)
    decomp = Decomposition(part)
    S = helm_fe(part.N, k=5.0, eps=5.0)
    coef_np = decomp.crop_stencil(np.asarray(S.coef))
    rng = np.random.default_rng(0)
    x_np = (rng.standard_normal(decomp.grid_shape)
            + 1j * rng.standard_normal(decomp.grid_shape))

    ref_ol = np.asarray(decomp.ol_update(jnp.asarray(x_np)))
    ref_ax = np.asarray(decomp.ax_op(jnp.asarray(coef_np), S.offsets,
                                     jnp.asarray(x_np)))
    ref_nrm = float(decomp.norm(jnp.asarray(x_np)))

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("sd"))
    x = jax.device_put(jnp.asarray(x_np), sh)
    coef = jax.device_put(jnp.asarray(coef_np),
                          NamedSharding(mesh, P(None, "sd")))

    ol = jax.jit(decomp.ol_update)
    ax = jax.jit(lambda c, v: decomp.ax_op(c, S.offsets, v))
    nrm = jax.jit(decomp.norm)

    got_ol = np.asarray(ol(x))
    got_ax = np.asarray(ax(coef, x))
    got_nrm = float(nrm(x))
    np.testing.assert_allclose(got_ol, ref_ol, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got_ax, ref_ax, rtol=1e-11, atol=1e-11)
    assert np.isclose(got_nrm, ref_nrm, rtol=1e-12)
    # outputs keep the sharding (no implicit gather)
    assert not ol(x).is_fully_replicated


def test_hsolver_sharded_matches_unsharded():
    cfg = HelmholtzConfig(k=5.0, M_subd=8, W_subd=4, OL=1, use_cg=2,
                          cg_max_it=150, tol=1e-6, restart=60,
                          dtype="complex128", verbose=0)
    res_single = hsolver(cfg)
    res_sharded = hsolver(cfg, mesh=make_mesh())
    assert res_sharded.converged
    assert res_sharded.iterations == res_single.iterations
    np.testing.assert_allclose(np.asarray(res_sharded.x),
                               np.asarray(res_single.x),
                               rtol=1e-8, atol=1e-8)


def test_hsolver_sharded_planes_matches_unsharded():
    """The TPU configuration (two-plane f32) sharded over 8 devices."""
    cfg = HelmholtzConfig(k=5.0, M_subd=8, W_subd=4, OL=1, use_cg=2,
                          cg_max_it=150, tol=1e-6, restart=60,
                          dtype="complex64", use_planes=True, verbose=0)
    res_single = hsolver(cfg)
    res_sharded = hsolver(cfg, mesh=make_mesh())
    assert res_sharded.converged
    assert res_sharded.iterations == res_single.iterations
    np.testing.assert_allclose(np.asarray(res_sharded.x),
                               np.asarray(res_single.x),
                               rtol=1e-5, atol=1e-5)
