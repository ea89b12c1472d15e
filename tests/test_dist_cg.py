"""Row-sharded distributed CG == single-device CG on the global matrix."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpcg import block_cg
from tpcg.parallel import (Decomposition, distributed_cg,
                           distributed_cg_planes, make_partition)
from tpcg.problems import helm_fe, plane_wave_rhs


def setup(M=2, W=8, OL=2, k=6.0):
    part = make_partition(M, W, OL, strict_parity=False)   # gapless dots
    decomp = Decomposition(part)
    S = helm_fe(part.N, k=k, eps=k)
    b = plane_wave_rhs(part.N, k)
    return decomp, S, b


def test_distributed_cg_matches_global_cg():
    decomp, S, bg = setup()
    coef = jnp.asarray(decomp.crop_stencil(np.asarray(S.coef)))
    b = jnp.asarray(decomp.crop_grid(bg))
    res = distributed_cg(decomp, coef, S.offsets, b, n_iterations=30)
    ref = block_cg(S, jnp.asarray(bg.reshape(-1)), n_iterations=30)
    np.testing.assert_allclose(np.asarray(res.residual_history)[:, None],
                               np.asarray(ref.residual_history)[:, None],
                               rtol=1e-9)
    x_glob = decomp.to_global(np.asarray(res.x), check=True, tol=1e-8)
    np.testing.assert_allclose(x_glob.reshape(-1), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)


def test_distributed_cg_planes_matches_complex():
    decomp, S, bg = setup()
    coef = decomp.crop_stencil(np.asarray(S.coef))
    b = decomp.crop_grid(bg)
    res_c = distributed_cg(decomp, jnp.asarray(coef), S.offsets,
                           jnp.asarray(b), n_iterations=25)
    coef3 = jnp.asarray(np.stack([coef.real, coef.imag,
                                  coef.real + coef.imag]))
    bp = jnp.asarray(np.stack([b.real, b.imag]))
    res_p = distributed_cg_planes(decomp, coef3, S.offsets, bp,
                                  n_iterations=25)
    xp = np.asarray(res_p.x)
    np.testing.assert_allclose(xp[0] + 1j * xp[1], np.asarray(res_c.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(res_p.residual_history),
                               np.asarray(res_c.residual_history),
                               rtol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_distributed_cg_sharded():
    part = make_partition(8, 4, 1, strict_parity=False)
    decomp = Decomposition(part)
    S = helm_fe(part.N, k=5.0, eps=5.0)
    bg = plane_wave_rhs(part.N, 5.0)
    coef_np = decomp.crop_stencil(np.asarray(S.coef))
    b_np = decomp.crop_grid(bg)

    ref = distributed_cg(decomp, jnp.asarray(coef_np), S.offsets,
                         jnp.asarray(b_np), n_iterations=20)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sd",))
    coef = jax.device_put(jnp.asarray(coef_np),
                          NamedSharding(mesh, P(None, "sd")))
    b = jax.device_put(jnp.asarray(b_np), NamedSharding(mesh, P("sd")))
    fn = jax.jit(lambda c, b: distributed_cg(decomp, c, S.offsets, b,
                                             n_iterations=20))
    res = fn(coef, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10)
