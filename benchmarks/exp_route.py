"""On-TPU validation + timing of the routed SpMV at moderate size,
then CG-on-top timing.  Run after exp_bisect confirms the op set."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import scipy.sparse as sp
    from tpcg.ops.routing import build_routing_spmv
    from tpcg.ops.route_spmv import DeviceRouted
    from tpcg import block_cg

    rng = np.random.default_rng(7)
    n, per_row = 16384, 50
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, size=n * per_row)
    A = sp.coo_matrix((rng.standard_normal(n * per_row) * 0.05,
                       (rows, cols)), shape=(n, n))
    A = sp.csr_matrix((A + A.T) * 0.5 + per_row * sp.eye(n)) \
        .astype(np.float32)
    t0 = time.perf_counter()
    R = build_routing_spmv(A)
    print(f"preprocess {time.perf_counter()-t0:.1f}s "
          f"layers={R.n_layers} m={R.m} "
          f"masks={R.masks.nbytes/1e6:.0f}MB", flush=True)
    D = DeviceRouted(R)
    x = rng.standard_normal(n).astype(np.float32)

    f = jax.jit(lambda xx: D.matvec(xx))
    y = np.asarray(f(jnp.asarray(x)))
    err = np.abs(y - A @ x).max() / np.abs(A @ x).max()
    print(f"matvec rel err {err:.2e}", flush=True)
    reps = 50
    g = jax.jit(lambda xx: sum(D.matvec(xx + i * 0.0) for i in range(1)))
    np.asarray(g(jnp.asarray(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(jnp.asarray(x)))
        ts.append(time.perf_counter() - t0)
    # single calls are RT-latency dominated; time CG(100 its) for truth
    fn = jax.jit(lambda b: block_cg(D, b, n_iterations=100)
                 .residual_history[-1])
    rn = np.asarray(fn(jnp.asarray(x)))
    assert np.isfinite(rn).all()
    ts2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(jnp.asarray(x)))
        ts2.append(time.perf_counter() - t0)
    dt = min(ts2)
    gf = 100 * (2 * A.nnz + 10 * n) / dt / 1e9
    per_spmv = (dt - 0.028) / 100
    print(f"cg100: {dt*1e3:.1f} ms -> {gf:.2f} GFLOPS "
          f"(~{per_spmv*1e3:.2f} ms/SpMV, {R.n_layers} layers)",
          flush=True)


if __name__ == "__main__":
    main()
