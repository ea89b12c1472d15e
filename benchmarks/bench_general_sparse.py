"""General-sparse CG benchmark -- the Matrix Market ingestion class.

The reference's best case is m_t1 (n=97,578, nnz=9.75M, ~100 nnz/row,
structural-mechanics FE): 7.899 GFLOPS on the RTX 2080S (report Fig. 5).
Two synthetic stand-ins of the same size class:

  * banded : 101-diagonal SPD band matrix -> DiaMatrix (shift-multiply)
  * random : unstructured SPD with ~100 nnz/row -> EllMatrix (gather)

Real f32, 200 CG iterations, reference FLOP accounting (2*nnz + 10*n).
Writes benchmarks/GENERAL_SPARSE.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def banded_spd(n, half_band_diags, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    offs = [0] + [d for k in range(1, half_band_diags + 1)
                  for d in (k * 37, -k * 37)]
    rows, cols, vals = [], [], []
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        v = (rng.standard_normal(len(i)) * 0.1 if off else
             np.full(len(i), float(2 * half_band_diags + 2)))
        rows.append(i); cols.append(i + off); vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return (A + A.T) * 0.5 + sp.eye(n) * (2 * half_band_diags + 2)


def random_spd(n, per_row, seed=1):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, size=n * per_row)
    vals = rng.standard_normal(n * per_row) * 0.05
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A = (A + A.T) * 0.5
    return A + sp.eye(n) * (per_row * 0.5)


def run(tag, M, n, nnz, iters=200):
    import jax
    import jax.numpy as jnp
    from tpcg import block_cg
    b = jnp.ones((n,), jnp.float32)
    # containers keep host-side numpy leaves until first use; make the
    # buffers device-resident BEFORE timing, or every call re-uploads
    # the matrix through the tunnel (~48 MB/s) and measures transfers
    M = jax.device_put(M)
    # all containers (incl. DeviceRouted) are pytrees: pass as a jit
    # argument, NOT a closure constant -- closed-over mask arrays get
    # baked into the HLO and blow the remote-compile request limit
    fn = jax.jit(lambda A, b: block_cg(A, b, n_iterations=iters)
                 .residual_history[-1])
    rn = float(np.asarray(fn(M, b)))
    assert np.isfinite(rn), rn
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(M, b))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gflops = iters * (2 * nnz + 10 * n) / dt / 1e9
    print(json.dumps({"case": tag, "n": n, "nnz": int(nnz),
                      "time_s": round(dt, 4),
                      "gflops": round(gflops, 2)}), flush=True)
    return tag, n, int(nnz), dt, gflops


def run_dia_stream(tag, D, n, nnz, iters=200, R=4):
    """Chained true-device timing for the banded-streaming kernel
    (single-readback runs pay the ~28 ms tunnel RT per call)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpcg.ops.stream_cg_dia import (prepare_dia_stream,
                                        stream_cg_dia_grid, to_dia_grid)
    taps, grid, Bv, planes = prepare_dia_stream(D)
    planes = jax.device_put(planes)
    bg = jax.device_put(to_dia_grid(jnp.ones((n,), jnp.float32),
                                    grid[0]))

    def chained(planes, bg):
        def body(x0c, _):
            x, hist = stream_cg_dia_grid(taps, grid, Bv, planes, bg,
                                         x0c, iters)
            return x0c + (1e-30 * hist[-1]) * jnp.ones_like(x0c), \
                hist[-1]
        return lax.scan(body, jnp.zeros_like(bg), None, length=R)[1]

    fn = jax.jit(chained)
    rn = np.asarray(fn(planes, bg))
    assert np.all(np.isfinite(rn)), rn
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(planes, bg))
        times.append(time.perf_counter() - t0)
    dt = min(times) / R
    gflops = iters * (2 * nnz + 10 * n) / dt / 1e9
    print(json.dumps({"case": tag, "n": n, "nnz": int(nnz),
                      "time_s": round(dt, 4),
                      "gflops": round(gflops, 2),
                      "chained": R}), flush=True)
    return tag, n, int(nnz), dt, gflops


def run_dia_stream_batch(tag, D, n, nnz, iters=200, R=2, nb=4):
    """Per-RHS chained timing for the FAT batched banded kernel: one
    coefficient stream shared by nb RHS grids (report Fig. 6)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpcg.ops.stream_cg_dia import (prepare_dia_stream,
                                        stream_cg_dia_grid_batch,
                                        to_dia_grid)
    taps, grid, Bv, planes = prepare_dia_stream(D)
    planes = jax.device_put(planes)
    bg = to_dia_grid(jnp.ones((n,), jnp.float32), grid[0])
    bgs = jax.device_put(jnp.broadcast_to(bg, (nb,) + bg.shape)
                         * (1.0 + 0.01 * jnp.arange(nb))[:, None, None])

    def chained(planes, bgs):
        def body(x0c, _):
            x, hist = stream_cg_dia_grid_batch(taps, grid, Bv, planes,
                                               bgs, x0c, iters)
            return (x0c + (1e-30 * hist[-1, 0]) * jnp.ones_like(x0c),
                    hist[-1])
        return lax.scan(body, jnp.zeros_like(bgs), None, length=R)[1]

    fn = jax.jit(chained)
    rn = np.asarray(fn(planes, bgs))
    assert np.all(np.isfinite(rn)), rn
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(planes, bgs))
        times.append(time.perf_counter() - t0)
    dt = min(times) / R / nb           # per-RHS
    gflops = iters * (2 * nnz + 10 * n) / dt / 1e9
    print(json.dumps({"case": tag, "n": n, "nnz": int(nnz),
                      "time_s": round(dt, 4),
                      "gflops": round(gflops, 2),
                      "chained": R, "rhs_batch": nb}), flush=True)
    return tag, n, int(nnz), dt, gflops


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.sparse import DiaMatrix, EllMatrix

    from tpcg.sparse import to_device_matrix
    import scipy.sparse as sp

    n = 97578            # m_t1 size class
    rows = []
    Ab = banded_spd(n, 50)          # 101 diagonals, ~9.9M nnz
    rows.append(run("banded-dia", DiaMatrix.from_scipy(
        Ab.astype(np.float32)), n, Ab.nnz))
    # banded-streaming kernel: state VMEM-resident, value planes
    # streamed (tpcg/ops/stream_cg_dia.py)
    rows.append(run_dia_stream("banded-dia-stream", DiaMatrix.from_scipy(
        Ab.astype(np.float32)), n, Ab.nnz))
    # fat batched tier: per-RHS GFLOPS with the value stream shared by
    # 4 RHS grids (the reference's N_RHS block mode, report Fig. 6)
    rows.append(run_dia_stream_batch("banded-dia-stream-b4",
                                     DiaMatrix.from_scipy(
                                         Ab.astype(np.float32)),
                                     n, Ab.nnz))
    # node-shuffled banded matrix (what a real Matrix Market file looks
    # like before reordering) -> RCM recovers the band -> DIA
    rng = np.random.default_rng(3)
    p = rng.permutation(n)
    Pm = sp.csr_matrix((np.ones(n, np.float32),
                        (np.arange(n), p)), shape=(n, n))
    A_shuf = sp.csr_matrix(Pm @ Ab.astype(np.float32) @ Pm.T)
    M_r, perm = to_device_matrix(A_shuf, reorder=True)
    assert perm is not None and isinstance(M_r, DiaMatrix)
    rows.append(run("shuffled-rcm-dia", M_r, n, A_shuf.nnz))
    rows.append(run_dia_stream("shuffled-rcm-dia-stream", M_r, n,
                               A_shuf.nnz))
    Ar = random_spd(n, 100)         # ~100/row unstructured
    if "--ell" in sys.argv:         # the old gather path, for comparison
        rows.append(run("random-ell", EllMatrix.from_scipy(
            Ar.astype(np.float32)), n, Ar.nnz))
    # routing-network path: Benes-masked butterfly stages instead of
    # gathers (tpcg/ops/routing.py); preprocessing is one-time per matrix
    # and cached next to this script.
    import time as _t
    from tpcg.ops.routing import build_routing_spmv
    from tpcg.ops.route_spmv import DeviceRouted
    cache = os.path.join(os.path.dirname(__file__),
                         f"_routed_{n}_{Ar.nnz}.npz")
    t0 = _t.perf_counter()
    if os.path.exists(cache):
        import tpcg.ops.routing as _rt
        z = np.load(cache)
        R = _rt.RoutedSpmv(masks=z["masks"], vals=z["vals"],
                           n=int(z["n"]))
    else:
        R = build_routing_spmv(Ar.astype(np.float32))
        np.savez(cache, masks=R.masks, vals=R.vals, n=R.n)
    print(f"# routing preprocessing/load: {_t.perf_counter()-t0:.1f}s, "
          f"{R.n_layers} layers", flush=True)
    rows.append(run("random-routed", DeviceRouted(R), n, Ar.nnz))

    out = ["# General-sparse CG (m_t1 size class, real f32, 200 its, "
           "TPU v5e)", "",
           "Reference m_t1 (n=97,578, nnz=9.75M): 7.899 GFLOPS on "
           "RTX 2080S; 0.248 on i5-8250U (report Fig. 5).", "",
           "random-routed = genuinely unstructured input via the "
           "routing-network SpMV (tpcg/ops/routing.py): gather-free "
           "Benes-masked butterfly layers; one-time preprocessing "
           "cached. (The old random-ell gather path measured 0.19 "
           "GFLOPS; pass --ell to reproduce.)", "",
           "| case | n | nnz | time (s) | GFLOPS |", "|---|---|---|---|---|"]
    for tag, nn, nz, dt, gf in rows:
        out.append(f"| {tag} | {nn} | {nz} | {dt:.4f} | {gf:.2f} |")
    path = os.path.join(os.path.dirname(__file__), "GENERAL_SPARSE.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
