"""Wrap-fill DIA kernel validation + timing (round-4 second half).

The reformulated banded-streaming kernel (one lane-ALIGNED window per
diagonal against the wrap-filled halo, replacing two taps -- one of
them lane-unaligned -- per diagonal) and the fat batched kernel (one
coefficient stream shared by nb RHS grids) on the reference's two
biggest matrix classes (m_t1 n=97,578 ~101 diagonals / parabolic_fem
n=525,825 7 diagonals, report Table I).

Gates before any timing:
  * single-RHS history vs the XLA ``block_cg`` shift-multiply history
    (independent formulation) at 100 iterations, rel < 1e-3;
  * batched-vs-single solution parity.

Timing: chained true-device (R solves, one readback;
`.claude/skills/verify/SKILL.md` timing rules).

    timeout 1800 python -u benchmarks/exp_dia2.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_general_sparse import banded_spd  # noqa: E402


def para_spd(n=525825):
    """parabolic_fem-class: 7-diagonal 2-D FE band (offsets 0, +-1,
    +-724, +-725 on a 725^2-ish grid)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    offs = [0, 1, -1, 724, -724, 725, -725]
    rows, cols, vals = [], [], []
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        v = (np.full(len(i), 8.0) if off == 0
             else rng.standard_normal(len(i)) * 0.4)
        rows.append(i)
        cols.append(i + off)
        vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return ((A + A.T) * 0.5).tocsr()


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax
    from tpcg import block_cg
    from tpcg.sparse import DiaMatrix
    from tpcg.ops.stream_cg_dia import (_dia_batch_nb,
                                        prepare_dia_stream,
                                        stream_cg_dia_grid,
                                        stream_cg_dia_grid_batch,
                                        to_dia_grid)

    iters, gate, R = 200, 100, 4

    for tag, As in (("m_t1", banded_spd(97578, 50)),
                    ("parabolic", para_spd())):
        D = DiaMatrix.from_scipy(As.astype(np.float32))
        n, nnz = D.n, As.nnz
        taps, grid, Bv, planes = prepare_dia_stream(D)
        nb = _dia_batch_nb(taps, grid, Bv, planes.shape[0], 8)
        print(f"{tag}: fat batch nb={nb}", flush=True)
        planes = jax.device_put(planes)
        b = jnp.ones((n,), jnp.float32)
        bg = jax.device_put(to_dia_grid(b, grid[0]))
        flops_it = 2 * nnz + 10 * n

        # ---- gates ----------------------------------------------------
        hx = np.asarray(jax.jit(
            lambda D, b: block_cg(D, b, n_iterations=gate)
            .residual_history)(D, b)).reshape(-1)
        hs = np.asarray(jax.jit(
            lambda p, bb: stream_cg_dia_grid(taps, grid, Bv, p, bb,
                                             jnp.zeros_like(bb), gate)[1]
        )(planes, bg))
        live = hx > 1e-6 * hx[0]
        rel = np.max(np.abs(hs[live] - hx[live]) / hx[live])
        assert rel < 1e-3, (tag, rel)

        bgs = jnp.broadcast_to(bg, (nb,) + bg.shape) \
            * (1.0 + 0.01 * jnp.arange(nb))[:, None, None]
        bgs = jax.device_put(bgs)
        xb, hb = jax.jit(
            lambda p, bb: stream_cg_dia_grid_batch(
                taps, grid, Bv, p, bb, jnp.zeros_like(bb), gate)
        )(planes, bgs)
        x0, h0 = jax.jit(
            lambda p, bb: stream_cg_dia_grid(taps, grid, Bv, p, bb,
                                             jnp.zeros_like(bb), gate)
        )(planes, bgs[0])
        relb = np.max(np.abs(np.asarray(xb[0]) - np.asarray(x0))
                      / (np.abs(np.asarray(x0)).max() + 1e-30))
        assert relb < 1e-5, (tag, relb)
        print(f"{tag}: gates ok (vs-xla {rel:.2e}, batch-vs-single "
              f"{relb:.2e})", flush=True)

        # ---- chained timing -------------------------------------------
        def chained_single(p, bb):
            def body(x0c, _):
                x, hist = stream_cg_dia_grid(taps, grid, Bv, p, bb,
                                             x0c, iters)
                return x0c + (1e-30 * hist[-1]) * jnp.ones_like(x0c), \
                    hist[-1]
            return lax.scan(body, jnp.zeros_like(bb), None, length=R)[1]

        def chained_batch(p, bb):
            def body(x0c, _):
                x, hist = stream_cg_dia_grid_batch(taps, grid, Bv, p,
                                                   bb, x0c, iters)
                return (x0c + (1e-30 * hist[-1, 0])
                        * jnp.ones_like(x0c), hist[-1])
            return lax.scan(body, jnp.zeros_like(bb), None, length=R)[1]

        for name, fn, args, nrhs in (
                ("single", jax.jit(chained_single), (planes, bg), 1),
                (f"batch{nb}", jax.jit(chained_batch), (planes, bgs),
                 nb)):
            rn = np.asarray(fn(*args))
            assert np.all(np.isfinite(rn)), (tag, name, rn)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / R / nrhs          # per-RHS solve time
            print(json.dumps({
                "case": f"{tag}-dia-{name}", "n": n, "nnz": int(nnz),
                "us_per_it_per_rhs": round(dt / iters * 1e6, 2),
                "gflops_per_rhs": round(iters * flops_it / dt / 1e9, 1),
                "chained": R}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
