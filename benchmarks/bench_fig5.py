"""Reference Fig. 5 headline suite (slope device timing): CG GFLOPS on synthetic analogues of
all five report matrices (report Table I / Fig. 5, RTX 2080S numbers).

SuiteSparse files are not redistributable here (zero-egress sandbox), so
each case is a synthetic matrix of the same size class, nnz/row profile
and structure family:

  1138_bus      real SPD n=1,138 nnz~4k, irregular graph  -> routed SpMV
  m_t1          real SPD n=97,578 nnz~9.8M, ~100/row band -> DIA
  parabolic_fem real SPD n=525,825 nnz~3.7M, 7/row FE     -> DIA
  mhd1280b      complex n=1,280 nnz~23k, ~18/row band     -> DIA planes
  helm_fem      complex n=16,384 = 128^2 Helmholtz FE     -> fused VMEM

Protocol follows the report: 5000 CG iterations (200 for the big ones,
GFLOPS is iteration-rate so the count only suppresses noise), single
RHS, f32/c64, FLOP accounting per report Table II (real 2*nnz + 10*n,
complex 8*nnz + 40*n).  Writes benchmarks/FIG5.md.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = {  # report Fig. 5, RTX 2080S, this-impl series
    "1138_bus": 0.033,
    "m_t1": 7.899,
    "parabolic_fem": 4.884,
    "mhd1280b": 0.381,
    "helm_fem": 2.390,
}


def irregular_spd(n, per_row, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    nnz = int(n * per_row)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz) * 0.1
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A = (A + A.T) * 0.5
    return (A + sp.eye(n) * (per_row + 2.0)).astype(np.float32)


def banded_real(n, offsets, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        i = np.arange(max(0, -off), min(n, n - off))
        v = (np.full(len(i), float(2 * len(offsets))) if off == 0
             else rng.standard_normal(len(i)) * 0.1)
        rows.append(i); cols.append(i + off); vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return ((A + A.T) * 0.5 + sp.eye(n) * len(offsets)).astype(np.float32)


def banded_complex(n, offsets, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        i = np.arange(max(0, -off), min(n, n - off))
        v = ((rng.standard_normal(len(i))
              + 1j * rng.standard_normal(len(i))) * 0.1
             if off else np.full(len(i), 2.0 * len(offsets) + 0.5j))
        rows.append(i); cols.append(i + off); vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return (A + A.T) * 0.5  # complex-symmetric (COCG territory)


R1_CHAIN, R2_CHAIN = 2, 6


def chained(solver, b_index):
    """solver(*args) -> per-RHS last residual; returns jitted runners at
    the two slope chain lengths, each executing L solves back-to-back in
    one program (the b operand perturbed by 1e-30 * previous result so
    XLA cannot CSE the repeats) with ONE readback.  Per-solve time is
    the SLOPE (t(L2) - t(L1)) / (L2 - L1): the ~27 ms tunnel round-trip
    per readback (benchmarks/exp_floor.py) otherwise charges 27/L ms to
    every solve -- ~45% of a helm_fem solve at the old divide-by-4
    protocol.  The slope cancels every fixed per-readback term."""
    import jax
    import jax.numpy as jnp

    def make(L):
        def run(*args):
            args = list(args)
            b0 = args[b_index]

            def body(carry, _):
                a = list(args)
                a[b_index] = b0 + (1e-30 * carry).astype(b0.dtype)
                last = solver(*a)
                return jnp.max(last).astype(jnp.float32), last

            _, lasts = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=L)
            return lasts

        return jax.jit(run)

    return {L: make(L) for L in (R1_CHAIN, R2_CHAIN)}


def time_reps(fns, *args, reps=3):
    t = {}
    for L, fn in fns.items():
        rn = np.asarray(fn(*args))
        assert np.all(np.isfinite(rn)), rn
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        t[L] = min(ts)
    return (t[R2_CHAIN] - t[R1_CHAIN]) / (R2_CHAIN - R1_CHAIN)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg import block_cg
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    from tpcg.sparse import DiaMatrix

    rows = []

    def record(tag, n, nnz, iters, dt, cplx):
        fl = (8 * nnz + 40 * n) if cplx else (2 * nnz + 10 * n)
        gf = iters * fl / dt / 1e9
        rows.append((tag, n, int(nnz), dt, gf, REF[tag]))
        print(json.dumps({"case": tag, "n": n, "nnz": int(nnz),
                          "time_s": round(dt, 4), "gflops": round(gf, 3),
                          "ref_gflops": REF[tag],
                          "speedup": round(gf / REF[tag], 1)}), flush=True)

    # ---- 1138_bus-class: tiny irregular graph -> routed SpMV ----------
    try:
        from tpcg.ops.routing import build_routing_spmv
        from tpcg.ops.route_spmv import DeviceRouted
        n = 1138
        A = irregular_spd(n, 3.56, seed=0)
        R = DeviceRouted(build_routing_spmv(A))
        R = jax.device_put(R)
        b = jnp.ones((n,), jnp.float32)
        iters = 5000
        fn = chained(lambda M, b: block_cg(M, b, n_iterations=iters)
                     .residual_history[-1], b_index=1)
        dt = time_reps(fn, R, b)
        record("1138_bus", n, A.nnz, iters, dt, cplx=False)
    except Exception as e:
        print(f"1138_bus FAILED: {str(e)[:200]}", flush=True)

    # ---- m_t1-class: ~100/row band -> banded-streaming DIA kernel ------
    # (state VMEM-resident, value planes streamed: 192 GFLOPS vs the
    # XLA shift-multiply's 58, tpcg/ops/stream_cg_dia.py)
    try:
        sys.path.insert(0, os.path.dirname(__file__))
        from bench_general_sparse import banded_spd
        from tpcg.ops.stream_cg_dia import (prepare_dia_stream,
                                            stream_cg_dia_grid,
                                            to_dia_grid)
        n = 97578
        A = banded_spd(n, 50)
        taps, grd, Bv, planes = prepare_dia_stream(
            DiaMatrix.from_scipy(A.astype(np.float32)))
        planes = jax.device_put(planes)
        bg = jax.device_put(to_dia_grid(jnp.ones((n,), jnp.float32),
                                        grd[0]))
        iters = 200
        fn = chained(lambda p, bb: stream_cg_dia_grid(
            taps, grd, Bv, p, bb, jnp.zeros_like(bb), iters)[1][-1],
            b_index=1)
        dt = time_reps(fn, planes, bg)
        record("m_t1", n, A.nnz, iters, dt, cplx=False)
    except Exception as e:
        print(f"m_t1 FAILED: {str(e)[:200]}", flush=True)

    # ---- parabolic_fem-class: n=525,625 = 725^2, 7/row FE stencil ------
    # (parabolic_fem IS a 2-D FE grid matrix: min 3 / avg 6.99 / max 7
    # nnz per row, report Table I -- the natural container is the 2-D
    # stencil, same as the reference's own FE problems)
    try:
        from tpcg.sparse import Stencil2D
        Ng = 725
        n = Ng * Ng
        offs = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0), (1, 1),
                (-1, -1))
        rng = np.random.default_rng(1)
        coef = np.empty((7, Ng, Ng), np.float32)
        coef[0] = 8.0
        for s in range(1, 7):
            coef[s] = -1.0
        # zero the taps that leave the grid (matches assembly convention)
        coef[1][:, -1] = 0; coef[2][:, 0] = 0
        coef[3][-1, :] = 0; coef[4][0, :] = 0
        coef[5][-1, :] = 0; coef[5][:, -1] = 0
        coef[6][0, :] = 0; coef[6][:, 0] = 0
        A = Stencil2D(offs, coef, (Ng, Ng))
        nnz = int(np.count_nonzero(coef))
        # banded-streaming DIA kernel (194 GFLOPS vs 51 on the XLA
        # shift-multiply for this class)
        from tpcg.ops.stream_cg_dia import (prepare_dia_stream,
                                            stream_cg_dia_grid,
                                            to_dia_grid)
        taps, grd, Bv, planes = prepare_dia_stream(A.to_dia())
        planes = jax.device_put(planes)
        bg = jax.device_put(to_dia_grid(jnp.ones((n,), jnp.float32),
                                        grd[0]))
        iters = 200
        fn = chained(lambda p, bb: stream_cg_dia_grid(
            taps, grd, Bv, p, bb, jnp.zeros_like(bb), iters)[1][-1],
            b_index=1)
        dt = time_reps(fn, planes, bg)
        record("parabolic_fem", n, nnz, iters, dt, cplx=False)
    except Exception as e:
        print(f"parabolic_fem FAILED: {str(e)[:200]}", flush=True)

    # ---- mhd1280b-class: complex n=1,280 band -> fused whole-solve DIA
    # (values + state VMEM-resident, iteration loop in-kernel; falls back
    # to the streaming kernel, then the XLA pair operator) ---------------
    try:
        n = 1280
        A = banded_complex(n, tuple(range(0, 9)), seed=2)   # ~17.8/row
        M = DiaMatrix.from_scipy(A.astype(np.complex64))
        iters = 5000

        def _mhd_fused():
            from tpcg.ops.fused_cg_dia import (fused_cg_dia_grid_cplx,
                                               fused_dia_cplx_fits)
            from tpcg.ops.stream_cg_dia import (prepare_dia_stream_cplx,
                                                to_dia_grid_cplx)
            assert fused_dia_cplx_fits(M), "fused DIA fit rule rejected"
            taps, grd, _Bv, planes2 = prepare_dia_stream_cplx(M)
            planes2 = jax.device_put(planes2)
            bg2 = jax.device_put(to_dia_grid_cplx(
                np.ones(n, np.complex64), grd[0]))
            fn = chained(lambda p, bb: fused_cg_dia_grid_cplx(
                taps, grd, p, bb, jnp.zeros_like(bb), iters)[1][-1],
                b_index=1)
            return time_reps(fn, planes2, bg2)

        def _mhd_stream():
            from tpcg.ops.stream_cg_dia import (prepare_dia_stream_cplx,
                                                stream_cg_dia_grid_cplx,
                                                to_dia_grid_cplx)
            taps, grd, Bv, planes2 = prepare_dia_stream_cplx(M)
            planes2 = jax.device_put(planes2)
            bg2 = jax.device_put(to_dia_grid_cplx(
                np.ones(n, np.complex64), grd[0]))
            fn = chained(lambda p, bb: stream_cg_dia_grid_cplx(
                taps, grd, Bv, p, bb, jnp.zeros_like(bb), iters)[1][-1],
                b_index=1)
            return time_reps(fn, planes2, bg2)

        def _mhd_xla():
            P = jax.device_put(make_pair_operator(M, dtype=jnp.float32))
            b2 = jnp.stack([jnp.ones((n, 1), jnp.float32),
                            jnp.zeros((n, 1), jnp.float32)])
            fn = chained(lambda P, b: block_cg_planes(
                P, b, n_iterations=iters).residual_history[-1], b_index=1)
            return time_reps(fn, P, b2)

        dt = None
        for name, path in (("fused-dia", _mhd_fused),
                           ("dia-stream", _mhd_stream),
                           ("xla-planes", _mhd_xla)):
            try:
                dt = path()
                break
            except Exception as e:
                print(f"mhd1280b {name} path failed ({str(e)[:120]}); "
                      f"falling back", flush=True)
        assert dt is not None, "all mhd1280b paths failed"
        record("mhd1280b", n, A.nnz, iters, dt, cplx=True)
    except Exception as e:
        print(f"mhd1280b FAILED: {str(e)[:200]}", flush=True)

    # ---- helm_fem: the bench.py headline (fused VMEM kernel) ----------
    try:
        from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
        from tpcg.problems import helm_fe, plane_wave_rhs
        N, k = 128, 12.0
        A = helm_fe(N, k, eps=k)
        n = N * N
        nnz = int(np.count_nonzero(np.asarray(A.coef)))
        coef3 = jax.device_put(prepare_coef3(A))
        bg = plane_wave_rhs(N, k)
        b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                        .astype(np.float32))
        x0 = jnp.zeros_like(b)
        iters = 5000
        fn = chained(lambda c, b, x: fused_cg_stencil(
            A.offsets, c, b, x, iters, packed=True)[1][-1], b_index=1)
        dt = time_reps(fn, coef3, b, x0)
        record("helm_fem", n, nnz, iters, dt, cplx=True)
    except Exception as e:
        print(f"helm_fem FAILED: {str(e)[:200]}", flush=True)

    out = ["# Reference Fig. 5 suite (synthetic analogues, TPU v5e)", "",
           "Reference numbers: report Fig. 5, RTX 2080S, 'this impl' "
           "series; GFLOPS per report Table II accounting.", "",
           "**DISCLAIMER -- these are NOT the reference's actual "
           "matrices.** The reference benchmarks real SuiteSparse "
           "files (1138_bus, m_t1, parabolic_fem, mhd1280b; "
           "`/root/reference/main.c:20-27`, report Table I), which "
           "cannot be fetched in this zero-egress build environment.  "
           "Each case below is a SYNTHETIC stand-in matching the "
           "reference matrix's size, nnz/row profile and structure "
           "family (see module docstring of bench_fig5.py).  "
           "Spectra differ, so per-iteration cost and GFLOPS are "
           "comparable but residual trajectories are not; "
           "residual-history parity against the NumPy oracle on real "
           "Matrix Market inputs is pinned separately by "
           "tests/test_mm_history_parity.py, and `tpcg.cli cg "
           "<file>.mtx` runs the genuine files whenever they are "
           "available.", "",
           "| case | n | nnz | time (s) | GFLOPS | ref GFLOPS | speedup |",
           "|---|---|---|---|---|---|---|"]
    for tag, n, nnz, dt, gf, ref in rows:
        out.append(f"| {tag} | {n} | {nnz} | {dt:.4f} | {gf:.3f} "
                   f"| {ref} | {gf/ref:.1f}x |")
    path = os.path.join(os.path.dirname(__file__), "FIG5.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    main()
