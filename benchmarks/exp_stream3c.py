"""Stream v3 at N=2048, round 2 of the Bv/keep_r probe.

exp_stream3b.py found const keep_r=1 Bv=64 = 728.9 us/it (vs 755-769
for the keep_r=0 Bv=128 planner default); the huge "parity" numbers
there were the documented chaotic k=40 divergence from changing Bv
(keep_r 0 vs 1 at the SAME Bv agreed bit-for-bit).  This probe
(a) pins v3 keep_r=1 Bv=64 bit-parity against v2 at the SAME Bv=64,
(b) tries Bv=32 const, and (c) tries the coef variant at Bv<=64 where
the round-3 default (Bv=128) VMEM-overflowed.

    timeout 1800 python -u benchmarks/exp_stream3c.py > /tmp/s3c.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 2048
ITS = 1000
R = 3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.problems.helmholtz import helm_fe, helm_fe_var
    from tpcg.ops.stream_cg import (prepare_stream, prepare_stream_coef,
                                    stream_cg_const_planes,
                                    stream_cg_coef_planes)
    from tpcg.ops.stream_cg_v3 import (stream_cg_v3_const_planes,
                                       stream_cg_v3_coef_planes)

    st = helm_fe(N, 40.0, eps=40.0)
    taps, strips2 = prepare_stream(st)
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    Av = helm_fe_var(N, 40.0, C, rho=0.1)
    coefp = jax.device_put(prepare_stream_coef(Av))
    b = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    bp = jax.device_put(jnp.asarray(
        np.stack([b.real, b.imag]).astype(np.float32)))
    x0p = jnp.zeros((2, N, N), np.float32)

    flops_c = 2 * (17 + 4 + 10) * N * N * ITS

    def timeit(one):
        def many(op, bp_, x0p_):
            h = None
            x = x0p_
            for r in range(R):
                x, h = one(op, bp_ + 1e-30 * r, x)
            return x, h
        fn = jax.jit(many)
        return fn

    cases = [
        ("const v2      Bv=64", strips2, lambda op, b_, x_:
         stream_cg_const_planes(st.offsets, st.grid, taps, op, b_, x_,
                                ITS, block_rows=64)),
        ("const v3 kr=1 Bv=64", strips2, lambda op, b_, x_:
         stream_cg_v3_const_planes(st.offsets, st.grid, taps, op, b_, x_,
                                   ITS, block_rows=64, keep_r=True)),
        ("const v3 kr=1 Bv=32", strips2, lambda op, b_, x_:
         stream_cg_v3_const_planes(st.offsets, st.grid, taps, op, b_, x_,
                                   ITS, block_rows=32, keep_r=True)),
        ("coef  v2      Bv=128", coefp, lambda op, b_, x_:
         stream_cg_coef_planes(Av.offsets, Av.grid, op, b_, x_, ITS,
                               block_rows=128)),
        ("coef  v3 kr=0 Bv=64", coefp, lambda op, b_, x_:
         stream_cg_v3_coef_planes(Av.offsets, Av.grid, op, b_, x_, ITS,
                                  block_rows=64, keep_r=False)),
        ("coef  v3 kr=0 Bv=32", coefp, lambda op, b_, x_:
         stream_cg_v3_coef_planes(Av.offsets, Av.grid, op, b_, x_, ITS,
                                  block_rows=32, keep_r=False)),
        ("coef  v3 kr=1 Bv=32", coefp, lambda op, b_, x_:
         stream_cg_v3_coef_planes(Av.offsets, Av.grid, op, b_, x_, ITS,
                                  block_rows=32, keep_r=True)),
    ]

    hists = {}
    for tag, op, one in cases:
        try:
            fn = timeit(one)
            x, h = fn(op, bp, x0p)
            h = np.asarray(h)
            t0 = time.perf_counter()
            x, h2 = fn(op, bp, x0p)
            np.asarray(h2)
            dt = (time.perf_counter() - t0) / R
            us_it = dt / ITS * 1e6
            gf = flops_c / dt / 1e9
            hists[tag] = h
            # bit-parity vs the matching v2-at-same-Bv reference
            ref = None
            if "v3" in tag and "const" in tag and "Bv=64" in tag:
                ref = hists.get("const v2      Bv=64")
            par = ("n/a" if ref is None else
                   f"{float(np.max(np.abs(h - ref))):.2e}")
            print(f"{tag}: {us_it:7.1f} us/it  {gf:4.0f} GFLOPS  "
                  f"parity-vs-v2same {par}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"{tag}: FAILED ({type(e).__name__}: {msg})", flush=True)


if __name__ == "__main__":
    main()
