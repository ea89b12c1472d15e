"""Probe: stream v3 at N=2048 const -- can keep_r (12 vs 14 HBM
plane-transfers/it) fit VMEM with a smaller row block, and does the row
block size move the achieved bandwidth?

Round-3 state (exp_stream3.py): v3 keep_r=False Bv=128 = 769 us/it
(523 GFLOPS, ~305 GB/s on 14 planes) vs a realistic large-stream
ceiling of ~470-580 GB/s.  keep_r adds a (2, nv, nh) f32 scratch
(33.5 MB at N=2048) on top of q+dnew (67 MB); with Bv=128 the double-
buffered block set (~7 arrays x 2 MB x 2) lands right at the 127 MB
limit, so Bv=64 is the likely fit.

Timing per the verify skill: R chained solves in one program, one tiny
readback; empty-loop floor subtracted implicitly by amortization.
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
    from tpcg.problems.helmholtz import helm_fe
    from tpcg.ops.stream_cg import prepare_stream
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_const_planes

    st = helm_fe(N, 40.0, eps=40.0)
    taps, strips2 = prepare_stream(st)
    rng = np.random.default_rng(0)
    b = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.zeros((2, N, N), np.float32)

    flops = 2 * (17 + 4 + 10) * N * N * ITS  # complex 9-pt stencil CG/it

    ref_hist = None
    for keep_r in (False, True):
        for bv in (128, 64, 256):
            tag = f"keep_r={int(keep_r)} Bv={bv}"
            try:
                def one(s2, bp_, x0p_, _bv=bv, _kr=keep_r):
                    return stream_cg_v3_const_planes(
                        st.offsets, st.grid, taps, s2, bp_, x0p_, ITS,
                        block_rows=_bv, keep_r=_kr)

                def many(s2, bp_, x0p_):
                    h = None
                    x = x0p_
                    for r in range(R):
                        x, h = one(s2, bp_ + 1e-30 * r, x)
                    return x, h

                fn = jax.jit(many)
                x, h = fn(strips2, bp, x0p)
                h = np.asarray(h)          # sync + warm
                t0 = time.perf_counter()
                x, h = fn(strips2, bp, x0p)
                h = np.asarray(h)
                dt = (time.perf_counter() - t0) / R
                us_it = dt / ITS * 1e6
                gb_s = 14 * N * N * 4 / (dt / ITS) / 1e9 * (
                    12 / 14 if keep_r else 1.0)
                gf = flops / dt / 1e9
                if ref_hist is None:
                    ref_hist = h
                    par = 0.0
                else:
                    par = float(np.max(np.abs(h - ref_hist)
                                       / np.maximum(np.abs(ref_hist),
                                                    1e-30)))
                print(f"{tag}: {us_it:.1f} us/it  {gf:.0f} GFLOPS  "
                      f"{gb_s:.0f} GB/s-moved  parity {par:.2e}",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                print(f"{tag}: FAILED ({type(e).__name__}: {msg})",
                      flush=True)


if __name__ == "__main__":
    main()
