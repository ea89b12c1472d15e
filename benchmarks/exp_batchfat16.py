"""Fat-block batched streaming at nb=16, N=2048 — the regime where
coefficient sharing has the most to amortize (VERDICT r2 item 1).

Round-3 state (exp_batchfat.py): batched/sequential = 1.20/1.32/1.37x
at N=2048 nb=2/4/8.  Per-RHS fat traffic is 10 + 2*noff/nb planes, so
nb=16 drops it to ~11.1 vs the sequential loop's 28 — if the kernel's
own pipelining (~434-458 GB/s measured) holds, that clears 1.5x.
The Mosaic operand cap nb*Bv*nh <= 512*1024 forces Bv=16 at nb=16,
nh=2048; this probe also checks whether the shorter row block hurts.

    timeout 3000 python -u benchmarks/exp_batchfat16.py > /tmp/bf16.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (
        prepare_stream_coef, stream_cg_coef_planes,
        stream_cg_coef_planes_batched_fat)
    from tpcg.problems import helm_fe_var, plane_wave_rhs

    iters = 500
    N = 2048
    k = 8.0
    rng = np.random.default_rng(0)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.5)
    coefp = jax.device_put(prepare_stream_coef(A))
    bg = plane_wave_rhs(N, k)

    single_j = jax.jit(lambda b_, x_: stream_cg_coef_planes(
        A.offsets, A.grid, coefp, b_, x_, iters))
    bp1 = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag]).astype(np.float32)))
    x01 = jnp.zeros_like(bp1)
    np.asarray(single_j(bp1, x01)[1][-1])  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(single_j(bp1, x01)[1][-1])
        ts.append(time.perf_counter() - t0)
    t_seq1 = min(ts)
    print(f"N={N} single-RHS: {t_seq1 / iters * 1e6:8.1f} us/it",
          flush=True)

    for nb in (8, 16):
        B = np.stack([bg * (1 + 0.1j * r) for r in range(nb)])
        bp = jax.device_put(jnp.asarray(
            np.stack([B.real, B.imag]).astype(np.float32)))
        x0p = jnp.zeros_like(bp)
        for bv in (None, 16, 32):
            if bv is not None and nb * bv * N > 512 * 1024:
                continue
            tag = f"nb={nb} Bv={'auto' if bv is None else bv}"
            fn = jax.jit(lambda b_, x_, _bv=bv, _nb=nb:
                         stream_cg_coef_planes_batched_fat(
                             A.offsets, A.grid, coefp, b_, x_, iters,
                             block_rows=_bv))
            try:
                h = np.asarray(fn(bp, x0p)[1])
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(fn(bp, x0p)[1][-1])
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                us_it = dt / iters * 1e6
                speed = t_seq1 * nb / dt
                print(f"{tag}: {us_it:8.1f} us/it (all {nb} RHS)  "
                      f"batched/sequential = {speed:.2f}x  "
                      f"end-hist {float(h[-1, 0]) if h.ndim > 1 else float(h[-1]):.3e}",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:110]
                print(f"{tag}: FAILED ({type(e).__name__}: {msg})",
                      flush=True)


if __name__ == "__main__":
    main()
