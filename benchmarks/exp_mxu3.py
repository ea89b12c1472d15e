"""MXU re-evaluation at Nh=256/384 (VERDICT round-3 item 9).

The MXU-formulated fused CG (``tpcg.ops.fused_cg_mxu``: stencil apply as
banded lane matmuls) lost at N=128: Mosaic's in-kernel matmul precision
options made it lossy (1-pass bf16) or not-faster (3-pass).  The banded H
wastes (Nh-3)/Nh of the MXU flops regardless of Nh, but at Nh=256/384 the
VPU apply is proportionally longer, so the crossover question is whether
HIGHEST-precision (6-pass) matmuls beat the ~60-op VPU apply there.

Methodology: chained true-device timing (R solves scanned in one program,
one readback -- bench.py protocol; single-readback probes pay ~28 ms of
tunnel RT).  Each variant is parity-gated against the XLA streaming
program (block_cg_planes) over 100 iterations before its GFLOPS line is
reported; "default" precision is expected to FAIL the gate and is printed
as lossy evidence only.

    timeout 1800 python -u benchmarks/exp_mxu3.py
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
    from tpcg.ops import block_cg_planes, make_pair_operator
    from tpcg.ops.fused_cg import fused_cg_stencil, prepare_coef3
    from fused_cg_mxu import fused_cg_stencil_mxu, prepare_mxu
    from tpcg.problems import helm_fe, plane_wave_rhs

    iters, gate, R = 2000, 100, 8
    k = 12.0

    for N in (256, 384):
        S = helm_fe(N, k, eps=k)
        nnz = int(np.count_nonzero(np.asarray(S.coef)))
        n = N * N
        bg = plane_wave_rhs(N, k)
        b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                        .astype(np.float32))
        x0 = jnp.zeros_like(b)
        coef3 = prepare_coef3(S)
        H, strips3, _ = prepare_mxu(S)
        sb3, st3 = strips3
        flops_it = 8 * nnz + 2 * 8 * n + 3 * 8 * n

        # XLA oracle history for the parity gates
        Pp = make_pair_operator(S, dtype=jnp.float32)

        @jax.jit
        def xla_hist(Pp, bf):
            return block_cg_planes(Pp, bf,
                                   n_iterations=gate).residual_history

        hx = np.asarray(xla_hist(Pp, b.reshape(2, n, 1)))[:, 0]

        def chained(step_hist, step_full, args):
            """Parity-gate on `step_hist`, then time R chained solves."""
            hv = np.asarray(step_hist(*args))[:, 0]
            rel = (np.abs(hv - hx) / (np.abs(hx) + 1e-30)).max()
            ok = np.all(np.isfinite(hv)) and rel <= 1e-2

            @jax.jit
            def many(*args):
                def body(x0c, _):
                    x, hist = step_full(*args[:-1], x0c)
                    last = hist[-1]
                    x0n = x0c + (1e-30 * last[0]).astype(x0c.dtype)
                    return x0n, last

                _, lasts = jax.lax.scan(body, args[-1], None, length=R)
                return lasts

            rn = np.asarray(many(*args))
            assert np.all(np.isfinite(rn)), rn
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(many(*args))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / R
            return dt, rel, ok

        # --- VPU fused kernel (production planner choice at these N) ----
        def vpu_hist(coef3, b, x0):
            return fused_cg_stencil(S.offsets, coef3, b, x0, gate)[1]

        def vpu_full(coef3, b, x0):
            return fused_cg_stencil(S.offsets, coef3, b, x0, iters)

        dt, rel, ok = chained(jax.jit(vpu_hist), vpu_full, (coef3, b, x0))
        print(f"N={N} vpu           : {dt / iters * 1e6:7.2f} us/it  "
              f"{iters * flops_it / dt / 1e9:7.1f} GFLOPS  "
              f"parity {rel:.1e} {'OK' if ok else 'FAIL'}", flush=True)

        # --- MXU kernel, precision sweep ---------------------------------
        # Mosaic in-kernel matmuls support only DEFAULT (1-pass bf16) and
        # HIGHEST (6-pass); HIGH raises NotImplementedError (NOTES_R3).
        for prec in ("highest", "default"):
            def mxu_hist(H, sb3, st3, b, x0, _p=prec):
                return fused_cg_stencil_mxu(S.offsets, (N, N), H,
                                            (sb3, st3), b, x0, gate,
                                            precision=_p)[1]

            def mxu_full(H, sb3, st3, b, x0, _p=prec):
                return fused_cg_stencil_mxu(S.offsets, (N, N), H,
                                            (sb3, st3), b, x0, iters,
                                            precision=_p)

            dt, rel, ok = chained(jax.jit(mxu_hist), mxu_full,
                                  (H, sb3, st3, b, x0))
            tag = "OK" if ok else "FAIL (lossy)"
            print(f"N={N} mxu[{prec:7s}]: {dt / iters * 1e6:7.2f} us/it  "
                  f"{iters * flops_it / dt / 1e9:7.1f} GFLOPS  "
                  f"parity {rel:.1e} {tag}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
