"""Probe 2: what dominates the N=128 fused iteration?

 a) MXU kernel precision sweep (1/3/6-pass matmuls) vs the VPU kernel
 b) iteration floor: the VPU kernel with the stencil apply replaced by a
    copy (q = d) -- everything else identical -- to separate apply cost
    from the serial scalar/dot/update chain.

    timeout 1800 python -u benchmarks/exp_mxu2.py
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpcg.ops import block_cg_planes, make_pair_operator
    from tpcg.ops.fused_cg import (_cg_scalar_step, _init_state,
                                   _pad_for, fused_cg_stencil,
                                   prepare_coef3)
    from fused_cg_mxu import fused_cg_stencil_mxu, prepare_mxu
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k, iters = 128, 12.0, 5000
    S = helm_fe(N, k, eps=k)
    nnz = int(np.count_nonzero(np.asarray(S.coef)))
    n = N * N
    bg = plane_wave_rhs(N, k)
    b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                    .astype(np.float32))
    x0 = jnp.zeros_like(b)
    coef3 = prepare_coef3(S)
    H, strips3, _ = prepare_mxu(S)
    flops_it = 8 * nnz + 2 * 8 * n + 3 * 8 * n

    gate = 100
    Pp = make_pair_operator(S, dtype=jnp.float32)

    @jax.jit
    def xla_hist(Pp, bf):
        return block_cg_planes(Pp, bf, n_iterations=gate).residual_history

    hx = np.asarray(xla_hist(Pp, b.reshape(2, n, 1)))[:, 0]

    def timeit(fn, args):
        r = np.asarray(fn(*args))
        assert np.all(np.isfinite(r)), r
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # --- (a) precision sweep -------------------------------------------
    for prec in ("default",):
        @jax.jit
        def mxu_hist(H, sb3, st3, b, x0, _p=prec):
            return fused_cg_stencil_mxu(S.offsets, (N, N), H, (sb3, st3),
                                        b, x0, gate, precision=_p)[1]
        hm = np.asarray(mxu_hist(H, strips3[0], strips3[1], b, x0))[:, 0]
        rel = np.abs(hm - hx) / (np.abs(hx) + 1e-30)

        @jax.jit
        def run_mxu(H, sb3, st3, b, x0, _p=prec):
            return fused_cg_stencil_mxu(S.offsets, (N, N), H, (sb3, st3),
                                        b, x0, iters, precision=_p)[1][-1]
        dt = timeit(run_mxu, (H, strips3[0], strips3[1], b, x0))
        print(f"mxu[{prec:8s}]: {dt / iters * 1e6:7.2f} us/it  "
              f"{iters * flops_it / dt / 1e9:7.1f} GFLOPS  "
              f"parity {rel.max():.1e}", flush=True)

    # --- (b) iteration floor (apply == copy) ---------------------------
    P = _pad_for(S.offsets)
    nv = nh = N
    pv, ph = nv + 2 * P, nh + 2 * P
    dt_ = jnp.float32

    def floor_kernel(b_ref, x0_ref, xout_ref, hist_ref,
                     xr, xi, rr, ri, dr_pad, di_pad):
        nb = 1
        dr_pad[...] = jnp.zeros((nb, pv, ph), dt_)
        di_pad[...] = jnp.zeros((nb, pv, ph), dt_)
        dr_pad[:, P:P + nv, P:P + nh] = x0_ref[0]
        di_pad[:, P:P + nv, P:P + nh] = x0_ref[1]
        q0r = dr_pad[:, P:P + nv, P:P + nh] * 1.000001
        q0i = di_pad[:, P:P + nv, P:P + nh] * 1.000001
        deltas0 = _init_state(nb, nv, nh, P, b_ref, x0_ref, xr, xi, rr,
                              ri, dr_pad, di_pad, hist_ref, q0r, q0i)

        def read_d(r):
            return (dr_pad[r, P:P + nv, P:P + nh],
                    di_pad[r, P:P + nv, P:P + nh])

        def write_d(r, wr, wi):
            dr_pad[r, P:P + nv, P:P + nh] = wr
            di_pad[r, P:P + nv, P:P + nh] = wi

        def body(it, deltas):
            qr = dr_pad[:, P:P + nv, P:P + nh] * 1.000001
            qi = di_pad[:, P:P + nv, P:P + nh] * 1.000001
            return _cg_scalar_step(it, deltas, nb, qr, qi, read_d,
                                   write_d, xr, xi, rr, ri, hist_ref)

        lax.fori_loop(0, iters, body, deltas0)
        xout_ref[0] = xr[...]
        xout_ref[1] = xi[...]

    floor_call = pl.pallas_call(
        floor_kernel,
        out_shape=(jax.ShapeDtypeStruct((2, 1, nv, nh), dt_),
                   jax.ShapeDtypeStruct((iters + 1, 1), dt_)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, nv, nh), dt_)] * 4
        + [pltpu.VMEM((1, pv, ph), dt_)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run_floor(b, x0):
        return floor_call(b, x0)[1][-1]

    dt = timeit(run_floor, (b, x0))
    print(f"floor (q=d copy): {dt / iters * 1e6:7.2f} us/it", flush=True)

    # --- reference: current VPU kernel ---------------------------------
    @jax.jit
    def run_vpu(coef3, b, x0):
        return fused_cg_stencil(S.offsets, coef3, b, x0, iters)[1][-1]

    dt = timeit(run_vpu, (coef3, b, x0))
    print(f"vpu current:      {dt / iters * 1e6:7.2f} us/it  "
          f"{iters * flops_it / dt / 1e9:7.1f} GFLOPS", flush=True)


if __name__ == "__main__":
    sys.exit(main())
