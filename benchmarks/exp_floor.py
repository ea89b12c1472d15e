"""Decompose the N=128 fused-CG iteration floor (serial chain anatomy).

exp_mxu2 showed the stencil apply is ~0.9 us of the ~8.4 us iteration;
this measures the rest piece by piece, all as single-pallas-call loops
over 5000 trips at N=128, single RHS:

  empty    : fori_loop with scalar-only carry (loop + scalar overhead)
  hist     : empty + the per-iteration (1,1) history store
  dots     : 4 full-array reductions + scalar math per trip
  updates  : x/r/d vector updates with constant scalars, no dots
  floor    : the full scalar step with q = d (exp_mxu2's floor)
  floorU2/4: floor with fori_loop unroll=2/4

    timeout 1800 python -u benchmarks/exp_floor.py
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
    from tpcg.ops.fused_cg import _cg_scalar_step, _init_state, _pad_for
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k, iters = 128, 12.0, 5000
    S = helm_fe(N, k, eps=k)
    P = _pad_for(S.offsets)
    nv = nh = N
    pv, ph = nv + 2 * P, nh + 2 * P
    F = jnp.float32
    bg = plane_wave_rhs(N, k)
    b = jnp.asarray(np.stack([bg.real, bg.imag])[:, None]
                    .astype(np.float32))
    x0 = jnp.zeros_like(b)

    def make(variant, unroll=1):
        def kernel(b_ref, x0_ref, xout_ref, hist_ref,
                   xr, xi, rr, ri, dr_pad, di_pad):
            dr_pad[...] = jnp.zeros((1, pv, ph), F)
            di_pad[...] = jnp.zeros((1, pv, ph), F)
            dr_pad[:, P:P + nv, P:P + nh] = x0_ref[0]
            di_pad[:, P:P + nv, P:P + nh] = x0_ref[1]
            q0r = dr_pad[:, P:P + nv, P:P + nh] * 1.000001
            q0i = di_pad[:, P:P + nv, P:P + nh] * 1.000001
            deltas0 = _init_state(1, nv, nh, P, b_ref, x0_ref, xr, xi,
                                  rr, ri, dr_pad, di_pad, hist_ref,
                                  q0r, q0i)

            def read_d(r):
                return (dr_pad[r, P:P + nv, P:P + nh],
                        di_pad[r, P:P + nv, P:P + nh])

            def write_d(r, wr, wi):
                dr_pad[r, P:P + nv, P:P + nh] = wr
                di_pad[r, P:P + nv, P:P + nh] = wi

            if variant == "empty":
                def body(it, deltas):
                    return (deltas[0] * 0.9999 + 1e-6, deltas[1])
            elif variant == "hist":
                def body(it, deltas):
                    d0 = deltas[0] * 0.9999 + 1e-6
                    hist_ref[pl.ds(it + 1, 1), 0:1] = jnp.full(
                        (1, 1), jnp.sqrt(jnp.abs(d0)))
                    return (d0, deltas[1])
            elif variant == "dots":
                def body(it, deltas):
                    dcr, dci = read_d(0)
                    s1 = jnp.sum(dcr * dcr - dci * dci)
                    s2 = 2.0 * jnp.sum(dcr * dci)
                    s3 = jnp.sum(dcr * dci - dci * dcr)
                    s4 = jnp.sum(dcr * dcr + dci * dci)
                    hist_ref[pl.ds(it + 1, 1), 0:1] = jnp.full(
                        (1, 1), jnp.sqrt(jnp.sqrt(
                            s1 * s1 + s2 * s2 + s3 + s4)))
                    return (s1 + deltas[0] * 1e-9, s2)
            elif variant == "updates":
                def body(it, deltas):
                    a_r = deltas[0] * 1e-9 + 1e-3
                    a_i = deltas[1] * 1e-9 + 1e-4
                    dcr, dci = read_d(0)
                    xr[0] = xr[0] + (a_r * dcr - a_i * dci)
                    xi[0] = xi[0] + (a_r * dci + a_i * dcr)
                    new_rr = rr[0] - (a_r * dcr - a_i * dci)
                    new_ri = ri[0] - (a_r * dci + a_i * dcr)
                    rr[0] = new_rr
                    ri[0] = new_ri
                    write_d(0, new_rr + a_r * dcr, new_ri + a_r * dci)
                    return (a_r, a_i)
            else:  # floor, with manual unrolling (Mosaic rejects
                   # partial fori_loop unroll)
                def step(it, deltas):
                    qr = dr_pad[:, P:P + nv, P:P + nh] * 1.000001
                    qi = di_pad[:, P:P + nv, P:P + nh] * 1.000001
                    return _cg_scalar_step(it, deltas, 1, qr, qi,
                                           read_d, write_d, xr, xi,
                                           rr, ri, hist_ref)

                def body(it, deltas):
                    for t in range(unroll):
                        deltas = step(it * unroll + t, deltas)
                    return deltas

                lax.fori_loop(0, iters // unroll, body, deltas0)
                xout_ref[0] = xr[...]
                xout_ref[1] = xi[...]
                return

            lax.fori_loop(0, iters, body, deltas0)
            xout_ref[0] = xr[...]
            xout_ref[1] = xi[...]

        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((2, 1, nv, nh), F),
                       jax.ShapeDtypeStruct((iters + 1, 1), F)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((1, nv, nh), F)] * 4
            + [pltpu.VMEM((1, pv, ph), F)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    for variant, unroll in [("empty", 1), ("hist", 1), ("dots", 1),
                            ("updates", 1), ("floor", 1), ("floor", 2),
                            ("floor", 4)]:
        call = make(variant, unroll)

        @jax.jit
        def run(b, x0, _c=call):
            return _c(b, x0)[1][-1]

        r = np.asarray(run(b, x0))
        assert np.all(np.isfinite(r)), (variant, r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(b, x0))
            ts.append(time.perf_counter() - t0)
        print(f"{variant}[u{unroll}]: {min(ts) / iters * 1e6:7.2f} us/it",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
