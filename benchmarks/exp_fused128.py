"""Attribute + shrink the N=128 fused-kernel per-iteration overhead.

bench.py's headline config (helm_fem: N=128, 5000 it, 1 RHS) runs the
fused VMEM kernel at 557.8 GFLOPS while the SAME kernel measures 876 at
N=256 and 1129 at N=384 -- ~2.8 us/it of which a fixed per-iteration
cost (loop control, the two serial dot-reduction chains, the history
store) doesn't scale down with the grid.  This probe isolates the
terms, bench.py-style (R whole solves chained in one program, one
readback):

  production    : fused_cg_stencil scalar path (the shipping headline)
  packed        : lane-packed scalars -- dot reductions via one MXU
                  ones-contraction instead of the vector reduce tree
  unroll=2/4    : 2/4 iterations per fori_loop trip (identical fp ops)
  loop-floor    : fori_loop of K trivial vreg ops -- pure loop control
  apply-only    : K stencil applications, no dots/scalars/updates
  dots-only     : K iterations of the two dot chains + scalar math +
                  hist store on frozen vectors (no apply, no axpy)

Gates: unroll variants must be BIT-equal to production (same fp ops);
packed must track within the parity-methodology tolerance (MXU reduce
order differs).  Reference headline: report Fig. 5 helm_fem 2.390
GFLOPS (RTX 2080S).

    timeout 3000 python -u benchmarks/exp_fused128.py > /tmp/f128.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

R = 8
ITERS = 5000


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.ops.fused_cg import (_pad_for, fused_cg_stencil,
                                   prepare_coef3)
    from tpcg.problems import helm_fe, plane_wave_rhs

    N, k = 128, 12.0
    A = helm_fe(N, k, eps=k)
    nnz = int(np.count_nonzero(np.asarray(A.coef)))
    n = N * N
    coef3 = jax.device_put(prepare_coef3(A))
    bg = plane_wave_rhs(N, k)
    b = jax.device_put(jnp.asarray(
        np.stack([bg.real, bg.imag])[:, None].astype(np.float32)))
    x0 = jnp.zeros_like(b)
    flops_it = 8 * nnz + 5 * 8 * n
    offsets = A.offsets
    P = _pad_for(offsets)
    nv = nh = N
    pv, ph = nv + 2 * P, nh + 2 * P

    def chain(solver):
        @jax.jit
        def many(c3, bb, x00):
            def body(x0c, _):
                hist = solver(c3, bb, x0c)
                last = hist[-1]
                return x0c + (1e-30 * last[0]).astype(x0c.dtype), last
            return lax.scan(body, x00, None, length=R)[1]
        return many

    def timeit(name, solver, expect=None, gate="bit"):
        fn = chain(solver)
        try:
            h = np.asarray(fn(coef3, b, x0))
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            return None, None
        assert np.all(np.isfinite(h)), (name, h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(coef3, b, x0))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (R * ITERS)
        note = ""
        if expect is not None:
            if gate == "bit":
                note = ("  [bit-equal]" if np.array_equal(h, expect)
                        else f"  [DIVERGES max rel "
                        f"{np.max(np.abs(h - expect) / (np.abs(expect) + 1e-30)):.1e}]")
            else:
                note = (f"  [max rel {np.max(np.abs(h - expect) / (np.abs(expect) + 1e-30)):.1e}]")
        print(f"{name:14s}: {dt * 1e6:6.3f} us/it  "
              f"{flops_it / dt / 1e9:7.1f} GFLOPS{note}", flush=True)
        return dt, h

    t_prod, h_prod = timeit(
        "production",
        lambda c3, bb, x0c: fused_cg_stencil(offsets, c3, bb, x0c,
                                             ITERS)[1])
    timeit("packed",
           lambda c3, bb, x0c: fused_cg_stencil(offsets, c3, bb, x0c,
                                                ITERS, packed=True)[1],
           expect=h_prod, gate="rel")
    for u in (2, 4):
        timeit(f"unroll={u}",
               lambda c3, bb, x0c, u=u: fused_cg_stencil(
                   offsets, c3, bb, x0c, ITERS, unroll=u)[1],
               expect=h_prod, gate="bit")

    # ---- isolated-term kernels ---------------------------------------
    taps = list(offsets)

    def apply_stencil(coef_ref, dr_pad, di_pad):
        qr = jnp.zeros((1, nv, nh), jnp.float32)
        qi = jnp.zeros((1, nv, nh), jnp.float32)
        for t, (dm, dj) in enumerate(taps):
            ar = coef_ref[0, t]
            ai = coef_ref[1, t]
            ars = coef_ref[2, t]
            xr_ = dr_pad[:, P + dm:P + dm + nv, P + dj:P + dj + nh]
            xi_ = di_pad[:, P + dm:P + dm + nv, P + dj:P + dj + nh]
            # Karatsuba 3-multiply, as the production kernel
            k1 = ar * (xr_ + xi_)
            k2 = xr_ * (ai - ar)
            k3 = xi_ * ars
            qr = qr + (k1 - k3)
            qi = qi + (k1 + k2)
        return qr, qi

    def variant_call(name, body_builder):
        def kernel(coef_ref, b_ref, x0_ref, hist_ref, xr, xi, rr, ri,
                   dr_pad, di_pad):
            dr_pad[...] = jnp.zeros((1, pv, ph), jnp.float32)
            di_pad[...] = jnp.zeros((1, pv, ph), jnp.float32)
            dr_pad[:, P:P + nv, P:P + nh] = b_ref[0]
            di_pad[:, P:P + nv, P:P + nh] = b_ref[1]
            rr[...] = b_ref[0]
            ri[...] = b_ref[1]
            xr[...] = x0_ref[0]
            xi[...] = x0_ref[1]
            hist_ref[...] = jnp.zeros(hist_ref.shape, jnp.float32)
            body = body_builder(coef_ref, hist_ref, xr, xi, rr, ri,
                                dr_pad, di_pad)
            lax.fori_loop(0, ITERS, body, (jnp.float32(1.0),
                                           jnp.float32(0.5)))

        def solve(c3, bb, x0c):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ITERS + 1, 1),
                                               jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((1, nv, nh), jnp.float32)] * 4
                + [pltpu.VMEM((1, pv, ph), jnp.float32)] * 2,
            )(c3, bb, x0c)
        return solve

    def floor_body(coef_ref, hist_ref, xr, xi, rr, ri, dr_pad, di_pad):
        def body(it, carry):
            a, bb = carry
            xr[:, 0:8, :] = xr[:, 0:8, :] + a
            return (a * 0.9999, bb)
        return body

    def apply_body(coef_ref, hist_ref, xr, xi, rr, ri, dr_pad, di_pad):
        def body(it, carry):
            a, bb = carry
            qr, qi = apply_stencil(coef_ref, dr_pad, di_pad)
            rr[...] = qr * 1e-30 + rr[...] * 0.9999
            ri[...] = qi * 1e-30 + ri[...] * 0.9999
            dr_pad[:, P:P + nv, P:P + nh] = rr[...]
            di_pad[:, P:P + nv, P:P + nh] = ri[...]
            return (a, bb)
        return body

    def dots_body(coef_ref, hist_ref, xr, xi, rr, ri, dr_pad, di_pad):
        from tpcg.ops.fused_cg import _cdiv_scalar

        def body(it, carry):
            a, bb = carry
            rr_, ri_ = rr[0], ri[0]
            dq_r = jnp.sum(rr_ * rr_ - ri_ * ri_) * a
            dq_i = jnp.sum(rr_ * ri_) * 2.0 * a
            a_r, a_i = _cdiv_scalar(jnp.float32(1.0), jnp.float32(0.0),
                                    jnp.where(dq_r == 0, 1.0, dq_r),
                                    dq_i)
            dn_r = jnp.sum(rr_ * ri_) * a_r
            dn_i = jnp.sum(rr_ + ri_) * a_i
            hist_ref[pl.ds(it + 1, 1), 0:1] = jnp.full(
                (1, 1), jnp.sqrt(jnp.sqrt(dn_r * dn_r + dn_i * dn_i
                                          + 1.0)))
            b_r, b_i = _cdiv_scalar(dn_r, dn_i,
                                    jnp.where(dq_r == 0, 1.0, dq_r),
                                    dq_i)
            return (a * 0.9999 + 1e-30 * b_r, bb + 1e-30 * b_i)
        return body

    for name, bb in (("loop-floor", floor_body),
                     ("apply-only", apply_body),
                     ("dots-only", dots_body)):
        timeit(name, variant_call(name, bb))

    # control: production at N=256 for the scaling reference
    N2 = 256
    A2 = helm_fe(N2, k, eps=k)
    nnz2 = int(np.count_nonzero(np.asarray(A2.coef)))
    c32 = jax.device_put(prepare_coef3(A2))
    bg2 = plane_wave_rhs(N2, k)
    b2 = jax.device_put(jnp.asarray(
        np.stack([bg2.real, bg2.imag])[:, None].astype(np.float32)))
    x02 = jnp.zeros_like(b2)
    fl2 = 8 * nnz2 + 5 * 8 * N2 * N2

    @jax.jit
    def many2(c3, bb, x00):
        def body(x0c, _):
            hist = fused_cg_stencil(A2.offsets, c3, bb, x0c, ITERS)[1]
            return x0c + (1e-30 * hist[-1][0]).astype(x0c.dtype), \
                hist[-1]
        return lax.scan(body, x00, None, length=R)[1]

    h2 = np.asarray(many2(c32, b2, x02))
    assert np.all(np.isfinite(h2))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many2(c32, b2, x02))
        ts.append(time.perf_counter() - t0)
    dt2 = min(ts) / (R * ITERS)
    print(f"{'N=256 control':14s}: {dt2 * 1e6:6.3f} us/it  "
          f"{fl2 / dt2 / 1e9:7.1f} GFLOPS", flush=True)


if __name__ == "__main__":
    sys.exit(main())
