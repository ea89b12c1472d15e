"""Device-side ORAS preconditioner timing: XLA vs fused Pallas kernel.

The distributed solve's hot inner loop is the batched subdomain CG
(``as_prec`` UseCG=2, ``p_h-PY_C-CL-multi-GPU.py:1919-1933``, CGMaxIT
:3607) -- the step the reference built its whole GPU stack for.  The
exp_hsolver_tpu.py wall times are tunnel/host-glue dominated and say
nothing about the chip; here the preconditioner application itself
(batched subdomain block-CG + RAS overlap exchange) is timed with the
chained-readback methodology: R applications chained in ONE device
program through a 1e-30 perturbation, one readback.

Reference protocol configs: M=2/W=34 and M=4/W=34, CGMaxIT=256, k=20.

    timeout 3000 python -u benchmarks/exp_prec_tpu.py > /tmp/prec.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tpcg.parallel import Decomposition, SchwarzPrec, make_partition
    from tpcg.problems import local_rect

    R = 8
    k = 20.0
    cg_it = 256

    for M, W in ((2, 34), (4, 34)):
        OL = (W - 2) // 2
        part = make_partition(M, W, OL)
        decomp = Decomposition(part)
        S = part.sdsz
        P = local_rect(part.N, k=k, eps=k, eta=k, Nhoriz=S, Nvert=S,
                       dtype=np.complex64)
        rng = np.random.default_rng(0)
        z = jax.device_put(jnp.asarray(
            rng.standard_normal((2, M, M, S, S)).astype(np.float32)))

        for kern in ("xla", "fused"):
            sp = SchwarzPrec(decomp, P, cg_iterations=cg_it,
                             planes=True, kernel=kern)

            def chained(pair, lu, z0, _sp=sp):
                def body(zc, _):
                    v = _sp.apply_with(pair, lu, zc)
                    return zc + (1e-30 * v[0, 0, 0, 0, 0]) * jnp.ones_like(zc), \
                        v[0, 0, 0, 0, 0]
                return lax.scan(body, z0, None, length=R)[1]

            fn = jax.jit(chained)
            try:
                h = np.asarray(fn(sp._pair, sp._lu, z))
            except Exception as ex:
                print(f"M={M} W={W} S={S} {kern}: FAILED "
                      f"{type(ex).__name__}: {str(ex)[:140]}", flush=True)
                continue
            assert np.all(np.isfinite(h)), (M, W, kern, h)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(sp._pair, sp._lu, z))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / R
            print(f"M={M} W={W} S={S} nsubd={M * M} CGMaxIT={cg_it} "
                  f"{kern:5}: {dt * 1e3:8.3f} ms/application "
                  f"(chained x{R})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
