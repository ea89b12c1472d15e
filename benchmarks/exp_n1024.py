"""Probe 3: butterfly stage throughput + N=1024 const-kernel diagnosis,
one TPU process."""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from tpcg.ops.fused_cg_const import fused_cg_const
    from tpcg.problems import helm_fe, plane_wave_rhs

    # ---- N=1024 diagnosis ----------------------------------------------
    for N, parts in ((768, ("rows", "cols")), (1024, ()), (1024, ("rows",)),
                     (1024, ("cols",))):
        k = 12.0
        A = helm_fe(N, k, eps=k)
        bg = plane_wave_rhs(N, k)
        iters = 500
        try:
            f = jax.jit(lambda A=A, bg=bg, parts=parts: fused_cg_const(
                A, bg[None], n_iterations=iters, _parts=parts)[1][-1])
            rn = np.asarray(f())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f())
                ts.append(time.perf_counter() - t0)
            n = N * N
            nnz = int(np.count_nonzero(np.asarray(A.coef)))
            gf = iters * (8 * nnz + 40 * n) / min(ts) / 1e9
            print(f"N={N} parts={parts}: {min(ts)*1e3:.2f} ms "
                  f"{gf:.1f} GFLOPS finite={np.isfinite(rn).all()}",
                  flush=True)
        except Exception as e:
            print(f"N={N} parts={parts}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
