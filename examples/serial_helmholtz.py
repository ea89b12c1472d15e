"""Serial Helmholtz pipeline -- the reference's smoke test.

==  ``helmFE_var.py`` ``__main__`` (``helmFE_var.py:628-681``): assemble
the variable-wave-speed FE matrix on a 128x128 grid (omega=12, rho=0.15,
unit wave speed), build the all-boundaries k^2 RHS (``rhsA``), run
unpreconditioned CG, print the residual norms, optionally plot |x|.

Run:  python examples/serial_helmholtz.py [--plot out.png] [--cpu]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--cpu" in argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpcg.ops import block_cg_planes, from_planes, make_pair_operator, \
        to_planes
    from tpcg.problems import helm_fe_var, rhs_all_boundaries_k2

    N = 128
    n = N * N
    omega, rho = 12.0, 0.15
    print("# unknowns:", n)
    wave_speed = np.ones((N - 1, N - 1))
    H = helm_fe_var(N=N, omega=omega, C=wave_speed, rho=rho)
    b = rhs_all_boundaries_k2(N, omega).flatten()
    print("Conjugate Gradient iterations (fixed count, unconjugated dots)")
    P = make_pair_operator(H, dtype=jnp.float32)
    res = block_cg_planes(P, to_planes(b, jnp.float32),
                          n_iterations=2000)
    x = from_planes(np.asarray(res.x))
    r = H.to_scipy() @ x - b
    print("CG unpreconditioned resnorm:",
          np.sqrt(abs(np.dot(r, r))))
    print("max residual:", np.max(np.abs(r)))

    if "--plot" in argv:
        path = argv[argv.index("--plot") + 1]
        from tpcg.utils.viz import plot_field
        plot_field(np.abs(x), "abs(solution)", path=path)
        print("wrote", path)


if __name__ == "__main__":
    main()
