"""Struct example: CG + PFMG / SMG on a structured 3D grid
(ref: src/examples/ex1-ex4 family)."""
import numpy as np

from hypre_tpu.solvers.krylov import pcg
from hypre_tpu.struct.grid import struct_laplacian, struct_matvec
from hypre_tpu.struct.pfmg import PFMG, PfmgConfig


def main(n=32):
    A = struct_laplacian(n, n, n)
    b = np.ones((n, n, n))
    pf = PFMG(PfmgConfig(relax_type=2)).setup(A)
    res = pcg(A=lambda u: struct_matvec(A, u), b=b, M=pf.precondition,
              tol=1e-7, max_iter=50)
    print(f"Iterations = {int(res.iters)}")
    print(f"Final Relative Residual Norm = {float(res.relres):e}")
    return res


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
