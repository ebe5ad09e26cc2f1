"""Distributed example: BoomerAMG-PCG sharded over a device mesh
(run with XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU,
or on a real multi-chip TPU slice)."""
import jax
import numpy as np
from jax.sharding import Mesh

from hypre_tpu.gen import laplacian
from hypre_tpu.solvers.amg import AmgConfig
from hypre_tpu.solvers.par_amg import ParBoomerAMG


def main(n=24):
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("p",))
    A = laplacian(n, n, n)
    pamg = ParBoomerAMG(mesh, AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    x, iters, relres = pamg.solve_pcg(b, tol=1e-8, max_iter=100)
    print(f"devices = {len(devs)}")
    print(f"Iterations = {iters}")
    print(f"Final Relative Residual Norm = {relres:e}")


if __name__ == "__main__":
    main()
