"""hypre_tpu — a TPU-native algebraic/geometric multigrid solver library.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of hypre
(LLNL's library of sparse linear solvers; reference: PaulMullowney/hypre
v2.32.0).  Nothing here is a port: the compute path is built on jnp /
Pallas kernels over padded-ELL sparse operators, distribution is a
`jax.sharding.Mesh` + shard_map with ICI collectives instead of MPI, and
the solve phase compiles to a single XLA program per hierarchy.

Subpackages
-----------
core      — handle/config, timing, error state   (ref: src/utilities/)
ops       — local sparse kernels: ELL/CSR SpMV, SpGEMM, vector ops
            (ref: src/seq_mv/)
gen       — problem generators (Laplacians, convection-diffusion)
            (ref: src/parcsr_ls/par_laplace*.c, par_difconv.c)
setup     — AMG setup-phase algorithms: strength, coarsening,
            interpolation, RAP (ref: src/parcsr_ls/par_strength.c,
            par_coarsen.c, par_interp.c, par_rap.c)
parallel  — distributed ParCSR matrix/vector over a device mesh
            (ref: src/parcsr_mv/)
solvers   — BoomerAMG, Krylov (PCG/GMRES/...), smoothers
            (ref: src/parcsr_ls/, src/krylov/)
struct    — structured-grid solvers (PFMG/SMG)  (ref: src/struct_ls/)
"""

__version__ = "0.1.0"

from hypre_tpu.core.config import Config, get_config, set_config  # noqa: F401
