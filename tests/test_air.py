"""AIR restriction tests: advection-dominated problems where symmetric
AMG struggles (ref: hypre -restr_par AIR for nonsymmetric)."""
import numpy as np

from hypre_tpu.gen import difconv
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, gmres


def test_air_advection_dominated():
    # strong upwind advection: AIR-AMG-GMRES must converge fast
    A = difconv(16, 16, 1, cx=1e-3, cy=1e-3, ax=1.0, ay=0.5, atype=0)
    b = np.ones(A.shape[0])
    air = BoomerAMG(AmgConfig(restr_type=1)).setup(A)
    res = gmres(sparse_op_from_scipy(A), b, M=air, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    assert rel < 1e-6
    assert int(res.iters) <= 40, f"AIR-GMRES took {int(res.iters)}"


def test_air_vs_galerkin_on_advection():
    A = difconv(14, 14, 1, cx=1e-3, cy=1e-3, ax=1.0, atype=0)
    b = np.ones(A.shape[0])
    air = BoomerAMG(AmgConfig(restr_type=1)).setup(A)
    res_air = gmres(sparse_op_from_scipy(A), b, M=air, tol=1e-8,
                    max_iter=400)
    sym = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    res_sym = gmres(sparse_op_from_scipy(A), b, M=sym, tol=1e-8,
                    max_iter=400)
    assert int(res_air.iters) <= int(res_sym.iters) + 2
