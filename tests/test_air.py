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


def test_air_dist2_and_neumann():
    """Distance-2 lAIR (restr 2) and Neumann AIR (restr >= 3,
    degree = restr_type - 3) both converge on strong advection; the
    richer restrictions never do worse than distance-1 by much."""
    A = difconv(16, 16, 1, cx=1e-3, cy=1e-3, ax=1.0, ay=0.5, atype=0)
    b = np.ones(A.shape[0])
    its = {}
    for rt in (1, 2, 4, 5):
        air = BoomerAMG(AmgConfig(restr_type=rt)).setup(A)
        res = gmres(sparse_op_from_scipy(A), b, M=air, tol=1e-8,
                    max_iter=300)
        r = b - A @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6, rt
        its[rt] = int(res.iters)
    assert its[2] <= its[1] + 2, its
    assert its[5] <= its[4] + 5, its


def test_neumann_air_matches_ideal_on_small():
    """With a large Neumann degree, R -> the ideal restriction
    -A_cf A_ff^{-1} on the strength-filtered blocks: R A P's F-block
    coupling vanishes."""
    import scipy.sparse as sp
    from hypre_tpu.setup.air import neumann_air_restriction
    from hypre_tpu.setup.coarsen import C_PT, pmis
    from hypre_tpu.setup.strength import strength_matrix
    from hypre_tpu.gen import laplacian

    A = laplacian(8, 8, 1)
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    cf = pmis(S)
    R8 = neumann_air_restriction(A, S, cf, strong_mask=mask, degree=40)
    is_c = cf == C_PT
    f_idx = np.flatnonzero(~is_c)
    c_idx = np.flatnonzero(is_c)
    # ideal on the FULL blocks would need the unfiltered A_ff; on the
    # Laplacian the strength filter keeps every offd entry, so the
    # series converges to the true ideal restriction
    Aff = A[f_idx][:, f_idx].toarray()
    Acf = A[c_idx][:, f_idx].toarray()
    ideal = -Acf @ np.linalg.inv(Aff)
    got = R8[:, f_idx].toarray()
    assert np.allclose(got, ideal, atol=1e-6)
