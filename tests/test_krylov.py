"""Krylov solver tests vs hypre's golden convergence behavior."""
import numpy as np

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, bicgstab, cgnr, gmres


def test_gmres_unpreconditioned():
    A = laplacian(12, 12)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=1000,
                k_dim=20)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_amg_gmres():
    # hypre golden: AMG-GMRES on 2D Laplacian ~7 iters
    # (TEST_ij/solvers.saved:9-11); PMIS+l1-Jacobi is weaker.
    A = laplacian(33, 33)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 25


def test_gmres_nonsymmetric():
    A = difconv(12, 12, 12, ax=5.0, ay=2.0, atype=0)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_bicgstab():
    A = difconv(10, 10, 10, ax=3.0, atype=0)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = bicgstab(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_cgnr():
    A = laplacian(10, 10)
    b = np.ones(A.shape[0])
    res = cgnr(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=2000)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_flexgmres_lgmres_cogmres():
    from hypre_tpu.solvers import cogmres, flexgmres, lgmres

    A = laplacian(16, 16)
    b = np.ones(A.shape[0])
    op = sparse_op_from_scipy(A)
    amg = BoomerAMG(AmgConfig()).setup(A)
    for solver in (flexgmres, lgmres, cogmres):
        res = solver(op, b, M=amg, tol=1e-8, max_iter=300)
        r = b - A @ np.asarray(res.x)
        rel = np.linalg.norm(r) / np.linalg.norm(b)
        assert rel < 1e-6, f"{solver.__name__}: {rel}"


def test_hybrid_switches_to_amg():
    from hypre_tpu.solvers import HybridConfig, hybrid_solve

    # Laplacian converges slowly under DSCG -> hybrid must switch
    A = laplacian(40, 40)
    b = np.ones(A.shape[0])
    res = hybrid_solve(A, b, HybridConfig(tol=1e-8))
    assert res.pcg_iters > 0, "hybrid never switched to AMG"
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_hybrid_stays_dscg_for_easy_problem():
    import scipy.sparse as sp
    from hypre_tpu.solvers import HybridConfig, hybrid_solve

    # well-conditioned diagonal-ish matrix: DSCG converges fast alone
    n = 200
    A = (sp.identity(n) * 4 + sp.random(n, n, density=0.01,
                                        random_state=np.random.RandomState(0)))
    A = ((A + A.T) * 0.5).tocsr()
    b = np.ones(n)
    res = hybrid_solve(A, b, HybridConfig(tol=1e-8))
    assert res.pcg_iters == 0
    assert res.relres < 1e-8
