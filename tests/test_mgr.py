"""MGR tests: two-physics block system (pressure/saturation analog)."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen import laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import MGR, gmres


def coupled_system(n):
    """[[L + I, eps*I], [eps*I, D]]: elliptic pressure block coupled to
    a near-diagonal saturation block, interleaved dof ordering."""
    L = laplacian(n, n)
    m = L.shape[0]
    rng = np.random.RandomState(0)
    D = sp.diags(1.0 + rng.rand(m))
    eps = 0.1
    A = sp.bmat([[L + sp.identity(m), eps * sp.identity(m)],
                 [eps * sp.identity(m), D]]).tocsr()
    # interleave: dof 2i = pressure i, 2i+1 = saturation i
    perm = np.argsort(np.concatenate([2 * np.arange(m),
                                      2 * np.arange(m) + 1]))
    P = sp.identity(2 * m).tocsr()[perm]
    A = (P @ A @ P.T).tocsr()
    c_mask = np.zeros(2 * m, bool)
    c_mask[0::2] = True      # pressure dofs are the coarse block
    return A, c_mask


def test_mgr_gmres():
    A, c_mask = coupled_system(16)
    b = np.ones(A.shape[0])
    mgr = MGR().setup(A, c_mask)
    res = gmres(sparse_op_from_scipy(A), b, M=mgr.precondition,
                tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 30, f"MGR-GMRES took {int(res.iters)}"


def three_physics_system(n):
    """Three interleaved fields: elliptic p, elliptic-ish T, diagonal s.
    MGR plan: level 0 keeps {p, T}, level 1 keeps {p}."""
    L = laplacian(n, n)
    m = L.shape[0]
    rng = np.random.RandomState(1)
    D = sp.diags(2.0 + rng.rand(m))
    eps = 0.05
    I = sp.identity(m)
    A = sp.bmat([[L + I, eps * I, eps * I],
                 [eps * I, 0.5 * L + I, eps * I],
                 [eps * I, eps * I, D]]).tocsr()
    perm = np.argsort(np.concatenate(
        [3 * np.arange(m), 3 * np.arange(m) + 1, 3 * np.arange(m) + 2]))
    Pm = sp.identity(3 * m).tocsr()[perm]
    return (Pm @ A @ Pm.T).tocsr()


def test_mgr_multilevel_by_function():
    from hypre_tpu.solvers.mgr import MgrConfig

    A = three_physics_system(12)
    b = np.ones(A.shape[0])
    cfg = MgrConfig(coarse_funcs=[(0, 1), (0,)], num_functions=3,
                    interp_type=2, restrict_type=0)
    mgr = MGR(cfg).setup(A)
    assert len(mgr.levels) == 2
    assert mgr.level_sizes == [A.shape[0], 2 * A.shape[0] // 3,
                               A.shape[0] // 3]
    res = gmres(sparse_op_from_scipy(A), b, M=mgr.precondition,
                tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 40


def test_mgr_block_f_relax_amg():
    """Block F-relaxation: inner AMG V-cycle on the (elliptic) A_ff."""
    from hypre_tpu.solvers.mgr import MgrConfig

    A, c_mask = coupled_system(16)
    # swap roles: keep the DIAGONAL block coarse so A_ff is elliptic
    b = np.ones(A.shape[0])
    cfg = MgrConfig(f_relax_type="amg", interp_type=2, restrict_type=2)
    mgr = MGR(cfg).setup(A, ~c_mask)
    res = gmres(sparse_op_from_scipy(A), b, M=mgr.precondition,
                tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    # elliptic F-block + AMG F-relax: few iterations
    assert int(res.iters) <= 25
