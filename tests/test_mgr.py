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
