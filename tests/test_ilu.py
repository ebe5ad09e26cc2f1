"""ILU preconditioner tests (ref: hypre ILU-GMRES solver 81)."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import ILU, IluConfig, gmres, pcg


def test_chow_patel_matches_exact_ilu0_tridiag():
    # For a tridiagonal matrix ILU0 == exact LU; the fixed point
    # propagates one row per sweep, so n sweeps give the exact factors
    n = 12
    A = laplacian(n)
    ilu = ILU(IluConfig(sweeps=3 * n)).setup(A)
    Lm, Um = ilu._LU_scipy
    L = sp.identity(n) + sp.tril(Lm, -1)
    err = abs((L @ Um - A).toarray()).max()
    assert err < 1e-10


def test_ilu_gmres():
    A = difconv(12, 12, 12, ax=3.0, atype=0)
    b = np.ones(A.shape[0])
    ilu = ILU().setup(A)
    res = gmres(sparse_op_from_scipy(A), b, M=ilu.precondition,
                tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
    # must beat unpreconditioned GMRES
    res0 = gmres(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=500)
    assert int(res.iters) < int(res0.iters)


def test_ilu_pcg_spd():
    A = laplacian(20, 20)
    b = np.ones(A.shape[0])
    ilu = ILU().setup(A)
    res = pcg(sparse_op_from_scipy(A), b, M=ilu.precondition,
              tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
