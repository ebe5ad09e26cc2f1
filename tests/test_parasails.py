"""ParaSails tests (ref: hypre ij driver solver 18, ParaSails.c)."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers.krylov_more import gmres
from hypre_tpu.solvers.parasails import ParaSails, ParaSailsConfig


def test_parasails_shrinks_residual_of_identity():
    """||I - M*Atil||_F must beat diagonal scaling on the pruned op."""
    A = difconv(10, 10, 10, cx=1.0, cy=1.0, cz=1.0, ax=8.0)
    ps = ParaSails(ParaSailsConfig(thresh=0.0, filter=0.0)).setup(A)
    M = ps._M_scipy
    eye = sp.identity(A.shape[0], format="csr")
    D = sp.diags(1.0 / A.diagonal())
    r_ps = sp.linalg.norm(eye - M @ A)
    r_jac = sp.linalg.norm(eye - D @ A)
    assert r_ps < 0.6 * r_jac


def test_parasails_gmres_accelerates_nonsymmetric():
    A = difconv(12, 12, 12, ax=10.0, ay=4.0)
    b = np.ones(A.shape[0])
    op = sparse_op_from_scipy(A)
    plain = gmres(op, b, tol=1e-8, max_iter=400, k_dim=20)
    ps = ParaSails(ParaSailsConfig(thresh=0.0, nlevels=1,
                                   filter=0.0)).setup(A)
    prec = gmres(op, b, M=ps.precondition, tol=1e-8, max_iter=400,
                 k_dim=20)
    r = b - A @ np.asarray(prec.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(prec.iters) < int(plain.iters)


def test_parasails_sym_mode_delegates_to_factored():
    A = laplacian(16, 16)
    b = np.ones(A.shape[0])
    ps = ParaSails(ParaSailsConfig(sym=True, thresh=0.0)).setup(A)
    from hypre_tpu.solvers import pcg
    op = sparse_op_from_scipy(A)
    res = pcg(op, b, M=ps.precondition, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_parasails_filter_sparsifies():
    A = difconv(8, 8, 8, ax=6.0)
    dense = ParaSails(ParaSailsConfig(filter=0.0)).setup(A)
    filt = ParaSails(ParaSailsConfig(filter=0.2)).setup(A)
    assert filt._M_scipy.nnz < dense._M_scipy.nnz
