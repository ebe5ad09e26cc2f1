"""Local kernel unit tests: formats + SpMV vs scipy reference.

(The reference has no kernel-level unit tests — correctness there is
golden-file driver output, SURVEY §4 — so this is added coverage.)
"""
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.gen import laplacian, laplacian_27pt, laplacian_9pt
from hypre_tpu.ops.formats import (
    DiaMatrix, EllMatrix, dia_from_scipy, ell_from_scipy, ell_matvec,
    dia_matvec, matvec, matvec_t, sparse_op_from_scipy,
)


def random_csr(rng, n, m, density=0.1):
    A = sp.random(n, m, density=density, random_state=rng, format="csr")
    A.sort_indices()
    return A


@pytest.mark.parametrize("n,m", [(10, 10), (57, 41), (128, 64)])
def test_ell_matvec_matches_scipy(n, m):
    rng = np.random.RandomState(0)
    A = random_csr(rng, n, m, 0.15)
    x = rng.randn(m)
    E = ell_from_scipy(A)
    y = np.asarray(ell_matvec(E, x))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_ell_empty_rows():
    A = sp.csr_matrix((5, 5))
    A[1, 2] = 3.0
    A = A.tocsr()
    E = ell_from_scipy(A)
    x = np.arange(5.0)
    np.testing.assert_allclose(np.asarray(ell_matvec(E, x)), A @ x)


def test_dia_matvec_laplacian():
    A = laplacian(8, 8, 8)
    D = dia_from_scipy(A)
    assert D is not None
    assert len(D.offsets) == 7
    x = np.random.RandomState(1).randn(A.shape[0])
    np.testing.assert_allclose(np.asarray(dia_matvec(D, x)), A @ x,
                               rtol=1e-12)


def test_dia_matvec_rectangular_shifts():
    # non-square band structure exercises the shifted-slice edge logic
    rng = np.random.RandomState(2)
    n, m = 40, 40
    A = sp.diags([rng.randn(m - 3), rng.randn(m), rng.randn(m - 5)],
                 [-3, 0, 5], shape=(n, m)).tocsr()
    D = dia_from_scipy(A)
    x = rng.randn(m)
    np.testing.assert_allclose(np.asarray(dia_matvec(D, x)), A @ x,
                               rtol=1e-12)


def test_format_selection():
    from hypre_tpu.ops.formats import DenseMatrix
    from hypre_tpu.ops.gstell import GstEllMatrix

    A = laplacian_27pt(6, 6, 6)
    op = sparse_op_from_scipy(A)
    assert isinstance(op, DenseMatrix)  # small -> dense MXU path
    np.testing.assert_allclose(np.asarray(matvec(op, np.ones(216))),
                               A @ np.ones(216), rtol=1e-12)
    A2 = laplacian_27pt(16, 16, 16)
    op_l = sparse_op_from_scipy(A2)
    assert isinstance(op_l, (DiaMatrix, GstEllMatrix))
    op_d = sparse_op_from_scipy(A2, prefer_gstell=False)
    assert isinstance(op_d, DiaMatrix)  # 27 static offsets
    R = random_csr(np.random.RandomState(3), 100, 100, 0.05)
    op2 = ell_from_scipy(R)
    assert isinstance(op2, EllMatrix)
    x = np.random.RandomState(4).randn(100)
    np.testing.assert_allclose(np.asarray(matvec(op2, x)), R @ x, rtol=1e-12)


def test_matvec_transpose():
    rng = np.random.RandomState(5)
    A = random_csr(rng, 30, 20, 0.2)
    E = ell_from_scipy(A)
    y = rng.randn(30)
    np.testing.assert_allclose(np.asarray(matvec_t(E, y)), A.T @ y,
                               rtol=1e-12)


def test_9pt_generator_row_sums():
    A = laplacian_9pt(16, 16)
    # interior rows sum to zero (diag 8, eight -1 neighbors)
    interior = A.sum(axis=1).A1.reshape(16, 16)[1:-1, 1:-1]
    np.testing.assert_allclose(interior, 0.0, atol=1e-14)


def test_matmat_batched_rhs_all_formats():
    """NV-batched SpMV (ref: csr_spmv_device.c:35 NV template)."""
    import numpy as np
    from hypre_tpu.gen import laplacian
    from hypre_tpu.ops.formats import (
        dense_from_scipy, dia_from_scipy, ell_from_scipy, matmat,
    )

    A = laplacian(9, 7)
    X = np.random.RandomState(5).rand(A.shape[0], 4)
    want = A @ X
    for op in (ell_from_scipy(A), dia_from_scipy(A),
               dense_from_scipy(A)):
        got = np.asarray(matmat(op, X))
        assert np.allclose(got, want, atol=1e-5), type(op)
    # single-vector passthrough
    from hypre_tpu.ops.formats import matvec
    got1 = np.asarray(matmat(ell_from_scipy(A), X[:, 0]))
    assert np.allclose(got1, A @ X[:, 0], atol=1e-5)
