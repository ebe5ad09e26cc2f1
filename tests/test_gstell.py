"""GST-ELL format tests (reference semantics on CPU; the Pallas kernel
itself is exercised on TPU by bench.py / the drivers)."""
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.gen import laplacian, laplacian_27pt
from hypre_tpu.ops.gstell import (
    gstell_from_scipy, gstell_matvec_reference,
)


def check(M, rtol=1e-12):
    B = gstell_from_scipy(M)
    assert B is not None, "expected GST-ELL to accept this matrix"
    x = np.random.RandomState(0).randn(M.shape[1])
    y = np.asarray(gstell_matvec_reference(B, x))
    np.testing.assert_allclose(y, M @ x, rtol=rtol, atol=1e-10)
    return B


def test_laplacian_7pt():
    B = check(laplacian(16, 16, 16))
    # gap auto-tuning favors low padding over narrow windows
    assert B.vals.size <= 2.5 * B.nnz
    assert B.c <= 8


def test_laplacian_27pt():
    check(laplacian_27pt(10, 10, 10))


def test_rectangular_interp_like():
    # banded rectangular operator (fine -> coarse)
    A = laplacian(20, 20)
    from hypre_tpu.setup import direct_interp, pmis, strength_matrix

    S = strength_matrix(A)
    cf = pmis(S)
    P = direct_interp(A, S, cf)
    check(P)
    check(P.T.tocsr())


def test_amg_level_matrices():
    from hypre_tpu.solvers.amg import AmgConfig, build_host_hierarchy

    A = laplacian(24, 24, 24)
    levels, Ac = build_host_hierarchy(A, AmgConfig())
    for Al, Pl, Rl, _cf in levels:
        check(Al)


def test_random_matrix_rejected():
    rng = np.random.RandomState(1)
    n, nnz = 200000, 2_000_000
    rows = rng.randint(0, n, nnz)
    cols = rng.randint(0, n, nnz)
    R = sp.coo_matrix((rng.randn(nnz), (rows, cols)),
                      shape=(n, n)).tocsr()
    assert gstell_from_scipy(R) is None  # not banded -> fallback


def test_empty_rows_ok():
    A = sp.lil_matrix((300, 300))
    A[0, 0] = 2.0
    A[299, 298] = -1.0
    A[150, 150] = 1.5
    B = gstell_from_scipy(A.tocsr())
    x = np.random.RandomState(2).randn(300)
    y = np.asarray(gstell_matvec_reference(B, x))
    np.testing.assert_allclose(y, A.tocsr() @ x, rtol=1e-12)
