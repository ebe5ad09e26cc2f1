"""LOBPCG eigensolver tests (ref behavior: TEST_lobpcg, ij -lobpcg)."""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, lobpcg


def exact_laplacian_eigs(nx, ny, k):
    ev = []
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            ev.append(4 * np.sin(i * np.pi / (2 * (nx + 1))) ** 2
                      + 4 * np.sin(j * np.pi / (2 * (ny + 1))) ** 2)
    return np.sort(ev)[:k]


def test_lobpcg_smallest_eigs():
    nx = ny = 16
    A = laplacian(nx, ny)
    m = 4
    X0 = np.random.RandomState(0).randn(A.shape[0], m)
    res = lobpcg(sparse_op_from_scipy(A), X0, tol=1e-8, max_iter=200)
    exact = exact_laplacian_eigs(nx, ny, m)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact,
                               rtol=1e-6)


def test_lobpcg_amg_preconditioned():
    nx = ny = 20
    A = laplacian(nx, ny)
    m = 3
    amg = BoomerAMG(AmgConfig()).setup(A)
    X0 = np.random.RandomState(1).randn(A.shape[0], m)
    res = lobpcg(sparse_op_from_scipy(A), X0, M=amg, tol=1e-8,
                 max_iter=100)
    exact = exact_laplacian_eigs(nx, ny, m)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact,
                               rtol=1e-6)
    # preconditioned LOBPCG should converge in few iterations
    assert res.iters <= 40

    # residual check: ||A x - λ x|| small
    x0 = np.asarray(res.eigenvectors[:, 0])
    lam0 = float(res.eigenvalues[0])
    r = A @ x0 - lam0 * x0
    assert np.linalg.norm(r) < 1e-5
