"""ILU preconditioner family tests (ref: hypre ILU solver, type enum
HYPRE_parcsr_ls.h:4780-4791; setup par_ilu_setup.c:15)."""
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import ILU, IluConfig, gmres, pcg


def test_chow_patel_matches_exact_ilu0_tridiag():
    # For a tridiagonal matrix ILU0 == exact LU; the fixed point
    # propagates one row per sweep, so n sweeps give the exact factors
    n = 12
    A = laplacian(n)
    ilu = ILU(IluConfig(ilu_type=50, sweeps=3 * n)).setup(A)
    Lm, Um = ilu._LU_scipy
    L = sp.identity(n) + sp.tril(Lm, -1)
    err = abs((L @ Um - A).toarray()).max()
    assert err < 1e-10


def test_iluk_factor_exact_on_full_fill():
    # ILU(k) with k >= bandwidth reproduces the exact LU factorization
    A = laplacian(8, 8)
    n = A.shape[0]
    ilu = ILU(IluConfig(fill_level=100)).setup(A)
    Lm, ud, Um = ilu._LU_scipy
    L = sp.identity(n) + Lm
    U = Um + sp.diags(ud)
    err = abs((L @ U - A).toarray()).max()
    assert err < 1e-9


def test_iluk_pattern_grows_with_k():
    A = laplacian(10, 10)
    nnz = []
    for k in (0, 1, 2):
        ilu = ILU(IluConfig(fill_level=k)).setup(A)
        Lm, ud, Um = ilu._LU_scipy
        nnz.append(Lm.nnz + Um.nnz)
    assert nnz[0] < nnz[1] < nnz[2]
    # ILU(0) fill pattern == pattern of A
    ilu0 = ILU(IluConfig(fill_level=0)).setup(A)
    Lm, ud, Um = ilu0._LU_scipy
    assert Lm.nnz + Um.nnz + A.shape[0] == A.nnz


def test_native_matches_numpy_twin():
    from hypre_tpu.solvers.ilu import _ilu_factor_numpy

    A = difconv(6, 6, 6, ax=2.0, atype=0)
    from hypre_tpu.setup.utils import native_enabled

    if not native_enabled():
        pytest.skip("native kernels unavailable")
    from hypre_tpu.csrc import build as native

    for kwargs in ({"fill_k": 1, "is_ilut": False},
                   {"drop_tol": 1e-2, "max_keep": 8, "is_ilut": True}):
        Ln, udn, Un = native.ilu_factor(A, **{
            {"fill_k": "fill_k", "drop_tol": "drop_tol",
             "max_keep": "max_keep", "is_ilut": "is_ilut"}[k]: v
            for k, v in kwargs.items()})
        Lp, udp, Up = _ilu_factor_numpy(
            A, kwargs.get("fill_k", 0), kwargs.get("drop_tol", 0.0),
            kwargs.get("max_keep", 1000), kwargs["is_ilut"])
        assert np.allclose(udn, udp)
        assert abs(Ln - Lp).max() < 1e-12
        assert abs(Un - Up).max() < 1e-12


@pytest.mark.parametrize("ilu_type", [0, 1, 10, 20, 30, 31, 50])
def test_ilu_family_gmres_converges(ilu_type):
    A = difconv(10, 10, 10, ax=3.0, atype=0)
    b = np.ones(A.shape[0])
    cfg = IluConfig(ilu_type=ilu_type, fill_level=1, drop_tol=1e-3,
                    ras_block_size=200, ras_overlap=20)
    ilu = ILU(cfg).setup(A)
    res = gmres(sparse_op_from_scipy(A), b, M=ilu.precondition,
                tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
    # a real preconditioner: beats unpreconditioned GMRES
    res0 = gmres(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=500)
    assert int(res.iters) < int(res0.iters)


def test_ilut_beats_ilu0_iterations():
    A = difconv(12, 12, 12, ax=4.0, atype=0)
    b = np.ones(A.shape[0])
    it = {}
    for t, kw in ((0, {}), (1, {"drop_tol": 1e-4, "max_row_nnz": 20})):
        ilu = ILU(IluConfig(ilu_type=t, **kw)).setup(A)
        res = gmres(sparse_op_from_scipy(A), b, M=ilu.precondition,
                    tol=1e-10, max_iter=500)
        it[t] = int(res.iters)
    assert it[1] <= it[0]


def test_ilu_pcg_spd():
    A = laplacian(20, 20)
    b = np.ones(A.shape[0])
    ilu = ILU().setup(A)
    res = pcg(sparse_op_from_scipy(A), b, M=ilu.precondition,
              tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_ras_restriction_is_partition():
    """Every row's correction comes from exactly one (owning) block."""
    A = laplacian(7, 7)
    ilu = ILU(IluConfig(ilu_type=30, ras_block_size=10,
                        ras_overlap=3, fill_level=2)).setup(A)
    r = np.random.RandomState(3).rand(A.shape[0])
    x = np.asarray(ilu.precondition(r))
    assert np.isfinite(x).all() and np.abs(x).max() > 0


def test_ilu_refactor_parallel_exact():
    # level-scheduled parallel refactorization (Euclid_dh.c:127 design
    # point): bit-equal to serial ILU(0); on a reused ILU(k) pattern it
    # is the static-pattern factorization and must still precondition
    import numpy as np
    import scipy.sparse as sp

    from hypre_tpu.csrc import build as native
    from hypre_tpu.gen import laplacian
    from hypre_tpu.solvers.ilu import ilu_refactor

    A = laplacian(16, 16, 8).astype(np.float64).tocsr()
    L, ud, U = native.ilu_factor(A, fill_k=0)
    L2, ud2, U2 = ilu_refactor(A, L, U)
    assert np.allclose(L.data, L2.data, rtol=1e-13)
    assert np.allclose(ud, ud2, rtol=1e-13)
    assert np.allclose(U.data, U2.data, rtol=1e-13)

    # reuse an ILU(1) pattern for a perturbed operator: the refreshed
    # factors must be a working preconditioner
    L, ud, U = native.ilu_factor(A, fill_k=1)
    A2 = (A + 0.1 * sp.eye(A.shape[0])).tocsr()
    L2, ud2, U2 = ilu_refactor(A2, L, U)
    # apply M^{-1} r = U^{-1} D^{-1} L^{-1} r via scipy triangular solves
    from scipy.sparse.linalg import spsolve_triangular

    r = np.ones(A.shape[0])
    z = spsolve_triangular(
        (sp.eye(A.shape[0]) + L2).tocsr(), r, lower=True)
    z = spsolve_triangular(
        (sp.eye(A.shape[0]) + sp.diags(1.0 / ud2) @ U2).tocsr(),
        z / ud2, lower=False)
    # one preconditioned Richardson step reduces the residual
    res0 = np.linalg.norm(r)
    res1 = np.linalg.norm(r - A2 @ z)
    assert np.isfinite(z).all() and res1 < 0.6 * res0
