"""Non-Galerkin sparsification + additive cycles (VERDICT round-2 #9).

Refs: src/parcsr_ls/par_nongalerkin.c:1245 (drop + lump),
src/parcsr_ls/par_add_cycle.c (additive/mult-additive/simple cycles).
"""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg


def _solve(cfg, n=(20, 20, 20), tol=1e-8):
    A = laplacian(*n)
    b = np.ones(A.shape[0])
    amg = BoomerAMG(cfg).setup(A)
    res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=tol,
              max_iter=300)
    true_rel = np.linalg.norm(b - A @ np.asarray(res.x)) / np.linalg.norm(b)
    return amg, int(res.iters), true_rel


def test_nongalerkin_sparsifies_and_converges():
    base, it0, _ = _solve(AmgConfig(interp_type=6))
    ng, it1, rel = _solve(AmgConfig(interp_type=6,
                                    nongalerk_tol_all=0.03))
    # sparser coarse levels...
    assert sum(ng.level_nnz[1:]) < sum(base.level_nnz[1:])
    # ...while convergence stays close to Galerkin
    assert rel < 1e-7
    assert it1 <= it0 + 6


def test_nongalerkin_preserves_symmetry_and_rowsum():
    import scipy.sparse as sp

    from hypre_tpu.setup.nongalerkin import nongalerkin_coarse_operator
    from hypre_tpu.setup.coarsen import pmis
    from hypre_tpu.setup.strength import strength_matrix
    from hypre_tpu.setup.interp_ext import extpi_interp

    A = laplacian(16, 16)
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    cf = pmis(S, seed=2747)
    P = extpi_interp(A, S, cf, 0.0, 4, strong_mask=mask)
    AP = (A @ P).tocsr()
    RAP = (P.T @ AP).tocsr()
    NG = nongalerkin_coarse_operator(RAP, AP, cf, droptol=0.05)
    assert NG.nnz < RAP.nnz
    # sym_collapse keeps the operator symmetric
    assert abs(NG - NG.T).max() < 1e-12
    # lumping preserves row sums (each dropped entry is redistributed
    # within its row, incl. the diagonal share)
    rs_g = np.asarray(RAP.sum(axis=1)).ravel()
    rs_n = np.asarray(NG.sum(axis=1)).ravel()
    np.testing.assert_allclose(rs_n, rs_g, atol=1e-10 * abs(rs_g).max()
                               + 1e-12)


def test_additive_cycle_converges():
    _, it_mult, _ = _solve(AmgConfig())
    _, it_add, rel = _solve(AmgConfig(additive=0))
    assert rel < 1e-7
    # BPX-additive needs more iterations than multiplicative, but must
    # stay mesh-independent-ish (well under diagonal scaling's count)
    assert it_add < 6 * it_mult


def test_simple_additive_converges():
    _, it, rel = _solve(AmgConfig(simple=0))
    assert rel < 1e-7
    assert it < 80


def test_partial_additive_range():
    # multiplicative on level 0, additive below (addlvl=1)
    _, it, rel = _solve(AmgConfig(additive=1))
    assert rel < 1e-7
    assert it < 60
