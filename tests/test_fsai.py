"""FSAI preconditioner tests (ref: hypre FSAI-PCG, solver 31)."""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import FSAI, FsaiConfig, pcg


def test_fsai_g_is_lower_triangular():
    A = laplacian(12, 12)
    f = FSAI().setup(A)
    G = f._G_scipy
    import scipy.sparse as sp
    assert (G - sp.tril(G)).nnz == 0
    assert np.all(G.diagonal() > 0)


def test_fsai_pcg_accelerates():
    A = laplacian(24, 24)
    b = np.ones(A.shape[0])
    op = sparse_op_from_scipy(A)
    plain = pcg(op, b, tol=1e-8, max_iter=500)
    f = FSAI(FsaiConfig(num_levels=1)).setup(A)
    fs = pcg(op, b, M=f.precondition, tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(fs.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(fs.iters) < int(plain.iters)


def test_adaptive_fsai_beats_or_matches_static():
    """Adaptive (Kaporin-gradient) pattern — hypre's default — should
    precondition at least as well as the static distance-1 pattern
    with a similar nnz budget."""
    import scipy.sparse as sp
    from hypre_tpu.solvers.fsai import FSAI, FsaiConfig

    A = laplacian(14, 14, 1)
    b = np.ones(A.shape[0])
    fs = FSAI(FsaiConfig(algo_type="static", max_row_nnz=8)).setup(A)
    fa = FSAI(FsaiConfig(algo_type="adaptive", max_steps=3,
                         max_step_size=3)).setup(A)
    its = {}
    for name, f in (("static", fs), ("adaptive", fa)):
        res = pcg(sparse_op_from_scipy(A), b, M=f.precondition,
                  tol=1e-8, max_iter=300)
        assert float(res.relres) <= 1e-8
        its[name] = int(res.iters)
    assert its["adaptive"] <= its["static"] + 2, its
    # patterns are genuinely adaptive: strictly lower-triangular G
    G = fa._G_scipy
    assert (abs(sp.triu(G, 1)).max() if sp.triu(G, 1).nnz else 0) == 0


def test_adaptive_fsai_psi_stall_freezes_rows():
    from hypre_tpu.solvers.fsai import FSAI, FsaiConfig

    A = laplacian(10, 10, 1)
    # huge tolerance -> rows stall after the first step: pattern stays
    # within one step's budget
    f = FSAI(FsaiConfig(algo_type="adaptive", max_steps=4,
                        max_step_size=2, kap_tolerance=1e30)).setup(A)
    per_row = np.diff(f._G_scipy.indptr)
    assert per_row.max() <= 1 + 2  # diagonal + one step of adds
