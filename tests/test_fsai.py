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
