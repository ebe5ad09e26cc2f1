"""Schwarz smoother tests (ref: Schwarz-PCG, solver 12)."""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import Schwarz, SchwarzConfig, pcg


def test_schwarz_pcg():
    A = laplacian(24, 24)
    b = np.ones(A.shape[0])
    sw = Schwarz(SchwarzConfig(block_size=48, overlap=8)).setup(A)
    res = pcg(sparse_op_from_scipy(A), b, M=sw.precondition,
              tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    plain = pcg(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=500)
    assert int(res.iters) < int(plain.iters)
