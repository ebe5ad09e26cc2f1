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


def test_multiplicative_schwarz_converges_faster():
    from hypre_tpu.solvers.schwarz import Schwarz, SchwarzConfig
    from hypre_tpu.solvers import gmres

    A = laplacian(24, 24, 1)
    b = np.ones(A.shape[0])
    its = {}
    for var in ("additive", "multiplicative", "sym-multiplicative"):
        sw = Schwarz(SchwarzConfig(block_size=48, overlap=8,
                                   variant=var)).setup(A)
        res = gmres(sparse_op_from_scipy(A), b, M=sw.precondition,
                    tol=1e-8, max_iter=400)
        r = b - A @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6, var
        its[var] = int(res.iters)
    # multiplicative sweeps beat damped-additive
    assert its["multiplicative"] < its["additive"], its
    assert its["sym-multiplicative"] <= its["multiplicative"] + 2, its


def test_sym_multiplicative_is_spd_preconditioner():
    from hypre_tpu.solvers.schwarz import Schwarz, SchwarzConfig
    from hypre_tpu.solvers import pcg

    A = laplacian(16, 16, 1)
    b = np.ones(A.shape[0])
    sw = Schwarz(SchwarzConfig(block_size=32, overlap=4,
                               variant="sym-multiplicative")).setup(A)
    res = pcg(sparse_op_from_scipy(A), b, M=sw.precondition,
              tol=1e-8, max_iter=400)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
