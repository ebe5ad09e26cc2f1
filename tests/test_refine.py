"""Mixed-precision iterative refinement (f32 inner / f64 outer)."""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
from hypre_tpu.solvers.refine import ir_solve, stencil_apply_f64
from hypre_tpu.ops import sparse_op_from_scipy

ST7 = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
       ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
       ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]


def test_stencil_apply_matches_matrix():
    A = laplacian(9, 7, 5)
    x = np.random.RandomState(0).randn(A.shape[0])
    y = stencil_apply_f64((9, 7, 5), ST7, x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_ir_reaches_f64_tolerance_from_f32_inner():
    """An inner solve truncated to f32 output precision still drives
    the outer f64 residual to 1e-10 (the --enable-single asterisk
    removed by refinement)."""
    import scipy.sparse.linalg as spla

    n = (12, 10, 8)
    A = laplacian(*n)
    lu = spla.splu(A.tocsc())
    b = np.random.RandomState(1).randn(A.shape[0])

    def inner(r32):
        dx = lu.solve(np.asarray(r32, np.float64))
        return dx.astype(np.float32), 1      # f32-rounded correction

    out = ir_solve(lambda x: stencil_apply_f64(n, ST7, x), b, inner,
                   tol=1e-10)
    assert out["relres"] <= 1e-10
    assert out["outer_iters"] <= 4


def test_ir_with_amg_pcg_inner():
    """End-to-end: AMG-PCG inner (run at loose tol in f32 precision)
    + IR outer reaches 1e-9 true f64 residual."""
    import jax

    n = (10, 10, 10)
    A = laplacian(*n)
    amg = BoomerAMG(AmgConfig()).setup(A)
    op = sparse_op_from_scipy(A)
    b = np.ones(A.shape[0])

    def inner(r32):
        res = pcg(A=op, b=np.asarray(r32, np.float64), M=amg,
                  tol=1e-6, max_iter=50)
        return np.asarray(res.x).astype(np.float32), int(res.iters)

    out = ir_solve(lambda x: stencil_apply_f64(n, ST7, x), b, inner,
                   tol=1e-9)
    assert out["relres"] <= 1e-9
    true = np.linalg.norm(b - A @ out["x"]) / np.linalg.norm(b)
    assert true <= 1.1e-9
