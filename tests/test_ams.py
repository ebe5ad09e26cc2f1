"""AMS (H(curl)) tests — ref behavior: AMS-PCG converges on curl-curl
+ mass where plain AMG stalls (TEST_ams analog)."""
import numpy as np

from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AMS, AmgConfig, BoomerAMG, pcg
from hypre_tpu.solvers.ams import maxwell_2d


def test_ams_pcg_beats_plain_amg():
    A, G, Pi = maxwell_2d(16, beta=1.0)
    b = np.ones(A.shape[0])
    ams = AMS().setup(A, G, Pi)
    res = pcg(sparse_op_from_scipy(A), b, M=ams.precondition,
              tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 40, f"AMS-PCG took {int(res.iters)}"

    # plain AMG on the edge matrix is much worse
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    res_amg = pcg(sparse_op_from_scipy(A), b, M=amg, tol=1e-8,
                  max_iter=200)
    assert int(res.iters) < int(res_amg.iters)


def test_ams_small_beta():
    # mass-dominated nullspace regime: the G-correction carries it
    A, G, Pi = maxwell_2d(12, beta=0.01)
    b = np.ones(A.shape[0])
    ams = AMS().setup(A, G, Pi)
    res = pcg(sparse_op_from_scipy(A), b, M=ams.precondition,
              tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_ame_eigensolver():
    # AME = LOBPCG + AMS preconditioner (ref: src/parcsr_ls/ame.c)
    from hypre_tpu.solvers import lobpcg

    A, G, Pi = maxwell_2d(10, beta=0.5)
    ams = AMS().setup(A, G, Pi)
    X0 = np.random.RandomState(0).randn(A.shape[0], 3)
    res = lobpcg(sparse_op_from_scipy(A), X0, M=ams.precondition,
                 tol=1e-6, max_iter=150)
    # smallest eigenvalues of C^T C + 0.5 I are 0.5 (gradient fields)
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               [0.5, 0.5, 0.5], rtol=1e-4)


def test_ads_pcg():
    from hypre_tpu.solvers.ams import ADS, rt0_2d

    A, C, Pi = rt0_2d(14, beta=1.0)
    b = np.ones(A.shape[0])
    ads = ADS().setup(A, C, Pi)
    res = pcg(sparse_op_from_scipy(A), b, M=ads.precondition,
              tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 40
