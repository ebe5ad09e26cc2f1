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


def test_derham_3d_exactness():
    """curl∘grad = 0 and div∘curl = 0 on the 3D complex."""
    from hypre_tpu.solvers.ams import derham_3d

    G, C, D, Pi_e, Pi_f = derham_3d(4)
    assert abs(C @ G).max() == 0.0
    assert abs(D @ C).max() == 0.0
    # incidence column sums: gradient rows have one +1 and one -1
    assert (np.asarray(abs(G).sum(axis=1)).ravel() == 2).all()


def test_ams_3d_mesh_independent():
    """3D Nedelec curl-curl + mass (the ex15 problem): AMS-PCG iters
    bounded independent of n (ref: src/parcsr_ls/ams.c)."""
    from hypre_tpu.solvers.ams import maxwell_3d

    iters = []
    for n in (3, 5):
        A, G, Pi = maxwell_3d(n, beta=1.0)
        ams = AMS().setup(A, G, Pi)
        b = np.ones(A.shape[0])
        res = pcg(sparse_op_from_scipy(A), b, M=ams.precondition,
                  tol=1e-8, max_iter=200)
        r = b - A @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
        iters.append(int(res.iters))
    assert iters[1] <= iters[0] + 3, iters


def test_ads_3d_hdiv():
    """3D RT0 div-div + mass with the REAL ADS (inner AMS edge solve,
    ref: src/parcsr_ls/ads.c)."""
    from hypre_tpu.solvers.ams import ADS, rt0_3d

    iters = []
    for n in (3, 5):
        A, C, Pi_f, G, Pi_e = rt0_3d(n, beta=1.0)
        ads = ADS().setup(A, C, Pi_f, G=G, Pi_e=Pi_e)
        b = np.ones(A.shape[0])
        res = pcg(sparse_op_from_scipy(A), b, M=ads.precondition,
                  tol=1e-8, max_iter=200)
        r = b - A @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
        iters.append(int(res.iters))
    assert iters[1] <= iters[0] + 3, iters


def test_ame_component_projects_gradients():
    """The dedicated AME component (ref: src/parcsr_ls/ame.c) returns
    non-gradient modes: every eigenvalue is above beta."""
    from hypre_tpu.solvers import AME
    from hypre_tpu.solvers.ams import maxwell_3d

    A, G, Pi = maxwell_3d(4, beta=1.0)
    ame = AME().setup(A, G, Pi)
    res = ame.solve(3, tol=1e-6, max_iter=80)
    ev = np.sort(np.asarray(res.eigenvalues))
    assert (ev > 1.05).all(), ev
