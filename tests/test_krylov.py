"""Krylov solver tests vs hypre's golden convergence behavior."""
import numpy as np

from hypre_tpu.gen import difconv, laplacian
from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import AmgConfig, BoomerAMG, bicgstab, cgnr, gmres


def test_gmres_unpreconditioned():
    A = laplacian(12, 12)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=1000,
                k_dim=20)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_amg_gmres():
    # hypre golden: AMG-GMRES on 2D Laplacian ~7 iters
    # (TEST_ij/solvers.saved:9-11); PMIS+l1-Jacobi is weaker.
    A = laplacian(33, 33)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=200)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 25


def test_gmres_nonsymmetric():
    A = difconv(12, 12, 12, ax=5.0, ay=2.0, atype=0)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_bicgstab():
    A = difconv(10, 10, 10, ax=3.0, atype=0)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = bicgstab(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=300)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_cgnr():
    A = laplacian(10, 10)
    b = np.ones(A.shape[0])
    res = cgnr(sparse_op_from_scipy(A), b, tol=1e-8, max_iter=2000)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


def test_flexgmres_lgmres_cogmres():
    from hypre_tpu.solvers import cogmres, flexgmres, lgmres

    A = laplacian(16, 16)
    b = np.ones(A.shape[0])
    op = sparse_op_from_scipy(A)
    amg = BoomerAMG(AmgConfig()).setup(A)
    for solver in (flexgmres, lgmres, cogmres):
        res = solver(op, b, M=amg, tol=1e-8, max_iter=300)
        r = b - A @ np.asarray(res.x)
        rel = np.linalg.norm(r) / np.linalg.norm(b)
        assert rel < 1e-6, f"{solver.__name__}: {rel}"


def test_hybrid_switches_to_amg():
    from hypre_tpu.solvers import HybridConfig, hybrid_solve

    # Laplacian converges slowly under DSCG -> hybrid must switch
    A = laplacian(40, 40)
    b = np.ones(A.shape[0])
    res = hybrid_solve(A, b, HybridConfig(tol=1e-8))
    assert res.pcg_iters > 0, "hybrid never switched to AMG"
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_hybrid_stays_dscg_for_easy_problem():
    import scipy.sparse as sp
    from hypre_tpu.solvers import HybridConfig, hybrid_solve

    # well-conditioned diagonal-ish matrix: DSCG converges fast alone
    n = 200
    A = (sp.identity(n) * 4 + sp.random(n, n, density=0.01,
                                        random_state=np.random.RandomState(0)))
    A = ((A + A.T) * 0.5).tocsr()
    b = np.ones(n)
    res = hybrid_solve(A, b, HybridConfig(tol=1e-8))
    assert res.pcg_iters == 0
    assert res.relres < 1e-8


def test_gmres_matches_hypre_golden():
    # BoomerAMG-GMRES golden: 7 iterations (TEST_ij/solvers.saved:9-11)
    from hypre_tpu.solvers.krylov_more import gmres
    from hypre_tpu.solvers import AmgConfig, BoomerAMG
    from hypre_tpu.ops import sparse_op_from_scipy

    A = laplacian(10, 10, 10)
    cfg = AmgConfig(coarsen_type="hmis", interp_type=6, relax_type=13)
    amg = BoomerAMG(cfg).setup(A)
    b = np.random.RandomState(42).rand(A.shape[0])
    r = gmres(A=sparse_op_from_scipy(A), b=b, M=amg.precondition,
              tol=1e-8, max_iter=100)
    assert abs(int(r.iters) - 7) <= 2, \
        f"AMG-GMRES took {int(r.iters)}; hypre golden is 7"


def test_cgnr_matches_hypre_golden():
    # BoomerAMG-CGNR (-w 0.67 -ns 2) golden: 9 iterations
    # (TEST_ij/solvers.saved:17-19); preconditioner INSIDE the normal
    # equations per cgnr.c:361.
    from hypre_tpu.solvers.krylov_more import cgnr
    from hypre_tpu.solvers import AmgConfig, BoomerAMG
    from hypre_tpu.ops import sparse_op_from_scipy

    A = laplacian(10, 10, 10)
    cfg = AmgConfig(coarsen_type="hmis", interp_type=6, relax_type=13,
                    relax_weight=0.67, num_sweeps=2)
    amg = BoomerAMG(cfg).setup(A)
    b = np.random.RandomState(42).rand(A.shape[0])
    r = cgnr(A=sparse_op_from_scipy(A), b=b, M=amg.precondition,
             tol=1e-8, max_iter=100)
    assert abs(int(r.iters) - 9) <= 2, \
        f"AMG-CGNR took {int(r.iters)}; hypre golden is 9"


def test_lgmres_augmentation_helps():
    # aug_dim > 0 must beat plain restarted GMRES at equal k_dim on a
    # problem where restarts stall (ref: lgmres.c purpose)
    from hypre_tpu.solvers.krylov_more import gmres, lgmres
    from hypre_tpu.ops import sparse_op_from_scipy

    A = laplacian(24, 24)
    op = sparse_op_from_scipy(A)
    b = np.random.RandomState(3).rand(A.shape[0])
    rg = gmres(A=op, b=b, tol=1e-8, max_iter=2000, k_dim=10)
    rl = lgmres(A=op, b=b, tol=1e-8, max_iter=2000, k_dim=10, aug_dim=2)
    assert float(rl.relres) <= 1e-8
    assert int(rl.iters) < int(rg.iters), \
        f"LGMRES {int(rl.iters)} !< GMRES {int(rg.iters)}"


def test_flexgmres_varying_preconditioner():
    # FGMRES must converge with an iteration-VARYING preconditioner
    # (the defining FlexGMRES property, ref: flexgmres.c)
    import jax.numpy as jnp
    from hypre_tpu.solvers.krylov_more import flexgmres
    from hypre_tpu.ops import sparse_op_from_scipy, matvec

    A = laplacian(16, 16)
    op = sparse_op_from_scipy(A)
    dinv = jnp.asarray(1.0 / A.diagonal())

    def varying_M(r):
        # damping depends on the INPUT at runtime, so M is a genuinely
        # different operator on every Arnoldi step (traced data-dep)
        w = 1.0 + 0.4 * jnp.tanh(jnp.sum(r) * 1e3)
        return w * (dinv * r)

    b = np.random.RandomState(5).rand(A.shape[0])
    res = flexgmres(A=op, b=b, M=varying_M, tol=1e-8, max_iter=600,
                    k_dim=10)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_pcg_chunked_matches_while_loop():
    # the TPU path (_pcg_sparse_chunked: predicated fori chunks with
    # host convergence checks) must be bit-for-bit the while_loop
    # semantics, including iteration counts, for any chunk schedule
    from hypre_tpu.solvers import pcg
    from hypre_tpu.solvers.krylov import _pcg_sparse_chunked

    A = laplacian(20, 20, 20)
    amg = BoomerAMG(AmgConfig(interp_type=6, relax_type=18)).setup(A)
    op = sparse_op_from_scipy(A)
    b = np.ones(A.shape[0])
    ref = pcg(A=op, b=b, M=amg, tol=1e-8, max_iter=100)
    for k0, k in ((20, 8), (3, 4), (1, 1)):
        res = _pcg_sparse_chunked(op, amg.hierarchy, np.asarray(b),
                                  np.zeros_like(b), 1e-8, 0.0, 100,
                                  True, k0=k0, k=k)
        assert int(res.iters) == int(ref.iters), (k0, k)
        assert np.isclose(float(res.relres), float(ref.relres),
                          rtol=1e-10), (k0, k)
        assert np.allclose(np.asarray(res.x), np.asarray(ref.x),
                           rtol=0, atol=0), (k0, k)
