"""Distributed-layer tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.gen import laplacian
from hypre_tpu.parallel import (
    ParCSR, par_matvec, parcsr_from_scipy, shard_vector, unshard_vector,
)
from hypre_tpu.parallel.partition import RowPartition
from hypre_tpu.solvers.amg import AmgConfig
from hypre_tpu.solvers.par_amg import ParBoomerAMG


def mesh8():
    devs = jax.devices()
    return Mesh(np.array(devs), ("p",))


def _dist_matvec(A_scipy, n_shards, x):
    mesh = mesh8()
    Ap = parcsr_from_scipy(A_scipy, n_shards)
    part = Ap.col_part
    x_sh = jax.device_put(shard_vector(x, part),
                          NamedSharding(mesh, P("p", None)))
    from hypre_tpu.solvers.par_amg import hierarchy_specs  # noqa: F401

    a_specs = jax.tree.map(lambda l: P("p", *([None] * (np.ndim(l) - 1))),
                           Ap)
    f = jax.jit(jax.shard_map(
        lambda A, v: par_matvec(A, v[0])[None, :],
        mesh=mesh, in_specs=(a_specs, P("p", None)),
        out_specs=P("p", None), check_vma=False))
    y = f(Ap, x_sh)
    return unshard_vector(y, Ap.row_part)


def test_par_matvec_square():
    A = laplacian(12, 12, 12)  # 1728 rows over 8 shards
    rng = np.random.RandomState(0)
    x = rng.randn(A.shape[0])
    y = _dist_matvec(A, 8, x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_par_matvec_unaligned_sizes():
    # n not divisible by 8 exercises the padding rows
    A = laplacian(13, 7)
    x = np.random.RandomState(1).randn(A.shape[0])
    y = _dist_matvec(A, 8, x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_par_matvec_rectangular():
    # random rectangular operator (like interpolation P)
    import scipy.sparse as sp

    rng = np.random.RandomState(2)
    Amat = sp.random(200, 77, density=0.05, random_state=rng, format="csr")
    x = rng.randn(77)
    mesh = mesh8()
    Ap = parcsr_from_scipy(Amat, 8)
    x_sh = jax.device_put(shard_vector(x, Ap.col_part),
                          NamedSharding(mesh, P("p", None)))
    a_specs = jax.tree.map(lambda l: P("p", *([None] * (np.ndim(l) - 1))),
                           Ap)
    f = jax.jit(jax.shard_map(
        lambda A, v: par_matvec(A, v[0])[None, :],
        mesh=mesh, in_specs=(a_specs, P("p", None)),
        out_specs=P("p", None), check_vma=False))
    y = unshard_vector(f(Ap, x_sh), Ap.row_part)
    np.testing.assert_allclose(y, Amat @ x, rtol=1e-12)


def test_par_amg_pcg_matches_single_chip():
    A = laplacian(16, 16, 16)
    b = np.ones(A.shape[0])
    mesh = mesh8()
    pamg = ParBoomerAMG(mesh, AmgConfig()).setup(A)
    x, iters, relres = pamg.solve_pcg(b, tol=1e-8, max_iter=200)
    assert relres <= 1e-8
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel < 1e-7

    # same problem single-chip: same hierarchy semantics -> identical
    # iteration count (deterministic PMIS hash)
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import BoomerAMG, pcg

    amg = BoomerAMG(AmgConfig()).setup(A)
    res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8, max_iter=200)
    assert int(res.iters) == iters


def _both_iters(cfg, method="pcg", n=(12, 12, 12), tol=1e-8, **kw):
    """Run distributed and single-chip with the same config; return
    (par_iters, seq_iters, par_relres)."""
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import BoomerAMG, pcg
    from hypre_tpu.solvers import krylov_more

    A = laplacian(*n)
    b = np.ones(A.shape[0])
    pamg = ParBoomerAMG(mesh8(), cfg).setup(A)
    x, it_p, rel_p = pamg.solve(b, method=method, tol=tol,
                                max_iter=300, **kw)
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel < 1e-6

    amg = BoomerAMG(cfg).setup(A)
    op = sparse_op_from_scipy(A)
    if method == "pcg":
        res = pcg(A=op, b=b, M=amg, tol=tol, max_iter=300)
    else:
        fn = getattr(krylov_more, method)
        h = amg.hierarchy
        from hypre_tpu.solvers.amg import amg_cycle
        res = fn(op, b, M=lambda r: amg_cycle(h, r), tol=tol,
                 max_iter=300, **kw)
    return it_p, int(res.iters), rel_p


def test_par_hybrid_gs_matches_single_chip():
    # hybrid l1-GS (relax 13): per-shard exact triangular solve.  The
    # single-chip run IS the 1-rank case, so counts differ slightly
    # (8 ranks lag the offd); both must converge, mesh path <= +4.
    cfg = AmgConfig(relax_type=13)
    it_p, it_s, rel = _both_iters(cfg)
    assert rel <= 1e-8
    assert it_p <= it_s + 4


def test_par_chebyshev_matches_single_chip():
    cfg = AmgConfig(relax_type=16)
    it_p, it_s, rel = _both_iters(cfg)
    assert rel <= 1e-8
    assert it_p == it_s   # Chebyshev is rank-count independent


def test_par_wcycle_matches_single_chip():
    cfg = AmgConfig(cycle_type="W")
    it_p, it_s, rel = _both_iters(cfg)
    assert rel <= 1e-8
    assert it_p == it_s


def test_par_gmres_matches_single_chip():
    cfg = AmgConfig()
    it_p, it_s, rel = _both_iters(cfg, method="gmres")
    assert rel <= 1e-8
    assert it_p == it_s


def test_par_bicgstab_matches_single_chip():
    cfg = AmgConfig()
    it_p, it_s, rel = _both_iters(cfg, method="bicgstab")
    assert rel <= 1e-8
    assert it_p == it_s


def test_par_cf_relax_order():
    cfg = AmgConfig(relax_order=1)
    it_p, it_s, rel = _both_iters(cfg)
    assert rel <= 1e-8
    assert it_p == it_s


def test_par_stencil_fine_level():
    """Matrix-free ParStencilOp fine level (the packed-format dispatch
    for the multi-chip solve, VERDICT r4 item 3): matvec matches the
    stored operator and the AMG-PCG iteration count is identical to
    the stored-ELL fine level."""
    from hypre_tpu.parallel.parcsr import ParStencilOp, par_stencil_matvec

    nx, ny, nz = 16, 16, 8
    ST = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
          ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
          ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]
    A = laplacian(nx, ny, nz)
    n = A.shape[0]
    part = RowPartition.create(n, 8)
    op = ParStencilOp(shape=(nx, ny, nz), arms=tuple(
        (tuple(d), v) for d, v in ST), n_local=part.n_local, n_shards=8)
    assert op.maxdisp <= part.n_local
    mesh = mesh8()
    x = np.random.RandomState(3).randn(n)
    x_sh = jax.device_put(shard_vector(x, part),
                          NamedSharding(mesh, P("p", None)))
    f = jax.jit(jax.shard_map(
        lambda v: par_stencil_matvec(op, v[0])[None, :],
        mesh=mesh, in_specs=(P("p", None),),
        out_specs=P("p", None), check_vma=False))
    y = unshard_vector(f(x_sh), part)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)

    # full AMG-PCG: stencil fine level == stored fine level iterations
    b = np.ones(n)
    pam_st = ParBoomerAMG(mesh8(), AmgConfig()).setup(
        A, fine_stencil=((nx, ny, nz), ST))
    assert pam_st.hierarchy.levels[0].stencil is not None
    x1, it1, _ = pam_st.solve_pcg(b, tol=1e-8, max_iter=200)
    pam = ParBoomerAMG(mesh8(), AmgConfig()).setup(A)
    x2, it2, _ = pam.solve_pcg(b, tol=1e-8, max_iter=200)
    assert it1 == it2
    np.testing.assert_allclose(x1, x2, rtol=1e-8, atol=1e-10)


def test_par_stencil_distributed_setup():
    """fine_stencil through the DISTRIBUTED setup path too."""
    ST = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
          ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
          ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]
    nx = ny = nz = 12
    A = laplacian(nx, ny, nz)
    b = np.ones(A.shape[0])
    cfg = AmgConfig(interp_type=6, relax_type=18, max_levels=4)
    pam = ParBoomerAMG(mesh8(), cfg).setup_distributed(
        A, fine_stencil=((nx, ny, nz), ST))
    assert pam.hierarchy.levels[0].stencil is not None
    x, iters, rel = pam.solve_pcg(b, tol=1e-8, max_iter=200)
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel < 1e-7
