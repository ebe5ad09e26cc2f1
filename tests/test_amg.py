"""End-to-end BoomerAMG + PCG convergence tests.

Golden expectations follow the reference's regression style (SURVEY §4):
iteration counts within a small tolerance of hypre's golden files
(TEST_ij/solvers.saved: AMG-PCG on the default 2D problem converges in
7 iterations to ~3e-9; DS-PCG in 41).
"""
import numpy as np

from hypre_tpu.gen import laplacian
from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg


def test_amg_standalone_converges():
    A = laplacian(32, 32)
    amg = BoomerAMG(AmgConfig()).setup(A)
    b = np.ones(A.shape[0])
    x, iters, relres = amg.solve(b, tol=1e-8, max_iter=120)
    assert float(relres) < 1e-8
    assert int(iters) < 100
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_amg_hierarchy_shape():
    A = laplacian(32, 32)
    amg = BoomerAMG(AmgConfig()).setup(A)
    assert amg.level_sizes[0] == 1024
    assert amg.level_sizes[-1] <= amg.config.max_coarse_size
    assert 1.0 < amg.operator_complexity < 3.5
    # sizes strictly decreasing
    assert all(a > b for a, b in zip(amg.level_sizes, amg.level_sizes[1:]))


def test_pcg_unpreconditioned():
    A = laplacian(16, 16)
    b = np.ones(A.shape[0])
    res = pcg(A=_op(A), b=b, tol=1e-8, max_iter=500)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7


def test_amg_pcg_matches_hypre_iteration_ballpark():
    # hypre golden: BoomerAMG-PCG on 2D 5-pt Laplacian converges in 7
    # iterations (TEST_ij/solvers.saved:1-3, np 2 on a ~n=33^2 grid
    # via -n defaults).  Allow a little slack for different coarsening
    # randomness; direct interp is slightly weaker than ext+i.
    A = laplacian(33, 33)
    amg = BoomerAMG(AmgConfig()).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=_op(A), b=b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8
    assert int(res.iters) <= 25, f"AMG-PCG took {int(res.iters)} iters"


def test_amg_pcg_3d():
    A = laplacian(12, 12, 12)
    amg = BoomerAMG(AmgConfig()).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=_op(A), b=b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8
    assert int(res.iters) <= 30


def _op(A):
    from hypre_tpu.ops.formats import sparse_op_from_scipy

    return sparse_op_from_scipy(A)


def test_amg_pcg_chebyshev():
    # Chebyshev smoother (relax 16, TEST_bench out.22 config family)
    A = laplacian(16, 16, 16)
    amg = BoomerAMG(AmgConfig(relax_type=16, interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=_op(A), b=b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8
    assert int(res.iters) <= 15, f"cheby AMG-PCG took {int(res.iters)}"


def test_amg_w_and_f_cycles():
    A = laplacian(24, 24)
    b = np.ones(A.shape[0])
    iters = {}
    for ct in ("V", "W", "F"):
        amg = BoomerAMG(AmgConfig(cycle_type=ct, max_levels=6)).setup(A)
        x, it, relres = amg.solve(b, tol=1e-8, max_iter=100)
        assert float(relres) < 1e-8
        iters[ct] = int(it)
    # W and F cycles must not be slower than V in iterations
    assert iters["W"] <= iters["V"]
    assert iters["F"] <= iters["V"]


def test_amg_two_stage_gs():
    A = laplacian(20, 20)
    b = np.ones(A.shape[0])
    amg = BoomerAMG(AmgConfig(relax_type=11)).setup(A)
    res = pcg(A=_op(A), b=b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8
    # two-stage GS should beat plain l1-Jacobi
    amg_j = BoomerAMG(AmgConfig(relax_type=18)).setup(A)
    res_j = pcg(A=_op(A), b=b, M=amg_j, tol=1e-8, max_iter=100)
    assert int(res.iters) <= int(res_j.iters) + 1


def test_amg_cf_relax_order():
    A = laplacian(20, 20)
    b = np.ones(A.shape[0])
    amg = BoomerAMG(AmgConfig(relax_order=1)).setup(A)
    res = pcg(A=_op(A), b=b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8


def test_aggressive_coarsening_cuts_complexity():
    A = laplacian(20, 20, 20)
    b = np.ones(A.shape[0])
    base = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    agg = BoomerAMG(AmgConfig(interp_type=6, agg_num_levels=1)).setup(A)
    # aggressive coarsening trades complexity for iterations
    assert agg.operator_complexity < base.operator_complexity * 0.7
    res = pcg(A=_op(A), b=b, M=agg, tol=1e-8, max_iter=200)
    assert float(res.relres) <= 1e-8
