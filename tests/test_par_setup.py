"""Distributed AMG setup: level-by-level equality vs the single-chip
device setup on the 8-device virtual CPU mesh.

The exit criterion from the round-3 review: an 8-shard setup that
never materializes a global level, whose hierarchy EQUALS the
single-chip one.  CF splits must match exactly (same pmis_hash32 on
global ids); operator entries match to fp tolerance (summation order
differs across shards)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hypre_tpu.gen.laplace import laplacian
from hypre_tpu.parallel.par_setup import (
    C_PT, ParDEll, build_level_comm, iter_par_hierarchy,
    par_spgemm, par_transpose, pardell_from_scipy, pardell_to_scipy,
)
from hypre_tpu.parallel.partition import GenPartition, RowPartition
from hypre_tpu.solvers.amg import AmgConfig


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("p",))


def _rand_sparse(n, m, density, seed, banded=True):
    rng = np.random.RandomState(seed)
    if banded:
        # banded random pattern (AMG operators are banded)
        bw = max(m // 4, 2)
        rows = np.repeat(np.arange(n), 3)
        cols = np.clip((rows * m) // n
                       + rng.randint(-bw, bw + 1, rows.shape), 0, m - 1)
        vals = rng.rand(rows.size) + 0.1
        A = sp.csr_matrix((vals, (rows, cols)), shape=(n, m))
    else:
        A = sp.random(n, m, density=density, random_state=rng,
                      format="csr")
    A.sum_duplicates()
    return A


def test_pardell_roundtrip():
    A = _rand_sparse(37, 53, 0.2, 0)
    part = RowPartition.create(37, 8)
    cpart = RowPartition.create(53, 8)
    M = pardell_from_scipy(A, part, cpart)
    B = pardell_to_scipy(M)
    assert (abs(A - B)).max() == 0


def test_par_transpose_matches_scipy():
    A = _rand_sparse(41, 29, 0.15, 1)
    part = RowPartition.create(41, 8)
    # unequal output partition exercises GenPartition
    cpart = GenPartition.create([5, 3, 6, 2, 4, 4, 3, 2])
    M = pardell_from_scipy(A, part, cpart)
    R = par_transpose(M, mesh8())
    Rs = pardell_to_scipy(R)
    err = abs(Rs - A.T.tocsr())
    assert err.nnz == 0 or err.max() < 1e-12


def test_par_spgemm_matches_scipy():
    A = _rand_sparse(40, 32, 0.15, 2)
    B = _rand_sparse(32, 24, 0.2, 3)
    pa = RowPartition.create(40, 8)
    pb = RowPartition.create(32, 8)
    pc = RowPartition.create(24, 8)
    X = pardell_from_scipy(A, pa, pb)
    Y = pardell_from_scipy(B, pb, pc)
    C = par_spgemm(X, Y, mesh8())
    Cs = pardell_to_scipy(C)
    ref = (A @ B).tocsr()
    assert np.allclose(Cs.toarray(), ref.toarray(), atol=1e-12)


@pytest.mark.parametrize("interp", [3, 6])
def test_par_hierarchy_matches_device(interp):
    """Distributed hierarchy == single-chip device hierarchy: same CF
    per level, same coarse sizes, same operators (tolerance)."""
    from hypre_tpu.setup import device_amg as dev

    n = 12
    A = laplacian(n, n, n)
    # 3 levels: the level loop's chunked device programs dominate the
    # suite wall (305 s at 4 levels); level-equality at 3 levels
    # exercises the same code paths
    cfg = AmgConfig(interp_type=interp, relax_type=18, max_levels=3)

    # single-chip device hierarchy (reference)
    Ad = dev.dell_from_scipy(A, np.float64)
    ref_levels = []
    ref_final = None
    for item in dev.iter_device_hierarchy(Ad, cfg):
        if isinstance(item, tuple):
            ref_levels.append(item)
        else:
            ref_final = item

    # distributed hierarchy
    part = RowPartition.create(A.shape[0], 8)
    Ap = pardell_from_scipy(A, part, real_dtype=np.float64)
    par_levels = []
    par_final = None
    for item in iter_par_hierarchy(Ap, cfg, mesh8()):
        if isinstance(item, tuple):
            par_levels.append(item)
        else:
            par_final = item

    assert len(par_levels) == len(ref_levels)
    for lvl, ((Ar, Pr, PTr, cfr), (Apar, Ppar, Rpar, cfp)) in enumerate(
            zip(ref_levels, par_levels)):
        # CF equality (global order)
        cf_ref = np.asarray(cfr)
        counts = np.minimum(
            np.diff(np.minimum(np.asarray(
                Apar.row_part.shard_starts()), Apar.row_part.n_global)),
            Apar.row_part.n_local)
        cf_par = np.concatenate(
            [np.asarray(cfp)[p, :counts[p]]
             for p in range(Apar.n_shards)])
        assert np.array_equal(cf_par, cf_ref), f"CF differs at L{lvl}"
        # operators (tolerance: cross-shard summation order)
        As = pardell_to_scipy(Apar)
        Aref = dev.dell_to_scipy(Ar)
        assert np.allclose(As.toarray(), Aref.toarray(), atol=1e-10), \
            f"A differs at L{lvl}"
        Ps = pardell_to_scipy(Ppar)
        Pref = dev.dell_to_scipy(Pr)
        assert Ps.shape == Pref.shape
        assert np.allclose(Ps.toarray(), Pref.toarray(), atol=1e-10), \
            f"P differs at L{lvl}"
        Rs = pardell_to_scipy(Rpar)
        assert np.allclose(Rs.toarray(), Pref.T.toarray(),
                           atol=1e-10), f"R differs at L{lvl}"
    # coarsest operator
    Afs = pardell_to_scipy(par_final)
    Aff = dev.dell_to_scipy(ref_final)
    assert np.allclose(Afs.toarray(), Aff.toarray(), atol=1e-9)


def test_setup_distributed_solve_matches_single_chip():
    """setup_distributed -> distributed PCG solve; iteration count
    matches the single-chip device-setup hierarchy (same CF by
    construction) within 1."""
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
    from hypre_tpu.solvers.par_amg import ParBoomerAMG

    n = 12
    A = laplacian(n, n, n)
    b = np.ones(A.shape[0])
    cfg = AmgConfig(interp_type=6, relax_type=18)

    par = ParBoomerAMG(mesh8(), cfg).setup_distributed(A)
    x, iters, relres = par.solve(b, method="pcg", tol=1e-8,
                                 max_iter=60)
    r = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r < 1e-7, r

    stencil = ((n, n, n),
               [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
                ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
                ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)])
    ref = BoomerAMG(cfg).setup_device(stencil=stencil)
    res = pcg(A=ref.hierarchy.levels[0].A, b=b, M=ref.hierarchy,
              tol=1e-8, max_iter=60)
    assert abs(int(iters) - int(res.iters)) <= 1, \
        (int(iters), int(res.iters))


def test_par_hierarchy_never_materializes_global():
    """Every stacked array's per-shard slice is O(n_local * width) —
    no shard-level buffer scales with the GLOBAL size."""
    n = 10
    A = laplacian(n, n, n)
    cfg = AmgConfig(interp_type=3, relax_type=18, max_levels=3)
    part = RowPartition.create(A.shape[0], 8)
    Ap = pardell_from_scipy(A, part, real_dtype=np.float64)
    for item in iter_par_hierarchy(Ap, cfg, mesh8()):
        if isinstance(item, tuple):
            Al = item[0]
            n_glob = Al.row_part.n_global
            per_shard = Al.cols.shape[1] * Al.cols.shape[2]
            # per-shard storage stays near n_local * width, far from
            # the global operator footprint.  Shard shapes are uniform
            # at the max LOCAL row count, and PMIS coarsening is not
            # perfectly balanced, so allow a 2x imbalance envelope —
            # still a shard-local footprint, nowhere near n_glob
            assert Al.cols.shape[2] <= 2 * -(-n_glob // 8)
            assert per_shard < n_glob * Al.cols.shape[1]
