"""Two-stage aggressive interpolation (agg_interp 5/7)."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen.laplace import laplacian, stencil_matrix
from hypre_tpu.setup.coarsen import C_PT, pmis
from hypre_tpu.setup.interp import _entries_in_pattern
from hypre_tpu.setup.interp_2s import (
    NEW_F, correct_cf_marked, mod_ext_interp, mod_partial_ext_interp,
    two_stage_interp,
)
from hypre_tpu.setup.strength import strength_matrix
from hypre_tpu.setup.utils import expand_rows


def _setup(n=6):
    A = laplacian(n, n, 1)
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    cf = pmis(S)
    return A, S, mask, cf


def _dense_mod_ext_row(A, mask, cf, i):
    """Independent dense evaluation of the ModExt formula for row i:
    P[i,c] = -[a_ic + sum_k a_ik a_kc/q_k] / w_i (module docstring)."""
    Ad = A.toarray()
    n = A.shape[0]
    rows = expand_rows(A.indptr)
    strong = np.zeros_like(Ad, dtype=bool)
    strong[rows[mask], A.indices[mask]] = True
    np.fill_diagonal(strong, False)
    is_c = cf == C_PT
    q = np.array([Ad[k][strong[k] & is_c].sum() for k in range(n)])
    w_i = Ad[i].sum() - Ad[i][strong[i] & ~is_c].sum() \
        - Ad[i][strong[i] & is_c].sum()
    out = np.zeros(n)
    for c in np.flatnonzero(is_c):
        v = Ad[i, c] if strong[i, c] else 0.0
        for k in np.flatnonzero(strong[i] & ~is_c):
            if q[k] != 0:
                vc = Ad[k, c] if strong[k, c] and is_c[c] else 0.0
                v += Ad[i, k] * vc / q[k]
        out[c] = -v / w_i if w_i != 0 else v
    return out


def test_mod_ext_matches_dense_formula():
    A, S, mask, cf = _setup(6)
    P = mod_ext_interp(A, S, cf, mask, variant="ext")
    is_c = cf == C_PT
    cmap = np.cumsum(is_c) - 1
    Pd = P.toarray()
    f_rows = np.flatnonzero(~is_c)[:6]
    for i in f_rows:
        ref = _dense_mod_ext_row(A, mask, cf, i)
        got = np.zeros(A.shape[0])
        got[np.flatnonzero(is_c)] = Pd[i]
        assert np.allclose(got, ref, atol=1e-12), i
    # C rows identity
    for c in np.flatnonzero(is_c)[:4]:
        row = np.zeros(int(is_c.sum()))
        row[cmap[c]] = 1.0
        assert np.allclose(Pd[c], row)


def test_correct_cf_marked_partitions_c1():
    A, S, mask, cf1 = _setup(8)
    cf_m = correct_cf_marked(S, cf1)
    c1 = cf1 == C_PT
    # every old C point is now C or NEW_F; F/SF unchanged
    assert np.all(np.isin(cf_m[c1], [C_PT, NEW_F]))
    assert np.array_equal(cf_m[~c1], cf1[~c1])
    assert (cf_m == C_PT).sum() < c1.sum()


def test_partial_interp_shapes_and_identity():
    A, S, mask, cf1 = _setup(8)
    cf_m = correct_cf_marked(S, cf1)
    P2 = mod_partial_ext_interp(A, cf_m, mask, variant="ext")
    n_c1 = int(((cf_m == C_PT) | (cf_m == NEW_F)).sum())
    n_c2 = int((cf_m == C_PT).sum())
    assert P2.shape == (n_c1, n_c2)
    # rows of surviving C2 points are identity
    old_c = (cf_m == C_PT) | (cf_m == NEW_F)
    cmap1 = np.cumsum(old_c) - 1
    cmap2 = np.cumsum(cf_m == C_PT) - 1
    for g in np.flatnonzero(cf_m == C_PT)[:5]:
        r = P2.getrow(cmap1[g]).toarray().ravel()
        assert r[cmap2[g]] == 1.0 and np.count_nonzero(r) == 1


def test_two_stage_amg_converges():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    ents = [((dx, dy, dz), 26.0 if (dx, dy, dz) == (0, 0, 0) else -1.0)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    A = stencil_matrix((16, 16, 8), ents)
    b = np.ones(A.shape[0])
    for ait in (5, 7):
        cfg = AmgConfig(interp_type=6, relax_type=18,
                        agg_num_levels=1, agg_interp_type=ait,
                        agg_p12_max_elmts=4)
        amg = BoomerAMG(cfg).setup(A)
        res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8,
                  max_iter=60)
        assert float(res.relres) <= 1e-8
        assert int(res.iters) <= 30
        # aggressive coarsening actually engaged: second level far
        # smaller than standard PMIS coarsening would give (~n/4)
        assert amg.level_sizes[1] < A.shape[0] / 8
