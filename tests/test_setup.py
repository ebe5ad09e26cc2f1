"""AMG setup-phase tests: strength, PMIS, interpolation, l1 norms."""
import numpy as np
import scipy.sparse as sp

from hypre_tpu.gen import laplacian
from hypre_tpu.setup import (
    C_PT, F_PT, SF_PT, direct_interp, l1_norms, pmis, strength_matrix,
    truncate_interp,
)


def test_strength_laplacian_all_strong():
    # uniform 2D Laplacian: all off-diagonal entries are equally strong
    A = laplacian(10, 10)
    S = strength_matrix(A, theta=0.25)
    offd_nnz = A.nnz - A.shape[0]
    assert S.nnz == offd_nnz


def test_strength_anisotropic():
    # cx >> cy: only x-neighbors are strong at theta=0.25
    A = laplacian(10, 10, cx=1.0, cy=0.001)
    S = strength_matrix(A, theta=0.25)
    n = 10
    for i in [n + 1, 5 * n + 4]:  # interior points
        row = S.indices[S.indptr[i]:S.indptr[i + 1]]
        assert set(row) == {i - 1, i + 1}


def test_strength_max_row_sum():
    # a strongly diagonally-dominant row gets no strong connections
    # row 0: |row_sum| = 28 > 0.9 * 30 -> all weak
    A = sp.csr_matrix(np.array([
        [30.0, -1.0, -1.0],
        [-1.0, 2.0, -1.0],
        [-1.0, -1.0, 2.0]]))
    S = strength_matrix(A, theta=0.25, max_row_sum=0.9)
    assert S.indptr[1] - S.indptr[0] == 0  # row 0 weak-all
    assert S.indptr[2] - S.indptr[1] == 2


def test_pmis_valid_splitting():
    A = laplacian(20, 20)
    S = strength_matrix(A)
    cf = pmis(S)
    assert set(np.unique(cf)) <= {C_PT, F_PT, SF_PT}
    # every F point must have a strong C neighbor
    Sc = S.tocsr()
    for i in np.flatnonzero(cf == F_PT):
        nbrs = Sc.indices[Sc.indptr[i]:Sc.indptr[i + 1]]
        assert (cf[nbrs] == C_PT).any(), f"F point {i} has no C neighbor"
    # no two strong-adjacent C points share an edge in S∪S^T only if
    # one knocked the other out -- PMIS guarantees an independent set
    # w.r.t. the strength graph at selection time; C-C adjacency can
    # appear across rounds, so we only check coverage here.


def test_pmis_isolated_rows():
    A = sp.identity(6, format="csr")
    S = strength_matrix(A)
    cf = pmis(S)
    assert (cf == SF_PT).all()


def test_pmis_deterministic():
    A = laplacian(15, 15)
    S = strength_matrix(A)
    assert np.array_equal(pmis(S), pmis(S))


def test_direct_interp_rowsums():
    # For the Laplacian with zero row sums at interior points, direct
    # interpolation rows of interior F points sum to 1.
    A = laplacian(12, 12)
    S = strength_matrix(A)
    cf = pmis(S)
    P = direct_interp(A, S, cf, max_elmts=0)
    n_coarse = int((cf == C_PT).sum())
    assert P.shape == (A.shape[0], n_coarse)
    rs = np.asarray(P.sum(axis=1)).ravel()
    # C rows are exactly 1
    np.testing.assert_allclose(rs[cf == C_PT], 1.0)
    # interior F rows: with zero row sum, sum_N/sum_P scaling gives 1
    interior = np.zeros(A.shape[0], dtype=bool)
    interior.reshape(12, 12)[1:-1, 1:-1] = True
    f_int = (cf == F_PT) & interior
    np.testing.assert_allclose(rs[f_int], 1.0, rtol=1e-12)


def test_truncation_preserves_row_sums():
    rng = np.random.RandomState(0)
    P = sp.random(50, 20, density=0.4, random_state=rng, format="csr")
    Pt = truncate_interp(P, trunc_factor=0.1, max_elmts=3)
    np.testing.assert_allclose(
        np.asarray(Pt.sum(axis=1)).ravel(),
        np.asarray(P.sum(axis=1)).ravel(), rtol=1e-10)
    assert (np.diff(Pt.indptr) <= 3).all()


def test_l1_norms():
    A = laplacian(8, 8)
    d1 = l1_norms(A, option=1)
    # interior row: |4| + 4*1 = 8
    interior = np.zeros(64, dtype=bool)
    interior.reshape(8, 8)[1:-1, 1:-1] = True
    np.testing.assert_allclose(d1[interior], 8.0)
    d5 = l1_norms(A, option=5)
    np.testing.assert_allclose(d5, 4.0)


def test_hmis_valid_splitting():
    from hypre_tpu.setup.coarsen import hmis

    A = laplacian(20, 20)
    S = strength_matrix(A)
    cf = hmis(S)
    assert set(np.unique(cf)) <= {C_PT, F_PT, SF_PT}
    Sc = S.tocsr()
    STc = S.T.tocsr()
    for i in np.flatnonzero(cf == F_PT):
        nbrs = np.concatenate([
            Sc.indices[Sc.indptr[i]:Sc.indptr[i + 1]],
            STc.indices[STc.indptr[i]:STc.indptr[i + 1]]])
        assert (cf[nbrs] == C_PT).any(), f"F point {i} isolated from C"


def test_hmis_amg_converges():
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
    from hypre_tpu.ops import sparse_op_from_scipy

    A = laplacian(24, 24)
    amg = BoomerAMG(AmgConfig(coarsen_type="hmis",
                              interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=100)
    assert float(res.relres) <= 1e-8
    assert int(res.iters) <= 15


def test_rotate_7pt_and_vardifconv():
    from hypre_tpu.gen import rotate_7pt, vardifconv
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, gmres, pcg

    A = rotate_7pt(24, 24, alpha_deg=60.0, eps=0.01)
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = gmres(sparse_op_from_scipy(A), b, M=amg, tol=1e-8, max_iter=300)
    rel = np.linalg.norm(b - A @ np.asarray(res.x)) / np.linalg.norm(b)
    assert rel < 1e-6

    Av = vardifconv(12, 12, 12, contrast=1e4)
    assert abs((Av - Av.T)).max() < 1e-10
    amg = BoomerAMG(AmgConfig(interp_type=6)).setup(Av)
    res = pcg(sparse_op_from_scipy(Av), np.ones(Av.shape[0]), M=amg,
              tol=1e-8, max_iter=200)
    rel = (np.linalg.norm(np.ones(Av.shape[0]) - Av @ np.asarray(res.x))
           / np.sqrt(Av.shape[0]))
    assert rel < 1e-6


def test_sabs_strength():
    from hypre_tpu.gen import rotate_7pt

    # rotated operator has positive off-diagonals; abs-SoC catches them
    A = rotate_7pt(16, 16, alpha_deg=45.0, eps=0.01)
    S_cls = strength_matrix(A, theta=0.25)
    S_abs = strength_matrix(A, theta=0.25, abs_soc=True)
    assert S_abs.nnz >= S_cls.nnz


def test_lr_interp_native_python_parity():
    # classical (0) / extended (14) / standard (8, 9) native kernel vs
    # the per-row python twin (ref: par_interp.c:15, par_lr_interp.c:22,
    # :4777)
    import numpy as np

    from hypre_tpu.csrc import build as native
    from hypre_tpu.gen import laplacian
    from hypre_tpu.setup.coarsen import pmis
    from hypre_tpu.setup.interp_more import _lr_interp_py
    from hypre_tpu.setup.strength import strength_matrix

    A = laplacian(10, 10, 10).tocsr()
    A.sort_indices()
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    cf = pmis(S)
    cmap = np.cumsum(cf == 1) - 1
    for variant in (0, 14, 8, 9):
        Pn = native.lr_interp(A, mask, cf, cmap, variant)
        Pp = _lr_interp_py(A, mask, cf, cmap, variant)
        assert Pn.shape == Pp.shape
        assert np.abs((Pn - Pp).toarray()).max() < 1e-12


def test_lr_interp_patterns_nest():
    # classical is distance-1; extended/standard share the distance-2
    # pattern of ext+i
    import numpy as np

    from hypre_tpu.csrc import build as native
    from hypre_tpu.gen import laplacian
    from hypre_tpu.setup.coarsen import pmis
    from hypre_tpu.setup.strength import strength_matrix

    A = laplacian(12, 12, 12).tocsr()
    A.sort_indices()
    S, mask = strength_matrix(A, 0.25, 0.9, return_mask=True)
    cf = pmis(S)
    cmap = np.cumsum(cf == 1) - 1
    P0 = native.lr_interp(A, mask, cf, cmap, 0)
    P14 = native.lr_interp(A, mask, cf, cmap, 14)
    P8 = native.lr_interp(A, mask, cf, cmap, 8)
    assert P0.nnz <= P14.nnz
    assert (P14 != 0).multiply(P8 != 0).nnz == P8.nnz  # same pattern
    # classical rows interpolate constants exactly on interior rows of
    # a zero-row-sum operator region: row sums near 1 for F rows with
    # all-strong C neighborhoods is not guaranteed globally; just check
    # finite + nonzero
    assert np.isfinite(P0.data).all() and np.isfinite(P8.data).all()


def test_cljp_falgout_ruge_valid_splittings():
    # CLJP (par_coarsen.c:93), Falgout (:2062 = RS + seeded CLJP),
    # Ruge (:911 + :1400 second pass): valid C/F splittings where every
    # F point keeps a strong C neighbor
    import numpy as np

    from hypre_tpu.gen import laplacian
    from hypre_tpu.setup.coarsen import C_PT, F_PT, cljp, falgout, ruge
    from hypre_tpu.setup.strength import strength_matrix

    A = laplacian(20, 20).tocsr()
    S = strength_matrix(A).tocsr()
    for fn in (cljp, falgout, ruge):
        cf = fn(S)
        assert (cf == C_PT).sum() > 0
        for i in np.flatnonzero(cf == F_PT):
            nbrs = S.indices[S.indptr[i]:S.indptr[i + 1]]
            assert (cf[nbrs] == C_PT).any(), (fn.__name__, i)


def test_ruge_second_pass_enforces_common_c():
    # after the second pass, every strong F-F pair shares a common C
    # in the union of their strong C sets as seen from the F row
    import numpy as np

    from hypre_tpu.gen import laplacian
    from hypre_tpu.setup.coarsen import C_PT, F_PT, ruge
    from hypre_tpu.setup.strength import strength_matrix

    A = laplacian(16, 16, 16).tocsr()
    S = strength_matrix(A).tocsr()
    cf = ruge(S)
    for i in np.flatnonzero(cf == F_PT):
        ci = set(S.indices[S.indptr[i]:S.indptr[i + 1]][
            cf[S.indices[S.indptr[i]:S.indptr[i + 1]]] == C_PT])
        for j in S.indices[S.indptr[i]:S.indptr[i + 1]]:
            if cf[j] != F_PT:
                continue
            cj = set(S.indices[S.indptr[j]:S.indptr[j + 1]][
                cf[S.indices[S.indptr[j]:S.indptr[j + 1]]] == C_PT])
            assert ci & cj, (i, j)


def test_cgc_valid_splitting_and_converges():
    # CGC (par_cgc_coarsen.c:645): multi-candidate subdomain RS grids
    # with compatibility-scored choice — the result must be a valid
    # splitting (F points keep a strong C neighbor) and drive AMG to
    # convergence
    import numpy as np

    from hypre_tpu.gen import laplacian
    from hypre_tpu.setup.coarsen import C_PT, F_PT, cgc
    from hypre_tpu.setup.strength import strength_matrix
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
    from hypre_tpu.ops import sparse_op_from_scipy

    A = laplacian(24, 24).tocsr()
    S = strength_matrix(A).tocsr()
    cf = cgc(S, nparts=4, num_grids=2)
    assert (cf == C_PT).sum() > 0
    for i in np.flatnonzero(cf == F_PT):
        nbrs = S.indices[S.indptr[i]:S.indptr[i + 1]]
        assert (cf[nbrs] == C_PT).any(), i

    amg = BoomerAMG(AmgConfig(coarsen_type="cgc",
                              interp_type=6)).setup(A)
    b = np.ones(A.shape[0])
    res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8,
              max_iter=60)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) < 30
