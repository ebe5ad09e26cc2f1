"""GST-ELL format tests (reference semantics on CPU; the Pallas kernel
itself is exercised on TPU by bench.py / the drivers)."""
import numpy as np
import pytest
import scipy.sparse as sp

from hypre_tpu.gen import laplacian, laplacian_27pt
from hypre_tpu.ops.gstell import (
    gstell_from_scipy, gstell_matvec_reference,
)


def check(M, rtol=1e-12):
    B = gstell_from_scipy(M)
    assert B is not None, "expected GST-ELL to accept this matrix"
    x = np.random.RandomState(0).randn(M.shape[1])
    y = np.asarray(gstell_matvec_reference(B, x))
    np.testing.assert_allclose(y, M @ x, rtol=rtol, atol=1e-10)
    return B


def test_laplacian_7pt():
    B = check(laplacian(16, 16, 16))
    # gap auto-tuning favors low padding over narrow windows
    assert B.vals.size <= 2.5 * B.nnz
    assert B.c <= 8


def test_laplacian_27pt():
    check(laplacian_27pt(10, 10, 10))


def test_rectangular_interp_like():
    # banded rectangular operator (fine -> coarse)
    A = laplacian(20, 20)
    from hypre_tpu.setup import direct_interp, pmis, strength_matrix

    S = strength_matrix(A)
    cf = pmis(S)
    P = direct_interp(A, S, cf)
    check(P)
    check(P.T.tocsr())


def test_amg_level_matrices():
    from hypre_tpu.solvers.amg import AmgConfig, build_host_hierarchy

    A = laplacian(24, 24, 24)
    levels, Ac = build_host_hierarchy(A, AmgConfig())
    for Al, Pl, Rl, _cf in levels:
        check(Al)


def test_random_matrix_rejected():
    rng = np.random.RandomState(1)
    n, nnz = 200000, 2_000_000
    rows = rng.randint(0, n, nnz)
    cols = rng.randint(0, n, nnz)
    R = sp.coo_matrix((rng.randn(nnz), (rows, cols)),
                      shape=(n, n)).tocsr()
    assert gstell_from_scipy(R) is None  # not banded -> fallback


def test_empty_rows_ok():
    A = sp.lil_matrix((300, 300))
    A[0, 0] = 2.0
    A[299, 298] = -1.0
    A[150, 150] = 1.5
    B = gstell_from_scipy(A.tocsr())
    x = np.random.RandomState(2).randn(300)
    y = np.asarray(gstell_matvec_reference(B, x))
    np.testing.assert_allclose(y, A.tocsr() @ x, rtol=1e-12)


def test_gstell_aligned_pack_matches_scipy():
    # 128-aligned cluster mode: c == 1 by construction, one gather per
    # group; must agree with scipy on stencil and scattered matrices
    import numpy as np
    import scipy.sparse as sp

    import hypre_tpu.ops.gstell as g
    from hypre_tpu.gen.laplace import laplacian

    rng = np.random.default_rng(0)
    mats = [laplacian(12, 12, 12),
            sp.random(3000, 3000, density=0.003, random_state=1,
                      format="csr") + sp.eye(3000),
            sp.random(2000, 700, density=0.01, random_state=2,
                      format="csr")]
    for A in mats:
        A = A.tocsr().astype(np.float32)
        for pack in (lambda M: g._gstell_pack(M, np.float32,
                                              aligned=True),
                     lambda M: g._gstell_pack_native(M, np.float32, -1)):
            m = pack(A)
            assert m is not None and m.c == 1
            x = rng.standard_normal(A.shape[1]).astype(np.float32)
            y = np.asarray(g.gstell_matvec_reference(m, x))
            yref = A @ x
            assert np.abs(y - yref).max() <= 1e-5 * np.abs(yref).max()
            if not m.resident:
                y2 = np.asarray(g.gstell_matvec_reference_windowed(m, x))
                assert np.abs(y2 - yref).max() \
                    <= 1e-5 * np.abs(yref).max()


def test_stencil_op_reference_matches_scipy():
    import numpy as np

    from hypre_tpu.gen.laplace import laplacian
    from hypre_tpu.ops.formats import matvec
    from hypre_tpu.ops.stencil_pallas import stencil_op

    ENTS = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
            ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
            ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]
    for dims in [(8, 8, 8), (16, 8, 4)]:
        A = laplacian(*dims).astype(np.float32)
        op = stencil_op(dims, ENTS)
        assert op.nnz == A.nnz and op.shape == A.shape
        x = np.random.default_rng(1).standard_normal(A.shape[0]) \
            .astype(np.float32)
        y = np.asarray(matvec(op, x))
        assert np.abs(y - A @ x).max() < 1e-4


def test_pcg_accepts_stencil_op():
    # the fine operator may be a StencilOp (analytic stencil); the PCG
    # compiled path must treat it as a SparseOp
    import numpy as np

    from hypre_tpu.gen.laplace import laplacian
    from hypre_tpu.ops.stencil_pallas import stencil_op
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    ENTS = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
            ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
            ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]
    A = laplacian(16, 16, 16)
    amg = BoomerAMG(AmgConfig(interp_type=6, relax_type=18)).setup(A)
    op = stencil_op((16, 16, 16), ENTS)
    b = np.ones(A.shape[0])
    res = pcg(A=op, b=b, M=amg, tol=1e-8, max_iter=60)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6
