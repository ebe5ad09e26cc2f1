"""Systems AMG (num_functions > 1): nodal coarsening, unknown-based
interpolation, and the block-ELL format."""
import numpy as np
import scipy.sparse as sp

import jax

from hypre_tpu.gen.laplace import laplacian
from hypre_tpu.ops.block_ell import (
    block_diag_inv, block_ell_from_scipy, block_jacobi, block_matmat,
    block_matvec,
)
from hypre_tpu.setup.coarsen import C_PT
from hypre_tpu.setup.systems import (
    default_dof_func, expand_node_cf, nodal_matrix,
)
from hypre_tpu.setup.strength import strength_matrix


def _coupled_system(n, nf=2, eps=0.1, seed=3):
    """nf coupled Laplacians, interleaved: block diag = L (+ small
    symmetric cross coupling)."""
    L = laplacian(n, n, 1).tocoo()
    nn = L.shape[0]
    rows, cols, vals = [], [], []
    for f in range(nf):
        rows.append(L.row * nf + f)
        cols.append(L.col * nf + f)
        vals.append(L.data)
    # cross-coupling on the node diagonal (keeps SPD for small eps)
    for f in range(nf):
        for g in range(nf):
            if f != g:
                rows.append(np.arange(nn) * nf + f)
                cols.append(np.arange(nn) * nf + g)
                vals.append(np.full(nn, eps))
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(nn * nf, nn * nf))
    A.sum_duplicates()
    return A


def test_nodal_matrix_norms():
    A = _coupled_system(6, nf=2, eps=0.05)
    nn = A.shape[0] // 2
    for mode in (1, 2, 3, 4, 6):
        AN = nodal_matrix(A, 2, mode=mode)
        assert AN.shape == (nn, nn)
        blk = A[:2, :2].toarray()
        v = AN[0, 0]
        if mode == 1:
            assert np.isclose(v, np.sqrt((blk ** 2).sum()))
        elif mode == 2:
            assert np.isclose(v, np.abs(blk).sum() / 4)
        elif mode == 3:
            assert np.isclose(v, blk.ravel()[np.argmax(np.abs(blk))])
        elif mode == 4:
            assert np.isclose(v, np.abs(blk).sum(axis=1).max())
        elif mode == 6:
            assert np.isclose(v, blk.sum())
    # diag options
    AN1 = nodal_matrix(A, 2, mode=2, diag_option=1)
    offd = AN1.copy()
    offd.setdiag(0)
    assert np.allclose(AN1.diagonal(),
                       -np.asarray(offd.sum(axis=1)).ravel())


def test_unknown_strength_never_crosses_functions():
    A = _coupled_system(8, nf=2, eps=0.3)
    dof = default_dof_func(A.shape[0], 2)
    S = strength_matrix(A, 0.25, 0.9, dof_func=dof)
    Sc = S.tocoo()
    assert np.all(dof[Sc.row] == dof[Sc.col])


def test_nodal_cf_constant_per_node():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hypre_tpu.solvers import AmgConfig
    from hypre_tpu.solvers.amg import iter_host_hierarchy

    A = _coupled_system(10, nf=2, eps=0.1)
    cfg = AmgConfig(interp_type=3, relax_type=18, num_functions=2,
                    nodal=4, nodal_diag=0, max_levels=3)
    for item in iter_host_hierarchy(A, cfg):
        if isinstance(item, tuple):
            cf = item[3]
            assert np.array_equal(cf[0::2], cf[1::2])
            break


def test_systems_amg_converges():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    A = _coupled_system(16, nf=3, eps=0.1)
    b = np.ones(A.shape[0])
    for nodal in (0, 4):
        cfg = AmgConfig(interp_type=6, relax_type=18, num_functions=3,
                        nodal=nodal)
        amg = BoomerAMG(cfg).setup(A)
        res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8,
                  max_iter=80)
        assert float(res.relres) <= 1e-8, nodal
        assert int(res.iters) <= 40, (nodal, int(res.iters))


def test_block_ell_matvec_matches_scipy():
    A = _coupled_system(7, nf=3, eps=0.2)
    B = block_ell_from_scipy(A, 3, np.float64)
    x = np.random.RandomState(0).rand(A.shape[1])
    y = np.asarray(block_matvec(B, jax.numpy.asarray(x)))
    assert np.allclose(y, A @ x, atol=1e-12)
    X = np.random.RandomState(1).rand(A.shape[1], 4)
    Y = np.asarray(block_matmat(B, jax.numpy.asarray(X)))
    assert np.allclose(Y, A @ X, atol=1e-12)


def test_block_jacobi_smooths():
    A = _coupled_system(8, nf=2, eps=0.1)
    B = block_ell_from_scipy(A, 2, np.float64)
    dinv = block_diag_inv(B)
    b = np.ones(A.shape[0])
    u = block_jacobi(B, dinv, jax.numpy.asarray(b), weight=0.8,
                     sweeps=30)
    r0 = np.linalg.norm(b)
    r = np.linalg.norm(b - A @ np.asarray(u))
    assert r < 0.5 * r0


def test_nodal_hierarchy_is_multilevel():
    # regression: the nodal norm matrix is all-positive, so its
    # strength must be the ABS variant (CreateSabs,
    # par_amg_setup.c:1123) — with signed strength SN came out empty
    # and the hierarchy silently collapsed to one level
    import numpy as np
    import scipy.sparse as sp

    from hypre_tpu.gen import laplacian
    from hypre_tpu.solvers import AmgConfig, BoomerAMG

    L = laplacian(20, 20).tocsr()
    N = L.shape[0]
    A = sp.bmat([[L, None], [None, L]], format="csr")
    perm = np.arange(2 * N).reshape(2, N).T.ravel()
    A = A[perm][:, perm].tocsr()
    amg = BoomerAMG(AmgConfig(interp_type=6, num_functions=2,
                              nodal=1)).setup(A)
    assert len(amg.hierarchy.levels) >= 3
