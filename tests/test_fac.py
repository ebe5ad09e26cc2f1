"""FAC composite-grid AMR solver."""
import numpy as np
import scipy.sparse as sp

import jax

from hypre_tpu.struct.fac import FAC, FacConfig
from hypre_tpu.struct.grid import struct_matrix_from_stencil

L5 = [((0, 0, 0), 4.0), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0),
      ((0, -1, 0), -1.0), ((0, 1, 0), -1.0)]


def _pair():
    Ac = struct_matrix_from_stencil((1, 32, 32), L5)
    fine_entries = [(o, 4.0 * v) for o, v in L5]
    return FAC(Ac, fine_entries, (0, 8, 8), (1, 24, 24), FacConfig())


def test_composite_matrix_structure():
    fac = _pair()
    A = fac.A_comp
    n_cout = fac.n_cout
    assert A.shape[0] == n_cout + 32 * 32
    # interface: a coarse row adjacent to the patch couples to fine
    # children; a boundary fine row couples back to a coarse cell
    C = A.tocoo()
    c2f = ((C.row < n_cout) & (C.col >= n_cout)).sum()
    f2c = ((C.row >= n_cout) & (C.col < n_cout)).sum()
    assert c2f > 0 and f2c > 0
    # every row sums >= 0 (M-matrix-ish composite Laplacian)
    rs = np.asarray(A.sum(axis=1)).ravel()
    assert rs.min() > -1e-12


def test_fac_cycle_converges():
    fac = _pair()
    b = fac.composite_rhs(np.ones((1, 32, 32)), np.ones((1, 32, 32)))
    x, it, rel = fac.solve(b, tol=1e-6, max_iter=80)
    assert rel <= 1e-6, rel
    # matches the direct composite solve
    x_ref = sp.linalg.spsolve(fac.A_comp.tocsc(), b)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-4


def test_fac_preconditioned_gmres():
    from scipy.sparse.linalg import LinearOperator, gmres as sp_gmres

    fac = _pair()
    b = fac.composite_rhs(np.ones((1, 32, 32)),
                          np.ones((1, 32, 32)) * 2.0)
    A = fac.A_comp
    n = A.shape[0]
    its = {"k": 0}

    def M(r):
        return fac.cycle(np.asarray(r), np.zeros(n))

    def cb(_):
        its["k"] += 1

    x, info = sp_gmres(A, b, M=LinearOperator((n, n), matvec=M),
                       rtol=1e-9, maxiter=60, callback=cb,
                       callback_type="pr_norm")
    assert info == 0
    r = b - A @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
    assert its["k"] <= 30, its
