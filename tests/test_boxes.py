"""Multi-box grids, box algebra, BoxManager, periodic wrap
(ref: hypre struct_mv/box_algebra.c, struct_grid.h, box_manager.c)."""
import numpy as np

from hypre_tpu.struct.boxes import Box, BoxArray, BoxManager, StructGrid
from hypre_tpu.struct.grid import struct_matvec
from hypre_tpu.struct.pfmg import PFMG, PfmgConfig

LAP7 = [((0, 0, 0), 6.0), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0),
        ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
        ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0)]


def test_box_algebra_volumes():
    a = Box((0, 0, 0), (7, 7, 7))       # 512
    b = Box((4, 4, 4), (11, 11, 11))    # 512, overlap 4^3=64
    iv = a.intersect(b)
    assert iv.volume == 64
    frags = a.subtract(b)
    assert sum(f.volume for f in frags) == 512 - 64
    # disjointness
    for i, f in enumerate(frags):
        for g in frags[i + 1:]:
            assert f.intersect(g) is None
    arr = BoxArray([a, b])
    assert arr.volume == 512 + 512 - 64
    assert arr.subtract(BoxArray([a])).volume == 512 - 64


def test_box_manager_owner_lookup():
    bm = BoxManager()
    bm.add_entry(Box((0, 0, 0), (7, 15, 15)), owner=0)
    bm.add_entry(Box((8, 0, 0), (15, 15, 7)), owner=1)
    q = np.array([[1, 1, 1], [9, 3, 3], [9, 3, 12], [20, 0, 0]])
    np.testing.assert_array_equal(bm.owners_of(q), [0, 1, -1, -1])
    assert bm.gather((3, 3, 3)) == [(0, Box((0, 0, 0), (7, 15, 15)))]
    hits = bm.intersect(Box((6, 0, 0), (9, 3, 3)))
    assert {o for o, _ in hits} == {0, 1}


def test_periodic_matvec_matches_circulant():
    g = StructGrid([Box((0, 0, 0), (0, 0, 15))], periodic=(0, 0, 1))
    A = g.matrix_from_stencil(
        [((0, 0, 0), 2.5), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)])
    u = np.arange(16, dtype=np.float64).reshape(1, 1, 16)
    y = np.asarray(struct_matvec(A, u)).ravel()
    import scipy.linalg as sla
    C = sla.circulant(np.r_[2.5, -1.0, np.zeros(13), -1.0])
    np.testing.assert_allclose(y, C @ u.ravel(), atol=1e-12)


def test_pfmg_on_two_box_L_domain():
    """Verdict exit test: PFMG on an L-shaped 2-box union converges
    and solves the masked operator to 1e-8."""
    g = StructGrid([Box((0, 0, 0), (7, 15, 15)),
                    Box((8, 0, 0), (15, 15, 7))])
    assert g.shape == (16, 16, 16)
    assert g.local_size == 8 * 16 * 16 + 8 * 16 * 8
    A = g.matrix_from_stencil(LAP7)
    b = g.vector(1.0)
    x, iters, relres = PFMG(PfmgConfig(tol=1e-8, max_iter=60)
                            ).setup(A).solve(b)
    x = np.asarray(x)
    r = b - np.asarray(struct_matvec(A, x))
    rn = np.linalg.norm(r[g.mask]) / np.linalg.norm(b[g.mask])
    assert rn < 1e-7
    assert int(iters) < 40
    # inactive cells are identity rows: x == b == 0 there
    assert np.allclose(x[~g.mask], 0.0)


def test_masked_operator_matches_unstructured():
    """The L-domain stencil operator equals the scipy CSR assembled on
    active cells only (golden cross-check of the masking)."""
    g = StructGrid([Box((0, 0, 0), (3, 7, 7)), Box((4, 0, 0), (7, 7, 3))])
    A = g.matrix_from_stencil(LAP7)
    u = np.where(g.mask, np.random.default_rng(3).standard_normal(
        g.shape), 0.0)
    y = np.asarray(struct_matvec(A, u))
    # reference: dense assembly over active cells
    idx = -np.ones(g.shape, dtype=np.int64)
    act = np.argwhere(g.mask)
    idx[tuple(act.T)] = np.arange(len(act))
    yref = np.zeros(g.shape)
    for (off, v) in LAP7:
        for z, y_, x_ in act:
            t = (z + off[0], y_ + off[1], x_ + off[2])
            if all(0 <= t[d] < g.shape[d] for d in range(3)) \
                    and g.mask[t]:
                yref[z, y_, x_] += v * u[t]
    np.testing.assert_allclose(y[g.mask], yref[g.mask], atol=1e-10)
