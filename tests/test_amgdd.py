"""AMG-DD: composite grids + communication-avoiding solve."""
import numpy as np

import jax
from jax.sharding import Mesh

from hypre_tpu.gen.laplace import laplacian
from hypre_tpu.parallel.amgdd import AmgDD, _bfs
from hypre_tpu.solvers.amg import AmgConfig


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("p",))


def test_composite_grids_cover_owned_plus_padding():
    n = 10
    A = laplacian(n, n, n)
    dd = AmgDD(mesh8(), AmgConfig(interp_type=3, relax_type=18),
               padding=1).setup(A)
    nl = dd.fine_part.n_local
    for p, ids in enumerate(dd.comp_gids0):
        owned = np.arange(p * nl, min((p + 1) * nl, A.shape[0]))
        # owned rows present
        assert np.isin(owned, ids).all()
        # padding: the 1-ring of owned present too
        ring = _bfs(A.tocsr(), owned, 1)
        assert np.isin(ring, ids).all()
        # composite stays local-ish: far smaller than the global grid
        assert len(ids) < 0.6 * A.shape[0]


def test_amgdd_converges_with_one_exchange_per_iter():
    n = 12
    A = laplacian(n, n, n)
    b = np.ones(A.shape[0])
    dd = AmgDD(mesh8(), AmgConfig(interp_type=6, relax_type=18),
               padding=1, fac_cycles=2).setup(A)
    x, it, rel = dd.solve(b, tol=1e-8, max_iter=120)
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert rel <= 1e-8 and true_rel < 1e-7
    # convergence in a small multiple of standard AMG's cycle count
    assert it <= 60
    # structural comm property: the fine-level CommPkg is the ONLY
    # exchange in the solve; its ghost set is exactly the non-owned
    # composite fine dofs
    nl = dd.fine_part.n_local
    for p, ids in enumerate(dd.comp_gids0):
        n_ghost_p = int((ids // nl != p).sum())
        assert n_ghost_p <= dd.comm.n_ghost


def test_amgdd_padding_improves_rate():
    n = 10
    A = laplacian(n, n, n)
    b = np.ones(A.shape[0])
    its = []
    for eta in (1, 2):
        dd = AmgDD(mesh8(), AmgConfig(interp_type=3, relax_type=18),
                   padding=eta, fac_cycles=1).setup(A)
        _, it, rel = dd.solve(b, tol=1e-6, max_iter=200)
        assert rel <= 1e-6
        its.append(it)
    assert its[1] <= its[0]
