"""SStruct Maxwell: RS edge hierarchy + Hiptmair smoothing."""
import numpy as np
import scipy.sparse as sp

import jax

from hypre_tpu.ops import sparse_op_from_scipy
from hypre_tpu.solvers import pcg
from hypre_tpu.solvers.ams import derham_3d, maxwell_3d
from hypre_tpu.solvers.maxwell import (
    SStructMaxwell, _rs_edge_interp, _strongest_col,
)


def test_rs_edges_commute():
    """G_c has +-1 rows over distinct aggregates and Pe carries fine
    edges to coarse edges with orientation signs; gradients of coarse
    nodal functions prolong to gradients (RS commuting property):
    Pe @ G_c == G @ P_n^{agg} for the 0/1 aggregation P."""
    G, C, D, Pi_e, Pi_f = derham_3d(4)
    nn = G.shape[1]
    # aggregation: every node to a coarse node id (simple blocks)
    agg = (np.arange(nn) // 5) % (nn // 5 + 1)
    n_c = int(agg.max()) + 1
    Gc, Pe = _rs_edge_interp(G, agg, n_c)
    # commuting: for any coarse nodal vector v, Pe (Gc v) == G (v[agg])
    rng = np.random.RandomState(0)
    v = rng.rand(n_c)
    lhs = Pe @ (Gc @ v)
    rhs = G @ v[agg]
    assert np.allclose(lhs, rhs, atol=1e-12)


def test_maxwell_pcg_converges():
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    A, G, Pi = maxwell_3d(8, beta=1.0)
    mx = SStructMaxwell().setup(A, G)
    assert len(mx.levels) >= 3      # a real edge hierarchy
    b = np.ones(A.shape[0])
    res = pcg(sparse_op_from_scipy(A), b, M=mx.precondition,
              tol=1e-8, max_iter=100)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 30, int(res.iters)


def test_maxwell_small_beta():
    """Small beta (near-singular curl-curl) is the regime the nodal
    subspace correction exists for."""
    jax.config.update("jax_platforms", "cpu")
    A, G, Pi = maxwell_3d(6, beta=0.01)
    mx = SStructMaxwell().setup(A, G)
    b = np.ones(A.shape[0])
    res = pcg(sparse_op_from_scipy(A), b, M=mx.precondition,
              tol=1e-8, max_iter=150)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    assert int(res.iters) <= 60, int(res.iters)
