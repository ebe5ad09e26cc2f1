"""AMS — auxiliary-space Maxwell solver for H(curl) problems.

Analog of hypre's AMS (ref: src/parcsr_ls/ams.c:2928 hypre_AMSSetup).
For an edge-element matrix A = curl-curl + mass, plain AMG fails (the
gradient near-nullspace is huge); the Hiptmair-Xu auxiliary-space
decomposition preconditions with

    M^{-1} = S  +  G B_G G^T  +  Pi B_Pi Pi^T

where
  S     — edge smoother (l1-Jacobi here),
  G     — the discrete gradient (edges x nodes incidence, user input
          as in the reference's HYPRE_AMSSetDiscreteGradient),
  B_G   — BoomerAMG on the nodal Poisson-like matrix G^T A G,
  Pi    — nodal-vector to edge interpolation (from coordinates /
          HYPRE_AMSSetEdgeConstantVectors semantics),
  B_Pi  — BoomerAMG on Pi^T A Pi (vector-nodal space).

This is the additive cycle_type of the reference; the sub-AMGs are
ordinary BoomerAMG hierarchies, so the whole application compiles into
one XLA program like every other solver here.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from hypre_tpu.solvers.amg import AmgConfig, BoomerAMG, amg_cycle


@dataclasses.dataclass
class AmsConfig:
    amg: AmgConfig = dataclasses.field(
        default_factory=lambda: AmgConfig(interp_type=6))
    smooth_sweeps: int = 1


class AMS:
    def __init__(self, config: AmsConfig | None = None):
        self.config = config or AmsConfig()
        self.bg = None
        self.bpi = None
        self.G = None
        self.Pi = None
        self.dinv = None

    def setup(self, A: sp.csr_matrix, G: sp.csr_matrix,
              Pi: sp.csr_matrix) -> "AMS":
        """A: edge matrix; G: discrete gradient (n_edges x n_nodes);
        Pi: nodal-vector interpolation (n_edges x dim*n_nodes)."""
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy
        from hypre_tpu.setup.l1norms import l1_norms

        real = get_config().np_real
        A = A.tocsr()
        self.A_op = sparse_op_from_scipy(A)
        self.dinv = jnp.asarray((1.0 / l1_norms(A, 1)).astype(real))

        AG = (G.T @ A @ G).tocsr()
        # the gradient space matrix can be singular for pure curl-curl;
        # a tiny diagonal shift keeps the sub-AMG well posed
        AG = (AG + sp.identity(AG.shape[0]) * 1e-12 * abs(AG.diagonal()).max()
              ).tocsr()
        API = (Pi.T @ A @ Pi).tocsr()

        self.bg = BoomerAMG(self.config.amg).setup(AG)
        self.bpi = BoomerAMG(self.config.amg).setup(API)
        self.G = sparse_op_from_scipy(G, prefer_dia=False)
        self.Gt = sparse_op_from_scipy(G.T.tocsr(), prefer_dia=False)
        self.Pi = sparse_op_from_scipy(Pi, prefer_dia=False)
        self.Pit = sparse_op_from_scipy(Pi.T.tocsr(), prefer_dia=False)
        return self

    def precondition(self, r):
        """Additive auxiliary-space cycle."""
        from hypre_tpu.ops.formats import matvec

        z = self.dinv * r
        zg = matvec(self.G, amg_cycle(self.bg.hierarchy,
                                      matvec(self.Gt, r)))
        zp = matvec(self.Pi, amg_cycle(self.bpi.hierarchy,
                                       matvec(self.Pit, r)))
        return z + zg + zp


# ---------------------------------------------------------------------------
# reference problem builder (the ex15 analog): 2D lowest-order Nedelec
# curl-curl + mass on a uniform grid
# ---------------------------------------------------------------------------

def maxwell_2d(n: int, beta: float = 1.0):
    """Build (A, G, Pi) for E-field H(curl): A = C^T C + beta * M_e on
    an n x n uniform grid (unit cells).  Edge dofs: first the
    horizontal (x) edges, then the vertical (y) edges."""
    nn = (n + 1) * (n + 1)            # nodes
    nex = n * (n + 1)                 # x-edges
    ney = (n + 1) * n                 # y-edges

    def node(i, j):
        return j * (n + 1) + i

    def xedge(i, j):                  # from (i,j) to (i+1,j)
        return j * n + i

    def yedge(i, j):                  # from (i,j) to (i,j+1)
        return nex + i * n + j

    rows, cols, vals = [], [], []

    def addG(e, nneg, npos):
        rows.extend([e, e])
        cols.extend([nneg, npos])
        vals.extend([-1.0, 1.0])

    for j in range(n + 1):
        for i in range(n):
            addG(xedge(i, j), node(i, j), node(i + 1, j))
    for i in range(n + 1):
        for j in range(n):
            addG(yedge(i, j), node(i, j), node(i, j + 1))
    G = sp.coo_matrix((vals, (rows, cols)),
                      shape=(nex + ney, nn)).tocsr()

    # curl: one row per cell, +- the四 edges around it
    crows, ccols, cvals = [], [], []
    for j in range(n):
        for i in range(n):
            c = j * n + i
            crows += [c, c, c, c]
            ccols += [xedge(i, j), xedge(i, j + 1),
                      yedge(i + 1, j), yedge(i, j)]
            cvals += [1.0, -1.0, 1.0, -1.0]
    C = sp.coo_matrix((cvals, (crows, ccols)),
                      shape=(n * n, nex + ney)).tocsr()

    A = (C.T @ C + beta * sp.identity(nex + ney)).tocsr()

    # Pi: nodal vector (ux at nodes, uy at nodes) -> tangential edge
    # averages
    prows, pcols, pvals = [], [], []
    for j in range(n + 1):
        for i in range(n):
            e = xedge(i, j)
            prows += [e, e]
            pcols += [node(i, j), node(i + 1, j)]        # ux block
            pvals += [0.5, 0.5]
    for i in range(n + 1):
        for j in range(n):
            e = yedge(i, j)
            prows += [e, e]
            pcols += [nn + node(i, j), nn + node(i, j + 1)]  # uy block
            pvals += [0.5, 0.5]
    Pi = sp.coo_matrix((pvals, (prows, pcols)),
                       shape=(nex + ney, 2 * nn)).tocsr()
    return A, G, Pi


class ADS:
    """ADS — auxiliary-space H(div) solver (ref: src/parcsr_ls/ads.c).

    Same auxiliary-space shape as AMS one rung up the de Rham complex:
    for a face-element matrix A = div-div + mass,

        M^{-1} = S + C B_C C^T + Pi B_Pi Pi^T

    with C the discrete curl (faces x edges; its range is the
    divergence-free subspace) and Pi the nodal-vector interpolation
    onto faces.  B_C is an AMS solve on the edge space in the
    reference; with the additive cycle and an SPD edge matrix, a
    BoomerAMG hierarchy on C^T A C serves the same role here.
    """

    def __init__(self, config: AmsConfig | None = None):
        self.config = config or AmsConfig()
        self._ams_core = AMS(self.config)

    def setup(self, A: sp.csr_matrix, C: sp.csr_matrix,
              Pi: sp.csr_matrix) -> "ADS":
        """A: face matrix; C: discrete curl (n_faces x n_edges);
        Pi: nodal-vector to face interpolation."""
        self._ams_core.setup(A, C, Pi)
        return self

    def precondition(self, r):
        return self._ams_core.precondition(r)


def rt0_2d(n: int, beta: float = 1.0):
    """2D lowest-order Raviart-Thomas div-div + mass problem:
    (A, C, Pi).  In 2D, RT0 faces are rotated Nedelec edges and the
    discrete curl is the rotated gradient, so the Maxwell builder's
    operators transfer with the roles swapped."""
    A_e, G, Pi = maxwell_2d(n, beta)
    # rotation is an isometry on the uniform grid: the div-div matrix
    # equals the curl-curl matrix in the rotated basis, and G plays C
    return A_e, G, Pi
