"""MGR — multigrid reduction preconditioner.

Analog of hypre's MGR (ref: src/parcsr_ls/par_mgr_setup.c:14).  The
user tags a coarse block (e.g. reservoir pressure dofs); MGR reduces
onto it:

  A = [A_ff  A_fc]      P = [-D_ff^{-1} A_fc]    R = [ -A_cf D_ff^{-1}, I ]
      [A_cf  A_cc]          [      I       ]

  A_H = R A P  (Galerkin on the reduction),  solved by BoomerAMG;
  F-relaxation = Jacobi sweeps on A_ff.

One MGR cycle: F-relax -> coarse correction (AMG V-cycle on A_H) ->
F-relax, all compiled with the usual machinery.  D_ff is the diagonal
approximation of A_ff^{-1} (hypre's default "diagonal" F-relax /
interp option).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from hypre_tpu.solvers.amg import AmgConfig, BoomerAMG, amg_cycle


@dataclasses.dataclass
class MgrConfig:
    f_relax_sweeps: int = 1
    amg: AmgConfig = dataclasses.field(
        default_factory=lambda: AmgConfig(interp_type=6))


class MGR:
    def __init__(self, config: MgrConfig | None = None):
        self.config = config or MgrConfig()

    def setup(self, A: sp.csr_matrix, c_mask: np.ndarray) -> "MGR":
        """c_mask: boolean array marking the coarse (kept) dofs."""
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy

        real = get_config().np_real
        A = A.tocsr()
        n = A.shape[0]
        c_idx = np.flatnonzero(c_mask)
        f_idx = np.flatnonzero(~c_mask)
        self._n, self._c_idx, self._f_idx = n, c_idx, f_idx

        Aff = A[f_idx][:, f_idx].tocsr()
        Afc = A[f_idx][:, c_idx].tocsr()
        Acf = A[c_idx][:, f_idx].tocsr()
        Acc = A[c_idx][:, c_idx].tocsr()

        dff = Aff.diagonal()
        dff = np.where(dff != 0, dff, 1.0)
        Dinv = sp.diags(1.0 / dff)
        AH = (Acc - Acf @ Dinv @ Afc).tocsr()

        self.amg_h = BoomerAMG(self.config.amg).setup(AH)
        self.Aff = sparse_op_from_scipy(Aff, prefer_dia=False)
        self.Afc = sparse_op_from_scipy(Afc, prefer_dia=False)
        self.Acf = sparse_op_from_scipy(Acf, prefer_dia=False)
        self.dff_inv = jnp.asarray((1.0 / dff).astype(real))
        self._mask = jnp.asarray(c_mask)
        self._cj = jnp.asarray(c_idx)
        self._fj = jnp.asarray(f_idx)
        return self

    def precondition(self, r):
        from hypre_tpu.ops.formats import matvec

        rf = r[self._fj]
        rc = r[self._cj]
        # pre F-relax: xf = D^-1 rf (+ sweeps)
        xf = self.dff_inv * rf
        for _ in range(self.config.f_relax_sweeps - 1):
            xf = xf + self.dff_inv * (rf - matvec(self.Aff, xf))
        # coarse correction on the Schur-like reduction
        rh = rc - matvec(self.Acf, self.dff_inv * rf)
        xc = amg_cycle(self.amg_h.hierarchy, rh)
        # interpolate back: xf += -D^-1 Afc xc
        xf = xf - self.dff_inv * matvec(self.Afc, xc)
        # post F-relax
        xf = xf + self.dff_inv * (rf - matvec(self.Aff, xf)
                                  - matvec(self.Afc, xc))
        out = jnp.zeros_like(r)
        out = out.at[self._fj].set(xf)
        out = out.at[self._cj].set(xc)
        return out
