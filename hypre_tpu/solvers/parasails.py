"""ParaSails — pruned-pattern least-squares sparse approximate inverse.

Analog of hypre's ParaSails (ref: src/distributed_ls/ParaSails/
ParaSails.c:1626 ParaSailsSetupValues, :1681 the per-row least-squares;
Chow, "A priori sparsity patterns for parallel sparse approximate
inverse preconditioners", SISC 2000).  Two modes, as in the reference:

  * nonsymmetric (sym=False, ParaSails.c symmetric==0): one sparse M
    with M A ~= I.  Row i of M minimizes || e_i^T - m_i^T Atil ||_2
    over the pruned pattern J_i, where Atil is the THRESHOLDED matrix
    (values and pattern both pruned — that is the "ParaSails
    approximation": the LS is solved against the sparsified operator).
    Normal equations:  (Atil Atil^T)[J,J] m = Atil[J, i].
  * symmetric SPD (sym=True, symmetric==1): factored G A G^T ~= I —
    delegated to FSAI, which is the same factored-SAI construction
    (hypre's symmetric ParaSails and FSAI share this math).

The reference solves one dense LS per row with LAPACK inside each MPI
rank and load-balances rows across ranks (LoadBal.c); here ALL rows are
one batched (n, k, k) dense solve on the MXU, so load balance is a
non-issue by construction.  The thresholding (ParaSails.c prune),
pattern powers (nlevels), and post-filtering (FilterValues) follow the
reference's parameter semantics: thresh/nlevels/filter.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from hypre_tpu.solvers.fsai import _Lookup, _pack_pattern


@dataclasses.dataclass
class ParaSailsConfig:
    thresh: float = 0.1      # prune |a_ij| < thresh*sqrt(|a_ii a_jj|)
    nlevels: int = 1         # pattern = pattern(Atil^(nlevels))
    filter: float = 0.05     # post-drop |m_ij| < filter * max_j |m_ij|
    sym: bool = False        # True: factored SPD mode (FSAI)
    max_row_nnz: int = 24    # cap per-row pattern (padded batch width)


class ParaSails:
    def __init__(self, config: ParaSailsConfig | None = None):
        self.config = config or ParaSailsConfig()
        self.M = None          # SparseOp (nonsym) — apply M @ r
        self._fsai = None      # symmetric delegate

    # -- setup --------------------------------------------------------

    def setup(self, A: sp.csr_matrix) -> "ParaSails":
        cfg = self.config
        if cfg.sym:
            from hypre_tpu.solvers.fsai import FSAI, FsaiConfig
            self._fsai = FSAI(FsaiConfig(
                algo_type="static", num_levels=cfg.nlevels,
                threshold=cfg.thresh,
                max_row_nnz=cfg.max_row_nnz)).setup(A)
            return self
        A = sp.csr_matrix(A)
        A.sort_indices()
        n = A.shape[0]
        At = self._prune(A)
        pat = self._pattern(At)
        # normal equations against the pruned operator:
        #   (At At^T)[J,J] m_J = At[J, i]
        B = (At @ At.T).tocsr()
        B.sort_indices()
        gram = _Lookup(B)
        aval = _Lookup(At)
        k = pat.shape[1]
        pat_safe = np.where(pat >= 0, pat, 0)
        mats = gram(
            pat_safe[:, :, None].repeat(k, 2).ravel(),
            pat_safe[:, None, :].repeat(k, 1).ravel()).reshape(n, k, k)
        rhs = aval(pat_safe.ravel(),
                   np.repeat(np.arange(n), k)).reshape(n, k)
        valid = pat >= 0
        vmask = valid[:, :, None] & valid[:, None, :]
        eye = np.arange(k)[None, :, None] == np.arange(k)[None, None, :]
        # pad invalid slots to identity; tiny Tikhonov keeps rows whose
        # pruned gram went singular solvable (reference falls back to a
        # pivoted LS there)
        mats = np.where(vmask, mats, 0.0) + np.where(
            ~valid[:, :, None] & eye, 1.0, 0.0)
        mats = mats + 1e-12 * eye * np.abs(mats).max((1, 2))[:, None,
                                                            None]
        rhs = np.where(valid, rhs, 0.0)
        m = np.asarray(jnp.linalg.solve(
            jnp.asarray(mats), jnp.asarray(rhs)[..., None])[..., 0])
        m = np.where(valid, m, 0.0)
        # post-filter (ParaSails.c FilterValues): drop small |m_ij|
        # relative to the row max, always keeping the diagonal slot
        if cfg.filter > 0:
            rmax = np.abs(m).max(axis=1, keepdims=True)
            keep = np.abs(m) >= cfg.filter * np.maximum(rmax, 1e-300)
            keep |= pat == np.arange(n)[:, None]
            m = np.where(keep, m, 0.0)
            valid = valid & keep
        rows = np.repeat(np.arange(n), k)[valid.ravel()]
        M = sp.coo_matrix((m[valid], (rows, pat[valid])),
                          shape=(n, n)).tocsr()
        from hypre_tpu.ops.formats import sparse_op_from_scipy
        self.M = sparse_op_from_scipy(M, prefer_dia=False)
        self._M_scipy = M
        return self

    def _prune(self, A: sp.csr_matrix) -> sp.csr_matrix:
        """ParaSails.c prune: keep diagonal + |a_ij| >= thresh *
        sqrt(|a_ii a_jj|)."""
        cfg = self.config
        d = np.sqrt(np.abs(A.diagonal()))
        coo = A.tocoo()
        keep = (coo.row == coo.col) | (
            np.abs(coo.data) >= cfg.thresh * d[coo.row] * d[coo.col])
        return sp.csr_matrix(
            (coo.data[keep], (coo.row[keep], coo.col[keep])),
            shape=A.shape)

    def _pattern(self, At: sp.csr_matrix) -> np.ndarray:
        cfg = self.config
        n = At.shape[0]
        S = At.copy()
        S.data = np.ones_like(S.data)
        P = S
        for _ in range(cfg.nlevels - 1):
            P = (P @ S).tocsr()
            P.data = np.ones_like(P.data)
        coo = P.tocoo()
        # rank candidates by |Atil^nlevels| magnitude so the cap keeps
        # the strongest couplings; force the diagonal in
        mag = np.abs(_Lookup(At)(coo.row, coo.col)) \
            if cfg.nlevels == 1 else np.ones(len(coo.row))
        mag = np.where(coo.row == coo.col, np.inf, mag)
        order = np.lexsort((-mag, coo.row))
        rows, cols = coo.row[order], coo.col[order]
        rank = np.arange(len(rows)) - np.searchsorted(rows, rows,
                                                      "left")
        sel = rank < cfg.max_row_nnz
        return _pack_pattern(n, rows[sel], cols[sel], cfg.max_row_nnz)

    # -- apply --------------------------------------------------------

    def precondition(self, r):
        if self._fsai is not None:
            return self._fsai.precondition(r)
        from hypre_tpu.ops.formats import matvec
        return matvec(self.M, r)
