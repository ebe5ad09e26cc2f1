"""FSAI — factorized sparse approximate inverse preconditioner.

Analog of hypre's FSAI (ref: src/parcsr_ls/par_fsai.c:16, setup
par_fsai_setup.c:406, device path par_fsai_device.c).  For SPD A it
builds a sparse lower-triangular G such that G A G^T ≈ I, i.e.
G ≈ L^{-1} for A = L L^T; then M^{-1} r = G^T (G r) is an SPD
preconditioner/smoother applied as two sparse matvecs.

Per row i with lower pattern J_i = {j < i : (i,j) in pattern}:
    solve  A[J_i, J_i] g_i = -A[J_i, i]
    G[i, J_i] = g_i, G[i, i] = 1
    scale row i by 1 / sqrt((A G^T)_ii G_ii-ish) so diag(G A G^T) = 1
(ref: par_fsai_setup.c "Kaporin" scaling).  The reference solves these
little systems one per GPU thread block; here they are ONE batched
Cholesky solve over (n, k, k) — exactly the dense-batched work the MXU
is built for.

Pattern: static — the lower triangle of A^num_levels' pattern with
threshold filtering (hypre's static-pattern mode).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class FsaiConfig:
    num_levels: int = 1        # pattern = tril(pattern(A^num_levels))
    threshold: float = 0.01    # drop |a_ij| < threshold * sqrt(aii*ajj)
    max_row_nnz: int = 8       # cap on pattern row size (k)


class FSAI:
    def __init__(self, config: FsaiConfig | None = None):
        self.config = config or FsaiConfig()
        self.G = None          # SparseOp, lower triangular
        self.Gt = None         # SparseOp, G^T

    def setup(self, A: sp.csr_matrix) -> "FSAI":
        from hypre_tpu.core.config import get_config
        from hypre_tpu.ops.formats import sparse_op_from_scipy

        cfg = self.config
        real = get_config().np_real
        A = A.tocsr()
        n = A.shape[0]
        diag = A.diagonal()

        # --- pattern ------------------------------------------------
        Pat = A.copy()
        Pat.data = np.ones_like(Pat.data)
        Pw = Pat
        for _ in range(cfg.num_levels - 1):
            Pw = (Pw @ Pat).tocsr()
            Pw.data = np.ones_like(Pw.data)
        Pw = sp.tril(Pw, k=-1).tocsr()

        # threshold filter on A values where available
        scale = np.sqrt(np.abs(diag))
        coo = Pw.tocoo()
        aval = np.asarray(A[coo.row, coo.col]).ravel() \
            if cfg.num_levels == 1 else None
        if aval is not None:
            keep = np.abs(aval) >= cfg.threshold * scale[coo.row] \
                * scale[coo.col]
        else:
            keep = np.ones(len(coo.row), dtype=bool)
        rows, cols = coo.row[keep], coo.col[keep]

        # cap row size keeping largest |A| entries
        if aval is not None:
            mag = np.abs(aval[keep])
        else:
            mag = np.ones(len(rows))
        order = np.lexsort((-mag, rows))
        rows, cols = rows[order], cols[order]
        rank = np.arange(len(rows)) - np.searchsorted(
            rows, rows, side="left")
        sel = rank < cfg.max_row_nnz
        rows, cols = rows[sel], cols[sel]

        # --- batched little systems ----------------------------------
        k = cfg.max_row_nnz
        pat = np.full((n, k), -1, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)
        order2 = np.argsort(rows, kind="stable")
        r_s, c_s = rows[order2], cols[order2]
        pos = np.arange(len(r_s)) - np.searchsorted(r_s, r_s)
        pat[r_s, pos] = c_s
        np.maximum.at(cnt, r_s, pos + 1)

        # gather A[J_i, J_i] and A[J_i, i] (dense lookups, host)
        Ad = None
        # use LIL-free approach: hash A entries
        a_keys = (np.repeat(np.arange(n), np.diff(A.indptr)).astype(np.int64)
                  * n + A.indices)
        a_sorted = np.argsort(a_keys)
        a_keys_s = a_keys[a_sorted]
        a_vals_s = A.data[a_sorted]

        def lookup(i_arr, j_arr):
            keys = i_arr.astype(np.int64) * n + j_arr
            p = np.searchsorted(a_keys_s, keys)
            p = np.minimum(p, len(a_keys_s) - 1)
            hit = a_keys_s[p] == keys
            return np.where(hit, a_vals_s[p], 0.0)

        pat_safe = np.where(pat >= 0, pat, 0)
        mats = lookup(
            pat_safe[:, :, None].repeat(k, 2).ravel(),
            pat_safe[:, None, :].repeat(k, 1).ravel()).reshape(n, k, k)
        rhs = lookup(pat_safe.ravel(),
                     np.repeat(np.arange(n), k)).reshape(n, k)
        valid = pat >= 0
        vmask = valid[:, :, None] & valid[:, None, :]
        eye = np.eye(k)[None, :, :]
        mats = np.where(vmask, mats, 0.0) + np.where(
            ~valid[:, :, None] & (np.arange(k)[None, :, None]
                                  == np.arange(k)[None, None, :]),
            1.0, 0.0)
        rhs = np.where(valid, rhs, 0.0)

        # batched solve on device
        mats_j = jnp.asarray(mats.astype(real))
        rhs_j = jnp.asarray(rhs.astype(real))
        g = jnp.linalg.solve(mats_j, -rhs_j[..., None])[..., 0]
        g = np.asarray(g)
        g = np.where(valid, g, 0.0)

        # rows of G: [g_i, 1.0] scaled so diag(G A G^T) = 1:
        # d_i = a_ii + 2 g_i·A[J_i,i] + g_i·A[J_i,J_i]·g_i
        quad = np.einsum("nk,nkl,nl->n", g, mats * vmask, g)
        lin = np.einsum("nk,nk->n", g, rhs)
        d = diag + 2 * lin + quad
        d = np.where(d > 0, d, np.abs(diag) + 1e-30)
        s = 1.0 / np.sqrt(d)

        g_rows = np.repeat(np.arange(n), k)[valid.ravel()]
        g_cols = pat[valid]
        g_vals = (g * s[:, None])[valid]
        G = sp.coo_matrix(
            (np.concatenate([g_vals, s]),
             (np.concatenate([g_rows, np.arange(n)]),
              np.concatenate([g_cols, np.arange(n)]))),
            shape=(n, n)).tocsr()
        self.G = sparse_op_from_scipy(G, prefer_dia=False)
        self.Gt = sparse_op_from_scipy(G.T.tocsr(), prefer_dia=False)
        self._G_scipy = G
        return self

    def precondition(self, r):
        from hypre_tpu.ops.formats import matvec

        return matvec(self.Gt, matvec(self.G, r))
