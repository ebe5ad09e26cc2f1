"""Schwarz — overlapping block (domain) smoother/preconditioner.

Analog of hypre's Schwarz smoothers (ref: src/parcsr_ls/schwarz.c;
variants docs HYPRE_parcsr_ls.h).  Domains are contiguous row blocks
with symmetric overlap; every subdomain solve is a dense factorization
— the reference does them one by one with LAPACK, here they are ONE
batched inverse over (n_blocks, k, k) at setup and one batched matmul
per application (additive Schwarz with overlap averaging).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class SchwarzConfig:
    block_size: int = 32
    overlap: int = 4
    weight: float = 1.0
    # hypre Schwarz variants (ref: schwarz.c, HYPRE_parcsr_ls.h
    # SetVariant): "additive" (variant 2); "multiplicative" — block
    # Gauss-Seidel over a 2-coloring of the overlapping chain (the
    # data-parallel form of variant 0's in-processor multiplicative
    # sweep); "sym-multiplicative" (variant 3) sweeps colors forward
    # then backward, keeping the operator symmetric for PCG.
    variant: str = "additive"


class Schwarz:
    def __init__(self, config: SchwarzConfig | None = None):
        self.config = config or SchwarzConfig()
        self.block_inv = None    # (n_blocks, k, k)
        self.starts = None
        self.counts = None
        self.n = 0

    def setup(self, A: sp.csr_matrix) -> "Schwarz":
        from hypre_tpu.core.config import get_config

        real = get_config().np_real
        cfg = self.config
        A = A.tocsr()
        n = A.shape[0]
        self.n = n
        bs, ov = cfg.block_size, cfg.overlap
        k = bs + 2 * ov
        starts = np.arange(0, n, bs) - ov
        n_blocks = len(starts)

        # gather dense blocks A[s:s+k, s:s+k] (clipped, identity-padded)
        blocks = np.zeros((n_blocks, k, k), dtype=real)
        eye = np.eye(k, dtype=real)
        for bi, s in enumerate(starts):
            lo, hi = max(s, 0), min(s + k, n)
            sub = A[lo:hi, lo:hi].toarray()
            o0 = lo - s
            blocks[bi] = eye
            blocks[bi, o0:o0 + (hi - lo), o0:o0 + (hi - lo)] = sub

        self.block_inv = jnp.asarray(
            np.linalg.inv(blocks).astype(real))
        self.starts = starts
        self.k = k
        # scalar damping keeps the operator symmetric (required for
        # PCG); per-row overlap weighting would break symmetry
        count = np.zeros(n, dtype=real)
        for s in starts:
            lo, hi = max(s, 0), min(s + k, n)
            count[lo:hi] += 1.0
        self._damp = float(cfg.weight / count.max())
        if cfg.variant != "additive":
            if 2 * ov > bs:
                raise ValueError(
                    "multiplicative variants need 2*overlap <= "
                    "block_size (2-colorable overlap chain)")
            from hypre_tpu.ops.formats import sparse_op_from_scipy

            self._Aop = sparse_op_from_scipy(A, prefer_dia=False)
        return self

    def _solve_color(self, r_cur, color):
        """Solve this color's blocks on the current residual and
        return the (non-overlapping within a color) correction."""
        k, n = self.k, self.n
        starts = self.starts[color::2]
        inv = self.block_inv[color::2]
        pad = jnp.pad(r_cur, (k, k))
        idx = (starts[:, None] + np.arange(k)[None, :]) + k
        rw = pad[jnp.asarray(idx)]
        xw = jnp.einsum("bij,bj->bi", inv, rw)
        out = jnp.zeros(n + 2 * k, dtype=r_cur.dtype)
        out = out.at[jnp.asarray(idx.ravel())].add(xw.ravel())
        return out[k:k + n]

    def precondition(self, r):
        """additive: x = W^-1 sum_b R_b^T A_b^-1 R_b r.
        multiplicative: block GS over the 2-coloring;
        sym-multiplicative adds the reverse color sweep."""
        cfg = self.config
        if cfg.variant == "additive":
            k = self.k
            n = self.n
            starts = self.starts
            pad = jnp.pad(r, (k, k))
            idx = (starts[:, None] + np.arange(k)[None, :]) + k
            rw = pad[jnp.asarray(idx)]
            xw = jnp.einsum("bij,bj->bi", self.block_inv, rw)
            out = jnp.zeros(n + 2 * k, dtype=r.dtype)
            out = out.at[jnp.asarray(idx.ravel())].add(xw.ravel())
            return out[k:k + n] * self._damp

        from hypre_tpu.ops.formats import matvec

        order = [0, 1] if cfg.variant == "multiplicative" \
            else [0, 1, 0]
        x = self._solve_color(r, order[0])
        for color in order[1:]:
            r_cur = r - matvec(self._Aop, x)
            x = x + self._solve_color(r_cur, color)
        return x
