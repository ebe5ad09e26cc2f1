"""Wavefront-scheduled sparse triangular solve.

Exact (l1-)Gauss-Seidel sweeps need z = (D + T)^{-1} r with T the
strict lower (forward) or upper (backward) part of A.  A sequential
row loop does not map to XLA; the TPU-native formulation is LEVEL
SCHEDULING — the same analysis a vendor sparse-trisolve performs for
the reference's device hybrid-GS (cusparse csrsv2 under
hypre_BoomerAMGRelax types 3/4/6/13/14, ref: src/parcsr_ls/
par_relax.c:24): rows are grouped into wavefronts by longest-chain
depth; within a wavefront every row depends only on earlier
wavefronts, so each wavefront is one vectorized gather + FMA + scaled
update, and a sweep is a static chain of n_wavefront such steps.

Rows are permuted to wavefront-major order at setup so each step
updates one contiguous slice (a dynamic_update_slice, no scatters).
For a structured 3D grid the depth is O(nx+ny+nz) — hundreds of
steps, each full-width vector work.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["perm", "inv_perm", "dinv_p", "cols", "vals"],
         meta_fields=["block_bounds"])
@dataclasses.dataclass(frozen=True)
class WavefrontTriSolve:
    """perm: permuted-order -> original row id
    inv_perm: original -> permuted position
    dinv_p: 1/diag in permuted order
    cols[k]: int32[w_k, m_k]  column positions IN PERMUTED SPACE of the
             strict-triangular entries of block k's rows (pad: 0)
    vals[k]: real [w_k, m_k]  (pad: 0)
    block_bounds: static tuple[(start, size), ...]
    """

    perm: jax.Array
    inv_perm: jax.Array
    dinv_p: jax.Array
    cols: tuple
    vals: tuple
    block_bounds: tuple

    def solve(self, r: jax.Array) -> jax.Array:
        r_p = jnp.take(r, self.perm, axis=0)
        z_p = jnp.zeros_like(r_p)
        for (s, m), cols, vals in zip(self.block_bounds, self.cols,
                                      self.vals):
            rhs = jax.lax.dynamic_slice(r_p, (s,), (m,))
            if cols is not None:
                gathered = jnp.take(z_p, cols, axis=0)
                rhs = rhs - jnp.sum(vals * gathered, axis=0)
            z_blk = rhs * jax.lax.dynamic_slice(self.dinv_p, (s,), (m,))
            z_p = jax.lax.dynamic_update_slice(z_p, z_blk, (s,))
        return jnp.take(z_p, self.inv_perm, axis=0)


def build_trisolve(A_scipy, d: np.ndarray, backward: bool = False,
                   real_dtype=None) -> WavefrontTriSolve:
    """Build the wavefront structure for (D + tril/triu(A))^{-1} with
    diagonal d (the l1 norms for relax 13/14/8, the matrix diagonal
    for 3/4/6)."""
    import scipy.sparse as sp

    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    A = A_scipy.tocsr()
    n = A.shape[0]

    from hypre_tpu.setup.utils import native_enabled

    if native_enabled():
        from hypre_tpu.csrc import build as native

        depth = native.gs_wavefronts(A, backward=backward)
    else:
        depth = _wavefronts_numpy(A, backward)

    order = np.argsort(depth, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)

    T = sp.tril(A, k=-1).tocsr() if not backward else \
        sp.triu(A, k=1).tocsr()

    counts = np.bincount(depth, minlength=int(depth.max(initial=1)) + 1)
    bounds = []
    start = 0
    for k in range(1, len(counts)):
        if counts[k] == 0:
            continue
        bounds.append((start, int(counts[k])))
        start += int(counts[k])

    cols_blocks, vals_blocks = [], []
    t_rnnz = np.diff(T.indptr)
    for s, m in bounds:
        rows = order[s:s + m]
        w = int(t_rnnz[rows].max(initial=0))
        if w == 0:
            cols_blocks.append(None)
            vals_blocks.append(None)
            continue
        cols = np.zeros((w, m), dtype=np.int32)
        vals = np.zeros((w, m), dtype=real_dtype)
        cnts = t_rnnz[rows]
        rep = np.repeat(np.arange(m), cnts)
        within = (np.arange(int(cnts.sum()))
                  - np.repeat(np.cumsum(cnts) - cnts, cnts))
        src = np.repeat(T.indptr[rows], cnts) + within
        cols[within, rep] = inv[T.indices[src]]
        vals[within, rep] = T.data[src]
        cols_blocks.append(jnp.asarray(cols))
        vals_blocks.append(jnp.asarray(vals))

    return WavefrontTriSolve(
        perm=jnp.asarray(order.astype(np.int32)),
        inv_perm=jnp.asarray(inv.astype(np.int32)),
        dinv_p=jnp.asarray((1.0 / d[order]).astype(real_dtype)),
        cols=tuple(cols_blocks), vals=tuple(vals_blocks),
        block_bounds=tuple(bounds))


def _wavefronts_numpy(A, backward: bool) -> np.ndarray:
    """Pure-python twin of the native gs_wavefronts (slow; testing)."""
    n = A.shape[0]
    depth = np.zeros(n, dtype=np.int32)
    indptr, indices = A.indptr, A.indices
    rng = range(n) if not backward else range(n - 1, -1, -1)
    for i in rng:
        d = 0
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            if (j < i) if not backward else (j > i):
                if depth[j] > d:
                    d = depth[j]
        depth[i] = d + 1
    return depth
