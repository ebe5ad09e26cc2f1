"""Block-ELL: dense nf x nf blocks per nonzero — the TPU form of
hypre's block ParCSR (ref: src/parcsr_block_mv/csr_block_matrix.h:32,
csr_block_matrix.c block matvec/matmat).

Systems PDEs couple nf unknowns per node; hypre stores one dense
nf x nf block per (node, node) coupling.  Here the block axis pair
rides as trailing dims of a slot-major ELL and the matvec contracts
them with einsum — small-matrix batched contractions the XLA TPU
backend maps onto the MXU, instead of hypre's per-block scalar loops
(csr_block_matrix.c:hypre_CSRBlockMatrixBlockMultAdd).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals"], meta_fields=["n_cols"])
@dataclasses.dataclass(frozen=True)
class BlockEllMatrix:
    """cols: int32[w, n_nodes]        block-column ids (-1 padding)
    vals: real [w, n_nodes, nf, nf]   dense blocks (0 padding)
    n_cols: static                    number of block columns
    """

    cols: jax.Array
    vals: jax.Array
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.cols.shape[1]

    @property
    def block_size(self) -> int:
        return self.vals.shape[-1]

    @property
    def shape(self):
        nf = self.block_size
        return (self.n_rows * nf, self.n_cols * nf)


def block_ell_from_scipy(A, num_functions: int,
                         real_dtype=None) -> BlockEllMatrix:
    """Interleaved scalar CSR -> block-ELL (dof i = node i//nf,
    function i%nf — hypre's interleaved ordering)."""
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    A = A.tocsr()
    n, m = A.shape
    nf = num_functions
    if n % nf or m % nf:
        raise ValueError("shape not divisible by block size")
    nr, nc = n // nf, m // nf
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    node_r = rows // nf
    node_c = A.indices // nf
    fr = rows % nf
    fc = A.indices % nf
    # distinct block columns per block row
    key = node_r.astype(np.int64) * nc + node_c
    uk = np.unique(key)
    ur = (uk // nc).astype(np.int64)
    counts = np.bincount(ur, minlength=nr)
    w = max(int(counts.max(initial=0)), 1)
    slot_of_uk = np.arange(len(uk)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    cols = np.full((w, nr), -1, np.int32)
    cols[slot_of_uk, ur] = (uk % nc).astype(np.int32)
    vals = np.zeros((w, nr, nf, nf), dtype=real_dtype)
    slot = slot_of_uk[np.searchsorted(uk, key)]
    vals[slot, node_r, fr, fc] = A.data
    return BlockEllMatrix(cols=jnp.asarray(cols),
                          vals=jnp.asarray(vals), n_cols=int(nc))


def block_matvec(A: BlockEllMatrix, x: jax.Array) -> jax.Array:
    """y = A x with x of length n_cols*nf (interleaved).  The gather
    fetches whole nf-vectors per block column; the contraction is one
    batched einsum on the MXU."""
    nf = A.block_size
    xb = x.reshape(A.n_cols, nf)
    safe = jnp.where(A.cols >= 0, A.cols, 0)
    g = jnp.take(xb, safe, axis=0)                 # (w, n, nf)
    g = jnp.where((A.cols >= 0)[..., None], g, 0)
    y = jnp.einsum("wnij,wnj->ni", A.vals, g,
                   preferred_element_type=A.vals.dtype)
    return y.reshape(-1)


def block_matmat(A: BlockEllMatrix, X: jax.Array) -> jax.Array:
    """Y = A X for a multivector X (n_cols*nf, k)."""
    nf = A.block_size
    k = X.shape[1]
    xb = X.reshape(A.n_cols, nf, k)
    safe = jnp.where(A.cols >= 0, A.cols, 0)
    g = jnp.take(xb, safe, axis=0)                 # (w, n, nf, k)
    g = jnp.where((A.cols >= 0)[..., None, None], g, 0)
    y = jnp.einsum("wnij,wnjk->nik", A.vals, g,
                   preferred_element_type=A.vals.dtype)
    return y.reshape(-1, k)


def block_diag_inv(A: BlockEllMatrix) -> jax.Array:
    """(n, nf, nf) inverse of each diagonal block — the block-Jacobi
    smoother operand (csr_block_matrix.c BlockInvMult analog)."""
    n = A.n_rows
    row = jnp.arange(n, dtype=A.cols.dtype)[None, :]
    is_diag = A.cols == row
    D = jnp.einsum("wn,wnij->nij", is_diag.astype(A.vals.dtype),
                   A.vals)
    return jnp.linalg.inv(D)


def block_jacobi(A: BlockEllMatrix, dinv_blocks, b, u=None,
                 weight: float = 1.0, sweeps: int = 1):
    """Block-Jacobi relaxation u += w * D_block^-1 (b - A u)."""
    nf = A.block_size
    for _ in range(sweeps):
        r = b if u is None else b - block_matvec(A, u)
        z = jnp.einsum("nij,nj->ni", dinv_blocks,
                       r.reshape(-1, nf)).reshape(-1) * weight
        u = z if u is None else u + z
    return u
