"""Local sparse-matrix formats and SpMV kernels, designed for TPU.

This is the seq_mv analog (ref: src/seq_mv/csr_matrix.h:33-58 and the
device SpMV at src/seq_mv/csr_spmv_device.c:381) re-designed for XLA:

* hypre stores CSR and picks a GPU row-group size by average row nnz
  (csr_spmv_device.c:300-306).  On TPU the analogous shape-driven choice
  is between two *static-shape* formats:

  - `EllMatrix` — rows padded to a fixed width; SpMV is one (n, K)
    gather + multiply + row-sum, fully vectorized on the VPU.  Right for
    irregular AMG coarse grids and interpolation operators.

  - `DiaMatrix` — diagonal (DIA) storage for stencil-like matrices
    (offsets constant across rows, e.g. generated Laplacians).  SpMV is
    a handful of shifted fused multiply-adds: zero gathers, pure
    streaming through HBM at speed of light.  This is what the
    structured-grid BoxLoop kernels (ref: src/struct_mv/boxloop_cuda.h)
    become on TPU.

* Conversion happens once at setup; the solve phase sees only static
  shapes, so each AMG hierarchy compiles to a single XLA program.

Padding convention: ELL pad slots have col = 0 and val = 0 so the
matvec needs no masks (gathering x[0] * 0 contributes nothing).
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
class EllMatrix:
    """Padded-ELL sparse matrix: fixed-width rows, stored TRANSPOSED.

    cols: int32[width, n_rows]   column index per slot (0 for padding)
    vals: real[width, n_rows]    value per slot (0 for padding)
    n_cols: static int           logical number of columns

    The (width, n) layout keeps the large dimension on TPU lanes; the
    natural (n, width) layout gets tiled to (n, 128) on device — a 32x
    HBM blow-up for width-4 interpolation operators.
    """

    cols: jax.Array
    vals: jax.Array
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.cols.shape[1]

    @property
    def width(self) -> int:
        return self.cols.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


@partial(jax.tree_util.register_dataclass,
         data_fields=["vals"], meta_fields=["offsets", "n_cols"])
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """Diagonal-storage sparse matrix for stencil-like operators.

    vals:    real[n_diags, n_rows]  vals[d, i] = A[i, i + offsets[d]]
             (zero where the entry is absent or out of range)
    offsets: static tuple[int]      diagonal offsets (host-known)
    n_cols:  static int
    """

    vals: jax.Array
    offsets: tuple
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.vals.shape[1]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


@partial(jax.tree_util.register_dataclass,
         data_fields=["vals"], meta_fields=["n_rows", "n_cols"])
@dataclasses.dataclass(frozen=True)
class DenseMatrix:
    """Dense storage for small coarse-grid operators: one MXU matmul
    beats any sparse formulation below a few thousand rows (the analog
    of hypre switching small problems to LAPACK paths)."""

    vals: jax.Array          # (rows_pad, cols_pad), 128-aligned
    n_rows: int
    n_cols: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


def dense_from_scipy(A, real_dtype=None) -> DenseMatrix:
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    n_rows, n_cols = A.shape
    rp = max(-(-n_rows // 128) * 128, 128)
    cp = max(-(-n_cols // 128) * 128, 128)
    dense = np.zeros((rp, cp), dtype=real_dtype)
    dense[:n_rows, :n_cols] = A.toarray()
    return DenseMatrix(vals=jnp.asarray(dense), n_rows=int(n_rows),
                       n_cols=int(n_cols))


def dense_matvec(A: DenseMatrix, x: jax.Array) -> jax.Array:
    xp = jnp.pad(x.astype(A.vals.dtype), (0, A.vals.shape[1] - x.shape[0]))
    y = jnp.dot(A.vals, xp, preferred_element_type=A.vals.dtype)
    return y[:A.n_rows]


from hypre_tpu.ops.gstell import GstEllMatrix  # noqa: E402
from hypre_tpu.ops.stencil_pallas import StencilOp  # noqa: E402

SparseOp = EllMatrix | DiaMatrix | GstEllMatrix | DenseMatrix | StencilOp


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def ell_matvec(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for padded ELL.  One gather + FMA + slot reduction."""
    gathered = jnp.take(x, A.cols, axis=0)  # (width, n_rows)
    return jnp.sum(A.vals * gathered, axis=0)


def _shifted(x: jax.Array, d: int, n_rows: int) -> jax.Array:
    """x logically indexed at i + d for i in [0, n_rows), zero-filled.

    `x` has length n_cols; the result has length n_rows.  Static `d`
    compiles to a pad+slice, no gather.
    """
    n_cols = x.shape[0]
    lo = max(0, -d)          # rows [0, lo) read out of range on the left
    start = max(0, d)        # first valid source index
    stop = min(n_cols, n_rows + d)
    core = x[start:stop]
    hi = n_rows - lo - core.shape[0]
    if lo or hi:
        core = jnp.pad(core, (lo, max(hi, 0)))
    return core[:n_rows]


def dia_matvec(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for DIA: sum over static diagonals of shifted FMAs."""
    n = A.n_rows
    y = jnp.zeros((n,), dtype=A.vals.dtype)
    for k, d in enumerate(A.offsets):
        y = y + A.vals[k] * _shifted(x, d, n)
    return y


def matvec(A: SparseOp, x: jax.Array) -> jax.Array:
    if isinstance(A, DenseMatrix):
        return dense_matvec(A, x)
    if type(A).__name__ == "StencilOp":
        from hypre_tpu.ops.stencil_pallas import stencil_matvec_jit

        return stencil_matvec_jit(A, x)
    if isinstance(A, DiaMatrix):
        import jax as _jax

        if _jax.default_backend() in ("tpu", "axon"):
            from hypre_tpu.ops.dia_pallas import dia_matvec_pallas

            return dia_matvec_pallas(A.offsets, A.vals, x, A.n_rows,
                                     A.n_cols)
        return dia_matvec(A, x)
    if isinstance(A, GstEllMatrix):
        import jax as _jax

        from hypre_tpu.ops.gstell import (
            gstell_matvec_jit, gstell_matvec_reference,
        )

        if _jax.default_backend() in ("tpu", "axon"):
            # the inner jit makes the pallas kernel trace ONCE per
            # (c, G, ch_step, shape) config: retracing the kernel body
            # inside a large outer trace (amg_cycle/pcg) measured
            # ~22 s per call site vs 1.7 s standalone
            return gstell_matvec_jit(A, x)
        return gstell_matvec_reference(A, x)
    return ell_matvec(A, x)


def matmat(A: SparseOp, X: jax.Array) -> jax.Array:
    """Y = A @ X for a multivector X of shape (n, nv) — the NV-batched
    SpMV (ref: src/seq_mv/csr_spmv_device.c:35, the NV template
    parameter; hypre_Vector multivector fields seq_mv/vector.h).

    ELL and DIA batch natively (the gather/shift indexes rows, the nv
    axis rides along on lanes); dense is one MXU matmul; GST-ELL
    vmaps its Pallas kernel over columns.
    """
    if X.ndim == 1:
        return matvec(A, X)
    if isinstance(A, DenseMatrix):
        xp = jnp.pad(X.astype(A.vals.dtype),
                     ((0, A.vals.shape[1] - X.shape[0]), (0, 0)))
        return jnp.dot(A.vals, xp,
                       preferred_element_type=A.vals.dtype)[:A.n_rows]
    if isinstance(A, DiaMatrix):
        n = A.n_rows
        y = jnp.zeros((n, X.shape[1]), dtype=A.vals.dtype)
        for k, d in enumerate(A.offsets):
            n_cols = X.shape[0]
            lo = max(0, -d)
            start = max(0, d)
            stop = min(n_cols, n + d)
            core = X[start:stop]
            hi = n - lo - core.shape[0]
            if lo or hi:
                core = jnp.pad(core, ((lo, max(hi, 0)), (0, 0)))
            y = y + A.vals[k][:, None] * core[:n]
        return y
    if isinstance(A, EllMatrix):
        gathered = jnp.take(X, A.cols, axis=0)   # (width, n_rows, nv)
        return jnp.sum(A.vals[..., None] * gathered, axis=0)
    return jax.vmap(lambda v: matvec(A, v), in_axes=1, out_axes=1)(X)


def matvec_t(A: EllMatrix, y: jax.Array) -> jax.Array:
    """x = A.T @ y for padded ELL via scatter-add (segment_sum).

    Mirrors hypre's transpose matvec (ref: src/parcsr_mv/
    par_csr_matvec.c:368-480) — used for the restriction R = P^T when an
    explicit transpose is not stored.  Prefer storing R explicitly; this
    exists for completeness and testing.
    """
    contrib = (A.vals * y[None, :]).reshape(-1)
    cols = A.cols.reshape(-1)
    return jax.ops.segment_sum(contrib, cols, num_segments=A.n_cols)


# ---------------------------------------------------------------------------
# Host-side conversions (setup phase, numpy)
# ---------------------------------------------------------------------------

def ell_from_scipy(A, real_dtype=None, min_width: int = 1) -> EllMatrix:
    """Convert a scipy.sparse matrix to padded ELL (host-side, setup)."""
    from hypre_tpu.core.config import get_config

    cfg = get_config()
    real_dtype = real_dtype or cfg.real_dtype
    A = A.tocsr()
    A.sort_indices()
    n_rows, n_cols = A.shape
    row_nnz = np.diff(A.indptr)
    width = max(int(row_nnz.max(initial=0)), min_width)
    cols = np.zeros((n_rows, width), dtype=np.int32)
    vals = np.zeros((n_rows, width), dtype=np.dtype(real_dtype))
    # scatter each row's entries into its padded slots
    slot = np.arange(len(A.indices)) - np.repeat(A.indptr[:-1], row_nnz)
    rows = np.repeat(np.arange(n_rows), row_nnz)
    cols[rows, slot] = A.indices
    vals[rows, slot] = A.data
    return EllMatrix(cols=jnp.asarray(np.ascontiguousarray(cols.T)),
                     vals=jnp.asarray(np.ascontiguousarray(vals.T)),
                     n_cols=int(n_cols))


def dia_from_scipy(A, real_dtype=None, max_diags: int = 40) -> "DiaMatrix | None":
    """Convert to DIA if the matrix is stencil-like, else None."""
    from hypre_tpu.core.config import get_config

    cfg = get_config()
    real_dtype = real_dtype or cfg.real_dtype
    A = A.tocsr()
    n_rows, n_cols = A.shape
    row = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(A.indptr))
    offs = A.indices.astype(np.int64) - row
    # cheap reject before the full unique: a sample of entries already
    # exceeding max_diags distinct offsets proves the full set does too
    if len(offs) > 1 << 20:
        if len(np.unique(offs[:: len(offs) // (1 << 16)])) > max_diags:
            return None
    uniq = np.unique(offs)
    if len(uniq) > max_diags:
        return None
    vals = np.zeros((len(uniq), n_rows), dtype=np.dtype(real_dtype))
    d_idx = np.searchsorted(uniq, offs)
    vals[d_idx, row] = A.data
    return DiaMatrix(vals=jnp.asarray(vals),
                     offsets=tuple(int(d) for d in uniq), n_cols=int(n_cols))


def sparse_op_from_scipy(A, real_dtype=None, prefer_dia: bool = True,
                         dia_max_diags: int = 40,
                         prefer_gstell: bool = True) -> SparseOp:
    """Pick the best TPU format for a matrix (the csr_spmv_device.c:300
    row-group-size dispatch, re-imagined as a format choice):
    dense (MXU) for small operators, GST-ELL (Pallas lane-shuffle
    gather) when the matrix is banded enough, DIA for pure stencils
    when preferred, jnp ELL otherwise."""
    if max(A.shape) <= 2048 and min(A.shape) > 0:
        return dense_from_scipy(A, real_dtype)
    if prefer_dia and A.shape[1] * 4 <= 5 * 1024 * 1024:
        # exact-stencil matrices with a VMEM-resident operand: DIA has
        # zero padding, trivial setup, and a register-shift Pallas
        # kernel.  Larger stencils go to GST-ELL, whose windowed-DMA
        # path is the proven one (the windowed DIA kernel faults).
        D = dia_from_scipy(A, real_dtype, max_diags=32)
        if D is not None and A.nnz >= 0.5 * len(D.offsets) * A.shape[0]:
            return D
    if prefer_gstell:
        from hypre_tpu.ops.gstell import gstell_from_scipy

        Gm = gstell_from_scipy(A, real_dtype)
        if Gm is not None:
            return Gm
    if prefer_dia:
        D = dia_from_scipy(A, real_dtype, max_diags=dia_max_diags)
        if D is not None:
            return D
    return ell_from_scipy(A, real_dtype)
