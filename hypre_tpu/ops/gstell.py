"""GST-ELL: grouped-slot transposed ELL — the core Pallas SpMV format.

Motivation (measured on TPU v5e): XLA's HBM gather runs at scalar
speed (~145 ns/element), making a plain ELL SpMV ~70x slower than the
memory system allows.  The one fast dynamic-indexing primitive Mosaic
exposes is `tpu.dynamic_gather` on a single (8, 128) vreg: a lane
shuffle, where each output lane picks any lane of its own sublane.

GST-ELL is an SpMV formulation built around that primitive plus the
structure of AMG operators (they are banded: grid locality survives
PMIS coarsening and the Galerkin product):

* Entries are CLUSTERED by column offset (col - row, scaled for
  rectangular operators).  A 3D coarse operator has a handful of
  offset clusters — the macro-stencil (e.g. 7 clusters on the first
  coarse level of a 7-pt problem).  Within one cluster and one chunk
  of 128 consecutive rows, columns span only a few hundred indices.
* Layout is TRANSPOSED: lanes = 128 rows of a chunk, sublanes = up to
  8 slot ranks of a cluster ("octet").  Each (chunk, octet group) gets
  one 128-aligned window base (prefetched to SMEM).
* The kernel slices the x-window (c x 128 values, c static and small),
  then gathers 1024 operands per lane-shuffle:
      for w < c: g = dynamic_gather(bcast(win[w]), loc & 127)
                 acc = where(loc >> 7 == w, g, acc)
  followed by an FMA and a cross-sublane reduction into the 128 row
  sums.  DIA is the degenerate case (spread 0); the same kernel serves
  every AMG level, interpolation, and restriction operator.

This plays the role of hypre's device SpMV row-group tuning
(ref: src/seq_mv/csr_spmv_device.c:300-381) — the shape-driven knobs
here are (clusters, octet groups G, window width c).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

GAP = 64          # offset-gap threshold that splits clusters
CHUNK = 128       # rows per chunk (one lane dim)
CH_STEP = 8       # chunks per pallas grid step
MAX_C = 32        # max window width (x128); above -> no GST-ELL
MAX_G = 40        # max octet groups; above -> no GST-ELL
VMEM_X_LIMIT = 6 * 1024 * 1024


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "w0", "locs", "vals"],
         meta_fields=["n_rows", "n_cols", "c", "g", "x_rows", "resident",
                      "ext", "nnz"])
@dataclasses.dataclass(frozen=True)
class GstEllMatrix:
    """base: int32[n_steps, CH_STEP, G]  window base row (of x2d) per
             (chunk, group); prefetched to SMEM
    w0:   int32[n_steps]                per-step x window start
                                        (windowed mode)
    locs: int32[n_steps, CH_STEP, 8*G, 128] local offsets in [0,128c)
    vals: real [same]                   0 in padding slots
    """

    base: jax.Array
    w0: jax.Array
    locs: jax.Array
    vals: jax.Array
    n_rows: int
    n_cols: int
    c: int
    g: int
    x_rows: int
    resident: bool
    ext: int
    nnz: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


def gstell_from_scipy(A, real_dtype=None):
    """Host-side packing.  Returns None when the matrix does not fit
    the format limits (caller falls back to jnp ELL)."""
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    A = A.tocsr()
    A.sort_indices()
    n_rows, n_cols = A.shape
    if A.nnz == 0 or n_rows == 0:
        return None
    x_rows = max(-(-n_cols // 128), 1)
    coo = A.tocoo()
    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    dat = coo.data

    # --- offset clustering ------------------------------------------
    d = col - (row * n_cols) // max(n_rows, 1)
    ud = np.unique(d)
    cl_of_ud = np.concatenate([[0], np.cumsum(np.diff(ud) > GAP)])
    n_clusters = int(cl_of_ud[-1]) + 1
    if n_clusters > MAX_G:
        return None
    ecl = cl_of_ud[np.searchsorted(ud, d)]

    # --- rank within (row, cluster) ---------------------------------
    # entries are sorted by (row, col); within a (row, cluster) they
    # are contiguous, so rank = position - first position
    key = row * n_clusters + ecl
    order = np.argsort(key, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    ks = key[order]
    uk, first = np.unique(ks, return_index=True)
    rank_sorted = np.arange(len(ks)) - first[np.searchsorted(uk, ks)]
    rank = rank_sorted[inv]

    # per-cluster max rank -> octet groups
    m_j = np.zeros(n_clusters, dtype=np.int64)
    ecl_order = np.argsort(ecl, kind="stable")
    uecl, estarts = np.unique(ecl[ecl_order], return_index=True)
    m_j[uecl] = np.maximum.reduceat((rank + 1)[ecl_order], estarts)
    octs = -(-m_j // 8)
    G = int(octs.sum())
    if G == 0 or G > MAX_G:
        return None
    oct_start = np.concatenate([[0], np.cumsum(octs)])[:-1]  # per cluster

    # slot coordinates
    group = oct_start[ecl] + rank // 8          # octet group id
    sub = rank % 8                               # sublane within group
    chunk = row // CHUNK
    lane = row % CHUNK
    n_chunks = -(-n_rows // CHUNK)
    n_steps = -(-n_chunks // CH_STEP)
    n_chunks_pad = n_steps * CH_STEP

    # --- per (chunk, group) window base -----------------------------
    cg = chunk * G + group
    # per-(chunk,group) min/max column via sort + reduceat
    # (np.minimum.at is a scalar loop — minutes at 10^8 entries)
    cg_order = np.argsort(cg, kind="stable")
    cg_s = cg[cg_order]
    col_s = col[cg_order]
    uniq_cg, starts = np.unique(cg_s, return_index=True)
    cmin = np.zeros(n_chunks_pad * G, dtype=np.int64)
    cmax = np.zeros(n_chunks_pad * G, dtype=np.int64)
    cmin[uniq_cg] = np.minimum.reduceat(col_s, starts)
    cmax[uniq_cg] = np.maximum.reduceat(col_s, starts)
    used = np.zeros(n_chunks_pad * G, dtype=bool)
    used[uniq_cg] = True
    base = cmin // 128
    spread = cmax - base * 128
    c = int(np.ceil((spread.max(initial=0) + 1) / 128.0))
    c = max(c, 1)
    if c > MAX_C:
        return None
    base = np.minimum(base, max(x_rows - c, 0))
    # unused (chunk, group) slots must not widen the per-step window:
    # fill them with a used base from the same chunk (else the padded
    # tail chunks would anchor windows at 0 while real rows sit at the
    # top of x, making ext span the whole vector)
    used2 = used.reshape(n_chunks_pad, G)
    base2 = base.reshape(n_chunks_pad, G)
    chunk_any = used2.any(axis=1)
    chunk_min = np.where(
        chunk_any,
        np.where(used2, base2, np.iinfo(np.int64).max).min(axis=1), -1)
    # forward/backward fill for fully-empty chunks
    if chunk_any.any():
        idx = np.where(chunk_any, np.arange(n_chunks_pad), -1)
        np.maximum.accumulate(idx, out=idx)
        first = np.flatnonzero(chunk_any)[0]
        idx[idx < 0] = first
        chunk_fill = chunk_min[idx]
    else:
        chunk_fill = np.zeros(n_chunks_pad, dtype=np.int64)
    base2 = np.where(used2, base2, chunk_fill[:, None])
    base = base2.reshape(-1)
    loc_all = col - base[cg] * 128
    if loc_all.max(initial=0) >= 128 * c:
        c = int(np.ceil((loc_all.max() + 1) / 128.0))
        if c > MAX_C:
            return None

    # --- pack arrays -------------------------------------------------
    locs = np.zeros((n_chunks_pad, 8 * G, CHUNK), dtype=np.int32)
    vals = np.zeros((n_chunks_pad, 8 * G, CHUNK), dtype=real_dtype)
    locs[chunk, group * 8 + sub, lane] = loc_all.astype(np.int32)
    vals[chunk, group * 8 + sub, lane] = dat

    base = base.reshape(n_chunks_pad, G)
    # per-step window geometry (windowed mode)
    base_steps = base.reshape(n_steps, CH_STEP, G)
    w0 = base_steps.reshape(n_steps, -1).min(axis=1)
    ext = int((base_steps.reshape(n_steps, -1).max(axis=1) - w0)
              .max(initial=0)) + c
    ext = min(ext, x_rows)
    w0 = np.minimum(w0, max(x_rows - ext, 0))

    resident = x_rows * 128 * real_dtype.itemsize <= VMEM_X_LIMIT
    if not resident and ext * 128 * real_dtype.itemsize > 8 * 1024 * 1024:
        return None  # window would not fit VMEM; fall back

    return GstEllMatrix(
        base=jnp.asarray(base_steps.astype(np.int32)),
        w0=jnp.asarray(w0.astype(np.int32)),
        locs=jnp.asarray(locs.reshape(n_steps, CH_STEP, 8 * G, CHUNK)),
        vals=jnp.asarray(vals.reshape(n_steps, CH_STEP, 8 * G, CHUNK)),
        n_rows=int(n_rows), n_cols=int(n_cols), c=int(c), g=G,
        x_rows=int(x_rows), resident=bool(resident), ext=int(ext),
        nnz=int(A.nnz),
    )


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _gather_win(win, locs_blk, c, dtype):
    """(8,128) gather from a (c,128) window: c lane-shuffles + selects."""
    lane = jnp.bitwise_and(locs_blk, 127)
    sub = jnp.right_shift(locs_blk, 7)
    acc = None
    for w in range(c):
        tbl = jnp.broadcast_to(win[w].reshape(1, 128), (8, 128))
        gw = jnp.take_along_axis(tbl, lane, axis=1)
        acc = gw if acc is None else jnp.where(sub == w, gw, acc)
    return acc


def _chunk_body(base_get, locs_row, vals_row, x_like, c, G, dtype):
    """Accumulate one chunk's 128 row sums.

    base_get: g -> scalar window base; x_like: b -> (c,128) window."""
    total = jnp.zeros((8, 128), dtype=dtype)
    for g in range(G):
        win = x_like(base_get(g))
        locs_blk = locs_row[g * 8:(g + 1) * 8, :]
        gat = _gather_win(win, locs_blk, c, dtype)
        total = total + vals_row[g * 8:(g + 1) * 8, :] * gat
    return jnp.sum(total, axis=0)


def gstell_matvec(A: GstEllMatrix, x: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = A.locs.shape[0]
    G, c = A.g, A.c
    dtype = A.vals.dtype
    npad = A.x_rows * 128
    x2d = jnp.pad(x.astype(dtype), (0, npad - A.n_cols)).reshape(
        A.x_rows, 128)

    if A.resident:
        def kernel(base_ref, locs_ref, vals_ref, x_ref, y_ref):
            for ch in range(CH_STEP):
                y_ref[0, ch, :] = _chunk_body(
                    lambda g: base_ref[0, ch, g],
                    locs_ref[0, ch], vals_ref[0, ch],
                    lambda b: x_ref[pl.ds(b, c), :], c, G, dtype)

        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_steps, CH_STEP, CHUNK), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, CH_STEP, G), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH_STEP, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH_STEP, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((A.x_rows, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CH_STEP, CHUNK),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(A.base, A.locs, A.vals, x2d)
    else:
        ext = A.ext

        def kernel_w(base_ref, w0_ref, locs_ref, vals_ref, x_hbm, y_ref,
                     win, sem):
            w0 = w0_ref[0, 0, 0]
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, ext), :], win, sem)
            cp.start()
            cp.wait()
            for ch in range(CH_STEP):
                y_ref[0, ch, :] = _chunk_body(
                    lambda g: base_ref[0, ch, g] - w0,
                    locs_ref[0, ch], vals_ref[0, ch],
                    lambda b: win[pl.ds(b, c), :], c, G, dtype)

        y = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct((n_steps, CH_STEP, CHUNK), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, CH_STEP, G), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH_STEP, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH_STEP, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, CH_STEP, CHUNK),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ext, 128), dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(A.base, A.w0.reshape(-1, 1, 1), A.locs, A.vals, x2d)

    return y.reshape(-1)[:A.n_rows]


def gstell_matvec_reference(A: GstEllMatrix, x: jax.Array) -> jax.Array:
    """Pure-jnp semantics of the kernel (CPU tests / fallback)."""
    dtype = A.vals.dtype
    npad = A.x_rows * 128
    xp = jnp.pad(x.astype(dtype), (0, npad - A.n_cols))
    n_steps, CH, S, L = A.locs.shape
    G = A.g
    # absolute flat index = base*128 + loc
    base = jnp.repeat(A.base, 8, axis=2).reshape(n_steps, CH, S, 1)
    flat = base.astype(jnp.int64) * 128 + A.locs
    gat = jnp.take(xp, flat.reshape(-1), axis=0).reshape(flat.shape)
    y = jnp.sum(A.vals * gat, axis=2)  # sum over slots
    return y.reshape(-1)[:A.n_rows]
