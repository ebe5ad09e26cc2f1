"""Distributed ParCSR matrix/vector over a device mesh.

The hypre_ParCSRMatrix analog (ref: src/parcsr_mv/par_csr_matrix.h:
27-86): each shard owns a contiguous block of rows, stored as

  diag: ELL block whose columns are LOCAL row indices (owned cols)
  offd: ELL block whose columns index the shard's ghost buffer,
        compressed exactly like hypre's col_map_offd
  comm: the ppermute CommPkg that fills the ghost buffer

but laid out as dense arrays with a leading shard axis
(n_shards, n_local, width) so one SPMD program (shard_map over mesh
axis "p") operates on every shard.  The distributed matvec
(ref: src/parcsr_mv/par_csr_matvec.c:21-235) is then:

  ghost = exchange(x_loc, comm)      # ppermute rounds on ICI
  y = diag @ x_loc + offd @ ghost    # XLA overlaps diag with exchange

Rectangular operators (interpolation P, restriction R) carry separate
row/column partitions; the ghost exchange runs over the COLUMN
partition's vectors.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.parallel.comm import CommPkg, build_comm_pkg, exchange
from hypre_tpu.parallel.partition import RowPartition


@partial(jax.tree_util.register_dataclass,
         data_fields=["diag_cols", "diag_vals", "offd_cols", "offd_vals",
                      "comm"],
         meta_fields=["row_part", "col_part"])
@dataclasses.dataclass(frozen=True)
class ParCSR:
    """Sharded sparse matrix in split diag/offd padded-ELL form.

    diag_cols: int32[n_shards, n_local, Kd]  local column indices
    diag_vals: real [n_shards, n_local, Kd]
    offd_cols: int32[n_shards, n_local, Ko]  ghost-buffer indices
    offd_vals: real [n_shards, n_local, Ko]
    comm:      CommPkg over the column partition
    row_part / col_part: static RowPartition metadata
    """

    diag_cols: jax.Array
    diag_vals: jax.Array
    offd_cols: jax.Array
    offd_vals: jax.Array
    comm: CommPkg
    row_part: RowPartition
    col_part: RowPartition


def parcsr_from_scipy(A, n_shards: int, real_dtype=None,
                      row_part: RowPartition | None = None,
                      col_part: RowPartition | None = None) -> ParCSR:
    """Host-side conversion of a global scipy matrix into ParCSR form.

    Pads rows/cols up to equal shard sizes; padded rows are identity
    rows on the diagonal block (decoupled), so they never affect the
    solution or inner products driven by zero-padded vectors.
    """
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    A = A.tocsr()
    n_rows, n_cols = A.shape
    rp = row_part or RowPartition.create(n_rows, n_shards)
    cp_part = col_part or RowPartition.create(n_cols, n_shards)

    diag_blocks = []   # per shard (cols, vals) local
    offd_blocks = []
    ghost_lists = []
    square = n_rows == n_cols and rp.n_local == cp_part.n_local

    for p in range(n_shards):
        r0 = min(p * rp.n_local, n_rows)
        r1 = min(r0 + rp.n_local, n_rows)
        Ablk = A[r0:r1]
        c0 = p * cp_part.n_local
        c1 = c0 + cp_part.n_local
        coo = Ablk.tocoo()
        owned = (coo.col >= c0) & (coo.col < min(c1, n_cols))
        # diag part (local col index)
        d_rows, d_cols = coo.row[owned], coo.col[owned] - c0
        d_vals = coo.data[owned]
        # padding identity rows (square operators only)
        n_real = r1 - r0
        if square and n_real < rp.n_local:
            pad = np.arange(n_real, rp.n_local)
            d_rows = np.concatenate([d_rows, pad])
            d_cols = np.concatenate([d_cols, pad])
            d_vals = np.concatenate([d_vals, np.ones(len(pad), real_dtype)])
        diag_blocks.append((d_rows, d_cols, d_vals, rp.n_local))
        # offd part: compress ghost cols
        o_rows = coo.row[~owned]
        o_gcols = coo.col[~owned]
        o_vals = coo.data[~owned]
        ghosts = np.unique(o_gcols)
        ghost_lists.append(ghosts)
        o_cols = np.searchsorted(ghosts, o_gcols)
        offd_blocks.append((o_rows, o_cols, o_vals, rp.n_local))

    comm = build_comm_pkg(ghost_lists, cp_part, real_dtype)

    dc, dv, kd = _stack_ell(diag_blocks, real_dtype)
    oc, ov, ko = _stack_ell(offd_blocks, real_dtype,
                            n_cols_pad=comm.n_ghost)
    return ParCSR(diag_cols=dc, diag_vals=dv, offd_cols=oc, offd_vals=ov,
                  comm=comm, row_part=rp, col_part=cp_part)


def _stack_ell(blocks, real_dtype, n_cols_pad=None):
    """Stack per-shard COO triples into (n_shards, n_local, K) ELL."""
    width = 1
    for rows, cols, vals, n_local in blocks:
        if len(rows):
            width = max(width, int(np.bincount(rows, minlength=n_local)
                                   .max()))
    n_shards = len(blocks)
    n_local = blocks[0][3]
    cell = np.zeros((n_shards, n_local, width), dtype=np.int32)
    vell = np.zeros((n_shards, n_local, width), dtype=real_dtype)
    for p, (rows, cols, vals, _) in enumerate(blocks):
        if not len(rows):
            continue
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = np.bincount(rows, minlength=n_local)
        slot = np.arange(len(rows)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        cell[p, rows, slot] = cols
        vell[p, rows, slot] = vals
    return jnp.asarray(cell), jnp.asarray(vell), width


def parcsr_from_pardell(M, real_dtype=None) -> ParCSR:
    """Distributed-setup output (par_setup.ParDEll, global cols) ->
    solve-side ParCSR (diag/offd split, ghost-compressed, CommPkg) —
    entirely from the sharded blocks, no global matrix.

    The diag/offd split and ghost compression happen on device (the
    ext remap already IS hypre's col_map_offd compression); square
    operators get identity diag entries on padding rows so padded
    slots stay decoupled through the solve."""
    import jax
    from functools import partial as _partial

    from hypre_tpu.core.config import get_config
    from hypre_tpu.parallel.par_setup import (
        _true_counts, build_level_comm,
    )

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    cols_ext, comm = build_level_comm(M)
    ns, w, nl = cols_ext.shape
    ncl = M.col_part.n_local     # ext boundary is the COLUMN space:
    #                              [0, ncl) local col, ncl+slot ghost
    square = (M.row_part.n_global == M.col_part.n_global
              and nl == ncl)
    counts = jnp.asarray(_true_counts(M.row_part).astype(np.int32))

    @_partial(jax.jit, static_argnames=("kd", "ko", "sq"))
    def split(ce, vals, counts, kd, ko, sq):
        valid = ce >= 0
        isd = valid & (ce < ncl)
        iso = valid & (ce >= ncl)
        # row-major slot ranks per side
        rd = jnp.cumsum(isd.astype(jnp.int32), axis=1) - 1
        ro = jnp.cumsum(iso.astype(jnp.int32), axis=1) - 1
        rows = jnp.broadcast_to(
            jnp.arange(nl, dtype=jnp.int32)[None, None, :], ce.shape)
        sidx = jnp.broadcast_to(
            jnp.arange(ns, dtype=jnp.int32)[:, None, None], ce.shape)

        def scatter(sel, rank, cols_v, K, ncol_pad):
            flat = jnp.where(sel & (rank < K),
                             (sidx * nl + rows) * K + rank,
                             ns * nl * K)
            c = jnp.zeros((ns * nl * K + 1,), jnp.int32).at[
                flat.reshape(-1)].add(
                    jnp.where(sel, cols_v, 0).reshape(-1), mode="drop")
            v = jnp.zeros((ns * nl * K + 1,), jnp.dtype(real_dtype)).at[
                flat.reshape(-1)].add(
                    jnp.where(sel, vals, 0).astype(
                        jnp.dtype(real_dtype)).reshape(-1), mode="drop")
            return (c[:-1].reshape(ns, nl, K),
                    v[:-1].reshape(ns, nl, K))

        dc, dv = scatter(isd, rd, jnp.where(isd, ce, 0), kd, nl)
        oc, ov = scatter(iso, ro, jnp.where(iso, ce - ncl, 0), ko,
                         comm.n_ghost)
        if sq:
            # identity rows on padding slots (decoupled)
            rowi = jnp.arange(nl, dtype=jnp.int32)[None, :]
            pad_row = rowi >= counts[:, None]
            dc = dc.at[:, :, 0].set(
                jnp.where(pad_row, rowi, dc[:, :, 0]))
            dv = dv.at[:, :, 0].set(
                jnp.where(pad_row, jnp.asarray(1.0, dv.dtype),
                          dv[:, :, 0]))
        return dc, dv, oc, ov

    # width sync (max entries per row per side)
    @jax.jit
    def widths(ce):
        valid = ce >= 0
        return (jnp.max(jnp.sum((valid & (ce < ncl)).astype(jnp.int32),
                                axis=1)),
                jnp.max(jnp.sum((valid & (ce >= ncl)).astype(jnp.int32),
                                axis=1)))

    kd_d, ko_d = widths(cols_ext)
    kd = max(int(kd_d), 1)
    ko = max(int(ko_d), 1)
    dc, dv, oc, ov = split(cols_ext, M.vals, counts, kd, ko, square)
    return ParCSR(diag_cols=dc, diag_vals=dv, offd_cols=oc,
                  offd_vals=ov, comm=comm, row_part=M.row_part,
                  col_part=M.col_part)


# ---------------------------------------------------------------------------
# SPMD kernels (run inside shard_map; arrays carry leading shard axis 1)
# ---------------------------------------------------------------------------

def par_matvec(A: ParCSR, x_loc: jax.Array) -> jax.Array:
    """y_loc = A @ x (distributed).  x_loc is this shard's slice of the
    column-partitioned operand (n_local_col,).  Must run inside a
    shard_map over A.comm.axis_name."""
    ghost = exchange(x_loc, A.comm)
    y = jnp.sum(A.diag_vals[0] * jnp.take(x_loc, A.diag_cols[0], axis=0),
                axis=1)
    y = y + jnp.sum(A.offd_vals[0] * jnp.take(ghost, A.offd_cols[0], axis=0),
                    axis=1)
    return y


def par_dot(x_loc, y_loc, axis_name="p"):
    """Global inner product: local dot + psum (the MPI_Allreduce of
    hypre_ParVectorInnerProd, ref: src/parcsr_mv/par_vector.c:513)."""
    return jax.lax.psum(jnp.vdot(x_loc, y_loc), axis_name)


@dataclasses.dataclass(frozen=True)
class ParStencilOp:
    """Matrix-free distributed stencil operator (fine level).

    The multi-chip twin of ops/stencil_pallas.StencilOp: when the fine
    operator is a known constant stencil on an (nx, ny, nz) x-fastest
    grid and rows are sharded in contiguous slabs, the matvec is
    shifted-slice FMAs over a halo-extended local vector — zero stored
    operator, zero gathers, and the halo is one ppermute pair instead
    of the ELL ghost machinery.  hypre's analog is the stored-CSR SpMV
    (ref: src/parcsr_mv/par_csr_matvec.c:21-235); this trades the
    operator traffic away entirely, the same honesty caveat as the
    single-chip bench fine level.

    Fully static (hashable) — lives in ParAmgLevel's meta fields.
    """

    shape: tuple            # (nx, ny, nz)
    arms: tuple             # ((dx, dy, dz), val) pairs, nonzero vals
    n_local: int
    n_shards: int
    axis_name: str = "p"

    @property
    def maxdisp(self) -> int:
        nx, ny, _ = self.shape
        return max(abs(dx + nx * (dy + ny * dz))
                   for (dx, dy, dz), _ in self.arms)


def par_stencil_matvec(op: ParStencilOp, x_loc: jax.Array) -> jax.Array:
    """y_loc = A @ x for the stencil operator; must run inside a
    shard_map over op.axis_name.  Halo = the maxdisp-entry tails/heads
    of the slab neighbors via two ppermutes (devices with no source
    receive zeros, which the Dirichlet boundary masks ignore)."""
    nx, ny, nz = op.shape
    n = nx * ny * nz
    nl = op.n_local
    m = min(op.maxdisp, nl)
    ns = op.n_shards
    ax = op.axis_name
    if ns > 1:
        lo = jax.lax.ppermute(x_loc[-m:], ax,
                              [(i, i + 1) for i in range(ns - 1)])
        hi = jax.lax.ppermute(x_loc[:m], ax,
                              [(i + 1, i) for i in range(ns - 1)])
    else:
        lo = jnp.zeros((m,), x_loc.dtype)
        hi = jnp.zeros((m,), x_loc.dtype)
    xext = jnp.concatenate([lo, x_loc, hi])
    r0 = jax.lax.axis_index(ax) * nl
    lin = r0 + jnp.arange(nl, dtype=jnp.int32)
    gx = lin % nx
    gy = (lin // nx) % ny
    gz = lin // (nx * ny)
    y = jnp.zeros_like(x_loc)
    for (dx, dy, dz), v in op.arms:
        d = dx + nx * (dy + ny * dz)
        ok = ((lin < n) & (gx + dx >= 0) & (gx + dx < nx)
              & (gy + dy >= 0) & (gy + dy < ny)
              & (gz + dz >= 0) & (gz + dz < nz))
        seg = jax.lax.dynamic_slice(xext, (m + d,), (nl,))
        y = y + jnp.where(ok, jnp.asarray(v, x_loc.dtype), 0) * seg
    return y


# ---------------------------------------------------------------------------
# Host helpers
# ---------------------------------------------------------------------------

def shard_vector(v: np.ndarray, part: RowPartition) -> np.ndarray:
    """Pad + reshape a global vector to (n_shards, n_local)."""
    out = np.zeros((part.n_padded,), dtype=v.dtype)
    out[:part.n_global] = v
    return out.reshape(part.n_shards, part.n_local)


def unshard_vector(v, part: RowPartition) -> np.ndarray:
    return np.asarray(v).reshape(-1)[:part.n_global]
