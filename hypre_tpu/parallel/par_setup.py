"""Distributed (mesh-sharded) BoomerAMG setup.

Round-4 core feature: the AMG hierarchy is built WITHOUT ever
materializing a global level in one shard's memory.  Each level lives
as per-shard slot-major blocks with a leading shard axis, all
cross-shard data moves through the CommPkg's ppermute rounds (halo =
O(surface), never O(volume)), and the host orchestrates only O(ghost)
metadata (ghost id lists, width maxima, coarse counts) — exactly the
role MPI rendezvous + Allreduce play in the reference.

Stage map against hypre's distributed setup
(ref: src/parcsr_ls/par_amg_setup.c:990-3155):

  hypre (ref)                              here
  --------------------------------------   ---------------------------
  ParCSR diag/offd + col_map_offd          ParDEll: slot-major blocks,
  (par_csr_matrix.h:27-86)                 GLOBAL cols, ext remap
  hypre_MatvecCommPkgCreate                discover_ghosts + CommPkg
  (par_csr_communication.c:1163)           (ppermute schedule)
  hypre_ParCSRMatrixExtractBExt            exchange_mat of row payloads
  (par_csr_matrix.c)                       (cols/vals/flags)
  par PMIS w/ outer-boundary exchange      par_pmis: halo gather +
  (par_coarsen.c:2101 / _device.c:30)      exchange_rev scatter rounds
  BuildDirInterp / BuildExtPIInterp        par_direct_interp /
  (par_interp.c:1948, par_lr_interp.c)     par_extpi_interp (ghost rows)
  par RAP via triple mat + row sends       par_spgemm + par_transpose +
  (par_csr_triplemat.c:473)                exchange_rev_rows merge
  coarse row_starts (unequal)              GenPartition (no rebalance)

CF selection is bit-identical to the single-chip DEVICE path: PMIS
measures use the 32-bit global-id hash (device_amg.pmis_hash32), so
the distributed hierarchy's C/F split, coarse numbering (shard-major
== global ascending) and sparsity patterns EQUAL the single-chip
device hierarchy's — tests/test_par_setup.py asserts level-by-level
equality.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hypre_tpu.parallel.comm import (
    CommPkg, build_comm_pkg, exchange, exchange_mat, exchange_rev,
)
from hypre_tpu.parallel.partition import GenPartition

C_PT = 1
F_PT = -1
SF_PT = -3
_BIG = np.int32(2 ** 30)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals"],
         meta_fields=["row_part", "col_part"])
@dataclasses.dataclass(frozen=True)
class ParDEll:
    """Sharded slot-major padded ELL with GLOBAL column ids.

    cols: int32[n_shards, w, n_local]   global col ids, -1 padding
    vals: real [n_shards, w, n_local]
    row_part / col_part: RowPartition or GenPartition (static)

    Local slot i of shard p is global row `starts[p] + i` (slots past
    the shard's true count are empty padding rows).
    """

    cols: jax.Array
    vals: jax.Array
    row_part: object
    col_part: object

    @property
    def n_shards(self) -> int:
        return self.cols.shape[0]

    @property
    def width(self) -> int:
        return self.cols.shape[1]

    @property
    def n_local(self) -> int:
        return self.cols.shape[2]


def _starts(part) -> np.ndarray:
    """Clipped true start offsets (RowPartition's padded tail folds
    into n_global; GenPartition starts are already true)."""
    s = np.asarray(part.shard_starts(), dtype=np.int64)
    return np.minimum(s, part.n_global)


def _true_counts(part) -> np.ndarray:
    s = _starts(part)
    return s[1:] - s[:-1]


def pardell_from_scipy(A, part, col_part=None, real_dtype=np.float64,
                       width: int | None = None) -> ParDEll:
    """Host conversion (tests / fine-level ingestion)."""
    A = A.tocsr()
    A.sort_indices()
    col_part = col_part or part
    ns, nl = part.n_shards, part.n_local
    starts = _starts(part)
    w = width or max(int(np.diff(A.indptr).max(initial=0)), 1)
    cols = np.full((ns, w, nl), -1, dtype=np.int32)
    vals = np.zeros((ns, w, nl), dtype=np.dtype(real_dtype))
    for p in range(ns):
        r0, r1 = int(starts[p]), int(starts[p + 1])
        blk = A[r0:r1]
        rn = np.diff(blk.indptr)
        rows = np.repeat(np.arange(r1 - r0), rn)
        slot = np.arange(blk.nnz) - np.repeat(blk.indptr[:-1], rn)
        cols[p, slot, rows] = blk.indices
        vals[p, slot, rows] = blk.data
    return ParDEll(cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                   row_part=part, col_part=col_part)


def pardell_to_scipy(M: ParDEll):
    """Gather to a global scipy matrix (tests only)."""
    import scipy.sparse as sp

    cols = np.asarray(M.cols)
    vals = np.asarray(M.vals)
    starts = _starts(M.row_part)
    ns, w, nl = cols.shape
    rows_g = (starts[:ns, None, None]
              + np.arange(nl)[None, None, :]).astype(np.int64)
    rows_g = np.broadcast_to(rows_g, cols.shape)
    counts = _true_counts(M.row_part)
    real_row = (np.arange(nl)[None, None, :] < counts[:, None, None])
    mask = (cols >= 0) & real_row
    A = sp.csr_matrix(
        (vals[mask].astype(np.float64), (rows_g[mask], cols[mask])),
        shape=(M.row_part.n_global, M.col_part.n_global))
    A.sum_duplicates()
    A.sort_indices()
    return A


# ---------------------------------------------------------------------------
# ghost discovery + ext remap
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("wg",))
def _ghost_compact(cols, starts_dev, wg):
    """Per shard: sorted unique off-owner global cols, compacted to
    (ns, wg) with _BIG padding, plus counts (ns,).  Pure sort/scan —
    the device half of hypre_MatvecCommPkgCreate."""
    ns, w, nl = cols.shape
    own_lo = starts_dev[:-1][:, None, None]
    own_hi = starts_dev[1:][:, None, None]
    off = (cols >= 0) & ((cols < own_lo) | (cols >= own_hi))
    key = jnp.where(off, cols, _BIG).reshape(ns, w * nl)
    s = jnp.sort(key, axis=1)
    prev = jnp.concatenate(
        [jnp.full((ns, 1), -1, s.dtype), s[:, :-1]], axis=1)
    uniq = (s < _BIG) & (s != prev)
    counts = jnp.sum(uniq, axis=1)
    rank = jnp.cumsum(uniq, axis=1) - 1
    tgt = jnp.where(uniq, jnp.minimum(rank, wg - 1), wg)
    srows = jnp.broadcast_to(
        jnp.arange(ns, dtype=jnp.int32)[:, None], s.shape)
    out = jnp.full((ns * (wg + 1),), _BIG, jnp.int32).at[
        (srows * (wg + 1) + tgt).reshape(-1)].min(
            s.reshape(-1), mode="drop")
    return out.reshape(ns, wg + 1)[:, :wg], counts


def discover_ghosts(M: ParDEll):
    """(ghost_gids (ns, Wg) numpy, _BIG padded; counts numpy)."""
    starts_dev = jnp.asarray(_starts(M.col_part))
    wg = 128
    while True:
        gids, counts = _ghost_compact(M.cols, starts_dev, wg)
        counts = np.asarray(counts)
        if counts.max(initial=0) <= wg:
            return np.asarray(gids), counts
        wg = int(1 << int(counts.max() - 1).bit_length())


@partial(jax.jit, static_argnames=("n_local",))
def _remap_ext(cols, ghosts_dev, starts_dev, n_local):
    """Global cols -> ext ids: [0, nl) local, nl + ghost slot."""
    own_lo = starts_dev[:-1][:, None, None]
    own_hi = starts_dev[1:][:, None, None]
    valid = cols >= 0
    local = valid & (cols >= own_lo) & (cols < own_hi)
    loc_idx = (cols - own_lo).astype(jnp.int32)
    gslot = jax.vmap(
        lambda g, c: jnp.searchsorted(g, c.reshape(-1)).reshape(c.shape)
    )(ghosts_dev, jnp.where(valid & ~local, cols, -1)).astype(jnp.int32)
    ext = jnp.where(local, loc_idx, n_local + gslot)
    return jnp.where(valid, ext, -1)


def build_level_comm(M: ParDEll, axis_name="p"):
    """Ghost discovery + CommPkg + ext-remapped cols for one operator.
    Returns (cols_ext, cp)."""
    ghosts, counts = discover_ghosts(M)
    ghost_lists = [ghosts[p, :counts[p]].astype(np.int64)
                   for p in range(M.n_shards)]
    cp = build_comm_pkg(ghost_lists, M.col_part,
                        np.dtype(np.asarray(M.vals).dtype),
                        axis_name=axis_name)
    gpad = np.full((M.n_shards, cp.n_ghost), _BIG, np.int32)
    for p in range(M.n_shards):
        gpad[p, :counts[p]] = ghost_lists[p]
    cols_ext = _remap_ext(M.cols, jnp.asarray(gpad),
                          jnp.asarray(_starts(M.col_part)),
                          M.col_part.n_local)
    return cols_ext, cp


# ---------------------------------------------------------------------------
# shard_map plumbing
# ---------------------------------------------------------------------------

def _smap_fn(mesh, fn, args, out_specs, axis="p"):
    """Build the jitted shard_map for a per-shard kernel ONCE; callers
    that invoke the same kernel repeatedly (the PMIS round loop) must
    reuse the returned callable — re-wrapping per call makes jax
    re-trace (and behind the relay re-issue remote_compile) every
    round."""
    specs = tuple(P(axis, *([None] * (np.ndim(a) - 1))) for a in args)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=specs, out_specs=out_specs,
        check_vma=False))


def _smap(mesh, fn, args, out_specs, axis="p"):
    """shard_map a per-shard kernel over stacked arrays (axis 0).
    Kernel sees leading length-1 shard dims; scalar outputs use P()."""
    return _smap_fn(mesh, fn, args, out_specs, axis)(*args)


def _sp(axis, nd):
    return P(axis, *([None] * (nd - 1)))


def _cp_args(cp: CommPkg):
    return (cp.send_idx, cp.send_mask, cp.recv_idx)


def _cp_local(cp: CommPkg, si, sm, ri):
    return dataclasses.replace(cp, send_idx=si, send_mask=sm,
                               recv_idx=ri)


def _gids_stacked(part) -> jnp.ndarray:
    starts = np.asarray(part.shard_starts(), dtype=np.int64)
    ns, nl = part.n_shards, part.n_local
    return jnp.asarray(starts[:ns, None] + np.arange(nl)[None, :]) \
        .astype(jnp.int32)


def _real_rows(part) -> jnp.ndarray:
    counts = _true_counts(part)
    return jnp.asarray(np.arange(part.n_local)[None, :]
                       < counts[:, None])


# ---------------------------------------------------------------------------
# strength (row-local, no comm)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("theta", "max_row_sum"))
def par_strength(cols_ext, vals, *, theta=0.25, max_row_sum=0.9):
    """Strong mask per shard (semantics of par_strength.c:531; the
    diag entry is ext id == local row slot)."""
    ns, w, nl = cols_ext.shape
    row = jnp.arange(nl, dtype=jnp.int32)[None, None, :]
    valid = cols_ext >= 0
    is_diag = valid & (cols_ext == row)
    offd = valid & ~is_diag
    v = vals
    diag = jnp.sum(jnp.where(is_diag, v, 0), axis=1)
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    scale_max = jnp.max(jnp.where(offd, v, -big), axis=1)
    scale_min = jnp.min(jnp.where(offd, v, big), axis=1)
    d_neg = diag < 0
    row_scale = jnp.where(d_neg, scale_max, scale_min)
    row_sum = jnp.sum(jnp.where(valid, v, 0), axis=1)
    if max_row_sum < 1.0:
        weak_all = jnp.abs(row_sum) > jnp.abs(diag) * max_row_sum
    else:
        weak_all = jnp.zeros((ns, nl), bool)
    thresh = (theta * row_scale)[:, None, :]
    strong = jnp.where(d_neg[:, None, :], v > thresh, v < thresh)
    return strong & offd & ~weak_all[:, None, :]


# ---------------------------------------------------------------------------
# PMIS (halo gather + reverse scatter rounds)
# ---------------------------------------------------------------------------

def par_pmis(cols_ext, strong, cp: CommPkg, row_part, mesh,
             seed: int = 2747, axis="p"):
    """Distributed PMIS (ref: par_coarsen.c:2101 + the outer-boundary
    exchanges of par_coarsen_device.c:30).  Bit-identical CF to the
    single-chip device path: measures use pmis_hash32 of the GLOBAL
    row id, so the C/F split is invariant to the sharding.  One
    boolean sync per selection round (hypre allreduces the unassigned
    count the same way)."""
    from hypre_tpu.setup.device_amg import pmis_hash32

    ns, w, nl = cols_ext.shape
    gids = _gids_stacked(row_part)
    real = _real_rows(row_part)

    def init_kernel(ce, st, gid, rl, si, sm, ri):
        ce, st, gid, rl = ce[0], st[0], gid[0], rl[0]
        cpl = _cp_local(cp, si, sm, ri)
        # |S^T| column degree: local scatter + reverse halo add
        acc = jnp.zeros((nl + cp.n_ghost + 1,), jnp.float32).at[
            jnp.where(st, ce, nl + cp.n_ghost).reshape(-1)].add(
                st.astype(jnp.float32).reshape(-1), mode="drop")
        st_deg = acc[:nl] + exchange_rev(acc[nl:nl + cp.n_ghost],
                                         cpl, nl)
        measure = st_deg + pmis_hash32(gid, seed)
        # isolated = empty S row (host pmis semantics); padding rows
        # are SF too so they never enter the selection
        isolated = ~jnp.any(st, axis=0)
        cf0 = jnp.where(isolated | ~rl, jnp.int32(SF_PT), jnp.int32(0))
        measure = jnp.where(cf0 == SF_PT, 0.0, measure)
        return cf0[None], measure[None]

    cf, m = _smap(mesh, init_kernel,
                  (cols_ext, strong, gids, real, *_cp_args(cp)),
                  (_sp(axis, 2), _sp(axis, 2)), axis)

    def round_kernel(ce, st, gid, cf, m, si, sm, ri):
        ce, st, gid, cf, m = ce[0], st[0], gid[0], cf[0], m[0]
        cpl = _cp_local(cp, si, sm, ri)

        def gat(x, fill):
            xe = jnp.concatenate([x, exchange(x, cpl)])
            g = jnp.take(xe, jnp.where(ce >= 0, ce, 0), axis=0)
            return jnp.where(ce >= 0, g, jnp.asarray(fill, g.dtype))

        un = cf == 0
        cand = (un & (m > 1.0))
        cand_nb = gat(cand.astype(jnp.int32), 0) > 0
        m_nb = gat(m, 0.0)
        gid_nb = gat(gid, -1)
        beats_me = (m_nb > m[None, :]) | ((m_nb == m[None, :])
                                          & (gid_nb > gid[None, :]))
        hit = cand_nb & beats_me
        out_row = jnp.any(st & hit & cand[None, :], axis=0)
        # scatter side: i beats j along (i, j); ghost part reverse-adds
        i_beats = (cand[None, :] & (cand_nb & st)
                   & ((m[None, :] > m_nb)
                      | ((m[None, :] == m_nb) & (gid[None, :] > gid_nb))))
        acc = jnp.zeros((nl + cp.n_ghost + 1,), jnp.int32).at[
            jnp.where(st, ce, nl + cp.n_ghost).reshape(-1)].add(
                i_beats.astype(jnp.int32).reshape(-1), mode="drop")
        out_sc = (acc[:nl] + exchange_rev(acc[nl:nl + cp.n_ghost],
                                          cpl, nl)) > 0
        new_c = cand & ~(out_row | out_sc)
        cf = jnp.where(new_c, jnp.int32(C_PT), cf)
        low = un & (m < 1.0)
        cf = jnp.where(low & (cf == 0), jnp.int32(F_PT), cf)
        is_c = cf == C_PT
        has_c_dep = jnp.any(st & (gat(is_c.astype(jnp.int32), 0) > 0),
                            axis=0)
        make_f = un & ~new_c & ~low & has_c_dep
        cf = jnp.where(make_f & (cf == 0), jnp.int32(F_PT), cf)
        m = jnp.where(un & (cf != 0), 0.0, m)
        more = jax.lax.psum(jnp.sum((cf == 0).astype(jnp.int32)),
                            cpl.axis_name)
        return cf[None], m[None], more

    from hypre_tpu.core.heartbeat import beat
    round_fn = _smap_fn(
        mesh, round_kernel,
        (cols_ext, strong, gids, cf, m, *_cp_args(cp)),
        (_sp(axis, 2), _sp(axis, 2), P()), axis)
    while True:
        cf, m, more = round_fn(cols_ext, strong, gids, cf, m,
                               *_cp_args(cp))
        beat("par pmis round")
        if int(np.asarray(more)) == 0:
            return cf


# ---------------------------------------------------------------------------
# coarse numbering
# ---------------------------------------------------------------------------

def coarse_partition(cf, row_part):
    """Per-shard C counts -> GenPartition + global coarse id map.
    Shard-major numbering == global ascending order (shards own
    contiguous ascending rows), so it MATCHES the single-chip
    cumsum numbering exactly."""
    is_c = np.asarray(cf == C_PT)
    counts = is_c.sum(axis=1)
    cpart = GenPartition.create(np.maximum(counts, 0))
    coff = jnp.asarray(np.asarray(cpart.starts[:-1]), jnp.int32)

    @jax.jit
    def cmap_kernel(cf):
        isc = cf == C_PT
        rank = jnp.cumsum(isc.astype(jnp.int32), axis=1) - 1
        return jnp.where(isc, coff[:, None] + rank, -1)

    return cpart, cmap_kernel(cf)


# ---------------------------------------------------------------------------
# truncation (local)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("trunc_factor", "max_elmts"))
def _truncate_stacked(pc, pv, trunc_factor, max_elmts):
    """vmapped device_truncate over the shard axis."""
    from hypre_tpu.setup.device_amg import DEll, device_truncate

    if trunc_factor <= 0.0 and not (0 < max_elmts < pc.shape[1]):
        return pc, pv

    def one(c, v):
        out = device_truncate(DEll(cols=c, vals=v, n_cols=1),
                              trunc_factor, max_elmts)
        return out.cols, out.vals

    return jax.vmap(one)(pc, pv)


# ---------------------------------------------------------------------------
# direct interpolation (type 3)
# ---------------------------------------------------------------------------

def par_direct_interp(A: ParDEll, cols_ext, strong, cf, cmap, cp,
                      cpart, mesh, trunc_factor=0.0, max_elmts=4,
                      axis="p"):
    """Distributed direct interp (ref: par_interp.c:1948): row-local
    formulas; the only comm is the halo of (is_c, cmap)."""
    ns, w, nl = cols_ext.shape

    def kernel(ce, v, st, cf, cmap, si, sm, ri):
        ce, v, st, cf, cmap = ce[0], v[0], st[0], cf[0], cmap[0]
        cpl = _cp_local(cp, si, sm, ri)
        is_c = cf == C_PT

        def gat(x, fill):
            xe = jnp.concatenate([x, exchange(x, cpl)])
            g = jnp.take(xe, jnp.where(ce >= 0, ce, 0), axis=0)
            return jnp.where(ce >= 0, g, jnp.asarray(fill, g.dtype))

        row = jnp.arange(nl, dtype=jnp.int32)[None, :]
        valid = ce >= 0
        is_diag = valid & (ce == row)
        offd = valid & ~is_diag
        diag = jnp.sum(jnp.where(is_diag, v, 0), axis=0)
        col_is_c = gat(is_c.astype(jnp.int32), 0) > 0
        strong_c = st & col_is_c
        pos = v > 0
        neg = v < 0
        sum_n_neg = jnp.sum(jnp.where(offd & neg, v, 0), axis=0)
        sum_n_pos = jnp.sum(jnp.where(offd & pos, v, 0), axis=0)
        sum_p_neg = jnp.sum(jnp.where(strong_c & neg, v, 0), axis=0)
        sum_p_pos = jnp.sum(jnp.where(strong_c & pos, v, 0), axis=0)
        alfa = jnp.where(sum_p_neg != 0, sum_n_neg / jnp.where(
            sum_p_neg != 0, sum_p_neg * diag, 1.0), 1.0)
        beta = jnp.where(sum_p_pos != 0, sum_n_pos / jnp.where(
            sum_p_pos != 0, sum_p_pos * diag, 1.0), 1.0)
        f_row = ~is_c & (cf != SF_PT)
        sel = strong_c & f_row[None, :]
        pv = jnp.where(v < 0, -alfa[None, :] * v, -beta[None, :] * v)
        cmap_nb = gat(cmap, -1)
        pc = jnp.where(sel, cmap_nb, -1)
        pv = jnp.where(sel, pv, 0)
        slot0 = (jnp.arange(w, dtype=jnp.int32) == 0)[:, None]
        pc = jnp.where(is_c[None, :],
                       jnp.where(slot0, cmap[None, :], -1), pc)
        pv = jnp.where(is_c[None, :],
                       jnp.where(slot0, jnp.asarray(1.0, v.dtype), 0),
                       pv)
        return pc[None], pv[None]

    pc, pv = _smap(mesh, kernel,
                   (cols_ext, A.vals, strong, cf, cmap, *_cp_args(cp)),
                   (_sp(axis, 3), _sp(axis, 3)), axis)
    pc, pv = _truncate_stacked(pc, pv, trunc_factor, max_elmts)
    return ParDEll(cols=pc, vals=pv, row_part=A.row_part,
                   col_part=cpart)


# ---------------------------------------------------------------------------
# extended+i interpolation (type 6)
# ---------------------------------------------------------------------------

def par_extpi_interp(A: ParDEll, cols_ext, strong, cf, cmap, cp, cpart,
                     mesh, trunc_factor=0.0, max_elmts=4, axis="p"):
    """Distributed ext+i interp (ref: par_lr_interp.c:1024, device
    par_lr_interp_device.c:1001).  Ghost ROWS of A (cols + vals +
    strong-C flags) arrive via exchange_mat — the ExtractBExt step —
    then every row computes locally with the same candidate-list
    formulation as the single-chip device path (device_amg.
    _extpi_chunk).  P's columns come out as GLOBAL FINE gids of C
    points; a second (distance-2) halo of cmap renumbers to coarse."""
    ns, w, nl = cols_ext.shape
    real = A.vals.dtype
    gids = _gids_stacked(A.row_part)
    wc = w * (1 + w)

    def kernel(cg, ce, v, st, cf, gid, si, sm, ri):
        cg, ce, v, st, cf, gid = (cg[0], ce[0], v[0], st[0], cf[0],
                                  gid[0])
        cpl = _cp_local(cp, si, sm, ri)
        is_c = cf == C_PT
        is_f = cf == F_PT
        valid = ce >= 0

        def gat(x, fill):
            xe = jnp.concatenate([x, exchange(x, cpl)])
            g = jnp.take(xe, jnp.where(valid, ce, 0), axis=0)
            return jnp.where(valid, g, jnp.asarray(fill, g.dtype))

        row_diag = jnp.sum(
            jnp.where(valid & (cg == gid[None, :]), v, 0), axis=0)
        sign_diag = jnp.sign(row_diag)
        strong_c_all = st & (gat(is_c.astype(jnp.int32), 0) > 0)

        # ---- ghost rows of A (ExtractBExt): cols/vals/flags ---------
        def gatrows(Xloc, fill):
            """(w, nl) local row payload -> per-slot neighbor-row
            table (w, w_slot, nl): X_table[:, ce]."""
            Xg = exchange_mat(Xloc.T, cpl).T
            Xe = jnp.concatenate([Xloc, Xg], axis=1)
            g = jnp.take(Xe, jnp.where(valid, ce, 0), axis=1)
            return jnp.where(valid[None, :, :], g,
                             jnp.asarray(fill, g.dtype))

        # encode cols+1 so the exchange pad value 0 decodes to -1
        nb_cols = gatrows(jnp.where(cg >= 0, cg + 1, 0), 0) - 1
        nb_valid = nb_cols >= 0
        t_a = gatrows(v, 0.0)
        nb_sc = (gatrows(strong_c_all.astype(jnp.int32), 0) > 0) \
            & nb_valid

        sc = st & (gat(is_c.astype(jnp.int32), 0) > 0)
        sf = st & (gat(is_f.astype(jnp.int32), 0) > 0)
        col_is_sf = ((gat((cf == SF_PT).astype(jnp.int32), 1) > 0)
                     & valid)
        f_row = is_f
        is_diag_slot = valid & (cg == gid[None, :])
        offd = valid & ~is_diag_slot

        from hypre_tpu.setup.device_amg import _slot_compact

        # ---- Ĉ candidate list (global fine gids) --------------------
        cand1 = jnp.where(sc, cg, _BIG)
        cand2 = jnp.where(sf[None, :, :] & nb_sc, nb_cols, _BIG)
        chat = jnp.sort(jnp.concatenate(
            [cand1, cand2.reshape(w * w, nl)], axis=0), axis=0)

        def member(queries):
            q = queries.shape[0]
            keys = jnp.concatenate([chat, queries], axis=0)
            tag = jnp.concatenate(
                [jnp.zeros((wc, nl), jnp.int32),
                 jnp.ones((q, nl), jnp.int32)], axis=0)
            pos = jnp.concatenate(
                [jnp.full((wc, nl), _BIG, jnp.int32),
                 jnp.broadcast_to(
                     jnp.arange(q, dtype=jnp.int32)[:, None], (q, nl))],
                axis=0)
            k2, t2, p2 = jax.lax.sort((keys, tag, pos),
                                      dimension=0, num_keys=2)
            src_key = jnp.where(t2 == 0, k2, -_BIG)
            last_src = jax.lax.associative_scan(jnp.maximum, src_key,
                                                axis=0)
            hit = (t2 == 1) & (last_src == k2) & (k2 < _BIG)
            p3, h3 = jax.lax.sort(
                (jnp.where(t2 == 1, p2, _BIG), hit.astype(jnp.int32)),
                dimension=0, num_keys=1)
            return h3[:q] > 0

        q_direct = jnp.where(offd, cg, _BIG)
        direct_sel = offd & f_row[None, :] & member(q_direct)
        d = row_diag
        weak_sel = (offd & f_row[None, :] & ~direct_sel & ~sf
                    & ~col_is_sf)
        d = d + jnp.sum(jnp.where(weak_sel, v, 0), axis=0)

        t_valid = nb_valid & sf[None, :, :]
        k_diag_sign = gat(sign_diag, 0.0)
        not_diag = nb_cols != jnp.where(valid, cg, -2)[None, :, :]
        sign_ok = (k_diag_sign[None, :, :] * t_a) < 0
        memb = member(jnp.where(t_valid, nb_cols, _BIG).reshape(
            w * w, nl)).reshape(w, w, nl)
        is_self = nb_cols == gid[None, None, :]
        in_den = t_valid & not_diag & sign_ok & (memb | is_self)
        denom = jnp.sum(jnp.where(in_den, t_a, 0), axis=0)
        has_den = denom != 0
        a_ik = jnp.where(sf, v, 0)
        dist = jnp.where(has_den,
                         a_ik / jnp.where(has_den, denom, 1.0), 0.0)
        d = d + jnp.sum(jnp.where(sf & ~has_den, v, 0), axis=0)
        self_sel = in_den & is_self & has_den[None, :, :]
        d = d + jnp.sum(jnp.where(self_sel, dist[None, :, :] * t_a, 0),
                        axis=(0, 1))
        contrib_sel = in_den & memb & has_den[None, :, :]
        contrib_v = jnp.where(contrib_sel, dist[None, :, :] * t_a, 0)
        contrib_c = jnp.where(contrib_sel, nb_cols, -1)

        cand_c = jnp.concatenate(
            [jnp.where(direct_sel, cg, -1),
             contrib_c.reshape(w * w, nl)], axis=0)
        cand_v = jnp.concatenate(
            [jnp.where(direct_sel, v, 0),
             contrib_v.reshape(w * w, nl)], axis=0)
        pc, pv = _slot_compact(cand_c, cand_v, wc)
        dsafe = jnp.where(d != 0, -d, 1.0)
        pv = pv / dsafe[None, :]
        slot0 = (jnp.arange(wc, dtype=jnp.int32) == 0)[:, None]
        pc = jnp.where(is_c[None, :],
                       jnp.where(slot0, gid[None, :], -1), pc)
        pv = jnp.where(is_c[None, :],
                       jnp.where(slot0, jnp.asarray(1.0, real), 0), pv)
        return pc[None], pv[None]

    pc, pv = _smap(
        mesh, kernel,
        (A.cols, cols_ext, A.vals, strong, cf, gids, *_cp_args(cp)),
        (_sp(axis, 3), _sp(axis, 3)), axis)

    # distance-2 renumber: P cols are global FINE gids of C points
    Pf = ParDEll(cols=pc, vals=pv, row_part=A.row_part,
                 col_part=A.row_part)
    pc2 = par_gather_map(Pf, cmap, mesh, axis=axis)
    pc2, pv = _truncate_stacked(pc2, pv, trunc_factor, max_elmts)
    return ParDEll(cols=pc2, vals=pv, row_part=A.row_part,
                   col_part=cpart)


def par_gather_map(M: ParDEll, vec_loc, mesh, axis="p"):
    """cols' = vec[cols] for a shard-distributed int map `vec` over
    M.col_part (the distance-2 cmap halo of ext+i)."""
    cols_ext, cp2 = build_level_comm(M, axis_name=axis)
    nl2 = M.col_part.n_local

    def kernel(ce, vecl, si, sm, ri):
        ce, vecl = ce[0], vecl[0]
        cpl = _cp_local(cp2, si, sm, ri)
        xe = jnp.concatenate([vecl, exchange(vecl, cpl)])
        g = jnp.take(xe, jnp.where(ce >= 0, ce, 0), axis=0)
        return jnp.where(ce >= 0, g, -1)[None]

    return _smap(mesh, kernel, (cols_ext, vec_loc, *_cp_args(cp2)),
                 _sp(axis, 3), axis)


# ---------------------------------------------------------------------------
# distributed transpose + SpGEMM (the RAP building blocks)
# ---------------------------------------------------------------------------

def exchange_rev_rows(g_rows, cp: CommPkg, n_local: int):
    """Reverse row-payload exchange WITHOUT summation: each ghost row
    (n_ghost, F) travels back to its owner, landing in a per-round
    slot: output (n_local, R, F).  One round -> at most one
    contribution per local row (forward send lists are duplicate-free),
    so nothing merges by accident; callers compact across the R axis
    (hypre's RAP off-processor row sends, ref: par_csr_triplemat.c)."""
    n_shards = jax.lax.axis_size(cp.axis_name)
    F = g_rows.shape[1]
    R = len(cp.offsets)
    gpad = jnp.concatenate(
        [g_rows, jnp.zeros((1, F), g_rows.dtype)], axis=0)
    out = jnp.zeros((n_local, max(R, 1), F), dtype=g_rows.dtype)
    for r, off in enumerate(cp.offsets):
        perm = [(p, p + off) for p in range(n_shards)
                if 0 <= p + off < n_shards]
        buf = gpad[cp.recv_idx[0, r]]
        buf = jax.lax.ppermute(buf, cp.axis_name, perm)
        out = out.at[:, r, :].add(
            jnp.zeros((n_local, F), g_rows.dtype).at[
                cp.send_idx[0, r]].add(
                    buf * cp.send_mask[0, r][:, None].astype(buf.dtype),
                    mode="drop"))
    return out


def par_transpose(M: ParDEll, mesh, axis="p") -> ParDEll:
    """R = M^T distributed: per-shard transpose onto (local + ghost)
    output rows, then reverse row sends merge ghost rows into their
    owners (ref: par_csr_triplemat.c; csr2csc analog
    src/seq_mv/csr_matop_device.c)."""
    from hypre_tpu.setup.device_amg import _slot_compact

    cols_ext, cp = build_level_comm(M, axis_name=axis)
    ns, w, nl = cols_ext.shape
    nlo = M.col_part.n_local          # output rows per shard (local)
    ng = cp.n_ghost
    real = M.vals.dtype
    gids = _gids_stacked(M.row_part)

    @jax.jit
    def width_kernel(ce):
        cnt = jnp.zeros((ns, nlo + ng + 1), jnp.int32).at[
            jnp.arange(ns)[:, None, None],
            jnp.where(ce >= 0, ce, nlo + ng)].add(1, mode="drop")
        return jnp.max(cnt[:, :nlo + ng])

    wt = max(int(width_kernel(cols_ext)), 1)

    def transpose_kernel(ce, v, gid, si, sm, ri):
        ce, v, gid = ce[0], v[0], gid[0]
        cpl = _cp_local(cp, si, sm, ri)
        # stable sort entries by output row (ext id)
        colsR = ce.T.reshape(-1)
        valsR = v.T.reshape(-1)
        rowsR = jnp.repeat(gid, w)
        valid = colsR >= 0
        key = jnp.where(valid, colsR, _BIG)
        scol, srow, sval = jax.lax.sort(
            (key, rowsR, valsR), dimension=0, num_keys=1,
            is_stable=True)
        svalid = scol < _BIG
        newrow = svalid & jnp.concatenate(
            [jnp.ones((1,), bool), scol[1:] != scol[:-1]])
        idx = jnp.arange(scol.shape[0], dtype=jnp.int32)
        start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(newrow, idx, 0))
        slot = idx - start
        flat = jnp.where(svalid & (slot < wt),
                         jnp.minimum(slot, wt - 1) * (nlo + ng) + scol,
                         (nlo + ng) * wt)
        tc = jnp.full(((nlo + ng) * wt + 1,), -1, jnp.int32).at[
            flat].set(srow, mode="drop")[:-1].reshape(wt, nlo + ng)
        tv = jnp.zeros(((nlo + ng) * wt + 1,), real).at[
            flat].set(sval, mode="drop")[:-1].reshape(wt, nlo + ng)
        # ghost output rows -> owners; cols ship as a separate INT
        # payload (cols+1, pad 0 decodes to -1 — never through float,
        # which rounds gids past 2^24), vals as the real payload
        back_c = exchange_rev_rows((tc[:, nlo:] + 1).T, cpl, nlo)
        back_v = exchange_rev_rows(tv[:, nlo:].T, cpl, nlo)
        Rr = back_c.shape[1]
        bc = (back_c - 1).reshape(nlo, Rr * wt).T
        bv = back_v.reshape(nlo, Rr * wt).T
        cand_c = jnp.concatenate([tc[:, :nlo], bc], axis=0)
        cand_v = jnp.concatenate([tv[:, :nlo], bv], axis=0)
        # sort-only compaction: a transpose has no duplicate (row,col),
        # and _slot_compact's cumsum-difference run sums would change
        # values by an ulp ((prefix+v)-prefix != v) — values must pass
        # through BITWISE for single-chip parity
        key = jnp.where(cand_c >= 0, cand_c, _BIG)
        oc, ov = jax.lax.sort((key, cand_v), dimension=0, num_keys=1,
                              is_stable=True)
        oc = jnp.where(oc < _BIG, oc, -1)
        return oc[None], ov[None]

    tc, tv = _smap(mesh, transpose_kernel,
                   (cols_ext, M.vals, gids, *_cp_args(cp)),
                   (_sp(axis, 3), _sp(axis, 3)), axis)
    used = max(int(jnp.max(jnp.sum(
        jnp.any(tc >= 0, axis=2).astype(jnp.int32), axis=1))), 1)
    return ParDEll(cols=tc[:, :used], vals=tv[:, :used],
                   row_part=M.col_part, col_part=M.row_part)


def par_spgemm(X: ParDEll, Y: ParDEll, mesh, axis="p") -> ParDEll:
    """C = X @ Y distributed: ghost rows of Y arrive via exchange_mat
    (ExtractBExt), then per-shard expand + sort/compact (the TPU form
    of the hash SpGEMM, ref: src/seq_mv/csr_spgemm_device.c:15)."""
    from hypre_tpu.setup.device_amg import (
        _slot_compact, _slot_distinct_count,
    )

    cols_ext, cp = build_level_comm(X, axis_name=axis)
    ns, wx, nlx = cols_ext.shape
    wy = Y.width

    def expand_kernel(ce, xv, yc, yv, si, sm, ri):
        ce, xv, yc, yv = ce[0], xv[0], yc[0], yv[0]
        cpl = _cp_local(cp, si, sm, ri)
        # ship Y rows: cols+1 (pad 0 -> -1) as int payload, vals real
        ycg = exchange_mat((yc + 1).T, cpl).T - 1
        yvg = exchange_mat(yv.T, cpl).T
        yce = jnp.concatenate([yc, ycg], axis=1)
        yve = jnp.concatenate([yv, yvg], axis=1)
        valid = ce >= 0
        safe = jnp.where(valid, ce, 0)
        bc = jnp.take(yce, safe, axis=1)          # (wy, wx, nlx)
        bv = jnp.take(yve, safe, axis=1)
        bc = jnp.where(valid[None], bc, -1)
        bv = jnp.where(valid[None], bv * xv[None], 0)
        return (bc.reshape(wy * wx, nlx)[None],
                bv.reshape(wy * wx, nlx)[None])

    bc, bv = _smap(mesh, expand_kernel,
                   (cols_ext, X.vals, Y.cols, Y.vals, *_cp_args(cp)),
                   (_sp(axis, 3), _sp(axis, 3)), axis)
    wout = max(int(jax.jit(
        lambda c: jnp.max(jax.vmap(_slot_distinct_count)(c)))(bc)), 1)
    cc, cv = jax.jit(jax.vmap(
        lambda c, v: _slot_compact(c, v, wout)))(bc, bv)
    return ParDEll(cols=cc, vals=cv, row_part=X.row_part,
                   col_part=Y.col_part)


# ---------------------------------------------------------------------------
# level driver
# ---------------------------------------------------------------------------

def iter_par_hierarchy(A: ParDEll, cfg, mesh, axis="p"):
    """Distributed level loop (the sharded twin of
    amg.iter_host_hierarchy / device_amg.iter_device_hierarchy).
    Yields (A_l, P_l, R_l, cf_l) per level, then the coarsest A.  No
    global level is ever materialized: every stage is per-shard
    compute + ppermute halos; the host sees O(ghost) metadata only."""
    from hypre_tpu.core.heartbeat import beat

    Al = A
    for _level in range(cfg.max_levels - 1):
        n = Al.row_part.n_global
        if n <= cfg.max_coarse_size:
            break
        cols_ext, cp = build_level_comm(Al, axis_name=axis)
        strong = par_strength(cols_ext, Al.vals,
                              theta=cfg.strong_threshold,
                              max_row_sum=cfg.max_row_sum)
        cf = par_pmis(cols_ext, strong, cp, Al.row_part, mesh,
                      seed=cfg.seed, axis=axis)
        n_coarse = int(np.asarray(jnp.sum(cf == C_PT)))
        beat(f"par level {_level}: n={n} coarse={n_coarse}")
        if n_coarse == 0 or n_coarse == n:
            break
        cpart, cmap = coarse_partition(cf, Al.row_part)
        if cfg.interp_type == 3:
            Pl = par_direct_interp(Al, cols_ext, strong, cf, cmap, cp,
                                   cpart, mesh,
                                   trunc_factor=cfg.trunc_factor,
                                   max_elmts=cfg.p_max_elmts, axis=axis)
        else:
            Pl = par_extpi_interp(Al, cols_ext, strong, cf, cmap, cp,
                                  cpart, mesh,
                                  trunc_factor=cfg.trunc_factor,
                                  max_elmts=cfg.p_max_elmts, axis=axis)
        Rl = par_transpose(Pl, mesh, axis=axis)
        AP = par_spgemm(Al, Pl, mesh, axis=axis)
        Ac = par_spgemm(Rl, AP, mesh, axis=axis)
        yield (Al, Pl, Rl, cf)
        Al = Ac
    yield Al
