"""Device-side GST-ELL packing: DEll (slot-major padded ELL, the
device-setup representation) -> GstEllMatrix, entirely as XLA programs.

This is the packing tail of the device setup path: the AMG hierarchy is
built on the TPU (setup/device_amg.py), and each level must end up in
the solve format (ops/gstell.py) WITHOUT a round-trip through host
memory.  The algorithm is the same offset-cluster plan as the host
packer (_gstell_pack):

  1. offset d = col - row (scaled for rectangular operators)
  2. global offset clustering (gap > GAP splits) via a presence bitmap
     and prefix scans — the device analog of the host's unique+cumsum
  3. rank within each (row, cluster) run
  4. per-chunk slot ranges from per-(chunk, cluster) max run lengths
  5. scatter into the (chunk, slot, lane) layout, window bases from
     per-(chunk, slot) column ranges

Host involvement: a handful of scalar syncs (span, cluster count, G,
c) and the O(n_chunks * slots) window-base array for band scheduling —
a few MB at the largest levels, nothing O(nnz).

Plays the role of hypre's device CSR format conversions
(ref: src/seq_mv/csr_matrix.c device paths); the structure decisions
mirror src/seq_mv/csr_spmv_device.c:300-306 shape-driven tuning.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.ops.gstell import (
    CHUNK, GAP, MAX_C, MAX_G, _finish_pack,
)

_BIG = np.int32(2**30)  # numpy scalar: no backend init at import


_CG = 128          # chunks per clustering-group program


@partial(jax.jit, static_argnames=("gap", "ncmax"))
def _cluster_group(cols_g, *, gap, ncmax):
    """PER-CHUNK column clustering for one group of chunks.

    cols_g int32 (w, CG, 128) with -1 padding.  Clusters are runs of
    each chunk's sorted column union (gap > `gap` splits) — the device
    twin of the host packer's per-chunk clustering (global offset
    clustering smears for rectangular P/R and blows the window width).

    Returns (ecl (w, CG, 128) cluster id per entry [garbage where
    invalid], nc_g scalar = max clusters in any chunk of the group)."""
    w, CG, L = cols_g.shape
    valid = cols_g >= 0
    key = jnp.where(valid, cols_g, _BIG)
    flat = key.transpose(1, 0, 2).reshape(CG, w * L)
    s = jnp.sort(flat, axis=1)
    prev = jnp.concatenate(
        [jnp.full((CG, 1), -_BIG, jnp.int32), s[:, :-1]], axis=1)
    newcl = (s < _BIG) & (s - prev > gap)
    rank = jnp.cumsum(newcl.astype(jnp.int32), axis=1) - 1
    nc_g = jnp.max(rank[:, -1]) + 1
    # cluster start columns per chunk: (CG, ncmax), +BIG padded
    cg_idx = jnp.broadcast_to(
        jnp.arange(CG, dtype=jnp.int32)[:, None], s.shape)
    tgt = jnp.where(newcl, jnp.minimum(rank, ncmax - 1), ncmax)
    starts = jnp.full((CG * (ncmax + 1),), _BIG, jnp.int32).at[
        (cg_idx * (ncmax + 1) + tgt).reshape(-1)].min(
            s.reshape(-1), mode="drop")
    starts = starts.reshape(CG, ncmax + 1)[:, :ncmax]
    # per-entry cluster id = (# starts <= col) - 1
    q = key.transpose(1, 0, 2).reshape(CG, w * L)
    ecl = jnp.sum((q[:, :, None] >= starts[:, None, :]),
                  axis=2).astype(jnp.int32) - 1
    ecl = ecl.reshape(CG, w, L).transpose(1, 0, 2)
    return ecl, nc_g


def _cluster_perchunk(M, gap=GAP):
    """Host loop over chunk groups: per-entry per-chunk cluster ids
    for the whole matrix.  Returns (ecl (w, n), n_clusters host int)."""
    w, n = M.cols.shape
    n_chunks = -(-n // CHUNK)
    n_grp = -(-n_chunks // _CG)
    n_pad = n_grp * _CG * CHUNK
    cols_p = _pad_cols_grp(M.cols, n_pad=n_pad, n_grp=n_grp)
    ncmax = 8 * MAX_G
    parts = []
    ncs = []
    for g in range(n_grp):
        ecl_g, nc_g = _cluster_group(cols_p[:, g], gap=gap, ncmax=ncmax)
        parts.append(ecl_g)
        ncs.append(nc_g)
    ecl = _concat_ecl(parts, n=n)
    n_clusters = int(jnp.max(jnp.stack(ncs)))
    return ecl, n_clusters


@partial(jax.jit, static_argnames=("n_pad", "n_grp"))
def _pad_cols_grp(cols, *, n_pad, n_grp):
    w = cols.shape[0]
    cols = jnp.pad(cols, [(0, 0), (0, n_pad - cols.shape[1])],
                   constant_values=-1)
    return cols.reshape(w, n_grp, -1, CHUNK)    # (w, n_grp, CG, 128)


@partial(jax.jit, static_argnames=("n",))
def _concat_ecl(parts, *, n):
    w = parts[0].shape[0]
    return jnp.concatenate(
        [p.reshape(w, -1) for p in parts], axis=1)[:, :n]


@jax.jit
def _stage_stats(M):
    return jnp.sum(M.mask)


@partial(jax.jit, static_argnames=("NC",))
def _stage_slots(M, ecl_in, NC):
    """rank + per-(chunk, cluster) slot ranges; returns the
    S_max scalar the caller syncs to pick G.  All (w, n) slot-major."""
    w, n = M.cols.shape
    valid = M.mask
    ecl = jnp.where(valid, ecl_in, NC)

    # rank within each (row, cluster) run — DEll slots are col-sorted,
    # so same-cluster entries are contiguous along the slot axis
    slots = jnp.arange(w, dtype=jnp.int32)[:, None]
    prev_ecl = jnp.concatenate(
        [jnp.full((1, n), -1, jnp.int32), ecl[:-1]], axis=0)
    newrun = valid & (ecl != prev_ecl)
    run_first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newrun, slots, 0), axis=0)
    rank = slots - run_first

    n_chunks = -(-n // CHUNK)
    chunk = (jnp.arange(n, dtype=jnp.int32) // CHUNK)[None, :]
    flat_cc = jnp.where(valid, chunk * NC + ecl, n_chunks * NC)
    m2 = jnp.zeros((n_chunks * NC,), jnp.int32).at[
        flat_cc.reshape(-1)].max((rank + 1).reshape(-1), mode="drop")
    m2 = m2.reshape(n_chunks, NC)
    slot_start = jnp.concatenate(
        [jnp.zeros((n_chunks, 1), jnp.int32),
         jnp.cumsum(m2, axis=1)[:, :-1]], axis=1)
    S_max = jnp.max(jnp.sum(m2, axis=1))
    return ecl, rank, slot_start, S_max



def _stage_place(M, ecl, rank, slot_start, tslot_base, NC, G,
                 real_dtype):
    """Lane-chunked placement driver: (S+w, n) merge buffers at
    S up to 512 would need tens of GB in one program (the 256^3 pack
    OOM'd HBM), so the merge runs per lane window."""
    w, n = M.cols.shape
    S = 8 * G
    m = (1 << 26) // max(S + w, 1)
    m = max((m // CHUNK) * CHUNK, CHUNK)
    n_pad = -(-n // m) * m
    colsP = jnp.pad(M.cols, [(0, 0), (0, n_pad - n)],
                    constant_values=-1)
    valsP = jnp.pad(M.vals, [(0, 0), (0, n_pad - n)])
    tslotP = jnp.pad(jnp.where(M.mask, tslot_base + rank, _BIG),
                     [(0, 0), (0, n_pad - n)], constant_values=_BIG)
    locs_p, vals_p, base_p, spread_p = [], [], [], []
    for l0 in range(0, n_pad, m):
        lw, vw, bw, sw = _stage_place_chunk(
            _lane_win(colsP, jnp.int32(l0), m=m),
            _lane_win(valsP, jnp.int32(l0), m=m),
            _lane_win(tslotP, jnp.int32(l0), m=m),
            G=G, real_dtype=real_dtype)
        locs_p.append(lw)
        vals_p.append(vw)
        base_p.append(bw)
        spread_p.append(sw)
    locs = jnp.concatenate(locs_p, axis=0)
    val_arr = jnp.concatenate(vals_p, axis=0)
    base = jnp.concatenate(base_p, axis=0)
    n_chunks = -(-n // CHUNK)
    return (locs[:n_chunks], val_arr[:n_chunks], base[:n_chunks],
            jnp.max(jnp.stack(spread_p)))


@partial(jax.jit, static_argnames=("m",))
def _lane_win(a, l0, *, m):
    return jax.lax.dynamic_slice(a, (jnp.int32(0), l0),
                                 (a.shape[0], m))


@partial(jax.jit, static_argnames=("G", "real_dtype"))
def _stage_place_chunk(cols_w, vals_w, tslot, G, real_dtype):
    """Place one lane window into the (chunk, slot, lane) layout and
    derive its window bases/locs.  Placement is a PER-LANE merge (2-D
    sorts along the slot axis): entry with target slot t lands at
    out[t, lane], slot-query rows fill the gaps.  (The old whole-array
    scatter-set ran at XLA's big-buffer scatter speed.)"""
    w, n = cols_w.shape
    valid = cols_w >= 0
    S = 8 * G
    n_chunks = -(-n // CHUNK)

    iota_s = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None], (S, n))
    key = jnp.concatenate([tslot, iota_s], axis=0)
    tag = jnp.concatenate(
        [jnp.zeros((w, n), jnp.int32), jnp.ones((S, n), jnp.int32)],
        axis=0)
    pc = jnp.concatenate(
        [jnp.where(valid, cols_w, -1),
         jnp.full((S, n), -1, jnp.int32)], axis=0)
    pv = jnp.concatenate(
        [jnp.where(valid, vals_w, 0).astype(jnp.dtype(real_dtype)),
         jnp.zeros((S, n), jnp.dtype(real_dtype))], axis=0)
    k2, t2, c2, v2 = jax.lax.sort((key, tag, pc, pv), dimension=0,
                                  num_keys=2)
    # Each lane has at most ONE entry per target slot and exactly one
    # query per slot id, so equal-key runs have length <= 2 with the
    # entry (tag 0) first: a query's entry, if any, sits DIRECTLY
    # above it — a shift-by-one, no scan.  (associative_scan carries
    # after a sort hang the XLA TPU compile at heights >~128.)
    ck = jnp.concatenate([jnp.full((1, n), -_BIG, jnp.int32),
                          k2[:-1]], axis=0)
    ct = jnp.concatenate([jnp.ones((1, n), jnp.int32), t2[:-1]],
                         axis=0)
    cc = jnp.concatenate([jnp.full((1, n), -1, jnp.int32), c2[:-1]],
                         axis=0)
    cv = jnp.concatenate([jnp.zeros((1, n), pv.dtype), v2[:-1]],
                         axis=0)
    hit = (t2 == 1) & (ct == 0) & (ck == k2) & (k2 < _BIG)
    route = jnp.where(t2 == 1, k2, _BIG)
    _, oc, ov = jax.lax.sort(
        (route, jnp.where(hit, cc, -1), jnp.where(hit, cv, 0)),
        dimension=0, num_keys=1)
    col_arr = oc[:S]                                   # (S, n)
    val_arr = ov[:S]

    col_arr = col_arr.reshape(S, n_chunks, CHUNK).transpose(1, 0, 2)
    val_arr = val_arr.reshape(S, n_chunks, CHUNK).transpose(1, 0, 2)

    present = col_arr >= 0
    used = jnp.any(present, axis=2)                      # (n_chunks, S)
    cmin = jnp.min(jnp.where(present, col_arr, _BIG), axis=2)
    cmax = jnp.max(jnp.where(present, col_arr, -1), axis=2)
    base = jnp.where(used, cmin // 128, 0)
    spread_max = jnp.max(jnp.where(used, cmax - base * 128, 0))
    # unused slots reuse a used base from the same chunk so they do
    # not widen the step windows
    chunk_any = jnp.any(used, axis=1)
    chunk_min = jnp.where(
        chunk_any,
        jnp.min(jnp.where(used, base, _BIG), axis=1), 0)
    base = jnp.where(used, base, chunk_min[:, None])
    locs = jnp.where(present, col_arr - base[:, :, None] * 128, 0) \
        .astype(jnp.int16)
    return locs, val_arr, base, spread_max


def _tslot_base(M, ecl, slot_start, NC):
    """slot_start[chunk, ecl] per entry.  idx = chunk*NC + ecl is
    perfectly banded (span NC per 128-lane chunk), so on TPU this is
    one ops/btake.py gather; jnp.take elsewhere."""
    from hypre_tpu.ops import btake as bt

    w, n = M.cols.shape
    valid = M.mask
    chunk = (jnp.arange(n, dtype=jnp.int32) // CHUNK)[None, :]
    idx = jnp.where(valid,
                    chunk * NC + jnp.minimum(ecl, NC - 1),
                    -1)
    flat = slot_start.reshape(-1)
    if bt.btake_enabled():
        plan = bt.btake_plan(idx, flat.shape[0])
        if plan is not None:
            g = bt.btake(plan, flat)
            return jnp.where(valid, g, 0)
    safe = jnp.where(valid, idx, 0)
    return jnp.where(valid, jnp.take(flat, safe), 0)


def gstell_from_dell(M, real_dtype=None):
    """Pack a device DEll matrix into GST-ELL on device.  Returns None
    when the matrix does not fit the format limits (caller falls back
    to dense/ELL).  Four XLA stage programs + a handful of scalar
    syncs; the only bulk host transfer is the O(n_chunks*S) window-base
    array for band scheduling."""
    from hypre_tpu.core.config import get_config
    from hypre_tpu.setup.device_amg import DEll

    assert isinstance(M, DEll)
    real_dtype = np.dtype(real_dtype or get_config().np_real)
    w, n = M.cols.shape
    n_cols = M.n_cols
    if n == 0 or w == 0:
        return None
    x_rows = max(-(-n_cols // 128), 1)

    nnz = int(_stage_stats(M))
    if nnz == 0:
        return None

    ecl_in, n_clusters = _cluster_perchunk(M)
    if n_clusters > 8 * MAX_G or n_clusters == 0:
        return None

    ecl, rank, slot_start, S_max_d = _stage_slots(
        M, ecl_in, NC=n_clusters)
    S_max = int(S_max_d)
    G = -(-S_max // 8)
    if G == 0 or G > MAX_G:
        return None
    n_chunks = -(-n // CHUNK)
    if n_chunks * 8 * G * CHUNK > max(16 * nnz, 1 << 20):
        return None

    tsb = _tslot_base(M, ecl, slot_start, n_clusters)
    locs, val_arr, base, spread_max_d = _stage_place(
        M, ecl, rank, slot_start, tsb, NC=n_clusters, G=G,
        real_dtype=jnp.dtype(real_dtype))
    c = int(spread_max_d) // 128 + 1
    max_c = MAX_C if nnz > 1_000_000 else 4 * MAX_C
    if c > max_c:
        return None

    base_np = np.asarray(base).astype(np.int64)          # (n_chunks, S)
    return _finish_pack(base_np, locs, val_arr, n_rows=int(n),
                        n_cols=int(n_cols), c=int(c), G=int(G),
                        x_rows=int(x_rows), nnz=nnz,
                        real_dtype=real_dtype)


@partial(jax.jit, static_argnames=("real_dtype",))
def _ell_from_dell_jit(M, real_dtype):
    # DEll's slot-major (w, n) IS the transposed EllMatrix layout
    valid = M.mask
    cols = jnp.where(valid, M.cols, 0)
    vals = jnp.where(valid, M.vals, 0).astype(real_dtype)
    return cols, vals


def ell_from_dell(M, real_dtype=None):
    """DEll -> transposed EllMatrix on device (the jnp-gather fallback
    format, ops/formats.EllMatrix pad convention col=0/val=0)."""
    from hypre_tpu.core.config import get_config
    from hypre_tpu.ops.formats import EllMatrix

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    cols, vals = _ell_from_dell_jit(M, jnp.dtype(real_dtype))
    return EllMatrix(cols=cols, vals=vals, n_cols=int(M.n_cols))


@partial(jax.jit, static_argnames=("rp", "cp", "real_dtype"))
def _dense_from_dell_jit(M, rp, cp, real_dtype):
    n = M.n_rows
    valid = M.mask
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], M.cols.shape)
    flat = jnp.where(valid, rows * cp + M.cols, rp * cp)
    dense = jnp.zeros((rp * cp,), real_dtype).at[
        flat.reshape(-1)].add(
            M.vals.astype(real_dtype).reshape(-1), mode="drop")
    return dense.reshape(rp, cp)


def dense_from_dell(M, real_dtype=None):
    """DEll -> 128-padded DenseMatrix on device (small coarse levels)."""
    from hypre_tpu.core.config import get_config
    from hypre_tpu.ops.formats import DenseMatrix

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    n, m = M.shape
    rp = max(-(-n // 128) * 128, 128)
    cp = max(-(-m // 128) * 128, 128)
    dense = _dense_from_dell_jit(M, rp, cp, jnp.dtype(real_dtype))
    return DenseMatrix(vals=dense, n_rows=int(n), n_cols=int(m))


def sparse_op_from_dell(M, real_dtype=None, prefer_gstell: bool = True):
    """Format dispatch for device-built operators (the device twin of
    formats.sparse_op_from_scipy)."""
    if max(M.shape) <= 2048 and min(M.shape) > 0:
        return dense_from_dell(M, real_dtype)
    if prefer_gstell:
        Gm = gstell_from_dell(M, real_dtype)
        if Gm is not None:
            return Gm
    return ell_from_dell(M, real_dtype)
