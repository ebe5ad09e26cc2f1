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
  offset clusters — the macro-stencil.  Within one cluster and one
  chunk of 128 consecutive rows, columns span only a few hundred
  indices.
* Layout is TRANSPOSED: lanes = 128 rows of a chunk; sublanes = slot
  ids, assigned SEQUENTIALLY over (cluster, rank) pairs — eight slots
  per group, and every (chunk, group, sublane) carries its OWN
  128-aligned window base (SMEM).  Sequential assignment (instead of
  one octet per cluster) keeps padding near the true row width.
* Per group the kernel builds the gather table one window-row per
  sublane (eight sublane slices), then gathers 1024 operands per
  lane-shuffle:
      for w < c: tbl = stack_s x2d[base[ch,g,s] + w]
                 g_w = dynamic_gather(tbl, loc & 127)
                 acc = where(loc >> 7 == w, g_w, acc)
  followed by an FMA and a cross-sublane reduction into 128 row sums.

Two execution modes:

* RESIDENT — the whole (padded) x fits in VMEM; the kernel reads
  window rows straight out of the x block.
* WINDOWED — x stays in HBM; at pack time the slot bases of each grid
  step are gap-clustered into at most ``B`` BANDS, each band is one
  small contiguous x window, and the kernel double-buffers the band
  DMAs across grid steps (issue step t+1's copies before computing
  step t).  For a 7-pt operator the three bands (z-, middle, z+) copy
  ~20 KB per 1024 rows instead of the ~500 KB a single contiguous
  window would need.

All window reads are provably in-bounds BY CONSTRUCTION: bases are
never clamped; instead x2d is padded with ``x_rows_pad - x_rows``
zero rows so that every ``base + w`` (resident) or ``band*Eb +
(base - w0_band) + w`` (windowed) read stays inside the buffer.  The
packer asserts the invariants and falls back (returns None) rather
than ship a kernel that could fault the TPU worker.

This plays the role of hypre's device SpMV row-group tuning
(ref: src/seq_mv/csr_spmv_device.c:300-381) — the shape-driven knobs
here are (clusters, slot groups G, window width c, bands B).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

GAP = 64          # offset-gap threshold that splits clusters
CHUNK = 128       # rows per chunk (one lane dim)
CH_STEP = 8       # chunks per pallas grid step
MAX_C = 48        # max window width (x128) in WINDOWED mode
MAX_G = 64        # max slot groups (SMEM stays KBs; the compile-op
                  # gate below bounds the kernel body, not this)
MAX_KOPS = 6144   # per-chunk traced-op budget G*(2c+8): Mosaic
                  # lowering time scales with the unrolled body
MAX_B = 8         # max DMA bands per step (windowed mode)
BAND_GAP = 64     # x2d-row gap that splits bands within a step
MAX_WIN_ROWS = 4096   # B * Eb cap: 2 buffers * 4096 * 128 * 4B = 4 MB VMEM
VMEM_X_LIMIT = 6 * 1024 * 1024

_DEBUG = bool(int(os.environ.get("HYPRE_TPU_GSTELL_DEBUG", "0")))
# chunk-loop unroll factor: Python-side Pallas lowering and Mosaic
# compile both scale with the unrolled body size, and a solve program
# embeds ~12 kernel instances (A/P/R per level) — at 64 the fused
# cycle+pcg program takes tens of minutes to lower/compile.  32 is the
# measured sweet spot on the judged 256^3 bench: solve 0.863 s vs
# 0.895 at 8 (P0 matvec 6.1 vs 7.5 ms), warmup compile +~3.5 min —
# well inside the bench budget.
_KUNROLL = int(os.environ.get("HYPRE_TPU_GSTELL_UNROLL", "32"))


def _check(ok: bool, msg: str) -> bool:
    """Invariant check: raise under debug, signal fallback otherwise."""
    if not ok and _DEBUG:
        raise AssertionError(f"gstell packer invariant violated: {msg}")
    return ok


def _why(msg: str) -> None:
    """Under debug, report which gate rejected the matrix."""
    if _DEBUG:
        import sys
        print(f"[gstell reject] {msg}", file=sys.stderr, flush=True)


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "brel", "w0b", "locs", "vals"],
         meta_fields=["n_rows", "n_cols", "c", "g", "b", "eb", "x_rows",
                      "x_rows_pad", "resident", "nnz", "ch_step"])
@dataclasses.dataclass(frozen=True)
class GstEllMatrix:
    """base: int32[n_steps, ch_step, G, 8]  absolute window base row of
             x2d per (chunk, group, sublane) (resident kernel + CPU ref)
    brel: int32[same]  windowed mode: band*Eb + (base - w0_band) —
             direct row index into the concatenated band window scratch
    w0b:  int32[n_steps, B]  per (step, band) x2d window start row
    locs: int16[n_steps, ch_step, 8*G, 128] local offsets in [0,128c)
          (int16 halves HBM bytes; kernels upcast in VMEM)
    vals: real [same]     0 in padding slots

    ch_step = chunks per pallas grid step.  Large operators use big
    steps so the per-step fixed cost (grid dispatch + DMA latency)
    amortizes over ~1 MB of slot data; small ones keep steps short.
    """

    base: jax.Array
    brel: jax.Array            # None in resident mode
    w0b: jax.Array             # None in resident mode
    locs: jax.Array
    vals: jax.Array
    n_rows: int
    n_cols: int
    c: int
    g: int
    b: int                     # number of DMA bands (windowed mode)
    eb: int                    # rows per band window (windowed mode)
    x_rows: int
    x_rows_pad: int
    resident: bool
    nnz: int
    ch_step: int = CH_STEP

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


def _pack_est_s(m: "GstEllMatrix") -> float:
    """Estimated matvec seconds for a packing: HBM slot traffic at
    ~700 GB/s + VPU vreg-ops (8 slab-row reads + gather + select per
    window row per 8-slot group) at ~0.9 G vreg-ops/s.  Drives the
    gap-candidate choice: a wide-window packing can have LESS padding
    but 6x the select ops (measured on the 256^3 level-3 operator:
    gap 64 -> c=4/G=35 ~1 ms vs gap 1024 -> c=63/G=17 ~6 ms).  c == 1
    packings (the 128-aligned cluster mode) drop the whole select
    chain and the sublane-shift decode: one gather per group."""
    slot_bytes = m.vals.size * (m.vals.dtype.itemsize + 2)
    n_chunks = m.vals.size // (8 * m.g * CHUNK)
    per_group = (8 * m.c + 2 * m.c + 6) if m.c > 1 else 13
    ops = n_chunks * m.g * per_group
    return slot_bytes / 700e9 + ops / 0.9e9


def gstell_from_scipy(A, real_dtype=None):
    """Host-side packing.  Returns None when the matrix does not fit
    the format limits (caller falls back to another format)."""
    A = A.tocsr()
    A.sort_indices()
    if A.nnz == 0 or A.shape[0] == 0:
        return None
    from hypre_tpu.setup.utils import native_enabled

    pack = _gstell_pack_native if native_enabled() else _gstell_pack
    best = None
    best_est = float("inf")
    for gap in (GAP, GAP * 16):
        cand = pack(A, real_dtype, gap)
        if cand is None:
            continue
        est = _pack_est_s(cand)
        if best is None or est < best_est:
            best, best_est = cand, est
        # good enough: near the pure-bandwidth floor already
        if best.c <= 1 and best.vals.size <= 2.0 * best.nnz:
            break
    # 128-aligned cluster mode: c = 1 by construction (one gather, no
    # select chain) at the price of more groups/padding.  Measured on
    # the 256^3 level-1 RAP operator: 9.1 ms vs 10.2 classic — a
    # marginal solve win that costs 1.7x the pack transfer through
    # this environment's relay, so it is OPT-IN (device-resident
    # setups, where there is no transfer, may enable it).
    if os.environ.get("HYPRE_TPU_GSTELL_ALIGNED"):
        cand = (pack(A, real_dtype, -1) if pack is _gstell_pack_native
                else _gstell_pack(A, real_dtype, aligned=True))
        if cand is not None and (best is None
                                 or _pack_est_s(cand) < best_est):
            best = cand
    return best


def _gstell_pack_native(A, real_dtype=None, gap=GAP):
    """Native packing (csrc/setup_kernels.cpp:gstell_pack) — same plan
    as _gstell_pack but one OpenMP pass, no large numpy temporaries."""
    from hypre_tpu.core.config import get_config
    from hypre_tpu.csrc import build as native

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    n_rows, n_cols = A.shape
    r = native.gstell_pack(
        A, gap, max_c=MAX_C, max_g=MAX_G, max_b=MAX_B,
        band_gap=BAND_GAP, max_win_rows=MAX_WIN_ROWS,
        vmem_x_limit=VMEM_X_LIMIT, real_dtype=real_dtype,
        ch_step=CH_STEP)
    if r is None:
        return None
    G = r["G"]
    x_rows = max(-(-n_cols // 128), 1)
    return _finish_pack(
        np.asarray(r["base"]).reshape(-1, 8 * G),
        r["locs"].reshape(-1, 8 * G, CHUNK),
        r["vals"].reshape(-1, 8 * G, CHUNK), n_rows=int(n_rows),
        n_cols=int(n_cols), c=int(r["c"]), G=G, x_rows=int(x_rows),
        nnz=int(A.nnz), real_dtype=real_dtype)


def _gstell_pack(A, real_dtype=None, gap=GAP, aligned=False):
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    n_rows, n_cols = A.shape
    x_rows = max(-(-n_cols // 128), 1)
    nnz = A.nnz
    indptr = A.indptr.astype(np.int64)
    col = A.indices.astype(np.int64)
    dat = A.data
    row_nnz = np.diff(indptr)
    row = np.repeat(np.arange(n_rows, dtype=np.int64), row_nnz)
    chunk = row // CHUNK
    lane = row % CHUNK
    n_chunks = -(-n_rows // CHUNK)
    n_steps = -(-n_chunks // CH_STEP)
    n_chunks_pad = n_steps * CH_STEP

    # --- PER-CHUNK column clustering ----------------------------------
    # Cluster the raw column indices within each chunk of 128 rows
    # (split where the sorted-union gap exceeds `gap`).  Global
    # clustering (the old design) smears: for rectangular P/R the union
    # over all rows of per-row-relative offsets fills in and merges
    # into one fat cluster, blowing the window width c to 90-260 at
    # 128^3; per-chunk clusters track the local geometry and keep the
    # spread near the true local bandwidth (c ~ 2-6).
    order = np.lexsort((col, chunk))
    scol = col[order]
    schunk = chunk[order]
    newch = np.empty(nnz, dtype=bool)
    newch[0] = True
    newch[1:] = schunk[1:] != schunk[:-1]
    newcl = newch.copy()
    if aligned:
        # cluster = 128-aligned column block: every (chunk, slot)
        # window is exactly one x2d row, so c == 1 and the kernel
        # needs one gather and zero selects per group
        newcl[1:] |= (scol[1:] >> 7) != (scol[:-1] >> 7)
    else:
        newcl[1:] |= (scol[1:] - scol[:-1]) > gap
    gcl = np.cumsum(newcl) - 1                 # global cluster id
    chunk_seq = np.cumsum(newch) - 1           # dense chunk rank
    first_gcl = gcl[newch]                     # per nonempty chunk
    ecl_sorted = gcl - first_gcl[chunk_seq]    # per-chunk cluster index
    n_clusters = int(ecl_sorted.max(initial=0)) + 1
    if n_clusters > 8 * MAX_G:
        _why(f"n_clusters={n_clusters} > {8*MAX_G}")
        return None
    ecl = np.empty(nnz, dtype=np.int64)
    ecl[order] = ecl_sorted

    # --- rank within (row, cluster) via run detection ----------------
    # CSR column indices are sorted per row, and per-chunk clusters are
    # disjoint ascending column ranges, so same-cluster entries form
    # contiguous ascending runs within a row.  rank = position in run.
    newrun = np.empty(nnz, dtype=bool)
    newrun[0] = True
    newrun[1:] = ecl[1:] != ecl[:-1]
    newrun[indptr[:-1][row_nnz > 0]] = True     # row starts
    run_start = np.flatnonzero(newrun)
    run_id = np.cumsum(newrun) - 1
    rank = np.arange(nnz, dtype=np.int64) - run_start[run_id]

    # PER-CHUNK slot assignment: each (chunk, cluster) gets exactly the
    # slot range its own rows need — slots have per-chunk meaning (the
    # window bases are per-chunk anyway), which keeps G near the true
    # max row width instead of the sum of global cluster maxima.
    # max run length per (chunk, cluster) — reduce over runs, not nnz
    run_len = np.diff(np.append(run_start, nnz))
    run_chunk = chunk[run_start]
    run_ecl = ecl[run_start]
    m_2d = np.zeros((n_chunks_pad, n_clusters), dtype=np.int64)
    np.maximum.at(m_2d, (run_chunk, run_ecl), run_len)
    slot_start_2d = np.concatenate(
        [np.zeros((n_chunks_pad, 1), np.int64),
         np.cumsum(m_2d, axis=1)[:, :-1]], axis=1)
    S_max = int(m_2d.sum(axis=1).max(initial=0))
    G = -(-S_max // 8)
    if G == 0 or G > MAX_G:
        _why(f"G={G} (S_max={S_max}) > {MAX_G}")
        return None

    # refuse pathological padding before allocating (a non-banded
    # matrix can pass the G gate yet need many empty slots)
    projected_slots = n_chunks_pad * 8 * G * CHUNK
    if projected_slots > max(16 * nnz, 1 << 20):
        _why(f"padding {projected_slots} > 16*nnz={16*nnz}")
        return None

    slot = slot_start_2d[chunk, ecl] + rank   # per-chunk slot id

    # --- scatter cols once; per (chunk, slot) ranges by reduction ----
    col_arr = np.full((n_chunks_pad, 8 * G, CHUNK), np.int64(-1))
    col_arr[chunk, slot, lane] = col
    used2 = (col_arr >= 0).any(axis=2)
    big = np.int64(1) << 62
    cmin2 = np.where(col_arr >= 0, col_arr, big).min(axis=2)
    cmax2 = col_arr.max(axis=2)
    cmin = np.where(used2, cmin2, 0).reshape(-1)
    cmax = np.where(used2, cmax2, 0).reshape(-1)
    used = used2.reshape(-1)

    base = cmin // 128
    spread = np.where(used, cmax - base * 128, 0)
    c = int(np.ceil((spread.max(initial=0) + 1) / 128.0))
    c = max(c, 1)
    # wide windows are fine when x is VMEM-resident (selects are much
    # cheaper than the XLA-gather fallback); windowed mode keeps the
    # tighter cap so band DMAs stay bounded
    resident_fits = (x_rows + c) * 128 * real_dtype.itemsize \
        <= VMEM_X_LIMIT
    max_c = 4 * MAX_C if (resident_fits or nnz <= 1_000_000) else MAX_C
    if c > max_c:
        _why(f"c={c} > max_c={max_c}")
        return None
    if G * (2 * c + 8) > MAX_KOPS:
        _why(f"kernel body G*(2c+8)={G * (2 * c + 8)} > {MAX_KOPS}")
        return None

    # unused slots must not widen the per-step windows: fill them with
    # a used base from the same chunk (fallback: nearest used chunk)
    used2 = used.reshape(n_chunks_pad, 8 * G)
    base2 = base.reshape(n_chunks_pad, 8 * G)
    chunk_any = used2.any(axis=1)
    chunk_min = np.where(
        chunk_any,
        np.where(used2, base2, np.iinfo(np.int64).max).min(axis=1), -1)
    if chunk_any.any():
        idx = np.where(chunk_any, np.arange(n_chunks_pad), -1)
        np.maximum.accumulate(idx, out=idx)
        first_c = np.flatnonzero(chunk_any)[0]
        idx[idx < 0] = first_c
        chunk_fill = chunk_min[idx]
    else:
        chunk_fill = np.zeros(n_chunks_pad, dtype=np.int64)
    base2 = np.where(used2, base2, chunk_fill[:, None])
    base = base2.reshape(-1)

    # --- pack arrays -------------------------------------------------
    present = col_arr >= 0
    loc_arr = np.where(present, col_arr - base2[:, :, None] * 128, 0)
    if not _check(loc_arr.min(initial=0) >= 0
                  and loc_arr.max(initial=0) < 128 * c,
                  "locs out of [0, 128c)"):
        return None
    locs = loc_arr.astype(np.int16)
    del col_arr, loc_arr
    vals = np.zeros((n_chunks_pad, 8 * G, CHUNK), dtype=real_dtype)
    vals[chunk, slot, lane] = dat

    base_steps = base.reshape(n_steps, CH_STEP * 8 * G)

    return _finish_pack(
        base_steps, locs.reshape(-1, 8 * G, CHUNK),
        vals.reshape(-1, 8 * G, CHUNK), n_rows=int(n_rows),
        n_cols=int(n_cols), c=int(c), G=G, x_rows=int(x_rows),
        nnz=int(A.nnz), real_dtype=real_dtype)


def _band_bases(base_steps, c, max_win_rows=MAX_WIN_ROWS):
    """Cluster each grid step's window bases into <= MAX_B contiguous
    DMA bands (windowed mode).  base_steps: int (n_steps, S_total).
    Returns (brel, w0b, B, eb) or None when the windows cannot be
    bounded."""
    n_steps = base_steps.shape[0]
    sb = np.sort(base_steps, axis=1)              # (n_steps, S)
    gaps = np.diff(sb, axis=1)
    # split where the gap is large AND among the MAX_B-1 largest
    # of its step (guarantees B <= MAX_B)
    if gaps.shape[1] > MAX_B - 1:
        kth = np.partition(gaps, gaps.shape[1] - (MAX_B - 1),
                           axis=1)[:, gaps.shape[1] - (MAX_B - 1)]
        is_split = (gaps > BAND_GAP) & (gaps >= kth[:, None])
        # ties at kth could still exceed MAX_B-1 splits; enforce
        counts = is_split.cumsum(axis=1)
        is_split &= counts <= (MAX_B - 1)
    else:
        is_split = gaps > BAND_GAP
    band_sorted = np.concatenate(
        [np.zeros((n_steps, 1), np.int64),
         is_split.cumsum(axis=1)], axis=1)        # band of sorted pos
    B = int(band_sorted.max(initial=0)) + 1
    # per (step, band) window start = first base of the band
    w0b = np.full((n_steps, B), np.iinfo(np.int64).max)
    st = np.repeat(np.arange(n_steps), sb.shape[1])
    np.minimum.at(w0b, (st, band_sorted.reshape(-1)), sb.reshape(-1))
    # band of each (step, slot): count band starts <= base.  Empty
    # trailing bands still hold the +inf sentinel here, so they are
    # never counted and the ascending-order assumption holds.
    band = (base_steps[:, :, None] >= w0b[:, None, :]).sum(axis=2) - 1
    band = np.maximum(band, 0)
    # empty bands (steps with fewer bands than B): reuse band 0's
    # start so their (wasted but harmless) DMA stays in-bounds
    w0b = np.where(w0b == np.iinfo(np.int64).max, w0b[:, :1], w0b)
    rel = base_steps - np.take_along_axis(w0b, band, axis=1)
    eb = int(rel.max(initial=0)) + c
    if B * eb > max_win_rows:
        _why(f"bands B={B} eb={eb} > max_win_rows={max_win_rows}")
        return None
    if not _check((rel >= 0).all(), "negative band-relative base"):
        return None
    if not _check((rel + c <= eb).all(), "band window overrun"):
        return None
    brel = band * eb + rel
    return brel, w0b, B, eb


def _pick_ch_step(n_chunks, G, resident):
    """Chunks per grid step: amortize per-step fixed costs (grid
    dispatch ~1 us + band-DMA latency) over >= ~3 MB of slot data.
    VMEM budget: 2x the step block (pipeline double-buffer) + the
    resident x block (<= VMEM_X_LIMIT) or 2x band windows, within the
    16 MB VMEM."""
    ov = os.environ.get("HYPRE_TPU_GSTELL_CHSTEP")
    if ov:
        return int(ov)
    per_chunk = 8 * G * CHUNK * 6              # vals f32 + locs i16
    target = max(1, (3 * 1024 * 1024) // per_chunk)
    ch = 1 << (target.bit_length() - 1)
    # never pad a small matrix past its own chunk count
    cap = 1 << max(int(n_chunks) - 1, 1).bit_length()
    return int(max(CH_STEP, min(256, cap, ch)))


def _finish_pack(base_steps, locs, vals, *, n_rows, n_cols, c, G,
                 x_rows, nnz, real_dtype, ch_step=None):
    """Shared packing tail: pick the grid step size, decide
    resident/windowed, band the windows, and assemble the pytree.

    base_steps: int (n_steps8, 8*8G) window bases at CH_STEP=8 layout
    locs/vals:  (n_chunks_pad8, 8G, 128) numpy or device arrays
    """
    resident = (x_rows + c) * 128 * real_dtype.itemsize <= VMEM_X_LIMIT
    base_flat0 = np.asarray(base_steps).reshape(-1, 8 * G)  # per chunk
    if ch_step is None:
        ch_step = _pick_ch_step(base_flat0.shape[0], G, resident)
    out = None
    while out is None and ch_step >= CH_STEP:
        out = _finish_pack_at(
            base_flat0, locs, vals, n_rows=n_rows, n_cols=n_cols, c=c,
            G=G, x_rows=x_rows, nnz=nnz, real_dtype=real_dtype,
            ch_step=ch_step, resident=resident)
        ch_step //= 2
    return out


def _finish_pack_at(base_flat, locs, vals, *, n_rows, n_cols, c, G,
                    x_rows, nnz, real_dtype, ch_step, resident):
    # pad the chunk count to a multiple of ch_step (device packs hand
    # in exactly ceil(n/CHUNK) chunks; host packs are pre-padded to 8)
    n_chunks_new = -(-base_flat.shape[0] // ch_step) * ch_step
    extra = n_chunks_new - base_flat.shape[0]
    if extra:
        fill = base_flat[-1:].repeat(extra, axis=0)
        base_flat = np.concatenate([base_flat, fill], axis=0)
    n_steps = base_flat.shape[0] // ch_step
    shape4 = (n_steps, ch_step, 8 * G, CHUNK)
    if isinstance(locs, np.ndarray):
        if extra:
            locs = np.pad(locs, [(0, extra), (0, 0), (0, 0)])
            vals = np.pad(vals, [(0, extra), (0, 0), (0, 0)])
        locs = locs.reshape(shape4)
        vals = vals.reshape(shape4)
    elif locs.ndim == 4 and locs.shape != shape4:
        # retry at a smaller ch_step: flatten back to per-chunk rows
        locs = locs.reshape(-1, 8 * G, CHUNK)
        vals = vals.reshape(-1, 8 * G, CHUNK)
        locs, vals = _pad_reshape4(locs, vals, extra=extra,
                                   shape4=shape4)
    elif locs.ndim != 4:
        # one fused device program for pad+reshape (eager ops would
        # each materialize an extra copy of the ~GB slot arrays)
        locs, vals = _pad_reshape4(locs, vals, extra=extra,
                                   shape4=shape4)
    base_steps = base_flat.reshape(n_steps, ch_step * 8 * G)

    brel_arr = w0b_arr = None
    B = eb = 0
    if resident:
        x_rows_pad = int(base_steps.max(initial=0)) + c
        x_rows_pad = max(x_rows_pad, x_rows)
    else:
        r = _band_bases(base_steps, c)
        if r is None:
            return None
        brel, w0b, B, eb = r
        x_rows_pad = max(int(w0b.max(initial=0)) + eb, x_rows)
        brel_arr = jnp.asarray(
            brel.reshape(n_steps, ch_step, G, 8).astype(np.int32))
        w0b_arr = jnp.asarray(w0b.astype(np.int32))

    if isinstance(locs, np.ndarray):
        locs_arr = jnp.asarray(locs)
        vals_arr = jnp.asarray(vals)
    else:
        locs_arr, vals_arr = _default_layout(locs, vals)

    return GstEllMatrix(
        base=jnp.asarray(base_steps.reshape(n_steps, ch_step, G, 8)
                         .astype(np.int32)),
        brel=brel_arr, w0b=w0b_arr, locs=locs_arr, vals=vals_arr,
        n_rows=int(n_rows), n_cols=int(n_cols), c=int(c), g=G,
        b=int(B), eb=int(eb), x_rows=int(x_rows),
        x_rows_pad=int(x_rows_pad), resident=bool(resident),
        nnz=int(nnz), ch_step=int(ch_step),
    )


def _default_layout(*arrays):
    """Re-lay-out device arrays to the default (descending
    major_to_minor, (8, 128)-tiled) layout with one on-device copy.

    jit programs whose outputs pass through transposes/reshapes (the
    device packers) can come out with a PERMUTED physical layout; the
    pallas kernel's per-step block fetches then run ~20x slower
    (measured 48 ms vs 2.4 ms on the 64^3 stencil matvec).  Pallas
    assumes default layouts — guarantee them here."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    outs = []
    for a in arrays:
        if a is None or isinstance(a, np.ndarray):
            outs.append(a)
            continue
        try:
            dev = next(iter(a.devices()))
            fmt = Format(Layout(tuple(range(a.ndim))),
                         SingleDeviceSharding(dev))
            outs.append(jax.jit(lambda x: x, out_shardings=fmt)(a))
        except Exception:
            outs.append(a)      # CPU/older backends: layouts are moot
    return outs


@partial(jax.jit, static_argnames=("extra", "shape4"))
def _pad_reshape4(locs, vals, *, extra, shape4):
    if extra:
        locs = jnp.pad(locs, [(0, extra), (0, 0), (0, 0)])
        vals = jnp.pad(vals, [(0, extra), (0, 0), (0, 0)])
    return locs.reshape(shape4), vals.reshape(shape4)


def gstell_from_stencil(shape, entries, real_dtype=None):
    """Analytic GST-ELL pack of a stencil operator (x-fastest grid
    ordering, Dirichlet truncation — the operator gen.stencil_matrix
    builds, ref: src/parcsr_ls/par_laplace.c:63).

    The structure is pure index arithmetic: arm k of the stencil gets
    slot k, its window base for a chunk of 128 rows is
    (chunk*128 + disp_k) // 128 (clamped at 0), and every local offset
    lands in [0, 256) so c = 2.  Values materialize directly on device
    from the boundary masks — no host matrix and no host->device copy
    beyond O(n_chunks) window metadata.  Exactly equivalent to
    gstell_from_scipy(gen.stencil_matrix(shape, entries)) up to slot
    assignment."""
    from hypre_tpu.core.config import get_config

    real_dtype = np.dtype(real_dtype or get_config().np_real)
    nx, ny, nz = shape
    n = nx * ny * nz
    ents = sorted(((d, v) for d, v in entries if v != 0.0),
                  key=lambda e: e[0][0] + nx * (e[0][1] + ny * e[0][2]))
    K = len(ents)
    if K == 0 or n == 0:
        return None
    G = -(-K // 8)
    if G > MAX_G:
        return None
    S = 8 * G
    disp = np.array([dx + nx * (dy + ny * dz) for (dx, dy, dz), _ in ents],
                    np.int64)
    n_chunks = -(-n // 128)
    x_rows = max(-(-n // 128), 1)

    chunks = np.arange(n_chunks, dtype=np.int64)
    base = np.zeros((n_chunks, S), np.int64)
    base[:, :K] = np.maximum(
        (chunks[:, None] * 128 + disp[None, :]) // 128, 0)
    base[:, K:] = base[:, :1]          # pad slots share slot 0's window

    # nnz of the truncated stencil (for padding diagnostics)
    nnz = 0
    for (dx, dy, dz), _ in ents:
        nnz += max(nx - abs(dx), 0) * max(ny - abs(dy), 0) \
            * max(nz - abs(dz), 0)

    jreal = jnp.dtype(real_dtype)
    # pick the grid-step layout up front so the builder emits the final
    # 4D (n_steps, ch_step, S, 128) arrays in one fused program —
    # no post-hoc pad/reshape copies of the GB-scale slot arrays
    c = 2
    resident = (x_rows + c) * 128 * real_dtype.itemsize <= VMEM_X_LIMIT
    ch_step = _pick_ch_step(n_chunks, G, resident)
    n_chunks_pad = -(-n_chunks // ch_step) * ch_step
    n_steps = n_chunks_pad // ch_step

    @jax.jit
    def build_slots(base_dev):
        lin = jnp.arange(n_chunks_pad * 128, dtype=jnp.int32)
        gx = lin % nx
        gy = (lin // nx) % ny
        gz = lin // (nx * ny)
        in_range = lin < n
        locs_k = []
        vals_k = []
        for k, ((dx, dy, dz), v) in enumerate(ents):
            ok = (in_range & (gx + dx >= 0) & (gx + dx < nx)
                  & (gy + dy >= 0) & (gy + dy < ny)
                  & (gz + dz >= 0) & (gz + dz < nz))
            col = lin + jnp.int32(disp[k])
            b = jnp.repeat(base_dev[:, k], 128)
            locs_k.append(jnp.where(ok, col - 128 * b, 0)
                          .astype(jnp.int16))
            vals_k.append(jnp.where(ok, jnp.asarray(v, jreal), 0))
        locs = jnp.stack(locs_k, axis=1)           # (n_pad, K)
        vals = jnp.stack(vals_k, axis=1)
        pad = [(0, 0), (0, S - K)]
        locs = jnp.pad(locs, pad)
        vals = jnp.pad(vals, pad)
        locs = locs.reshape(n_chunks_pad, 128, S).transpose(0, 2, 1)
        vals = vals.reshape(n_chunks_pad, 128, S).transpose(0, 2, 1)
        return (locs.reshape(n_steps, ch_step, S, 128),
                vals.reshape(n_steps, ch_step, S, 128))

    if n_chunks_pad > n_chunks:
        fill = base[-1:].repeat(n_chunks_pad - n_chunks, axis=0)
        base = np.concatenate([base, fill], axis=0)
    locs_dev, vals_dev = build_slots(jnp.asarray(base.astype(np.int32)))
    return _finish_pack(base, locs_dev, vals_dev, n_rows=int(n),
                        n_cols=int(n), c=c, G=G, x_rows=int(x_rows),
                        nnz=int(nnz), real_dtype=real_dtype,
                        ch_step=ch_step)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _chunk_body(base_get, locs_row, vals_row, slab_at, c, G, dtype):
    """Accumulate one chunk's 128 row sums.

    base_get: (g, s) -> scalar window base row;
    slab_at:  b -> (c, 128) rows [b, b+c) of the x window.

    One (c, 128) slab read per sublane (not c row reads): every traced
    op costs ~1 ms of lowering time in this JAX version (each jnp op
    dispatches through the pjit machinery), and the solve program
    embeds ~12 kernel instances, so op count directly sets the
    multi-minute lowering wall."""
    total = jnp.zeros((8, 128), dtype=dtype)
    for g in range(G):
        locs_blk = locs_row[g * 8:(g + 1) * 8, :].astype(jnp.int32)
        if c == 1:
            # aligned packing: every loc already indexes the single
            # window row — one gather, no select chain
            lane = locs_blk
        else:
            lane = jnp.bitwise_and(locs_blk, 127)
            sub = jnp.right_shift(locs_blk, 7)
        # (c, 8, 128): window row w of sublane s at [w, s]
        slabs = jnp.stack([slab_at(base_get(g, s)) for s in range(8)],
                          axis=1)
        acc = jnp.take_along_axis(slabs[0], lane, axis=1)
        for w in range(1, c):
            gw = jnp.take_along_axis(slabs[w], lane, axis=1)
            acc = jnp.where(sub == w, gw, acc)
        v = vals_row[g * 8:(g + 1) * 8, :]
        total = total + v.astype(dtype) * acc
    return jnp.sum(total, axis=0)


def _compute_dtype(A: GstEllMatrix):
    """x / accumulator dtype: f32 even when slot vals are stored bf16
    (mixed precision halves the dominant HBM stream — the slot vals —
    while gathers, products and row sums stay f32)."""
    d = A.vals.dtype
    return jnp.float32 if d == jnp.bfloat16 else d


def _pad_x2d(A: GstEllMatrix, x: jax.Array) -> jax.Array:
    dtype = _compute_dtype(A)
    npad = A.x_rows_pad * 128
    return jnp.pad(x.astype(dtype), (0, npad - A.n_cols)).reshape(
        A.x_rows_pad, 128)


def gstell_half(A: GstEllMatrix) -> GstEllMatrix:
    """bf16 slot-vals variant of a packed matrix (locs stay int16, x
    and accumulation stay f32).  Needs G >= 2 so the bf16 vals block
    satisfies Mosaic's (16, 128) tile; G == 1 matrices are returned
    unchanged."""
    if A is None or A.g < 2 or A.vals.dtype == jnp.bfloat16:
        return A
    return dataclasses.replace(A, vals=A.vals.astype(jnp.bfloat16))


def gstell_matvec(A: GstEllMatrix, x: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = A.locs.shape[0]
    G, c, CH = A.g, A.c, A.ch_step
    dtype = _compute_dtype(A)
    x2d = _pad_x2d(A, x)

    if A.resident:
        def kernel(base_ref, locs_ref, vals_ref, x_ref, y_ref):
            # fori_loop (not Python unroll) over the step's chunks:
            # Mosaic compile time scales with body size, and ch_step
            # can be 64 — unrolled, that is minutes of compile
            K = min(_KUNROLL, CH)   # CH is a power of two >= 8

            def chunk_at(blk, _):
                for j in range(K):      # manual partial unroll
                    ch = blk * K + j
                    y_ref[0, ch, :] = _chunk_body(
                        lambda g, s: base_ref[0, ch, g, s],
                        locs_ref[0, ch], vals_ref[0, ch],
                        lambda b: x_ref[pl.ds(b, c), :], c, G, dtype)
                return ()

            jax.lax.fori_loop(0, CH // K, chunk_at, ())

        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_steps, CH, CHUNK), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, CH, G, 8), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((A.x_rows_pad, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CH, CHUNK),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(A.base, A.locs, A.vals, x2d)
    else:
        B, Eb = A.b, A.eb
        WIN = B * Eb

        def kernel_w(w0b_ref, brel_ref, locs_ref, vals_ref, x_hbm, y_ref,
                     win, sems):
            t = pl.program_id(0)
            slot = jax.lax.rem(t, 2)
            nslot = jax.lax.rem(t + 1, 2)

            def band_copy(u, sl, bd):
                # w0b is passed flat: a 2-D SMEM array gets lane-padded
                # to (n_steps, 128) and blows the 1 MB SMEM budget
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(w0b_ref[u * B + bd], Eb), :],
                    win.at[pl.ds(sl * WIN + bd * Eb, Eb), :],
                    sems.at[sl * B + bd])

            @pl.when(t == 0)
            def _():
                for bd in range(B):
                    band_copy(t, slot, bd).start()

            @pl.when(t + 1 < n_steps)
            def _():
                for bd in range(B):
                    band_copy(t + 1, nslot, bd).start()

            for bd in range(B):
                band_copy(t, slot, bd).wait()

            off = slot * WIN

            K = min(_KUNROLL, CH)   # CH is a power of two >= 8

            def chunk_at(blk, _):
                for j in range(K):      # manual partial unroll
                    ch = blk * K + j
                    y_ref[0, ch, :] = _chunk_body(
                        lambda g, s: brel_ref[0, ch, g, s] + off,
                        locs_ref[0, ch], vals_ref[0, ch],
                        lambda b: win[pl.ds(b, c), :], c, G, dtype)
                return ()

            jax.lax.fori_loop(0, CH // K, chunk_at, ())

        y = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct((n_steps, CH, CHUNK), dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # w0b, whole
                pl.BlockSpec((1, CH, G, 8), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH, 8 * G, CHUNK),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),       # x2d in HBM
            ],
            out_specs=pl.BlockSpec((1, CH, CHUNK),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * WIN, 128), dtype),
                pltpu.SemaphoreType.DMA((2 * B,)),
            ],
        )(A.w0b.reshape(-1), A.brel, A.locs, A.vals, x2d)

    return y.reshape(-1)[:A.n_rows]


gstell_matvec_jit = jax.jit(gstell_matvec)


def gstell_matvec_reference(A: GstEllMatrix, x: jax.Array) -> jax.Array:
    """Pure-jnp semantics of the kernel (CPU tests / fallback)."""
    dtype = _compute_dtype(A)
    npad = A.x_rows_pad * 128
    xp = jnp.pad(x.astype(dtype), (0, npad - A.n_cols))
    n_steps, CH, S, L = A.locs.shape
    base = A.base.reshape(n_steps, CH, S, 1)
    flat = base.astype(jnp.int64) * 128 + A.locs
    gat = jnp.take(xp, flat.reshape(-1), axis=0).reshape(flat.shape)
    y = jnp.sum(A.vals.astype(dtype) * gat, axis=2)  # sum over slots
    return y.reshape(-1)[:A.n_rows]


gstell_matvec_jit = jax.jit(gstell_matvec)


def gstell_matvec_reference_windowed(A: GstEllMatrix,
                                     x: jax.Array) -> jax.Array:
    """Pure-jnp emulation of the WINDOWED kernel's addressing (brel +
    band windows), for validating the band construction on CPU."""
    assert not A.resident
    dtype = A.vals.dtype
    npad = A.x_rows_pad * 128
    xp = jnp.pad(x.astype(dtype), (0, npad - A.n_cols)).reshape(-1, 128)
    n_steps, CH, S, L = A.locs.shape
    B, Eb = A.b, A.eb
    ys = []
    for t in range(n_steps):
        # build this step's concatenated band window
        win = jnp.concatenate(
            [jax.lax.dynamic_slice(
                xp, (A.w0b[t, bd].astype(jnp.int32), jnp.int32(0)),
                (Eb, 128))
             for bd in range(B)], axis=0).reshape(-1)
        brel = A.brel[t].reshape(CH, S, 1)
        flat = brel.astype(jnp.int32) * 128 + A.locs[t]
        gat = jnp.take(win, flat.reshape(-1)).reshape(flat.shape)
        ys.append(jnp.sum(A.vals[t] * gat, axis=1))
    return jnp.stack(ys).reshape(-1)[:A.n_rows]
