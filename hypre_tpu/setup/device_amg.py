"""Device-side AMG setup: the whole BoomerAMG setup phase as XLA
programs over a padded slot-major ELL operand, so the hierarchy is
built ON the TPU with no host round-trips beyond per-level scalar
metadata.

This is the TPU-native analog of hypre's device setup path:
  * strength               ref: src/parcsr_ls/par_strength.c:531 (host
                           semantics), device par_strength_device.c
  * PMIS                   ref: src/parcsr_ls/par_coarsen_device.c:30
  * direct / ext+i interp  ref: src/parcsr_ls/par_interp.c:1948,
                           par_lr_interp_device.c:1001
  * truncation             ref: src/parcsr_mv/par_csr_matrix.c:2874
  * SpGEMM / RAP           ref: src/seq_mv/csr_spgemm_device.c:15 (the
                           hash-table SpGEMM becomes sort+segment-sum
                           over bounded per-row candidate lists)
  * transpose              ref: src/seq_mv/csr_matop_device.c (cusparse
                           csr2csc analog via one global key sort)

Everything here is jitted jnp (runs on CPU for tests, TPU for real),
uses static shapes only, and bounds memory with lax.map row-chunking.
The representation is `DEll`, stored SLOT-MAJOR:

  cols: int32[w, n]   column index per slot, **-1 in padding slots**
  vals: real[w, n]    value per slot (0 in padding)
  n_cols: static

The (w, n) orientation is load-bearing on TPU: arrays are tiled
(8 sublanes, 128 lanes) on their last two dims, so an (n, w<128)
array that materializes inside a program is padded to (n, 128) — an
18x HBM blow-up and a ~200x slowdown measured at 256^3.  With n on
the lane dim every temp is compact.

Within each row (a lane), slots hold the CSR column order (ascending,
padding compacted to the high slots), which the device GST-ELL packer
(ops/gstell_device.py) relies on for window locality.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

C_PT = 1
F_PT = -1
SF_PT = -3


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals"], meta_fields=["n_cols", "disp"])
@dataclasses.dataclass(frozen=True)
class DEll:
    """Slot-major padded ELL for device-side setup (pad col = -1).

    disp: when not None, slot k is stencil arm k — cols[k, i] = i +
    disp[k] wherever valid (padding holes interleave at boundaries).
    Setup gathers along the structure then become shifted slices
    (560 GB/s) instead of XLA gathers (0.11 Gelem/s measured on v5e);
    see dell_gather_vec / dell_gather_rows."""

    cols: jax.Array          # int32 (w, n)
    vals: jax.Array          # real (w, n)
    n_cols: int
    disp: tuple | None = None

    @property
    def n_rows(self) -> int:
        return self.cols.shape[1]

    @property
    def width(self) -> int:
        return self.cols.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def mask(self) -> jax.Array:
        return self.cols >= 0


def _shift_read(x: jax.Array, d: int, m: int | None = None,
                start=None):
    """x[start + j + d] for j in [0, m) as a slice (zero fill OOB).
    start=None reads the whole vector (start=0, m=len)."""
    n = x.shape[0]
    if start is None:
        if d >= 0:
            return jnp.concatenate(
                [x[d:], jnp.zeros((min(d, n),), x.dtype)])[:n]
        return jnp.concatenate(
            [jnp.zeros((min(-d, n),), x.dtype), x[:n + d] if n + d > 0
             else x[:0]])[:n]
    raise NotImplementedError


def dell_gather_vec(A: DEll, x: jax.Array, fill=0) -> jax.Array:
    """g[s, i] = x[A.cols[s, i]] (fill in padding slots).

    Stencil operators (A.disp set) read shifted slices — no gather."""
    if A.disp is not None:
        g = jnp.stack([_shift_read(x, d) for d in A.disp], axis=0)
    else:
        safe = jnp.where(A.mask, A.cols, 0)
        g = jnp.take(x, safe, axis=0)
    fillv = jnp.asarray(fill, g.dtype)
    return jnp.where(A.mask, g, fillv)


# ---------------------------------------------------------------------------
# host <-> device conversions (tests + interop)
# ---------------------------------------------------------------------------

def dell_from_scipy(A, real_dtype=np.float32) -> DEll:
    import scipy.sparse as sp  # noqa: F401

    A = A.tocsr()
    A.sort_indices()
    n_rows, n_cols = A.shape
    row_nnz = np.diff(A.indptr)
    width = max(int(row_nnz.max(initial=0)), 1)
    cols = np.full((n_rows, width), -1, dtype=np.int32)
    vals = np.zeros((n_rows, width), dtype=np.dtype(real_dtype))
    slot = np.arange(len(A.indices)) - np.repeat(A.indptr[:-1], row_nnz)
    rows = np.repeat(np.arange(n_rows), row_nnz)
    cols[rows, slot] = A.indices
    vals[rows, slot] = A.data
    return DEll(cols=jnp.asarray(np.ascontiguousarray(cols.T)),
                vals=jnp.asarray(np.ascontiguousarray(vals.T)),
                n_cols=int(n_cols))


def dell_to_scipy(M: DEll):
    import scipy.sparse as sp

    cols = np.asarray(M.cols)
    vals = np.asarray(M.vals)
    mask = cols >= 0
    rows = np.broadcast_to(np.arange(M.n_rows)[None, :], cols.shape)
    A = sp.csr_matrix(
        (vals[mask].astype(np.float64), (rows[mask], cols[mask])),
        shape=(M.n_rows, M.n_cols))
    A.sum_duplicates()
    A.sort_indices()
    return A


_W_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 256)


@partial(jax.jit, static_argnames=("wb",))
def _pad_width_jit(cols, vals, *, wb):
    ex = wb - cols.shape[0]
    return (jnp.pad(cols, [(0, ex), (0, 0)], constant_values=-1),
            jnp.pad(vals, [(0, ex), (0, 0)]))


def dell_pad_width(M: DEll) -> DEll:
    """Round the slot dimension up to a bucket (-1/0 padding slots).
    Setup-program shapes key on the width, so bucketing lets levels
    with similar widths SHARE compiled programs — each distinct
    program costs 30-180 s of compile per process on this relay.
    Stencil operators (disp) keep their exact arm count."""
    if M.disp is not None:
        return M
    wb = M.width
    for b in _W_BUCKETS:
        if M.width <= b:
            wb = b
            break
    if wb == M.width:
        return M
    c, v = _pad_width_jit(M.cols, M.vals, wb=wb)
    return DEll(cols=c, vals=v, n_cols=M.n_cols)


def dell_matvec(M: DEll, x: jax.Array) -> jax.Array:
    """y = M @ x (setup-phase utility; the solve phase uses the packed
    GST-ELL / DIA kernels, not this)."""
    safe = jnp.where(M.mask, M.cols, 0)
    g = jnp.take(x, safe, axis=0)
    return jnp.sum(jnp.where(M.mask, M.vals * g, 0), axis=0)


# ---------------------------------------------------------------------------
# device stencil generator (gen/laplace.py twin — no host matrix, no
# tunnel transfer: the operator materializes directly in HBM)
# ---------------------------------------------------------------------------

def dell_stencil(shape, entries, dtype=jnp.float32) -> DEll:
    """Stencil operator on an (nx, ny, nz) grid, x-fastest ordering,
    Dirichlet truncation (semantics of gen/laplace.py stencil_matrix,
    ref: src/parcsr_ls/par_laplace.c:63).  One fused XLA program."""
    ents = tuple(sorted(
        ((tuple(d), float(v)) for d, v in entries if v != 0.0),
        key=lambda e: e[0][0] + shape[0] * (e[0][1]
                                            + shape[1] * e[0][2])))
    cols, vals = _dell_stencil_jit(tuple(shape), ents, jnp.dtype(dtype))
    nx, ny, _nz = shape
    disp = tuple(int(dx + nx * (dy + ny * dz)) for (dx, dy, dz), _ in ents)
    return DEll(cols=cols, vals=vals,
                n_cols=shape[0] * shape[1] * shape[2], disp=disp)


@partial(jax.jit, static_argnames=("shape", "ents", "dtype"))
def _dell_stencil_jit(shape, ents, dtype):
    nx, ny, nz = shape
    n = nx * ny * nz
    lin = jnp.arange(n, dtype=jnp.int32)
    x = lin % nx
    y = (lin // nx) % ny
    z = lin // (nx * ny)
    cols = []
    vals = []
    for (dx, dy, dz), v in ents:
        ok = ((x + dx >= 0) & (x + dx < nx) & (y + dy >= 0)
              & (y + dy < ny) & (z + dz >= 0) & (z + dz < nz))
        disp = dx + nx * (dy + ny * dz)
        cols.append(jnp.where(ok, lin + disp, -1))
        vals.append(jnp.where(ok, jnp.asarray(v, dtype), 0))
    # slot k = stencil arm k (ents are disp-ascending, so valid cols
    # ascend along the slot axis; boundary padding holes interleave —
    # the DEll.disp shift fast paths rely on this identity)
    return jnp.stack(cols, axis=0), jnp.stack(vals, axis=0)


def dell_laplacian(nx, ny, nz=1, cx=1.0, cy=1.0, cz=1.0,
                   dtype=jnp.float32) -> DEll:
    """7-pt (5-pt in 2D) Laplacian, matching gen.laplacian."""
    diag = 0.0
    entries = []
    if nx > 1:
        diag += 2 * cx
        entries += [((-1, 0, 0), -cx), ((1, 0, 0), -cx)]
    if ny > 1:
        diag += 2 * cy
        entries += [((0, -1, 0), -cy), ((0, 1, 0), -cy)]
    if nz > 1:
        diag += 2 * cz
        entries += [((0, 0, -1), -cz), ((0, 0, 1), -cz)]
    entries.append(((0, 0, 0), diag))
    return dell_stencil((nx, ny, nz), entries, dtype)


# ---------------------------------------------------------------------------
# strength of connection (strength.py twin)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("theta", "max_row_sum", "abs_soc"))
def device_strength(A: DEll, theta: float = 0.25,
                    max_row_sum: float = 0.9,
                    abs_soc: bool = False) -> jax.Array:
    """Boolean strong mask (w, n) over A's slots.  Semantics of
    hypre_BoomerAMGCreateS (ref: src/parcsr_ls/par_strength.c:531).

    Jitted with static knobs: on the axon tunnel every eager op is a
    dispatch round-trip, so each setup stage must be ONE program."""
    n = A.n_rows
    row = jnp.arange(n, dtype=A.cols.dtype)[None, :]
    valid = A.mask
    is_diag = valid & (A.cols == row)
    offd = valid & ~is_diag
    v = A.vals
    diag = jnp.sum(jnp.where(is_diag, v, 0), axis=0)
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    scale_max = jnp.max(jnp.where(offd, v, -big), axis=0)
    scale_min = jnp.min(jnp.where(offd, v, big), axis=0)
    d_neg = diag < 0
    row_scale = jnp.where(d_neg, scale_max, scale_min)
    row_sum = jnp.sum(jnp.where(valid, v, 0), axis=0)
    if max_row_sum < 1.0:
        weak_all = jnp.abs(row_sum) > jnp.abs(diag) * max_row_sum
    else:
        weak_all = jnp.zeros((n,), bool)
    if abs_soc:
        abs_scale = jnp.max(jnp.where(offd, jnp.abs(v), 0), axis=0)
        strong = jnp.abs(v) >= theta * abs_scale[None, :]
    else:
        thresh = (theta * row_scale)[None, :]
        strong = jnp.where(d_neg[None, :], v > thresh, v < thresh)
    return strong & offd & ~weak_all[None, :]


# ---------------------------------------------------------------------------
# PMIS coarsening (coarsen.py twin; 32-bit measure hash)
# ---------------------------------------------------------------------------

def _fmix32(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def pmis_hash32(ids, seed: int):
    """Deterministic [0, 1) hash of the global row id (murmur3 fmix32
    finalizer).  The 32-bit twin of setup/utils.pmis_hash — exactly
    representable in f32 (top 24 bits), so the device PMIS is
    bit-reproducible across CPU/TPU and any sharding."""
    h = _fmix32(ids.astype(jnp.uint32) + jnp.uint32(seed & 0xFFFFFFFF))
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


def pmis_hash32_np(ids: np.ndarray, seed: int) -> np.ndarray:
    h = ids.astype(np.uint32) + np.uint32(seed & 0xFFFFFFFF)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return (h >> np.uint32(8)).astype(np.float32) / np.float32(1 << 24)


def _rev_disp(disp: tuple) -> tuple | None:
    """Reverse-arm index per arm (disp_k' == -disp_k), or None when the
    stencil pattern is not symmetric."""
    try:
        return tuple(disp.index(-d) for d in disp)
    except ValueError:
        return None


def _rev_strong(A: DEll, strong, rev):
    """rev_strong[k, j] = strong flag of the edge (j + disp_k) -> j
    (pattern-symmetric stencil): a shifted read of arm rev[k]."""
    return jnp.stack(
        [_shift_read(strong[rev[k]], d) for k, d in enumerate(A.disp)],
        axis=0) & A.mask


@partial(jax.jit, static_argnames=("seed",))
def _pmis_init(A: DEll, strong, seed, global_ids):
    n = A.cols.shape[1]
    rev = _rev_disp(A.disp) if A.disp is not None else None
    if rev is not None:
        # |S^T column| via shifted reads — no scatter
        st_deg = jnp.sum(_rev_strong(A, strong, rev)
                         .astype(jnp.float32), axis=0)
    else:
        scols = jnp.where(strong, A.cols, n)    # n = dropped in scatter
        ones = strong.astype(jnp.float32)
        st_deg = jnp.zeros((n,), jnp.float32).at[scols.reshape(-1)].add(
            ones.reshape(-1), mode="drop")
    measure = st_deg + pmis_hash32(global_ids, seed)
    isolated = ~jnp.any(strong, axis=0)
    cf0 = jnp.where(isolated, jnp.int32(SF_PT), jnp.int32(0))
    measure = jnp.where(isolated, 0.0, measure)
    return cf0, measure


def _gather_vec_plan(A: DEll, x, fill, plan):
    """dell_gather_vec via the btake plan when available (bool sources
    gathered as int32)."""
    if plan is None:
        return dell_gather_vec(A, x, fill)
    from hypre_tpu.ops import btake as bt

    is_bool = x.dtype == jnp.bool_
    g = bt.btake(plan, x.astype(jnp.int32) if is_bool else x)
    if is_bool:
        g = g > 0
    return jnp.where(A.mask, g, jnp.asarray(fill, g.dtype))


@jax.jit
def _pmis_round(A: DEll, strong, gid, cf, m, plan=None):
    """One PMIS selection round.  Split out of the old lax.while_loop:
    one round per XLA program keeps each execution far below the TPU
    worker's 60 s single-program watchdog at 256^3+ (the whole-loop
    program was ~70 s there and killed the worker).

    Symmetric stencil operators (A.disp with -d per d) run gather- and
    scatter-free: neighbor reads are shifted slices, and the scatter
    side of the independent-set test becomes a shifted read of the
    reverse arm (XLA gathers/scatters measure 0.1 Gelem/s on v5e vs
    560 GB/s for slices).  Coarse (non-stencil) operators gather
    through the ops/btake.py plan."""
    n = A.cols.shape[1]
    un = cf == 0
    cand = un & (m > 1.0)
    cand_nb = _gather_vec_plan(A, cand, False, plan)
    m_nb = _gather_vec_plan(A, m, 0, plan)
    gid_nb = _gather_vec_plan(A, gid, -1, plan)
    beats_me = (m_nb > m[None, :]) | ((m_nb == m[None, :])
                                      & (gid_nb > gid[None, :]))
    hit = cand_nb & beats_me
    out_row = jnp.any(strong & hit & cand[None, :], axis=0)
    rev = _rev_disp(A.disp) if A.disp is not None else None
    if rev is not None:
        out_sc = jnp.any(_rev_strong(A, strong, rev) & hit, axis=0)
    else:
        # scatter side: i beats j along edge (i, j).  Scatter-ADD into
        # the small (n,) accumulator — adds measure 34 Melem/s on v5e
        # while set/max variants crawl
        scols = jnp.where(strong, A.cols, n)
        i_beats = (cand[None, :] & (cand_nb & strong)
                   & ((m[None, :] > m_nb) | ((m[None, :] == m_nb)
                                             & (gid[None, :] > gid_nb))))
        out_sc = jnp.zeros((n,), jnp.int32).at[scols.reshape(-1)].add(
            i_beats.astype(jnp.int32).reshape(-1), mode="drop") > 0
    new_c = cand & ~(out_row | out_sc)
    cf = jnp.where(new_c, jnp.int32(C_PT), cf)

    low = un & (m < 1.0)
    cf = jnp.where(low & (cf == 0), jnp.int32(F_PT), cf)

    is_c = cf == C_PT
    has_c_dep = jnp.any(
        strong & _gather_vec_plan(A, is_c, False, plan), axis=0)
    make_f = un & ~new_c & ~low & has_c_dep
    cf = jnp.where(make_f & (cf == 0), jnp.int32(F_PT), cf)

    m = jnp.where(un & (cf != 0), 0.0, m)
    return cf, m, jnp.any(cf == 0)


def device_pmis(A, strong: jax.Array, seed: int = 2747,
                global_ids: jax.Array | None = None,
                plan=None) -> jax.Array:
    """CF marker (C_PT/F_PT/SF_PT) via PMIS over slot-major (w, n)
    cols/strong.  Mirrors setup/coarsen.pmis (ref: src/parcsr_ls/
    par_coarsen.c:2101) with the 32-bit hash; ties additionally broken
    by global id so the selection loop always terminates.

    A: a DEll (stencil operators take the shift fast path) or a bare
    (w, n) cols array.  The selection loop runs on the HOST with one
    jitted program per round (a bool sync per round): the fused
    while_loop variant was one ~70 s program at 256^3 and tripped the
    60 s worker watchdog."""
    if not isinstance(A, DEll):
        A = DEll(cols=A, vals=A, n_cols=int(A.shape[1]))
    n = A.cols.shape[1]
    if global_ids is None:
        global_ids = jnp.arange(n, dtype=jnp.int32)
    from hypre_tpu.core.heartbeat import beat

    cf, m = _pmis_init(A, strong, seed, global_ids)
    unfinished = bool(jnp.any(cf == 0))
    rounds = 0
    while unfinished:
        cf, m, more = _pmis_round(A, strong, global_ids, cf, m, plan)
        unfinished = bool(more)
        rounds += 1
        beat(f"pmis round {rounds} (n={n})")
    return cf


# ---------------------------------------------------------------------------
# interpolation (interp.py / interp_ext.py twins)
# ---------------------------------------------------------------------------

def _row_diag(A: DEll):
    row = jnp.arange(A.n_rows, dtype=A.cols.dtype)[None, :]
    is_diag = A.mask & (A.cols == row)
    return jnp.sum(jnp.where(is_diag, A.vals, 0), axis=0), is_diag


@partial(jax.jit,
         static_argnames=("n_coarse", "trunc_factor", "max_elmts"))
def device_direct_interp(A: DEll, strong: jax.Array, cf: jax.Array,
                         n_coarse: int = -1,
                         trunc_factor: float = 0.0,
                         max_elmts: int = 4, plan=None) -> DEll:
    """Direct interpolation (type 3), semantics of
    hypre_BoomerAMGBuildDirInterp (ref: src/parcsr_ls/par_interp.c:
    1948-2500) — see setup/interp.direct_interp for the host twin.
    n_coarse must be supplied (static) by the caller, which already
    synced it to decide whether to keep coarsening."""
    w, n = A.cols.shape
    is_c = cf == C_PT
    cmap = jnp.cumsum(is_c.astype(jnp.int32)) - 1

    diag, is_diag = _row_diag(A)
    valid = A.mask
    offd = valid & ~is_diag
    col_is_c = _gather_vec_plan(A, is_c, False, plan)
    strong_c = strong & col_is_c
    pos = A.vals > 0
    neg = A.vals < 0

    sum_n_neg = jnp.sum(jnp.where(offd & neg, A.vals, 0), axis=0)
    sum_n_pos = jnp.sum(jnp.where(offd & pos, A.vals, 0), axis=0)
    sum_p_neg = jnp.sum(jnp.where(strong_c & neg, A.vals, 0), axis=0)
    sum_p_pos = jnp.sum(jnp.where(strong_c & pos, A.vals, 0), axis=0)
    alfa = jnp.where(sum_p_neg != 0, sum_n_neg / jnp.where(
        sum_p_neg != 0, sum_p_neg * diag, 1.0), 1.0)
    beta = jnp.where(sum_p_pos != 0, sum_n_pos / jnp.where(
        sum_p_pos != 0, sum_p_pos * diag, 1.0), 1.0)

    f_row = ~is_c & (cf != 0)
    sel = strong_c & f_row[None, :]
    pv = jnp.where(A.vals < 0, -alfa[None, :] * A.vals,
                   -beta[None, :] * A.vals)
    pc = jnp.where(sel, _gather_vec_plan(A, cmap, -1, plan), -1)
    pv = jnp.where(sel, pv, 0)

    # C rows interpolate identity (slot 0)
    slot0 = (jnp.arange(w, dtype=jnp.int32) == 0)[:, None]
    pc = jnp.where(is_c[None, :],
                   jnp.where(slot0, cmap[None, :], -1), pc)
    pv = jnp.where(is_c[None, :],
                   jnp.where(slot0, jnp.asarray(1.0, A.vals.dtype), 0),
                   pv)
    P = DEll(cols=pc, vals=pv, n_cols=int(n_coarse))
    if trunc_factor > 0.0 or (0 < max_elmts < w):
        P = device_truncate(P, trunc_factor, max_elmts)
    return P


def device_extpi_interp(A: DEll, strong: jax.Array, cf: jax.Array,
                        n_coarse: int = -1,
                        trunc_factor: float = 0.0, max_elmts: int = 4,
                        chunk: int = 32768, plan=None) -> DEll:
    """Extended+i interpolation (type 6), semantics of
    hypre_BoomerAMGBuildExtPIInterp (ref: src/parcsr_ls/par_lr_interp.c:
    1024-1800; device variant par_lr_interp_device.c:1001) — see
    setup/interp_ext.extpi_interp for the host twin.

    Per row-chunk (rows on the lane dim): the distance-2 pattern Ĉ_i is
    a sorted (with duplicates) candidate list of height w(1+w);
    membership tests are per-lane binary searches against it; the
    distribution term expands each strong-F edge over its neighbor row
    (w² candidates), and the chunk compacts + truncates before writing
    out, so peak memory is O(chunk · w²), never O(n · w²).

    The chunk loop runs on the HOST (one jitted program per chunk,
    pipelined — no syncs between chunks): a fused lax.map over all
    chunks is one program whose runtime scales with n and trips the
    60 s worker watchdog at large sizes.

    Gather paths: stencil A reads shifted slices; coarse operators go
    through the ops/btake.py Pallas banded gather (`plan`, built once
    per level and shared with PMIS/RAP); XLA gather as last resort."""
    from hypre_tpu.core.heartbeat import beat

    w, n = A.cols.shape
    if plan is None and A.disp is None:
        plan = spgemm_plan(A, n)
    if plan is not None and A.disp is None:
        from hypre_tpu.ops import btake as bt

        m_pl = _plan_lanes_m(A.width)
        wins = _plan_windows(plan, m_pl)
        n_lanes = plan.n_steps * plan.ch_step * CHUNK_LANES
        (cmap, colsP, valsP, strgP, cfP, diagP, is_cP,
         gsrc_i, gsrc_f) = _extpi_prepare_btake(
            A, strong, cf, plan, n=n, n_lanes=n_lanes)
        X2i = bt.pad_sources(plan, gsrc_i)
        X2f = bt.pad_sources(plan, gsrc_f)
        n_tr = jnp.int32(n)
        pcs = []
        pvs = []
        for i, (s0, ns, l0, mw) in enumerate(wins):
            beat(f"extpi btake chunk {i}/{len(wins)} (n={n})")
            pl_i = _plan_window_eager(plan, jnp.int32(s0), ns=ns)
            l0j = jnp.int32(l0)
            pc_i, pv_i = _extpi_chunk_btake(
                pl_i,
                _lane_window_jit(colsP, l0j, m=mw),
                _lane_window_jit(valsP, l0j, m=mw),
                _lane_window_jit(strgP, l0j, m=mw),
                _lane_window_jit(cfP, l0j, m=mw),
                _lane_window_jit(diagP, l0j, m=mw),
                _lane_window_jit(is_cP, l0j, m=mw),
                l0j, n_tr, X2i, X2f,
                trunc_factor=trunc_factor, max_elmts=max_elmts)
            pcs.append(pc_i)
            pvs.append(pv_i)
        return _extpi_finish(pcs, pvs, cmap, n=n, n_coarse=n_coarse)

    pad = max((max(abs(d) for d in A.disp) + 127) // 128 * 128, 128) \
        if A.disp is not None else 0
    prep = _extpi_prepare(A, strong, cf, chunk=chunk, n=n, pad=pad)
    (is_c, is_f, cmap, diag, strong_c_all, sign_diag,
     colsP, valsP, strgP, cfP, diagP,
     A_cols_g, A_vals_g, cf_g, is_c_g, is_f_g, sca_g, sd_g) = prep
    n_pad = -(-n // chunk) * chunk
    n_ch = n_pad // chunk
    gidP = np.arange(n_pad, dtype=np.int32).reshape(n_ch, chunk)

    pcs = []
    pvs = []
    for i in range(n_ch):
        beat(f"extpi chunk {i}/{n_ch} (n={n})")
        pc_i, pv_i = _extpi_chunk(
            colsP[i], valsP[i], strgP[i], cfP[i], diagP[i],
            jnp.asarray(gidP[i]), jnp.int32(i * chunk),
            A_cols_g, A_vals_g, cf_g, is_c_g, is_f_g,
            sca_g, sd_g, n=n, disp=A.disp, pad=pad,
            trunc_factor=trunc_factor, max_elmts=max_elmts)
        pcs.append(pc_i)
        pvs.append(pv_i)
    return _extpi_finish(pcs, pvs, cmap, n=n, n_coarse=n_coarse)


@partial(jax.jit, static_argnames=("chunk", "n", "pad"))
def _extpi_prepare(A: DEll, strong, cf, chunk: int, n: int, pad: int):
    is_c = cf == C_PT
    is_f = cf == F_PT
    cmap = jnp.cumsum(is_c.astype(jnp.int32)) - 1
    diag, _ = _row_diag(A)
    strong_c_all = strong & dell_gather_vec(A, is_c, fill=False)
    sign_diag = jnp.sign(diag)
    n_pad = -(-n // chunk) * chunk
    n_ch = n_pad // chunk

    def pad_t(a, pv):
        """(w, n) -> (n_ch, w, chunk) stacked chunks; (n,) -> (n_ch, chunk)."""
        if a.ndim == 2:
            a = jnp.pad(a, [(0, 0), (0, n_pad - n)], constant_values=pv)
            return a.reshape(a.shape[0], n_ch, chunk).transpose(1, 0, 2)
        a = jnp.pad(a, [(0, n_pad - n)], constant_values=pv)
        return a.reshape(n_ch, chunk)

    def pad_g(a, pv):
        """Globals for the in-chunk neighbor reads.  Stencil path
        (pad > 0): pad by `pad` on the left and `pad + chunk-slack` on
        the right so every dynamic_slice(c0 + pad + d) is in bounds."""
        if pad == 0:
            return a
        widths = [(0, 0)] * (a.ndim - 1) + [(pad, pad + n_pad - n)]
        return jnp.pad(a, widths, constant_values=pv)

    return (is_c, is_f, cmap, diag, strong_c_all, sign_diag,
            pad_t(A.cols, -1), pad_t(A.vals, 0), pad_t(strong, False),
            pad_t(cf, SF_PT), pad_t(diag, 1.0),
            pad_g(A.cols, -1), pad_g(A.vals, 0), pad_g(cf, SF_PT),
            pad_g(is_c, False), pad_g(is_f, False),
            pad_g(strong_c_all, False), pad_g(sign_diag, 0))


@partial(jax.jit, static_argnames=("n", "disp", "pad",
                                   "trunc_factor", "max_elmts"))
def _extpi_chunk(cols, vals, strg, cfch, diagch, gid, c0,
                 A_cols, A_vals, cf, is_c, is_f, strong_c_all,
                 sign_diag, *, n, disp, pad, trunc_factor, max_elmts):
    m = cols.shape[1]
    valid = cols >= 0
    gcols = jnp.where(valid, cols, 0)

    if disp is not None:
        # stencil fast path: x[cols[s, c0:c0+m]] = slice at
        # c0 + pad + disp[s] of the pre-padded global — no gather
        def gvec(x, fill):
            g = jnp.stack(
                [jax.lax.dynamic_slice(x, (c0 + pad + d,), (m,))
                 for d in disp], axis=0)
            return jnp.where(valid, g, jnp.asarray(fill, g.dtype))

        def grows(X, fill):                       # (wX, w, m)
            g = jnp.stack(
                [jax.lax.dynamic_slice(
                    X, (jnp.int32(0), c0 + pad + d),
                    (X.shape[0], m))
                 for d in disp], axis=1)
            return jnp.where(valid[None, :, :], g,
                             jnp.asarray(fill, g.dtype))

        row_is_c = jax.lax.dynamic_slice(
            is_c, (c0 + pad,), (m,)) & (gid < n)
    else:
        def gvec(x, fill):
            g = jnp.take(x, gcols, axis=0)
            return jnp.where(valid, g, jnp.asarray(fill, g.dtype))

        def grows(X, fill):
            g = jnp.take(X, gcols, axis=1)
            return jnp.where(valid[None, :, :], g,
                             jnp.asarray(fill, g.dtype))

        row_is_c = jnp.take(is_c, jnp.minimum(gid, n - 1)) \
            & (gid < n)

    col_is_c = gvec(is_c, False)
    col_is_f = gvec(is_f, False)
    col_is_sf = (gvec(cf, SF_PT) == SF_PT) & valid
    k_diag_sign = gvec(sign_diag, 0)
    nb_cols = grows(A_cols, -1)                       # (w, w, m)
    nb_sc = grows(strong_c_all, False) & (nb_cols >= 0)
    t_a = grows(A_vals, 0)
    return _extpi_body(
        cols, vals, strg, cfch, diagch, gid, col_is_c, col_is_f,
        col_is_sf, k_diag_sign, nb_cols, nb_sc, t_a, row_is_c,
        trunc_factor=trunc_factor, max_elmts=max_elmts)


@partial(jax.jit, static_argnames=("trunc_factor", "max_elmts"))
def _extpi_chunk_btake(pl_i, cols, vals, strg, cfch, diagch, ricch,
                       lane0, n_tr, X2i, X2f, *, trunc_factor,
                       max_elmts):
    """btake-gather variant for coarse (non-stencil) operators: every
    neighbor read runs through the ops/btake.py Pallas banded gather —
    two kernel launches per chunk (X2i int32 stack: A_cols + cf +
    C/F/strong flags; X2f real stack: A_vals + sign_diag; both
    pre-padded 2-D sources).  All operands are bucket-shaped windows
    and n/lane0 are traced, so same-width levels share this program."""
    from hypre_tpu.ops import btake as bt

    w, m = cols.shape
    valid = cols >= 0
    gid = lane0 + jnp.arange(m, dtype=jnp.int32)
    row_is_c = ricch & (gid < n_tr)

    gi = bt.btake_rows_padded(pl_i, X2i)          # (2w+3, w, m)
    nb_cols = jnp.where(valid[None], gi[:w], -1)
    col_is_c = valid & (gi[w + 1] > 0)
    col_is_f = valid & (gi[w + 2] > 0)
    col_is_sf = valid & (gi[w] == SF_PT)
    nb_sc = (gi[w + 3:] > 0) & (nb_cols >= 0)

    gf = bt.btake_rows_padded(pl_i, X2f)          # (w+1, w, m)
    t_a = jnp.where(valid[None], gf[:w], 0)
    k_diag_sign = jnp.where(valid, gf[w], 0)

    return _extpi_body(
        cols, vals, strg, cfch, diagch, gid, col_is_c, col_is_f,
        col_is_sf, k_diag_sign, nb_cols, nb_sc, t_a, row_is_c,
        trunc_factor=trunc_factor, max_elmts=max_elmts)


@partial(jax.jit, static_argnames=("n", "n_lanes"))
def _extpi_prepare_btake(A: DEll, strong, cf, plan, *, n, n_lanes):
    """Lane-padded operands + stacked gather sources for the btake
    interp path (one program)."""
    is_c = cf == C_PT
    is_f = cf == F_PT
    cmap = jnp.cumsum(is_c.astype(jnp.int32)) - 1
    diag, _ = _row_diag(A)
    strong_c_all = strong & _gather_vec_plan(A, is_c, False, plan)
    sign_diag = jnp.sign(diag)

    def padl(a, pv):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, n_lanes - n)]
        return jnp.pad(a, widths, constant_values=pv)

    gsrc_i = jnp.concatenate([
        A.cols, cf[None], is_c.astype(jnp.int32)[None],
        is_f.astype(jnp.int32)[None],
        strong_c_all.astype(jnp.int32)], axis=0)
    gsrc_f = jnp.concatenate([A.vals, sign_diag[None]], axis=0)
    return (cmap, padl(A.cols, -1), padl(A.vals, 0),
            padl(strong, False), padl(cf, SF_PT), padl(diag, 1.0),
            padl(is_c, False), gsrc_i, gsrc_f)


def _extpi_body(cols, vals, strg, cfch, diagch, gid, col_is_c,
                col_is_f, col_is_sf, k_diag_sign, nb_cols, nb_sc, t_a,
                row_is_c, *, trunc_factor, max_elmts):
    """Shared ext+i math over pre-gathered neighbor data (the
    hypre_BoomerAMGBuildExtPIInterp row formulas, ref:
    src/parcsr_ls/par_lr_interp.c:1024-1800)."""
    w, m = cols.shape
    wc = w * (1 + w)
    real = vals.dtype
    valid = cols >= 0
    gcols = jnp.where(valid, cols, 0)

    if True:
        sc = strg & col_is_c
        sf = strg & col_is_f
        f_row = cfch == F_PT
        is_diag_slot = valid & (cols == gid[None, :])
        offd = valid & ~is_diag_slot

        # ---- Ĉ: sorted candidate list (duplicates fine) ------------
        cand1 = jnp.where(sc, cols, _BIG)                 # (w, m)
        nb_valid = nb_cols >= 0
        cand2 = jnp.where(sf[None, :, :] & nb_sc, nb_cols, _BIG)
        chat = jnp.sort(jnp.concatenate(
            [cand1, cand2.reshape(w * w, m)], axis=0), axis=0)

        def member(queries):                              # (q, m)
            """Membership of each query in the sorted Ĉ list via a
            merge sort + route-back sort (searchsorted's binary search
            is log(wc) rounds of scalar-speed gathers; comparator
            sorts are far faster).  Equal keys are CONTIGUOUS after
            the merge with sources first (num_keys=2 on (key, tag)),
            so a query is a member iff its key-run starts with a
            source — run starts found by a plain cummax of indices +
            take_along_axis.  (A tuple-op associative_scan here, or a
            scan feeding a sort key, hangs the XLA TPU compile for
            heights >~128 — see _slot_compact.)"""
            q = queries.shape[0]
            kq = wc + q
            keys = jnp.concatenate([chat, queries], axis=0)
            tag = jnp.concatenate(
                [jnp.zeros((wc, m), jnp.int32),
                 jnp.ones((q, m), jnp.int32)], axis=0)
            pos = jnp.concatenate(
                [jnp.full((wc, m), _BIG, jnp.int32),
                 jnp.broadcast_to(
                     jnp.arange(q, dtype=jnp.int32)[:, None], (q, m))],
                axis=0)
            k2, t2, p2 = jax.lax.sort((keys, tag, pos),
                                      dimension=0, num_keys=2)
            newrun = jnp.concatenate(
                [jnp.ones((1, m), bool), k2[1:] != k2[:-1]], axis=0)
            iota = jnp.broadcast_to(
                jnp.arange(kq, dtype=jnp.int32)[:, None], (kq, m))
            start_idx = jnp.maximum(jax.lax.associative_scan(
                jnp.maximum, jnp.where(newrun, iota, -1), axis=0), 0)
            start_is_src = jnp.take_along_axis(
                (t2 == 0).astype(jnp.int32), start_idx, axis=0)
            hit = (t2 == 1) & (start_is_src > 0) & (k2 < _BIG)
            # route back to query order: sort by query slot id
            p3, h3 = jax.lax.sort(
                (jnp.where(t2 == 1, p2, _BIG),
                 hit.astype(jnp.int32)), dimension=0, num_keys=1)
            return h3[:q] > 0

        # ---- direct: A entries with col in Ĉ -----------------------
        q_direct = jnp.where(offd, cols, _BIG)
        direct_sel = offd & f_row[None, :] & member(q_direct)
        d = diagch

        # ---- weak: offd, not direct, not strong-F, not SF ----------
        weak_sel = (offd & f_row[None, :] & ~direct_sel & ~sf
                    & ~col_is_sf)
        d = d + jnp.sum(jnp.where(weak_sel, vals, 0), axis=0)

        # ---- distribution over strong-F neighbors ------------------
        # expand row k of A for each strong-F slot k: (w_l, w_k, m)
        t_l = nb_cols
        t_valid = nb_valid & sf[None, :, :]
        not_diag = t_l != gcols[None, :, :]
        sign_ok = (k_diag_sign[None, :, :] * t_a) < 0
        memb = member(jnp.where(t_valid, t_l, _BIG).reshape(
            w * w, m)).reshape(w, w, m)
        is_self = t_l == gid[None, None, :]
        in_den = t_valid & not_diag & sign_ok & (memb | is_self)

        denom = jnp.sum(jnp.where(in_den, t_a, 0), axis=0)   # (w, m)
        has_den = denom != 0
        a_ik = jnp.where(sf, vals, 0)
        dist = jnp.where(has_den, a_ik / jnp.where(has_den, denom, 1.0),
                         0.0)
        # s == 0: a_ik to the diagonal
        d = d + jnp.sum(jnp.where(sf & ~has_den, vals, 0), axis=0)
        # "+i" self term
        self_sel = in_den & is_self & has_den[None, :, :]
        d = d + jnp.sum(jnp.where(self_sel, dist[None, :, :] * t_a, 0),
                        axis=(0, 1))

        contrib_sel = in_den & memb & has_den[None, :, :]
        contrib_v = jnp.where(contrib_sel, dist[None, :, :] * t_a, 0)
        contrib_c = jnp.where(contrib_sel, t_l, -1)

        # ---- assemble, normalize, truncate -------------------------
        cand_c = jnp.concatenate(
            [jnp.where(direct_sel, cols, -1),
             contrib_c.reshape(w * w, m)], axis=0)
        cand_v = jnp.concatenate(
            [jnp.where(direct_sel, vals, 0),
             contrib_v.reshape(w * w, m)], axis=0)
        pc, pv = _slot_compact(cand_c, cand_v, wc)
        dsafe = jnp.where(d != 0, -d, 1.0)
        pv = pv / dsafe[None, :]

        # C identity rows; SF rows stay empty
        slot0 = (jnp.arange(wc, dtype=jnp.int32) == 0)[:, None]
        pc = jnp.where(row_is_c[None, :],
                       jnp.where(slot0, gid[None, :], -1), pc)
        pv = jnp.where(row_is_c[None, :],
                       jnp.where(slot0, jnp.asarray(1.0, real), 0), pv)
        # n_cols is provisional — _extpi_finish rebuilds the DEll with
        # the coarse column count after fine->coarse renumbering
        Pch = DEll(cols=pc, vals=pv, n_cols=int(m))
        if trunc_factor > 0.0 or (0 < max_elmts < wc):
            Pch = device_truncate(Pch, trunc_factor, max_elmts)
        return Pch.cols, Pch.vals


@partial(jax.jit, static_argnames=("n", "n_coarse"))
def _extpi_finish(pcs, pvs, cmap, *, n, n_coarse):
    # (n_ch x (w_out, chunk)) -> (w_out, n), then renumber fine->coarse
    pcols = jnp.concatenate(pcs, axis=1)[:, :n]
    pvals = jnp.concatenate(pvs, axis=1)[:, :n]
    pcols = jnp.where(pcols >= 0,
                      jnp.take(cmap, jnp.where(pcols >= 0, pcols, 0)),
                      -1)
    return DEll(cols=pcols, vals=pvals, n_cols=n_coarse)


def device_rap(A: DEll, P: DEll, chunk: int = 65536, plan_a=None,
               cf=None):
    """Galerkin triple product Ac = P^T (A P) on device.  plan_a: the
    level's ops/btake.py gather plan for A's row expansion (None for
    stencil operators — they use shifted slices).  cf enables the
    stencil-neighborhood transpose fast path."""
    from hypre_tpu.core.heartbeat import beat
    from hypre_tpu.ops.btake import btake_enabled

    if plan_a is None:
        plan_a = spgemm_plan(A, P.n_rows)
    beat(f"rap: AP width (n={A.n_rows})")
    w_ap = device_spgemm_width(A, P, chunk, plan=plan_a)
    beat(f"rap: AP spgemm (w={w_ap})")
    AP = device_spgemm(A, P, w_ap, chunk, plan=plan_a)
    beat("rap: P transpose")
    PT = None
    if btake_enabled():
        if A.disp is not None and cf is not None:
            PT = device_transpose_stencil(P, A.disp, cf)
        if PT is None:
            PT = device_transpose_sorted(P)
    if PT is None:
        beat("rap: P transpose width")
        w_pt = device_transpose_width(P)
        beat(f"rap: P transpose scatter (w={w_pt})")
        PT = device_transpose(P, w_pt)
    PT = dell_pad_width(PT)
    beat("rap: PT*AP plan")
    plan_pt = spgemm_plan(PT, AP.n_rows)
    beat("rap: PT*AP width")
    w_ac = device_spgemm_width(PT, AP, max(chunk // 4, 8192),
                               plan=plan_pt)
    beat(f"rap: PT*AP spgemm (w={w_ac})")
    Ac = device_spgemm(PT, AP, w_ac, max(chunk // 4, 8192),
                       plan=plan_pt)
    return Ac, PT


# ---------------------------------------------------------------------------
# level loop (amg.py iter_host_hierarchy twin, fully on device)
# ---------------------------------------------------------------------------

def iter_device_hierarchy(A: DEll, cfg):
    """Device-resident AMG setup level loop (ref: src/parcsr_ls/
    par_amg_setup.c:29 — the level driver; every kernel above runs on
    the accelerator).  Yields (A_l, P_l, R_l = P^T, cf_l) per level,
    then the coarsest A.  Host involvement is limited to per-level
    scalar metadata (coarse size, output widths) — a few syncs per
    level, no matrix ever copied to the host.

    Every stage retries transient relay errors (core/relay.py): the
    round-3 judged device path died on one dropped remote_compile
    response inside the ext+i chunk loop.  Stage inputs are live
    device arrays, so a stage re-run after an HTTP hiccup is pure; a
    real worker crash re-raises immediately (buffers are gone)."""
    from hypre_tpu.core.heartbeat import beat
    from hypre_tpu.core.relay import with_retries

    Al = A
    for _level in range(cfg.max_levels - 1):
        n = Al.n_rows
        if n <= cfg.max_coarse_size:
            break
        beat(f"dev level {_level} plan")
        plan = with_retries(spgemm_plan, Al, n, label="btake plan") \
            if Al.disp is None else None
        beat(f"dev level {_level} strength (n={n})")
        strong = with_retries(device_strength, Al, cfg.strong_threshold,
                              cfg.max_row_sum, label="strength")
        beat(f"dev level {_level} pmis")
        cf = with_retries(device_pmis, Al, strong, seed=cfg.seed,
                          plan=plan, label="pmis")
        beat(f"dev level {_level} pmis sync")
        n_coarse = int(with_retries(
            lambda: jnp.sum(cf == C_PT), label="pmis sync"))
        beat(f"dev level {_level} n_coarse={n_coarse}")
        if n_coarse == 0 or n_coarse == n:
            break
        chunk = _interp_chunk(Al.width)
        beat(f"dev level {_level} interp (chunk={chunk})")
        if cfg.interp_type == 3:
            P = with_retries(
                device_direct_interp, Al, strong, cf,
                n_coarse=n_coarse, trunc_factor=cfg.trunc_factor,
                max_elmts=cfg.p_max_elmts, plan=plan,
                label="direct interp")
        else:
            P = with_retries(
                device_extpi_interp, Al, strong, cf,
                n_coarse=n_coarse, trunc_factor=cfg.trunc_factor,
                max_elmts=cfg.p_max_elmts, chunk=chunk, plan=plan,
                label="extpi interp")
        P = dell_pad_width(P)
        beat(f"dev level {_level} rap")
        Ac, PT = with_retries(
            device_rap, Al, P, chunk=_rap_chunk(Al.width, P.width),
            plan_a=plan, cf=cf, label="rap")
        beat(f"dev level {_level} rap done")
        yield (Al, P, dell_pad_width(PT), cf)
        Al = dell_pad_width(Ac)
    yield Al


def _interp_chunk(w: int, budget: int = 1 << 27) -> int:
    """Row-chunk size bounding the (w^2, chunk) candidate buffers to
    ~budget bytes (x ~6 live arrays)."""
    per_row = max(w * w, 1) * 8
    c = budget // per_row
    return int(max(4096, min(1 << 18, 1 << (c.bit_length() - 1))))


def _rap_chunk(wa: int, wp: int, budget: int = 1 << 27) -> int:
    per_row = max(wa * wp, 1) * 8
    c = budget // per_row
    return int(max(4096, min(1 << 18, 1 << (c.bit_length() - 1))))


# ---------------------------------------------------------------------------
# transpose / SpGEMM / truncation — the device matrix algebra
# ---------------------------------------------------------------------------

_BIG = np.int32(2**30)  # numpy scalar: no backend init at import



def _slot_compact(cand_cols, cand_vals, out_width):
    """Per-row dedup over the slot axis: sort candidate (col, val)
    slots by col, sum runs of equal cols, compact to `out_width` slots
    (ascending cols).

    cand_cols int32 (k, m) with -1 padding; cand_vals (k, m).
    Returns (cols (out_width, m), vals (out_width, m)).

    No scatters; the only gather is the per-lane run-start lookup.
    IMPORTANT compile constraint (measured on v5e): an
    associative_scan with a tuple/custom operator after a sort — or a
    plain-max scan feeding a sort KEY — makes the XLA TPU compile hang
    for k >~ 128 (it never returns; this wedged the round-4 device
    RAP).  So the run-start carry is spelled as a plain cummax of
    run-start INDICES followed by take_along_axis, which compiles."""
    k, m = cand_cols.shape
    key = jnp.where(cand_cols >= 0, cand_cols, _BIG)
    # stable: equal-col candidates keep source order, so the run
    # cumsum adds in a DETERMINISTIC order — the distributed setup
    # (parallel/par_setup.py) generates candidates in the same source
    # order and thus reproduces this path's operators BITWISE
    sc, sv = jax.lax.sort((key, cand_vals), dimension=0, num_keys=1,
                          is_stable=True)
    valid = sc < _BIG
    new = valid & jnp.concatenate(
        [jnp.ones((1, m), bool), sc[1:] != sc[:-1]], axis=0)
    last = valid & jnp.concatenate(
        [sc[:-1] != sc[1:], jnp.ones((1, m), bool)], axis=0)
    slot = jnp.cumsum(new.astype(jnp.int32), axis=0) - 1
    # run total = cumsum at run end minus cumsum just before run start
    cum = jnp.cumsum(sv, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, m), sv.dtype), cum[:-1]],
                           axis=0)
    iota = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[:, None], (k, m))
    start_idx = jnp.maximum(jax.lax.associative_scan(
        jnp.maximum, jnp.where(new, iota, -1), axis=0), 0)
    start_cum = jnp.take_along_axis(prev, start_idx, axis=0)
    total = cum - start_cum
    # route each run's (col, total) — live at the run END — to its
    # output slot with a second sort (slot ids ascend, so the first
    # out_width rows after the sort are the compacted result)
    route = jnp.where(last & (slot < out_width), slot, _BIG)
    _, oc, ov = jax.lax.sort(
        (route, jnp.where(route < _BIG, sc, -1),
         jnp.where(route < _BIG, total, 0)),
        dimension=0, num_keys=1)
    if k < out_width:
        oc = jnp.concatenate(
            [oc, jnp.full((out_width - k, m), -1, oc.dtype)], axis=0)
        ov = jnp.concatenate(
            [ov, jnp.zeros((out_width - k, m), ov.dtype)], axis=0)
    return oc[:out_width], ov[:out_width]


def _rank_desc(mag, valid):
    """rank[s, i] = position of slot s among row i's slots ordered by
    DESCENDING mag (invalid slots ordered last, ties by slot id).
    Sort + route-back sort only — the old argsort+scatter ranking ran
    at XLA's 0.1 Gelem/s scatter speed and dominated chunked
    truncation at 256^3."""
    w, m = mag.shape
    slots = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.int32)[:, None], (w, m))
    big = jnp.asarray(jnp.finfo(mag.dtype).max, mag.dtype)
    key = jnp.where(valid, -mag, big)
    _, sslot = jax.lax.sort((key, slots), dimension=0, num_keys=1,
                            is_stable=True)
    # sslot[p] = original slot at sorted position p; route p back
    _, rank = jax.lax.sort((sslot, slots), dimension=0, num_keys=1)
    return rank


def _slot_distinct_count(cand_cols):
    """Number of distinct valid cols per row (for output-width sizing).
    cand_cols (k, m) -> (m,)."""
    k, m = cand_cols.shape
    key = jnp.where(cand_cols >= 0, cand_cols, _BIG)
    sc = jnp.sort(key, axis=0)
    valid = sc < _BIG
    new = valid & jnp.concatenate(
        [jnp.ones((1, m), bool), sc[1:] != sc[:-1]], axis=0)
    return jnp.sum(new.astype(jnp.int32), axis=0)


def _stack_chunks(a, n, chunk, pad_value):
    """(w, n) -> (n_ch, w, chunk) for lax.map over lane chunks."""
    n_pad = -(-n // chunk) * chunk
    a = jnp.pad(a, [(0, 0), (0, n_pad - n)], constant_values=pad_value)
    return a.reshape(a.shape[0], n_pad // chunk, chunk).transpose(1, 0, 2)


@partial(jax.jit, static_argnames=("n", "chunk", "pad_value"))
def _stack_chunks_jit(a, *, n, chunk, pad_value):
    return _stack_chunks(a, n, chunk, pad_value)


CHUNK_LANES = 128   # lanes per plan chunk (= gstell CHUNK)


def _plan_lanes_m(w: int) -> int:
    """Fixed window lane count per width bucket: bounds the (w*w, m)
    candidate buffers AND keys the chunk programs on (w_bucket, m)
    only, so levels with the same width bucket share every compiled
    program (a distinct program costs 30-180 s per process here)."""
    per_row = max(w * w, 1) * 8
    c = (1 << 27) // per_row
    m = 1 << max(c.bit_length() - 1, 1)
    return int(max(2048, min(1 << 18, m)))


def spgemm_plan(A: DEll, B_n_rows: int, lanes_multiple: int | None = None):
    """Banded-gather plan for A's row expansion (ops/btake.py), shared
    by the width and numeric SpGEMM passes — and, for a level
    operator, by PMIS and interpolation (same index set).  None on
    CPU / stencil operators / non-banded structure (callers fall back
    to the XLA-gather path)."""
    from hypre_tpu.ops import btake as bt

    if A.disp is not None or not bt.btake_enabled():
        return None
    if lanes_multiple is None:
        lanes_multiple = _plan_lanes_m(A.width)
    return bt.btake_plan(A.cols, B_n_rows,
                         lanes_multiple=lanes_multiple)


def _plan_windows(plan, chunk: int):
    """(step0, n_steps, lane0, m) windows covering the plan's lanes,
    each about `chunk` lanes.  Plans built with lanes_multiple=chunk
    yield UNIFORM windows (one compiled program for all chunks)."""
    lps = plan.ch_step * CHUNK_LANES
    steps_per = max(chunk // lps, 1)
    wins = []
    s0 = 0
    while s0 < plan.n_steps:
        ns = min(steps_per, plan.n_steps - s0)
        wins.append((s0, ns, s0 * lps, ns * lps))
        s0 += ns
    return wins


@partial(jax.jit, static_argnames=("ns",))
def _plan_window_eager(plan, s0, *, ns):
    return _plan_window_jit(plan, s0, ns)


def _plan_window_jit(plan, s0, ns):
    """Traced window view of a plan (dynamic start, static length)."""
    import dataclasses as _dc

    def sl(a):
        return None if a is None else jax.lax.dynamic_slice_in_dim(
            a, s0, ns, axis=0)
    return _dc.replace(plan, base=sl(plan.base), brel=sl(plan.brel),
                       w0b=sl(plan.w0b), locs=sl(plan.locs),
                       n=ns * plan.ch_step * CHUNK_LANES)


@partial(jax.jit, static_argnames=("m",))
def _lane_window_jit(a, l0, *, m):
    """Eager-callable lane-window slice (one tiny program per input
    shape; l0 traced)."""
    if a.ndim == 1:
        return jax.lax.dynamic_slice(a, (l0,), (m,))
    return jax.lax.dynamic_slice(a, (jnp.int32(0), l0),
                                 (a.shape[0], m))


@partial(jax.jit, static_argnames=("n_lanes",))
def _pad_lanes_jit(cols, vals, *, n_lanes):
    ex = n_lanes - cols.shape[1]
    return (jnp.pad(cols, [(0, 0), (0, ex)], constant_values=-1),
            jnp.pad(vals, [(0, 0), (0, ex)]))


@jax.jit
def _spgemm_width_chunk_btake(pl_i, ac, X2c):
    from hypre_tpu.ops import btake as bt

    bc = bt.btake_rows_padded(pl_i, X2c)          # (wb, wa, m)
    bc = jnp.where(ac[None] >= 0, bc, -1)
    wb, wa, m = bc.shape
    return jnp.max(_slot_distinct_count(bc.reshape(wb * wa, m)))


def device_spgemm_width(A: DEll, B: DEll, chunk: int = 65536,
                        plan=None) -> int:
    """Max distinct cols of any row of A @ B (host int; one sync).
    Host chunk loop (one program per chunk, single sync at the end):
    a fused lax.map is one long program and trips the 60 s watchdog.

    Three row-expansion paths: stencil A (shifted slices), banded A
    (the ops/btake.py Pallas lane-shuffle gather — the round-4 device
    RAP spent >13 min in XLA's ~0.1 Gelem/s scalar gathers here), and
    the XLA-gather fallback.  The btake chunk programs see only
    bucket-shaped operands (windowed plan + lane windows + pre-padded
    sources), so same-bucket levels share one compiled program."""
    from hypre_tpu.core.heartbeat import beat
    from hypre_tpu.ops import btake as bt

    n = A.n_rows
    if plan is None:
        plan = spgemm_plan(A, B.n_rows)
    if plan is not None:
        m = _plan_lanes_m(A.width)
        wins = _plan_windows(plan, m)
        n_lanes = plan.n_steps * plan.ch_step * CHUNK_LANES
        acp, _ = _pad_lanes_jit(A.cols, A.vals, n_lanes=n_lanes)
        X2c = bt.pad_sources(plan, B.cols)
        parts = []
        for i, (s0, ns, l0, mw) in enumerate(wins):
            beat(f"spgemm width btake chunk {i}/{len(wins)} (n={n})")
            pl_i = _plan_window_eager(plan, jnp.int32(s0), ns=ns)
            ac = _lane_window_jit(acp, jnp.int32(l0), m=mw)
            parts.append(_spgemm_width_chunk_btake(pl_i, ac, X2c))
        return int(jnp.max(jnp.stack(parts)))
    ac_all = _stack_chunks_jit(A.cols, n=n, chunk=chunk, pad_value=-1)
    n_ch = ac_all.shape[0]
    parts = []
    if A.disp is not None and n == B.n_rows:
        pad = max((max(abs(d) for d in A.disp) + 127) // 128 * 128, 128)
        n_pad = n_ch * chunk
        Bc_g, _ = _pad_b_jit(B.cols, B.cols, pad=pad, extra=n_pad - n)
        for i in range(n_ch):
            beat(f"spgemm width chunk {i}/{n_ch} (n={n})")
            parts.append(_spgemm_width_chunk_stencil(
                ac_all[i], jnp.int32(i * chunk), Bc_g,
                disp=A.disp, pad=pad))
    else:
        for i in range(n_ch):
            beat(f"spgemm width chunk {i}/{n_ch} (n={n})")
            parts.append(_spgemm_width_chunk(ac_all[i], B.cols))
    return int(jnp.max(jnp.stack(parts)))


@jax.jit
def _spgemm_width_chunk(ac, B_cols):
    wb = B_cols.shape[0]
    wa, chunk = ac.shape
    safe = jnp.where(ac >= 0, ac, 0)
    bc = jnp.take(B_cols, safe, axis=1)           # (wb, wa, chunk)
    bc = jnp.where(ac[None, :, :] >= 0, bc, -1)
    return jnp.max(_slot_distinct_count(bc.reshape(wb * wa, chunk)))


@partial(jax.jit, static_argnames=("disp", "pad"))
def _spgemm_width_chunk_stencil(ac, c0, B_cols, *, disp, pad):
    wb = B_cols.shape[0]
    wa, chunk = ac.shape
    bc = jnp.stack(
        [jax.lax.dynamic_slice(B_cols, (jnp.int32(0), c0 + pad + d),
                               (wb, chunk))
         for d in disp], axis=1)
    bc = jnp.where(ac[None, :, :] >= 0, bc, -1)
    return jnp.max(_slot_distinct_count(bc.reshape(wb * wa, chunk)))


@partial(jax.jit, static_argnames=("out_width",))
def _spgemm_chunk_btake(pl_i, ac, av, X2c, X2v, *, out_width):
    from hypre_tpu.ops import btake as bt

    bc = bt.btake_rows_padded(pl_i, X2c)          # (wb, wa, m)
    bv = bt.btake_rows_padded(pl_i, X2v)
    ok = ac[None] >= 0
    bc = jnp.where(ok, bc, -1)
    bv = jnp.where(ok, bv * av[None], 0)
    wb, wa, m = bc.shape
    return _slot_compact(bc.reshape(wb * wa, m),
                         bv.reshape(wb * wa, m), out_width)


def device_spgemm(A: DEll, B: DEll, out_width: int,
                  chunk: int = 65536, plan=None) -> DEll:
    """C = A @ B (ref: src/seq_mv/csr_spgemm_device.c:15 — the two-pass
    hash SpGEMM becomes gather + per-row sort + segment-sum, chunked to
    bound the (wa*wb, chunk) candidate buffer).  The chunk loop runs on
    the host (pipelined programs, no intermediate syncs) to stay under
    the worker's 60 s single-program watchdog.  Stencil A (disp set):
    the B-row expansion reads shifted slices of B — no gathers.
    Otherwise the expansion is the ops/btake.py Pallas banded gather
    (plan reusable across the width pass and other per-level
    consumers); XLA gather is the last resort."""
    from hypre_tpu.core.heartbeat import beat

    n = A.n_rows
    if plan is None:
        plan = spgemm_plan(A, B.n_rows)
    if plan is not None:
        from hypre_tpu.ops import btake as bt

        out_width = -(-out_width // 8) * 8        # bucket: program reuse
        m = _plan_lanes_m(A.width)
        wins = _plan_windows(plan, m)
        n_lanes = plan.n_steps * plan.ch_step * CHUNK_LANES
        acp, avp = _pad_lanes_jit(A.cols, A.vals, n_lanes=n_lanes)
        X2c = bt.pad_sources(plan, B.cols)
        X2v = bt.pad_sources(plan, B.vals)
        outs = []
        for i, (s0, ns, l0, mw) in enumerate(wins):
            beat(f"spgemm btake chunk {i}/{len(wins)} (n={n})")
            pl_i = _plan_window_eager(plan, jnp.int32(s0), ns=ns)
            ac = _lane_window_jit(acp, jnp.int32(l0), m=mw)
            av = _lane_window_jit(avp, jnp.int32(l0), m=mw)
            outs.append(_spgemm_chunk_btake(pl_i, ac, av, X2c, X2v,
                                            out_width=out_width))
        cols, vals = _spgemm_finish([o[0] for o in outs],
                                    [o[1] for o in outs], n=n)
        return DEll(cols=cols, vals=vals, n_cols=B.n_cols)
    ac_all = _stack_chunks_jit(A.cols, n=n, chunk=chunk, pad_value=-1)
    av_all = _stack_chunks_jit(A.vals, n=n, chunk=chunk, pad_value=0)
    n_ch = ac_all.shape[0]
    if A.disp is not None and n == B.n_rows:
        pad = max((max(abs(d) for d in A.disp) + 127) // 128 * 128, 128)
        n_pad = n_ch * chunk
        Bc_g, Bv_g = _pad_b_jit(B.cols, B.vals, pad=pad, extra=n_pad - n)
        outs = []
        for i in range(n_ch):
            beat(f"spgemm chunk {i}/{n_ch} (n={n})")
            outs.append(_spgemm_chunk_stencil(
                ac_all[i], av_all[i], jnp.int32(i * chunk), Bc_g, Bv_g,
                disp=A.disp, pad=pad, out_width=out_width))
    else:
        outs = []
        for i in range(n_ch):
            beat(f"spgemm chunk {i}/{n_ch} (n={n})")
            outs.append(_spgemm_chunk(ac_all[i], av_all[i], B.cols,
                                      B.vals, out_width=out_width))
    cols, vals = _spgemm_finish([o[0] for o in outs],
                                [o[1] for o in outs], n=n)
    return DEll(cols=cols, vals=vals, n_cols=B.n_cols)


@partial(jax.jit, static_argnames=("pad", "extra"))
def _pad_b_jit(B_cols, B_vals, *, pad, extra):
    widths = [(0, 0), (pad, pad + extra)]
    return (jnp.pad(B_cols, widths, constant_values=-1),
            jnp.pad(B_vals, widths, constant_values=0))


@partial(jax.jit, static_argnames=("out_width",))
def _spgemm_chunk(ac, av, B_cols, B_vals, *, out_width):
    wb = B_cols.shape[0]
    wa, chunk = ac.shape
    safe = jnp.where(ac >= 0, ac, 0)
    bc = jnp.take(B_cols, safe, axis=1)           # (wb, wa, chunk)
    bv = jnp.take(B_vals, safe, axis=1)
    bc = jnp.where(ac[None, :, :] >= 0, bc, -1)
    bv = bv * av[None, :, :]
    return _slot_compact(bc.reshape(wb * wa, chunk),
                         bv.reshape(wb * wa, chunk), out_width)


@partial(jax.jit, static_argnames=("disp", "pad", "out_width"))
def _spgemm_chunk_stencil(ac, av, c0, B_cols, B_vals, *, disp, pad,
                          out_width):
    """Stencil-A variant: row k of B for A-slot s of row i is
    B[:, i + disp[s]] — a dynamic slice of the pre-padded B arrays."""
    wb = B_cols.shape[0]
    wa, chunk = ac.shape
    bc = jnp.stack(
        [jax.lax.dynamic_slice(B_cols, (jnp.int32(0), c0 + pad + d),
                               (wb, chunk))
         for d in disp], axis=1)                  # (wb, wa, chunk)
    bv = jnp.stack(
        [jax.lax.dynamic_slice(B_vals, (jnp.int32(0), c0 + pad + d),
                               (wb, chunk))
         for d in disp], axis=1)
    ok = ac[None, :, :] >= 0
    bc = jnp.where(ok, bc, -1)
    bv = jnp.where(ok, bv * av[None, :, :], 0)
    return _slot_compact(bc.reshape(wb * wa, chunk),
                         bv.reshape(wb * wa, chunk), out_width)


@partial(jax.jit, static_argnames=("n",))
def _spgemm_finish(cols_list, vals_list, *, n):
    cols = jnp.concatenate(cols_list, axis=1)[:, :n]
    vals = jnp.concatenate(vals_list, axis=1)[:, :n]
    return cols, vals


def device_transpose_width(M: DEll) -> int:
    """Max entries in any column of M (host int; one sync)."""
    return int(_transpose_width_dev(M)) if M.n_cols else 1


@jax.jit
def _transpose_width_dev(M: DEll):
    scols = jnp.where(M.mask, M.cols, M.n_cols)
    counts = jnp.zeros((M.n_cols + 1,), jnp.int32).at[
        scols.reshape(-1)].add(1, mode="drop")
    return jnp.max(counts[:M.n_cols])


def device_transpose(M: DEll, out_width: int,
                     chunk_entries: int = 1 << 23) -> DEll:
    """M^T via stable col-key sorts (the cusparse csr2csc analog,
    ref: src/seq_mv/csr_matop_device.c), CHUNKED over row blocks.

    One global sort was a single XLA program whose runtime grows past
    the TPU worker's 60 s watchdog at 256^3 (67M-entry sort) — instead
    the row blocks sort independently (bounded programs), and a running
    per-output-row write offset carried between chunk programs (buffers
    donated, so the O(out_width * n_cols) state updates in place)
    splices the blocks in ascending-row order: stable sort + row-major
    flatten keeps rows ascending inside a block, and blocks arrive in
    row order."""
    from hypre_tpu.core.heartbeat import beat

    w, n = M.cols.shape
    n_cols = M.n_cols
    cr = max(chunk_entries // max(w, 1) // 128, 1) * 128
    if n <= cr:
        cols, vals, _ = _transpose_chunk(
            M.cols, M.vals, jnp.int32(0),
            jnp.full((out_width * n_cols,), -1, jnp.int32),
            jnp.zeros((out_width * n_cols,), M.vals.dtype),
            jnp.zeros((n_cols,), jnp.int32),
            out_width=out_width, n_cols=n_cols)
        return DEll(cols=cols.reshape(out_width, n_cols),
                    vals=vals.reshape(out_width, n_cols), n_cols=n)
    n_ch = -(-n // cr)
    cols_p = _stack_chunks_jit(M.cols, n=n, chunk=cr, pad_value=-1)
    vals_p = _stack_chunks_jit(M.vals, n=n, chunk=cr, pad_value=0)
    oc = jnp.full((out_width * n_cols,), -1, jnp.int32)
    ov = jnp.zeros((out_width * n_cols,), M.vals.dtype)
    off = jnp.zeros((n_cols,), jnp.int32)
    for k in range(n_ch):
        beat(f"transpose chunk {k}/{n_ch} (n={n})")
        oc, ov, off = _transpose_chunk(
            cols_p[k], vals_p[k], jnp.int32(k * cr), oc, ov, off,
            out_width=out_width, n_cols=n_cols)
    return DEll(cols=oc.reshape(out_width, n_cols),
                vals=ov.reshape(out_width, n_cols), n_cols=n)


@partial(jax.jit, static_argnames=("out_width", "n_cols"),
         donate_argnames=("oc", "ov", "off"))
def _transpose_chunk(cols_k, vals_k, row0, oc, ov, off, *, out_width,
                     n_cols):
    """One row block of the chunked transpose: stable-sort the block's
    entries by column, compute each entry's slot in its output row
    (running offset `off` + position within the block's column run),
    scatter into the slot-major output."""
    w, cr = cols_k.shape
    colsR = cols_k.T.reshape(-1)                  # (cr*w,) row-major
    valsR = vals_k.T.reshape(-1)
    rows = row0 + jnp.repeat(jnp.arange(cr, dtype=jnp.int32), w)
    valid = colsR >= 0
    key = jnp.where(valid, colsR, _BIG)
    scol, srow, sval = jax.lax.sort(
        (key, rows, valsR), dimension=0, num_keys=1, is_stable=True)
    svalid = scol < _BIG
    newrow = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), scol[1:] != scol[:-1]])
    idx = jnp.arange(scol.shape[0], dtype=jnp.int32)
    start = jnp.where(newrow, idx, 0)
    start = jax.lax.associative_scan(jnp.maximum, start)
    local = idx - start
    safe_col = jnp.where(svalid, scol, 0)
    slot = jnp.take(off, safe_col) + local
    # slot-major output: flat = slot * n_cols + out_row
    flat = jnp.where(svalid & (slot < out_width),
                     jnp.minimum(slot, out_width - 1) * n_cols + scol,
                     n_cols * out_width)
    oc = oc.at[flat].set(srow, mode="drop")
    ov = ov.at[flat].set(sval, mode="drop")
    off = off.at[jnp.where(svalid, scol, n_cols)].add(
        1, mode="drop")
    return oc, ov, off


# -- scatter-free transposes (TPU) ------------------------------------------
#
# XLA scatters into output-sized buffers are catastrophically slow on
# v5e (measured: 8M-element scatter-set into a 208M buffer = 93 s —
# past the worker's 60 s watchdog; this is what wedged the round-4
# device RAP).  Scatter-ADDs into small accumulators are fine
# (34 Melem/s), and 1-D sorts run ~5 Melem/s.  The transposes below
# use only: small scatter-adds (column counts), one 1-D two-key sort,
# and ops/btake.py banded gathers for placement.

@partial(jax.jit, static_argnames=("W2",))
def _tr_sort(M: DEll, *, W2: int):
    """All entries sorted by (col, i*W2+s).  Invalid slots sort last.
    Also returns per-column counts (scatter-add) and their max."""
    w, n = M.cols.shape
    key = jnp.where(M.mask, M.cols, _BIG)
    e = (jnp.arange(n, dtype=jnp.int32)[None, :] * W2
         + jnp.arange(w, dtype=jnp.int32)[:, None])
    ks, es = jax.lax.sort((key.reshape(-1), e.reshape(-1)),
                          dimension=0, num_keys=2)
    counts = jnp.zeros((M.n_cols + 1,), jnp.int32).at[
        jnp.where(M.mask, M.cols, M.n_cols).reshape(-1)].add(
            1, mode="drop")[:M.n_cols]
    return ks, es, counts, jnp.max(counts) if M.n_cols else 0


@partial(jax.jit, static_argnames=("w_out",))
def _tr_positions(counts, *, w_out: int):
    """idx2[t, j] = position of output row j's t-th entry in the
    col-sorted entry list (-1 past the row's count)."""
    col_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    t = jnp.arange(w_out, dtype=jnp.int32)[:, None]
    idx2 = col_off[None, :] + t
    return jnp.where(t < counts[None, :], idx2, -1)


@partial(jax.jit, static_argnames=("W2",))
def _tr_esel_chunk(pl_i, idx2w, X2e, *, W2: int):
    from hypre_tpu.ops import btake as bt

    e_sel = bt.btake_rows_padded(pl_i, X2e)[0]
    valid2 = idx2w >= 0
    return jnp.where(valid2, e_sel // W2, -1), \
        jnp.where(valid2, e_sel % W2, -1)


@jax.jit
def _tr_vals_chunk(pl_i, i_selw, s_selw, X2v):
    from hypre_tpu.ops import btake as bt

    vals_g = bt.btake_rows_padded(pl_i, X2v)      # (w, w_out, m)
    w = vals_g.shape[0]
    tv = jnp.zeros(i_selw.shape, vals_g.dtype)
    for k in range(w):
        tv = jnp.where((i_selw >= 0) & (s_selw == k), vals_g[k], tv)
    return tv


def _tr_lanes_m(k: int) -> int:
    """Lane-chunk size bounding (k, m) transpose buffers to ~32 MB per
    temp (the unchunked 256^3 stencil transpose OOM'd HBM with 2 GB
    temps)."""
    m = (1 << 23) // max(k, 1)
    m = 1 << max(m.bit_length() - 1, 1)
    return int(max(8192, min(1 << 18, m)))


def device_transpose_sorted(M: DEll) -> DEll | None:
    """M^T via one global (col, row-order) sort + two banded-gather
    placements — no output-sized scatters, lane-chunked so no
    O(w_out * n_cols) temps live in one program.  Returns None when
    the btake plans reject (caller falls back).  TPU path; CPU tests
    keep the scatter variant (fast enough there)."""
    from hypre_tpu.ops import btake as bt

    w, n = M.cols.shape
    if n == 0 or M.n_cols == 0:
        return None
    W2 = 1 << max(w - 1, 1).bit_length()
    if w == 1:
        W2 = 1
    ks, es, counts, w_out_d = _tr_sort(M, W2=W2)
    w_out = int(w_out_d)
    if w_out == 0:
        return DEll(cols=jnp.full((1, M.n_cols), -1, jnp.int32),
                    vals=jnp.zeros((1, M.n_cols), M.vals.dtype),
                    n_cols=n)
    w_out = -(-w_out // 8) * 8        # bucket: program reuse
    idx2 = _tr_positions(counts, w_out=w_out)
    m_tr = _tr_lanes_m(w_out)
    plan2 = bt.btake_plan(idx2, w * n, lanes_multiple=m_tr)
    if plan2 is None:
        return None
    X2e = bt.pad_sources(plan2, es[None, :])
    wins = _plan_windows(plan2, m_tr)
    n_lanes = plan2.n_steps * plan2.ch_step * CHUNK_LANES
    idx2p = jnp.pad(idx2, [(0, 0), (0, n_lanes - M.n_cols)],
                    constant_values=-1)
    i_parts = []
    s_parts = []
    for (s0, ns, l0, mw) in wins:
        pl_i = _plan_window_eager(plan2, jnp.int32(s0), ns=ns)
        idx2w = _lane_window_jit(idx2p, jnp.int32(l0), m=mw)
        iw, sw = _tr_esel_chunk(pl_i, idx2w, X2e, W2=W2)
        i_parts.append(iw)
        s_parts.append(sw)
    i_sel = jnp.concatenate(i_parts, axis=1)[:, :M.n_cols]
    s_sel = jnp.concatenate(s_parts, axis=1)[:, :M.n_cols]

    plan3 = bt.btake_plan(i_sel, n, lanes_multiple=m_tr)
    if plan3 is None:
        return None
    X2v = bt.pad_sources(plan3, M.vals)
    wins3 = _plan_windows(plan3, m_tr)
    n_lanes3 = plan3.n_steps * plan3.ch_step * CHUNK_LANES
    i_selp = jnp.pad(i_sel, [(0, 0), (0, n_lanes3 - M.n_cols)],
                     constant_values=-1)
    s_selp = jnp.pad(s_sel, [(0, 0), (0, n_lanes3 - M.n_cols)],
                     constant_values=-1)
    tv_parts = []
    for (s0, ns, l0, mw) in wins3:
        pl_i = _plan_window_eager(plan3, jnp.int32(s0), ns=ns)
        tv_parts.append(_tr_vals_chunk(
            pl_i,
            _lane_window_jit(i_selp, jnp.int32(l0), m=mw),
            _lane_window_jit(s_selp, jnp.int32(l0), m=mw), X2v))
    tv = jnp.concatenate(tv_parts, axis=1)[:, :M.n_cols]
    return DEll(cols=i_sel, vals=tv, n_cols=n)


def _compose_disp(disp):
    """Distance-<=2 linear displacement set of a stencil (python ints,
    dedup'd): {d1 + d2 : d1, d2 in disp + {0}}."""
    d0 = tuple(disp) + (0,)
    return tuple(sorted({d1 + d2 for d1 in d0 for d2 in d0}))


@jax.jit
def _cpoint_positions(cf, n_coarse_arr):
    """f[j] = fine index of coarse point j.  Scatter-ADD into zeros
    (targets unique, so add == set; adds run 34 Melem/s on v5e where
    set crawls)."""
    n = cf.shape[0]
    is_c = cf == C_PT
    cmap = jnp.cumsum(is_c.astype(jnp.int32)) - 1
    tgt = jnp.where(is_c, cmap, n_coarse_arr.shape[0])
    return jnp.zeros((n_coarse_arr.shape[0],), jnp.int32).at[tgt].add(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


@partial(jax.jit, static_argnames=("n", "w_out"))
def _tr_stencil_chunk(pl_i, fw, lane0, X2c, X2v, candj, *, n, w_out):
    from hypre_tpu.ops import btake as bt

    pc_g = bt.btake_rows_padded(pl_i, X2c)    # (w_p, D, m)
    pv_g = bt.btake_rows_padded(pl_i, X2v)
    m = fw.shape[0]
    j_ids = (lane0 + jnp.arange(m, dtype=jnp.int32))[None, None, :]
    cand_i = fw[None, :] + candj[:, None]
    ok_i = (cand_i >= 0) & (cand_i < n) & (fw >= 0)[None, :]
    match = (pc_g == j_ids) & ok_i[None, :, :]
    w_p, D, _ = pc_g.shape
    tc = jnp.where(match, jnp.broadcast_to(cand_i[None], match.shape),
                   -1)
    tv = jnp.where(match, pv_g, 0)
    return _slot_compact(tc.reshape(w_p * D, m),
                         tv.reshape(w_p * D, m), w_out)


def device_transpose_stencil(P: DEll, disp, cf) -> DEll | None:
    """Transpose of an interpolation built on a STENCIL fine operator
    (direct / ext+i): P-row(i)'s coarse points lie within i's
    distance-2 A-neighborhood, so column j of P can only be hit from
    fine rows f(j) + d for the composed displacement set — a banded
    gather per coarse row instead of a global sort.  (Candidate rows
    that wrap across grid lines are harmless: their P rows cannot
    contain j unless the entry is real.)  Lane-chunked: the unchunked
    version OOM'd HBM at 256^3 (2 GB temps x ~8)."""
    from hypre_tpu.ops import btake as bt

    w_p, n = P.cols.shape
    n_c = P.n_cols
    if n_c == 0:
        return None
    cand = _compose_disp(disp)
    if len(cand) > 256:
        return None
    f = _cpoint_positions(cf, jnp.zeros((n_c,), jnp.int32))
    cand_idx = _stencil_cand_idx(f, cand, n)
    m_tr = _tr_lanes_m(w_p * len(cand))
    plan = bt.btake_plan(cand_idx, n, lanes_multiple=m_tr)
    if plan is None:
        return None
    w_out = max(int(_transpose_width_dev(P)), 1) if n_c else 1
    w_out = -(-w_out // 8) * 8        # bucket: program reuse
    X2c = bt.pad_sources(plan, P.cols)
    X2v = bt.pad_sources(plan, P.vals)
    candj = jnp.asarray(cand, jnp.int32)
    wins = _plan_windows(plan, m_tr)
    n_lanes = plan.n_steps * plan.ch_step * CHUNK_LANES
    fp = jnp.pad(f, (0, n_lanes - n_c), constant_values=-1)
    tcs = []
    tvs = []
    for (s0, ns, l0, mw) in wins:
        pl_i = _plan_window_eager(plan, jnp.int32(s0), ns=ns)
        tc_i, tv_i = _tr_stencil_chunk(
            pl_i, _lane_window_jit(fp, jnp.int32(l0), m=mw),
            jnp.int32(l0), X2c, X2v, candj, n=n, w_out=w_out)
        tcs.append(tc_i)
        tvs.append(tv_i)
    tc = jnp.concatenate(tcs, axis=1)[:, :n_c]
    tv = jnp.concatenate(tvs, axis=1)[:, :n_c]
    return DEll(cols=tc, vals=tv, n_cols=n)


@partial(jax.jit, static_argnames=("cand", "n"))
def _stencil_cand_idx(f, cand, n):
    ci = f[None, :] + jnp.asarray(cand, jnp.int32)[:, None]
    return jnp.where((ci >= 0) & (ci < n), ci, -1)


@partial(jax.jit, static_argnames=("trunc_factor", "max_elmts"))
def device_truncate(P: DEll, trunc_factor: float, max_elmts: int) -> DEll:
    """Interpolation truncation (ref: src/parcsr_mv/par_csr_matrix.c:
    2874): drop entries below trunc_factor * row-inf-norm, keep the
    max_elmts largest by magnitude, rescale to preserve row sums.
    Output width = max_elmts (static compaction)."""
    w, n = P.cols.shape
    vals = jnp.where(P.mask, P.vals, 0)
    absv = jnp.abs(vals)
    keep = P.mask
    if trunc_factor > 0.0:
        row_nrm = jnp.max(absv, axis=0)
        keep = keep & (absv >= trunc_factor * row_nrm[None, :])
    kw = w
    if max_elmts > 0 and max_elmts < w:
        kw = max_elmts
        # rank by descending magnitude among kept entries; keep the
        # first kw (sort-based — no scatters)
        keep = keep & (_rank_desc(absv, keep) < kw)
    row_sum = jnp.sum(vals, axis=0)
    kept_sum = jnp.sum(jnp.where(keep, vals, 0), axis=0)
    scale = jnp.where(kept_sum != 0, row_sum / kept_sum, 1.0)
    newv = jnp.where(keep, vals * scale[None, :], 0)
    newc = jnp.where(keep, P.cols, _BIG)
    # compact kept entries to the low slots (ascending col preserved);
    # multi-operand sort — no scalar-gather take_along_axis
    newc, newv = jax.lax.sort((newc, newv), dimension=0, num_keys=1)
    newc = newc[:kw]
    newv = newv[:kw]
    return DEll(cols=jnp.where(newc < _BIG, newc, -1).astype(jnp.int32),
                vals=jnp.where(newc < _BIG, newv, 0), n_cols=P.n_cols)


@partial(jax.jit, static_argnames=("option",))
def device_l1_norms(A: DEll, option: int = 1) -> jax.Array:
    """Smoother l1 row norms, matching setup/l1norms.l1_norms on a
    single shard (ref: src/parcsr_ls/ams.c:628-760): option 1 = full
    row l1; option 4 without off-process couplings truncates to |a_ii|;
    option 5 = plain diagonal."""
    valid = A.mask
    diag, _ = _row_diag(A)
    if option == 5:
        l1 = diag
    elif option == 4:
        l1 = jnp.abs(diag)
        l1 = jnp.where(diag < 0, -l1, l1)
    else:
        l1 = jnp.sum(jnp.where(valid, jnp.abs(A.vals), 0), axis=0)
        l1 = jnp.where(diag < 0, -l1, l1)
    return jnp.where(l1 != 0, l1, 1.0)
