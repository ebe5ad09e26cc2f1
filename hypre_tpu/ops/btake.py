"""btake: banded multi-slot gather as a Pallas lane-shuffle kernel.

The device AMG setup (setup/device_amg.py) is built from gathers of the
form ``out[s, i] = x[idx[s, i]]`` and row expansions
``out[k, s, i] = X[k, idx[s, i]]`` — SpGEMM row expansion,
interpolation neighbor reads, PMIS marker reads (ref:
src/seq_mv/csr_spgemm_device.c:15 row expansion,
src/parcsr_ls/par_lr_interp_device.c:1001, par_coarsen_device.c:30).
XLA lowers these to scalar HBM gathers (~0.1 Gelem/s measured on v5e),
which made the round-4 device setup 275x slower than the reference's
V100 setup.

AMG index sets are BANDED: within one chunk of 128 consecutive rows,
slot s's indices span a few hundred values (grid locality survives
coarsening and the Galerkin product).  That is exactly the structure
the GST-ELL solve kernel (ops/gstell.py) exploits, so btake reuses its
machinery: per (chunk, slot) 128-aligned window bases, local offsets
in [0, 128c), Mosaic's ``dynamic_gather`` lane shuffle on (8, 128)
vregs, and banded double-buffered window DMA when the source does not
fit VMEM.  Unlike the SpMV kernel there is no FMA/reduction — the
gathered blocks are the output — and the grid carries a second
dimension over SOURCE ROWS, so a whole SpGEMM row expansion (every
B_cols / B_vals row through the same index set) is ONE kernel launch.

Usage:
    plan = btake_plan(idx, n_src)      # None -> not banded; caller
                                       #         falls back to jnp.take
    Y = btake_rows(plan, X)            # X (K, n_src) ->
                                       # Y[k, s, i] = X[k, idx[s, i]]
    y = btake(plan, x)                 # (n_src,) -> y[s, i] = x[idx[s,i]]

Outputs are junk where idx < 0 — callers mask on idx >= 0, exactly as
they already do around jnp.take.  A plan depends only on `idx`, so
SpGEMM reuses one plan for the width pass plus the numeric pass, and
PMIS reuses one plan for every selection round.  `plan_slice` gives a
row-window view so chunked consumers keep their bounded-memory loops.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.ops.gstell import (
    CHUNK, MAX_WIN_ROWS, VMEM_X_LIMIT, _band_bases,
)

_BIG = np.int32(2**30)
MAX_C = 96              # window width cap (x128 rows)
_DEBUG = bool(int(os.environ.get("HYPRE_TPU_BTAKE_DEBUG", "0")))
_KUNROLL = int(os.environ.get("HYPRE_TPU_BTAKE_UNROLL", "8"))


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "brel", "w0b", "locs"],
         meta_fields=["n", "S", "c", "g", "b", "eb", "x_rows",
                      "x_rows_pad", "resident", "ch_step"])
@dataclasses.dataclass(frozen=True)
class BtakePlan:
    """Gather plan for a fixed (S, n) banded index set.

    base: int32[n_steps, ch_step, G, 8]  absolute x2d window base row
    brel: int32[same]   windowed: band*eb + (base - w0_band); None
                        in resident mode
    w0b:  int32[n_steps, b]  per (step, band) window start; None in
                        resident mode
    locs: int16[n_steps, ch_step, 8G, 128]  offsets in [0, 128c)
    """

    base: jax.Array
    brel: jax.Array | None
    w0b: jax.Array | None
    locs: jax.Array
    n: int              # lane count (index columns)
    S: int              # real slot count (8G >= S)
    c: int
    g: int
    b: int
    eb: int
    x_rows: int         # ceil(n_src / 128)
    x_rows_pad: int
    resident: bool
    ch_step: int

    @property
    def n_steps(self) -> int:
        return self.locs.shape[0]


def _pick_ch_step(n_chunks: int, G: int) -> int:
    """Chunks per grid step (power of two): amortize per-step fixed
    costs over >= ~1 MB of locs while keeping the per-step VMEM output
    block (ch_step * 8G * 128 * 4B) bounded.  Capped at 16: Mosaic
    compile time scales with the UNROLLED kernel body, and a ch_step
    of 64 at G=4/c=5 was a >9 min compile."""
    per_chunk = 8 * G * CHUNK * 2          # locs int16
    target = max(1, (1 * 1024 * 1024) // per_chunk)
    ch = 1 << (target.bit_length() - 1)
    cap_out = max(1, (2 * 1024 * 1024) // (8 * G * CHUNK * 4))
    cap_out = 1 << (cap_out.bit_length() - 1)
    cap = 1 << max(int(n_chunks) - 1, 1).bit_length()
    return int(max(1, min(16, cap, ch, cap_out)))


def _pick_ku(G: int, c: int, CH: int) -> int:
    """Chunk-loop unroll: bound traced kernel-body ops
    (KU * G * (10c + 6)) to keep Mosaic compile seconds, not minutes.
    Power of two dividing CH."""
    per_chunk = max(G * (10 * c + 6), 1)
    ku = max(1, 1024 // per_chunk)
    ku = 1 << (ku.bit_length() - 1)
    return int(min(ku, CH, _KUNROLL))


@partial(jax.jit, static_argnames=("n_chunks", "S8"))
def _plan_stage(idx, *, n_chunks, S8):
    """Device part of plan building: chunk layout, window bases, locs.
    idx int32 (S, n) with -1 padding.  Returns (base (n_chunks, S8),
    locs (n_chunks, S8, 128) int16, c_minus scalar = max spread >> 7)."""
    S, n = idx.shape
    n_pad = n_chunks * CHUNK
    idxp = jnp.pad(idx, [(0, S8 - S), (0, n_pad - n)],
                   constant_values=-1)
    # (S8, n_chunks, 128) -> (n_chunks, S8, 128)
    blk = idxp.reshape(S8, n_chunks, CHUNK).transpose(1, 0, 2)
    valid = blk >= 0
    row = jnp.where(valid, blk >> 7, _BIG)
    base = jnp.min(row, axis=2)                     # (n_chunks, S8)
    used = base < _BIG
    # unused slots reuse a used base from the same chunk (fallback 0)
    chunk_min = jnp.min(jnp.where(used, base, _BIG), axis=1)
    chunk_min = jnp.where(chunk_min < _BIG, chunk_min, 0)
    base = jnp.where(used, base, chunk_min[:, None])
    spread = jnp.where(valid, blk - base[:, :, None] * 128, 0)
    locs = spread.astype(jnp.int16)
    c_minus = jnp.max(spread) >> 7                  # c = c_minus + 1
    return base, locs, c_minus


_C_BUCKETS = (1, 2, 4, 8, 16, 32, 48, 64, 96)


def _bucket_up(v: int, buckets) -> int:
    for b in buckets:
        if v <= b:
            return b
    return v


def btake_plan(idx, n_src: int, itemsize: int = 4,
               ch_step: int | None = None,
               resident_limit: int = VMEM_X_LIMIT,
               lanes_multiple: int | None = None):
    """Build a gather plan for idx (S, n) int32 into length-n_src
    sources.  Returns None when the index set is not banded enough
    (caller falls back to XLA's gather).  One scalar sync (c) plus the
    O(n_chunks * S) base fetch for band scheduling.

    Kernel-shape knobs (c, eb, x_rows_pad) are rounded up to buckets
    so plans from different levels/problems compile to the SAME Mosaic
    kernels — compiles on this environment cost 30-180 s per distinct
    program, paid per process.  lanes_multiple pads the lane count so
    chunked consumers see uniform window shapes."""
    S, n = idx.shape
    if n == 0 or S == 0 or n_src <= 0:
        return None
    G = -(-S // 8)
    S8 = 8 * G
    n_chunks = -(-n // CHUNK)
    x_rows = max(-(-n_src // 128), 1)
    base, locs, c_minus = _plan_stage(idx, n_chunks=n_chunks, S8=S8)
    c = int(c_minus) + 1
    if c > MAX_C:
        if _DEBUG:
            print(f"[btake reject] c={c} > {MAX_C}")
        return None
    c = _bucket_up(c, _C_BUCKETS)
    if ch_step is None:
        ch_step = _pick_ch_step(n_chunks, G)
    cmul = ch_step
    if lanes_multiple is not None:
        cmul = max(ch_step, lanes_multiple // CHUNK)
        cmul = -(-cmul // ch_step) * ch_step
    n_chunks_pad = -(-n_chunks // cmul) * cmul
    n_steps = n_chunks_pad // ch_step

    base_np = np.asarray(base).astype(np.int64)     # ONE bulk fetch
    if n_chunks_pad > n_chunks:
        fill = base_np[-1:].repeat(n_chunks_pad - n_chunks, axis=0)
        base_np = np.concatenate([base_np, fill], axis=0)
    base_steps = base_np.reshape(n_steps, ch_step * S8)

    resident = (x_rows + c) * 128 * itemsize <= resident_limit
    brel_arr = w0b_arr = None
    B = eb = 0
    if resident:
        x_rows_pad = max(int(base_steps.max(initial=0)) + c, x_rows)
        x_rows_pad = 1 << max(x_rows_pad - 1, 1).bit_length()
    else:
        r = _band_bases(base_steps, c)
        if r is None:
            if _DEBUG:
                print("[btake reject] band windows unbounded")
            return None
        brel, w0b, B, eb = r
        # bucket eb (band window rows) so kernels are shared across
        # levels; brel = band*eb + rel must be re-based
        eb_new = 1 << max(eb - 1, 1).bit_length()
        band = brel // eb
        rel = brel - band * eb
        brel = band * eb_new + rel
        eb = eb_new
        if B * eb > 2 * MAX_WIN_ROWS:
            if _DEBUG:
                print(f"[btake reject] bucketed B*eb={B*eb}")
            return None
        x_rows_pad = max(int(w0b.max(initial=0)) + eb, x_rows)
        x_rows_pad = 1 << max(x_rows_pad - 1, 1).bit_length()
        brel_arr = jnp.asarray(
            brel.reshape(n_steps, ch_step, G, 8).astype(np.int32))
        w0b_arr = jnp.asarray(w0b.astype(np.int32))

    locs4 = _locs4_jit(locs, n_chunks_pad=n_chunks_pad,
                       n_steps=n_steps, ch_step=ch_step, S8=S8)
    return BtakePlan(
        base=jnp.asarray(base_steps.reshape(n_steps, ch_step, G, 8)
                         .astype(np.int32)),
        brel=brel_arr, w0b=w0b_arr, locs=locs4,
        n=int(n), S=int(S), c=int(c), g=int(G), b=int(B), eb=int(eb),
        x_rows=int(x_rows), x_rows_pad=int(x_rows_pad),
        resident=bool(resident), ch_step=int(ch_step))


@partial(jax.jit,
         static_argnames=("n_chunks_pad", "n_steps", "ch_step", "S8"))
def _locs4_jit(locs, *, n_chunks_pad, n_steps, ch_step, S8):
    extra = n_chunks_pad - locs.shape[0]
    if extra:
        locs = jnp.pad(locs, [(0, extra), (0, 0), (0, 0)])
    return locs.reshape(n_steps, ch_step, S8, CHUNK)


def plan_slice(plan: BtakePlan, step0: int, n_steps: int) -> BtakePlan:
    """Row-window view of a plan: steps [step0, step0 + n_steps).
    Lets chunked consumers (SpGEMM / interp row chunks) reuse one
    whole-matrix plan without re-deriving bases or bands."""
    sl = slice(step0, step0 + n_steps)
    return dataclasses.replace(
        plan,
        base=plan.base[sl],
        brel=None if plan.brel is None else plan.brel[sl],
        w0b=None if plan.w0b is None else plan.w0b[sl],
        locs=plan.locs[sl],
        n=min(plan.n - step0 * plan.ch_step * CHUNK,
              n_steps * plan.ch_step * CHUNK))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _gather_group(locs_row, slab_at, base_get, g, c):
    """One slot group's gathered (8, 128) block (the ops/gstell.py
    _chunk_body gather, without the FMA/reduce tail)."""
    locs_blk = locs_row[g * 8:(g + 1) * 8, :].astype(jnp.int32)
    if c == 1:
        lane = locs_blk
        sub = None
    else:
        lane = jnp.bitwise_and(locs_blk, 127)
        sub = jnp.right_shift(locs_blk, 7)
    slabs = jnp.stack([slab_at(base_get(g, s)) for s in range(8)],
                      axis=1)                       # (c, 8, 128)
    acc = jnp.take_along_axis(slabs[0], lane, axis=1)
    for w in range(1, c):
        gw = jnp.take_along_axis(slabs[w], lane, axis=1)
        acc = jnp.where(sub == w, gw, acc)
    return acc


def _btake_pallas(plan: BtakePlan, X2d: jax.Array) -> jax.Array:
    """X2d: (K, x_rows_pad, 128).  Returns (K, n_steps, CH, S8, 128).
    Grid = (K, n_steps): source-major so each source's window DMAs
    stream through the step sequence."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = plan.locs.shape[0]
    G, c, CH = plan.g, plan.c, plan.ch_step
    S8 = 8 * G
    K_src = X2d.shape[0]
    dtype = X2d.dtype
    KU = _pick_ku(G, c, CH)    # CH, KU powers of two
    assert CH % KU == 0
    interp = jax.default_backend() == "cpu"   # CPU tests: interpreter

    if plan.resident:
        def kernel(base_ref, locs_ref, x_ref, y_ref):
            def chunk_at(blk, _):
                for j in range(KU):
                    ch = blk * KU + j
                    for g in range(G):
                        y_ref[0, 0, ch, g * 8:(g + 1) * 8, :] = \
                            _gather_group(
                                locs_ref[0, ch],
                                lambda b: x_ref[0, pl.ds(b, c), :],
                                lambda gg, s: base_ref[0, ch, gg, s],
                                g, c)
                return ()

            jax.lax.fori_loop(0, CH // KU, chunk_at, ())

        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (K_src, n_steps, CH, S8, CHUNK), dtype),
            grid=(K_src, n_steps),
            in_specs=[
                pl.BlockSpec((1, CH, G, 8), lambda k, t: (t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH, S8, CHUNK),
                             lambda k, t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, plan.x_rows_pad, 128),
                             lambda k, t: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, CH, S8, CHUNK),
                                   lambda k, t: (k, t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(plan.base, plan.locs, X2d)
    else:
        B, Eb = plan.b, plan.eb
        WIN = B * Eb

        def kernel_w(w0b_ref, brel_ref, locs_ref, x_hbm, y_ref,
                     win, sems):
            k = pl.program_id(0)
            t = pl.program_id(1)
            cell = k * n_steps + t
            slot = jax.lax.rem(cell, 2)
            nslot = jax.lax.rem(cell + 1, 2)

            def band_copy(ku, u, sl, bd):
                return pltpu.make_async_copy(
                    x_hbm.at[ku, pl.ds(w0b_ref[u * B + bd], Eb), :],
                    win.at[pl.ds(sl * WIN + bd * Eb, Eb), :],
                    sems.at[sl * B + bd])

            @pl.when(cell == 0)
            def _():
                for bd in range(B):
                    band_copy(k, t, slot, bd).start()

            # prefetch the next grid cell's windows (wraps to the next
            # source row's step 0 at the end of each step sequence)
            @pl.when(cell + 1 < K_src * n_steps)
            def _():
                nk = jax.lax.select(t + 1 < n_steps, k, k + 1)
                nt = jax.lax.select(t + 1 < n_steps, t + 1, 0)
                for bd in range(B):
                    band_copy(nk, nt, nslot, bd).start()

            for bd in range(B):
                band_copy(k, t, slot, bd).wait()

            off = slot * WIN

            def chunk_at(blk, _):
                for j in range(KU):
                    ch = blk * KU + j
                    for g in range(G):
                        y_ref[0, 0, ch, g * 8:(g + 1) * 8, :] = \
                            _gather_group(
                                locs_ref[0, ch],
                                lambda b: win[pl.ds(b, c), :],
                                lambda gg, s: (brel_ref[0, ch, gg, s]
                                               + off),
                                g, c)
                return ()

            jax.lax.fori_loop(0, CH // KU, chunk_at, ())

        y = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct(
                (K_src, n_steps, CH, S8, CHUNK), dtype),
            grid=(K_src, n_steps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),      # w0b flat
                pl.BlockSpec((1, CH, G, 8), lambda k, t: (t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CH, S8, CHUNK),
                             lambda k, t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),       # X2d HBM
            ],
            out_specs=pl.BlockSpec((1, 1, CH, S8, CHUNK),
                                   lambda k, t: (k, t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * WIN, 128), dtype),
                pltpu.SemaphoreType.DMA((2 * B,)),
            ],
            interpret=interp,
        )(plan.w0b.reshape(-1), plan.brel, plan.locs, X2d)
    return y


@jax.jit
def pad_sources(plan, X):
    """(K, n_src) -> (K, x_rows_pad, 128) zero-padded 2-D sources —
    the per-level part of a gather, split out so the BIG consumer
    programs depend only on bucketed kernel shapes, never on n_src."""
    K_src = X.shape[0]
    npad = plan.x_rows_pad * 128
    return jnp.pad(X, [(0, 0), (0, npad - X.shape[1])]).reshape(
        K_src, plan.x_rows_pad, 128)


def btake_rows_padded(plan: BtakePlan, X2d: jax.Array) -> jax.Array:
    """Gather with pre-padded sources (see pad_sources); returns
    (K, S, n_lanes_padded) — crop to the real lane count at the call
    site if needed."""
    y = _btake_pallas(plan, X2d)
    K_src, n_steps, CH, S8, _ = y.shape
    y = y.transpose(0, 3, 1, 2, 4).reshape(K_src, S8,
                                           n_steps * CH * CHUNK)
    return y[:, :plan.S]


@jax.jit
def _btake_rows_jit(plan, X):
    y = btake_rows_padded(plan, pad_sources(plan, X))
    return y[:, :, :plan.n]


def btake_rows(plan: BtakePlan, X: jax.Array) -> jax.Array:
    """Y[k, s, i] = X[k, idx[s, i]] (junk where idx < 0).
    X: (K, n_src) — every row gathered through the same plan in one
    kernel launch."""
    return _btake_rows_jit(plan, X)


def btake(plan: BtakePlan, x: jax.Array) -> jax.Array:
    """y[s, i] = x[idx[s, i]] (junk where idx < 0).  x: (n_src,)."""
    return _btake_rows_jit(plan, x[None, :])[0]


def btake_enabled() -> bool:
    """The kernel path is TPU-only (Mosaic); CPU runs (tests, the
    virtual mesh) use the XLA gather, which is fast enough there.
    HYPRE_TPU_BTAKE_INTERP=1 forces the kernel on CPU via the Pallas
    interpreter (slow — tiny correctness tests only)."""
    if os.environ.get("HYPRE_TPU_NO_BTAKE"):
        return False
    if os.environ.get("HYPRE_TPU_BTAKE_INTERP"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
