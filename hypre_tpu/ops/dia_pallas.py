"""Pallas DIA (stencil) SpMV kernel.

The jnp DIA matvec (pad+slice per diagonal) measures ~25 GB/s on v5e —
XLA materializes each shifted copy through HBM.  This kernel keeps a
row-tile's x-window in VMEM and applies every diagonal as
register-level shifts:

  x is laid out (rows, 128).  A flat offset d splits into
  (dr, dl) = (d // 128, d mod 128).  The shifted operand
  s[r, l] = x[r + dr + (l + dl >= 128), (l + dl) % 128]
  is one static lane-roll of two adjacent row slices + a lane select —
  no gathers, no HBM round trips, so the vals stream dominates traffic
  and the kernel runs at streaming speed.

Two modes:

* RESIDENT — the padded x fits in VMEM; reads come straight from the
  x block.
* WINDOWED — x stays in HBM.  Diagonal offsets are clustered into
  BANDS (e.g. the z-, mid-, z+ planes of a 7-pt operator); each band
  is one small contiguous x window whose start is AFFINE in the grid
  step (t*R + dlo_band), so the double-buffered DMAs need no index
  tables at all.  All reads are in-bounds by construction: x is
  front-padded by lo_r rows (so every dr >= 0) and tail-padded past
  the last tile's furthest read.

This is the TPU re-design of the structured BoxLoop matvec
(ref: src/struct_mv/boxloop_cuda.h; CSR stencil case
src/seq_mv/csr_spmv_device.c:381).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 1024          # output rows per grid step (resident mode)
VMEM_X_LIMIT = 6 * 1024 * 1024
BAND_GAP = 64             # x2d-row gap that splits diagonal bands
MAX_WIN_ROWS = 8192       # cap on total band-window rows per buffer


def _pick_tile_rows(n_rows, n_diags, drs, itemsize):
    """Largest tile whose band windows and vals block fit VMEM.  Small
    tiles are DMA-latency-bound (measured 7.6 ms vs 4.8 for GST-ELL on
    the 256^3 7-pt fine level at 1024 rows/step: 3 DMAs of ~5 KB per
    1024 rows); a 32k-row step amortizes the same 3 band DMAs over
    32x the work and streams near HBM speed."""
    for tile in (65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if tile > max(n_rows, 1024):
            continue
        rpt = tile // 128
        plan = _band_plan(drs, rpt)
        if plan is None:
            continue
        win = plan[4]
        vals_b = n_diags * rpt * 128 * itemsize
        if 2 * win * 128 * itemsize + vals_b <= 5 * 1024 * 1024:
            return tile, plan
    return 1024, _band_plan(drs, 8)


def _shifted_read(read8, dr, dl, dtype):
    """(8,128) operand shifted by (dr, dl); read8(k) returns the
    8-row window slice starting at relative row k."""
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    a = read8(dr)
    if dl == 0:
        return a
    b = read8(dr + 1)
    ar = pltpu.roll(a, 128 - dl, 1)
    br = pltpu.roll(b, 128 - dl, 1)
    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.where(lane < 128 - dl, ar, br)


def _band_plan(drs, rows_per_tile):
    """Cluster per-diagonal window rows ``drs`` (sorted unique not
    required) into contiguous bands.  Returns (band_of_diag, dlo list,
    Eb list, cumulative offsets, WIN) or None if over the cap."""
    order = np.argsort(drs)
    sor = np.asarray(drs)[order]
    split = np.diff(sor) > BAND_GAP
    band_sorted = np.concatenate([[0], np.cumsum(split)])
    n_bands = int(band_sorted[-1]) + 1
    dlo, dhi = [], []
    for b in range(n_bands):
        sel = sor[band_sorted == b]
        dlo.append(int(sel.min()))
        dhi.append(int(sel.max()))
    # +1 row because dl != 0 reads dr and dr+1; +rows_per_tile for the
    # tile itself
    ebs = [hi - lo + rows_per_tile + 1 for lo, hi in zip(dlo, dhi)]
    win = int(np.sum(ebs))
    if win > MAX_WIN_ROWS:
        return None
    cum = np.concatenate([[0], np.cumsum(ebs)[:-1]]).astype(int)
    band_of = np.empty(len(drs), dtype=int)
    band_of[order] = band_sorted
    return band_of, dlo, ebs, cum, win


def dia_matvec_pallas(offsets, vals, x, n_rows, n_cols):
    """y = A @ x for DIA with static offsets.

    offsets: tuple[int]; vals: (n_diags, n_rows); x: (n_cols,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = vals.dtype
    n_diags = len(offsets)
    min_off = min(min(offsets), 0)
    max_off = max(max(offsets), 0)
    lo_r = -(min_off // 128) if min_off < 0 else 0   # ceil(-min/128)

    # per-diagonal (dr, dl) relative to the window origin (row -lo_r*128)
    shifts = [((d + lo_r * 128) // 128, (d + lo_r * 128) % 128)
              for d in offsets]
    max_dr = max(dr for dr, _ in shifts)
    drs = [dr for dr, _ in shifts]

    # resident when the whole padded x fits VMEM; else the largest
    # banded tile that fits
    min_x_rows = max(-(-n_rows // 128) + max_dr + 2,
                     -(-(lo_r * 128 + n_cols) // 128))
    resident = min_x_rows * 128 * dtype.itemsize <= VMEM_X_LIMIT
    if resident:
        tile_rows = TILE_ROWS
        plan = None
    else:
        tile_rows, plan = _pick_tile_rows(n_rows, n_diags, drs,
                                          dtype.itemsize)

    n_tiles = -(-n_rows // tile_rows)
    rows_pad = n_tiles * tile_rows
    rows_per_tile = tile_rows // 128  # x2d rows per tile

    # padded x: front pad lo_r rows so every dr >= 0; tail pad past the
    # furthest read of the LAST tile (dr+1 rows from its base)
    need_rows = (n_tiles - 1) * rows_per_tile + rows_per_tile + max_dr + 2
    x_rows_total = max(need_rows, -(-(lo_r * 128 + n_cols) // 128))
    xpad_len = x_rows_total * 128
    xp = jnp.zeros((xpad_len,), dtype=dtype)
    xp = xp.at[lo_r * 128: lo_r * 128 + n_cols].set(x.astype(dtype))
    x2d = xp.reshape(x_rows_total, 128)

    vals_pad = jnp.zeros((n_diags, rows_pad), dtype=dtype)
    vals_pad = vals_pad.at[:, :n_rows].set(vals)
    vals_t = vals_pad.reshape(n_diags, n_tiles, rows_per_tile,
                              128).transpose(1, 0, 2, 3)

    nblk = tile_rows // 1024       # (8,128) vreg blocks per tile

    if resident:
        def kernel(vals_ref, x_ref, y_ref):
            t = pl.program_id(0)
            base = t * rows_per_tile
            for j in range(nblk):
                def read8(k, _j=j):
                    return x_ref[pl.ds(base + _j * 8 + k, 8), :]
                acc = jnp.zeros((8, 128), dtype=dtype)
                for kd, (dr, dl) in enumerate(shifts):
                    s = _shifted_read(read8, dr, dl, dtype)
                    v = vals_ref[0, kd, pl.ds(j * 8, 8), :]
                    acc = acc + v * s
                y_ref[0, pl.ds(j * 8, 8), :] = acc

        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, rows_per_tile, 128), dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, n_diags, rows_per_tile, 128),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((x_rows_total, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_per_tile, 128),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(vals_t, x2d)
        return y.reshape(-1)[:n_rows]

    # ---- windowed: banded double-buffered DMA ------------------------
    if plan is None:
        from hypre_tpu.ops.formats import DiaMatrix, dia_matvec

        Dm = DiaMatrix(vals=vals, offsets=tuple(offsets), n_cols=n_cols)
        return dia_matvec(Dm, x)
    band_of, dlo, ebs, cum, WIN = plan
    n_bands = len(dlo)
    # window-relative dr of each diagonal
    drel = [dr - dlo[band_of[k]] + cum[band_of[k]]
            for k, (dr, _) in enumerate(shifts)]

    def kernel_w(vals_ref, x_hbm, y_ref, win, sems):
        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)

        def band_copy(u, sl, bd):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(u * rows_per_tile + dlo[bd], ebs[bd]), :],
                win.at[pl.ds(sl * WIN + cum[bd], ebs[bd]), :],
                sems.at[sl * n_bands + bd])

        @pl.when(t == 0)
        def _():
            for bd in range(n_bands):
                band_copy(t, slot, bd).start()

        @pl.when(t + 1 < n_tiles)
        def _():
            for bd in range(n_bands):
                band_copy(t + 1, nslot, bd).start()

        for bd in range(n_bands):
            band_copy(t, slot, bd).wait()

        off = slot * WIN
        for j in range(nblk):
            acc = jnp.zeros((8, 128), dtype=dtype)
            for kd, (dr, dl) in enumerate(shifts):
                def read8(k, _j=j, _kd=kd):
                    return win[pl.ds(off + drel[_kd] + _j * 8 + k, 8), :]
                # read8 is already positioned at this diagonal's band
                # window, so the shifted read uses relative dr 0
                s = _shifted_read(read8, 0, dl, dtype)
                v = vals_ref[0, kd, pl.ds(j * 8, 8), :]
                acc = acc + v * s
            y_ref[0, pl.ds(j * 8, 8), :] = acc

    y = pl.pallas_call(
        kernel_w,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, rows_per_tile, 128), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, n_diags, rows_per_tile, 128),
                         lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, rows_per_tile, 128),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * WIN, 128), dtype),
            pltpu.SemaphoreType.DMA((2 * n_bands,)),
        ],
    )(vals_t, x2d)
    return y.reshape(-1)[:n_rows]


def dia_windowed_viable(offsets) -> bool:
    """True when the banded window plan fits the VMEM cap (used by the
    format dispatcher to prefer DIA for large stencils)."""
    min_off = min(min(offsets), 0)
    lo_r = -(min_off // 128) if min_off < 0 else 0
    drs = [(d + lo_r * 128) // 128 for d in offsets]
    return _pick_tile_rows(1 << 30, len(offsets), drs, 4)[1] is not None
