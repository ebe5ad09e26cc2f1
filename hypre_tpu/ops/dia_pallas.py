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

Only the VMEM-resident mode is enabled: the windowed-DMA variant
faults the TPU worker (under investigation); large stencil operators
are routed to GST-ELL instead, whose windowed path is proven.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 1024          # output rows per grid step
VMEM_X_LIMIT = 6 * 1024 * 1024


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
    hi_r = max_off // 128 + 2
    W = TILE_ROWS // 128 + lo_r + hi_r

    n_tiles = -(-n_rows // TILE_ROWS)
    rows_pad = n_tiles * TILE_ROWS
    xpad_len = lo_r * 128 + max(rows_pad + max_off + 256, n_cols) + 128
    xpad_len = -(-xpad_len // 128) * 128
    x_rows_total = xpad_len // 128

    xpad_len = max(xpad_len, W * 128)   # window must fit even for tiny x
    x_rows_total = xpad_len // 128
    xp = jnp.zeros((xpad_len,), dtype=dtype)
    xp = xp.at[lo_r * 128: lo_r * 128 + n_cols].set(x.astype(dtype))
    x2d = xp.reshape(x_rows_total, 128)

    vals_pad = jnp.zeros((n_diags, rows_pad), dtype=dtype)
    vals_pad = vals_pad.at[:, :n_rows].set(vals)
    vals_t = vals_pad.reshape(n_diags, n_tiles, TILE_ROWS // 128,
                              128).transpose(1, 0, 2, 3)

    # per-diagonal (dr, dl) relative to the window origin (row -lo_r*128)
    shifts = [((d + lo_r * 128) // 128, (d + lo_r * 128) % 128)
              for d in offsets]

    resident = xpad_len * dtype.itemsize <= VMEM_X_LIMIT
    if not resident:
        # see module docstring - fall back to the jnp formulation
        from hypre_tpu.ops.formats import DiaMatrix, dia_matvec

        Dm = DiaMatrix(vals=vals, offsets=tuple(offsets), n_cols=n_cols)
        return dia_matvec(Dm, x)
    nblk = TILE_ROWS // 1024       # (8,128) vreg blocks per tile
    rows_per_tile = TILE_ROWS // 128  # x2d rows per tile

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
                (n_tiles, TILE_ROWS // 128, 128), dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, n_diags, TILE_ROWS // 128, 128),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((x_rows_total, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_ROWS // 128, 128),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(vals_t, x2d)
    else:
        # clamped per-tile window starts precomputed on host (SMEM)
        starts_np = np.minimum(np.arange(n_tiles) * rows_per_tile,
                               x_rows_total - W)
        deltas_np = np.arange(n_tiles) * rows_per_tile - starts_np
        starts = jnp.asarray(starts_np.astype(np.int32)).reshape(-1, 1, 1)
        deltas = jnp.asarray(deltas_np.astype(np.int32)).reshape(-1, 1, 1)

        def kernel_w(start_ref, delta_ref, vals_ref, x_hbm, y_ref, win,
                     sem):
            start = start_ref[0, 0, 0]
            delta = delta_ref[0, 0, 0]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, W), :], win, sem)
            cp.start()
            cp.wait()
            for j in range(nblk):
                def read8(k, _j=j):
                    return win[pl.ds(delta + _j * 8 + k, 8), :]
                acc = jnp.zeros((8, 128), dtype=dtype)
                for kd, (dr, dl) in enumerate(shifts):
                    s = _shifted_read(read8, dr, dl, dtype)
                    v = vals_ref[0, kd, pl.ds(j * 8, 8), :]
                    acc = acc + v * s
                y_ref[0, pl.ds(j * 8, 8), :] = acc

        y = pl.pallas_call(
            kernel_w,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, TILE_ROWS // 128, 128), dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n_diags, TILE_ROWS // 128, 128),
                             lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, TILE_ROWS // 128, 128),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, 128), dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(starts, deltas, vals_t, x2d)

    return y.reshape(-1)[:n_rows]
