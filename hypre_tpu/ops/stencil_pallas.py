"""Analytic constant-coefficient stencil SpMV: zero operator traffic.

The fine level of a generated stencil problem (gen/laplace.py, the
`-laplacian`/`-27pt` ij driver classes, ref: src/parcsr_ls/par_laplace.c:63)
is a constant-coefficient operator with Dirichlet truncation: every
value is either the stencil constant or zero at a boundary.  Streaming
those values from HBM (as CSR/ELL/DIA/GST-ELL all do) costs ~6 bytes
per nonzero — 800 MB per matvec at 256^3 — to move information the
INDEX already carries.  This kernel computes the boundary masks from
the flat row index in-register (3 vreg ops for power-of-two grid dims)
and applies each arm as a shifted window read, so the only HBM traffic
is x (read via banded double-buffered DMA windows) and y: ~25x less
than the packed formats.

This is the TPU answer to hypre's structured-problem path (struct
BoxLoop matvec, ref: src/struct_mv/boxloop_cuda.h): the ij benchmark's
generated problems are stencils, and the setup is TOLD the stencil
(BoomerAMG.setup(fine_stencil=...)), exactly as hypre's struct
interface is.  Coarse levels (genuine variable-coefficient RAP
operators) keep the general packed formats.

Only the fine x-fastest ordering with power-of-two nx/ny (pallas path)
is specialized; other shapes fall back to the packed formats at setup.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["grid", "entries", "dtype_name"])
@dataclasses.dataclass(frozen=True)
class StencilOp:
    """grid: (nx, ny, nz) x-fastest; entries: (((dx,dy,dz), v), ...)."""

    grid: tuple
    entries: tuple
    dtype_name: str = "float32"

    @property
    def n_rows(self) -> int:
        nx, ny, nz = self.grid
        return nx * ny * nz

    @property
    def n_cols(self) -> int:
        return self.n_rows

    @property
    def shape(self):
        return (self.n_rows, self.n_rows)

    @property
    def nnz(self) -> int:
        nx, ny, nz = self.grid
        t = 0
        for (dx, dy, dz), v in self.entries:
            if v != 0.0:
                t += max(nx - abs(dx), 0) * max(ny - abs(dy), 0) \
                    * max(nz - abs(dz), 0)
        return t


def stencil_op(shape, entries, dtype=None) -> StencilOp:
    if dtype is None:
        from hypre_tpu.core.config import get_config

        dtype = get_config().np_real
    ents = tuple((tuple(d), float(v)) for d, v in entries if v != 0.0)
    return StencilOp(grid=tuple(int(s) for s in shape), entries=ents,
                     dtype_name=np.dtype(dtype).name)


def _is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0


def stencil_pallas_viable(op: StencilOp) -> bool:
    nx, ny, nz = op.grid
    return (_is_pow2(nx) and _is_pow2(ny) and nx * ny >= 128
            and op.n_rows % 1024 == 0 and op.n_rows >= (1 << 16))


def stencil_matvec_reference(op: StencilOp, x: jax.Array) -> jax.Array:
    """Shifted-FMA semantics on the 3D grid (CPU path / tests)."""
    nx, ny, nz = op.grid
    dt = jnp.dtype(op.dtype_name)
    u = x.reshape(nz, ny, nx).astype(dt)
    y = jnp.zeros_like(u)
    for (dx, dy, dz), v in op.entries:
        s = u
        for ax, d in ((2, dx), (1, dy), (0, dz)):
            if d == 0:
                continue
            pad = [(0, 0)] * 3
            if d > 0:
                pad[ax] = (0, d)
                s = jnp.pad(s, pad)
                s = jax.lax.slice_in_dim(s, d, s.shape[ax], axis=ax)
            else:
                pad[ax] = (-d, 0)
                s = jnp.pad(s, pad)
                s = jax.lax.slice_in_dim(s, 0, s.shape[ax] + d, axis=ax)
        y = y + jnp.asarray(v, dt) * s
    return y.reshape(-1)


def stencil_matvec(op: StencilOp, x: jax.Array) -> jax.Array:
    if jax.default_backend() in ("tpu", "axon") \
            and stencil_pallas_viable(op):
        return _stencil_matvec_pallas(op, x)
    return stencil_matvec_reference(op, x)


stencil_matvec_jit = jax.jit(stencil_matvec)


def _stencil_matvec_pallas(op: StencilOp, x: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hypre_tpu.ops.dia_pallas import (_band_plan, _pick_tile_rows,
                                          _shifted_read)

    nx, ny, nz = op.grid
    n = op.n_rows
    dt = jnp.dtype(op.dtype_name)
    offs = [(dx + nx * (dy + ny * dz), (dx, dy, dz), v)
            for (dx, dy, dz), v in op.entries]
    min_off = min(min(d for d, _, _ in offs), 0)
    lo_r = -(min_off // 128) if min_off < 0 else 0
    shifts = [((d + lo_r * 128) // 128, (d + lo_r * 128) % 128)
              for d, _, _ in offs]
    max_dr = max(dr for dr, _ in shifts)
    drs = [dr for dr, _ in shifts]

    tile_rows, plan = _pick_tile_rows(n, 0, drs, dt.itemsize)
    if plan is None:
        return stencil_matvec_reference(op, x)
    band_of, dlo, ebs, cum, WIN = plan
    n_bands = len(dlo)
    drel = [dr - dlo[band_of[k]] + cum[band_of[k]]
            for k, (dr, _) in enumerate(shifts)]

    n_tiles = -(-n // tile_rows)
    rows_per_tile = tile_rows // 128
    need_rows = n_tiles * rows_per_tile + max_dr + 2
    x_rows_total = max(need_rows, -(-(lo_r * 128 + n) // 128))
    xp = jnp.zeros((x_rows_total * 128,), dtype=dt)
    xp = xp.at[lo_r * 128: lo_r * 128 + n].set(x.astype(dt))
    x2d = xp.reshape(x_rows_total, 128)

    nblk = tile_rows // 1024
    lgx = nx.bit_length() - 1          # log2(nx)
    lgy = ny.bit_length() - 1

    def kernel_w(x_hbm, y_ref, win, sems):
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
        base_lin = t * tile_rows
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        l128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def do_block(j):
            lin = base_lin + j * 1024 + r8 * 128 + l128
            gx = jnp.bitwise_and(lin, nx - 1)
            gy = jnp.bitwise_and(jnp.right_shift(lin, lgx), ny - 1)
            gz = jnp.right_shift(lin, lgx + lgy)
            acc = jnp.zeros((8, 128), dtype=dt)
            for k, (d, (dx, dy, dz), v) in enumerate(offs):
                dr, dl = shifts[k]

                def read8(kk, _j=j, _k=k):
                    return win[pl.ds(off + drel[_k] + _j * 8 + kk, 8), :]

                s = _shifted_read(read8, 0, dl, dt)
                ok = None

                def _and(a, b):
                    return b if a is None else jnp.logical_and(a, b)

                if dx > 0:
                    ok = _and(ok, gx < nx - dx)
                elif dx < 0:
                    ok = _and(ok, gx >= -dx)
                if dy > 0:
                    ok = _and(ok, gy < ny - dy)
                elif dy < 0:
                    ok = _and(ok, gy >= -dy)
                if dz > 0:
                    ok = _and(ok, gz < nz - dz)
                elif dz < 0:
                    ok = _and(ok, gz >= -dz)
                if ok is not None:
                    s = jnp.where(ok, s, 0)
                acc = acc + jnp.asarray(v, dt) * s
            y_ref[0, pl.ds(j * 8, 8), :] = acc

        # partial unroll: Mosaic compile time scales with the traced
        # body; full unroll of 64 blocks x 7 arms took > 7 min to
        # lower+compile on the relay
        K = min(8, nblk)

        def blk_at(bb, _):
            for jj in range(K):
                do_block(bb * K + jj)
            return ()

        jax.lax.fori_loop(0, nblk // K, blk_at, ())

    y = pl.pallas_call(
        kernel_w,
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows_per_tile, 128), dt),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, rows_per_tile, 128),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * WIN, 128), dt),
            pltpu.SemaphoreType.DMA((2 * n_bands,)),
        ],
    )(x2d)
    return y.reshape(-1)[:n]
