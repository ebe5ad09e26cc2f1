"""Structured-grid matrix/vector machinery.

TPU-native analog of struct_mv (ref: src/struct_mv/struct_matrix.h:
21-60, struct_matvec.c:96).  A structured vector IS a 3-D jnp array
(nz, ny, nx); a structured matrix is a stencil: a dict mapping offsets
(dz, dy, dx) -> coefficient arrays over the grid.  The BoxLoop kernel
abstraction (ref: src/struct_mv/boxloop_cuda.h:264-345) becomes plain
XLA: a stencil matvec is a handful of shifted fused multiply-adds, and
Dirichlet truncation is handled by zero padding.

Axis order: arrays are indexed [z, y, x] so x (the unit-stride
direction) lands on TPU lanes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["coefs"],
         meta_fields=["offsets", "shape", "periodic"])
@dataclasses.dataclass(frozen=True)
class StructMatrix:
    """coefs: real[n_offsets, nz, ny, nx]; offsets: tuple[(dz,dy,dx)].

    coefs[k][z,y,x] multiplies u[z+dz, y+dy, x+dx]; entries reaching
    outside the grid must have zero coefficients (setup enforces it).
    periodic[d] != 0 makes axis d wrap (hypre StructGridSetPeriodic,
    ref: src/struct_mv/struct_grid.h periodic member): shifts along
    that axis become circular rolls instead of zero-filled shifts.
    """

    coefs: jax.Array
    offsets: tuple
    shape: tuple  # (nz, ny, nx)
    periodic: tuple = (0, 0, 0)

    @property
    def n_rows(self):
        nz, ny, nx = self.shape
        return nz * ny * nx


def _shift3(u, off, periodic=(0, 0, 0)):
    """u evaluated at index + off; zero-filled outside the grid on
    non-periodic axes, circularly wrapped on periodic ones."""
    per_axes = [d for d in range(3) if periodic[d] and off[d]]
    if per_axes:
        u = jnp.roll(u, shift=[-off[d] for d in per_axes],
                     axis=per_axes)
    pads = []
    slices = []
    for ax, n in enumerate(u.shape):
        d = 0 if (periodic[ax] and off[ax]) else off[ax]
        lo = max(0, -d)
        hi = max(0, d)
        pads.append((lo, hi))
        slices.append(slice(hi, n + hi))
    up = jnp.pad(u, pads)
    return up[tuple(slices)]


def struct_matvec(A: StructMatrix, u: jax.Array) -> jax.Array:
    """y = A u (hypre_StructMatvecCompute analog)."""
    per = getattr(A, "periodic", (0, 0, 0))
    y = jnp.zeros_like(u)
    for k, off in enumerate(A.offsets):
        y = y + A.coefs[k] * _shift3(u, off, per)
    return y


def struct_matrix_from_stencil(shape, entries, dtype=np.float64,
                               variable=None) -> StructMatrix:
    """Build a constant-coefficient stencil matrix with Dirichlet
    truncation (entries reaching outside get zero coefficient).

    entries: [((dz,dy,dx), value)]; variable: optional dict of
    offset -> ndarray overriding constants.
    """
    nz, ny, nx = shape
    offsets = tuple(off for off, _ in entries)
    coefs = np.zeros((len(entries), nz, ny, nx), dtype=dtype)
    for k, (off, v) in enumerate(entries):
        if variable and off in variable:
            c = np.asarray(variable[off], dtype=dtype)
        else:
            c = np.full(shape, v, dtype=dtype)
        dz, dy, dx = off
        # zero out coefficients whose target leaves the grid
        zs = slice(max(0, -dz), nz - max(0, dz))
        ys = slice(max(0, -dy), ny - max(0, dy))
        xs = slice(max(0, -dx), nx - max(0, dx))
        mask = np.zeros(shape, dtype=bool)
        mask[zs, ys, xs] = True
        coefs[k] = np.where(mask, c, 0.0)
    return StructMatrix(coefs=jnp.asarray(coefs), offsets=offsets,
                        shape=tuple(shape))


def struct_laplacian(nz, ny, nx, cz=1.0, cy=1.0, cx=1.0,
                     dtype=np.float64) -> StructMatrix:
    """7-pt (or lower-D) struct Laplacian matching gen.laplacian."""
    diag = 0.0
    entries = []
    if nx > 1:
        diag += 2.0 * cx
        entries += [((0, 0, -1), -cx), ((0, 0, 1), -cx)]
    if ny > 1:
        diag += 2.0 * cy
        entries += [((0, -1, 0), -cy), ((0, 1, 0), -cy)]
    if nz > 1:
        diag += 2.0 * cz
        entries += [((-1, 0, 0), -cz), ((1, 0, 0), -cz)]
    entries.append(((0, 0, 0), diag))
    return struct_matrix_from_stencil((nz, ny, nx), entries, dtype)


# ---------------------------------------------------------------------------
# host-side stencil algebra (setup phase)
# ---------------------------------------------------------------------------

def host_coefs(A: StructMatrix):
    return {off: np.asarray(A.coefs[k]) for k, off in enumerate(A.offsets)}


def _np_shift(c, off, shape):
    """numpy version of _shift3 for host-side stencil products."""
    dz, dy, dx = off
    out = np.zeros(shape, dtype=c.dtype)
    src = []
    dst = []
    for d, n in zip((dz, dy, dx), shape):
        if d >= 0:
            src.append(slice(d, n))
            dst.append(slice(0, n - d))
        else:
            src.append(slice(0, n + d))
            dst.append(slice(-d, n))
    out[tuple(dst)] = c[tuple(src)]
    return out


def stencil_multiply(A: dict, B: dict, shape) -> dict:
    """C = A·B on stencil dicts: C[oa+ob][i] += A[oa][i]·B[ob][i+oa]
    (variable-coefficient stencil composition; host numpy).

    This is the struct analog of the fused stencil RAP computations
    (ref: src/struct_ls/pfmg3_setup_rap.c) in general form.
    """
    out = {}
    for oa, ca in A.items():
        for ob, cb in B.items():
            oc = tuple(x + y for x, y in zip(oa, ob))
            term = ca * _np_shift(cb, oa, shape)
            if oc in out:
                out[oc] = out[oc] + term
            else:
                out[oc] = term
    return {o: c for o, c in out.items() if np.any(c)}
