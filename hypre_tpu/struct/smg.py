"""SMG — semicoarsening multigrid with line/plane smoothing.

TPU-native analog of hypre's SMG (ref: src/struct_ls/smg_setup.c:17,
smg_solve.c, smg_relax.c).  SMG's robustness comes from solving whole
lines (2D) or planes (3D) in the non-coarsened directions:

* 2D (batched): coarsen y; relaxation is ZEBRA line smoothing — all
  even-y lines solved simultaneously as batched tridiagonal systems in
  x (cyclic reduction, ops/tridiag.py), then all odd lines.  One zebra
  sweep is two embarrassingly parallel batched CR solves.
* 3D: coarsen z; "plane" relaxation solves each xy-plane approximately
  with one V-cycle of the batched 2D SMG — all planes of a zebra color
  advance together as one batch (the TPU formulation of hypre's
  smg_relax plane solves).

Interpolation uses the collapsed-stencil weights (as PFMG); hypre
computes SMG interpolation by relaxation on the lines — the collapsed
form is its exact limit for tensor-product operators and a documented
approximation otherwise.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.ops.tridiag import tridiag_solve
from hypre_tpu.struct.grid import StructMatrix, struct_matvec
from hypre_tpu.struct.pfmg import (
    _interp_apply, _restrict_apply, _interp_weights, _semicoarsen_rap,
    _stencil_to_dense, PfmgLevel,
)


@dataclasses.dataclass
class SmgConfig:
    max_levels: int = 25
    max_coarse_size: int = 64
    num_pre_relax: int = 1
    num_post_relax: int = 1
    tol: float = 1e-6
    max_iter: int = 100


@partial(jax.tree_util.register_dataclass,
         data_fields=["A", "wm", "wp", "line_a", "line_b", "line_c",
                      "plane2d"],
         meta_fields=["cdir", "fine_shape", "coarse_shape"])
@dataclasses.dataclass(frozen=True)
class SmgLevel:
    A: StructMatrix
    wm: Optional[jax.Array]
    wp: Optional[jax.Array]
    line_a: jax.Array            # x-line coefficients (west)
    line_b: jax.Array            # center
    line_c: jax.Array            # east
    plane2d: object              # nested 2D hierarchy for 3D levels
    cdir: int
    fine_shape: tuple
    coarse_shape: tuple


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "c_dense_inv"],
         meta_fields=["n_pre", "n_post", "dim"])
@dataclasses.dataclass(frozen=True)
class SmgHierarchy:
    levels: tuple
    c_dense_inv: jax.Array
    n_pre: int
    n_post: int
    dim: int                     # 2 or 3


class SMG:
    def __init__(self, config: SmgConfig | None = None):
        self.config = config or SmgConfig()
        self.hierarchy: SmgHierarchy | None = None

    def setup(self, A: StructMatrix) -> "SMG":
        from hypre_tpu.core.config import get_config

        real = get_config().np_real
        Ad = {off: np.asarray(A.coefs[k], dtype=real)
              for k, off in enumerate(A.offsets)}
        shape = tuple(A.shape)
        dim = 3 if shape[0] > 1 else 2
        self.hierarchy = _smg_build(Ad, shape, dim, self.config, real)
        return self

    def solve(self, b, x0=None, tol=None, max_iter=None):
        cfg = self.config
        h = self.hierarchy
        b = jnp.asarray(b)
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        return _smg_solve_jit(h, b, x,
                              float(tol if tol is not None else cfg.tol),
                              int(max_iter or cfg.max_iter))

    def precondition(self, r):
        return smg_cycle(self.hierarchy, r)


def _line_coefs(Ad, shape, real):
    """Extract x-line (west, center, east) coefficient arrays."""
    z = np.zeros(shape, dtype=real)
    a = Ad.get((0, 0, -1), z).copy()
    c = Ad.get((0, 0, 1), z).copy()
    b = Ad.get((0, 0, 0), np.ones(shape, dtype=real)).copy()
    return a, b, c


def _smg_build(Ad, shape, dim, cfg, real) -> SmgHierarchy:
    cdir = 0 if dim == 3 else 1     # coarsen z in 3D, y in 2D
    levels = []
    for _ in range(cfg.max_levels - 1):
        if int(np.prod(shape)) <= cfg.max_coarse_size \
                or shape[cdir] < 3:
            break
        wm, wp = _interp_weights(Ad, shape, cdir, real)
        Ac, cshape = _semicoarsen_rap(Ad, wm, wp, cdir, shape)
        levels.append(_smg_level(Ad, shape, cdir, wm, wp, cshape, real,
                                 dim, cfg))
        Ad, shape = Ac, cshape
    levels.append(_smg_level(Ad, shape, -1, None, None, shape, real,
                             dim, cfg))
    dense = _stencil_to_dense(Ad, shape, real)
    c_inv = jnp.asarray(np.linalg.inv(dense).astype(real))
    return SmgHierarchy(levels=tuple(levels), c_dense_inv=c_inv,
                        n_pre=cfg.num_pre_relax, n_post=cfg.num_post_relax,
                        dim=dim)


def _smg_level(Ad, shape, cdir, wm, wp, cshape, real, dim, cfg):
    offs = tuple(sorted(Ad.keys()))
    coefs = np.stack([Ad[o] for o in offs]).astype(real)
    la, lb, lc = _line_coefs(Ad, shape, real)
    lb = np.where(lb != 0, lb, 1.0)

    plane2d = None
    if dim == 3 and shape[0] > 1:
        # nested batched-2D hierarchy over z-planes for plane smoothing
        Ad2 = {off: c for off, c in Ad.items() if off[0] == 0}
        cfg2 = dataclasses.replace(cfg, max_coarse_size=max(
            cfg.max_coarse_size // 4, 16))
        plane2d = _smg_build(dict(Ad2), shape, 2, cfg2, real)

    return SmgLevel(
        A=StructMatrix(coefs=jnp.asarray(coefs), offsets=offs,
                       shape=tuple(shape)),
        wm=None if wm is None else jnp.asarray(wm.astype(real)),
        wp=None if wp is None else jnp.asarray(wp.astype(real)),
        line_a=jnp.asarray(la), line_b=jnp.asarray(lb),
        line_c=jnp.asarray(lc),
        plane2d=plane2d,
        cdir=cdir, fine_shape=tuple(shape), coarse_shape=tuple(cshape))


# ---------------------------------------------------------------------------
# relaxation
# ---------------------------------------------------------------------------

def _line_matvec(lvl: SmgLevel, u):
    """Apply only the x-line part of the stencil."""
    a, b, c = lvl.line_a, lvl.line_b, lvl.line_c
    left = jnp.pad(u[..., :-1], [(0, 0), (0, 0), (1, 0)])
    right = jnp.pad(u[..., 1:], [(0, 0), (0, 0), (0, 1)])
    return a * left + b * u + c * right


def _zebra_line_relax(lvl: SmgLevel, f, u, sweeps, up=False):
    """Zebra (red-black line) smoothing along y: solve all even-y
    x-lines as batched tridiagonal systems, then all odd-y lines.
    The up-sweep reverses the color order so pre+post relaxation is a
    symmetric operation (keeps CG happy, as the reference's symmetric
    SMG cycle does)."""
    if u is None:
        u = jnp.zeros_like(f)
    colors = (1, 0) if up else (0, 1)
    for _ in range(sweeps):
        for parity in colors:
            r = f - struct_matvec(lvl.A, u) + _line_matvec(lvl, u)
            sol = tridiag_solve(lvl.line_a, lvl.line_b, lvl.line_c, r)
            mask = (jnp.arange(f.shape[1]) % 2 == parity)[None, :, None]
            u = jnp.where(mask, sol, u)
    return u


def _plane_relax(lvl: SmgLevel, f, u, sweeps, up=False):
    """3D plane smoothing: one batched-2D SMG V-cycle per zebra color
    of z-planes (color order reversed on the up sweep)."""
    if u is None:
        u = jnp.zeros_like(f)
    colors = (1, 0) if up else (0, 1)
    for _ in range(sweeps):
        for parity in colors:
            r = f - struct_matvec(lvl.A, u)
            e = smg_cycle(lvl.plane2d, r)
            mask = (jnp.arange(f.shape[0]) % 2 == parity)[:, None, None]
            u = jnp.where(mask, u + e, u)
    return u


def _smg_relax(h: SmgHierarchy, lvl: SmgLevel, f, u, sweeps, up=False):
    if h.dim == 3 and lvl.plane2d is not None:
        return _plane_relax(lvl, f, u, sweeps, up)
    return _zebra_line_relax(lvl, f, u, sweeps, up)


# ---------------------------------------------------------------------------
# cycle
# ---------------------------------------------------------------------------

def smg_cycle(h: SmgHierarchy, b):
    levels = h.levels
    nl = len(levels)
    us, bs = [], [b]
    for l in range(nl - 1):
        lvl = levels[l]
        u = _smg_relax(h, lvl, bs[l], None, h.n_pre, up=False)
        r = bs[l] - struct_matvec(lvl.A, u)
        bs.append(_restrict_apply(_as_pfmg(lvl), r))
        us.append(u)

    lvl = levels[-1]
    uc = (h.c_dense_inv @ bs[-1].reshape(-1)).reshape(lvl.fine_shape)

    for l in range(nl - 2, -1, -1):
        lvl = levels[l]
        u = us[l] + _interp_apply(_as_pfmg(lvl), uc)
        u = _smg_relax(h, lvl, bs[l], u, h.n_post, up=True)
        uc = u
    return uc


def _as_pfmg(lvl: SmgLevel) -> PfmgLevel:
    """Adapter so PFMG's interp/restrict apply to SMG levels."""
    return PfmgLevel(A=lvl.A, wm=lvl.wm, wp=lvl.wp,
                     dinv=lvl.line_b, rb_mask=lvl.line_b,
                     cdir=lvl.cdir, fine_shape=lvl.fine_shape,
                     coarse_shape=lvl.coarse_shape)


@partial(jax.jit, static_argnames=("tol", "max_iter"))
def _smg_solve_jit(h: SmgHierarchy, b, x, tol, max_iter):
    A0 = h.levels[0].A
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(st):
        x, it, rnorm = st
        return (it < max_iter) & (rnorm / safe_b > tol)

    def body(st):
        x, it, _ = st
        r = b - struct_matvec(A0, x)
        x = x + smg_cycle(h, r)
        r2 = b - struct_matvec(A0, x)
        return x, it + 1, jnp.sqrt(jnp.vdot(r2, r2))

    r0 = b - struct_matvec(A0, x)
    st = (x, jnp.int32(0), jnp.sqrt(jnp.vdot(r0, r0)))
    x, it, rnorm = jax.lax.while_loop(cond, body, st)
    return x, it, rnorm / safe_b
