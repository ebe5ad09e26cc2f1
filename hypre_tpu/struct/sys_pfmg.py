"""SysPFMG — system (multi-variable) semicoarsening multigrid.

TPU-native re-design of hypre's SysPFMG (ref: src/sstruct_ls/
sys_pfmg_setup.c:35, sys_pfmg_solve.c, sys_semi_interp.c): the
semi-structured system solver for problems with several VARIABLES per
grid point (velocity components, multiphysics fields), all living on
the same structured grid, coupled through inter-variable stencils.

The operator is an nvars x nvars block matrix of stencils:
    A[vi][vj] : stencil coupling variable vj into variable vi's eqn.
SysPFMG = PFMG where
  * interpolation is BLOCK-DIAGONAL: P_v is the collapsed-stencil
    semicoarsening interp of the diagonal block A[v][v]
    (ref: sys_pfmg_setup_interp.c — per-variable struct interp),
  * the Galerkin product runs over every block:
        Ac[vi][vj] = R_vi A[vi][vj] P_vj
    (ref: sys_pfmg_setup_rap.c), and
  * relaxation is variable-wise weighted Jacobi / RB-GS on the
    diagonal blocks with the off-diagonal blocks folded into the
    residual (ref: sys_pfmg_relax.c).

This covers the inter-variable coupling the block-diagonal Split
solver cannot (Split ignores A[vi][vj], vi != vj, inside the
preconditioner).  Vectors are (nvars, nz, ny, nx) arrays; all kernels
are 3-D XLA expressions on the VPU.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.grid import StructMatrix, struct_matvec
from hypre_tpu.struct.pfmg import (
    PfmgConfig, _interp_weights, _pick_cdir, _sample,
    _stencil_to_dense,
)


@partial(jax.tree_util.register_dataclass,
         data_fields=["blocks", "wm", "wp", "dinv", "rb_mask"],
         meta_fields=["nvars", "cdir", "fine_shape", "coarse_shape"])
@dataclasses.dataclass(frozen=True)
class SysPfmgLevel:
    blocks: tuple       # len nvars*nvars of StructMatrix | None
    wm: tuple           # per-variable interp weights (None on coarsest)
    wp: tuple
    dinv: jax.Array     # (nvars, *shape) 1/diag of A[v][v]
    rb_mask: jax.Array
    nvars: int
    cdir: int
    fine_shape: tuple
    coarse_shape: tuple


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "c_dense_inv"],
         meta_fields=["relax_type", "weight", "n_pre", "n_post"])
@dataclasses.dataclass(frozen=True)
class SysPfmgHierarchy:
    levels: tuple
    c_dense_inv: jax.Array
    relax_type: int
    weight: float
    n_pre: int
    n_post: int


def _sys_matvec(lvl: SysPfmgLevel, u):
    """(nvars, *shape) block stencil matvec."""
    nv = lvl.nvars
    outs = []
    for vi in range(nv):
        acc = None
        for vj in range(nv):
            blk = lvl.blocks[vi * nv + vj]
            if blk is None:
                continue
            t = struct_matvec(blk, u[vj])
            acc = t if acc is None else acc + t
        outs.append(acc if acc is not None
                    else jnp.zeros(lvl.fine_shape, u.dtype))
    return jnp.stack(outs)


class SysPFMG:
    """Create/Setup/Solve object for block-stencil systems.

    blocks: {(vi, vj): StructMatrix} on a common (nz, ny, nx) grid —
    the sstruct matrix restricted to one part, all variables
    cell-centered (hypre's SysPFMG setup collapses variable types the
    same way, sys_pfmg_setup.c:200+).
    """

    def __init__(self, config: PfmgConfig | None = None):
        self.config = config or PfmgConfig()
        self.hierarchy: SysPfmgHierarchy | None = None
        self.level_shapes: list[tuple] = []

    def setup(self, blocks, nvars: int, shape) -> "SysPFMG":
        from hypre_tpu.core.config import get_config

        cfg = self.config
        real = get_config().np_real
        shape = tuple(shape)
        # host stencil dicts per block
        Ab = {}
        for (vi, vj), M in blocks.items():
            Ab[(vi, vj)] = {off: np.asarray(M.coefs[k], dtype=real)
                            for k, off in enumerate(M.offsets)}

        levels = []
        for _ in range(cfg.max_levels - 1):
            if int(np.prod(shape)) * nvars <= cfg.max_coarse_size:
                break
            # coarsening direction from the combined diagonal blocks
            comb = {}
            for v in range(nvars):
                for off, c in Ab.get((v, v), {}).items():
                    comb[off] = comb.get(off, 0) + np.abs(c)
            cdir = _pick_cdir(comb, shape)
            if cdir is None or shape[cdir] < 3:
                break
            wms, wps = [], []
            for v in range(nvars):
                wm, wp = _interp_weights(Ab[(v, v)], shape, cdir, real)
                wms.append(wm)
                wps.append(wp)
            Ac = {}
            cshape = None
            for (vi, vj), Ad in Ab.items():
                acc, cshape = _semicoarsen_rap_rect(
                    Ad, wms[vi], wps[vi], wms[vj], wps[vj], cdir, shape)
                if acc:
                    Ac[(vi, vj)] = acc
            levels.append(self._device_level(Ab, nvars, shape, cdir,
                                             wms, wps, cshape, real))
            Ab, shape = Ac, cshape

        levels.append(self._device_level(Ab, nvars, shape, -1, None,
                                         None, shape, real))
        n = int(np.prod(shape))
        dense = np.zeros((nvars * n, nvars * n), dtype=real)
        for (vi, vj), Ad in Ab.items():
            dense[vi * n:(vi + 1) * n, vj * n:(vj + 1) * n] = \
                _stencil_to_dense(Ad, shape, real)
        c_inv = jnp.asarray(np.linalg.inv(dense).astype(real))

        self.hierarchy = SysPfmgHierarchy(
            levels=tuple(levels), c_dense_inv=c_inv,
            relax_type=cfg.relax_type, weight=cfg.jacobi_weight,
            n_pre=cfg.num_pre_relax, n_post=cfg.num_post_relax)
        self.level_shapes = [lvl.fine_shape for lvl in levels]
        return self

    def _device_level(self, Ab, nvars, shape, cdir, wms, wps, cshape,
                      real):
        blocks = []
        for vi in range(nvars):
            for vj in range(nvars):
                Ad = Ab.get((vi, vj))
                if not Ad:
                    blocks.append(None)
                    continue
                offs = tuple(sorted(Ad.keys()))
                coefs = np.stack([Ad[o] for o in offs]).astype(real)
                blocks.append(StructMatrix(coefs=jnp.asarray(coefs),
                                           offsets=offs, shape=shape))
        dinv = np.ones((nvars,) + shape, dtype=real)
        for v in range(nvars):
            diag = Ab.get((v, v), {}).get((0, 0, 0))
            if diag is not None:
                dinv[v] = 1.0 / np.where(diag != 0, diag, 1.0)
        zz, yy, xx = np.meshgrid(np.arange(shape[0]),
                                 np.arange(shape[1]),
                                 np.arange(shape[2]), indexing="ij")
        rb = ((zz + yy + xx) % 2 == 0)
        return SysPfmgLevel(
            blocks=tuple(blocks),
            wm=(None if wms is None else
                tuple(jnp.asarray(w.astype(real)) for w in wms)),
            wp=(None if wps is None else
                tuple(jnp.asarray(w.astype(real)) for w in wps)),
            dinv=jnp.asarray(dinv), rb_mask=jnp.asarray(rb),
            nvars=nvars, cdir=cdir, fine_shape=tuple(shape),
            coarse_shape=tuple(cshape if cshape else shape))

    # -- solve ----------------------------------------------------------

    def solve(self, b, x0=None, tol=None, max_iter=None):
        """b: (nvars, nz, ny, nx).  Returns (x, iters, relres)."""
        cfg = self.config
        h = self.hierarchy
        b = jnp.asarray(b)
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        return _sys_pfmg_solve_jit(
            h, b, x, float(tol if tol is not None else cfg.tol),
            int(max_iter or cfg.max_iter))

    def precondition(self, r):
        return sys_pfmg_cycle(self.hierarchy, r)


def _semicoarsen_rap_rect(Ad, wmR, wpR, wmP, wpP, d, shape):
    """Galerkin coarse stencil Ac = R A P for semicoarsening along d,
    with DIFFERENT interp weights on the restriction (row variable)
    and prolongation (column variable) sides — the off-diagonal block
    case of sys_pfmg_setup_rap.c.  Degenerates to pfmg's
    _semicoarsen_rap when wmR is wmP."""
    n_f = shape[d]
    n_c = (n_f + 1) // 2
    cshape = list(shape)
    cshape[d] = n_c
    cshape = tuple(cshape)

    ones = np.ones(shape, dtype=next(iter(Ad.values())).dtype)
    r_terms = [(0, ones), (1, wmR), (-1, wpR)]
    out = {}
    for t, rw in r_terms:
        for off, ac in Ad.items():
            o_d = off[d]
            for s, pw in [(0, None), (-1, wmP), (1, wpP)]:
                tot = t + o_d + s
                if tot % 2 != 0:
                    continue
                if (s == 0) != ((t + o_d) % 2 == 0):
                    continue
                O_d = tot // 2
                c1 = _sample(rw * ac, d, t, (0, 0, 0), shape, n_c)
                if pw is None:
                    c2 = 1.0
                else:
                    shift_vec = tuple(off[e] if e != d else 0
                                      for e in range(3))
                    c2 = _sample(pw, d, t + o_d, shift_vec, shape, n_c)
                term = c1 * c2
                oc = tuple(O_d if e == d else off[e] for e in range(3))
                if oc in out:
                    out[oc] += term
                else:
                    out[oc] = term
    out = {o: c for o, c in out.items() if np.any(c)}
    return out, cshape


def _sys_relax(lvl: SysPfmgLevel, relax_type, weight, b, u, sweeps):
    for _ in range(sweeps):
        if relax_type in (0, 1):
            w = 1.0 if relax_type == 0 else weight
            if u is None:
                u = w * lvl.dinv * b
            else:
                u = u + w * lvl.dinv * (b - _sys_matvec(lvl, u))
        else:  # red-black GS over grid points (all vars per color)
            if u is None:
                u = jnp.zeros_like(b)
            for color in (True, False):
                mask = lvl.rb_mask == color
                upd = u + lvl.dinv * (b - _sys_matvec(lvl, u))
                u = jnp.where(mask[None], upd, u)
    return u


def _sys_interp(lvl: SysPfmgLevel, uc):
    from hypre_tpu.struct.pfmg import PfmgLevel, _interp_apply

    outs = []
    for v in range(lvl.nvars):
        plvl = PfmgLevel(A=None, wm=lvl.wm[v], wp=lvl.wp[v], dinv=None,
                         rb_mask=None, cdir=lvl.cdir,
                         fine_shape=lvl.fine_shape,
                         coarse_shape=lvl.coarse_shape)
        outs.append(_interp_apply(plvl, uc[v]))
    return jnp.stack(outs)


def _sys_restrict(lvl: SysPfmgLevel, rf):
    from hypre_tpu.struct.pfmg import PfmgLevel, _restrict_apply

    outs = []
    for v in range(lvl.nvars):
        plvl = PfmgLevel(A=None, wm=lvl.wm[v], wp=lvl.wp[v], dinv=None,
                         rb_mask=None, cdir=lvl.cdir,
                         fine_shape=lvl.fine_shape,
                         coarse_shape=lvl.coarse_shape)
        outs.append(_restrict_apply(plvl, rf[v]))
    return jnp.stack(outs)


def sys_pfmg_cycle(h: SysPfmgHierarchy, b):
    levels = h.levels
    nl = len(levels)
    us, bs = [], [b]
    for l in range(nl - 1):
        lvl = levels[l]
        u = _sys_relax(lvl, h.relax_type, h.weight, bs[l], None, h.n_pre)
        r = bs[l] - _sys_matvec(lvl, u)
        bs.append(_sys_restrict(lvl, r))
        us.append(u)

    lvl = levels[-1]
    bc = bs[-1].reshape(-1)
    uc = (h.c_dense_inv @ bc).reshape((lvl.nvars,) + lvl.fine_shape)

    for l in range(nl - 2, -1, -1):
        lvl = levels[l]
        u = us[l] + _sys_interp(lvl, uc)
        u = _sys_relax(lvl, h.relax_type, h.weight, bs[l], u, h.n_post)
        uc = u
    return uc


@partial(jax.jit, static_argnames=("tol", "max_iter"))
def _sys_pfmg_solve_jit(h: SysPfmgHierarchy, b, x, tol, max_iter):
    lvl0 = h.levels[0]
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(st):
        x, it, rnorm = st
        return (it < max_iter) & (rnorm / safe_b > tol)

    def body(st):
        x, it, _ = st
        r = b - _sys_matvec(lvl0, x)
        x = x + sys_pfmg_cycle(h, r)
        r2 = b - _sys_matvec(lvl0, x)
        return x, it + 1, jnp.sqrt(jnp.vdot(r2, r2))

    r0 = b - _sys_matvec(lvl0, x)
    st = (x, jnp.int32(0), jnp.sqrt(jnp.vdot(r0, r0)))
    x, it, rnorm = jax.lax.while_loop(cond, body, st)
    return x, it, rnorm / safe_b
