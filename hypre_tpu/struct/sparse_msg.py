"""SparseMSG — sparse multiple-semicoarsening multigrid.

TPU-native re-design of hypre's SparseMSG (ref: src/struct_ls/
sparse_msg_setup.c:20, sparse_msg_solve.c:26, sparse_msg.c).  The MSG
grid lattice is indexed by per-dimension coarsening levels
l = (lz, ly, lx); grid l is the fine grid semicoarsened l_d times in
each dimension d.  "Sparse" = the full lattice is only built up to
front |l|_1 <= jump (hypre's SetJump knob); past the jump front every
lattice grid continues as a single standard semicoarsening (PFMG-like)
chain in its locally strongest direction.

Corrections are combined with the MSG restriction/interpolation
weights: a child grid reached from k parents receives 1/k of each
parent's restricted residual, and a parent averages its children's
interpolated corrections (ref: sparse_msg_solve.c restrict/interp
weighting arrays).

All level operators are Galerkin semicoarsening RAPs (shared with
PFMG: pfmg._semicoarsen_rap), so the whole solver is the same shifted
-FMA XLA code path — one jitted program for the full cycle.
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
    PfmgLevel, _interp_apply, _interp_weights, _pfmg_relax, _pick_cdir,
    _restrict_apply, _semicoarsen_rap, _stencil_to_dense,
)


@dataclasses.dataclass
class SparseMSGConfig:
    jump: int = 1                 # full-MSG fronts (HYPRE_SparseMSGSetJump)
    max_levels: int = 25
    max_coarse_size: int = 64
    relax_type: int = 1           # 0 Jacobi, 1 wJacobi, 2 RB-GS
    jacobi_weight: float = 2.0 / 3.0
    num_pre_relax: int = 1
    num_post_relax: int = 1
    tol: float = 1e-6
    max_iter: int = 100


def _dir_level(Ad, shape, d, real):
    """One semicoarsening step of grid (Ad, shape) along axis d,
    returned as a PfmgLevel (so PFMG's relax/interp/restrict apply)."""
    wm, wp = _interp_weights(Ad, shape, d, real)
    Ac, cshape = _semicoarsen_rap(Ad, wm, wp, d, shape)
    offs = tuple(sorted(Ad.keys()))
    coefs = np.stack([Ad[o] for o in offs]).astype(real)
    diag = Ad.get((0, 0, 0))
    dinv = 1.0 / np.where(diag != 0, diag, 1.0)
    zz, yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                             np.arange(shape[2]), indexing="ij")
    lvl = PfmgLevel(
        A=StructMatrix(coefs=jnp.asarray(coefs), offsets=offs,
                       shape=tuple(shape)),
        wm=jnp.asarray(wm.astype(real)), wp=jnp.asarray(wp.astype(real)),
        dinv=jnp.asarray(dinv.astype(real)),
        rb_mask=jnp.asarray((zz + yy + xx) % 2 == 0),
        cdir=d, fine_shape=tuple(shape), coarse_shape=tuple(cshape))
    return lvl, Ac, cshape


class SparseMSG:
    """Create/Setup/Solve object (HYPRE_StructSparseMSG* surface)."""

    def __init__(self, config: SparseMSGConfig | None = None):
        self.config = config or SparseMSGConfig()
        self.grids = {}        # l-tuple -> dict(level=PfmgLevel|None,
        #                         children={d: l'}, n_parents=int)
        self.fronts = []       # list of list of l-tuples (by |l|_1)
        self.chains = {}       # jump-front l -> PFMG-style chain
        self._c_inv = {}

    def setup(self, A: StructMatrix) -> "SparseMSG":
        from hypre_tpu.core.config import get_config

        cfg = self.config
        real = get_config().np_real
        Ad0 = {off: np.asarray(A.coefs[k], dtype=real)
               for k, off in enumerate(A.offsets)}
        shape0 = tuple(A.shape)

        ops = {(0, 0, 0): (Ad0, shape0)}
        self.grids = {(0, 0, 0): {"children": {}, "n_parents": 1,
                                  "dirs": {}}}
        front = [(0, 0, 0)]
        self.fronts = [front]
        for _k in range(cfg.jump):
            nxt = {}
            for l in front:
                Ad, shape = ops[l]
                g = self.grids[l]
                for d in range(3):
                    if shape[d] < 3:
                        continue
                    lc = tuple(l[e] + (1 if e == d else 0)
                               for e in range(3))
                    lvl, Ac, cshape = _dir_level(Ad, shape, d, real)
                    g["dirs"][d] = lvl
                    g["children"][d] = lc
                    if lc not in self.grids:
                        self.grids[lc] = {"children": {}, "n_parents": 0,
                                          "dirs": {}}
                        ops[lc] = (Ac, cshape)
                        nxt[lc] = True
                    self.grids[lc]["n_parents"] += 1
            if not nxt:
                break
            front = list(nxt.keys())
            self.fronts.append(front)

        # past the jump front: standard semicoarsening chain per grid
        for l in self.fronts[-1]:
            Ad, shape = ops[l]
            chain = []
            for _ in range(cfg.max_levels):
                if int(np.prod(shape)) <= cfg.max_coarse_size:
                    break
                d = _pick_cdir(Ad, shape)
                if d is None or shape[d] < 3:
                    break
                lvl, Ad, shape = _dir_level(Ad, shape, d, real)
                chain.append(lvl)
            # coarsest: dense inverse
            offs = tuple(sorted(Ad.keys()))
            coefs = np.stack([Ad[o] for o in offs]).astype(real)
            tail = StructMatrix(coefs=jnp.asarray(coefs), offsets=offs,
                                shape=tuple(shape))
            dense = _stencil_to_dense(Ad, shape, real)
            self._c_inv[l] = (jnp.asarray(
                np.linalg.inv(dense).astype(real)), tail)
            self.chains[l] = chain
        return self

    # -- cycle ---------------------------------------------------------

    def _chain_vcycle(self, l, b):
        """PFMG V-cycle down the post-jump chain of grid l."""
        cfg = self.config
        chain = self.chains[l]
        us, bs = [], [b]
        for lvl in chain:
            u = _pfmg_relax(lvl, cfg.relax_type, cfg.jacobi_weight,
                            bs[-1], None, cfg.num_pre_relax)
            r = bs[-1] - struct_matvec(lvl.A, u)
            bs.append(_restrict_apply(lvl, r))
            us.append(u)
        c_inv, tail = self._c_inv[l]
        uc = (c_inv @ bs[-1].reshape(-1)).reshape(tail.shape)
        for i in range(len(chain) - 1, -1, -1):
            lvl = chain[i]
            u = us[i] + _interp_apply(lvl, uc)
            uc = _pfmg_relax(lvl, cfg.relax_type, cfg.jacobi_weight,
                             bs[i], u, cfg.num_post_relax)
        return uc

    def cycle(self, b):
        """One sparse-MSG cycle with zero initial guess (the
        preconditioner application; ref: sparse_msg_solve.c:26)."""
        cfg = self.config
        us = {}
        rhs = {(0, 0, 0): b}
        # down sweep over fronts
        for front in self.fronts[:-1]:
            for l in front:
                g = self.grids[l]
                lvls = g["dirs"]
                if not lvls:
                    continue
                any_lvl = next(iter(lvls.values()))
                u = _pfmg_relax(any_lvl, cfg.relax_type,
                                cfg.jacobi_weight, rhs[l], None,
                                cfg.num_pre_relax)
                us[l] = u
                r = rhs[l] - struct_matvec(any_lvl.A, u)
                for d, lc in g["children"].items():
                    w = 1.0 / self.grids[lc]["n_parents"]
                    rc = w * _restrict_apply(lvls[d], r)
                    rhs[lc] = rhs.get(lc, 0.0) + rc
        # jump front: chains
        for l in self.fronts[-1]:
            us[l] = self._chain_vcycle(l, rhs[l])
        # up sweep
        for front in reversed(self.fronts[:-1]):
            for l in front:
                g = self.grids[l]
                lvls = g["dirs"]
                if not lvls:
                    continue
                corr = 0.0
                nch = max(len(g["children"]), 1)
                for d, lc in g["children"].items():
                    corr = corr + _interp_apply(lvls[d], us[lc]) / nch
                u = us[l] + corr
                any_lvl = next(iter(lvls.values()))
                us[l] = _pfmg_relax(any_lvl, cfg.relax_type,
                                    cfg.jacobi_weight, rhs[l], u,
                                    cfg.num_post_relax)
        return us[(0, 0, 0)]

    def precondition(self, r):
        return self.cycle(r)

    # -- solve ---------------------------------------------------------

    def solve(self, b, x0=None, tol=None, max_iter=None):
        cfg = self.config
        b = jnp.asarray(b)
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        tol = float(tol if tol is not None else cfg.tol)
        max_iter = int(max_iter or cfg.max_iter)
        A0 = (next(iter(self.grids[(0, 0, 0)]["dirs"].values())).A
              if self.grids[(0, 0, 0)]["dirs"]
              else self._c_inv[(0, 0, 0)][1])

        @jax.jit
        def step(x, b):
            r = b - struct_matvec(A0, x)
            x = x + self.cycle(r)
            r2 = b - struct_matvec(A0, x)
            return x, jnp.sqrt(jnp.vdot(r2, r2))

        bnorm = float(jnp.sqrt(jnp.vdot(b, b))) or 1.0
        it = 0
        rel = 1.0
        while it < max_iter and rel > tol:
            x, rn = step(x, b)
            rel = float(rn) / bnorm
            it += 1
        return x, it, rel
