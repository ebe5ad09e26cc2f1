"""Mesh-sharded struct layer: distributed PFMG / struct kernels.

The reference distributes struct grids by boxes with an explicit ghost
exchange (ref: src/struct_mv/struct_communication.h:80 CommPkg;
pfmg_setup.c:63 distributed setup).  The TPU-native equivalent is the
sharding compiler path: a struct vector IS a (nz, ny, nx) array
sharded along z (`P('p', None, None)`), every stencil op is a shifted
slice, and XLA's SPMD partitioner materializes the +-1-plane halo
exchanges as `collective-permute` on the ICI — the CommPkg written by
the compiler instead of by hand.  tests/test_par_struct.py asserts the
compiled HLO really contains collective-permutes (halo traffic =
O(face), not an all-gather of the grid).

Levels whose z extent falls below the shard count switch to
replicated storage (their footprint is tiny), mirroring hypre's
inactive-process coarse levels (ref: pfmg_setup.c coarsening bound).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.struct.grid import StructMatrix, struct_matvec
from hypre_tpu.struct.pfmg import (
    PFMG, PfmgConfig, PfmgHierarchy, _interp_apply, _pfmg_relax,
    _restrict_apply,
)


def _level_spec(shape, n_shards, nd_extra=0):
    """Shard z when it still has >= 1 plane per shard, else replicate.
    nd_extra leading axes (e.g. the stencil-offset axis) stay whole."""
    if shape[0] >= n_shards:
        return P(*([None] * nd_extra), "p", None, None)
    return P(*([None] * (nd_extra + 3)))


class ParPFMG:
    """Distributed PFMG: setup is the host geometric setup of PFMG;
    the hierarchy is placed sharded over the mesh and the entire
    solve compiles to one SPMD program."""

    def __init__(self, mesh: Mesh, config: PfmgConfig | None = None,
                 axis_name: str = "p"):
        self.mesh = mesh
        self.axis_name = axis_name
        self.inner = PFMG(config)
        self.level_specs: list = []

    @property
    def n_shards(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    @property
    def hierarchy(self):
        return self.inner.hierarchy

    def setup(self, A: StructMatrix) -> "ParPFMG":
        self.inner.setup(A)
        h = self.inner.hierarchy
        ns = self.n_shards
        placed = []
        specs = []
        for lvl in h.levels:
            spec_v = _level_spec(lvl.fine_shape, ns)
            spec_c = _level_spec(lvl.fine_shape, ns, nd_extra=1)
            specs.append(spec_v)

            def put(a, s):
                if a is None:
                    return None
                return jax.device_put(a, NamedSharding(self.mesh, s))

            placed.append(dataclasses.replace(
                lvl,
                A=StructMatrix(coefs=put(lvl.A.coefs, spec_c),
                               offsets=lvl.A.offsets, shape=lvl.A.shape),
                wm=put(lvl.wm, spec_v), wp=put(lvl.wp, spec_v),
                dinv=put(lvl.dinv, spec_v),
                rb_mask=put(lvl.rb_mask, spec_v)))
        c_inv = jax.device_put(
            h.c_dense_inv, NamedSharding(self.mesh, P(None, None)))
        self.inner.hierarchy = dataclasses.replace(
            h, levels=tuple(placed), c_dense_inv=c_inv)
        self.level_specs = specs
        return self

    # -- solve --------------------------------------------------------

    def cycle_fn(self):
        """The sharded V-cycle as a function (for HLO inspection and
        as a Krylov preconditioner)."""
        specs = self.level_specs
        mesh = self.mesh

        def cyc(h, b):
            return _par_pfmg_cycle(h, b, tuple(specs), mesh)

        return cyc

    def solve(self, b, x0=None, tol=None, max_iter=None):
        cfg = self.inner.config
        h = self.inner.hierarchy
        b = jax.device_put(
            jnp.asarray(b), NamedSharding(self.mesh, self.level_specs[0]))
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        fn = _par_solve_cached(self.mesh, tuple(self.level_specs),
                               float(tol if tol is not None else cfg.tol),
                               int(max_iter or cfg.max_iter))
        x, it, rel = fn(h, b, x)
        return x, int(it), float(rel)


def _par_pfmg_cycle(h: PfmgHierarchy, b, specs, mesh):
    """pfmg_cycle with per-level sharding constraints: restriction and
    interpolation re-anchor vectors to each level's layout so GSPMD
    keeps halo traffic at faces instead of re-gathering."""
    def anchor(v, l):
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, specs[l]))

    levels = h.levels
    nl = len(levels)
    us, bs = [], [b]
    for l in range(nl - 1):
        lvl = levels[l]
        u = _pfmg_relax(lvl, h.relax_type, h.weight, bs[l], None,
                        h.n_pre)
        r = bs[l] - struct_matvec(lvl.A, u)
        bs.append(anchor(_restrict_apply(lvl, r), l + 1))
        us.append(u)

    lvl = levels[-1]
    bc = bs[-1].reshape(-1)
    uc = (h.c_dense_inv @ bc).reshape(lvl.fine_shape)

    for l in range(nl - 2, -1, -1):
        lvl = levels[l]
        u = us[l] + anchor(_interp_apply(lvl, uc), l)
        u = _pfmg_relax(lvl, h.relax_type, h.weight, bs[l], u, h.n_post)
        uc = u
    return uc


_solve_cache = {}


def _par_solve_cached(mesh, specs, tol, max_iter):
    key = (id(mesh), specs, tol, max_iter)
    if key in _solve_cache:
        return _solve_cache[key]

    @jax.jit
    def run(h, b, x):
        A0 = h.levels[0].A
        bnorm = jnp.sqrt(jnp.vdot(b, b))
        safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

        def cond(st):
            x, it, rnorm = st
            return (it < max_iter) & (rnorm / safe_b > tol)

        def body(st):
            x, it, _ = st
            r = b - struct_matvec(A0, x)
            x = x + _par_pfmg_cycle(h, r, specs, mesh)
            r2 = b - struct_matvec(A0, x)
            return x, it + 1, jnp.sqrt(jnp.vdot(r2, r2))

        r0 = b - struct_matvec(A0, x)
        st = (x, jnp.int32(0), jnp.sqrt(jnp.vdot(r0, r0)))
        x, it, rnorm = jax.lax.while_loop(cond, body, st)
        return x, it, rnorm / safe_b

    _solve_cache[key] = run
    return run


def _place_tree(mesh, tree, n_shards):
    """Shard every array leaf along its z axis (ndim-3) when that axis
    still has >= 1 plane per shard; replicate otherwise.  One rule
    covers SMG's line coefficients, nested 2-D plane hierarchies, and
    SysPFMG's block stencils, because every struct array is
    (..., nz, ny, nx) (ref: hypre distributes the same data by boxes,
    struct_communication.h:80 — here the layout IS the CommPkg)."""
    def put(a):
        if a is None or not hasattr(a, "ndim") or a.ndim < 2:
            return a
        if a.ndim >= 3 and a.shape[a.ndim - 3] >= n_shards:
            spec = P(*([None] * (a.ndim - 3)), "p", None, None)
        else:
            spec = P(*([None] * a.ndim))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


class ParSMG:
    """Distributed SMG (ref: smg_setup.c:17 / smg_solve.c under MPI):
    host geometric setup, hierarchy placed z-sharded over the mesh,
    cycle compiled as one SPMD program.  3-D SMG's plane relaxation is
    embarrassingly parallel across the sharded z axis (each shard owns
    whole planes), so only restriction/interp/residual faces move."""

    def __init__(self, mesh: Mesh, config=None):
        from hypre_tpu.struct.smg import SMG
        self.mesh = mesh
        self.inner = SMG(config)

    @property
    def n_shards(self):
        return int(np.prod(list(self.mesh.shape.values())))

    def setup(self, A: StructMatrix) -> "ParSMG":
        self.inner.setup(A)
        self.inner.hierarchy = _place_tree(
            self.mesh, self.inner.hierarchy, self.n_shards)
        return self

    def solve(self, b, x0=None, tol=None, max_iter=None):
        from hypre_tpu.struct.smg import _smg_solve_jit
        cfg = self.inner.config
        h = self.inner.hierarchy
        b = jax.device_put(jnp.asarray(b), NamedSharding(
            self.mesh, _level_spec(h.levels[0].fine_shape,
                                   self.n_shards)))
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        x, it, rel = _smg_solve_jit(
            h, b, x, float(tol if tol is not None else cfg.tol),
            int(max_iter or cfg.max_iter))
        return x, int(it), float(rel)

    def precondition(self, r):
        from hypre_tpu.struct.smg import smg_cycle
        return smg_cycle(self.inner.hierarchy, r)


class ParSysPFMG:
    """Distributed SysPFMG (ref: sys_pfmg_setup.c under MPI): the
    block-stencil hierarchy placed z-sharded; the (nvars, nz, ny, nx)
    unknowns shard on z so all inter-variable coupling is local."""

    def __init__(self, mesh: Mesh, config=None):
        from hypre_tpu.struct.sys_pfmg import SysPFMG
        self.mesh = mesh
        self.inner = SysPFMG(config)

    @property
    def n_shards(self):
        return int(np.prod(list(self.mesh.shape.values())))

    def setup(self, blocks, nvars: int, shape) -> "ParSysPFMG":
        self.inner.setup(blocks, nvars, shape)
        self.inner.hierarchy = _place_tree(
            self.mesh, self.inner.hierarchy, self.n_shards)
        return self

    def solve(self, b, x0=None, tol=None, max_iter=None):
        h = self.inner.hierarchy
        shape = h.levels[0].fine_shape
        b = jax.device_put(jnp.asarray(b), NamedSharding(
            self.mesh, _level_spec(shape, self.n_shards, nd_extra=1)))
        return self.inner.solve(b, x0=x0, tol=tol, max_iter=max_iter)


def par_struct_pcg(par: ParPFMG, b, tol=1e-7, max_iter=200):
    """CG preconditioned by the sharded PFMG cycle (the struct-driver
    solver-10/11 analog on the mesh)."""
    from hypre_tpu.solvers.krylov import pcg

    h = par.inner.hierarchy
    b = jax.device_put(
        jnp.asarray(b), NamedSharding(par.mesh, par.level_specs[0]))
    A0 = h.levels[0].A
    cyc = par.cycle_fn()
    res = pcg(lambda v: struct_matvec(A0, v), b,
              M=lambda r: cyc(h, r), tol=tol, max_iter=max_iter)
    return res
