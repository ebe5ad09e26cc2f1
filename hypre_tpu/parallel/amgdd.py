"""AMG-DD: communication-avoiding composite-grid AMG on the mesh.

TPU-native re-design of hypre's BoomerAMG-DD (ref: src/parcsr_ls/
par_amgdd_setup.c:22 composite-grid construction, par_amgdd_fac_cycle.c
FAC cycles, par_amgdd_solve.c outer iteration; the algorithm is
Mitchell/Manteuffel/McCormick's AMG-DD).

Idea: after a standard AMG setup, each shard OWNS its rows at every
level and additionally stores a PADDING region (distance-eta
neighborhood) plus one GHOST layer per level — the composite grid.
The solve phase then iterates:

  1. one global residual  r = b - A x          (distributed matvec)
  2. one halo gather of r onto each shard's composite fine dofs
     — the ONLY communication of the iteration —
  3. every shard runs FAC V-cycles on its LOCAL composite hierarchy
     (relaxation only on real dofs, local restriction/interpolation,
     exact coarsest solve — the coarsest level is fully replicated in
     every composite grid)
  4. x += owned part of the local update      (no communication:
     owners keep their own dofs)

Communication per iteration: ONE fine-level exchange, vs one exchange
per level per cycle for standard AMG — the communication-avoiding
trade AMG-DD exists for.

Setup here is host-side (numpy BFS over the level graphs — the analog
of hypre's recursive composite-grid packing) producing static
per-shard padded blocks; the entire outer solve is one SPMD program
(shard_map: ppermute halo + per-shard dense-of-ELL FAC cycles + psum
norms).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, PartitionSpec as P

from hypre_tpu.parallel.comm import CommPkg, build_comm_pkg, exchange
from hypre_tpu.parallel.partition import RowPartition


@partial(jax.tree_util.register_dataclass,
         data_fields=["a_cols", "a_vals", "dinv", "real_mask",
                      "own_mask", "p_cols", "p_vals", "r_cols",
                      "r_vals"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class CompositeLevel:
    """One level of every shard's composite hierarchy (stacked).

    a_cols/a_vals: (ns, w, m)    composite operator, LOCAL comp ids
    dinv:          (ns, m)       l1-Jacobi weights
    real_mask:     (ns, m)       1.0 on real (smoothed) dofs
    own_mask:      (ns, m)       1.0 on owned dofs
    p_cols/p_vals: (ns, wp, m)   interpolation (rows fine comp,
                                 cols coarse comp ids), absent on the
                                 coarsest level (empty arrays)
    r_cols/r_vals: (ns, wr, mc)  restriction (rows coarse comp)
    """

    a_cols: jax.Array
    a_vals: jax.Array
    dinv: jax.Array
    real_mask: jax.Array
    own_mask: jax.Array
    p_cols: jax.Array
    p_vals: jax.Array
    r_cols: jax.Array
    r_vals: jax.Array


class AmgDD:
    """BoomerAMGDD analog: Create/Setup/Solve over a 1-D mesh."""

    def __init__(self, mesh: Mesh, config=None, padding: int = 1,
                 num_ghost_layers: int = 1, fac_cycles: int = 1,
                 axis_name: str = "p"):
        from hypre_tpu.solvers.amg import AmgConfig

        self.mesh = mesh
        self.axis_name = axis_name
        self.config = config or AmgConfig()
        self.padding = padding            # ref: par_amgdd.c SetPadding
        self.num_ghost_layers = num_ghost_layers
        self.fac_cycles = fac_cycles
        self.levels: list[CompositeLevel] = []
        self.comm: CommPkg | None = None
        self.fine_part: RowPartition | None = None
        self.comp_gids0: list[np.ndarray] = []

    @property
    def n_shards(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    # -- setup --------------------------------------------------------

    def setup(self, A: sp.csr_matrix) -> "AmgDD":
        from hypre_tpu.solvers.amg import build_host_hierarchy
        from hypre_tpu.setup.l1norms import l1_norms

        cfg = self.config
        ns = self.n_shards
        levels_host, Ac = build_host_hierarchy(A, cfg)
        # global level list: [(A_l, P_l, R_l)], coarsest Ac
        As = [lvl[0].tocsr() for lvl in levels_host] + [Ac.tocsr()]
        Ps = [lvl[1].tocsr() for lvl in levels_host]
        nl = len(As)
        part = RowPartition.create(A.shape[0], ns)
        self.fine_part = part

        # --- composite index sets per shard, per level --------------
        # seed_0 = owned rows; padding = eta BFS rings in A_l; ghost =
        # one more ring (rows kept, not smoothed); the coarse seed is
        # the owned coarse rows plus the coarse image of the fine
        # composite (closure under P, par_amgdd_setup.c's
        # RecursivelyBuildPsiComposite analog)
        eta = self.padding
        gl = self.num_ghost_layers
        comp = [[None] * nl for _ in range(ns)]
        real = [[None] * nl for _ in range(ns)]
        parts = [RowPartition.create(M.shape[0], ns) for M in As]
        for p in range(ns):
            seed = np.arange(part.n_local * p,
                             min(part.n_local * (p + 1), A.shape[0]))
            for l in range(nl):
                Al = As[l]
                if l == nl - 1:
                    # every composite grid replicates the WHOLE
                    # coarsest level (hypre's agglomerated coarse
                    # grid) so the bottom solve is globally exact
                    full = np.arange(Al.shape[0])
                    pad_set = full
                else:
                    pad_set = _bfs(Al, seed, eta)
                    full = _bfs(Al, pad_set, gl)
                comp[p][l] = full
                real[p][l] = pad_set
                if l < nl - 1:
                    Pl = Ps[l]
                    img = np.unique(Pl[full].indices)
                    r0 = parts[l + 1].n_local * p
                    r1 = min(parts[l + 1].n_local * (p + 1),
                             As[l + 1].shape[0])
                    seed = np.union1d(np.arange(r0, r1), img)

        # --- pack static per-shard blocks ----------------------------
        real_np = np.dtype(np.float64)
        stacked = []
        for l in range(nl):
            m = max(len(comp[p][l]) for p in range(ns))
            mc = 1 if l == nl - 1 else max(
                len(comp[p][l + 1]) for p in range(ns))
            dl1 = l1_norms(As[l], 1)
            blocks = []
            for p in range(ns):
                ids = comp[p][l]
                lut = _lut(As[l].shape[0], ids)
                Ablk = As[l][ids]
                ac, av = _ell_local(Ablk, lut, m, real_np)
                dinv = np.zeros(m)
                dinv[:len(ids)] = 1.0 / dl1[ids]
                rm = np.zeros(m)
                rm[:len(ids)] = np.isin(ids, real[p][l]).astype(float)
                om = np.zeros(m)
                own = (ids // parts[l].n_local) == p
                om[:len(ids)] = own.astype(float)
                if l < nl - 1:
                    ids_c = comp[p][l + 1]
                    lut_c = _lut(As[l + 1].shape[0], ids_c)
                    pc, pv = _ell_local(Ps[l][ids], lut_c, m, real_np)
                    RT = Ps[l].T.tocsr()
                    rc, rv = _ell_local(RT[ids_c], lut, mc, real_np)
                else:
                    pc = np.full((m, 1), -1, np.int32)
                    pv = np.zeros((m, 1))
                    rc = np.full((1, 1), -1, np.int32)
                    rv = np.zeros((1, 1))
                blocks.append((ac, av, dinv, rm, om, pc, pv, rc, rv))

            def stk(k, fill):
                arrs = [b[k] for b in blocks]
                if arrs[0].ndim == 1:
                    return jnp.asarray(np.stack(arrs))
                w_max = max(a.shape[0] for a in arrs)
                out = []
                for a in arrs:
                    if a.shape[0] < w_max:
                        pad = np.full((w_max - a.shape[0], a.shape[1]),
                                      fill, a.dtype)
                        a = np.concatenate([a, pad], axis=0)
                    out.append(a)
                return jnp.asarray(np.stack(out))

            fills = [-1, 0, 0, 0, 0, -1, 0, -1, 0]
            stacked.append(CompositeLevel(
                *[stk(k, fills[k]) for k in range(9)]))
        self.levels = stacked

        # exact replicated coarsest solve (hypre solves the
        # agglomerated coarsest grid directly, par_amgdd_fac_cycle.c):
        # dense inverse of the <= max_coarse_size global coarsest
        # operator, identity-embedded to the padded composite width
        nc = As[-1].shape[0]
        m_co = int(stacked[-1].a_cols.shape[2])
        Mco = np.eye(m_co)
        Mco[:nc, :nc] = As[-1].toarray()
        self._coarse_inv = jnp.asarray(np.linalg.inv(Mco))

        # --- fine-level composite gather comm ------------------------
        self.comp_gids0 = [comp[p][0] for p in range(ns)]
        ghost_lists = []
        for p in range(ns):
            ids = self.comp_gids0[p]
            own = (ids // part.n_local) == p
            ghost_lists.append(np.sort(ids[~own]).astype(np.int64))
        self.comm = build_comm_pkg(ghost_lists, part, real_np,
                                   axis_name=self.axis_name)
        # scatter map: comp slot <- own local index or ghost slot
        maps = np.full((ns, max(len(c) for c in self.comp_gids0)),
                       -1, np.int32)
        for p in range(ns):
            ids = self.comp_gids0[p]
            own = (ids // part.n_local) == p
            loc = ids - p * part.n_local
            gslot = np.searchsorted(ghost_lists[p], ids)
            maps[p, :len(ids)] = np.where(own, loc,
                                          part.n_local + gslot)
        self._comp_map = jnp.asarray(maps)
        # inverse: local row -> comp slot (for the owned update)
        inv = np.zeros((ns, part.n_local), np.int32)
        for p in range(ns):
            ids = self.comp_gids0[p]
            own_pos = np.flatnonzero((ids // part.n_local) == p)
            inv[p, ids[own_pos] - p * part.n_local] = own_pos
        self._own_slot = jnp.asarray(inv)

        # distributed fine operator for the outer residual
        from hypre_tpu.parallel.parcsr import parcsr_from_scipy

        self.Apar = parcsr_from_scipy(A, ns, real_np)
        return self

    # -- solve --------------------------------------------------------

    def solve(self, b, tol: float = 1e-8, max_iter: int = 100):
        """Outer AMG-DD iteration (ref: par_amgdd_solve.c): one
        residual + ONE halo gather per iteration, then local FAC."""
        from hypre_tpu.parallel.parcsr import (
            par_matvec, shard_vector, unshard_vector,
        )

        ns = self.n_shards
        part = self.fine_part
        axis = self.axis_name
        levels = tuple(self.levels)
        comm = self.comm
        Apar = self.Apar
        comp_map = self._comp_map
        own_slot = self._own_slot
        fac_cycles = self.fac_cycles
        coarse_inv = self._coarse_inv
        b_sh = shard_vector(np.asarray(b, np.float64), part)

        def kernel(levels, cinv, Ap, cmap, oslot, si, sm, ri, b_loc):
            b_l = b_loc[0]
            cmap, oslot = cmap[0], oslot[0]
            cpl = dataclasses.replace(comm, send_idx=si, send_mask=sm,
                                      recv_idx=ri)
            bn = jnp.sqrt(jax.lax.psum(jnp.vdot(b_l, b_l), axis))
            safe = jnp.where(bn > 0, bn, 1.0)

            def outer(st):
                x, it, rn = st
                r = b_l - par_matvec(Ap, x)
                # THE one communication: r onto the composite grid
                rext = jnp.concatenate([r, exchange(r, cpl)])
                r_comp = jnp.where(cmap >= 0,
                                   jnp.take(rext,
                                            jnp.where(cmap >= 0, cmap,
                                                      0)), 0.0)
                u = _fac_solve(levels, r_comp, fac_cycles, cinv)
                x = x + jnp.take(u, oslot)
                r2 = b_l - par_matvec(Ap, x)
                rn = jnp.sqrt(jax.lax.psum(jnp.vdot(r2, r2), axis))
                return x, it + 1, rn

            def cond(st):
                x, it, rn = st
                return (it < max_iter) & (rn / safe > tol) \
                    & jnp.isfinite(rn)

            r0 = b_l
            st = (jnp.zeros_like(b_l), jnp.int32(0),
                  jnp.sqrt(jax.lax.psum(jnp.vdot(r0, r0), axis)))
            x, it, rn = jax.lax.while_loop(cond, outer, st)
            return x[None], it, rn / safe

        lvl_specs = jax.tree.map(
            lambda a: P(axis, *([None] * (np.ndim(a) - 1))), levels)
        ap_specs = jax.tree.map(
            lambda a: P(axis, *([None] * (np.ndim(a) - 1))), Apar)
        fn = jax.jit(jax.shard_map(
            kernel, mesh=self.mesh,
            in_specs=(lvl_specs, P(), ap_specs, P(axis, None),
                      P(axis, None),
                      P(axis, None, None), P(axis, None, None),
                      P(axis, None, None), P(axis, None)),
            out_specs=(P(axis, None), P(), P()),
            check_vma=False))
        x, it, rel = fn(levels, coarse_inv, Apar, comp_map, own_slot,
                        comm.send_idx, comm.send_mask, comm.recv_idx,
                        jnp.asarray(b_sh))
        return unshard_vector(x, part), int(it), float(rel)


def _bfs(A: sp.csr_matrix, seed: np.ndarray, dist: int) -> np.ndarray:
    """Sorted union of `seed` and its <=dist-ring neighborhood."""
    cur = np.unique(seed)
    for _ in range(dist):
        if len(cur) == 0:
            break
        nxt = np.unique(A[cur].indices)
        cur = np.union1d(cur, nxt)
    return cur


def _lut(n: int, ids: np.ndarray) -> np.ndarray:
    lut = np.full(n, -1, np.int32)
    lut[ids] = np.arange(len(ids), dtype=np.int32)
    return lut


def _ell_local(blk: sp.csr_matrix, lut: np.ndarray, m: int, dtype):
    """CSR block -> slot-major (w, m) ELL with LOCAL ids from lut;
    entries outside the local set are dropped (the composite-grid
    truncation — the ghost layer guarantees real rows lose nothing)."""
    blk = blk.tocsr()
    nb = blk.shape[0]
    loc = lut[blk.indices]
    keep = loc >= 0
    rows = np.repeat(np.arange(nb), np.diff(blk.indptr))[keep]
    cols = loc[keep]
    vals = blk.data[keep]
    if len(rows):
        counts = np.bincount(rows, minlength=nb)
        w = max(int(counts.max()), 1)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        slot = np.arange(len(rows)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    else:
        w = 1
    ac = np.full((w, m), -1, np.int32)
    av = np.zeros((w, m), dtype)
    if len(rows):
        ac[slot, rows] = cols
        av[slot, rows] = vals
    return ac, av


def _comp_matvec(cols, vals, x):
    """(w, m) local-ELL matvec; -1 pads contribute nothing."""
    safe = jnp.where(cols >= 0, cols, 0)
    g = jnp.take(x, safe, axis=0)
    return jnp.sum(jnp.where(cols >= 0, vals * g, 0.0), axis=0)


def _fac_solve(levels, r0, n_cycles: int, coarse_inv=None):
    """FAC V-cycles on THIS shard's composite hierarchy — zero
    communication (ref: par_amgdd_fac_cycle.c).  Relaxation is
    l1-Jacobi masked to real dofs; the coarsest composite level holds
    the whole global coarse grid, solved EXACTLY with a precomputed
    dense inverse (hypre's exact coarse solve; `coarse_inv` is
    identity-embedded over padding dofs).  coarse_inv=None falls back
    to 20 l1-Jacobi sweeps (approximate — tests-only path)."""
    nl = len(levels)

    def cycle_at(l, f):
        lvl = levels[l]
        ac, av = lvl.a_cols[0], lvl.a_vals[0]
        dinv, rm = lvl.dinv[0], lvl.real_mask[0]
        if l == nl - 1:
            if coarse_inv is not None:
                return coarse_inv @ f
            u = jnp.zeros_like(f)
            for _ in range(20):
                u = u + dinv * rm * (f - _comp_matvec(ac, av, u))
            return u
        u = dinv * rm * f
        r = f - _comp_matvec(ac, av, u)
        fc = _comp_matvec(lvl.r_cols[0], lvl.r_vals[0], r)
        uc = cycle_at(l + 1, fc)
        u = u + _comp_matvec(lvl.p_cols[0], lvl.p_vals[0], uc)
        u = u + dinv * rm * (f - _comp_matvec(ac, av, u))
        return u

    u = jnp.zeros_like(r0)
    for _ in range(n_cycles):
        r = r0 - _comp_matvec(levels[0].a_cols[0], levels[0].a_vals[0],
                              u)
        u = u + cycle_at(0, r)
    return u
