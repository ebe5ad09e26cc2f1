"""Distributed BoomerAMG + Krylov over a device mesh.

The multi-chip solve path: a ParCSR hierarchy sharded over mesh axis
"p", with the ENTIRE preconditioned Krylov iteration (V/W/F cycles,
smoothers, halo exchanges, reductions, coarse dense solve) compiled
into one SPMD program via shard_map.  This is hypre's ij-driver
north-star config re-expressed for TPU:

  hypre (ref)                         here
  ---------------------------------   --------------------------------
  MPI rank / 1-D block row partition  mesh axis "p" / RowPartition
  CommPkg + Isend/Irecv halo          CommPkg + lax.ppermute rounds
  MPI_Allreduce inner products        lax.psum
  gather-to-all coarse GE             lax.all_gather + replicated LU
  (par_gauss_elim.c:185-223)          solve, each shard slices its rows
  comm/compute overlap                XLA latency-hiding scheduler
  (par_csr_matvec.c:187-210)
  hybrid GS (GS in-rank, Jacobi       per-shard triangular solve of the
  across, par_relax.c types 3/4/6/    local diag block + lagged offd —
  13/14)                              the EXACT hybrid semantics with
                                      shard boundary = rank boundary

Solvers: every Krylov template (PCG/GMRES/FlexGMRES/LGMRES/COGMRES/
BiCGSTAB/CGNR) runs distributed — the templates in solvers/krylov*.py
take an ``axis_name`` and swap jnp dots for psum reductions, the TPU
form of hypre's data-structure-blind vtable design (ref:
src/krylov/pcg.h:49-70 — the same solver text serves every system).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.core.config import get_config
from hypre_tpu.parallel.comm import exchange
from hypre_tpu.parallel.parcsr import (
    ParCSR, ParStencilOp, par_matvec, par_stencil_matvec,
    parcsr_from_scipy, shard_vector, unshard_vector,
)
from hypre_tpu.parallel.partition import RowPartition
from hypre_tpu.setup.coarsen import C_PT
from hypre_tpu.setup.l1norms import l1_norms
from hypre_tpu.solvers.amg import (
    AmgConfig, build_host_hierarchy, chebyshev_setup, l1_option_for_relax,
)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class LocalELL:
    """Shard-local sparse block in padded ELL form: columns index the
    shard's OWN rows (no communication).  Used for the strict-triangle
    operands of two-stage Gauss-Seidel (ref: par_relax.c
    hypre_BoomerAMGRelaxTwoStageGaussSeidel)."""

    cols: jax.Array   # int32[n_shards, n_local, K]
    vals: jax.Array   # real [n_shards, n_local, K]


def local_matvec(L: LocalELL, x_loc: jax.Array) -> jax.Array:
    return jnp.sum(L.vals[0] * jnp.take(x_loc, L.cols[0], axis=0), axis=1)


@partial(jax.tree_util.register_dataclass,
         data_fields=["A", "P", "R", "dinv", "cheby_ds", "cheby_bounds",
                      "gs_lo", "gs_up", "L", "U", "c_mask"],
         meta_fields=["stencil"])
@dataclasses.dataclass(frozen=True)
class ParAmgLevel:
    A: ParCSR
    P: ParCSR | None
    R: ParCSR | None
    dinv: jax.Array | None              # (n_shards, n_local)
    cheby_ds: jax.Array | None = None   # (n_shards, n_local) 1/sqrt(diag)
    cheby_bounds: jax.Array | None = None  # (n_shards, 2) [lmax, lmin]
    gs_lo: jax.Array | None = None      # (n_shards, n_loc, n_loc) D+L
    gs_up: jax.Array | None = None      # dense local triangles (exact GS)
    L: LocalELL | None = None           # strict lower of diag block
    U: LocalELL | None = None
    c_mask: jax.Array | None = None     # (n_shards, n_local) 1.0 at C pts
    stencil: "ParStencilOp | None" = None   # matrix-free fine operator


def level_matvec(lvl: ParAmgLevel, x_loc: jax.Array) -> jax.Array:
    """A @ x for a level: the matrix-free stencil fast path when
    available (the packed-format dispatch of the single-chip solve,
    ref: src/seq_mv/csr_spmv_device.c:381 — same kernel at any np),
    else the ELL diag/offd ParCSR matvec."""
    if lvl.stencil is not None:
        return par_stencil_matvec(lvl.stencil, x_loc)
    return par_matvec(lvl.A, x_loc)


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "c_lu", "c_piv"],
         meta_fields=["relax_weight", "num_sweeps", "relax_type",
                      "cheby_order", "cycle_type", "relax_order",
                      "axis_name"])
@dataclasses.dataclass(frozen=True)
class ParAmgHierarchy:
    levels: tuple
    c_lu: jax.Array             # replicated dense LU of padded coarse A
    c_piv: jax.Array
    relax_weight: float
    num_sweeps: int
    relax_type: int = 18
    cheby_order: int = 2
    cycle_type: str = "V"
    relax_order: int = 0
    axis_name: str = "p"


class ParBoomerAMG:
    """Distributed Create/Setup/Solve object."""

    def __init__(self, mesh: Mesh, config: AmgConfig | None = None,
                 axis_name: str = "p"):
        self.mesh = mesh
        self.axis_name = axis_name
        self.config = config or AmgConfig()
        self.hierarchy: ParAmgHierarchy | None = None
        self.fine_part: RowPartition | None = None
        self.level_sizes: list[int] = []

    @property
    def n_shards(self) -> int:
        return int(np.prod(list(self.mesh.shape.values())))

    def _fine_stencil_op(self, fine_stencil, n_local):
        """ParStencilOp for level 0 when the fine operator is a known
        stencil and the halo fits one slab neighbor."""
        if fine_stencil is None:
            return None
        shape, entries = fine_stencil
        arms = tuple(sorted(
            ((tuple(d), float(v)) for d, v in entries if v != 0.0),
            key=lambda e: e[0]))
        op = ParStencilOp(shape=tuple(shape), arms=arms,
                          n_local=int(n_local),
                          n_shards=self.n_shards,
                          axis_name=self.axis_name)
        return op if op.maxdisp <= n_local else None

    def setup(self, A: sp.csr_matrix,
              fine_stencil=None) -> "ParBoomerAMG":
        """fine_stencil=((nx, ny, nz), entries): apply the fine level
        matrix-free (ParStencilOp) instead of stored ELL — the
        multi-chip twin of BoomerAMG.setup(fine_stencil=...)."""
        cfg = self.config
        ns = self.n_shards
        real = get_config().np_real
        levels_host, Ac = build_host_hierarchy(A, cfg)
        opt = l1_option_for_relax(cfg.relax_type)

        parts = [RowPartition.create(lvl[0].shape[0], ns)
                 for lvl in levels_host]
        parts.append(RowPartition.create(Ac.shape[0], ns))

        par_levels = []
        for i, (Al, Pl, Rl, cfm) in enumerate(levels_host):
            rp, cp = parts[i], parts[i + 1]
            st = self._fine_stencil_op(fine_stencil, rp.n_local) \
                if i == 0 else None
            par_levels.append(dataclasses.replace(
                self._build_level(Al, Pl, Rl, cfm, rp, cp,
                                  ns, real, opt), stencil=st))
        par_levels.append(ParAmgLevel(
            A=parcsr_from_scipy(Ac, ns, real), P=None, R=None, dinv=None))

        # padded dense coarse matrix: identity on padding rows
        cpart = parts[-1]
        dense = np.eye(cpart.n_padded, dtype=real)
        dense[:Ac.shape[0], :Ac.shape[1]] = Ac.toarray()
        c_lu, c_piv = jax.scipy.linalg.lu_factor(jnp.asarray(dense))

        self.hierarchy = ParAmgHierarchy(
            levels=tuple(par_levels), c_lu=c_lu, c_piv=c_piv,
            relax_weight=cfg.relax_weight, num_sweeps=cfg.num_sweeps,
            relax_type=cfg.relax_type, cheby_order=cfg.cheby_order,
            cycle_type=cfg.cycle_type, relax_order=cfg.relax_order,
            axis_name=self.axis_name)
        self.fine_part = parts[0]
        self.level_sizes = [p.n_global for p in parts]
        self._place_hierarchy()
        return self

    def setup_distributed(self, A,
                          fine_stencil=None) -> "ParBoomerAMG":
        """DISTRIBUTED setup: the hierarchy is built on the mesh
        (parallel/par_setup.py — halo'd strength/PMIS/interp/RAP,
        ppermute comm, O(ghost) host metadata) and converted shard-by-
        shard into the solve-side ParCSR form.  No global level is
        ever materialized, unlike setup() which builds host-globally.
        The C/F splitting is bit-identical to the single-chip device
        setup path (same pmis_hash32 measures).

        A: a global scipy matrix (sliced per shard on ingest) or an
        already-sharded par_setup.ParDEll.

        Distributed smoother support: Jacobi-family relax types
        (18/0/7) — the GPU-default configs; GS/Chebyshev types need
        host factorization, use setup().
        Ref: src/parcsr_ls/par_amg_setup.c:29 with NP > 1."""
        from hypre_tpu.parallel.par_setup import (
            C_PT as PAR_C_PT, ParDEll, iter_par_hierarchy,
            pardell_from_scipy, pardell_to_scipy, _true_counts,
        )
        from hypre_tpu.parallel.parcsr import parcsr_from_pardell

        cfg = self.config
        if cfg.relax_type not in (18, 0, 7):
            raise ValueError(
                f"relax_type {cfg.relax_type} needs host factorization"
                " in the distributed setup; use setup()")
        ns = self.n_shards
        real = get_config().np_real
        # setup runs in f64 (hypre semantics), solve operators in real
        if not isinstance(A, ParDEll):
            part = RowPartition.create(A.shape[0], ns)
            A = pardell_from_scipy(A, part, real_dtype=np.float64)

        opt = l1_option_for_relax(cfg.relax_type)
        par_levels = []
        parts = []
        Ac_final = None
        for item in iter_par_hierarchy(A, cfg, self.mesh,
                                       axis=self.axis_name):
            if isinstance(item, tuple):
                Al, Pl, Rl, cfm = item
                parts.append(Al.row_part)
                st = self._fine_stencil_op(
                    fine_stencil, Al.row_part.n_local) \
                    if not par_levels else None
                par_levels.append(dataclasses.replace(
                    self._build_level_pardell(
                        Al, Pl, Rl, cfm, real, opt, PAR_C_PT),
                    stencil=st))
            else:
                Ac_final = item
        parts.append(Ac_final.row_part)
        par_levels.append(ParAmgLevel(
            A=parcsr_from_pardell(Ac_final, real), P=None, R=None,
            dinv=None))

        # coarsest dense GE: the coarse matrix is tiny (max_coarse_size
        # rows); gather + replicated LU is hypre's own strategy
        # (par_gauss_elim.c:185-223)
        cpart = Ac_final.row_part
        Acs = pardell_to_scipy(Ac_final)
        # PADDED-index embedding: with an unequal (GenPartition)
        # coarse partition the all_gathered coarse rhs is in
        # shard-major padded order, where slot p*n_lc+i holds true gid
        # starts[p]+i only for i < count_p — permute A accordingly,
        # identity on the interleaved padding slots
        counts = _true_counts(cpart)
        n_lc = cpart.n_local
        gid_of_slot = np.full(cpart.n_padded, -1, np.int64)
        starts = np.asarray(cpart.shard_starts())
        for p in range(ns):
            k = int(counts[p])
            gid_of_slot[p * n_lc:p * n_lc + k] = starts[p] + np.arange(k)
        dense = np.eye(cpart.n_padded, dtype=real)
        vs = np.flatnonzero(gid_of_slot >= 0)
        dense[np.ix_(vs, vs)] = Acs.toarray()[
            np.ix_(gid_of_slot[vs], gid_of_slot[vs])]
        c_lu, c_piv = jax.scipy.linalg.lu_factor(jnp.asarray(dense))

        self.hierarchy = ParAmgHierarchy(
            levels=tuple(par_levels), c_lu=c_lu, c_piv=c_piv,
            relax_weight=cfg.relax_weight, num_sweeps=cfg.num_sweeps,
            relax_type=cfg.relax_type, cheby_order=cfg.cheby_order,
            cycle_type=cfg.cycle_type, relax_order=cfg.relax_order,
            axis_name=self.axis_name)
        self.fine_part = parts[0]
        self.level_sizes = [p.n_global for p in parts]
        self._place_hierarchy()
        return self

    def _build_level_pardell(self, Al, Pl, Rl, cfm, real, opt, c_pt):
        """Per-level smoother precompute from sharded blocks — all
        row-local (l1 norms need only own rows)."""
        from hypre_tpu.parallel.parcsr import parcsr_from_pardell

        cfg = self.config

        @jax.jit
        def l1_kernel(vals, cols):
            valid = cols >= 0
            abssum = jnp.sum(jnp.where(valid, jnp.abs(vals), 0), axis=1)
            row = jnp.arange(vals.shape[2], dtype=jnp.int32)[None, None]
            # diag sign: entry whose global col == own row — cols here
            # are GLOBAL; diag gid = start + slot, tested via l1 sign
            diag = jnp.sum(jnp.where(valid & (cols == (
                jnp.asarray([[s] for s in np.minimum(
                    np.asarray(Al.row_part.shard_starts()[:-1]),
                    Al.row_part.n_global)], dtype=jnp.int32)[:, :, None]
                + row)), vals, 0), axis=1)
            if opt == 5:
                l1 = diag
            elif opt == 4:
                l1 = jnp.where(diag < 0, -jnp.abs(diag), jnp.abs(diag))
            else:
                l1 = jnp.where(diag < 0, -abssum, abssum)
            return jnp.where(l1 != 0, l1, 1.0)

        l1 = l1_kernel(Al.vals, Al.cols)
        dinv = (1.0 / l1).astype(jnp.dtype(real))
        cmask = None
        if cfg.relax_order:
            cmask = (cfm == c_pt).astype(jnp.dtype(real))
        return ParAmgLevel(
            A=parcsr_from_pardell(Al, real),
            P=parcsr_from_pardell(Pl, real),
            R=parcsr_from_pardell(Rl, real),
            dinv=dinv, c_mask=cmask)

    def _build_level(self, Al, Pl, Rl, cfm, rp, cp, ns, real, opt):
        """Per-level smoother precompute, sharded (the distributed
        analog of BoomerAMG._build_dev_level)."""
        cfg = self.config
        dinv = 1.0 / l1_norms(Al, opt)
        dinv_sh = jnp.asarray(shard_vector(dinv.astype(real), rp))
        ds = bounds = None
        gs_lo = gs_up = Ltri = Utri = cmask = None
        if cfg.relax_type == 16:
            ds_np, b_np = chebyshev_setup(Al, cfg.cheby_fraction,
                                          cfg.cheby_eig_iters)
            ds = jnp.asarray(shard_vector(ds_np.astype(real), rp))
            bounds = jnp.asarray(np.tile(b_np.astype(real), (ns, 1)))
        elif cfg.relax_type in (3, 4, 6, 8, 13, 14):
            # hybrid (l1-)GS: exact triangular solve of each shard's
            # local diag block (hypre's in-rank GS), offd lagged
            # (Jacobi across ranks) — par_relax.c types 3/4/6/13/14
            # with shard boundary = rank boundary.
            dl1 = l1_norms(Al, opt).astype(real)
            if rp.n_local <= cfg.exact_gs_max:
                gs_lo, gs_up = _dense_local_triangles(Al, dl1, rp, real)
            else:
                Ltri, Utri = _ell_local_triangles(Al, rp, real)
        elif cfg.relax_type in (11, 12):
            Ltri, Utri = _ell_local_triangles(Al, rp, real)
        if cfg.relax_order and cfm is not None:
            cmask = jnp.asarray(shard_vector(
                (cfm == C_PT).astype(real), rp))
        return ParAmgLevel(
            A=parcsr_from_scipy(Al, ns, real),
            P=parcsr_from_scipy(Pl, ns, real, row_part=rp, col_part=cp),
            R=parcsr_from_scipy(Rl, ns, real, row_part=cp, col_part=rp),
            dinv=dinv_sh, cheby_ds=ds, cheby_bounds=bounds,
            gs_lo=gs_lo, gs_up=gs_up, L=Ltri, U=Utri, c_mask=cmask)

    def _place_hierarchy(self):
        """device_put every leaf with its NamedSharding so shard_map
        consumes data already laid out across the mesh."""
        specs = hierarchy_specs(self.hierarchy)
        self.hierarchy = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.hierarchy, specs)

    # -- solve --------------------------------------------------------

    def solve(self, b: np.ndarray, method: str = "pcg",
              tol: float = 1e-8, max_iter: int = 1000, **kw):
        """AMG-preconditioned Krylov solve on the mesh.  method in
        {pcg, gmres, flexgmres, lgmres, cogmres, bicgstab, cgnr}.
        Returns (x, iters, relres) with x a global numpy array."""
        h = self.hierarchy
        part = self.fine_part
        b_sh = jax.device_put(
            shard_vector(np.asarray(b, get_config().np_real), part),
            NamedSharding(self.mesh, P(self.axis_name, None)))
        fn = _build_par_solver(self.mesh, h, method, float(tol),
                               int(max_iter), tuple(sorted(kw.items())))
        x, iters, relres = fn(h, b_sh)
        return unshard_vector(x, part), int(iters), float(relres)

    def solve_pcg(self, b: np.ndarray, tol: float = 1e-8,
                  max_iter: int = 1000):
        return self.solve(b, method="pcg", tol=tol, max_iter=max_iter)


def _dense_local_triangles(Al, dl1, rp, real):
    """Dense (n_shards, n_loc, n_loc) D+L / D+U factors of each shard's
    diag block, l1 diagonal, identity on padding rows."""
    ns, nl = rp.n_shards, rp.n_local
    lo = np.zeros((ns, nl, nl), dtype=real)
    up = np.zeros((ns, nl, nl), dtype=real)
    n = Al.shape[0]
    for p in range(ns):
        r0 = min(p * nl, n)
        r1 = min(r0 + nl, n)
        k = r1 - r0
        blk = np.zeros((nl, nl), dtype=real)
        if k:
            blk[:k, :k] = Al[r0:r1, r0:r1].toarray()
        d = np.ones(nl, dtype=real)
        if k:
            d[:k] = dl1[r0:r1]
        lo[p] = np.tril(blk, -1)
        up[p] = np.triu(blk, 1)
        np.fill_diagonal(lo[p], d)
        np.fill_diagonal(up[p], d)
    return jnp.asarray(lo), jnp.asarray(up)


def _ell_local_triangles(Al, rp, real):
    """Strict lower/upper triangles of each shard's diag block as
    LocalELL (two-stage GS operands on large levels)."""
    ns, nl = rp.n_shards, rp.n_local
    n = Al.shape[0]
    lo_blocks, up_blocks = [], []
    for p in range(ns):
        r0 = min(p * nl, n)
        r1 = min(r0 + nl, n)
        blk = Al[r0:r1, r0:r1].tocsr() if r1 > r0 else \
            sp.csr_matrix((0, 0))
        lo_blocks.append(sp.tril(blk, k=-1).tocoo() if r1 > r0 else None)
        up_blocks.append(sp.triu(blk, k=1).tocoo() if r1 > r0 else None)

    def stack(blocks):
        width = 1
        for b in blocks:
            if b is not None and b.nnz:
                width = max(width, int(np.bincount(
                    b.row, minlength=nl).max()))
        cell = np.zeros((ns, nl, width), dtype=np.int32)
        vell = np.zeros((ns, nl, width), dtype=real)
        for p, b in enumerate(blocks):
            if b is None or not b.nnz:
                continue
            order = np.lexsort((b.col, b.row))
            rows, cols, vals = b.row[order], b.col[order], b.data[order]
            counts = np.bincount(rows, minlength=nl)
            slot = np.arange(len(rows)) - np.repeat(
                np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
            cell[p, rows, slot] = cols
            vell[p, rows, slot] = vals
        return LocalELL(cols=jnp.asarray(cell), vals=jnp.asarray(vell))

    return stack(lo_blocks), stack(up_blocks)


def hierarchy_specs(h: ParAmgHierarchy):
    """Matching pytree of PartitionSpecs: level arrays sharded on the
    leading shard axis, coarse LU factors replicated."""
    axis = h.axis_name

    def leaf_spec(x):
        return P(axis, *([None] * (np.ndim(x) - 1)))

    level_specs = jax.tree.map(leaf_spec, h.levels)
    return dataclasses.replace(h, levels=level_specs,
                               c_lu=P(None, None), c_piv=P(None))


# ---------------------------------------------------------------------------
# SPMD solve program (everything below runs inside shard_map)
# ---------------------------------------------------------------------------

def _par_relax(lvl: ParAmgLevel, relax_type: int, w, f, u, num_sweeps,
               cheby_order: int = 2, relax_order: int = 0,
               up: bool = False):
    """Distributed smoother dispatch (ref: par_relax.c:24).  Semantics
    match hypre's MPI behavior exactly: shard boundary = rank boundary,
    so hybrid GS = exact GS on the local diag block with the offd
    contribution lagged one sweep (Jacobi across shards)."""
    A, dinv = lvl.A, lvl.dinv
    if relax_type == 16:
        return _par_cheby(lvl, f, u, cheby_order, num_sweeps)

    if relax_type in (3, 4, 6, 8, 13, 14) and lvl.gs_lo is not None:
        def gs_sweep(u, back):
            r = f if u is None else f - level_matvec(lvl, u)
            T = lvl.gs_up[0] if back else lvl.gs_lo[0]
            z = jax.scipy.linalg.solve_triangular(T, r, lower=not back)
            return z if u is None else u + z

        for _ in range(num_sweeps):
            if relax_type in (6, 8):     # symmetric (l1-)GS
                u = gs_sweep(u, False)
                u = gs_sweep(u, True)
            elif relax_type in (13, 3):  # forward down / backward up
                u = gs_sweep(u, up)
            else:                        # 14, 4: backward down / fwd up
                u = gs_sweep(u, not up)
        return u

    two_stage = relax_type in (11, 12, 13, 14, 8) and lvl.L is not None
    tri = None
    if two_stage:
        back = up if relax_type != 14 else not up
        tri = lvl.U if back else lvl.L

    def jac_update(u):
        r = f if u is None else f - level_matvec(lvl, u)
        z = w * dinv[0] * r
        if two_stage:
            z = z - dinv[0] * local_matvec(tri, z)
        return z if u is None else u + z

    if relax_order and lvl.c_mask is not None:
        cm = lvl.c_mask[0]
        first = cm if not up else (1.0 - cm)
        for _ in range(num_sweeps):
            z = jac_update(u)
            u = first * z if u is None else jnp.where(first > 0, z, u)
            z = jac_update(u)
            u = jnp.where(first > 0, u, z)
        return u

    for _ in range(num_sweeps):
        u = jac_update(u)
    return u


def _par_cheby(lvl: ParAmgLevel, f, u, order: int, num_sweeps: int):
    """Distributed Chebyshev smoothing (relax 16, ref: par_cheby.c)."""
    A, ds = lvl.A, lvl.cheby_ds
    lmax = lvl.cheby_bounds[0, 0]
    lmin = lvl.cheby_bounds[0, 1]
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    d = ds[0]

    def op(z):
        return d * level_matvec(lvl, d * z)

    for _ in range(num_sweeps):
        u_s = None if u is None else u / jnp.where(d != 0, d, 1.0)
        f_s = d * f
        r = f_s if u_s is None else f_s - op(u_s)
        p = r / theta
        u_s = p if u_s is None else u_s + p
        rho_old = 1.0 / sigma
        for _k in range(1, order):
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = f_s - op(u_s)
            p = rho * rho_old * p + (2.0 * rho / delta) * r
            u_s = u_s + p
            rho_old = rho
        u = d * u_s
    return u


def par_amg_cycle(h: ParAmgHierarchy, f_loc: jax.Array) -> jax.Array:
    """One distributed multigrid cycle with zero initial guess — V by
    default, W/F unrolled recursively (ref: par_cycle.c:23,194-226)."""
    return _par_cycle_at(h, 0, f_loc, h.cycle_type)


def _par_cycle_at(h: ParAmgHierarchy, l: int, f, ctype: str):
    levels = h.levels
    nl = len(levels)
    axis = h.axis_name
    if l == nl - 1:
        # coarsest: gather-to-all + replicated dense solve, slice own
        # rows (par_gauss_elim.c:185-223 semantics)
        f_all = jax.lax.all_gather(f, axis, tiled=True)
        u_all = jax.scipy.linalg.lu_solve((h.c_lu, h.c_piv), f_all)
        me = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice(u_all, (me * f.shape[0],),
                                     (f.shape[0],))

    lvl = levels[l]
    w, ns = h.relax_weight, h.num_sweeps
    u = _par_relax(lvl, h.relax_type, w, f, None, ns, h.cheby_order,
                   h.relax_order, up=False)
    r = f - level_matvec(lvl, u)
    fc = par_matvec(lvl.R, r)

    if ctype == "W" and l < nl - 2:
        uc = _par_cycle_at(h, l + 1, fc, "W")
        rc = fc - level_matvec(levels[l + 1], uc)
        uc = uc + _par_cycle_at(h, l + 1, rc, "W")
    elif ctype == "F" and l < nl - 2:
        uc = _par_cycle_at(h, l + 1, fc, "F")
        rc = fc - level_matvec(levels[l + 1], uc)
        uc = uc + _par_cycle_at(h, l + 1, rc, "V")
    else:
        uc = _par_cycle_at(h, l + 1, fc, "V" if ctype != "W" else ctype)

    u = u + par_matvec(lvl.P, uc)
    u = _par_relax(lvl, h.relax_type, w, f, u, ns, h.cheby_order,
                   h.relax_order, up=True)
    return u


_solver_cache = {}


def _build_par_solver(mesh: Mesh, h: ParAmgHierarchy, method: str,
                      tol, max_iter, kw_items=()):
    key = (id(mesh), tuple(l.A.diag_vals.shape for l in h.levels),
           tuple(l.stencil for l in h.levels),
           method, h.relax_type, h.cycle_type, tol, max_iter, kw_items)
    if key in _solver_cache:
        return _solver_cache[key]
    axis = h.axis_name
    h_specs = hierarchy_specs(h)
    kw = dict(kw_items)

    def kernel(h, b_loc):
        from hypre_tpu.solvers import krylov, krylov_more

        b = b_loc[0]
        Aop = lambda v: level_matvec(h.levels[0], v)   # noqa: E731
        Mop = lambda r: par_amg_cycle(h, r)        # noqa: E731
        fns = {
            "pcg": krylov.pcg,
            "gmres": krylov_more.gmres,
            "flexgmres": krylov_more.flexgmres,
            "lgmres": krylov_more.lgmres,
            "cogmres": krylov_more.cogmres,
            "bicgstab": krylov_more.bicgstab,
            "cgnr": krylov_more.cgnr,
        }
        res = fns[method](Aop, b, M=Mop, tol=tol, max_iter=max_iter,
                          axis_name=axis, **kw)
        return res.x[None, :], res.iters, res.relres

    mapped = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(h_specs, P(axis, None)),
        out_specs=(P(axis, None), P(), P()),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    _solver_cache[key] = fn
    return fn
