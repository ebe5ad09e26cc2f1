"""Distributed BoomerAMG + PCG over a device mesh.

The multi-chip solve path: a ParCSR hierarchy sharded over mesh axis
"p", with the ENTIRE preconditioned-CG iteration (V-cycles, halo
exchanges, reductions, coarse dense solve) compiled into one SPMD
program via shard_map.  This is hypre's ij-driver north-star config
re-expressed for TPU:

  hypre (ref)                         here
  ---------------------------------   --------------------------------
  MPI rank / 1-D block row partition  mesh axis "p" / RowPartition
  CommPkg + Isend/Irecv halo          CommPkg + lax.ppermute rounds
  MPI_Allreduce inner products        lax.psum
  gather-to-all coarse GE             lax.all_gather + replicated LU
  (par_gauss_elim.c:185-223)          solve, each shard slices its rows
  comm/compute overlap                XLA latency-hiding scheduler
  (par_csr_matvec.c:187-210)
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
    ParCSR, par_matvec, parcsr_from_scipy, shard_vector, unshard_vector,
)
from hypre_tpu.parallel.partition import RowPartition
from hypre_tpu.setup.l1norms import l1_norms
from hypre_tpu.solvers.amg import (
    AmgConfig, build_host_hierarchy, l1_option_for_relax,
)


@partial(jax.tree_util.register_dataclass,
         data_fields=["A", "P", "R", "dinv"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ParAmgLevel:
    A: ParCSR
    P: ParCSR | None
    R: ParCSR | None
    dinv: jax.Array | None      # (n_shards, n_local)


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "c_lu", "c_piv"],
         meta_fields=["relax_weight", "num_sweeps", "axis_name"])
@dataclasses.dataclass(frozen=True)
class ParAmgHierarchy:
    levels: tuple
    c_lu: jax.Array             # replicated dense LU of padded coarse A
    c_piv: jax.Array
    relax_weight: float
    num_sweeps: int
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

    def setup(self, A: sp.csr_matrix) -> "ParBoomerAMG":
        cfg = self.config
        ns = self.n_shards
        real = get_config().np_real
        levels_host, Ac = build_host_hierarchy(A, cfg)
        opt = l1_option_for_relax(cfg.relax_type)

        parts = [RowPartition.create(lvl[0].shape[0], ns)
                 for lvl in levels_host]
        parts.append(RowPartition.create(Ac.shape[0], ns))

        par_levels = []
        for i, (Al, Pl, Rl, _cf) in enumerate(levels_host):
            rp, cp = parts[i], parts[i + 1]
            dinv = 1.0 / l1_norms(Al, opt)
            dinv_sh = jnp.asarray(
                shard_vector(dinv.astype(real), rp))
            par_levels.append(ParAmgLevel(
                A=parcsr_from_scipy(Al, ns, real),
                P=parcsr_from_scipy(Pl, ns, real, row_part=rp, col_part=cp),
                R=parcsr_from_scipy(Rl, ns, real, row_part=cp, col_part=rp),
                dinv=dinv_sh,
            ))
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
            axis_name=self.axis_name)
        self.fine_part = parts[0]
        self.level_sizes = [p.n_global for p in parts]
        self._place_hierarchy()
        return self

    def _place_hierarchy(self):
        """device_put every leaf with its NamedSharding so shard_map
        consumes data already laid out across the mesh."""
        specs = hierarchy_specs(self.hierarchy)
        self.hierarchy = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.hierarchy, specs)

    # -- solve --------------------------------------------------------

    def solve_pcg(self, b: np.ndarray, tol: float = 1e-8,
                  max_iter: int = 1000):
        """AMG-preconditioned CG on the mesh.  Returns (x, iters, relres)
        with x a global numpy array."""
        h = self.hierarchy
        part = self.fine_part
        b_sh = jax.device_put(
            shard_vector(np.asarray(b, get_config().np_real), part),
            NamedSharding(self.mesh, P(self.axis_name, None)))
        fn = _build_par_pcg(self.mesh, h, float(tol), int(max_iter))
        x, iters, relres = fn(h, b_sh)
        return unshard_vector(x, part), int(iters), float(relres)


def hierarchy_specs(h: ParAmgHierarchy):
    """Matching pytree of PartitionSpecs: level arrays sharded on the
    leading shard axis, coarse LU factors replicated."""
    axis = h.axis_name

    def leaf_spec(x):
        return P(axis, *([None] * (np.ndim(x) - 1)))

    level_specs = jax.tree.map(leaf_spec, h.levels)
    return ParAmgHierarchy(
        levels=level_specs, c_lu=P(None, None), c_piv=P(None),
        relax_weight=h.relax_weight, num_sweeps=h.num_sweeps,
        axis_name=axis)


# ---------------------------------------------------------------------------
# SPMD solve program (everything below runs inside shard_map)
# ---------------------------------------------------------------------------

def _par_relax(A: ParCSR, dinv, w, f, u, num_sweeps):
    """Distributed l1-Jacobi sweeps (relax 18/7 semantics)."""
    for _ in range(num_sweeps):
        if u is None:
            u = w * dinv[0] * f
        else:
            u = u + w * dinv[0] * (f - par_matvec(A, u))
    return u


def par_amg_cycle(h: ParAmgHierarchy, f_loc: jax.Array) -> jax.Array:
    """One distributed V-cycle with zero initial guess."""
    w, ns = h.relax_weight, h.num_sweeps
    axis = h.axis_name
    levels = h.levels
    nl = len(levels)

    us, fs = [], [f_loc]
    for l in range(nl - 1):
        lvl = levels[l]
        u = _par_relax(lvl.A, lvl.dinv, w, fs[l], None, ns)
        r = fs[l] - par_matvec(lvl.A, u)
        fc = par_matvec(lvl.R, r)
        us.append(u)
        fs.append(fc)

    # coarse: gather-to-all + replicated dense solve, slice own rows
    fc_all = jax.lax.all_gather(fs[-1], axis, tiled=True)
    uc_all = jax.scipy.linalg.lu_solve((h.c_lu, h.c_piv), fc_all)
    n_loc_c = fs[-1].shape[0]
    me = jax.lax.axis_index(axis)
    uc = jax.lax.dynamic_slice(uc_all, (me * n_loc_c,), (n_loc_c,))

    for l in range(nl - 2, -1, -1):
        lvl = levels[l]
        u = us[l] + par_matvec(lvl.P, uc)
        u = _par_relax(lvl.A, lvl.dinv, w, fs[l], u, ns)
        uc = u
    return uc


def _par_pcg_kernel(h: ParAmgHierarchy, b_loc, tol, max_iter):
    """Runs per shard inside shard_map; b_loc (1, n_local)."""
    axis = h.axis_name
    b = b_loc[0]
    A0 = h.levels[0].A

    def dot(a, c):
        return jax.lax.psum(jnp.vdot(a, c), axis)

    bnorm = jnp.sqrt(dot(b, b))
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    x = jnp.zeros_like(b)
    r0 = b
    z0 = par_amg_cycle(h, r0)
    gamma0 = dot(r0, z0)

    def cond(st):
        x, r, p, gamma, it, rnorm = st
        return (it < max_iter) & (rnorm / safe_b > tol)

    def body(st):
        x, r, p, gamma, it, _ = st
        s = par_matvec(A0, p)
        alpha = gamma / dot(p, s)
        x = x + alpha * p
        r = r - alpha * s
        z = par_amg_cycle(h, r)
        gamma_new = dot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        return x, r, p, gamma_new, it + 1, jnp.sqrt(dot(r, r))

    st = (x, r0, z0, gamma0, jnp.int32(0), bnorm)
    x, r, p, gamma, it, rnorm = jax.lax.while_loop(cond, body, st)
    return x[None, :], it, rnorm / safe_b


_pcg_cache = {}


def _build_par_pcg(mesh: Mesh, h: ParAmgHierarchy, tol, max_iter):
    key = (id(mesh), tuple(l.A.diag_vals.shape for l in h.levels),
           tol, max_iter)
    if key in _pcg_cache:
        return _pcg_cache[key]
    axis = h.axis_name
    h_specs = hierarchy_specs(h)

    mapped = jax.shard_map(
        partial(_par_pcg_kernel, tol=tol, max_iter=max_iter),
        mesh=mesh,
        in_specs=(h_specs, P(axis, None)),
        out_specs=(P(axis, None), P(), P()),
        check_vma=False,
    )
    fn = jax.jit(mapped)
    _pcg_cache[key] = fn
    return fn
