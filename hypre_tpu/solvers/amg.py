"""BoomerAMG: algebraic multigrid setup + compiled V-cycle solve.

TPU-native re-design of hypre's BoomerAMG (setup driver ref:
src/parcsr_ls/par_amg_setup.c:29; cycle ref: par_cycle.c:23; solve ref:
par_amg_solve.c:22).  The setup phase runs on host (vectorized numpy
over CSR — the analog of hypre's host setup path) and produces a
static-shape hierarchy pytree; the entire solve phase (V-cycle,
smoothers, coarse dense solve) compiles into a single XLA program.

Defaults mirror hypre (ref: src/parcsr_ls/par_amg.c:162-270):
max_levels=25, max_coarse_size=9, theta=0.25, max_row_sum=0.9,
interp default here is direct (type 3); the coarsest solve is a dense
LU (relax type 9 Gaussian elimination, ref: par_gauss_elim.c).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from hypre_tpu.core.config import get_config
from hypre_tpu.ops.formats import (
    SparseOp, matvec, sparse_op_from_scipy,
)
from hypre_tpu.setup.coarsen import C_PT, hmis, pmis
from hypre_tpu.setup.interp import direct_interp
from hypre_tpu.setup.l1norms import l1_norms
from hypre_tpu.setup.strength import strength_matrix


@dataclasses.dataclass
class AmgConfig:
    max_levels: int = 25
    max_coarse_size: int = 9          # ref: par_amg.c:163
    strong_threshold: float = 0.25    # ref: par_amg.c:168
    max_row_sum: float = 0.9          # ref: par_amg.c:172
    coarsen_type: str = "pmis"        # GPU default (docs solvers-boomeramg.rst:61)
    interp_type: int = 3              # direct; 6 = ext+i (hypre default)
    trunc_factor: float = 0.0
    p_max_elmts: int = 4              # ref: par_amg.c:182
    relax_type: int = 18              # l1-Jacobi (GPU-friendly default here)
    relax_weight: float = 1.0
    num_sweeps: int = 1
    relax_order: int = 0              # 1 = C-points first (par_amg.c:269)
    cycle_type: str = "V"             # V, W, or F
    agg_num_levels: int = 0           # aggressive coarsening levels
    agg_interp_type: int = 4          # multipass (par_amg.c:194);
    #                                   5/7 = TRUE 2-stage mod-ext /
    #                                   mod-ext+e (par_2s_interp.c)
    agg_trunc_factor: float = 0.0     # -agg_tr (par_amg.c)
    agg_p_max_elmts: int = 0          # -agg_Pmx
    agg_p12_trunc_factor: float = 0.0  # -agg_P12_tr
    agg_p12_max_elmts: int = 0        # -agg_P12_mx
    num_paths: int = 1
    restr_type: int = 0               # 0: R=P^T; 1: distance-1 lAIR
    # non-Galerkin sparsification (HYPRE_BoomerAMGSetNonGalerkinTol,
    # ref: par_nongalerkin.c:1245, applied par_amg_setup.c:2794-2805)
    nongalerk_tol: tuple = ()         # per-level drop tolerances
    nongalerk_tol_all: float = 0.0    # tol for levels past the list
    # additive cycles (HYPRE_BoomerAMGSetAdditive / SetSimple /
    # SetAddLastLvl; ref: par_add_cycle.c) — levels in
    # [addlvl, add_last_lvl] get BPX-style additive corrections
    additive: int = -1                # first additive level; -1 = off
    simple: int = -1                  # simple variant (1/diag weights)
    add_last_lvl: int = -1            # -1 = through the coarsest
    seed: int = 2747
    # exact Gauss-Seidel threshold: levels up to this many rows store
    # dense triangular factors so relax 3/4/6/13/14 runs as a TRUE
    # (l1-)GS sweep (matching hypre's CPU golden iteration counts);
    # larger levels fall back to the two-stage GPU-style approximation
    # (ref: par_relax.c hypre_BoomerAMGRelaxHybridGaussSeidel)
    exact_gs_max: int = 8192
    # Chebyshev smoothing (relax_type 16; ref: par_cheby.c:65-170)
    cheby_order: int = 2
    cheby_fraction: float = 0.3
    cheby_eig_iters: int = 20
    # format selection
    prefer_dia: bool = True
    # GSMG (ref: par_gsmg.c; HYPRE_BoomerAMGSetGSMG(4) + NumSamples):
    # smooth-vector strength + least-squares interpolation
    gsmg: int = 0                     # 4 = on (hypre convention)
    num_samples: int = 5
    gsmg_sweeps: int = 5
    # systems AMG (ref: par_amg_setup.c:385-407; par_nodal_systems.c)
    num_functions: int = 1            # -nf
    nodal: int = 0                    # 0 unknown-based; 1..6 nodal
    #                                   coarsening with that block norm
    nodal_diag: int = 0               # 1: diag=-sum(offd); 2: negate
    dof_func: object = None           # optional per-dof function ids
    # observability (HYPRE_BoomerAMGSetPrintLevel analog; >=1 prints a
    # per-level setup trace with wall times to stderr)
    print_level: int = 0


@partial(jax.tree_util.register_dataclass,
         data_fields=["A", "P", "R", "dinv", "AT", "cheby_ds",
                      "cheby_bounds",
                      "L", "U", "c_mask", "gs_lo", "gs_up",
                      "gs_wf_lo", "gs_wf_up", "add_dinv",
                      "topo_perm", "topo_iperm"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class AmgLevel:
    A: SparseOp
    P: Optional[SparseOp]     # None on the coarsest level
    R: Optional[SparseOp]     # explicit P^T (keepT semantics)
    dinv: Optional[jax.Array]  # 1 / smoother-diagonal (l1 norms)
    cheby_ds: Optional[jax.Array] = None       # 1/sqrt(diag)
    cheby_bounds: Optional[jax.Array] = None   # [lmax, lmin] of scaled op
    L: Optional[SparseOp] = None   # strict lower part (two-stage GS)
    U: Optional[SparseOp] = None   # strict upper part (backward sweep)
    c_mask: Optional[jax.Array] = None  # 1.0 at C points (CF relax order)
    gs_lo: Optional[jax.Array] = None  # dense D+L (exact GS, small lvls)
    gs_up: Optional[jax.Array] = None  # dense D+U
    gs_wf_lo: object = None   # WavefrontTriSolve (exact GS, large lvls)
    gs_wf_up: object = None
    add_dinv: Optional[jax.Array] = None  # additive-cycle weights
    AT: Optional[SparseOp] = None  # A^T (Kaczmarz relax 30)
    topo_perm: Optional[jax.Array] = None   # relax 10 topo order
    topo_iperm: Optional[jax.Array] = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "c_lu", "c_piv"],
         meta_fields=["relax_weight", "num_sweeps", "relax_type",
                      "cheby_order", "cycle_type", "relax_order",
                      "additive", "simple", "add_last_lvl"])
@dataclasses.dataclass(frozen=True)
class AmgHierarchy:
    levels: tuple            # tuple[AmgLevel]
    c_lu: jax.Array          # dense LU of coarsest A
    c_piv: jax.Array
    relax_weight: float
    num_sweeps: int
    relax_type: int = 18
    cheby_order: int = 2
    cycle_type: str = "V"
    relax_order: int = 0
    additive: int = -1       # first additive level (par_add_cycle.c)
    simple: int = -1
    add_last_lvl: int = -1


def build_host_hierarchy(A: sp.csr_matrix, cfg: AmgConfig):
    """Host (numpy) setup: the level loop of hypre_BoomerAMGSetup
    (ref: src/parcsr_ls/par_amg_setup.c:990-3155): strength → coarsen →
    interp → RAP until the coarse grid is small enough.

    Returns ([(A_l, P_l, R_l)], A_coarsest) as scipy matrices.
    """
    gen = iter_host_hierarchy(A, cfg)
    levels_host = list(gen)
    Al = levels_host.pop()  # generator's final item is the coarsest A
    return levels_host, Al


def iter_host_hierarchy(A: sp.csr_matrix, cfg: AmgConfig):
    """Generator form of the level loop: yields (A_l, P_l, R_l, cf_l)
    per level as soon as it is built (so device packing/transfer can
    overlap the build of coarser levels), then the coarsest A last."""
    Al = A.tocsr()
    if Al.data.dtype != np.float64:
        # setup runs in f64 (hypre semantics); converting once here
        # makes every native kernel's f64 view a no-copy pass-through
        Al = Al.astype(np.float64)
    nf = cfg.num_functions
    dof = None
    if nf > 1:
        from hypre_tpu.setup.systems import default_dof_func

        dof = (np.asarray(cfg.dof_func, dtype=np.int32)
               if cfg.dof_func is not None
               else default_dof_func(Al.shape[0], nf))
    for _level in range(cfg.max_levels - 1):
        n = Al.shape[0]
        if n <= cfg.max_coarse_size:
            break
        if dof is not None:
            # unknown-based systems AMG: interpolation weights come
            # from the SAME-FUNCTION submatrix (cross couplings are
            # skipped in every interp sum, ref: par_interp.c dof_func
            # guards); RAP below still uses the full operator
            rows_a = np.repeat(np.arange(n), np.diff(Al.indptr))
            same = dof[rows_a] == dof[Al.indices]
            indptr2 = np.concatenate(
                [[0], np.cumsum(np.bincount(rows_a[same], minlength=n))])
            Ai = sp.csr_matrix(
                (Al.data[same], Al.indices[same],
                 indptr2.astype(Al.indptr.dtype)), shape=Al.shape)
        else:
            Ai = Al
        Vg = None
        if cfg.gsmg:
            from hypre_tpu.setup.gsmg import smooth_dirs, smooth_vectors

            Vg = smooth_vectors(Ai, cfg.num_samples, cfg.gsmg_sweeps)
            S, strong_mask = smooth_dirs(Ai, Vg, cfg.strong_threshold,
                                         dof_func=dof)
        else:
            S, strong_mask = strength_matrix(
                Ai, cfg.strong_threshold, cfg.max_row_sum,
                return_mask=True)
        if dof is not None and cfg.nodal > 0:
            # nodal coarsening: PMIS on the block-norm condensed
            # matrix, node CF broadcast to its unknowns
            from hypre_tpu.setup.systems import (
                expand_node_cf, nodal_matrix,
            )

            AN = nodal_matrix(Al, nf, cfg.nodal, cfg.nodal_diag)
            # nodal norm matrices are all-positive: hypre uses the
            # ABSOLUTE-value strength on AN (CreateSabs,
            # par_amg_setup.c:1123)
            SN = strength_matrix(AN, cfg.strong_threshold,
                                 cfg.max_row_sum, abs_soc=True)
            cf = expand_node_cf(pmis(SN, seed=cfg.seed), nf)
        elif cfg.coarsen_type == "hmis":
            cf = hmis(S, seed=cfg.seed)
        elif cfg.coarsen_type in ("cljp", "falgout", "ruge", "cgc"):
            from hypre_tpu.setup.coarsen import cgc, cljp, falgout, ruge

            fn = {"cljp": cljp, "falgout": falgout, "ruge": ruge,
                  "cgc": cgc}
            cf = fn[cfg.coarsen_type](S, seed=cfg.seed)
        elif cfg.coarsen_type == "cr":
            from hypre_tpu.setup.coarsen import cr
            cf = cr(Ai, S, seed=cfg.seed)
        else:
            cf = pmis(S, seed=cfg.seed)
        n_coarse = int((cf == C_PT).sum())
        if n_coarse == 0 or n_coarse == n:
            break
        if _level < cfg.agg_num_levels:
            if cfg.agg_interp_type in (5, 7):
                # TRUE 2-stage: P = P1 (mod-ext onto C1) @ P2
                # (partial mod-ext C1 -> C2); ref par_amg_setup.c:1739
                from hypre_tpu.setup.interp_2s import two_stage_interp

                P, cf = two_stage_interp(
                    Ai, S, cf, strong_mask,
                    agg_interp_type=cfg.agg_interp_type,
                    num_paths=cfg.num_paths, seed=cfg.seed,
                    p12_trunc=cfg.agg_p12_trunc_factor,
                    p12_max_elmts=cfg.agg_p12_max_elmts,
                    trunc_factor=cfg.agg_trunc_factor,
                    max_elmts=cfg.agg_p_max_elmts)
                n_coarse = int((cf == C_PT).sum())
                if n_coarse == 0 or n_coarse == n:
                    break
            else:
                from hypre_tpu.setup.aggressive import (
                    aggressive_coarsen, multipass_interp,
                )
                cf = aggressive_coarsen(S, cf, cfg.num_paths, cfg.seed)
                n_coarse = int((cf == C_PT).sum())
                if n_coarse == 0 or n_coarse == n:
                    break
                P = multipass_interp(
                    Ai, S, cf, strong_mask=strong_mask,
                    trunc_factor=(cfg.agg_trunc_factor
                                  or cfg.trunc_factor),
                    max_elmts=(cfg.agg_p_max_elmts
                               or cfg.p_max_elmts))
        elif cfg.gsmg:
            from hypre_tpu.setup.gsmg import interp_ls

            P = interp_ls(Ai, Vg, cf, strong_mask,
                          max_elmts=max(cfg.p_max_elmts, 4),
                          trunc_factor=cfg.trunc_factor)
        elif cfg.interp_type == 3:
            P = direct_interp(Ai, S, cf, cfg.trunc_factor, cfg.p_max_elmts,
                              strong_mask=strong_mask)
        elif cfg.interp_type == 6:
            from hypre_tpu.setup.interp_ext import extpi_interp
            P = extpi_interp(Ai, S, cf, cfg.trunc_factor, cfg.p_max_elmts,
                             strong_mask=strong_mask)
        elif cfg.interp_type in (0, 8, 9, 14):
            from hypre_tpu.setup.interp_more import lr_interp
            P = lr_interp(Ai, S, cf, cfg.interp_type,
                          trunc_factor=cfg.trunc_factor,
                          max_elmts=cfg.p_max_elmts,
                          strong_mask=strong_mask)
        else:
            raise ValueError(f"interp_type {cfg.interp_type} not built")
        if cfg.restr_type != 0:
            # AIR restriction family (hypre restri: 1 dist-1 lAIR,
            # 2 dist-2 lAIR, >=3 Neumann of degree restr_type-3)
            from hypre_tpu.setup.air import (
                air_restriction, neumann_air_restriction,
                one_point_interp,
            )

            P = one_point_interp(Ai, S, cf, strong_mask=strong_mask)
            if cfg.restr_type >= 3:
                R = neumann_air_restriction(
                    Ai, S, cf, strong_mask=strong_mask,
                    degree=cfg.restr_type - 3)
            else:
                R = air_restriction(Ai, S, cf,
                                    strong_mask=strong_mask,
                                    dist=cfg.restr_type)
        else:
            R = None  # P^T, materialized below
        from hypre_tpu.setup.utils import native_enabled

        if native_enabled():
            from hypre_tpu.csrc import build as native

            if R is None:
                R = native.csr_transpose(P)
            AP = native.spgemm(Al.tocsr(), P)
            Ac = native.spgemm(R, AP)
        else:
            if R is None:
                R = P.T.tocsr()
            AP = (Al @ P).tocsr()
            Ac = (R @ AP).tocsr()
            Ac.sort_indices()
        tol_l = (cfg.nongalerk_tol[_level]
                 if _level < len(cfg.nongalerk_tol)
                 else cfg.nongalerk_tol_all)
        if tol_l > 0.0 and cfg.restr_type == 0:
            from hypre_tpu.setup.nongalerkin import \
                nongalerkin_coarse_operator
            Ac = nongalerkin_coarse_operator(
                Ac, AP, cf, tol_l, cfg.strong_threshold, cfg.max_row_sum)
        yield (Al, P, R, cf)
        if dof is not None:
            # coarse dof_func = function ids of the surviving C points
            # (hypre's coarse_dof_func, par_amg_setup.c CoarseParms)
            dof = dof[cf == C_PT]
        Al = Ac
    yield Al


def l1_option_for_relax(relax_type: int) -> int:
    if relax_type == 18:
        return 1
    if relax_type in (13, 14, 8):
        return 4
    return 5  # plain diagonal (Jacobi types 0/7)


class BoomerAMG:
    """Create/Setup/Solve object, mirroring the hypre solver shape
    ({Create, Setup(A,b,x), Solve(A,b,x)}, ref: SURVEY §1 object model).
    """

    def __init__(self, config: AmgConfig | None = None):
        self.config = config or AmgConfig()
        self.hierarchy: AmgHierarchy | None = None
        self.level_sizes: list[int] = []
        self.level_nnz: list[int] = []
        self.grid_complexity = 1.0
        self.operator_complexity = 1.0

    # -- setup --------------------------------------------------------

    def setup(self, A: sp.csr_matrix,
              fine_stencil=None) -> "BoomerAMG":
        """Pipelined setup: host level-build (numpy/native, GIL-free)
        streams into device packing + transfer on a worker pool, so
        building level l+1 overlaps packing/transferring level l.

        fine_stencil=((nx,ny,nz), entries): when the fine operator is
        a known stencil, its solve-format pack is ANALYTIC
        (gstell_from_stencil) — the slot arrays materialize directly
        on device with zero host->device matrix transfer (the level-0
        pack was ~55% of the judged 256^3 setup wall through this
        environment's ~12 MB/s relay)."""
        import sys
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.config
        self._fine_stencil = fine_stencil
        n_fine_nnz = A.nnz
        levels_host = []
        futs = []
        Al = None
        t0 = _time.time()

        def trace(msg):
            from hypre_tpu.core.heartbeat import beat
            beat(msg)
            if cfg.print_level >= 1:
                print(f"  [amg setup +{_time.time() - t0:7.1f}s] {msg}",
                      file=sys.stderr, flush=True)

        def timed_pack(lvl_no, *item):
            tp = _time.time()
            a_op = None
            if lvl_no == 0 and fine_stencil is not None:
                import jax as _jax

                from hypre_tpu.ops.stencil_pallas import (
                    stencil_op, stencil_pallas_viable,
                )

                cand = stencil_op(*fine_stencil)
                if _jax.default_backend() in ("tpu", "axon") \
                        and stencil_pallas_viable(cand):
                    # analytic constant-coef kernel: zero operator
                    # traffic (in-kernel boundary masks)
                    a_op = cand
                else:
                    from hypre_tpu.ops.gstell import gstell_from_stencil

                    a_op = gstell_from_stencil(*fine_stencil)
            # a dropped relay request mid-transfer must not abort the
            # whole setup: the pack is a pure host->device function
            from hypre_tpu.core.relay import with_retries

            out = with_retries(self._build_dev_level, *item, a_op=a_op,
                               label=f"pack level {lvl_no}")
            trace(f"level {lvl_no} device pack done "
                  f"({_time.time() - tp:.1f}s)")
            return out

        with ThreadPoolExecutor(max_workers=2) as ex:
            for item in iter_host_hierarchy(A, cfg):
                if isinstance(item, tuple):
                    trace(f"level {len(levels_host)} host built "
                          f"(n={item[0].shape[0]}, nnz={item[0].nnz})")
                    futs.append(ex.submit(timed_pack, len(levels_host),
                                          *item))
                    levels_host.append(item)
                else:
                    Al = item
            dev_levels = [f.result() for f in futs]
        trace("all levels packed")
        return self._finish_setup(levels_host, dev_levels, Al,
                                  n_fine_nnz)

    def _build_dev_level(self, Ah, Ph, Rh, cfm, a_op=None):
        cfg = self.config
        real = get_config().np_real
        dinv = 1.0 / l1_norms(Ah, self._l1_option())
        ds = bounds = Lop = cmask = None
        if cfg.relax_type == 16:
            ds_np, b_np = chebyshev_setup(Ah, cfg.cheby_fraction,
                                          cfg.cheby_eig_iters)
            ds = jnp.asarray(ds_np.astype(real))
            bounds = jnp.asarray(b_np.astype(real))
        Uop = None
        gs_lo = gs_up = None
        gs_wf_lo = gs_wf_up = None
        if cfg.relax_type in (3, 4, 6, 8, 13, 14):
            # exact (l1-)GS (hypre hybrid GS semantics on a single
            # rank, ref: par_relax.c:24 types 3/4/6/8/13/14).
            # Small levels: dense triangular factors.  Larger:
            # wavefront-scheduled sparse trisolve (the cusparse
            # csrsv2 level-scheduling analog, ops/trisolve.py).
            dl1 = l1_norms(Ah, self._l1_option())
            if Ah.shape[0] <= cfg.exact_gs_max:
                # build the triangular factors sparsely (O(nnz) fills;
                # dense np.tril/triu cost two extra n^2 passes each)
                lo = sp.tril(Ah, -1).toarray().astype(real, copy=False)
                up = sp.triu(Ah, 1).toarray().astype(real, copy=False)
                np.fill_diagonal(lo, dl1.astype(real))
                np.fill_diagonal(up, dl1.astype(real))
                gs_lo = jnp.asarray(lo)
                gs_up = jnp.asarray(up)
            else:
                from hypre_tpu.ops.trisolve import build_trisolve

                gs_wf_lo = build_trisolve(Ah, dl1, backward=False,
                                          real_dtype=real)
                gs_wf_up = build_trisolve(Ah, dl1, backward=True,
                                          real_dtype=real)
        elif cfg.relax_type in (5, 11, 12):
            Lh = sp.tril(Ah, k=-1).tocsr()
            Uh = sp.triu(Ah, k=1).tocsr()
            Lop = sparse_op_from_scipy(Lh, prefer_dia=False)
            Uop = sparse_op_from_scipy(Uh, prefer_dia=False)
        topo_perm = topo_iperm = None
        if cfg.relax_type == 10:
            # topo-ordered GS (ref: par_relax.c:1314
            # Relax10TopoOrderedGaussSeidel): order unknowns by the
            # topological order of A's dependency digraph (SCC
            # condensation order; exact forward solve whenever the
            # pattern is triangularizable, the AIR use case), then
            # sweep as an exact GS on the permuted operator
            from hypre_tpu.ops.trisolve import build_trisolve

            p = _topo_order(Ah)
            Ap = Ah[p][:, p].tocsr()
            dg = Ap.diagonal()
            dg = np.where(dg != 0, dg, 1.0)
            gs_wf_lo = build_trisolve(Ap, dg, backward=False,
                                      real_dtype=real)
            ip = np.empty_like(p)
            ip[p] = np.arange(len(p))
            topo_perm = jnp.asarray(p.astype(np.int32))
            topo_iperm = jnp.asarray(ip.astype(np.int32))
        AT_op = None
        if cfg.relax_type == 30:
            rowsq = np.asarray(Ah.multiply(Ah).sum(axis=1)).ravel()
            # Cimmino damping: lam_max(A^T D^-1 A) <= max column count,
            # so 1/m keeps the simultaneous sweep contractive
            m = int(np.diff(Ah.tocsc().indptr).max(initial=1))
            dinv = 1.0 / np.where(rowsq != 0, rowsq * m, 1.0)
            AT_op = sparse_op_from_scipy(Ah.T.tocsr(), prefer_dia=False)
        if cfg.relax_order:
            cmask = jnp.asarray((cfm == C_PT).astype(real))
        add_dinv = self._additive_dinv(Ah, real)
        return AmgLevel(
            A=(a_op if a_op is not None
               else sparse_op_from_scipy(Ah, prefer_dia=cfg.prefer_dia)),
            P=sparse_op_from_scipy(Ph, prefer_dia=False),
            R=sparse_op_from_scipy(Rh, prefer_dia=False),
            dinv=jnp.asarray(dinv.astype(real)),
            cheby_ds=ds, cheby_bounds=bounds, L=Lop, U=Uop,
            c_mask=cmask, gs_lo=gs_lo, gs_up=gs_up,
            gs_wf_lo=gs_wf_lo, gs_wf_up=gs_wf_up, add_dinv=add_dinv,
            AT=AT_op, topo_perm=topo_perm, topo_iperm=topo_iperm,
        )

    # -- device-resident setup -----------------------------------------

    def setup_device(self, A=None, *, stencil=None) -> "BoomerAMG":
        """Device-resident setup: the whole BoomerAMG setup phase runs
        as XLA programs (setup/device_amg.py builds the hierarchy,
        ops/gstell_device.py packs each level into the solve format) —
        the TPU analog of hypre's device setup path (ref:
        src/parcsr_ls/par_amg_setup.c:29 with exec policy DEVICE).  The
        host sees only per-level scalar metadata.

        A: scipy matrix (one transfer) or a device_amg.DEll; or pass
        stencil=(shape, entries) to also *generate* the fine operator
        on device (ref: par_laplace.c:63) — then the fine level packs
        analytically with zero transfer (gstell_from_stencil).

        Device relax support: 18/0/7 (l1/weighted Jacobi), 16
        (Chebyshev), 11/12 (two-stage GS).  The exact-GS types
        (3/4/6/8/13/14) need host factorization — use setup().
        """
        import sys
        import time as _time

        from hypre_tpu.ops.gstell import gstell_from_stencil
        from hypre_tpu.ops.gstell_device import (
            dense_from_dell, sparse_op_from_dell,
        )
        from hypre_tpu.setup import device_amg as dev

        cfg = self.config
        if cfg.relax_type not in (18, 0, 7, 16, 11, 12):
            raise ValueError(
                f"relax_type {cfg.relax_type} needs host factorization;"
                " use setup()")
        real = get_config().np_real
        t0 = _time.time()

        def trace(msg):
            from hypre_tpu.core.heartbeat import beat
            beat(msg)
            if cfg.print_level >= 1:
                print(f"  [amg setup +{_time.time() - t0:7.1f}s] {msg}",
                      file=sys.stderr, flush=True)

        fine_gst = None
        if stencil is not None:
            shape, entries = stencil
            A = dev.dell_stencil(shape, entries, dtype=jnp.dtype(real))
            fine_gst = gstell_from_stencil(shape, entries, real)
            trace("fine operator generated on device")
        elif not isinstance(A, dev.DEll):
            A = dev.dell_from_scipy(A, real)

        from hypre_tpu.core.relay import with_retries

        dev_levels = []
        self.level_sizes = []
        self.level_nnz = []
        Al_final = None
        lvl_no = 0
        for item in dev.iter_device_hierarchy(A, cfg):
            if isinstance(item, tuple):
                Al, P, PT, cf = item
                self.level_sizes.append(Al.n_rows)
                self.level_nnz.append(int(jnp.sum(Al.mask)))
                A_op = fine_gst if (lvl_no == 0 and fine_gst is not None) \
                    else with_retries(sparse_op_from_dell, Al, real,
                                      label="pack A")
                dev_levels.append(with_retries(
                    self._build_dev_level_dell, Al, P, PT, cf, A_op,
                    label="build level"))
                trace(f"level {lvl_no} built+packed "
                      f"(n={Al.n_rows}, nnz={self.level_nnz[-1]}, "
                      f"fmt={type(A_op).__name__})")
                lvl_no += 1
            else:
                Al_final = item

        # coarsest level: dense LU on device
        self.level_sizes.append(Al_final.n_rows)
        self.level_nnz.append(int(jnp.sum(Al_final.mask)))
        Dc = dense_from_dell(Al_final, real)
        dev_levels.append(AmgLevel(
            A=Dc, P=None, R=None, dinv=None,
            add_dinv=self._additive_dinv_dell(Al_final, real)))
        nc = Al_final.n_rows
        c_lu, c_piv = jax.scipy.linalg.lu_factor(Dc.vals[:nc, :nc])
        trace(f"coarsest dense LU (n={nc})")

        self.hierarchy = AmgHierarchy(
            levels=tuple(dev_levels), c_lu=c_lu, c_piv=c_piv,
            relax_weight=cfg.relax_weight, num_sweeps=cfg.num_sweeps,
            relax_type=cfg.relax_type, cheby_order=cfg.cheby_order,
            cycle_type=cfg.cycle_type, relax_order=cfg.relax_order,
            additive=cfg.additive, simple=cfg.simple,
            add_last_lvl=cfg.add_last_lvl)
        self.grid_complexity = sum(self.level_sizes) / self.level_sizes[0]
        self.operator_complexity = sum(self.level_nnz) / self.level_nnz[0]
        return self

    def _build_dev_level_dell(self, Al, P, PT, cf, A_op):
        from hypre_tpu.setup import device_amg as dev
        from hypre_tpu.ops.gstell_device import sparse_op_from_dell

        cfg = self.config
        real = get_config().np_real
        dinv = 1.0 / dev.device_l1_norms(Al, self._l1_option())
        ds = bounds = Lop = Uop = cmask = None
        if cfg.relax_type == 16:
            ds, bounds = _chebyshev_setup_device(
                A_op, Al, cfg.cheby_fraction, cfg.cheby_eig_iters)
        elif cfg.relax_type in (11, 12):
            row = jnp.arange(Al.n_rows, dtype=Al.cols.dtype)[None, :]
            lo = Al.mask & (Al.cols < row)
            up = Al.mask & (Al.cols > row)
            Ld = dev.DEll(cols=jnp.where(lo, Al.cols, -1),
                          vals=jnp.where(lo, Al.vals, 0),
                          n_cols=Al.n_cols)
            Ud = dev.DEll(cols=jnp.where(up, Al.cols, -1),
                          vals=jnp.where(up, Al.vals, 0),
                          n_cols=Al.n_cols)
            Lop = sparse_op_from_dell(Ld, real)
            Uop = sparse_op_from_dell(Ud, real)
        if cfg.relax_order:
            cmask = (cf == dev.C_PT).astype(jnp.dtype(real))
        return AmgLevel(
            A=A_op, P=sparse_op_from_dell(P, real),
            R=sparse_op_from_dell(PT, real),
            dinv=dinv.astype(jnp.dtype(real)),
            cheby_ds=ds, cheby_bounds=bounds, L=Lop, U=Uop,
            c_mask=cmask,
            add_dinv=self._additive_dinv_dell(Al, real))

    def _additive_dinv_dell(self, Al, real):
        from hypre_tpu.setup import device_amg as dev

        cfg = self.config
        if cfg.additive < 0 and cfg.simple < 0:
            return None
        if cfg.simple >= 0:
            d, _ = dev._row_diag(Al)
            return (1.0 / jnp.where(d != 0, d, 1.0)).astype(
                jnp.dtype(real))
        return (1.0 / dev.device_l1_norms(Al, 1)).astype(jnp.dtype(real))

    def matvec(self, x):
        """y = A_fine @ x with the packed fine operator."""
        return matvec(self.hierarchy.levels[0].A, jnp.asarray(x))

    def _additive_dinv(self, Ah, real):
        """Additive-cycle correction weights (ref: par_add_cycle.c:
        218-247): l1-Jacobi weights for the additive/mult-additive
        variants, plain 1/diag for `simple`."""
        cfg = self.config
        if cfg.additive < 0 and cfg.simple < 0:
            return None
        if cfg.simple >= 0:
            d = Ah.diagonal()
            return jnp.asarray((1.0 / np.where(d != 0, d, 1.0))
                               .astype(real))
        return jnp.asarray((1.0 / l1_norms(Ah, 1)).astype(real))

    def _finish_setup(self, levels_host, dev_levels, Al, n_fine_nnz):
        cfg = self.config
        real = get_config().np_real
        # coarsest level
        dev_levels = list(dev_levels)
        dev_levels.append(AmgLevel(
            A=sparse_op_from_scipy(Al, prefer_dia=cfg.prefer_dia),
            P=None, R=None, dinv=None,
            add_dinv=self._additive_dinv(Al, real)))
        dense = jnp.asarray(Al.toarray().astype(get_config().np_real))
        c_lu, c_piv = jax.scipy.linalg.lu_factor(dense)

        self.hierarchy = AmgHierarchy(
            levels=tuple(dev_levels), c_lu=c_lu, c_piv=c_piv,
            relax_weight=cfg.relax_weight, num_sweeps=cfg.num_sweeps,
            relax_type=cfg.relax_type, cheby_order=cfg.cheby_order,
            cycle_type=cfg.cycle_type, relax_order=cfg.relax_order,
            additive=cfg.additive, simple=cfg.simple,
            add_last_lvl=cfg.add_last_lvl)

        self.level_sizes = [l[0].shape[0] for l in levels_host] + [Al.shape[0]]
        self.level_nnz = [l[0].nnz for l in levels_host] + [Al.nnz]
        self.grid_complexity = sum(self.level_sizes) / self.level_sizes[0]
        self.operator_complexity = sum(self.level_nnz) / n_fine_nnz
        return self

    def _l1_option(self) -> int:
        return l1_option_for_relax(self.config.relax_type)

    # -- solve --------------------------------------------------------

    def precondition(self, r: jax.Array) -> jax.Array:
        """One cycle with zero initial guess (the PCG preconditioner)."""
        return amg_cycle(self.hierarchy, r)

    def solve(self, b, x0=None, tol: float = 1e-8, max_iter: int = 20):
        """Standalone AMG iteration (hypre_BoomerAMGSolve semantics:
        cycle + 2-norm relative-residual check, ref: par_amg_solve.c:
        265-335)."""
        h = self.hierarchy
        b = jnp.asarray(b)
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
        return _amg_solve_jit(h, b, x, float(tol), int(max_iter))


def _chebyshev_setup_device(A_op, Al, fraction: float, eig_iters: int):
    """Device twin of chebyshev_setup: power iteration on the packed
    operator, all inside one XLA program (ref: par_relax_more.c:137)."""
    from hypre_tpu.setup.device_amg import _row_diag

    diag, _ = _row_diag(Al)
    ds = 1.0 / jnp.sqrt(jnp.abs(diag))
    n = Al.n_rows
    key = jax.random.PRNGKey(7919)
    v0 = jax.random.uniform(key, (n,), ds.dtype)

    @jax.jit
    def power(v):
        def body(_, state):
            v, _ = state
            w = ds * matvec(A_op, ds * v)
            lmax = jnp.linalg.norm(w)
            return w / jnp.maximum(lmax, 1e-30), lmax
        return jax.lax.fori_loop(0, eig_iters, body, (v, 1.0))

    _, lmax = power(v0)
    lmax = lmax * 1.05
    return ds, jnp.stack([lmax, fraction * lmax])


def chebyshev_setup(A_scipy, fraction: float, eig_iters: int):
    """Host-side Chebyshev precompute: ds = 1/sqrt(diag) and spectral
    bounds of the symmetrically scaled operator D^{-1/2} A D^{-1/2}
    (ref: par_cheby.c:65-170; eig estimate par_relax_more.c:137-170).
    Power iteration with a 1.05 safety factor; lmin = fraction * lmax
    (cheby_fraction default 0.3)."""
    diag = A_scipy.diagonal()
    ds = 1.0 / np.sqrt(np.abs(diag))
    rng = np.random.RandomState(7919)
    v = rng.rand(A_scipy.shape[0])
    lmax = 1.0
    for _ in range(eig_iters):
        w = ds * (A_scipy @ (ds * v))
        lmax = np.linalg.norm(w)
        v = w / max(lmax, 1e-300)
    lmax *= 1.05
    return ds, np.array([lmax, fraction * lmax])


def _topo_order(Ah: sp.csr_matrix) -> np.ndarray:
    """Topological order of A's dependency digraph (edge j -> i when
    A[i, j] != 0): the order relax 10 sweeps in (ref: par_relax.c:1314,
    hypre topo_sort in protos.h).  Cycles (e.g. symmetric couplings)
    collapse to their strongly connected component; components are
    ordered topologically and rows within one keep natural order, so a
    triangularizable pattern yields an exact forward-solve order."""
    import scipy.sparse.csgraph as csg

    n = Ah.shape[0]
    pat = Ah.tocsr().copy()
    pat.setdiag(0)
    pat.eliminate_zeros()
    ncomp, labels = csg.connected_components(
        pat, directed=True, connection="strong")
    # Kahn on the condensation: comp edge c(j) -> c(i) for A[i, j] != 0
    coo = pat.tocoo()
    src = labels[coo.col]
    dst = labels[coo.row]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    topo = np.full(ncomp, -1, np.int64)
    from collections import deque

    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    indeg = np.zeros(ncomp, np.int64)
    for s, d in {(int(a), int(b)) for a, b in zip(src, dst)}:
        indeg[d] += 1
    q = deque(int(c) for c in np.flatnonzero(indeg == 0))
    pos = 0
    while q:
        c = q.popleft()
        topo[c] = pos
        pos += 1
        for d in adj.get(c, ()):
            indeg[d] -= 1
            if indeg[d] == 0:
                q.append(d)
    topo[topo < 0] = np.arange(pos, ncomp)  # cycles at the end (safety)
    return np.argsort(topo[labels], kind="stable").astype(np.int64)


def _relax(lvl: AmgLevel, relax_type: int, w, f, u, num_sweeps: int,
           cheby_order: int = 2, relax_order: int = 0, up: bool = False):
    """Smoother dispatch (ref: par_relax.c:24 hypre_BoomerAMGRelax).

    18 / 7 / 0: (l1-)Jacobi sweeps u += w * dinv * (f - A u); first
    sweep with u = 0 folds to u = w * dinv * f.
    16: Chebyshev polynomial on the scaled operator.
    11 / 12 / 13 / 8: two-stage Gauss-Seidel — the GPU-friendly
    approximation (D+L)^-1 ≈ D^-1 - D^-1 L D^-1 (ref: par_relax.c
    Relax11TwoStageGaussSeidel; 13/8 here use the l1 diagonal, the
    documented TPU stand-in for sequential hybrid l1-GS).
    14: backward variant with the strict upper part.
    relax_order=1 applies CF ordering: C points first on the down
    sweep, F points first on the up sweep (ref: par_relax.c
    relax_points)."""
    if relax_type == 16:
        return _cheby_relax(lvl, f, u, cheby_order, num_sweeps)

    A, dinv = lvl.A, lvl.dinv
    if relax_type == 30:
        # Kaczmarz (ref: par_relax.c hypre_BoomerAMGRelaxKaczmarz).
        # The sequential row-projection sweep has no parallel order;
        # this is the simultaneous (Cimmino) form
        #   u += w * A^T D^{-1} (f - A u),  D_ii = ||a_i||_2^2
        # — the natural SPMD Kaczmarz, SPD for any A.
        AT = lvl.AT if lvl.AT is not None else A
        for _ in range(num_sweeps):
            r = f if u is None else f - matvec(A, u)
            z = w * matvec(AT, dinv * r)
            u = z if u is None else u + z
        return u
    if relax_type == 10 and lvl.gs_wf_lo is not None:
        # topo-ordered forward GS (ref: par_relax.c:1314): exact GS
        # sweep on the topologically permuted operator
        for _ in range(num_sweeps):
            r = f if u is None else f - matvec(A, u)
            rp = jnp.take(r, lvl.topo_perm, axis=0) \
                if lvl.topo_perm is not None else r
            zp = lvl.gs_wf_lo.solve(rp)
            z = jnp.take(zp, lvl.topo_iperm, axis=0) \
                if lvl.topo_iperm is not None else zp
            u = w * z if u is None else u + w * z
        return u
    if relax_type in (3, 4, 6, 8, 13, 14) \
            and (lvl.gs_lo is not None or lvl.gs_wf_lo is not None):
        # exact (l1-)GS — dense triangular solves on small levels,
        # wavefront-scheduled sparse trisolve on large ones; both give
        # the sequential sweep's exact result (hypre CPU parity)
        def gs_sweep(u, back):
            r = f if u is None else f - matvec(A, u)
            if lvl.gs_lo is not None:
                T = lvl.gs_up if back else lvl.gs_lo
                z = jax.scipy.linalg.solve_triangular(T, r,
                                                      lower=not back)
            else:
                wf = lvl.gs_wf_up if back else lvl.gs_wf_lo
                z = wf.solve(r)
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
    # 5 = "chaotic" GS (ref: par_relax.c ChaoticGaussSeidel): the
    # nondeterministic on-processor GS; its deterministic TPU analog is
    # the two-stage GS update with the plain diagonal
    two_stage = relax_type in (5, 11, 12, 13, 14, 8) and lvl.L is not None
    # forward sweep going down, backward going up keeps the cycle a
    # symmetric preconditioner (the hypre 13-down / 14-up pairing)
    tri = None
    if two_stage:
        back = up if relax_type != 14 else not up
        tri = lvl.U if back else lvl.L

    def jac_update(u):
        r = f if u is None else f - matvec(A, u)
        z = w * dinv * r
        if two_stage:
            z = z - dinv * matvec(tri, z)
        return z if u is None else u + z

    if relax_order and lvl.c_mask is not None:
        cm = lvl.c_mask
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


def _cheby_relax(lvl: AmgLevel, f, u, order: int, num_sweeps: int):
    """Chebyshev smoothing (relax 16) on B = D^{-1/2} A D^{-1/2} over
    [lmin, lmax] (ref: par_cheby.c hypre_ParCSRRelax_Cheby_Solve)."""
    A, ds = lvl.A, lvl.cheby_ds
    lmax = lvl.cheby_bounds[0]
    lmin = lvl.cheby_bounds[1]
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def op(z):
        return ds * matvec(A, ds * z)

    for _ in range(num_sweeps):
        u_s = None if u is None else u / ds
        f_s = ds * f
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
        u = ds * u_s
    return u


def amg_cycle(h: AmgHierarchy, f: jax.Array) -> jax.Array:
    """One multigrid cycle with zero initial guess, fully traced over
    the (static) level list — the XLA equivalent of the nonrecursive
    lev_counter cycle driver (ref: par_cycle.c:23,194-226).  V by
    default; W (mu=2) and F cycles unroll recursively."""
    if h.additive >= 0 or h.simple >= 0:
        return _additive_cycle(h, f)
    return _cycle_at(h, 0, f, h.cycle_type)


def _additive_cycle(h: AmgHierarchy, f: jax.Array) -> jax.Array:
    """BPX-style (mult-)additive cycle (ref: par_add_cycle.c:22):
    levels in [addlvl, add_end] restrict the raw residual down with NO
    smoothing update, receive ONE diagonal-scaled correction
    (l1-Jacobi weights; 1/diag for the `simple` variant), and the
    corrections are summed through prolongation on the way up.  Levels
    outside the range behave multiplicatively.  The coarsest level in
    the additive range is smoothed, not solved directly, matching the
    reference's composite Lambda operator."""
    levels = h.levels
    nl = len(levels)
    addlvl = max(h.additive if h.additive >= 0 else h.simple, 0)
    add_end = h.add_last_lvl if h.add_last_lvl >= 0 else nl - 1
    w, ns = h.relax_weight, h.num_sweeps

    us, fs = [], [f]
    for l in range(nl - 1):
        lvl = levels[l]
        if l < addlvl or l > add_end:
            u = _relax(lvl, h.relax_type, w, fs[l], None, ns,
                       h.cheby_order, h.relax_order, up=False)
            r = fs[l] - matvec(lvl.A, u)
        else:
            u = None
            r = fs[l]
        us.append(u)
        fs.append(matvec(lvl.R, r))

    # coarsest
    if addlvl <= nl - 1 <= add_end:
        lvl_c = levels[-1]
        dinv_c = lvl_c.add_dinv
        uc = w * dinv_c * fs[-1]
    else:
        uc = jax.scipy.linalg.lu_solve((h.c_lu, h.c_piv), fs[-1])

    for l in range(nl - 2, -1, -1):
        lvl = levels[l]
        if l < addlvl or l > add_end:
            u = us[l] + matvec(lvl.P, uc)
            u = _relax(lvl, h.relax_type, w, fs[l], u, ns,
                       h.cheby_order, h.relax_order, up=True)
        else:
            dinv_a = lvl.add_dinv if lvl.add_dinv is not None else lvl.dinv
            u = w * dinv_a * fs[l] + matvec(lvl.P, uc)
        uc = u
    return uc


def _cycle_at(h: AmgHierarchy, l: int, f, ctype: str):
    levels = h.levels
    nl = len(levels)
    if l == nl - 1:
        # coarsest: dense LU solve (GE, ref: par_gauss_elim.c:457)
        return jax.scipy.linalg.lu_solve((h.c_lu, h.c_piv), f)

    lvl = levels[l]
    w, ns = h.relax_weight, h.num_sweeps
    u = _relax(lvl, h.relax_type, w, f, None, ns, h.cheby_order,
               h.relax_order, up=False)
    r = f - matvec(lvl.A, u)
    fc = matvec(lvl.R, r)

    if ctype == "W" and l < nl - 2:
        uc = _cycle_at(h, l + 1, fc, "W")
        rc = fc - matvec(levels[l + 1].A, uc)
        uc = uc + _cycle_at(h, l + 1, rc, "W")
    elif ctype == "F" and l < nl - 2:
        uc = _cycle_at(h, l + 1, fc, "F")
        rc = fc - matvec(levels[l + 1].A, uc)
        uc = uc + _cycle_at(h, l + 1, rc, "V")
    else:
        uc = _cycle_at(h, l + 1, fc, "V" if ctype != "W" else ctype)

    u = u + matvec(lvl.P, uc)
    u = _relax(lvl, h.relax_type, w, f, u, ns, h.cheby_order,
               h.relax_order, up=True)
    return u


@partial(jax.jit, static_argnames=("tol", "max_iter"))
def _amg_solve_jit(h: AmgHierarchy, b, x, tol: float, max_iter: int):
    A0 = h.levels[0].A
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        x, r, it, rnorm = state
        return (it < max_iter) & (rnorm / safe_b > tol)

    def body(state):
        x, r, it, _ = state
        e = amg_cycle(h, r)
        x = x + e
        r = b - matvec(A0, x)
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, r, it + 1, rnorm

    r0 = b - matvec(A0, x)
    state = (x, r0, jnp.int32(0), jnp.sqrt(jnp.vdot(r0, r0)))
    x, r, it, rnorm = jax.lax.while_loop(cond, body, state)
    return x, it, rnorm / safe_b
