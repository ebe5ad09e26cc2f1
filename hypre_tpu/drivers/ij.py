"""ij driver — CLI-compatible equivalent of hypre's test/ij.c.

Accepts the subset of the reference driver's ~300 flags that this
library implements (ref: src/test/ij.c:2315-2585 usage; solver ID
table around "-solver <ID>"), builds the problem, runs the solver, and
prints the same golden-file tail the reference harness diffs on
(ref: src/test/ij.c:4427-4430):

    Iterations = %d
    Final Relative Residual Norm = %e

Usage examples (mirroring TEST_bench/benchmark_ij.jobs):
    python -m hypre_tpu.drivers.ij -n 64 64 64 -pmis -interptype 6 \
        -rlx 18 -solver 1
    python -m hypre_tpu.drivers.ij -n 256 256 128 -27pt -solver 3
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="ij", add_help=True)
    p.add_argument("-n", nargs=3, type=int, default=[10, 10, 10],
                   metavar=("nx", "ny", "nz"))
    p.add_argument("-P", nargs=3, type=int, default=[1, 1, 1],
                   help="process grid (informational; sharding is mesh-wide)")
    p.add_argument("-c", nargs=3, type=float, default=[1.0, 1.0, 1.0],
                   metavar=("cx", "cy", "cz"))
    p.add_argument("-a", nargs=3, type=float, default=[0.0, 0.0, 0.0],
                   metavar=("ax", "ay", "az"), dest="conv")
    p.add_argument("-laplacian", action="store_true", default=True)
    p.add_argument("-9pt", dest="ninept", action="store_true")
    p.add_argument("-27pt", dest="twentysevenpt", action="store_true")
    p.add_argument("-difconv", action="store_true")
    p.add_argument("-atype", type=int, default=0)
    p.add_argument("-solver", type=int, default=1)
    # defaults mirror hypre's BoomerAMG (ref: par_amg.c:178-270):
    # HMIS coarsening (10), ext+i interp (6), hybrid GS 13 down / 14 up
    p.add_argument("-rlx", type=int, default=13)
    p.add_argument("-w", type=float, default=1.0, dest="relax_weight")
    p.add_argument("-ns", type=int, default=1, dest="num_sweeps")
    p.add_argument("-interptype", type=int, default=6)
    p.add_argument("-pmis", action="store_true")
    p.add_argument("-hmis", action="store_true")
    p.add_argument("-cljp", action="store_true")
    p.add_argument("-falgout", action="store_true")
    p.add_argument("-cr", action="store_true")
    p.add_argument("-cgc", action="store_true")
    p.add_argument("-CF", type=int, default=0, dest="relax_order")
    p.add_argument("-aug", type=int, default=2, dest="aug_dim")
    p.add_argument("-th", type=float, default=0.25, dest="theta")
    p.add_argument("-mxrs", type=float, default=0.9, dest="max_row_sum")
    p.add_argument("-Pmx", type=int, default=4, dest="p_max_elmts")
    p.add_argument("-tr", type=float, default=0.0, dest="trunc_factor")
    p.add_argument("-mxl", type=int, default=25, dest="max_levels")
    p.add_argument("-mxc", type=int, default=9, dest="max_coarse_size")
    p.add_argument("-tol", type=float, default=1e-8)
    p.add_argument("-max_iter", type=int, default=1000)
    p.add_argument("-mg_max_iter", type=int, default=100)
    p.add_argument("-k", type=int, default=5, dest="k_dim")
    p.add_argument("-additive", type=int, default=-1,
                   help="first additive-cycle level (par_add_cycle.c)")
    p.add_argument("-mult_add", type=int, default=-1, dest="mult_add",
                   help="mult-additive variant (same composite here)")
    p.add_argument("-simple", type=int, default=-1,
                   help="simple additive variant (1/diag weights)")
    p.add_argument("-add_end", type=int, default=-1, dest="add_last_lvl")
    p.add_argument("-nongalerk_tol", nargs="+", type=float, default=None,
                   help="<ntol> <tol list>: non-Galerkin drop tolerances")
    p.add_argument("-agg_nl", type=int, default=0, dest="agg_num_levels")
    p.add_argument("-agg_interp", type=int, default=4,
                   dest="agg_interp_type")
    p.add_argument("-np2", "-num_paths", type=int, default=1,
                   dest="num_paths")
    p.add_argument("-seed", type=int, default=2747)
    p.add_argument("-rhsone", action="store_true", default=True)
    p.add_argument("-rhsrand", action="store_true")
    p.add_argument("-x0rand", action="store_true")
    p.add_argument("-fromfile", type=str, default=None,
                   help="read the matrix from an IJ file")
    p.add_argument("-rhsfromfile", type=str, default=None)
    p.add_argument("-ilu_type", type=int, default=0,
                   help="ILU variant (hypre enum: 0/1 BJ-ILU(k)/ILUT, "
                        "10/11 GMRES-, 20/21 NSH-, 30/31 RAS-, 50 iter)")
    p.add_argument("-ilu_lfil", type=int, default=0,
                   help="level of fill k for ILU(k)")
    p.add_argument("-ilu_droptol", type=float, default=1e-2)
    p.add_argument("-ilu_max_row_nnz", type=int, default=1000)
    p.add_argument("-agg_Pmx", type=int, default=0,
                   dest="agg_p_max_elmts")
    p.add_argument("-agg_tr", type=float, default=0.0,
                   dest="agg_trunc_factor")
    p.add_argument("-agg_P12_mx", type=int, default=0,
                   dest="agg_p12_max_elmts")
    p.add_argument("-agg_P12_tr", type=float, default=0.0,
                   dest="agg_p12_trunc_factor")
    p.add_argument("-nf", type=int, default=1, dest="num_functions")
    p.add_argument("-nodal", type=int, default=0)
    p.add_argument("-nodal_diag", type=int, default=0)
    p.add_argument("-sysL", type=int, default=0,
                   help="n-function Laplacian system (ij.c -sysL)")
    p.add_argument("-cheby_order", type=int, default=2)
    p.add_argument("-cheby_fraction", type=float, default=0.3)
    p.add_argument("-cheby_eig_est", type=int, default=20,
                   dest="cheby_eig_iters",
                   help="CG eigenvalue-estimate iterations (0 -> 20)")
    p.add_argument("-restriction", type=int, default=0,
                   dest="restr_type",
                   help="0 P^T; 1/2 distance-1/2 lAIR; 3+k Neumann(k)")
    p.add_argument("-gsmg", type=int, default=0)
    p.add_argument("-numsamp", type=int, default=5,
                   dest="num_samples")
    p.add_argument("-rotate", action="store_true",
                   help="2D rotated anisotropic 7pt (par_rotate_7pt.c)")
    p.add_argument("-alpha", type=float, default=45.0)
    p.add_argument("-eps", type=float, default=0.001)
    p.add_argument("-vardifconv", action="store_true",
                   help="variable-coefficient diffusion (par_vardifconv.c)")
    p.add_argument("-mu", type=int, default=1,
                   help="cycle multiplier: 1 V, 2 W")
    p.add_argument("-fcycle", action="store_true")
    p.add_argument("-exec_host", action="store_true",
                   help="run the solve on CPU (f64)")
    p.add_argument("-print_level", type=int, default=1)
    # --- ParaSails (ij.c -sai_th/-sai_filter; solver 8/18) ----------
    p.add_argument("-sai_th", type=float, default=0.1,
                   help="ParaSails prune threshold")
    p.add_argument("-sai_filter", type=float, default=0.05,
                   help="ParaSails post-filter")
    p.add_argument("-sai_lev", type=int, default=1,
                   help="ParaSails pattern levels (nlevels)")
    p.add_argument("-sai_sym", type=int, default=None,
                   help="override symmetric mode (default: by solver)")
    # --- FSAI (ij.c -fs_* / HYPRE_FSAISet*; solver 43) --------------
    p.add_argument("-fs_max_steps", type=int, default=3)
    p.add_argument("-fs_max_step_size", type=int, default=5)
    p.add_argument("-fs_kap_tol", type=float, default=1e-3)
    p.add_argument("-fs_algo", type=int, default=1,
                   help="1 adaptive (hypre default), 2 static")
    # --- Schwarz (ij.c -var/-ov/-dom; solver 12) --------------------
    p.add_argument("-var", type=int, default=2, dest="sw_variant",
                   help="Schwarz variant: 0 multiplicative, "
                        "2 additive, 3 sym-multiplicative")
    p.add_argument("-ov", type=int, default=4, dest="sw_overlap")
    p.add_argument("-dom", type=int, default=32, dest="sw_domain",
                   help="Schwarz subdomain (block) size")
    p.add_argument("-sw_w", type=float, default=1.0,
                   dest="sw_weight")
    # --- hybrid (ij.c -cf/-sol_t; solver 20) ------------------------
    p.add_argument("-cf", type=float, default=0.9, dest="cf_tol",
                   help="hybrid convergence-factor switch tol")
    p.add_argument("-dscg_max_iter", type=int, default=1000)
    p.add_argument("-pcg_max_iter", type=int, default=200)
    # --- LOBPCG mode (ij.c -lobpcg/-vrand/-itr) ---------------------
    p.add_argument("-lobpcg", action="store_true",
                   help="solve the eigenproblem instead (ij.c lobpcg "
                        "mode); preconditioner from -solver")
    p.add_argument("-vrand", type=int, default=4, dest="block_size",
                   help="LOBPCG block size (random initial block)")
    p.add_argument("-itr", type=int, default=100, dest="lobpcg_itr")
    p.add_argument("-lobpcg_tol", type=float, default=1e-6)
    # --- accepted-for-compatibility (documented no-ops) -------------
    p.add_argument("-rap", type=int, default=0,
                   help="RAP algorithm selector in hypre; Galerkin "
                        "RAP is always the fused XLA/native path here")
    p.add_argument("-mm_vendor", type=int, default=0,
                   help="SpGEMM vendor toggle in hypre; one device "
                        "SpGEMM path here")
    p.add_argument("-dbg", type=int, default=0)
    # --- misc parity -------------------------------------------------
    p.add_argument("-srand", type=int, default=None,
                   help="alias of -seed")
    p.add_argument("-xisone", action="store_true",
                   help="initial guess = 1")
    p.add_argument("-rhszero", action="store_true")
    p.add_argument("-printsystem", action="store_true",
                   help="write A/b in IJ format (IJ print analog)")
    return p


def build_problem(args):
    from hypre_tpu.gen import difconv, laplacian, laplacian_9pt, \
        laplacian_27pt

    nx, ny, nz = args.n
    cx, cy, cz = args.c
    if args.sysL:
        import scipy.sparse as sp

        from hypre_tpu.gen import laplacian as _lap

        L = _lap(nx, ny, nz, cx, cy, cz).tocsr()
        nf = args.sysL
        N = L.shape[0]
        A = sp.block_diag([L] * nf, format="csr")
        perm = np.arange(nf * N).reshape(nf, N).T.ravel()
        A = A[perm][:, perm].tocsr()
        args.num_functions = nf
        name = f"{nf}-function Laplacian system {nx}x{ny}x{nz}"
    elif args.rotate:
        from hypre_tpu.gen.laplace import rotate_7pt

        A = rotate_7pt(nx, ny, args.alpha, args.eps)
        name = f"rotated 7pt {nx}x{ny} (alpha={args.alpha}, eps={args.eps})"
    elif args.vardifconv:
        from hypre_tpu.gen.laplace import vardifconv as _vdc

        A = _vdc(nx, ny, nz, contrast=1.0 / max(args.eps, 1e-12))
        name = f"vardifconv {nx}x{ny}x{nz} (eps={args.eps})"
    elif args.twentysevenpt:
        A = laplacian_27pt(nx, ny, nz)
        name = f"27pt Laplacian {nx}x{ny}x{nz}"
    elif args.ninept:
        A = laplacian_9pt(nx, ny)
        name = f"9pt Laplacian {nx}x{ny}"
    elif args.difconv or any(a != 0 for a in args.conv):
        ax, ay, az = args.conv
        A = difconv(nx, ny, nz, cx, cy, cz, ax, ay, az, args.atype)
        name = f"convection-diffusion {nx}x{ny}x{nz}"
    else:
        A = laplacian(nx, ny, nz, cx, cy, cz)
        name = f"Laplacian {nx}x{ny}x{nz}"
    return A, name


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.exec_host:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from hypre_tpu.core.timing import timers
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.core.config import get_config
    from hypre_tpu.solvers import (
        AmgConfig, BoomerAMG, bicgstab, cgnr, gmres, pcg,
    )

    if args.fromfile:
        from hypre_tpu.ij import IJMatrix

        A = IJMatrix.read_from(args.fromfile).assemble()
        name = args.fromfile
    else:
        A, name = build_problem(args)
    n = A.shape[0]
    print(f"  Problem: {name}, {n} rows, {A.nnz} nonzeros")

    np_real = get_config().np_real
    if args.srand is not None:
        args.seed = args.srand
    rng = np.random.RandomState(args.seed)
    if args.rhsfromfile:
        from hypre_tpu.ij import IJVector

        b = IJVector.read_from(args.rhsfromfile).assemble().astype(np_real)
    elif args.rhszero:
        b = np.zeros(n, dtype=np_real)
    else:
        b = (rng.rand(n) if args.rhsrand else np.ones(n)).astype(np_real)
    x0 = (rng.rand(n).astype(np_real) if args.x0rand
          else np.ones(n, dtype=np_real) if args.xisone else None)
    if args.printsystem:
        from hypre_tpu.ij import IJMatrix, IJVector

        coo = A.tocoo()
        ijm = IJMatrix(0, n - 1, 0, n - 1)
        ijm.set_values(coo.row, coo.col, coo.data)
        ijm.assemble()
        ijm.print_to("IJ.out.A")
        ijv = IJVector(0, n - 1)
        ijv.set_values(np.arange(n), b)
        ijv.assemble()
        ijv.print_to("IJ.out.b")

    # coarsening selection mirrors hypre's flag set; HMIS (type 10) is
    # the hypre default (ref: par_amg.c:178)
    coarsen = "hmis"
    if args.pmis:
        coarsen = "pmis"
    if args.cljp:
        coarsen = "cljp"
    if args.falgout:
        coarsen = "falgout"
    if args.cr:
        coarsen = "cr"
    if args.hmis:
        coarsen = "hmis"
    if args.cgc:
        coarsen = "cgc"
    amg_cfg = AmgConfig(
        max_levels=args.max_levels, max_coarse_size=args.max_coarse_size,
        strong_threshold=args.theta, max_row_sum=args.max_row_sum,
        coarsen_type=coarsen,
        interp_type=args.interptype, trunc_factor=args.trunc_factor,
        p_max_elmts=args.p_max_elmts, relax_type=args.rlx,
        relax_weight=args.relax_weight, num_sweeps=args.num_sweeps,
        relax_order=args.relax_order,
        agg_num_levels=args.agg_num_levels,
        agg_interp_type=args.agg_interp_type, num_paths=args.num_paths,
        additive=max(args.additive, args.mult_add),
        simple=args.simple, add_last_lvl=args.add_last_lvl,
        nongalerk_tol=(tuple(args.nongalerk_tol[1:])
                       if args.nongalerk_tol else ()),
        agg_p_max_elmts=args.agg_p_max_elmts,
        agg_trunc_factor=args.agg_trunc_factor,
        agg_p12_max_elmts=args.agg_p12_max_elmts,
        agg_p12_trunc_factor=args.agg_p12_trunc_factor,
        num_functions=args.num_functions, nodal=args.nodal,
        nodal_diag=args.nodal_diag,
        cheby_order=args.cheby_order,
        cheby_fraction=args.cheby_fraction,
        cheby_eig_iters=args.cheby_eig_iters or 20,
        restr_type=args.restr_type,
        gsmg=args.gsmg, num_samples=args.num_samples,
        cycle_type=("F" if args.fcycle else
                    "W" if args.mu >= 2 else "V"),
        seed=args.seed,
    )

    solver_id = args.solver
    need_amg = solver_id in (0, 1, 3, 5, 9, 16, 51, 61, 20)
    amg = None
    timers.begin("Setup")
    op = sparse_op_from_scipy(A)
    if need_amg:
        amg = BoomerAMG(amg_cfg).setup(A)
    timers.end("Setup")
    setup_time = timers.wall["Setup"]

    if need_amg and args.print_level:
        sizes = " ".join(str(s) for s in amg.level_sizes)
        print(f"  AMG levels: {sizes}")
        print(f"  Operator complexity = {amg.operator_complexity:.6f}")
        print(f"  Grid complexity     = {amg.grid_complexity:.6f}")

    names = {0: "AMG", 1: "AMG-PCG", 2: "DS-PCG", 3: "AMG-GMRES",
             4: "DS-GMRES", 5: "AMG-CGNR", 6: "DS-CGNR",
             8: "ParaSails-PCG", 9: "AMG-BiCGSTAB", 10: "DS-BiCGSTAB",
             16: "AMG-COGMRES", 17: "DS-COGMRES", 20: "AMG-Hybrid",
             50: "DS-LGMRES", 51: "AMG-LGMRES",
             60: "DS-FlexGMRES", 61: "AMG-FlexGMRES",
             18: "ParaSails-GMRES",
             43: "FSAI-PCG", 80: "ILU-GMRES", 81: "ILU-PCG"}
    print(f"Solver: {names.get(solver_id, solver_id)}")

    if args.lobpcg:
        # ij.c LOBPCG mode (ref: src/test/ij.c lobpcgFlag branch):
        # smallest eigenpairs of A, preconditioned per -solver
        from hypre_tpu.solvers.lobpcg import lobpcg

        timers.begin("Solve")
        X0 = rng.rand(n, args.block_size).astype(np_real)
        M = amg if solver_id in (0, 1, 3) else _diag_scale(A)
        res = lobpcg(op, X0, M=M, tol=args.lobpcg_tol,
                     max_iter=args.lobpcg_itr)
        jax.block_until_ready(res.eigenvectors)
        timers.end("Solve")
        print(f"LOBPCG iterations = {int(res.iters)}")
        print("Eigenvalue lambda    Residual")
        for lam, rn in zip(np.asarray(res.eigenvalues),
                           np.asarray(res.resnorms)):
            print(f"{lam: .15e}  {rn:.6e}")
        return 0

    timers.begin("Solve")
    if solver_id == 0:
        x, iters, relres = amg.solve(b, x0=x0, tol=args.tol,
                                     max_iter=args.mg_max_iter)
    elif solver_id in (1, 2):
        # DS (diagonal scaling) preconditioner for solver 2
        M = amg if solver_id == 1 else _diag_scale(A)
        res = pcg(op, b, x0=x0, M=M, tol=args.tol, max_iter=args.max_iter)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (3, 4):
        M = amg if solver_id == 3 else _diag_scale(A)
        res = gmres(op, b, x0=x0, M=M, tol=args.tol,
                    max_iter=args.max_iter, k_dim=args.k_dim)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (5, 6):
        M = amg if solver_id == 5 else _diag_scale(A)
        res = cgnr(op, b, x0=x0, M=M, tol=args.tol, max_iter=args.max_iter)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (9, 10):
        M = amg if solver_id == 9 else _diag_scale(A)
        res = bicgstab(op, b, x0=x0, M=M, tol=args.tol,
                       max_iter=args.max_iter)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (16, 17):
        from hypre_tpu.solvers import cogmres

        M = amg if solver_id == 16 else _diag_scale(A)
        res = cogmres(op, b, x0=x0, M=M, tol=args.tol,
                      max_iter=args.max_iter, k_dim=args.k_dim)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (50, 51):
        from hypre_tpu.solvers import lgmres

        M = amg if solver_id == 51 else _diag_scale(A)
        res = lgmres(op, b, x0=x0, M=M, tol=args.tol,
                     max_iter=args.max_iter, k_dim=args.k_dim,
                     aug_dim=args.aug_dim)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (60, 61):
        from hypre_tpu.solvers import flexgmres

        M = amg if solver_id == 61 else _diag_scale(A)
        res = flexgmres(op, b, x0=x0, M=M, tol=args.tol,
                        max_iter=args.max_iter, k_dim=args.k_dim)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id == 20:
        from hypre_tpu.solvers import HybridConfig, hybrid_solve

        hres = hybrid_solve(A, b, HybridConfig(
            tol=args.tol, cf_tol=args.cf_tol,
            dscg_max_iter=args.dscg_max_iter,
            pcg_max_iter=args.pcg_max_iter, amg=amg_cfg))
        x = hres.x
        iters = hres.dscg_iters + hres.pcg_iters
        relres = hres.relres
        print(f"PCG_Iterations = {hres.pcg_iters}")
        print(f"DSCG_Iterations = {hres.dscg_iters}")
    elif solver_id in (80, 81):
        from hypre_tpu.solvers import ILU, IluConfig

        M = ILU(IluConfig(
            ilu_type=args.ilu_type, fill_level=args.ilu_lfil,
            drop_tol=args.ilu_droptol,
            max_row_nnz=args.ilu_max_row_nnz)).setup(A)
        fn = gmres if solver_id == 80 else pcg
        kw = {"k_dim": args.k_dim} if solver_id == 80 else {}
        res = fn(op, b, x0=x0, M=M.precondition, tol=args.tol,
                 max_iter=args.max_iter, **kw)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id in (8, 18):
        # ParaSails (hypre ij.c: 8 = ParaSails-PCG, 18 = ParaSails-GMRES)
        from hypre_tpu.solvers.parasails import ParaSails, \
            ParaSailsConfig

        sym = bool(args.sai_sym) if args.sai_sym is not None \
            else (solver_id == 8)
        M = ParaSails(ParaSailsConfig(
            thresh=args.sai_th, filter=args.sai_filter,
            nlevels=args.sai_lev, sym=sym)).setup(A)
        fn = pcg if solver_id == 8 else gmres
        kw = {"k_dim": args.k_dim} if solver_id == 18 else {}
        res = fn(op, b, x0=x0, M=M.precondition, tol=args.tol,
                 max_iter=args.max_iter, **kw)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id == 43:
        from hypre_tpu.solvers import FSAI, FsaiConfig

        M = FSAI(FsaiConfig(
            algo_type="adaptive" if args.fs_algo == 1 else "static",
            max_steps=args.fs_max_steps,
            max_step_size=args.fs_max_step_size,
            kap_tolerance=args.fs_kap_tol)).setup(A)
        res = pcg(op, b, x0=x0, M=M.precondition, tol=args.tol,
                  max_iter=args.max_iter)
        x, iters, relres = res.x, res.iters, res.relres
    elif solver_id == 12:
        # Schwarz-PCG (hypre ij.c -solver 12)
        from hypre_tpu.solvers import Schwarz, SchwarzConfig

        variants = {0: "multiplicative", 2: "additive",
                    3: "sym-multiplicative"}
        M = Schwarz(SchwarzConfig(
            block_size=args.sw_domain, overlap=args.sw_overlap,
            weight=args.sw_weight,
            variant=variants.get(args.sw_variant, "additive"),
        )).setup(A)
        res = pcg(op, b, x0=x0, M=M.precondition, tol=args.tol,
                  max_iter=args.max_iter)
        x, iters, relres = res.x, res.iters, res.relres
    else:
        print(f"solver id {solver_id} not implemented", file=sys.stderr)
        return 1
    jax.block_until_ready(x)
    timers.end("Solve")

    print()
    print(f"Setup phase times:  wall clock time = {setup_time:.6f} seconds")
    print(f"Solve phase times:  wall clock time = "
          f"{timers.wall['Solve']:.6f} seconds")
    print()
    print(f"Iterations = {int(iters)}")
    print(f"Final Relative Residual Norm = {float(relres):e}")
    return 0


def _diag_scale(A):
    import jax.numpy as jnp

    from hypre_tpu.core.config import get_config

    dinv = jnp.asarray((1.0 / A.diagonal()).astype(get_config().np_real))
    return lambda r: dinv * r


if __name__ == "__main__":
    sys.exit(main())
