"""struct driver — CLI equivalent of hypre's test/struct.c.

Solver IDs follow the reference (ref: src/test/struct.c:628-658):
  0  = SMG             1  = PFMG
  10 = CG + SMG        11 = CG + PFMG
  17 = CG + diagonal   18 = CG (no precond)
  19 = Jacobi

Prints the golden-file tail the harness diffs on:
    Iterations = %d
    Final Relative Residual Norm = %e
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="struct")
    p.add_argument("-n", nargs=3, type=int, default=[32, 32, 32],
                   metavar=("nx", "ny", "nz"))
    p.add_argument("-c", nargs=3, type=float, default=[1.0, 1.0, 1.0])
    p.add_argument("-solver", type=int, default=0)
    p.add_argument("-tol", type=float, default=1e-6)
    p.add_argument("-max_iter", type=int, default=100)
    p.add_argument("-relax", type=int, default=1,
                   help="PFMG relax: 0 Jacobi, 1 wJacobi, 2 RB-GS")
    p.add_argument("-w", type=float, default=2.0 / 3.0, dest="weight")
    p.add_argument("-exec_host", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.exec_host:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from hypre_tpu.core.config import get_config
    from hypre_tpu.struct.grid import struct_laplacian, struct_matvec
    from hypre_tpu.struct.pfmg import PFMG, PfmgConfig
    from hypre_tpu.struct.smg import SMG, SmgConfig

    nx, ny, nz = args.n
    cx, cy, cz = args.c
    real = get_config().np_real
    A = struct_laplacian(nz, ny, nx, cz, cy, cx, dtype=real)
    b = np.ones((nz, ny, nx), dtype=real)
    print(f"Struct problem: {nx}x{ny}x{nz} Laplacian "
          f"({A.n_rows} unknowns)")

    t0 = time.time()
    precond = None
    if args.solver in (0, 10):
        sol = SMG(SmgConfig(tol=args.tol, max_iter=args.max_iter)).setup(A)
        name = "SMG"
    elif args.solver in (1, 11):
        sol = PFMG(PfmgConfig(relax_type=args.relax,
                              jacobi_weight=args.weight, tol=args.tol,
                              max_iter=args.max_iter)).setup(A)
        name = "PFMG"
    elif args.solver in (17, 18, 19):
        sol = None
        name = {17: "CG+diag", 18: "CG", 19: "Jacobi"}[args.solver]
    else:
        print(f"solver id {args.solver} not implemented", file=sys.stderr)
        return 1
    setup_time = time.time() - t0

    t0 = time.time()
    if args.solver in (0, 1):
        print(f"Solver: {name}")
        x, it, rel = sol.solve(b, tol=args.tol, max_iter=args.max_iter)
    elif args.solver in (10, 11):
        print(f"Solver: CG+{name}")
        from hypre_tpu.solvers.krylov import pcg

        res = pcg(A=lambda u: struct_matvec(A, u), b=b,
                  M=sol.precondition, tol=args.tol,
                  max_iter=args.max_iter)
        x, it, rel = res.x, res.iters, res.relres
    elif args.solver == 19:
        # standalone (damped) Jacobi iteration, the reference's struct
        # Jacobi solver (ref: src/struct_ls/jacobi.c — point Jacobi via
        # the PFMG relax kernel with weight 1)
        import jax.numpy as jnp
        from functools import partial

        print(f"Solver: {name}")
        dinv = jnp.asarray(
            1.0 / np.asarray(A.coefs[list(A.offsets).index((0, 0, 0))]))
        bj = jnp.asarray(b)

        @partial(jax.jit, static_argnames=("tol", "max_iter"))
        def jacobi_solve(bj, tol, max_iter):
            bnorm = jnp.sqrt(jnp.vdot(bj, bj))
            safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

            def cond(s):
                x, it, rn = s
                return (it < max_iter) & (rn / safe_b > tol)

            def body(s):
                x, it, _ = s
                r = bj - struct_matvec(A, x)
                x = x + dinv * r
                r2 = bj - struct_matvec(A, x)
                return x, it + 1, jnp.sqrt(jnp.vdot(r2, r2))

            x0 = jnp.zeros_like(bj)
            x, it, rn = jax.lax.while_loop(
                cond, body, (x0, jnp.int32(0), safe_b * 2))
            return x, it, rn / safe_b

        x, it, rel = jacobi_solve(bj, args.tol, args.max_iter)
    else:
        from hypre_tpu.solvers.krylov import pcg

        dinv = 1.0 / np.asarray(A.coefs[list(A.offsets).index((0, 0, 0))])
        M = (lambda r: jax.numpy.asarray(dinv) * r) \
            if args.solver == 17 else None
        print(f"Solver: {name}")
        res = pcg(A=lambda u: struct_matvec(A, u), b=b, M=M,
                  tol=args.tol, max_iter=args.max_iter)
        x, it, rel = res.x, res.iters, res.relres
    jax.block_until_ready(x)
    solve_time = time.time() - t0

    print()
    print(f"Setup phase times:  wall clock time = {setup_time:.6f} seconds")
    print(f"Solve phase times:  wall clock time = {solve_time:.6f} seconds")
    print()
    print(f"Iterations = {int(it)}")
    print(f"Final Relative Residual Norm = {float(rel):e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
