"""Mixed-precision iterative refinement: f32 inner solves, f64 outer
residuals.

TPUs have no native f64; the solve path runs f32 (hypre's
--enable-single analog) and bottoms out at relative residuals ~1e-6/7.
hypre's f64 builds report ~1e-8/9 on the benchmark rows, which left
the round-4 headline comparing different convergence targets.  This
module closes that gap the classic way (Wilkinson iterative
refinement; hypre's mixed-precision build plays the same game):

    x = 0
    repeat:  r  = b - A x        (f64, outer)
             dx = inner_solve(r) (f32, on the accelerator)
             x += dx             (f64)

The outer residual is exact f64: for stencil operators it is an
analytic numpy stencil application (no matrix); for general operators
a scipy f64 SpMV.  Each refinement step multiplies the error by the
f32 solve's convergence factor, so 2-3 outer rounds reach true f64
1e-8 from a 1e-6 inner tolerance.

Ref: hypre mixed-precision builds (configure --enable-single +
HYPRE_Real vs HYPRE_LongDouble plumbing, src/configure:1550-1730);
the refinement loop itself matches classic IR.
"""
from __future__ import annotations

import time

import numpy as np


def stencil_apply_f64(shape, entries, x: np.ndarray) -> np.ndarray:
    """y = A @ x in f64 for a constant-stencil operator with Dirichlet
    truncation (the operator gen.laplacian builds, ref:
    src/parcsr_ls/par_laplace.c:63) — pure numpy slices, no matrix."""
    nx, ny, nz = shape
    X = np.asarray(x, np.float64).reshape(nz, ny, nx)
    Y = np.zeros_like(X)
    for (dx, dy, dz), v in entries:
        if v == 0.0:
            continue
        src = [slice(None)] * 3
        dst = [slice(None)] * 3
        for ax, d in ((2, dx), (1, dy), (0, dz)):
            if d > 0:
                dst[ax] = slice(0, -d)
                src[ax] = slice(d, None)
            elif d < 0:
                dst[ax] = slice(-d, None)
                src[ax] = slice(0, d)
        Y[tuple(dst)] += v * X[tuple(src)]
    return Y.reshape(-1)


def ir_solve(apply_f64, b: np.ndarray, inner_solve, tol: float = 1e-8,
             max_outer: int = 6):
    """Iterative refinement driver.

    apply_f64:   x_f64 -> A@x in f64 (host)
    inner_solve: r_f32 -> approximate A^{-1} r (f32, device); any
                 callable returning (dx, inner_iters)
    Returns dict(x, outer_iters, inner_iters_total, relres, wall_s).
    """
    t0 = time.time()
    b = np.asarray(b, np.float64)
    bn = np.linalg.norm(b)
    bn = bn if bn > 0 else 1.0
    x = np.zeros_like(b)
    r = b.copy()
    inner_total = 0
    outer = 0
    relres = 1.0
    for outer in range(1, max_outer + 1):
        # scale the residual to O(1) so the f32 inner solve keeps
        # full mantissa resolution regardless of how small r gets
        rn = np.linalg.norm(r)
        if rn == 0:
            break
        dx, it = inner_solve((r / rn).astype(np.float32))
        inner_total += int(it)
        x = x + rn * np.asarray(dx, np.float64)
        r = b - apply_f64(x)
        relres = float(np.linalg.norm(r) / bn)
        if relres <= tol:
            break
    return {
        "x": x,
        "outer_iters": outer,
        "inner_iters_total": inner_total,
        "relres": relres,
        "wall_s": round(time.time() - t0, 3),
    }
