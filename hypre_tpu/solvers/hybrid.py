"""Hybrid solver: cheap diagonal-scaled Krylov first, switch to AMG
preconditioning if convergence is slow.

Analog of hypre's AMGHybrid (ref: src/parcsr_ls/amg_hybrid.c:1703;
DSCG→AMG switch logic :1922+): run diagonal-scaled CG monitoring the
convergence factor; if the running factor exceeds cf_tol (default 0.9,
ij driver -cf), stop, build BoomerAMG, and continue with AMG-PCG from
the current iterate.  Returns combined iteration counts the way the
driver prints them (dscg_num_its + pcg_num_its).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.solvers.amg import AmgConfig, BoomerAMG


class HybridResult(NamedTuple):
    x: jax.Array
    dscg_iters: int
    pcg_iters: int
    relres: float


@dataclasses.dataclass
class HybridConfig:
    cf_tol: float = 0.9            # convergence-factor switch threshold
    dscg_max_iter: int = 1000
    pcg_max_iter: int = 200
    tol: float = 1e-8
    amg: AmgConfig = dataclasses.field(default_factory=AmgConfig)


def hybrid_solve(A_scipy, b, config: HybridConfig | None = None):
    """DSCG first; monitor convergence factor every iteration; switch
    to AMG-PCG when it exceeds cf_tol."""
    from hypre_tpu.ops.formats import matvec, sparse_op_from_scipy

    cfg = config or HybridConfig()
    op = sparse_op_from_scipy(A_scipy)
    b = jnp.asarray(np.asarray(b))
    dinv = jnp.asarray(1.0 / A_scipy.diagonal())

    bnorm = float(jnp.linalg.norm(b))
    safe_b = bnorm if bnorm > 0 else 1.0

    # --- phase 1: diagonal-scaled CG with CF monitoring -------------
    x = jnp.zeros_like(b)
    r = b
    z = dinv * r
    p = z
    gamma = jnp.vdot(r, z)
    rnorm_prev = float(jnp.linalg.norm(r))
    dscg_iters = 0
    switched = False
    relres = rnorm_prev / safe_b
    while dscg_iters < cfg.dscg_max_iter and relres > cfg.tol:
        s = matvec(op, p)
        alpha = gamma / jnp.vdot(p, s)
        x = x + alpha * p
        r = r - alpha * s
        z = dinv * r
        gamma_new = jnp.vdot(r, z)
        p = z + (gamma_new / gamma) * p
        gamma = gamma_new
        rnorm = float(jnp.linalg.norm(r))
        dscg_iters += 1
        cf = rnorm / max(rnorm_prev, 1e-300)
        rnorm_prev = rnorm
        relres = rnorm / safe_b
        if cf > cfg.cf_tol and dscg_iters >= 2:
            switched = True
            break

    if not switched or relres <= cfg.tol:
        return HybridResult(x=x, dscg_iters=dscg_iters, pcg_iters=0,
                            relres=relres)

    # --- phase 2: AMG-PCG from current iterate ----------------------
    from hypre_tpu.solvers.krylov import pcg

    amg = BoomerAMG(cfg.amg).setup(A_scipy)
    res = pcg(op, b, x0=x, M=amg, tol=cfg.tol,
              max_iter=cfg.pcg_max_iter)
    return HybridResult(x=res.x, dscg_iters=dscg_iters,
                        pcg_iters=int(res.iters),
                        relres=float(res.relres))
