"""Krylov solvers as pure JAX iterations.

Analog of hypre's data-structure-blind Krylov templates
(ref: src/krylov/pcg.c:204,318; gmres.c:274).  Instead of a
function-pointer vtable, the "vtable" here is: a matvec closure over a
SparseOp (or any callable A(x)), a preconditioner callable M(r), and
jnp vector ops; the loop is a lax.while_loop so the whole solver
compiles to one XLA program including the preconditioner cycle.

PCG convergence test uses the two-norm form the ij driver selects
(HYPRE_PCGSetTwoNorm(pcg, 1), ref: src/test/ij.c:5019):
||r_k||_2 / ||b||_2 <= tol, with the recursively updated residual.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PcgResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    relres: jax.Array


def pcg(A, b, x0=None, M=None, tol: float = 1e-8,
        max_iter: int = 1000, atol: float = 0.0) -> PcgResult:
    """Preconditioned conjugate gradients (ref: src/krylov/pcg.c:318).

    A: SparseOp (jit-compiled single-program path) or callable x -> A@x
    M: preconditioner — a BoomerAMG object / AmgHierarchy (compiled
       path), a callable r -> z, or None for identity.

    When A is a SparseOp and M is an AMG hierarchy (or None), the
    entire solve — Krylov loop and preconditioner cycles — compiles to
    ONE XLA program; repeated solves with the same shapes hit the jit
    cache.  This matters doubly on TPU where eager dispatch is a
    round-trip per op.
    """
    from hypre_tpu.ops.formats import SparseOp, matvec

    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    h = _as_hierarchy(M)
    if isinstance(A, SparseOp) and (M is None or h is not None):
        return _pcg_sparse(A, h, b, x, float(tol), float(atol),
                           int(max_iter), h is not None)

    Aop = partial(matvec, A) if isinstance(A, SparseOp) else A
    Mop = M if M is not None else (lambda r: r)
    # jit the whole loop even for ad-hoc callables: eager while_loop
    # execution has shown memory-corruption crashes in XLA:CPU, and
    # compiled is what we want anyway (re-traces per call)
    fn = jax.jit(lambda b, x: _pcg_loop(Aop, Mop, b, x, float(tol),
                                        float(atol), int(max_iter)))
    return fn(b, x)


def _as_hierarchy(M):
    from hypre_tpu.solvers.amg import AmgHierarchy, BoomerAMG

    if isinstance(M, BoomerAMG):
        return M.hierarchy
    if isinstance(M, AmgHierarchy):
        return M
    return None


@partial(jax.jit, static_argnames=("tol", "atol", "max_iter", "use_amg"))
def _pcg_sparse(A, h, b, x, tol, atol, max_iter, use_amg):
    from hypre_tpu.ops.formats import matvec
    from hypre_tpu.solvers.amg import amg_cycle

    Aop = partial(matvec, A)
    Mop = (lambda r: amg_cycle(h, r)) if use_amg else (lambda r: r)
    return _pcg_loop(Aop, Mop, b, x, tol, atol, max_iter)


def _pcg_loop(Aop, Mop, b, x, tol, atol, max_iter):
    bi_prod = jnp.vdot(b, b)
    bnorm = jnp.sqrt(bi_prod)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    r0 = b - Aop(x)
    z0 = Mop(r0)
    p0 = z0
    gamma0 = jnp.vdot(r0, z0)
    rnorm0 = jnp.sqrt(jnp.vdot(r0, r0))

    def cond(state):
        x, r, p, gamma, it, rnorm = state
        return (it < max_iter) & (rnorm / safe_b > tol) & (rnorm > atol)

    def body(state):
        x, r, p, gamma, it, _ = state
        s = Aop(p)
        alpha = gamma / jnp.vdot(p, s)
        x = x + alpha * p
        r = r - alpha * s
        z = Mop(r)
        gamma_new = jnp.vdot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        rnorm = jnp.sqrt(jnp.vdot(r, r))
        return x, r, p, gamma_new, it + 1, rnorm

    state = (x, r0, p0, gamma0, jnp.int32(0), rnorm0)
    x, r, p, gamma, it, rnorm = jax.lax.while_loop(cond, body, state)
    return PcgResult(x=x, iters=it, relres=rnorm / safe_b)
