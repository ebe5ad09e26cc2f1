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
import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PcgResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    relres: jax.Array


def make_reducers(axis_name=None):
    """(dot, norm) closures: plain jnp on a single chip, psum-reduced
    over the mesh axis inside shard_map (the MPI_Allreduce analog,
    ref: src/parcsr_mv/par_vector.c:513).  Threading these through the
    Krylov templates is the TPU form of hypre's vtable indirection
    (ref: src/krylov/pcg.h:49-70) — the same solver text runs
    single-chip and SPMD."""
    if axis_name is None:
        def dot(a, b):
            return jnp.vdot(a, b)

        def norm(a):
            return jnp.linalg.norm(a)
    else:
        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), axis_name)

        def norm(a):
            return jnp.sqrt(jax.lax.psum(jnp.vdot(a, a), axis_name))
    return dot, norm


def pcg(A, b, x0=None, M=None, tol: float = 1e-8,
        max_iter: int = 1000, atol: float = 0.0,
        axis_name: str | None = None) -> PcgResult:
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
    if isinstance(A, SparseOp) and (M is None or h is not None) \
            and axis_name is None:
        if jax.default_backend() in ("tpu", "axon"):
            # the axon runtime de-optimizes data-dependent
            # while_loops (measured 57 ms/iter as a fixed-trip fori
            # vs 150-1000 ms/iter as a while_loop at 256^3): run
            # fixed-size fori CHUNKS with predicated updates and
            # check convergence on the host between chunks — state
            # stays on device, only one scalar syncs per chunk
            return _pcg_sparse_chunked(A, h, b, x, float(tol),
                                       float(atol), int(max_iter),
                                       h is not None)
        return _pcg_sparse(A, h, b, x, float(tol), float(atol),
                           int(max_iter), h is not None)

    Aop = partial(matvec, A) if isinstance(A, SparseOp) else A
    Mop = M if M is not None else (lambda r: r)
    if axis_name is not None:
        # inside shard_map: no nested jit (the enclosing program is
        # already being traced), collective reductions
        return _pcg_loop(Aop, Mop, b, x, float(tol), float(atol),
                         int(max_iter), axis_name)
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


def _pcg_loop(Aop, Mop, b, x, tol, atol, max_iter, axis_name=None):
    dot, norm = make_reducers(axis_name)
    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    r0 = b - Aop(x)
    z0 = Mop(r0)
    p0 = z0
    gamma0 = dot(r0, z0)
    rnorm0 = norm(r0)

    def cond(state):
        x, r, p, gamma, it, rnorm = state
        # isfinite: the NaN/Inf guard of par_amg_solve.c:208 — stop
        # iterating instead of spinning to max_iter on a blown-up state
        return ((it < max_iter) & (rnorm / safe_b > tol)
                & (rnorm > atol) & jnp.isfinite(rnorm))

    def body(state):
        x, r, p, gamma, it, _ = state
        s = Aop(p)
        alpha = gamma / dot(p, s)
        x = x + alpha * p
        r = r - alpha * s
        z = Mop(r)
        gamma_new = dot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        rnorm = norm(r)
        return x, r, p, gamma_new, it + 1, rnorm

    state = (x, r0, p0, gamma0, jnp.int32(0), rnorm0)
    x, r, p, gamma, it, rnorm = jax.lax.while_loop(cond, body, state)
    return PcgResult(x=x, iters=it, relres=rnorm / safe_b)


# chunk schedule: FIRST chunk sized to the typical converged count
# (AMG-PCG lands at 13-25 iters across the golden suite) so the common
# solve is ONE program call with ZERO mid-solve host syncs; REST picks
# up stragglers.  Each sync costs ~52 ms of relay RTT plus program
# dispatch, which is material against a sub-second solve wall.
PCG_CHUNK_FIRST = int(os.environ.get("HYPRE_TPU_PCG_CHUNK0", "18"))
PCG_CHUNK = int(os.environ.get("HYPRE_TPU_PCG_CHUNK", "6"))


@partial(jax.jit, static_argnames=("tol", "atol", "max_iter",
                                   "use_amg", "k"))
def _pcg_chunk_start(A, h, b, x, tol, atol, max_iter, use_amg, k):
    from hypre_tpu.ops.formats import matvec
    from hypre_tpu.solvers.amg import amg_cycle

    Aop = partial(matvec, A)
    Mop = (lambda r: amg_cycle(h, r)) if use_amg else (lambda r: r)
    dot, norm = make_reducers(None)
    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    r0 = b - Aop(x)
    z0 = Mop(r0)
    st = (x, r0, z0, dot(r0, z0), jnp.int32(0), norm(r0))
    st = _pcg_chunk_body(Aop, Mop, dot, norm, st, safe_b, tol, atol,
                         max_iter, k)
    return st, safe_b


@partial(jax.jit, static_argnames=("tol", "atol", "max_iter",
                                   "use_amg", "k"))
def _pcg_chunk_step(A, h, st, safe_b, tol, atol, max_iter, use_amg, k):
    from hypre_tpu.ops.formats import matvec
    from hypre_tpu.solvers.amg import amg_cycle

    Aop = partial(matvec, A)
    Mop = (lambda r: amg_cycle(h, r)) if use_amg else (lambda r: r)
    dot, norm = make_reducers(None)
    return _pcg_chunk_body(Aop, Mop, dot, norm, st, safe_b, tol, atol,
                           max_iter, k)


def _pcg_chunk_body(Aop, Mop, dot, norm, st, safe_b, tol, atol,
                    max_iter, k):
    """k PCG iterations with PREDICATED updates: once converged (or
    at max_iter / non-finite), further in-chunk iterations change
    nothing and the iteration count stops — semantics identical to
    the guarded while_loop, but the trip count is static."""
    def body(_, st):
        x, r, p, gamma, it, rnorm = st
        active = ((it < max_iter) & (rnorm / safe_b > tol)
                  & (rnorm > atol) & jnp.isfinite(rnorm))
        s = Aop(p)
        denom = dot(p, s)
        alpha = jnp.where(denom != 0, gamma / jnp.where(denom != 0,
                                                        denom, 1.0), 0)
        xn = x + alpha * p
        rn = r - alpha * s
        z = Mop(rn)
        gn = dot(rn, z)
        beta = jnp.where(gamma != 0, gn / jnp.where(gamma != 0, gamma,
                                                    1.0), 0)
        pn = z + beta * p
        x = jnp.where(active, xn, x)
        r = jnp.where(active, rn, r)
        p = jnp.where(active, pn, p)
        gamma = jnp.where(active, gn, gamma)
        rnorm = jnp.where(active, norm(rn), rnorm)
        it = it + active.astype(jnp.int32)
        return x, r, p, gamma, it, rnorm

    return jax.lax.fori_loop(0, k, body, st)


@jax.jit
def _pcg_chunk_scalars(st, safe_b):
    """(it, rnorm, safe_b) as one f32[3] — ONE host fetch per chunk
    boundary instead of three sequential ~52 ms relay round-trips.
    f32 holds iteration counts exactly up to 2^24."""
    return jnp.stack([st[4].astype(jnp.float32),
                      st[5].astype(jnp.float32),
                      safe_b.astype(jnp.float32)])


def _pcg_sparse_chunked(A, h, b, x, tol, atol, max_iter, use_amg,
                        k0: int = None, k: int = None):
    k0 = min(PCG_CHUNK_FIRST if k0 is None else k0, max(max_iter, 1))
    k = PCG_CHUNK if k is None else k
    st, safe_b = _pcg_chunk_start(A, h, b, x, tol, atol, max_iter,
                                  use_amg, k0)
    while True:
        it, rnorm, sb = np.asarray(_pcg_chunk_scalars(st, safe_b))
        if not (it < max_iter and rnorm / sb > tol and rnorm > atol
                and np.isfinite(rnorm)):
            break
        st = _pcg_chunk_step(A, h, st, safe_b, tol, atol, max_iter,
                             use_amg, k)
    x, r, p, gamma, it, rnorm = st
    return PcgResult(x=x, iters=it, relres=rnorm / safe_b)
