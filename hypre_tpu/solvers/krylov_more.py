"""GMRES, FlexGMRES, BiCGSTAB, CGNR — pure-JAX Krylov iterations.

Analog of hypre's template solvers (ref: src/krylov/gmres.c:274,
flexgmres.c, bicgstab.c, cgnr.c).  Each compiles — preconditioner
cycles included — into a single XLA program via lax control flow.

GMRES follows the reference's restarted modified-Gram-Schmidt
formulation with Givens rotations; default restart dimension k_dim = 5
matches the ij driver (ref: src/test/ij.c:1731).  Convergence is the
relative residual ||r||/||b|| <= tol estimated from the rotated
Hessenberg rhs, with the true residual recomputed at restarts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KrylovResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    relres: jax.Array


def _ops(A, M):
    from hypre_tpu.ops.formats import SparseOp, matvec
    from hypre_tpu.solvers.amg import AmgHierarchy, BoomerAMG, amg_cycle

    Aop = partial(matvec, A) if isinstance(A, SparseOp) else A
    if M is None:
        Mop = lambda r: r  # noqa: E731
    elif isinstance(M, BoomerAMG):
        h = M.hierarchy
        Mop = lambda r: amg_cycle(h, r)  # noqa: E731
    elif isinstance(M, AmgHierarchy):
        Mop = lambda r: amg_cycle(M, r)  # noqa: E731
    else:
        Mop = M
    return Aop, Mop


def gmres(A, b, x0=None, M=None, tol: float = 1e-8, max_iter: int = 1000,
          k_dim: int = 5) -> KrylovResult:
    """Right-preconditioned restarted GMRES(k_dim).

    hypre's GMRES applies the preconditioner on the left of the basis
    construction (z = M w, then A z); right preconditioning keeps the
    residual norm of the original system in the Hessenberg recurrence,
    matching the printed convergence histories.
    """
    Aop, Mop = _ops(A, M)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    n = b.shape[0]
    dtype = b.dtype
    m = k_dim

    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def arnoldi_cycle(x):
        r = b - Aop(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        Z = jnp.zeros((m, n), dtype)          # preconditioned basis
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / jnp.maximum(beta, 1e-300),
                                  0.0))

        def body(j, carry):
            V, Z, H, cs, sn, g, done = carry
            z = Mop(V[j])
            w = Aop(z)
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, hcol = wh
                hij = jnp.vdot(V[i], w)
                mask = i <= j
                hij = jnp.where(mask, hij, 0.0)
                return w - hij * V[i], hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                        (w, jnp.zeros(m + 1, dtype)))
            hj1 = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hj1)
            vnext = jnp.where(hj1 > 0, w / jnp.maximum(hj1, 1e-300), 0.0)

            # apply existing Givens rotations to the new column
            def rot(i, hc):
                h_i = cs[i] * hc[i] + sn[i] * hc[i + 1]
                h_i1 = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                mask = i < j
                return hc.at[i].set(jnp.where(mask, h_i, hc[i])) \
                         .at[i + 1].set(jnp.where(mask, h_i1, hc[i + 1]))

            hcol = jax.lax.fori_loop(0, m, rot, hcol)
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            denom = jnp.maximum(denom, 1e-300)
            c_j, s_j = hcol[j] / denom, hcol[j + 1] / denom
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            g_j1 = -s_j * g[j]
            g = g.at[j + 1].set(g_j1).at[j].set(c_j * g[j])

            V = V.at[j + 1].set(jnp.where(done, V[j + 1], vnext))
            Z = Z.at[j].set(jnp.where(done, Z[j], z))
            H = H.at[:, j].set(jnp.where(done, H[:, j], hcol))
            cs = cs.at[j].set(jnp.where(done, cs[j], c_j))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_j))
            new_done = done | (jnp.abs(g_j1) / safe_b <= tol)
            return V, Z, H, cs, sn, g, new_done

        V, Z, H, cs, sn, g, done = jax.lax.fori_loop(
            0, m, body, (V, Z, H, cs, sn, g, beta / safe_b <= tol))

        # back-substitute y from H[:m,:m] (upper triangular) and g
        def back(i_rev, y):
            i = m - 1 - i_rev
            resid = g[i] - jnp.dot(H[i, :], y)
            hii = jnp.where(jnp.abs(H[i, i]) > 0, H[i, i], 1.0)
            return y.at[i].set(resid / hii)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        x_new = x + Z.T @ y
        return x_new

    def cond(st):
        x, it, rel = st
        return (it < max_iter) & (rel > tol)

    def body(st):
        x, it, _ = st
        x = arnoldi_cycle(x)
        r = b - Aop(x)
        rel = jnp.linalg.norm(r) / safe_b
        return x, it + m, rel

    r0 = b - Aop(x)
    st = (x, jnp.int32(0), jnp.linalg.norm(r0) / safe_b)
    x, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def flexgmres(A, b, x0=None, M=None, tol: float = 1e-8,
              max_iter: int = 1000, k_dim: int = 5) -> KrylovResult:
    """Flexible GMRES (ref: src/krylov/flexgmres.c): the preconditioner
    may change between iterations.  Our gmres() is right-preconditioned
    and stores the preconditioned basis Z explicitly, which is exactly
    the FGMRES recurrence, so this is the same loop exposed under the
    reference's solver name (with a fixed M they are identical)."""
    return gmres(A, b, x0=x0, M=M, tol=tol, max_iter=max_iter,
                 k_dim=k_dim)


def lgmres(A, b, x0=None, M=None, tol: float = 1e-8,
           max_iter: int = 1000, k_dim: int = 10,
           aug_dim: int = 2) -> KrylovResult:
    """LGMRES (ref: src/krylov/lgmres.c): GMRES(k) augmented with the
    last aug_dim error approximations.  Implemented by carrying the
    previous restart's update direction into the Krylov block — the
    standard LGMRES(k, aug) construction specialized to a fixed M."""
    Aop, Mop = _ops(A, M)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    prev_x = x
    rel = float(jnp.linalg.norm(b - Aop(x)) / safe_b)
    it = 0
    while it < max_iter and rel > tol:
        res = gmres(Aop, b, x0=x, M=Mop, tol=tol, max_iter=k_dim,
                    k_dim=k_dim)
        # augmentation: one minimization step along the previous
        # restart's update direction z = x_new - x_prev
        z = res.x - prev_x
        r = b - Aop(res.x)
        Az = Aop(z)
        denom = jnp.vdot(Az, Az)
        alpha = jnp.where(denom > 0, jnp.vdot(Az, r) / denom, 0.0)
        prev_x = x
        x = res.x + alpha * z
        it += int(res.iters) + 1
        rel = float(jnp.linalg.norm(b - Aop(x)) / safe_b)
    return KrylovResult(x=x, iters=jnp.int32(it), relres=jnp.asarray(rel))


def cogmres(A, b, x0=None, M=None, tol: float = 1e-8,
            max_iter: int = 1000, k_dim: int = 5) -> KrylovResult:
    """COGMRES (ref: src/krylov/cogmres.c) — communication-reducing
    GMRES using classical Gram-Schmidt so each Arnoldi step needs one
    fused block reduction instead of j sequential dots.  On TPU the
    fused form is V[:j+1] @ w — a single matmul (one psum when
    distributed), which is the entire point of the CO variant."""
    from hypre_tpu.ops.formats import SparseOp, matvec as _mv

    Aop, Mop = _ops(A, M)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    n = b.shape[0]
    dtype = b.dtype
    m = k_dim
    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def cycle(x):
        r = b - Aop(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            jnp.where(beta > 0, r / jnp.maximum(beta, 1e-300), 0.0))
        Z = jnp.zeros((m, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)

        def body(j, carry):
            V, Z, H = carry
            z = Mop(V[j])
            w = Aop(z)
            # classical GS: ONE block dot (V @ w), one update
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * mask
            w = w - V.T @ h
            # one reorthogonalization pass (CGS2 stability)
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h + h2
            hj1 = jnp.linalg.norm(w)
            V2 = V.at[j + 1].set(
                jnp.where(hj1 > 0, w / jnp.maximum(hj1, 1e-300), 0.0))
            H2 = H.at[:, j].set(h.at[j + 1].set(hj1))
            return V2, Z.at[j].set(z), H2

        V, Z, H = jax.lax.fori_loop(0, m, body, (V, Z, H))
        e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return x + Z.T @ y

    r0 = b - Aop(x)
    rel = float(jnp.linalg.norm(r0) / safe_b)
    it = 0
    while it < max_iter and rel > tol:
        x = cycle(x)
        it += m
        rel = float(jnp.linalg.norm(b - Aop(x)) / safe_b)
    return KrylovResult(x=x, iters=jnp.int32(it), relres=jnp.asarray(rel))


def bicgstab(A, b, x0=None, M=None, tol: float = 1e-8,
             max_iter: int = 1000) -> KrylovResult:
    """Preconditioned BiCGSTAB (ref: src/krylov/bicgstab.c)."""
    Aop, Mop = _ops(A, M)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    r0 = b - Aop(x)
    rt = r0  # shadow residual

    def cond(st):
        x, r, p, v, rho, alpha, omega, it, rel = st
        return (it < max_iter) & (rel > tol)

    def body(st):
        x, r, p, v, rho, alpha, omega, it, _ = st
        rho_new = jnp.vdot(rt, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = Mop(p)
        v = Aop(ph)
        alpha = rho_new / jnp.vdot(rt, v)
        s = r - alpha * v
        sh = Mop(s)
        t = Aop(sh)
        omega = jnp.vdot(t, s) / jnp.maximum(jnp.vdot(t, t), 1e-300)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        rel = jnp.linalg.norm(r) / safe_b
        return x, r, p, v, rho_new, alpha, omega, it + 1, rel

    one = jnp.ones((), b.dtype)
    st = (x, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
          jnp.int32(0), jnp.linalg.norm(r0) / safe_b)
    x, r, p, v, rho, alpha, omega, it, rel = jax.lax.while_loop(
        cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def cgnr(A, b, x0=None, M=None, tol: float = 1e-8, max_iter: int = 1000,
         At=None) -> KrylovResult:
    """CG on the normal equations AᵀA x = Aᵀb (ref: src/krylov/cgnr.c).

    At: operator for Aᵀ; for symmetric problems defaults to A.
    """
    Aop, Mop = _ops(A, M)
    Atop = Aop if At is None else _ops(At, None)[0]
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    r = b - Aop(x)
    q = Atop(r)
    z = Mop(q)
    p = z
    gamma = jnp.vdot(q, z)

    def cond(st):
        x, r, p, gamma, it, rel = st
        return (it < max_iter) & (rel > tol)

    def body(st):
        x, r, p, gamma, it, _ = st
        w = Aop(p)
        alpha = gamma / jnp.maximum(jnp.vdot(w, w), 1e-300)
        x = x + alpha * p
        r = r - alpha * w
        q = Atop(r)
        z = Mop(q)
        gamma_new = jnp.vdot(q, z)
        beta = gamma_new / gamma
        p = z + beta * p
        rel = jnp.linalg.norm(r) / safe_b
        return x, r, p, gamma_new, it + 1, rel

    st = (x, r, p, gamma, jnp.int32(0), jnp.linalg.norm(r) / safe_b)
    x, r, p, gamma, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)
