"""GMRES, FlexGMRES, LGMRES, COGMRES, BiCGSTAB, CGNR — pure-JAX Krylov.

Analog of hypre's template solvers (ref: src/krylov/gmres.c:274,
flexgmres.c, lgmres.c, cogmres.c, bicgstab.c, cgnr.c).  Each compiles —
preconditioner cycles included — into a single XLA program via lax
control flow (no host round trips between restarts).

GMRES follows the reference's right-preconditioned restarted
modified-Gram-Schmidt formulation with Givens rotations; default
restart dimension k_dim = 5 matches the ij driver (ref:
src/test/ij.c:1731).  Iterations are counted per Arnoldi step with
early exit on the Hessenberg residual estimate, exactly as the
reference's inner `while (i < k_dim …) { iter++; … }` loop
(gmres.c:534-576).
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
          k_dim: int = 5, _aug=None,
          axis_name: str | None = None) -> KrylovResult:
    """Right-preconditioned restarted GMRES(k_dim), hypre semantics
    (ref: src/krylov/gmres.c:274).  Because the preconditioned basis Z
    is stored explicitly, the same loop is the FGMRES recurrence — M
    may vary between iterations (ref: flexgmres.c).

    _aug: optional (k, n) array of augmentation directions appended to
    the approximation space after the Arnoldi steps (LGMRES support).
    """
    from hypre_tpu.solvers.krylov import make_reducers

    Aop, Mop = _ops(A, M)
    dot, norm = make_reducers(axis_name)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    n = b.shape[0]
    dtype = b.dtype
    m = k_dim

    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def arnoldi_cycle(x):
        r = b - Aop(x)
        beta = norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        Z = jnp.zeros((m, n), dtype)          # preconditioned basis
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(jnp.where(beta > 0, r / jnp.maximum(beta, 1e-300),
                                  0.0))

        def body(j, carry):
            V, Z, H, cs, sn, g, done, cnt = carry
            z = Mop(V[j])
            w = Aop(z)
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, hcol = wh
                hij = dot(V[i], w)
                mask = i <= j
                hij = jnp.where(mask, hij, 0.0)
                return w - hij * V[i], hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                        (w, jnp.zeros(m + 1, dtype)))
            hj1 = norm(w)
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
            g_new = g.at[j + 1].set(g_j1).at[j].set(c_j * g[j])

            V = V.at[j + 1].set(jnp.where(done, V[j + 1], vnext))
            Z = Z.at[j].set(jnp.where(done, Z[j], z))
            H = H.at[:, j].set(jnp.where(done, H[:, j], hcol))
            cs = cs.at[j].set(jnp.where(done, cs[j], c_j))
            sn = sn.at[j].set(jnp.where(done, sn[j], s_j))
            g = jnp.where(done, g, g_new)
            cnt = cnt + jnp.where(done, 0, 1)
            new_done = done | (jnp.abs(g_j1) / safe_b <= tol)
            return V, Z, H, cs, sn, g, new_done, cnt

        V, Z, H, cs, sn, g, done, cnt = jax.lax.fori_loop(
            0, m, body,
            (V, Z, H, cs, sn, g, beta / safe_b <= tol, jnp.int32(0)))

        # back-substitute y from H[:m,:m] (upper triangular) and g
        def back(i_rev, y):
            i = m - 1 - i_rev
            resid = g[i] - jnp.dot(H[i, :], y)
            hii = jnp.where(jnp.abs(H[i, i]) > 0, H[i, i], 1.0)
            return y.at[i].set(resid / hii)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        x_new = x + Z.T @ y
        if _aug is not None:
            # minimize over the augmentation directions one at a time
            # (they are A-orthogonalized implicitly by the line search)
            r = b - Aop(x_new)
            for k in range(_aug.shape[0]):
                zk = _aug[k]
                Az = Aop(zk)
                den = jnp.maximum(dot(Az, Az), 1e-300)
                alpha = dot(Az, r)
                norm_z = norm(zk)
                alpha = jnp.where(norm_z > 0, alpha / den, 0.0)
                x_new = x_new + alpha * zk
                r = r - alpha * Az
        return x_new, cnt

    def cond(st):
        x, it, rel = st
        return (it < max_iter) & (rel > tol) & jnp.isfinite(rel)

    def body(st):
        x, it, _ = st
        x, cnt = arnoldi_cycle(x)
        r = b - Aop(x)
        rel = norm(r) / safe_b
        return x, it + cnt, rel

    r0 = b - Aop(x)
    st = (x, jnp.int32(0), norm(r0) / safe_b)
    x, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def flexgmres(A, b, x0=None, M=None, tol: float = 1e-8,
              max_iter: int = 1000, k_dim: int = 5,
              axis_name: str | None = None) -> KrylovResult:
    """Flexible GMRES (ref: src/krylov/flexgmres.c): the preconditioner
    may change between iterations.  gmres() is right-preconditioned and
    stores the preconditioned basis Z explicitly, which is exactly the
    FGMRES recurrence, so this is the same loop exposed under the
    reference's solver name.  M here may be a stateful callable (tested
    with an iteration-varying preconditioner in tests/test_krylov.py)."""
    return gmres(A, b, x0=x0, M=M, tol=tol, max_iter=max_iter,
                 k_dim=k_dim, axis_name=axis_name)


def lgmres(A, b, x0=None, M=None, tol: float = 1e-8,
           max_iter: int = 1000, k_dim: int = 10,
           aug_dim: int = 2,
           axis_name: str | None = None) -> KrylovResult:
    """LGMRES (ref: src/krylov/lgmres.c): GMRES(k) augmented with the
    last aug_dim error approximations z_i = x_{r} - x_{r-1}.  The whole
    restart loop is one XLA program (lax.while_loop); the augmentation
    queue AUG is a fixed (aug_dim, n) buffer rolled each restart.
    """
    from hypre_tpu.solvers.krylov import make_reducers

    Aop, Mop = _ops(A, M)
    dot, norm = make_reducers(axis_name)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    n = b.shape[0]
    dtype = b.dtype
    aug_dim = max(int(aug_dim), 1)

    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def one_restart(x, AUG):
        res = gmres(Aop, b, x0=x, M=Mop, tol=tol, max_iter=k_dim,
                    k_dim=k_dim, _aug=AUG, axis_name=axis_name)
        z = res.x - x                     # new error approximation
        AUG = jnp.roll(AUG, 1, axis=0).at[0].set(z)
        return res.x, AUG, res.iters

    def cond(st):
        x, AUG, it, rel = st
        return (it < max_iter) & (rel > tol) & jnp.isfinite(rel)

    def body(st):
        x, AUG, it, _ = st
        x, AUG, used = one_restart(x, AUG)
        rel = norm(b - Aop(x)) / safe_b
        return x, AUG, it + used, rel

    r0 = b - Aop(x)
    st = (x, jnp.zeros((aug_dim, n), dtype), jnp.int32(0),
          norm(r0) / safe_b)
    x, AUG, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def cogmres(A, b, x0=None, M=None, tol: float = 1e-8,
            max_iter: int = 1000, k_dim: int = 5,
            axis_name: str | None = None) -> KrylovResult:
    """COGMRES (ref: src/krylov/cogmres.c) — communication-reducing
    GMRES using classical Gram-Schmidt (CGS2) so each Arnoldi step
    needs one fused block reduction instead of j sequential dots.  On
    TPU the fused form is V[:j+1] @ w — a single matmul (one psum when
    distributed).  The restart loop is a lax.while_loop: no host
    dispatch between restarts."""
    from hypre_tpu.solvers.krylov import make_reducers

    Aop, Mop = _ops(A, M)
    dot, norm = make_reducers(axis_name)

    def bdot(V, w):
        h = V @ w
        if axis_name is not None:
            h = jax.lax.psum(h, axis_name)
        return h

    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    n = b.shape[0]
    dtype = b.dtype
    m = k_dim
    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)

    def cycle(x):
        r = b - Aop(x)
        beta = norm(r)
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
            h = bdot(V, w) * mask
            w = w - V.T @ h
            # one reorthogonalization pass (CGS2 stability)
            h2 = bdot(V, w) * mask
            w = w - V.T @ h2
            h = h + h2
            hj1 = norm(w)
            V2 = V.at[j + 1].set(
                jnp.where(hj1 > 0, w / jnp.maximum(hj1, 1e-300), 0.0))
            H2 = H.at[:, j].set(h.at[j + 1].set(hj1))
            return V2, Z.at[j].set(z), H2

        V, Z, H = jax.lax.fori_loop(0, m, body, (V, Z, H))
        e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return x + Z.T @ y

    def cond(st):
        x, it, rel = st
        return (it < max_iter) & (rel > tol) & jnp.isfinite(rel)

    def body(st):
        x, it, _ = st
        x = cycle(x)
        rel = norm(b - Aop(x)) / safe_b
        return x, it + m, rel

    r0 = b - Aop(x)
    st = (x, jnp.int32(0), norm(r0) / safe_b)
    x, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def bicgstab(A, b, x0=None, M=None, tol: float = 1e-8,
             max_iter: int = 1000,
             axis_name: str | None = None) -> KrylovResult:
    """Preconditioned BiCGSTAB (ref: src/krylov/bicgstab.c)."""
    from hypre_tpu.solvers.krylov import make_reducers

    Aop, Mop = _ops(A, M)
    dot, norm = make_reducers(axis_name)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    r0 = b - Aop(x)
    rt = r0  # shadow residual

    def cond(st):
        x, r, p, v, rho, alpha, omega, it, rel = st
        return (it < max_iter) & (rel > tol) & jnp.isfinite(rel)

    def body(st):
        x, r, p, v, rho, alpha, omega, it, _ = st
        rho_new = dot(rt, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = Mop(p)
        v = Aop(ph)
        alpha = rho_new / dot(rt, v)
        s = r - alpha * v
        sh = Mop(s)
        t = Aop(sh)
        omega = dot(t, s) / jnp.maximum(dot(t, t), 1e-300)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        rel = norm(r) / safe_b
        return x, r, p, v, rho_new, alpha, omega, it + 1, rel

    one = jnp.ones((), b.dtype)
    st = (x, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
          jnp.int32(0), norm(r0) / safe_b)
    x, r, p, v, rho, alpha, omega, it, rel = jax.lax.while_loop(
        cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)


def cgnr(A, b, x0=None, M=None, tol: float = 1e-8, max_iter: int = 1000,
         At=None, Mt=None,
         axis_name: str | None = None) -> KrylovResult:
    """CGNR, hypre semantics (ref: src/krylov/cgnr.c:206-434): CG on
    the preconditioned normal equations (AC)ᵀ(AC) y = (AC)ᵀ b with
    x = C y — the preconditioner C sits INSIDE the normal equations
    (cgnr.c:361 "q = A*C*p"; transpose application cgnr.c:380).

    At / Mt: operators for Aᵀ and Cᵀ; default to A / C (symmetric).
    """
    from hypre_tpu.solvers.krylov import make_reducers

    Aop, Mop = _ops(A, M)
    dot, norm = make_reducers(axis_name)
    Atop = Aop if At is None else _ops(At, None)[0]
    Mtop = Mop if Mt is None else _ops(A, Mt)[1]
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    bnorm = norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    r = b - Aop(x)
    s = Mtop(Atop(r))              # s = CᵀAᵀ r
    p = s
    gamma = dot(s, s)

    def cond(st):
        x, r, p, gamma, it, rel = st
        return (it < max_iter) & (rel > tol) & jnp.isfinite(rel)

    def body(st):
        x, r, p, gamma, it, _ = st
        t = Mop(p)                 # t = C p
        w = Aop(t)                 # w = A C p
        alpha = gamma / jnp.maximum(dot(w, w), 1e-300)
        x = x + alpha * t
        r = r - alpha * w
        s = Mtop(Atop(r))
        gamma_new = dot(s, s)
        beta = gamma_new / jnp.maximum(gamma, 1e-300)
        p = s + beta * p
        rel = norm(r) / safe_b
        return x, r, p, gamma_new, it + 1, rel

    st = (x, r, p, gamma, jnp.int32(0), norm(r) / safe_b)
    x, r, p, gamma, it, rel = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x, iters=it, relres=rel)
