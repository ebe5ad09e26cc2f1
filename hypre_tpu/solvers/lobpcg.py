"""LOBPCG — locally optimal block preconditioned conjugate gradient
eigensolver.

Analog of hypre's LOBPCG (ref: src/krylov/lobpcg.c:208 lobpcg_solve;
HYPRE_lobpcg.c:504).  The reference drives an abstract multivector
through an interpreter vtable and solves its small Gram systems with
serial LAPACK dpotrf/dsygv (lobpcg.c:25-77).  Here a multivector IS an
(n, m) array, Gram systems are jnp.linalg.eigh on (3m, 3m) blocks (the
dense work rides the MXU), and the preconditioner is any callable —
typically a BoomerAMG cycle — applied column-wise.

Finds the `m` smallest eigenpairs of the symmetric operator A.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LobpcgResult(NamedTuple):
    eigenvalues: jax.Array   # (m,)
    eigenvectors: jax.Array  # (n, m)
    iters: int
    resnorms: jax.Array      # (m,)


def _apply_columns(op, X):
    """Apply a single-vector operator to each column of (n, m)."""
    cols = [op(X[:, j]) for j in range(X.shape[1])]
    return jnp.stack(cols, axis=1)


def _ortho(V):
    """Orthonormalize columns (QR; the dpotrf cascade of the ref)."""
    q, _ = jnp.linalg.qr(V)
    return q


def lobpcg(A, X0, M: Callable | None = None, tol: float = 1e-6,
           max_iter: int = 100) -> LobpcgResult:
    """A: SparseOp or callable; X0: (n, m) initial block; M:
    preconditioner r -> z (single vector)."""
    from hypre_tpu.ops.formats import SparseOp, matmat, matvec
    from hypre_tpu.solvers.amg import AmgHierarchy, BoomerAMG, amg_cycle

    if isinstance(A, SparseOp):
        Aop = lambda v: matvec(A, v)  # noqa: E731
        Amulti = lambda X: matmat(A, X)  # noqa: E731  (NV-batched SpMV)
    else:
        Aop = A
        Amulti = None
    if isinstance(M, BoomerAMG):
        h = M.hierarchy
        Mop = lambda r: amg_cycle(h, r)  # noqa: E731
    elif isinstance(M, AmgHierarchy):
        Mop = lambda r: amg_cycle(M, r)  # noqa: E731
    else:
        Mop = M or (lambda r: r)

    X = jnp.asarray(X0)
    n, m = X.shape
    X = _ortho(X)
    AX = Amulti(X) if Amulti is not None else _apply_columns(Aop, X)
    gram = X.T @ AX
    theta, Q = jnp.linalg.eigh(gram)
    X = X @ Q
    AX = AX @ Q
    P = None
    AP = None

    it_done = 0
    resn = None
    for it in range(max_iter):
        R = AX - X * theta[None, :]
        resn = jnp.linalg.norm(R, axis=0) / jnp.maximum(
            jnp.abs(theta), 1e-30)
        it_done = it
        if bool(jnp.max(resn) < tol):
            break
        W = _apply_columns(Mop, R)

        blocks = [X, W] if P is None else [X, W, P]
        S = jnp.concatenate(blocks, axis=1)
        S = _ortho(S)
        AS = Amulti(S) if Amulti is not None else _apply_columns(Aop, S)
        gram = S.T @ AS
        gram = 0.5 * (gram + gram.T)
        th_all, Q = jnp.linalg.eigh(gram)
        Qm = Q[:, :m]
        theta = th_all[:m]
        X_new = S @ Qm
        AX_new = AS @ Qm
        # implicit P: the component of the update orthogonal to X
        Qp = Qm.at[:m, :].set(0.0)
        P = S @ Qp
        AP = AS @ Qp
        X, AX = X_new, AX_new

    return LobpcgResult(eigenvalues=theta, eigenvectors=X,
                        iters=it_done, resnorms=resn)
