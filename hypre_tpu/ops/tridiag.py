"""Batched tridiagonal solves via cyclic reduction.

TPU-native analog of hypre's cyclic reduction solver
(ref: src/struct_ls/cyclic_reduction.c:50-88) and the workhorse for
SMG's line relaxation (ref: src/struct_ls/smg_relax.c).  Thomas'
algorithm is sequential; cyclic reduction is log2(n) vectorized steps,
each eliminating the odd unknowns — every step is pure VPU work over
the whole batch of lines at once.

Systems: a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i], batched over
leading dimensions; the line axis is the LAST axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def _pad_last(x, k, value=0.0):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k)],
                   constant_values=value)


def tridiag_solve(a, b, c, d):
    """Solve batched tridiagonal systems by cyclic reduction.

    a, b, c, d: (..., n); a[..., 0] and c[..., n-1] are ignored.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    a = a.at[..., 0].set(0.0)
    c = c.at[..., -1].set(0.0)
    orig_n = d.shape[-1]

    stack = []
    while d.shape[-1] > 2:
        n = d.shape[-1]
        if n % 2 == 0:
            # append an identity row so the last index is even (kept)
            a = _pad_last(a, 1)
            b = _pad_last(b, 1, 1.0)
            c = _pad_last(c, 1)
            d = _pad_last(d, 1)
            n += 1
        stack.append((a, b, c, d, n))

        ae, be, ce, de = a[..., 0::2], b[..., 0::2], c[..., 0::2], d[..., 0::2]
        ao, bo, co, do_ = (a[..., 1::2], b[..., 1::2], c[..., 1::2],
                           d[..., 1::2])
        # even index k couples odd neighbors 2k-1 (left) and 2k+1 (right)
        alpha = ae[..., 1:] / bo            # a_{2k} / b_{2k-1},  k >= 1
        beta = ce[..., :-1] / bo            # c_{2k} / b_{2k+1},  k <= m-1

        a_new = jnp.concatenate(
            [jnp.zeros_like(ae[..., :1]), -alpha * ao], axis=-1)
        c_new = jnp.concatenate(
            [-beta * co, jnp.zeros_like(ce[..., :1])], axis=-1)
        b_new = (be
                 - jnp.concatenate([jnp.zeros_like(be[..., :1]),
                                    alpha * co], axis=-1)
                 - jnp.concatenate([beta * ao,
                                    jnp.zeros_like(be[..., :1])], axis=-1))
        d_new = (de
                 - jnp.concatenate([jnp.zeros_like(de[..., :1]),
                                    alpha * do_], axis=-1)
                 - jnp.concatenate([beta * do_,
                                    jnp.zeros_like(de[..., :1])], axis=-1))
        a, b, c, d = a_new, b_new, c_new, d_new

    # tiny direct solve
    if d.shape[-1] == 1:
        x = d / b
    else:
        det = b[..., 0] * b[..., 1] - c[..., 0] * a[..., 1]
        x0 = (d[..., 0] * b[..., 1] - c[..., 0] * d[..., 1]) / det
        x1 = (b[..., 0] * d[..., 1] - a[..., 1] * d[..., 0]) / det
        x = jnp.stack([x0, x1], axis=-1)

    # back substitution: odd unknowns from even neighbors
    for a_l, b_l, c_l, d_l, n_l in reversed(stack):
        xe = x[..., :(n_l + 1) // 2]  # deeper level may be padded
        xo = (d_l[..., 1::2]
              - a_l[..., 1::2] * xe[..., :-1]
              - c_l[..., 1::2] * xe[..., 1:]) / b_l[..., 1::2]
        out = jnp.zeros(d_l.shape, dtype=d_l.dtype)
        out = out.at[..., 0::2].set(xe)
        out = out.at[..., 1::2].set(xo)
        x = out
    return x[..., :orig_n]


def tridiag_from_stencil(b_center, a_left, c_right, rhs):
    """Convenience wrapper with explicit names."""
    return tridiag_solve(a_left, b_center, c_right, rhs)
