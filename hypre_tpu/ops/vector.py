"""Dense vector kernels.

Analog of hypre's seq_mv vector ops (ref: src/seq_mv/vector.c, e.g.
hypre_SeqVectorInnerProd at vector.c:1070).  On TPU these are trivial
jnp expressions that XLA fuses into neighbors; they exist as named
functions so the Krylov vtable layer (ref: src/krylov/pcg.h:49-70) has
explicit counterparts and so tests/benchmarks can target them.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(x, y):
    return jnp.vdot(x, y)


def norm2(x):
    return jnp.sqrt(jnp.vdot(x, x))


def axpy(alpha, x, y):
    """y <- alpha*x + y"""
    return alpha * x + y


def scale(alpha, x):
    return alpha * x


def copy(x):
    return x


def clear(x):
    return jnp.zeros_like(x)
