"""A/B: gstell_from_stencil vs gstell_from_scipy on the same operator."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

from hypre_tpu.ops.gstell import (gstell_from_scipy, gstell_from_stencil,
                                  gstell_matvec)
from hypre_tpu.gen.laplace import laplacian

ENTS = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
        ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
        ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]


def run(tag, A):
    print(f"{tag}: c={A.c} G={A.g} B={A.b} eb={A.eb} "
          f"resident={A.resident} ch_step={A.ch_step} "
          f"steps={A.locs.shape[0]} pad={A.vals.size/A.nnz:.2f}",
          flush=True)
    x = jnp.ones((A.n_cols,), jnp.float32)
    f = jax.jit(lambda v: gstell_matvec(A, v))
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(20):
        y = f(y * 1e-9 + x)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / 20
    print(f"{tag}: {dt*1e3:.3f} ms  {A.nnz/dt/1e9:.2f} Gnnz/s", flush=True)


A1 = gstell_from_stencil((N, N, N), ENTS)
run("stencil", A1)
A2 = gstell_from_scipy(laplacian(N, N, N).astype("float32"))
run("scipy  ", A2)

# layout hypothesis: round-trip the jit-produced slot arrays through
# host to force the default device layout
import numpy as np
import dataclasses as dc
A3 = dc.replace(A1, locs=jnp.asarray(np.asarray(A1.locs)),
                vals=jnp.asarray(np.asarray(A1.vals)))
run("stencil-roundtrip", A3)
