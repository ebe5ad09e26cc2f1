"""GST-ELL kernel micro-benchmark on the real chip.

Usage: python tools/bench_gstell.py [N] [CH_OVERRIDE]
Packs the N^3 7-pt Laplacian analytically and times the matvec.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
if len(sys.argv) > 2:
    os.environ["HYPRE_TPU_GSTELL_CHSTEP"] = sys.argv[2]

from hypre_tpu.ops.gstell import gstell_from_stencil, gstell_matvec

ENTS = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
        ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
        ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]


def main():
    t0 = time.time()
    A = gstell_from_stencil((N, N, N), ENTS)
    print(f"pack {time.time()-t0:.1f}s  c={A.c} G={A.g} B={A.b} "
          f"eb={A.eb} resident={A.resident} ch_step={A.ch_step} "
          f"steps={A.locs.shape[0]} pad={A.vals.size/A.nnz:.2f}",
          flush=True)
    x = jnp.ones((A.n_cols,), jnp.float32)
    f = jax.jit(lambda v: gstell_matvec(A, v))
    t0 = time.time()
    y = f(x)
    jax.block_until_ready(y)
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        y = f(y * 1e-9 + x)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / reps
    print(f"matvec {dt*1e3:.3f} ms  {A.nnz/dt/1e9:.2f} Gnnz/s  "
          f"{(A.vals.size*6)/dt/1e9:.0f} GB/s slot traffic", flush=True)


if __name__ == "__main__":
    main()
