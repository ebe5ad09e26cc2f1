"""Stage-by-stage diagnostic of the device AMG setup on the real TPU.

Each stage syncs a scalar so a worker crash points at the exact stage.
Usage: python tools/diag_devsetup.py [grid] [stage_limit]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

os.environ.setdefault("HYPRE_TPU_HEARTBEAT_FILE", "/tmp/diag_hb")

import jax
import jax.numpy as jnp

from hypre_tpu.setup import device_amg as dev

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
LIMIT = int(sys.argv[2]) if len(sys.argv) > 2 else 99

LAPLACE_7PT = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
               ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
               ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]

t0 = time.time()


def stamp(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


stamp(f"devices: {jax.devices()}")
A = dev.dell_stencil((N, N, N), LAPLACE_7PT, dtype=jnp.float32)
jax.block_until_ready(A.cols)
stamp(f"stage 1: dell_stencil done sum={int(jnp.sum(A.cols >= 0))}")
if LIMIT <= 1:
    sys.exit(0)

strong = dev.device_strength(A, 0.25, 0.9)
stamp(f"stage 2: strength done nnz={int(jnp.sum(strong))}")
if LIMIT <= 2:
    sys.exit(0)

cf = dev.device_pmis(A, strong, seed=2747)
stamp(f"stage 3: pmis done ncoarse={int(jnp.sum(cf == dev.C_PT))}")
if LIMIT <= 3:
    sys.exit(0)

n_coarse = int(jnp.sum(cf == dev.C_PT))
chunk = dev._interp_chunk(A.width)
stamp(f"stage 4: extpi interp (chunk={chunk}) ...")
P = dev.device_extpi_interp(A, strong, cf, n_coarse=n_coarse,
                            trunc_factor=0.0, max_elmts=4, chunk=chunk)
stamp(f"stage 4: interp done w={P.width} nnz={int(jnp.sum(P.mask))}")
if LIMIT <= 4:
    sys.exit(0)

rchunk = dev._rap_chunk(A.width, P.width)
stamp(f"stage 5: rap (chunk={rchunk}) ...")
Ac, PT = dev.device_rap(A, P, chunk=rchunk, cf=cf)
stamp(f"stage 5: rap done n={Ac.n_rows} w={Ac.width} "
      f"nnz={int(jnp.sum(Ac.mask))}")
