"""Time the RAP substages of the device setup on the real TPU.

Usage: python tools/diag_rap.py [grid]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from hypre_tpu.setup import device_amg as dev

N = int(sys.argv[1]) if len(sys.argv) > 1 else 160

LAPLACE_7PT = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
               ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
               ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]

t0 = time.time()
last = [t0]


def stamp(msg):
    now = time.time()
    print(f"[{now - t0:7.1f}s] (+{now - last[0]:6.1f}s) {msg}",
          flush=True)
    last[0] = now


A = dev.dell_stencil((N, N, N), LAPLACE_7PT, dtype=jnp.float32)
jax.block_until_ready(A.cols)
stamp("stencil")
strong = dev.device_strength(A, 0.25, 0.9)
jax.block_until_ready(strong)
stamp("strength")
cf = dev.device_pmis(A, strong, seed=2747)
n_coarse = int(jnp.sum(cf == dev.C_PT))
stamp(f"pmis nc={n_coarse}")
chunk = dev._interp_chunk(A.width)
P = dev.device_extpi_interp(A, strong, cf, n_coarse=n_coarse,
                            trunc_factor=0.0, max_elmts=4, chunk=chunk)
jax.block_until_ready(P.cols)
stamp(f"interp w={P.width}")

rchunk = dev._rap_chunk(A.width, P.width)
w_ap = dev.device_spgemm_width(A, P, rchunk)
stamp(f"spgemm_width(A,P) = {w_ap} (chunk={rchunk})")
AP = dev.device_spgemm(A, P, w_ap, rchunk)
jax.block_until_ready(AP.cols)
stamp("spgemm(A,P)")
w_pt = dev.device_transpose_width(P)
stamp(f"transpose_width(P) = {w_pt}")
PT = dev.device_transpose(P, w_pt)
jax.block_until_ready(PT.cols)
stamp("transpose(P)")
c2 = max(rchunk // 4, 8192)
w_ac = dev.device_spgemm_width(PT, AP, c2)
stamp(f"spgemm_width(PT,AP) = {w_ac} (chunk={c2})")
Ac = dev.device_spgemm(PT, AP, w_ac, c2)
jax.block_until_ready(Ac.cols)
nnz_c = int(jnp.sum(Ac.mask))
stamp(f"spgemm(PT,AP) n={Ac.n_rows} w={Ac.width} nnz={nnz_c}")
