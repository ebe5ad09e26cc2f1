"""Stage-level profiler for the device AMG setup path on the real TPU.

Usage: python tools/profile_device_setup.py [N]
Times each setup stage (strength, PMIS, interp, spgemm width, spgemm,
transpose, pack) at the fine level of the N^3 7-pt Laplacian.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from hypre_tpu.setup import device_amg as dev
from hypre_tpu.ops import gstell_device as gd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def t(label, fn):
    t0 = time.time()
    out = fn()
    out_flat = jax.tree_util.tree_leaves(out)
    for o in out_flat:
        if hasattr(o, "block_until_ready"):
            o.block_until_ready()
    t1 = time.time()
    # second run (compiled)
    t2 = time.time()
    out = fn()
    out_flat = jax.tree_util.tree_leaves(out)
    for o in out_flat:
        if hasattr(o, "block_until_ready"):
            o.block_until_ready()
    t3 = time.time()
    print(f"{label:28s} first={t1-t0:8.2f}s  warm={t3-t2:8.2f}s",
          flush=True)
    return out


def main():
    ents = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
            ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
            ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]
    A = t("stencil gen", lambda: dev.dell_stencil((N, N, N), ents))
    strong = t("strength", lambda: dev.device_strength(A, 0.25, 0.9))
    cf = t("pmis", lambda: dev.device_pmis(A.cols, strong, seed=2747))
    n_coarse = int(jnp.sum(cf == dev.C_PT))
    print(f"  n={A.n_rows} n_coarse={n_coarse}", flush=True)
    chunk = dev._interp_chunk(A.width)
    P = t("extpi interp", lambda: dev.device_extpi_interp(
        A, strong, cf, n_coarse=n_coarse, trunc_factor=0.0,
        max_elmts=4, chunk=chunk))
    rchunk = dev._rap_chunk(A.width, P.width)
    w_ap = t("spgemm width A@P", lambda: dev._spgemm_width_dev(
        A, P, chunk=rchunk))
    w_ap = int(w_ap)
    AP = t("spgemm A@P", lambda: dev.device_spgemm(
        A, P, w_ap, rchunk))
    w_pt = t("transpose width", lambda: dev._transpose_width_dev(P))
    w_pt = int(w_pt)
    PT = t("transpose P", lambda: dev.device_transpose(P, w_pt))
    rc2 = max(rchunk // 4, 8192)
    w_ac = t("spgemm width PT@AP", lambda: dev._spgemm_width_dev(
        PT, AP, chunk=rc2))
    w_ac = int(w_ac)
    Ac = t("spgemm PT@AP", lambda: dev.device_spgemm(
        PT, AP, w_ac, rc2))
    print(f"  Ac n={Ac.n_rows} w={Ac.width}", flush=True)
    t("pack Ac gstell", lambda: gd.gstell_from_dell(Ac))


if __name__ == "__main__":
    main()
