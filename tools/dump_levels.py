"""Build the 256^3 AMG hierarchy host-side once and save every level's
scipy operators to /tmp/amg_levels_N/ for fast perf iteration (the
host level build is ~130 s; experiments shouldn't pay it repeatedly).

Usage: python tools/dump_levels.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    out = f"/tmp/amg_levels_{n}"
    os.makedirs(out, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from hypre_tpu.gen.laplace import laplacian
    from hypre_tpu.solvers import AmgConfig
    from hypre_tpu.solvers.amg import iter_host_hierarchy

    t0 = time.time()
    A = laplacian(n, n, n)
    print(f"gen {time.time() - t0:.1f}s", flush=True)
    cfg = AmgConfig(interp_type=6, relax_type=18, print_level=1)
    lvl = 0
    for item in iter_host_hierarchy(A, cfg):
        if isinstance(item, tuple):
            Ah, Ph, Rh, cfm = item
            sp.save_npz(f"{out}/A{lvl}.npz", Ah.tocsr())
            sp.save_npz(f"{out}/P{lvl}.npz", Ph.tocsr())
            sp.save_npz(f"{out}/R{lvl}.npz", Rh.tocsr())
            np.save(f"{out}/cf{lvl}.npy", cfm)
            print(f"saved level {lvl} n={Ah.shape[0]} nnz={Ah.nnz} "
                  f"(+{time.time() - t0:.1f}s)", flush=True)
            lvl += 1
        else:
            sp.save_npz(f"{out}/A{lvl}.npz", item.tocsr())
            print(f"saved coarsest {lvl} n={item.shape[0]}", flush=True)
    print(f"done {time.time() - t0:.1f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
