"""Per-level solve-phase profiler on the real TPU.

Builds the AMG hierarchy (host native path at N<=128, else device),
then times each level's A/P/R matvec and the full cycle.

Usage: python tools/profile_solve.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def _fetch(out):
    """Force a genuine host fetch (axon defers past block_until_ready)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _fetch(out)

    def run(k):
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        _fetch(o)
        return time.time() - t0

    t1 = run(reps)
    t2 = run(2 * reps)
    return max((t2 - t1) / reps, 1e-9), out


def describe(op):
    t = type(op).__name__
    extra = ""
    if t == "GstEllMatrix":
        pad = op.vals.size / max(op.nnz, 1)
        extra = (f" c={op.c} G={op.g} B={op.b} eb={op.eb} "
                 f"resident={op.resident} ch_step={op.ch_step} "
                 f"pad={pad:.2f}")
    elif t == "EllMatrix":
        extra = f" w={op.vals.shape[0]} (SLOW gather fallback)"
    return t + extra


def main():
    from hypre_tpu.gen.laplace import laplacian
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
    from hypre_tpu.solvers.amg import amg_cycle
    from hypre_tpu.ops.formats import matvec

    import os
    from hypre_tpu.core.checkpoint import load_amg, save_amg

    cfg = AmgConfig(interp_type=6, relax_type=18, print_level=1)
    ckpt = f"/tmp/amg_ckpt_{N}.npz"
    if os.path.exists(ckpt):
        t0 = time.time()
        amg = load_amg(ckpt)
        print(f"ckpt load {time.time()-t0:.1f}s", flush=True)
    else:
        t0 = time.time()
        A = laplacian(N, N, N)
        print(f"gen {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        amg = BoomerAMG(cfg).setup(A)
        print(f"setup {time.time()-t0:.1f}s", flush=True)
        try:
            save_amg(amg, ckpt)
            print("ckpt saved", flush=True)
        except Exception as e:
            print(f"ckpt save failed: {e}", flush=True)

    h = amg.hierarchy
    total_ms = 0.0
    for l, lvl in enumerate(h.levels):
        x = jnp.ones((lvl.A.shape[1],), jnp.float32)
        mv = jax.jit(matvec)
        dt, _ = timeit(lambda v, op=lvl.A: mv(op, v), x, reps=10)
        nnz = amg.level_nnz[l]
        gnnz = nnz / dt / 1e9
        print(f"L{l:2d} n={lvl.A.shape[0]:9d} nnz={nnz:11d} "
              f"A-mv {dt*1e3:8.2f}ms {gnnz:6.2f} Gnnz/s  "
              f"{describe(lvl.A)}", flush=True)
        total_ms += 3 * dt * 1e3
        if lvl.P is not None:
            xc = jnp.ones((lvl.P.shape[1],), jnp.float32)
            dtp, _ = timeit(lambda v, op=lvl.P: mv(op, v), xc, reps=10)
            xf = jnp.ones((lvl.R.shape[1],), jnp.float32)
            dtr, _ = timeit(lambda v, op=lvl.R: mv(op, v), xf, reps=10)
            print(f"    P-mv {dtp*1e3:8.2f}ms {describe(lvl.P)}")
            print(f"    R-mv {dtr*1e3:8.2f}ms {describe(lvl.R)}",
                  flush=True)
            total_ms += (dtp + dtr) * 1e3
    print(f"sum(3*A + P + R) = {total_ms:.1f} ms", flush=True)

    n0 = h.levels[0].A.shape[0]
    f = jnp.ones((n0,), jnp.float32)
    cyc = jax.jit(amg_cycle)
    dt, _ = timeit(lambda v: cyc(h, v), f, reps=5)
    print(f"amg_cycle: {dt*1e3:.2f} ms", flush=True)

    b = np.ones(n0, np.float32)
    t0 = time.time()
    res = pcg(A=h.levels[0].A, b=b, M=h, tol=1e-6, max_iter=100)
    jax.block_until_ready(res.x)
    t1 = time.time()
    res = pcg(A=h.levels[0].A, b=b * 1.017, M=h, tol=1e-6, max_iter=100)
    jax.block_until_ready(res.x)
    t2 = time.time()
    print(f"pcg warm {t2-t1:.3f}s iters={int(res.iters)} "
          f"({(t2-t1)/max(int(res.iters),1)*1e3:.1f} ms/iter; "
          f"first {t1-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
