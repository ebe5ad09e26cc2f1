"""Interactive TPU perf lab: load the dumped 256^3 hierarchy, build the
device operators ONCE, keep the session alive, iterate on experiments.

Run inside tmux:  python -i tools/tpu_repl.py [N]

Helpers defined at the prompt:
  h, amg          — AmgHierarchy / BoomerAMG built from /tmp/amg_levels_N
  time_solve()    — chunked-PCG wall (the judged metric's inner loop)
  time_fori(k)    — fixed-trip fori PCG, k iters, one program
  time_op(op, k)  — one operator's matvec, k applications in one program
  swap_A(l, op)   — replace level l's A operator, rebuild h
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import scipy.sparse as sp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DIR = f"/tmp/amg_levels_{N}"

import jax
import jax.numpy as jnp

from hypre_tpu.core.heartbeat import start_daemon
start_daemon()

from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg
from hypre_tpu.solvers.amg import AmgLevel, amg_cycle
from hypre_tpu.ops.formats import matvec, sparse_op_from_scipy

print(f"backend={jax.default_backend()}", flush=True)

LAPLACE_7PT = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
               ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
               ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]


def load_levels():
    items = []
    lvl = 0
    while os.path.exists(f"{DIR}/P{lvl}.npz"):
        items.append((sp.load_npz(f"{DIR}/A{lvl}.npz"),
                      sp.load_npz(f"{DIR}/P{lvl}.npz"),
                      sp.load_npz(f"{DIR}/R{lvl}.npz"),
                      np.load(f"{DIR}/cf{lvl}.npy")))
        lvl += 1
    Al = sp.load_npz(f"{DIR}/A{lvl}.npz")
    return items, Al


def build(use_stencil=True):
    t0 = time.time()
    items, Al = load_levels()
    print(f"levels loaded {time.time() - t0:.1f}s", flush=True)
    cfg = AmgConfig(interp_type=6, relax_type=18, print_level=1)
    amg = BoomerAMG(cfg)
    amg._fine_stencil = ((N, N, N), LAPLACE_7PT) if use_stencil else None
    dev = []
    for i, it in enumerate(items):
        t1 = time.time()
        a_op = None
        if i == 0 and use_stencil:
            from hypre_tpu.ops.stencil_pallas import (
                stencil_op, stencil_pallas_viable,
            )

            cand = stencil_op((N, N, N), LAPLACE_7PT)
            if jax.default_backend() in ("tpu", "axon") \
                    and stencil_pallas_viable(cand):
                a_op = cand
            else:
                from hypre_tpu.ops.gstell import gstell_from_stencil
                a_op = gstell_from_stencil((N, N, N), LAPLACE_7PT)
        dev.append(amg._build_dev_level(*it, a_op=a_op))
        print(f"level {i} packed {time.time() - t1:.1f}s "
              f"[{type(dev[-1].A).__name__}]", flush=True)
    amg = amg._finish_setup(items, dev, Al, items[0][0].nnz)
    print(f"build total {time.time() - t0:.1f}s", flush=True)
    return amg


def fetch(y):
    return float(jnp.sum(y[:1]))


def time_solve(amg, reps=3, tol=1e-6):
    b = np.ones(N ** 3, dtype=np.float32)
    op = amg.hierarchy.levels[0].A
    res = pcg(A=op, b=b, M=amg.hierarchy, tol=tol, max_iter=100)
    _ = np.asarray(res.x[:1])
    print(f"warm: {int(res.iters)} iters", flush=True)
    ts = []
    for t in range(reps):
        bt = jax.device_put(b * np.float32(1.0 + (t + 1) * 0.0137))
        _ = float(jnp.sum(bt[:1]))
        t1 = time.time()
        res = pcg(A=op, b=bt, M=amg.hierarchy, tol=tol, max_iter=100)
        _ = float(jnp.vdot(res.x, res.x))
        ts.append(time.time() - t1)
    m = float(np.median(ts))
    it = int(res.iters)
    print(f"solve {m:.3f}s @ {it} iters = {m / it * 1e3:.1f} ms/iter "
          f"({['%.3f' % t for t in ts]})", flush=True)
    return m


def time_cycle(amg, k=10):
    """k AMG V-cycles in one program — the per-iter floor."""
    h = amg.hierarchy
    n = h.levels[0].A.shape[0]
    f = jax.jit(lambda h_, r: jnp.sum(jax.lax.fori_loop(
        0, k, lambda _, rr: amg_cycle(h_, rr) * np.float32(2 ** -4), r)))
    r0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal(n).astype(np.float32))
    t0 = time.time()
    s = float(f(h, r0))
    print(f"cycle compile+first {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        s = float(f(h, r0 * np.float32(1.017)))
        best = min(best, time.time() - t0)
    print(f"cycle: {best / k * 1e3:.2f} ms ({k} reps)", flush=True)
    return best / k


def time_op(op, k=20, label=""):
    nc = op.shape[1]
    x0 = jnp.asarray(np.random.default_rng(1)
                     .standard_normal(nc).astype(np.float32) * 1e-10)

    def loop(op_, x):
        def body(_, xx):
            y = matvec(op_, xx)
            return jnp.pad(y, (0, max(nc - y.shape[0], 0)))[:nc] \
                * np.float32(2 ** -4)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    f = jax.jit(loop)
    t0 = time.time()
    s = float(f(op, x0))
    tc = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        s = float(f(op, x0 * np.float32(1.01)))
        best = min(best, time.time() - t0)
    dt = best / k
    nnz = getattr(op, "nnz", 0)
    print(f"{label or type(op).__name__}: {dt * 1e3:.3f} ms "
          f"{nnz / max(dt, 1e-12) / 1e9:.1f} Gnnz/s "
          f"(compile {tc:.1f}s)", flush=True)
    return dt


def swap_A(amg, lno, op, field="A"):
    import dataclasses as dc
    h = amg.hierarchy
    levels = list(h.levels)
    levels[lno] = dc.replace(levels[lno], **{field: op})
    amg.hierarchy = dc.replace(h, levels=tuple(levels))
    return amg


if __name__ == "__main__":
    print("ready: amg = build(); time_solve(amg); ...", flush=True)
