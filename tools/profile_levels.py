"""Per-level, per-operator (A/P/R) SpMV profile of the AMG hierarchy.

Answers the round-3 verdict's question: where do the 644 ms/iter go at
256^3?  For each level, times

* y = A_l @ x       (fori_loop of 20 applications inside ONE program)
* z = R_l @ (P_l @ z) (10 round trips, one program)

so per-call relay latency amortizes away, and prints the chosen format
+ ns/nnz + effective GB/s.  Runs on whatever backend is active (real
TPU under axon; CPU with JAX_PLATFORMS=cpu for a smoke test).

Usage: python tools/profile_levels.py [N] [--pcg] [--reps K]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def op_bytes(op) -> int:
    """Approximate HBM traffic of one matvec with this operator."""
    import jax.numpy as jnp

    from hypre_tpu.ops.formats import DenseMatrix, DiaMatrix, EllMatrix
    from hypre_tpu.ops.gstell import GstEllMatrix

    if isinstance(op, GstEllMatrix):
        slot = op.vals.size * (op.vals.dtype.itemsize
                               + op.locs.dtype.itemsize)
        x = op.n_cols * op.vals.dtype.itemsize
        y = op.n_rows * op.vals.dtype.itemsize
        return slot + x + y
    if isinstance(op, DiaMatrix):
        return (op.vals.size + op.n_cols + op.n_rows) \
            * op.vals.dtype.itemsize
    if isinstance(op, EllMatrix):
        return op.vals.size * 8 + (op.n_cols + op.n_rows) * 4
    if isinstance(op, DenseMatrix):
        return op.vals.size * op.vals.dtype.itemsize
    return 0


def fmt_desc(op) -> str:
    from hypre_tpu.ops.formats import DenseMatrix, DiaMatrix, EllMatrix
    from hypre_tpu.ops.gstell import GstEllMatrix

    if isinstance(op, GstEllMatrix):
        return (f"GstEll c={op.c} G={op.g} res={int(op.resident)} "
                f"chs={op.ch_step} b={op.b}")
    if isinstance(op, DiaMatrix):
        return f"Dia d={len(op.offsets)}"
    if isinstance(op, EllMatrix):
        return f"Ell w={op.width}"
    if isinstance(op, DenseMatrix):
        return "Dense"
    return type(op).__name__


def main() -> int:
    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args and args[0].isdigit() else 128
    do_pcg = "--pcg" in args
    reps = 20
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    import jax
    import jax.numpy as jnp

    from hypre_tpu.core.heartbeat import beat, start_daemon
    start_daemon()

    from hypre_tpu.gen.laplace import laplacian
    from hypre_tpu.ops.formats import matvec
    from hypre_tpu.solvers import AmgConfig, BoomerAMG

    print(f"backend={jax.default_backend()} n={n}^3", flush=True)
    t0 = time.time()
    A = laplacian(n, n, n)
    cfg = AmgConfig(interp_type=6, relax_type=18, print_level=1)
    amg = BoomerAMG(cfg).setup(A)
    print(f"setup done {time.time() - t0:.1f}s", flush=True)
    beat("profile setup done")

    h = amg.hierarchy
    key = jax.random.PRNGKey(0)

    def timed(fn, ops, x, label, k):
        """fn(*ops, x) must fold k applications into one program.  ops
        are jit ARGUMENTS (a closed-over operator becomes an HLO
        constant — the whole matrix lands in the remote_compile request
        body and 413s at 256^3)."""
        f = jax.jit(fn)
        t0 = time.time()
        out = f(*ops, x)
        s = float(out)              # genuine host fetch
        t_first = time.time() - t0
        t1 = time.time()
        out = f(*ops, x * np.float32(1.0000173))
        s = float(out)
        t_warm = time.time() - t1
        t2 = time.time()
        out = f(*ops, x * np.float32(1.0000377))
        s = float(out)
        t_run = min(time.time() - t2, t_warm)
        del s
        return t_first, t_run / k

    from hypre_tpu.ops.formats import DenseMatrix

    rows = []
    for lno, lvl in enumerate(h.levels if "--skip-ops" not in args
                              else []):
        if isinstance(lvl.A, DenseMatrix):
            print(f"L{lno}..: Dense (MXU) — skipping (analytic: "
                  f"n^2*4B / 820GB/s)", flush=True)
            break
        nl = lvl.A.shape[0]
        x0 = jax.random.uniform(key, (nl,), jnp.float32) * 1e-20

        def a_loop(A_, x):
            def body(_, x):
                return matvec(A_, x) * np.float32(2.0 ** -6)
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        tf, ta = timed(a_loop, (lvl.A,), x0, f"A{lno}", reps)
        anz = amg.level_nnz[lno]
        gbs = op_bytes(lvl.A) / max(ta, 1e-9) / 1e9
        print(f"L{lno} A n={nl} nnz={anz} [{fmt_desc(lvl.A)}] "
              f"t={ta * 1e3:.3f} ms  {anz / max(ta, 1e-9) / 1e9:.2f} Gnnz/s "
              f"~{gbs:.0f} GB/s (compile+first {tf:.1f}s)", flush=True)
        rows.append(("A", lno, ta))
        beat(f"profiled A{lno}")

        if lvl.P is not None:
            k2 = max(reps // 2, 1)

            def pr_loop(P_, R_, x):
                # z (fine) -> R z (coarse) -> P (R z) (fine)
                def body(_, x):
                    return matvec(P_, matvec(R_, x)) * np.float32(2.0 ** -8)
                return jnp.sum(jax.lax.fori_loop(0, k2, body, x))

            tf, tpr = timed(pr_loop, (lvl.P, lvl.R), x0, f"PR{lno}", k2)
            pnz = lvl.P.nnz if hasattr(lvl.P, "nnz") else 0
            print(f"L{lno} P+R [{fmt_desc(lvl.P)} | {fmt_desc(lvl.R)}] "
                  f"t={tpr * 1e3:.3f} ms (compile+first {tf:.1f}s)",
                  flush=True)
            rows.append(("PR", lno, tpr))
            beat(f"profiled PR{lno}")

    # dinv smoother cost is 2 elementwise passes — bounded by A matvec
    cyc_est = sum(3.0 * t for k, _, t in rows if k == "A") \
        + sum(1.0 * t for k, _, t in rows if k == "PR")
    print(f"\nestimated V-cycle (3*A + P+R per level): "
          f"{cyc_est * 1e3:.1f} ms", flush=True)

    if "--visits" in args:
        # per-level VISIT = exactly the work amg_cycle does at level l
        # (pre-relax, residual, restrict, prolong-correct, post-relax);
        # sum(visits) vs whole-cycle vs pcg isolates composition costs
        from hypre_tpu.solvers.amg import _relax, amg_cycle

        vis_t = []
        for lno, lvl in enumerate(h.levels[:-1]):
            if isinstance(lvl.A, DenseMatrix):
                break
            nl = lvl.A.shape[0]
            ncl = lvl.P.shape[1]
            x0 = jax.random.uniform(key, (nl,), jnp.float32) * 1e-20

            def visit_loop(lvl_, f):
                def body(_, f):
                    u = _relax(lvl_, h.relax_type, h.relax_weight, f,
                               None, h.num_sweeps)
                    r = f - matvec(lvl_.A, u)
                    fc = matvec(lvl_.R, r)
                    u = u + matvec(lvl_.P, fc[:ncl])
                    u = _relax(lvl_, h.relax_type, h.relax_weight, f,
                               u, h.num_sweeps, up=True)
                    return u * np.float32(2.0 ** -8)
                return jnp.sum(jax.lax.fori_loop(0, 10, body, f))

            tf, tv = timed(visit_loop, (lvl,), x0, f"visit{lno}", 10)
            vis_t.append(tv)
            print(f"L{lno} visit t={tv * 1e3:.3f} ms "
                  f"(compile+first {tf:.1f}s)", flush=True)
            beat(f"visit {lno}")
        print(f"sum(visits) = {sum(vis_t) * 1e3:.1f} ms", flush=True)

        xf = jax.random.uniform(key, (h.levels[0].A.shape[0],),
                                jnp.float32) * 1e-20

        def cycle_loop(h_, f):
            def body(_, f):
                return amg_cycle(h_, f) * np.float32(2.0 ** -8)
            return jnp.sum(jax.lax.fori_loop(0, 5, body, f))

        tf, tc = timed(cycle_loop, (h,), xf, "cycle", 5)
        print(f"amg_cycle t={tc * 1e3:.1f} ms (compile+first {tf:.1f}s)",
              flush=True)

    if "--pcgvar" in args:
        # isolate the while_loop cost: same PCG math, fori_loop with a
        # fixed trip count (no data-dependent condition)
        from hypre_tpu.ops.formats import matvec as mv

        b = jnp.asarray(np.ones(n ** 3, dtype=np.float32))

        def pcg_fori(h_, b):
            A0 = h_.levels[0].A
            from hypre_tpu.solvers.amg import amg_cycle as cyc

            r0 = b
            z0 = cyc(h_, r0)
            p0 = z0
            g0 = jnp.vdot(r0, z0)
            x0 = jnp.zeros_like(b)

            def body(_, st):
                x, r, p, g = st
                s = mv(A0, p)
                alpha = g / jnp.vdot(p, s)
                x = x + alpha * p
                r = r - alpha * s
                z = cyc(h_, r)
                gn = jnp.vdot(r, z)
                p = z + (gn / g) * p
                return x, r, p, gn

            x, r, p, g = jax.lax.fori_loop(0, 18, body,
                                           (x0, r0, p0, g0))
            return jnp.vdot(r, r)

        t0 = time.time()
        f = jax.jit(pcg_fori)
        s = float(f(h, b))
        print(f"pcg-fori compile+first {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        s = float(f(h, b * np.float32(1.0171)))
        t1 = time.time() - t0
        t0 = time.time()
        s = float(f(h, b * np.float32(1.0377)))
        t2 = time.time() - t0
        del s
        t = min(t1, t2)
        print(f"pcg-fori(18): {t:.3f}s ({t / 18 * 1e3:.1f} ms/iter)",
              flush=True)

    if do_pcg:
        from hypre_tpu.solvers import pcg
        b = np.ones(n ** 3, dtype=np.float32)
        t0 = time.time()
        res = pcg(A=h.levels[0].A, b=b, M=h, tol=1e-6, max_iter=100)
        _ = np.asarray(res.x[:1])
        t_first = time.time() - t0
        t0 = time.time()
        res = pcg(A=h.levels[0].A, b=b * np.float32(1.0137), M=h,
                  tol=1e-6, max_iter=100)
        _ = np.asarray(res.x[:1])
        t_solve = time.time() - t0
        it = int(res.iters)
        print(f"pcg: {t_solve:.3f}s @ {it} iters "
              f"({t_solve / max(it, 1) * 1e3:.1f} ms/iter; "
              f"compile+first {t_first:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
