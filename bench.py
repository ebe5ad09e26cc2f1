"""Benchmark driver: BoomerAMG-PCG on the 256^3 7-pt Laplacian.

Mirrors the reference's headline GPU benchmark (TEST_bench out.14:
256^3, 1 GPU, `-rlx 18 -interptype 6 -rap 1`; V100 0.706 s setup /
0.580 s solve at 20 iterations — see BASELINE.md).  Runs on the real
TPU chip in f32 (the --enable-single analog; the reference numbers are
f64 on V100).

The whole pipeline is device-resident: the operator is generated on
the TPU (gstell_from_stencil / dell_stencil), the AMG hierarchy is
built by XLA programs (setup/device_amg.py — the hypre device-setup
analog), and levels pack on device (ops/gstell_device.py).  The host
never holds a matrix.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Honesty rules (round-1 verdict): the SAME problem as the baseline
(256^3, ext+i interp, l1-Jacobi), setup timed end-to-end every run
(generation + hierarchy + packing; no result caching), and vs_baseline
emitted only when the grid actually matches the baseline's (null
otherwise).  vs_baseline > 1 means faster than the V100 solve.

The XLA compilation cache (.jax_cache) is enabled: compiled kernels
are the analog of the reference's precompiled CUDA kernels, so a
warm-cache setup time is the honest comparison point.  The cold
(first-ever) compile adds minutes and is reported separately when it
happens via setup_s.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                      "0.3")

GRID = int(os.environ.get("HYPRE_TPU_BENCH_N", "256"))
# TEST_bench/benchmark_ij.perf.saved.lassen:40-42 (out.14)
V100_SETUP_S = 0.706
V100_SOLVE_S = 0.580
V100_ITERS = 20

LAPLACE_7PT = [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
               ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
               ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)]


def main():
    import jax
    import jax.numpy as jnp

    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    n = GRID
    verbose = int(os.environ.get("HYPRE_TPU_BENCH_VERBOSE", "1"))

    # out.14 config: ext+i interpolation (6), l1-Jacobi (18), PMIS.
    # Setup runs entirely on the TPU; the timed region includes
    # operator generation, hierarchy build, and solve-format packing.
    cfg = AmgConfig(interp_type=6, relax_type=18, print_level=verbose)
    t0 = time.time()
    amg = BoomerAMG(cfg).setup_device(
        stencil=((n, n, n), LAPLACE_7PT))
    t_setup = time.time() - t0
    print(f"[bench] device setup done ({t_setup:.1f}s)",
          file=sys.stderr, flush=True)

    op = amg.hierarchy.levels[0].A
    b = np.ones(n ** 3, dtype=np.float32)

    # compile + warm up; then time three solves with distinct scaled
    # rhs (convergence is scaling-invariant so the work is identical)
    # and take the MEDIAN — the remote-execution layer memoizes
    # (executable, input) pairs and a single repeat can report a
    # fantasy sub-millisecond time.  tol 1e-6: the f32 residual floor
    # (the reference's 7.9e-9 is an f64 number).
    tol = 1e-6
    res = pcg(A=op, b=b, M=amg.hierarchy, tol=tol, max_iter=100)
    _ = np.asarray(res.x[:1])  # genuine host fetch (not just enqueue)
    print(f"[bench] warmup solve done ({int(res.iters)} iters)",
          file=sys.stderr, flush=True)
    # per-process salt: identical rhs values across runs would hit the
    # remote layer's (executable, input) result cache
    salt = np.float32(1.0 + (int.from_bytes(os.urandom(2), "little")
                             % 1000) * 1e-5)
    times = []
    checks = []
    for t in range(3):
        bt = b * (salt + np.float32((t + 1) * 0.0137))
        t0 = time.time()
        res = pcg(A=op, b=bt, M=amg.hierarchy, tol=tol, max_iter=100)
        # force a genuine host fetch: on this relay block_until_ready
        # can be satisfied by enqueue alone
        checks.append(float(jnp.vdot(res.x, res.x)))
        times.append(time.time() - t0)
    t_solve = float(np.median(times))

    iters = int(res.iters)
    nnz = amg.level_nnz[0]
    cyc_nnz = nnz * amg.operator_complexity * iters
    same_problem = (n == 256)
    result = {
        "metric": f"AMG-PCG solve wall, {n}^3 7-pt Laplacian "
                  f"(1 chip, f32, ext+i interp, rlx 18, tol {tol:g})",
        "value": round(t_solve, 4),
        "unit": "s",
        "vs_baseline": (round(V100_SOLVE_S / t_solve, 3)
                        if same_problem else None),
        "extra": {
            "iters": iters,
            "relres": float(res.relres),
            "setup_s": round(t_setup, 2),
            "setup_vs_baseline": (round(V100_SETUP_S / t_setup, 4)
                                  if same_problem else None),
            "per_iter_ms": round(t_solve / max(iters, 1) * 1e3, 2),
            "solve_at_v100_iters_s": round(
                t_solve / max(iters, 1) * V100_ITERS, 4),
            "levels": amg.level_sizes,
            "operator_complexity": round(amg.operator_complexity, 3),
            "approx_cycle_gnnz_per_s": round(cyc_nnz / t_solve / 1e9, 2),
            "setup_path": "device (on-TPU generation+hierarchy+pack)",
            "baseline": ("V100 out.14 (256^3, ext+i, f64): "
                         "setup 0.706s, solve 0.580s @ 20 iters"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
