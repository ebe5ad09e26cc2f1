"""Reproduce hypre's richer TEST_bench golden rows 1:1 (round-3 verdict
weak #6): the aggressive-coarsening, 27-pt and Chebyshev cases, at FULL
problem size, CPU f64 (the hypre-double build analog).

Reference iteration counts (benchmark_ij.saved.lassen):
  out.5  256x256x128 27pt ext+i rlx18          -> 18 its / 6.10e-9
  out.17 256x256x128 27pt rlx7 w.85 agg1 int5  -> 20 its / 3.33e-9
  out.22 256x256x128 rlx16 cheby               -> 13 its / 1.76e-9
  out.26 248^3 27pt rlx18 ns2 agg2 int8 Pmx8   -> 37 its / 7.07e-9

Our CF splitting uses a different (sharding-invariant) PMIS hash, so
counts match hypre's STATISTICALLY, not bit-for-bit; the pass band is
+/-25% (looser than runtest perf rtol 0.15 because iteration counts on
different C/F draws vary more).  Results are recorded in PARITY.md.

Usage: python tools/golden_cases.py [case...]   (default: 5 17 22)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

CASES = {
    "1": dict(dims=(256, 256, 128), pts=7, golden=55,
              cfg=dict(interp_type=3, relax_type=18)),
    "2": dict(dims=(128, 128, 384), pts=7, golden=46,
              cfg=dict(interp_type=3, relax_type=7,
                       relax_weight=0.85)),
    "3": dict(dims=(4096, 4096, 1), pts=9, golden=92,
              cfg=dict(interp_type=3, relax_type=18)),
    "4": dict(dims=(256, 256, 128), pts=7, golden=21,
              cfg=dict(interp_type=14, relax_type=18)),
    "5": dict(dims=(256, 256, 128), pts=27, golden=18,
              cfg=dict(interp_type=6, relax_type=18)),
    "17": dict(dims=(256, 256, 128), pts=27, golden=20,
               cfg=dict(relax_type=7, relax_weight=0.85,
                        agg_num_levels=1, agg_interp_type=5,
                        interp_type=6)),
    "22": dict(dims=(256, 256, 128), pts=7, golden=13,
               cfg=dict(relax_type=16, interp_type=6)),
    "26": dict(dims=(248, 248, 248), pts=27, golden=37,
               cfg=dict(relax_type=18, num_sweeps=2, agg_num_levels=2,
                        agg_interp_type=8, p_max_elmts=8,
                        max_row_sum=0.9, interp_type=6)),
}


def run(case: str) -> bool:
    from hypre_tpu.gen.laplace import laplacian, laplacian_27pt
    from hypre_tpu.ops import sparse_op_from_scipy
    from hypre_tpu.solvers import AmgConfig, BoomerAMG, pcg

    spec = CASES[case]
    nx, ny, nz = spec["dims"]
    t0 = time.time()
    if spec["pts"] == 27:
        A = laplacian_27pt(nx, ny, nz)
    elif spec["pts"] == 9:
        from hypre_tpu.gen.laplace import laplacian_9pt

        A = laplacian_9pt(nx, ny)
    else:
        A = laplacian(nx, ny, nz)
    print(f"out.{case}: gen {time.time() - t0:.0f}s "
          f"n={A.shape[0]} nnz={A.nnz}", flush=True)
    t0 = time.time()
    amg = BoomerAMG(AmgConfig(**spec["cfg"])).setup(A)
    print(f"out.{case}: setup {time.time() - t0:.0f}s "
          f"opc={amg.operator_complexity:.2f}", flush=True)
    b = np.ones(A.shape[0])
    t0 = time.time()
    res = pcg(A=sparse_op_from_scipy(A), b=b, M=amg, tol=1e-8,
              max_iter=200)
    it, rr = int(res.iters), float(res.relres)
    g = spec["golden"]
    ok = abs(it - g) <= max(round(0.25 * g), 2)
    print(f"out.{case}: {it} iters (golden {g}) relres {rr:.2e} "
          f"solve {time.time() - t0:.0f}s -> "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def main():
    cases = sys.argv[1:] or ["5", "17", "22"]
    fails = [c for c in cases if not run(c)]
    print("RESULT:", "all-pass" if not fails else f"fails={fails}",
          flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
