"""Golden-file regression harness.

Analog of the reference's test architecture (SURVEY §4; ref:
src/test/runtest.sh:27-46, TEST_ij/solvers.jobs, solvers.saved):
job files list driver invocations; the runner executes them, extracts
the stable output tail (Iterations / Final Relative Residual Norm),
and compares against checked-in golden files with numeric tolerances.

Job file format (one case per line, '#' comments):
    ij -n 33 33 1 -solver 1 -exec_host
    struct -n 32 32 32 -solver 11 -exec_host

Golden file format (one block per job line):
    # <job line>
    Iterations = <int>
    Final Relative Residual Norm = <float>
"""
from __future__ import annotations

import contextlib
import io
import re
from pathlib import Path

ITER_RE = re.compile(r"Iterations = (\d+)")
RES_RE = re.compile(r"Final Relative Residual Norm = ([0-9.eE+-]+)")


def run_job(line: str) -> tuple[int, float]:
    """Run one driver job in-process; return (iterations, residual)."""
    parts = line.split()
    driver, argv = parts[0], parts[1:]
    if driver == "ij":
        from hypre_tpu.drivers.ij import main
    elif driver == "struct":
        from hypre_tpu.drivers.struct import main
    else:
        raise ValueError(f"unknown driver {driver!r}")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    out = buf.getvalue()
    if rc not in (0, None):
        raise RuntimeError(f"job failed rc={rc}: {line}\n{out}")
    it = ITER_RE.search(out)
    res = RES_RE.search(out)
    if not it or not res:
        raise RuntimeError(f"no golden tail in output of: {line}\n{out}")
    return int(it.group(1)), float(res.group(1))


def read_jobs(path: Path) -> list[str]:
    return [ln.strip() for ln in path.read_text().splitlines()
            if ln.strip() and not ln.strip().startswith("#")]


def read_golden(path: Path) -> list[tuple[int, float]]:
    out = []
    it = res = None
    for ln in path.read_text().splitlines():
        m = ITER_RE.search(ln)
        if m:
            it = int(m.group(1))
        m = RES_RE.search(ln)
        if m:
            res = float(m.group(1))
            out.append((it, res))
    return out


def write_golden(path: Path, jobs: list[str],
                 results: list[tuple[int, float]]):
    with open(path, "w") as f:
        for job, (it, res) in zip(jobs, results):
            f.write(f"# {job}\n")
            f.write(f"Iterations = {it}\n")
            f.write(f"Final Relative Residual Norm = {res:e}\n\n")


def check_suite(jobs_path: Path, golden_path: Path,
                iter_slack: int = 0, res_rtol: float = 1e-3):
    """Run all jobs and compare with goldens (the runtest.sh -rtol
    compare).  Returns list of failure strings (empty = pass)."""
    jobs = read_jobs(jobs_path)
    golden = read_golden(golden_path)
    assert len(jobs) == len(golden), "jobs/golden length mismatch"
    failures = []
    for job, (git, gres) in zip(jobs, golden):
        it, res = run_job(job)
        if abs(it - git) > iter_slack:
            failures.append(f"{job}: iterations {it} != golden {git}")
        if gres != 0 and abs(res - gres) / abs(gres) > res_rtol \
                and res > gres:  # only worse residuals fail
            failures.append(f"{job}: residual {res:e} vs golden {gres:e}")
    return failures


def regenerate(jobs_path: Path, golden_path: Path):
    jobs = read_jobs(jobs_path)
    results = [run_job(j) for j in jobs]
    write_golden(golden_path, jobs, results)


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 2 and sys.argv[1] == "--regen":
        for jp in Path(sys.argv[2] if len(sys.argv) > 2
                       else "tests/golden").glob("*.jobs"):
            regenerate(jp, jp.with_suffix(".saved"))
            print(f"regenerated {jp.with_suffix('.saved')}")
    else:
        fails = []
        for jp in Path("tests/golden").glob("*.jobs"):
            fails += check_suite(jp, jp.with_suffix(".saved"))
        for f in fails:
            print("FAIL:", f)
        sys.exit(1 if fails else 0)
