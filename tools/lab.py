"""Persistent TPU perf lab: build the dumped hierarchy once, then exec
experiment snippets dropped into /tmp/lab_in/*.py (sorted order), each
with the lab globals (amg, h, helpers from tpu_repl).  Output of job
X.py goes to /tmp/lab_out/X.out; the consumed job moves to
/tmp/lab_done/.  Touch /tmp/lab_stop to exit.

Usage: nohup python tools/lab.py 256 > /tmp/lab.log 2>&1 &
"""
import io
import os
import shutil
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

IN, OUT, DONE = "/tmp/lab_in", "/tmp/lab_out", "/tmp/lab_done"
for d in (IN, OUT, DONE):
    os.makedirs(d, exist_ok=True)

sys.argv = ["tpu_repl.py"] + sys.argv[1:]
import importlib.util
spec = importlib.util.spec_from_file_location(
    "tpu_repl", os.path.join(HERE, "tpu_repl.py"))
lab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(lab)

g = lab.__dict__
print("[lab] building hierarchy...", flush=True)
t0 = time.time()
g["amg"] = lab.build()
g["h"] = g["amg"].hierarchy
print(f"[lab] ready ({time.time() - t0:.1f}s); waiting for jobs",
      flush=True)

while not os.path.exists("/tmp/lab_stop"):
    jobs = sorted(f for f in os.listdir(IN) if f.endswith(".py"))
    if not jobs:
        time.sleep(2)
        continue
    job = jobs[0]
    src = os.path.join(IN, job)
    with open(src) as f:
        code = f.read()
    print(f"[lab] running {job}", flush=True)
    buf = io.StringIO()
    real = sys.stdout
    t0 = time.time()
    try:
        sys.stdout = _Tee = type("T", (), {
            "write": lambda s, x: (buf.write(x), real.write(x), None)[-1],
            "flush": lambda s: real.flush()})()
        exec(compile(code, job, "exec"), g)
        status = "ok"
    except Exception:
        tb = traceback.format_exc()
        buf.write(tb)
        real.write(tb)
        status = "error"
    finally:
        sys.stdout = real
    out = buf.getvalue() + f"\n[{status} {time.time() - t0:.1f}s]\n"
    with open(os.path.join(OUT, job[:-3] + ".out"), "w") as f:
        f.write(out)
    shutil.move(src, os.path.join(DONE, job))
    print(f"[lab] {job} {status} ({time.time() - t0:.1f}s)", flush=True)
print("[lab] stop", flush=True)
