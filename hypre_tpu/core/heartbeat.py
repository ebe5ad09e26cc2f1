"""Progress heartbeats for supervised runs (bench.py parent/child).

When HYPRE_TPU_HEARTBEAT_FILE is set, beat(msg) atomically rewrites the
file with `<epoch> <msg>`.  The supervisor treats a stale mtime as a
stalled child (e.g. a TPU client blocked forever on a wedged relay) and
falls over to the next setup path.  No-op (and zero cost) when unset.

Two beat sources:

* beat(msg) — a MANUAL beat marking real algorithmic progress
  (a level built, a solve finished).
* start_daemon() — a background thread that refreshes the file every
  DAEMON_PERIOD_S seconds *as long as the last manual beat is younger
  than PHASE_BUDGET_S*.  This keeps the child alive through minutes of
  silent work (cold XLA compiles on this environment routinely take
  5-15 minutes with zero Python-side callbacks — the round-3 judged
  bench was killed mid-compile by its own supervisor for exactly this
  reason) while still letting the supervisor detect a truly wedged TPU
  client: a client stuck forever on a relay call stops beating once
  the phase budget runs out.
"""
from __future__ import annotations

import os
import threading
import time

_PATH = os.environ.get("HYPRE_TPU_HEARTBEAT_FILE")
_last = 0.0
_last_manual = time.time()
DAEMON_PERIOD_S = float(os.environ.get("HYPRE_TPU_HB_PERIOD_S", "15"))
# How long the daemon keeps covering after the last MANUAL beat.  Cold
# XLA compiles here run 5-15 min with zero Python callbacks, so this
# must exceed 900 s; but covering too long delays true-wedge detection
# (supervisor stall = PHASE_BUDGET_S + STALL_S), starving the fallback
# setup path inside the judged budget — 1200 s detects a wedge in
# ~30 min and still leaves the host path ~15 min of a 45 min budget.
PHASE_BUDGET_S = float(os.environ.get("HYPRE_TPU_HB_PHASE_S", "1200"))
_daemon_started = False
_lock = threading.Lock()


def _write(msg: str) -> None:
    if not _PATH:
        return
    try:
        tmp = _PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{time.time():.1f} {msg[:200]}\n")
        os.replace(tmp, _PATH)
    except OSError:
        pass


def beat(msg: str = "") -> None:
    """Manual beat: marks real progress and refreshes the file."""
    global _last, _last_manual
    now = time.time()
    _last_manual = now
    if now - _last < 1.0:      # rate-limit: file writes stay negligible
        return
    _last = now
    _write(msg)


def _daemon_loop() -> None:
    while True:
        time.sleep(DAEMON_PERIOD_S)
        if time.time() - _last_manual > PHASE_BUDGET_S:
            continue           # phase budget exhausted: stop covering
        _write("(daemon)")


def start_daemon() -> None:
    """Start the background beat thread (idempotent, daemonized)."""
    global _daemon_started
    if not _PATH:
        return
    with _lock:
        if _daemon_started:
            return
        _daemon_started = True
    t = threading.Thread(target=_daemon_loop, name="hb-daemon",
                         daemon=True)
    t.start()
