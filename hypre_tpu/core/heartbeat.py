"""Progress heartbeats for supervised runs (bench.py parent/child).

When HYPRE_TPU_HEARTBEAT_FILE is set, beat(msg) atomically rewrites the
file with `<epoch> <msg>`.  The supervisor treats a stale mtime as a
stalled child (e.g. a TPU client blocked forever on a wedged relay) and
falls over to the next setup path.  No-op (and zero cost) when unset.
"""
from __future__ import annotations

import os
import time

_PATH = os.environ.get("HYPRE_TPU_HEARTBEAT_FILE")
_last = 0.0


def beat(msg: str = "") -> None:
    global _last
    if not _PATH:
        return
    now = time.time()
    if now - _last < 1.0:      # rate-limit: file writes stay negligible
        return
    _last = now
    try:
        tmp = _PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{now:.1f} {msg[:200]}\n")
        os.replace(tmp, _PATH)
    except OSError:
        pass
