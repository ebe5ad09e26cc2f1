"""Retry armor for the TPU relay's transient failure modes.

This environment reaches the TPU through a serializing HTTP relay that
occasionally drops a request mid-flight (observed classes:
`remote_compile: read body: response body closed`, transient
`UNAVAILABLE`/`INTERNAL` RPC errors).  A single dropped request aborted
the whole round-3 judged device-setup path; these calls are safe to
retry because every hypre_tpu device-setup stage is a pure function of
device arrays.

Not retried: `TPU worker process crashed` — after a worker crash the
client's existing buffers are gone, so an in-process retry cannot
succeed; the bench supervisor's path fallback handles that class.
"""
from __future__ import annotations

import sys
import time

TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "read body",
    "UNAVAILABLE: ",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "EOF occurred",
)
FATAL_MARKERS = (
    "worker process crashed",
    "worker process restarted",
)


def is_transient(err: Exception) -> bool:
    s = str(err)
    if any(m in s for m in FATAL_MARKERS):
        return False
    return any(m in s for m in TRANSIENT_MARKERS)


def with_retries(fn, *args, retries: int = 3, backoff_s: float = 5.0,
                 label: str = "", **kwargs):
    """Call fn(*args, **kwargs), retrying transient relay errors with
    linear backoff.  Re-raises immediately on non-transient errors."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            if attempt >= retries or not is_transient(e):
                raise
            attempt += 1
            wait = backoff_s * attempt
            print(f"[relay-retry] {label or getattr(fn, '__name__', '?')}"
                  f" attempt {attempt}/{retries} after transient error: "
                  f"{str(e)[:200]} — sleeping {wait:.0f}s",
                  file=sys.stderr, flush=True)
            try:
                from hypre_tpu.core.heartbeat import beat
                beat(f"relay retry {attempt}")
            except Exception:
                pass
            time.sleep(wait)
