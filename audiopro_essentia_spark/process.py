"""Graceful-shutdown plumbing — the analog of the reference's signal-
handling context manager (/root/reference/src/audiopro/utils/process.py:
14-50: SIGTERM/SIGINT set a stop flag the processing loop polls, so an
interrupted run cleans up instead of dying mid-write).

In this engine the loop that matters is CheckpointedWriter's per-bucket
lineage-commit loop (sources/sinks.py): each bucket commit is already
atomic (os.replace), so the only thing a shutdown request needs is a
point BETWEEN commits where the writer can stop. Everything committed
before the stop is durable and exactly-once; everything after stays
uncommitted (invisible to readers) and is rewritten idempotently by the
next run — the resume contract does the heavy lifting, the stop flag
just picks a clean boundary.

The writer accepts anything with an `is_set() -> bool` method, so tests
drive deterministic stop points without real signals.
"""

from __future__ import annotations

import signal
import threading
from contextlib import contextmanager


@contextmanager
def graceful_shutdown():
    """Install SIGTERM/SIGINT handlers that set (and yield) a stop event;
    original handlers are restored on exit. Pass the event as
    `stop_event` to CheckpointedWriter.write / analyze_sequences.

    Must be entered from the main thread (CPython delivers signals
    there; `signal.signal` raises ValueError elsewhere — propagated,
    not masked)."""
    stop = threading.Event()
    original = {}

    def _handler(_signum, _frame):
        stop.set()

    for sig in (signal.SIGTERM, signal.SIGINT):
        original[sig] = signal.signal(sig, _handler)
    try:
        yield stop
    finally:
        for sig, h in original.items():
            signal.signal(sig, h)
