"""Aggregate-DRAM-bandwidth profile vs process count — the measurement
behind the single-box scaling ceiling analysis in BENCH/BASELINE.md.

bench.memory_bandwidth_probe() measures ONE thread (the contention
detector); this tool measures how much TOTAL bandwidth N concurrent
processes extract, which is the physical ceiling any N-worker
bandwidth-bound stage scales against on one box:

    python tools_bw_profile.py [n n n ...]   # default 1 2 4 8

Prints one JSON line {n_procs: aggregate_GB_s}. Read+write bytes
counted (a.copy() moves 2x the buffer). Run it in the same window as a
scaling measurement — the ratio C(4N_procs)/C(N_procs) bounds the
speedup of the bus-bound fraction of any N->4N pair, and a real
4x-node cluster has 4x the aggregate bus by construction.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(q, dur: float) -> None:
    import numpy as np

    a = np.zeros(2**25, dtype=np.float64)  # 256 MiB
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        a.copy()
        n += 1
    q.put(2 * a.nbytes * n / (time.perf_counter() - t0) / 1e9)


def _run_and_sum(ps, q, dur: float) -> float:
    """Collect one result per worker with a hard timeout so a dead or
    OOM-killed child can never hang the caller (bench.py runs this
    inside every detached bench; a blocked q.get() there stalls the
    whole measurement silently). Missing results just don't contribute
    — an undercount reads as 'contended', the safe direction."""
    import queue as _queue

    for p in ps:
        p.start()
    vals = []
    deadline = time.perf_counter() + dur + 30.0
    for _ in ps:
        try:
            vals.append(q.get(timeout=max(0.1, deadline - time.perf_counter())))
        except _queue.Empty:
            break
    for p in ps:
        p.join(timeout=5.0)
        if p.is_alive():
            p.terminate()
    return sum(vals)


def aggregate_bw(nproc: int, dur: float = 4.0) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q, dur)) for _ in range(nproc)]
    return _run_and_sum(ps, q, dur)


def _cpu_worker(q, dur: float) -> None:
    import numpy as np

    a = np.zeros((64, 64))  # cache-resident: no DRAM traffic
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        a @ a
        n += 1
    q.put(n / (time.perf_counter() - t0))


def aggregate_cpu(nproc: int, dur: float = 3.0) -> float:
    """Aggregate cache-resident matmuls/s over N processes — the CPU
    axis of the decomposition. Run it NEXT TO aggregate_bw in the same
    window: CPU scaling ~1.0 while bandwidth aggregate is crushed
    proves neighbor load owns only the DRAM bus (cores fully
    available), attributing any sub-1.0 job scaling to the memory
    system rather than to the code's parallel structure."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_cpu_worker, args=(q, dur)) for _ in range(nproc)]
    return _run_and_sum(ps, q, dur)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    counts = [int(a) for a in args] or [1, 2, 4, 8]
    if "--cpu" in sys.argv:
        print(json.dumps({n: round(aggregate_cpu(n)) for n in counts}))
    else:
        print(json.dumps({n: round(aggregate_bw(n), 2) for n in counts}))


if __name__ == "__main__":
    main()
