"""Quiet-bracketed min-of-3 timing for STAGED driver entries at sf0.1 —
appends one self-gating JSON line to BENCH/staged_quiet_timing.json
(same shape as the r4 lines: agg8 pre/post bracket, per-query min,
spread, clean flag). Run DETACHED, never concurrently with another
Spark job; touch /tmp/spark_busy around it.

Usage: python tools_staged_timing.py [query ...]   (default: all staged)
"""

import json
import sys
import time

CLEAN_BW = 9.0   # post-outage host: quiet agg8 reads >= 9 GB/s
MAX_SPREAD = 1.5


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from tools_bw_profile import aggregate_bw

    import __spark_entry__ as E
    from audiopro_essentia_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or list(E._staged_queries())
    qs = E._staged_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown staged queries: {unknown}")

    pre = round(max(aggregate_bw(8, dur=2.0), aggregate_bw(8, dur=2.0)), 2)
    spark = get_spark()
    per, spread = {}, {}
    for name in names:
        times = []
        for _ in range(4):  # warmup + 3 measured
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.monotonic() - t0)
        meas = times[1:]
        per[name] = round(min(meas), 3)
        spread[name] = round(max(meas) / min(meas), 2)
    spark.stop()
    time.sleep(5)  # teardown afterglow crushes an immediate probe
    post = round(max(aggregate_bw(8, dur=2.0), aggregate_bw(8, dur=2.0)), 2)
    rec = {
        "sf": 0.1,
        "cpus": 32,
        "agg8_pre": pre,
        "per_query": per,
        "spread": spread,
        "agg8_post": post,
        "clean": pre >= CLEAN_BW
        and post >= CLEAN_BW
        and all(s <= MAX_SPREAD for s in spread.values()),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    import os

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        "staged_quiet_timing.json",
    )  # __file__-anchored: a detached run from any cwd must not lose
    # the record after the multi-minute measurement
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
