"""streaming_transitions: per-key Markov transition increments with the
key's last event carried as GroupState across micro-batches.

The pin that matters: the BOUNDARY transition between the last event of
epoch e and the first event of epoch e+1 exists only because of the
carried state — a per-batch lag (re-running the batch operator on each
micro-batch independently) silently drops one transition per key per
epoch and re-emits a spurious __START__ row instead. The streamed sum
must equal the batch transition_matrix over the UNION, and must differ
from the per-epoch-sum exactly at those boundary pairs.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

BASE = dt.datetime(2026, 1, 1)


def _write_epoch(src, name, mtime, rows):
    """rows: list of (user_id, seconds_offset, event_type)."""
    p = src / name
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [BASE + dt.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(p),
    )
    # FileStreamSource orders micro-batches by file MTIME — pin strictly
    # increasing mtimes so epoch order is deterministic (test_streaming_
    # stateful.py bloom-test lesson).
    os.utime(p, (mtime, mtime))


EPOCH0 = [
    (1, 0, "view"), (1, 1, "click"), (1, 2, "view"),
    (2, 0, "view"), (2, 5, "purchase"),
    (3, 3, "click"),
]
# epoch 1 continues every user's journey at later event times; the
# boundary transitions are (view->click) u1, (purchase->view) u2,
# (click->click) u3 — none of them present inside either single epoch
# for users 2 and 3.
EPOCH1 = [
    (1, 10, "click"), (1, 11, "purchase"),
    (2, 12, "view"),
    (3, 13, "click"), (3, 14, "purchase"),
]

SCHEMA = "user_id long, ts timestamp, event_type string"


def _run_stream(spark, src, name):
    from audiopro_essentia_spark.streaming.stream_ops import (
        run_to_memory,
        streaming_transitions,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return run_to_memory(streaming_transitions(stream), name)


def test_streamed_sum_equals_batch_matrix_over_union(spark, tmp_path):
    from audiopro_essentia_spark.operators.temporal import transition_matrix

    src = tmp_path / "ev"
    src.mkdir()
    _write_epoch(src, "e0.parquet", 1_000_000_000, EPOCH0)
    _write_epoch(src, "e1.parquet", 1_000_000_060, EPOCH1)

    inc = _run_stream(spark, src, "trans_stream")
    got = {
        (r.prev, r.curr): r.cnt
        for r in inc.groupBy("prev", "curr")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }

    union = spark.read.parquet(str(src))
    exp = {
        (r.prev, r.curr): r.cnt
        for r in transition_matrix(union).collect()
    }
    assert got == exp
    # exactly one __START__ departure per key, regardless of epoch count
    assert sum(n for (p, _), n in got.items() if p == "__START__") == 3
    # the three boundary transitions are present (the continuity pin)
    for pair in [("view", "click"), ("purchase", "view"), ("click", "click")]:
        assert got.get(pair, 0) >= 1, pair
    # ... and a per-batch lag (batch operator per epoch, summed) would
    # NOT produce this matrix: it re-starts every key each epoch.
    e0 = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), t) for u, s, t in EPOCH0], SCHEMA
    )
    e1 = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), t) for u, s, t in EPOCH1], SCHEMA
    )
    per_epoch = {}
    for part in (e0, e1):
        for r in transition_matrix(part).collect():
            per_epoch[(r.prev, r.curr)] = (
                per_epoch.get((r.prev, r.curr), 0) + r.cnt
            )
    assert per_epoch != exp
    assert (
        sum(n for (p, _), n in per_epoch.items() if p == "__START__") == 6
    )  # the 3 spurious restarts the carried state prevents


def test_single_batch_matches_batch_operator(spark, tmp_path):
    """One micro-batch (no carried state involved): increments sum to the
    batch matrix — pins the in-batch (ts, type) total order too, via the
    same-timestamp tie in EPOCH0 ((2,0,view) vs (1,0,view) are different
    keys; add an in-key tie)."""
    from audiopro_essentia_spark.operators.temporal import transition_matrix

    rows = EPOCH0 + [(1, 0, "click")]  # u1 tie at t=0: click orders first
    src = tmp_path / "ev1"
    src.mkdir()
    _write_epoch(src, "e0.parquet", 1_000_000_000, rows)

    inc = _run_stream(spark, src, "trans_stream_one")
    got = {
        (r.prev, r.curr): r.cnt
        for r in inc.groupBy("prev", "curr")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    exp = {
        (r.prev, r.curr): r.cnt
        for r in transition_matrix(spark.read.parquet(str(src))).collect()
    }
    assert got == exp
    assert got[("__START__", "click")] >= 1  # the tie resolved click-first


def test_out_of_order_epoch_fails_loud(spark, tmp_path):
    """A later micro-batch whose min event time precedes the carried
    last event time must raise the NAMED guard, not splice a transition
    that never happened."""
    src = tmp_path / "ev_ooo"
    src.mkdir()
    _write_epoch(src, "e0.parquet", 1_000_000_000, [(1, 100, "view")])
    _write_epoch(src, "e1.parquet", 1_000_000_060, [(1, 50, "click")])
    with pytest.raises(Exception, match="out-of-order"):
        _run_stream(spark, src, "trans_stream_ooo")


def test_null_type_fails_loud(spark, tmp_path):
    src = tmp_path / "ev_null"
    src.mkdir()
    p = src / "e0.parquet"
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1], pa.int64()),
                "ts": pa.array([BASE], pa.timestamp("us")),
                "event_type": pa.array([None], pa.string()),
            }
        ),
        str(p),
    )
    with pytest.raises(Exception, match="NULL event_type"):
        _run_stream(spark, src, "trans_stream_null")
