"""Production ingest pin for time_decayed_features: the decayed
feature state carried across epochs through a REAL foreachBatch stream
with parquet-persisted state must equal the one-shot batch operator
over everything — the mergeability the batch op promises (per-row
micro-rounding then exact sums => shard/epoch sums ADD exactly at
fixed now_us), exercised through the streaming machinery rather than a
hand-split DataFrame (the bloom seen-set pin's pattern)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)
NOW_US = 1_706_745_600_000_000  # 2024-02-01T00:00:00Z
HS = (86400, 604800)


def _write(src, name, mtime, rows):
    p = src / name
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [BASE + dt.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(p),
    )
    os.utime(p, (mtime, mtime))


def test_streamed_epoch_state_merges_to_batch(spark, tmp_path):
    from audiopro_essentia_spark.operators.temporal import (
        time_decayed_features,
    )

    e0 = [(1, 0, 2.0), (1, 3600, 1.0), (2, 86400, 4.0)]
    e1 = [(1, 2 * 86400, 0.5), (3, 3 * 86400, 8.0), (2, 90000, 1.25)]
    src = tmp_path / "ev"
    src.mkdir()
    _write(src, "e0.parquet", 1_000_000_000, e0)
    _write(src, "e1.parquet", 1_000_000_060, e1)

    state_dir = str(tmp_path / "state")
    cols = ["n_events"] + [
        c for h in HS for c in (f"decay_count_{h}s", f"decay_sum_{h}s")
    ]

    def handler(bdf, eid):
        mine = time_decayed_features(
            bdf, ["user_id"], "ts", now_us=NOW_US, half_lives_s=HS,
            value_col="value",
        )
        # carry micro-integers in state so the merge is EXACT addition
        mine_u = mine.select(
            "user_id",
            *[
                (F.round(F.col(c) * 1e6)).cast("long").alias(c)
                if c != "n_events"
                else F.col(c)
                for c in cols
            ],
        )
        if os.path.isdir(state_dir):
            prev = bdf.sparkSession.read.parquet(state_dir)
            merged = (
                prev.unionByName(mine_u)
                .groupBy("user_id")
                .agg(*[F.sum(c).cast("long").alias(c) for c in cols])
            )
        else:
            merged = mine_u
        merged.localCheckpoint().write.mode("overwrite").parquet(
            state_dir + "_next"
        )
        bdf.sparkSession.read.parquet(state_dir + "_next").write.mode(
            "overwrite"
        ).parquet(state_dir)

    ev = spark.read.parquet(str(src))
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = {
        r["user_id"]: tuple(r[c] for c in cols)
        for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        r["user_id"]: tuple(
            r[c] if c == "n_events" else int(round(r[c] * 1e6))
            for c in cols
        )
        for r in time_decayed_features(
            ev, ["user_id"], "ts", now_us=NOW_US, half_lives_s=HS,
            value_col="value",
        ).collect()
    }
    assert got == want
    assert set(got) == {1, 2, 3}
