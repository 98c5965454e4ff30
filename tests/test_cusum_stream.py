"""cusum_epoch (operators/temporal.py): streaming CUSUM continuation —
chained epochs equal the one-shot batch operator EXACTLY (grouped +
global, including a silent group and an empty global epoch), the
per-epoch-restart counterexample (a boundary-straddling shift the
restart misses), the out-of-order watermark fail-loud, and a REAL
foreachBatch stream with parquet-persisted state (the decay-stream pin
pattern)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.operators.temporal import (
    cusum_changepoints,
    cusum_epoch,
)

SCHEMA = "grp string, t long, x double, mu double"


def _series():
    rows = []
    for t in range(60):  # group a: shift at t=35 (straddles epoch cut)
        base = 10.0 if t < 35 else 12.5
        rows.append(("a", t, base + 0.25 * ((t * 7) % 5 - 2), 10.0))
    for t in range(25):  # group b: only in epochs 1 and 3
        tt = t if t < 12 else t + 30
        rows.append(("b", tt, 5.0 + 0.5 * ((t * 3) % 3 - 1), 5.0))
    return rows


def _key(r):
    return (r["grp"], r["t_us"]) if "grp" in r.__fields__ else r["t_us"]


def _rows_of(df):
    return {
        tuple(r[c] for c in df.columns): None for r in df.collect()
    }.keys()


def _chain(spark, epochs, g, k=0.5, h=5.0):
    state = None
    outs = []
    for rows in epochs:
        df = spark.createDataFrame(rows, SCHEMA)
        out, state = cusum_epoch(df, state, "x", "t", "mu", g, k, h)
        outs.append(set(_rows_of(out)))
    return set().union(*outs), state


def test_chained_epochs_equal_batch(spark):
    rows = _series()
    cut1, cut2 = 20, 40
    epochs = [
        [r for r in rows if r[1] < cut1],
        [r for r in rows if cut1 <= r[1] < cut2],
        [r for r in rows if r[1] >= cut2],
    ]
    got, state = _chain(spark, epochs, ["grp"])
    batch = set(
        _rows_of(
            cusum_changepoints(
                spark.createDataFrame(rows, SCHEMA), "x", "t", "mu",
                ["grp"], 0.5, 5.0,
            )
        )
    )
    assert got == batch
    # carried watermark is each group's max t
    st = {r["grp"]: r["_t_last"] for r in state.collect()}
    assert st == {"a": 59, "b": 54}


def test_global_mode_with_empty_epoch(spark):
    rows = [r for r in _series() if r[0] == "a"]
    epochs = [
        [r for r in rows if r[1] < 30],
        [],  # an empty epoch must not lose the carried state
        [r for r in rows if r[1] >= 30],
    ]
    got, _ = _chain(spark, epochs, None)
    batch = set(
        _rows_of(
            cusum_changepoints(
                spark.createDataFrame(rows, SCHEMA), "x", "t", "mu",
                None, 0.5, 5.0,
            )
        )
    )
    assert got == batch


def test_first_epoch_equals_batch(spark):
    rows = [r for r in _series() if r[1] < 20]
    df = spark.createDataFrame(rows, SCHEMA)
    out, _ = cusum_epoch(df, None, "x", "t", "mu", ["grp"])
    batch = cusum_changepoints(df, "x", "t", "mu", ["grp"])
    assert set(_rows_of(out)) == set(_rows_of(batch))


def test_restart_misses_straddling_shift(spark):
    """The pin that justifies carried state: restarting CUSUM at each
    epoch resets S at the boundary and misses (or delays) the alarm
    for a shift straddling it; the chained version fires exactly as
    the one-shot batch does."""
    # gentle shift (+1.0 vs slack 0.5 -> ~0.5/step): epoch 1 ends with
    # S ~ 2.5 < h, so only the CARRIED sum can alarm on time
    rows = [
        ("a", t, (10.0 if t < 35 else 11.0) + 0.25 * ((t * 7) % 5 - 2),
         10.0)
        for t in range(60)
    ]
    epochs = [
        [r for r in rows if r[1] < 40],     # shift begins at 35
        [r for r in rows if r[1] >= 40],
    ]
    chained, _ = _chain(spark, epochs, ["grp"])
    ch_alarm = {t for (g, t, x, sp, sn, ap, an) in chained if ap}
    # naive restart: run the BATCH operator per epoch independently
    naive_alarm = set()
    for ep in epochs:
        out = cusum_changepoints(
            spark.createDataFrame(ep, SCHEMA), "x", "t", "mu",
            ["grp"], 0.5, 5.0,
        )
        naive_alarm |= {
            r["t_us"] for r in out.collect() if r["alarm_pos"]
        }
    assert ch_alarm, "chained must alarm on the shift"
    first_chained = min(ch_alarm)
    assert (not naive_alarm) or min(naive_alarm) > first_chained
    assert len(naive_alarm) < len(ch_alarm)


def test_out_of_order_fails_loud(spark):
    e0 = [("a", 10, 1.0, 1.0)]
    e1 = [("a", 10, 2.0, 1.0)]  # at the carried watermark
    df0 = spark.createDataFrame(e0, SCHEMA)
    out, state = cusum_epoch(df0, None, "x", "t", "mu", ["grp"])
    out.collect()
    df1 = spark.createDataFrame(e1, SCHEMA)
    out1, _ = cusum_epoch(df1, state, "x", "t", "mu", ["grp"])
    with pytest.raises(Exception, match="out-of-order ts"):
        out1.collect()


def test_foreachbatch_stream_pin(spark, tmp_path):
    """The production shape: parquet-persisted state driven by a real
    foreachBatch stream over two mtime-ordered epoch files."""
    rows = [r for r in _series() if r[0] == "a"]
    base = dt.datetime(2024, 1, 1)
    src = tmp_path / "src"
    src.mkdir()
    for i, (lo, hi, mt) in enumerate(((0, 30, 1_000_000_000),
                                      (30, 60, 1_000_000_060))):
        ep = [r for r in rows if lo <= r[1] < hi]
        pq.write_table(
            pa.table(
                {
                    "grp": pa.array([r[0] for r in ep]),
                    "t": pa.array([r[1] for r in ep], pa.int64()),
                    "x": pa.array([r[2] for r in ep], pa.float64()),
                    "mu": pa.array([r[3] for r in ep], pa.float64()),
                }
            ),
            str(src / f"e{i}.parquet"),
        )
        os.utime(src / f"e{i}.parquet", (mt, mt))

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")

    def handler(bdf, eid):
        ss = bdf.sparkSession
        prev = (
            ss.read.parquet(state_dir)
            if os.path.isdir(state_dir)
            else None
        )
        out, state = cusum_epoch(
            bdf, prev, "x", "t", "mu", ["grp"], 0.5, 5.0
        )
        out.write.mode("append").parquet(out_dir)
        state.write.mode("overwrite").parquet(state_dir + "_tmp")
        ss.read.parquet(state_dir + "_tmp").write.mode(
            "overwrite"
        ).parquet(state_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(handler).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    got = set(_rows_of(spark.read.parquet(out_dir)))
    batch = set(
        _rows_of(
            cusum_changepoints(
                spark.createDataFrame(rows, SCHEMA), "x", "t", "mu",
                ["grp"], 0.5, 5.0,
            )
        )
    )
    assert got == batch
