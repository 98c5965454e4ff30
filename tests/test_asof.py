"""J1 as-of join: golden = pandas merge_asof per doc (FIXTURES.md §6),
plus tie, tolerance, and ZERO-LEAKAGE property tests."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.fixtures import make_labels, make_sequences
from audiopro_essentia_spark.operators.asof import asof_join
from audiopro_essentia_spark.operators.framing import frame_tokens
from audiopro_essentia_spark.operators.kernel import rms_volume_exprs


@pytest.fixture(scope="module")
def frames(spark, tiny_seqs):
    f = frame_tokens(tiny_seqs)
    e = rms_volume_exprs()
    return (
        f.select("doc_id", "frame_idx", "event_ts", "available_ts",
                 e["rms"].alias("rms"))
        .persist()
    )


@pytest.fixture(scope="module")
def labels(spark, tiny_table):
    ids = tiny_table.to_pydict()["doc_id"]
    import pyarrow.parquet as pq
    import tempfile, os

    p = os.path.join(tempfile.mkdtemp(), "labels.parquet")
    pq.write_table(make_labels(ids), p)
    return spark.read.parquet(p)


def _golden(
    frames_pd: pd.DataFrame, labels_pd: pd.DataFrame, direction: str = "backward"
) -> pd.DataFrame:
    out = []
    for doc, grp in frames_pd.groupby("doc_id"):
        rl = labels_pd[labels_pd.doc_id == doc].sort_values("label_ts")
        merged = pd.merge_asof(
            grp.sort_values("available_ts"),
            rl[["label_ts", "label"]],
            left_on="available_ts",
            right_on="label_ts",
            direction=direction,
        )
        out.append(merged)
    return pd.concat(out).sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("strategy", ["union", "cogroup"])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_merge_asof(spark, frames, labels, strategy, direction):
    got = (
        asof_join(frames, labels, left_ts="available_ts", right_ts="label_ts",
                  strategy=strategy, direction=direction)
        .orderBy("doc_id", "frame_idx")
        .toPandas()
    )
    exp = _golden(frames.toPandas(), labels.toPandas(), direction)
    assert len(got) == len(exp)
    assert np.allclose(got["label"], exp["label"], equal_nan=True)
    g = got["matched_ts"].to_numpy("datetime64[us]")
    e = exp["label_ts"].to_numpy("datetime64[us]")
    both = ~(pd.isna(got["matched_ts"]) | pd.isna(exp["label_ts"]))
    assert (pd.isna(got["matched_ts"]).to_numpy() == pd.isna(exp["label_ts"]).to_numpy()).all()
    assert np.array_equal(g[both.to_numpy()], e[both.to_numpy()])


def test_tie_matches(spark):
    """right.ts == left.ts must MATCH (backward as-of)."""
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame([("a", t0)], "doc_id string, available_ts timestamp")
    right = spark.createDataFrame(
        [("a", t0, 7.0)], "doc_id string, label_ts timestamp, label double"
    )
    row = asof_join(left, right).collect()[0]
    assert row.label == 7.0


def test_no_match_before_first_label(spark):
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame([("a", t0)], "doc_id string, available_ts timestamp")
    right = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=1), 7.0)],
        "doc_id string, label_ts timestamp, label double",
    )
    row = asof_join(left, right).collect()[0]
    assert row.label is None and row.matched_ts is None


def test_tolerance(spark):
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=10))],
        "doc_id string, available_ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t0, 7.0)], "doc_id string, label_ts timestamp, label double"
    )
    ok = asof_join(left, right, tolerance_us=11_000_000).collect()[0]
    assert ok.label == 7.0
    out = asof_join(left, right, tolerance_us=9_000_000).collect()[0]
    assert out.label is None


def test_zero_leakage(spark, frames, labels):
    """North rule: poison every label STRICTLY AFTER each frame's
    available_ts; as-of output must be invariant (no feature/join reads
    the future)."""
    base = asof_join(frames, labels, left_ts="available_ts", right_ts="label_ts")
    poisoned_labels = labels.withColumn(
        "label", F.col("label") + F.lit(1e9)
    )
    # keep past labels intact, poison only future ones relative to the max
    # frame availability per doc: any change in output would mean a future read
    max_avail = frames.groupBy("doc_id").agg(F.max("available_ts").alias("mx"))
    mixed = (
        labels.join(max_avail, "doc_id", "left")
        .withColumn(
            "label",
            F.when(F.col("label_ts") > F.col("mx"), F.col("label") + 1e9).otherwise(
                F.col("label")
            ),
        )
        .drop("mx")
    )
    got1 = base.orderBy("doc_id", "frame_idx").toPandas()
    got2 = (
        asof_join(frames, mixed, left_ts="available_ts", right_ts="label_ts")
        .orderBy("doc_id", "frame_idx")
        .toPandas()
    )
    assert np.allclose(got1["label"], got2["label"], equal_nan=True)


def test_forward_direction_cogroup(spark):
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame([("a", t0)], "doc_id string, available_ts timestamp")
    right = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=5), 7.0),
         ("a", t0 - dt.timedelta(seconds=1), 3.0)],
        "doc_id string, label_ts timestamp, label double",
    )
    row = asof_join(left, right, direction="forward").collect()[0]
    assert row.label == 7.0


def test_asof_property_random_vs_merge_asof(spark):
    """Property: for right sides with unique (key, ts), the union-window
    strategy equals pandas merge_asof exactly in ALL THREE directions —
    random keys, ts ties across sides, sparse/dense mixes, keys with no
    right rows."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def run(data):
        direction = data.draw(
            st.sampled_from(["backward", "forward", "nearest"])
        )
        n_keys = data.draw(st.integers(1, 4))
        lrows, rrows = [], []
        for k in range(n_keys):
            lts = data.draw(
                st.lists(st.integers(0, 50), min_size=0, max_size=12)
            )
            rts = data.draw(
                st.lists(st.integers(0, 50), min_size=0, max_size=8,
                         unique=True)
            )
            for i, t in enumerate(lts):
                lrows.append((f"k{k}", i, dt.datetime(2024, 1, 1)
                              + dt.timedelta(seconds=t)))
            for t in rts:
                rrows.append((f"k{k}", float(t * 10),
                              dt.datetime(2024, 1, 1)
                              + dt.timedelta(seconds=t)))
        if not lrows or not rrows:
            return
        left = spark.createDataFrame(lrows, "doc_id string, i long, lts timestamp")
        right = spark.createDataFrame(rrows, "doc_id string, rv double, rts timestamp")
        got = {
            (r.doc_id, r.i): (r.matched_ts, r.rv)
            for r in asof_join(
                left, right, on=("doc_id",), left_ts="lts", right_ts="rts",
                right_values=("rv",), direction=direction,
            ).collect()
        }
        lpd = pd.DataFrame(lrows, columns=["doc_id", "i", "lts"]).sort_values("lts")
        rpd = pd.DataFrame(rrows, columns=["doc_id", "rv", "rts"]).sort_values("rts")
        m = pd.merge_asof(lpd, rpd, left_on="lts", right_on="rts",
                          by="doc_id", direction=direction)
        for _, row in m.iterrows():
            exp_ts = None if pd.isna(row.rts) else row.rts.to_pydatetime()
            exp_rv = None if pd.isna(row.rv) else row.rv
            assert got[(row.doc_id, row.i)] == (exp_ts, exp_rv), (row.doc_id, row.i)

    run()


@pytest.mark.parametrize("strategy", ["union", "cogroup"])
def test_forward_tolerance_and_nearest_tie(spark, strategy):
    """forward: tolerance bounds the FUTURE distance; nearest: equal
    distances resolve backward (pandas merge_asof's rule)."""
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("a", t0)], "doc_id string, available_ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=5), 7.0)],
        "doc_id string, label_ts timestamp, label double",
    )
    ok = asof_join(left, right, direction="forward", strategy=strategy,
                   tolerance_us=6_000_000).collect()[0]
    assert ok.label == 7.0
    out = asof_join(left, right, direction="forward", strategy=strategy,
                    tolerance_us=4_000_000).collect()[0]
    assert out.label is None and out.matched_ts is None
    # nearest tie: labels equidistant at +-5s -> backward (3.0) wins
    right2 = spark.createDataFrame(
        [("a", t0 - dt.timedelta(seconds=5), 3.0),
         ("a", t0 + dt.timedelta(seconds=5), 7.0)],
        "doc_id string, label_ts timestamp, label double",
    )
    tie = asof_join(left, right2, direction="nearest",
                    strategy=strategy).collect()[0]
    assert tie.label == 3.0
    # and the forward one wins when strictly closer
    right3 = spark.createDataFrame(
        [("a", t0 - dt.timedelta(seconds=5), 3.0),
         ("a", t0 + dt.timedelta(seconds=4), 7.0)],
        "doc_id string, label_ts timestamp, label double",
    )
    near = asof_join(left, right3, direction="nearest",
                     strategy=strategy).collect()[0]
    assert near.label == 7.0
    # nearest + tolerance: 4s match survives a 4s bound, not a 3s bound
    tol = asof_join(left, right3, direction="nearest", strategy=strategy,
                    tolerance_us=3_000_000).collect()[0]
    assert tol.label is None


def test_asof_null_right_ts_never_matches(spark):
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:05")), (1, ts("2024-01-01 00:02:00"))],
        ["doc_id", "available_ts"],
    )
    right = spark.createDataFrame(
        [(1, None, "leak"), (1, ts("2024-01-01 00:01:00"), "real")],
        "doc_id long, label_ts timestamp, label string",
    )
    for kwargs in ({}, {"strategy": "cogroup"}, {"direction": "forward"}):
        got = {
            r["available_ts"]: r["label"]
            for r in asof_join(left, right, **kwargs).collect()
        }
        # the NULL-ts right row must never forward-fill into early rows
        assert got[ts("2024-01-01 00:00:05")] in (None, "real")
        assert got[ts("2024-01-01 00:00:05")] != "leak"
    # backward: early row has NO match at all
    got_b = {
        r["available_ts"]: r["label"] for r in asof_join(left, right).collect()
    }
    assert got_b[ts("2024-01-01 00:00:05")] is None
    assert got_b[ts("2024-01-01 00:02:00")] == "real"


def test_asof_cogroup_string_ts_and_null_left(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (1, None)],
        "doc_id long, available_ts string",
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", "x")],
        "doc_id long, label_ts string, label string",
    )
    rows = asof_join(
        left, right, strategy="cogroup"
    ).collect()
    by_null = {r["available_ts"] is None: r for r in rows}
    assert by_null[False]["label"] == "x"      # string ts parsed, matched
    assert by_null[True]["label"] is None      # NULL left ts passes through


def test_pit_assembly_zero_leakage(spark):
    """Multi-table PIT assembly (the q_pit_assembly shape): a feature row
    one microsecond AFTER the click must be invisible in every joined
    stream, and the cumulative error count must stop strictly at the
    click timestamp."""
    T = dt.datetime(2026, 1, 1)
    us = dt.timedelta(microseconds=1)
    s = dt.timedelta(seconds=1)
    clicks = spark.createDataFrame(
        [(1, 100, T + 10 * s, 1.0)], ["user_id", "event_id", "ts", "value"]
    )
    purch = spark.createDataFrame(
        [(1, T + 9 * s, 5.0), (1, T + 10 * s + us, 99.0)],
        ["user_id", "ts", "pvalue"],
    )
    errc = spark.createDataFrame(
        [(1, T + 8 * s, 1), (1, T + 10 * s, 2), (1, T + 10 * s + us, 3)],
        ["user_id", "ts", "cum_err"],
    )
    out = asof_join(
        clicks, purch, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("pvalue",), matched_ts_col="p_ts",
    )
    out = asof_join(
        out, errc, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("cum_err",), matched_ts_col="e_ts",
    )
    (r,) = out.collect()
    assert r.pvalue == 5.0          # the 1us-future purchase is invisible
    assert r.p_ts == T + 9 * s
    assert r.cum_err == 2           # <= click ts inclusive, future excluded
