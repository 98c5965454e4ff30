"""W4-W6: lag/lead, rolling, ffill/bfill, sessionization, session tempo —
checked against pandas/numpy oracles on the driver events table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.operators.temporal import (
    session_stats,
    session_tempo,
    sessionize,
    with_bfill,
    with_ffill,
    with_lag_lead,
    with_rolling,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


def test_lag_lead(spark, events, events_pd):
    got = (
        with_lag_lead(events, "value", ("user_id",), "ts")
        .orderBy("user_id", "ts")
        .toPandas()
    )
    exp = events_pd.sort_values(["user_id", "ts"]).reset_index(drop=True)
    g = exp.groupby("user_id")["value"]
    exp["lag1"] = g.shift(1)
    exp["lead1"] = g.shift(-1)
    assert np.allclose(got["value_lag1"], exp["lag1"], equal_nan=True)
    assert np.allclose(got["value_lead1"], exp["lead1"], equal_nan=True)


def test_rolling(spark, events, events_pd):
    got = (
        with_rolling(events, "value", ("user_id",), "ts", 5, aggs=("avg", "sum"))
        .orderBy("user_id", "ts")
        .toPandas()
    )
    exp = events_pd.sort_values(["user_id", "ts"]).reset_index(drop=True)
    r = exp.groupby("user_id")["value"].rolling(5, min_periods=1)
    assert np.allclose(got["value_roll5_avg"], r.mean().reset_index(drop=True))
    assert np.allclose(got["value_roll5_sum"], r.sum().reset_index(drop=True))


def test_ffill_bfill(spark, events, events_pd):
    sparse = events.withColumn(
        "v", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    got = (
        with_bfill(
            with_ffill(sparse, ("v",), ("user_id",), "ts"),
            ("v",),
            ("user_id",),
            "ts",
        )
        .orderBy("user_id", "ts")
        .toPandas()
    )
    exp = events_pd.sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp["v"] = exp["value"].where(exp["event_type"] == "purchase")
    g = exp.groupby("user_id")["v"]
    assert np.allclose(got["v_ffill"], g.ffill(), equal_nan=True)
    assert np.allclose(got["v_bfill"], g.bfill(), equal_nan=True)


GAP = 1800.0  # 30 min


def test_sessionize_matches_oracle(spark, events, events_pd):
    got = sessionize(events, ("user_id",), "ts", GAP).orderBy("user_id", "ts").toPandas()
    for uid, grp in events_pd.groupby("user_id"):
        ts = grp["ts"].sort_values().astype("int64").to_numpy() / 1e9
        exp = oracle.sessionize(ts, GAP)
        g = got[got.user_id == uid]["session_id"].to_numpy()
        assert np.array_equal(g, exp), uid


def test_session_tempo_matches_oracle(spark, events, events_pd):
    got = {
        r.user_id: (r.tempo_analog, r.n_sessions)
        for r in session_tempo(events, ("user_id",), "ts", GAP).collect()
    }
    for uid, grp in events_pd.groupby("user_id"):
        ts = np.sort(grp["ts"].astype("int64").to_numpy() / 1e9)
        sid = oracle.sessionize(ts, GAP)
        starts = np.array([ts[sid == s].min() for s in np.unique(sid)])
        exp = oracle.tempo_from_boundaries(starts)
        assert got[uid][1] == len(starts)
        assert got[uid][0] == pytest.approx(exp, rel=1e-9), uid


def test_session_stats_counts(spark, events):
    st = session_stats(events, ("user_id",), "ts", GAP)
    total = st.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # durations non-negative, ends >= starts
    bad = st.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# interval (point-in-range containment) join
# ---------------------------------------------------------------------------


def _ts(s):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_interval_join_containment_semantics(spark):
    """Inclusive bounds, overlapping intervals multiply, disjoint and
    inverted/NULL intervals never match, NULL ts never matches — all
    with an interval spanning MANY buckets (small bucket_seconds) so
    the explode path is the one under test."""
    from pyspark.sql import functions as F  # noqa: F811

    from audiopro_essentia_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 00:00:00")),   # == start boundary
            (2, "u", _ts("2024-01-01 00:30:00")),   # inside A, inside B
            (3, "u", _ts("2024-01-01 01:00:00")),   # == A end boundary
            (4, "u", _ts("2024-01-01 05:00:00")),   # outside everything
            (5, "v", _ts("2024-01-01 00:30:00")),   # right key, other user
            (6, "u", None),                          # NULL ts
        ],
        "pid long, user string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            ("A", "u", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
            ("B", "u", _ts("2024-01-01 00:20:00"), _ts("2024-01-01 02:00:00")),
            ("C", "u", _ts("2024-01-01 03:00:00"), _ts("2024-01-01 02:00:00")),  # inverted
            ("D", "u", None, _ts("2024-01-01 01:00:00")),  # NULL bound
            ("E", "v", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
        ],
        "iid string, user string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pts, ivs, "ts", "s", "e", key_cols=("user",), bucket_seconds=60.0
        ).collect()
    )
    assert got == [
        (1, "A"),            # start-inclusive
        (2, "A"), (2, "B"),  # overlap multiplies
        (3, "A"), (3, "B"),  # end-inclusive for A, interior for B
        (5, "E"),            # key equality respected
    ]


def test_interval_join_matches_naive_theta_join(spark):
    """Property pin: the bucketized join equals the naive theta-join on
    a random-ish planted set, across bucket widths straddling the
    interval durations (every interval meets each matching point in
    exactly one bucket — no dup rows, no misses)."""
    from pyspark.sql import functions as F  # noqa: F811

    from audiopro_essentia_spark.operators.temporal import interval_join

    base = _ts("2024-01-01 00:00:00")
    import datetime as dt

    pts = spark.createDataFrame(
        [(i, f"u{i % 3}", base + dt.timedelta(seconds=(i * 137) % 7200))
         for i in range(200)],
        "pid long, user string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(j, f"u{j % 3}",
          base + dt.timedelta(seconds=(j * 311) % 6000),
          base + dt.timedelta(seconds=(j * 311) % 6000 + 50 + (j * 97) % 900))
         for j in range(60)],
        "iid long, user string, s timestamp, e timestamp",
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            ivs,
            (pts.user == ivs.user) & (pts.ts >= ivs.s) & (pts.ts <= ivs.e),
        ).collect()
    )
    assert naive  # non-vacuous
    for bucket in (30.0, 300.0, 7200.0):
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(
                pts, ivs, "ts", "s", "e",
                key_cols=("user",), bucket_seconds=bucket,
            ).collect()
        )
        assert got == naive, bucket


def test_interval_join_guards(spark):
    import pytest
    from pyspark.sql.utils import PythonException  # noqa: F401

    from audiopro_essentia_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-06-01 00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(pts, ivs, "ts", "s", "e", bucket_seconds=0)
    with pytest.raises(ValueError, match="max_span_buckets"):
        interval_join(pts, ivs, "ts", "s", "e", max_span_buckets=0)
    # a ~5-month interval on 60 s buckets blows the span cap LOUD
    with pytest.raises(Exception, match="max_span_buckets"):
        interval_join(
            pts, ivs, "ts", "s", "e",
            bucket_seconds=60.0, max_span_buckets=1000,
        ).collect()


def test_interval_join_plan_is_hash_join_not_nested_loop(spark):
    """The whole point of the bucket shape: Spark plans the containment
    as a hash equi-join, never BroadcastNestedLoop/Cartesian."""
    from audiopro_essentia_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 00:00:00"))],
        "pid long, user string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [("A", "u", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "iid string, user string, s timestamp, e timestamp",
    )
    out = interval_join(pts, ivs, "ts", "s", "e", key_cols=("user",))
    simple = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in simple
    assert "CartesianProduct" not in simple
    assert ("BroadcastHashJoin" in simple) or ("SortMergeJoin" in simple)


# ---------------------------------------------------------------------------
# trailing time-range rolling features (with_time_rolling)
# ---------------------------------------------------------------------------


def test_time_rolling_matches_mirror_with_boundaries_and_ties(spark):
    """Frame = [ts - H, ts] inclusive both ends, and same-ts rows are
    PEERS (each appears in the other's frame — the SQL RANGE CURRENT
    ROW rule; availability is <=, the asof convention)."""
    import datetime as dt

    from audiopro_essentia_spark.operators.temporal import with_time_rolling

    base = dt.datetime.fromisoformat("2024-01-01 00:00:00")
    rows = [
        (1, "u", base, 10),
        (2, "u", base + dt.timedelta(seconds=60), 20),     # exactly H back from #4
        (3, "u", base + dt.timedelta(seconds=90), None),   # NULL value in-frame
        (4, "u", base + dt.timedelta(seconds=120), 40),
        (5, "u", base + dt.timedelta(seconds=120), 50),    # tie with #4
        (6, "u", base + dt.timedelta(seconds=300), 60),    # everything aged out
        (7, "v", base + dt.timedelta(seconds=120), 70),    # other key
    ]
    df = spark.createDataFrame(
        rows, "pid long, user string, ts timestamp, v long"
    )
    got = {
        r.pid: (r.v_count_60s, r.v_sum_60s)
        for r in with_time_rolling(
            df, "v", ("user",), "ts", horizons_seconds=(60.0,)
        ).collect()
    }
    assert got == {
        1: (1, 10),
        2: (2, 30),        # 60 s back is INCLUSIVE of row 1
        3: (1, 20),        # frame [30,90]: only row 2; count(v) skips own NULL
        4: (3, 110),       # rows 2..5: NULL row contributes nothing; tie peer 5 COUNTS
        5: (3, 110),       # identical frame to its peer
        6: (1, 60),
        7: (1, 70),
    }


def test_time_rolling_guards_and_shared_shuffle(spark):
    import datetime as dt

    import pytest

    from audiopro_essentia_spark.operators.temporal import with_time_rolling

    base = dt.datetime.fromisoformat("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(i, "u", base + dt.timedelta(seconds=i), i) for i in range(10)],
        "pid long, user string, ts timestamp, v long",
    )
    with pytest.raises(ValueError, match="nonempty"):
        with_time_rolling(df, "v", ("user",), "ts", horizons_seconds=())
    with pytest.raises(ValueError, match="unknown aggs"):
        with_time_rolling(df, "v", ("user",), "ts", aggs=("median",))
    with pytest.raises(ValueError, match="microsecond"):
        with_time_rolling(df, "v", ("user",), "ts", horizons_seconds=(1e-9,))
    # every (horizon, agg) column rides ONE Exchange and ONE Sort —
    # identical partitioning+ordering lets Spark fuse all the windows
    out = with_time_rolling(
        df, "v", ("user",), "ts",
        horizons_seconds=(5.0, 60.0), aggs=("count", "sum", "min", "max"),
    )
    simple = out._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange") == 1
    # "Sort" alone also matches the per-Window sortOrder detail text —
    # count physical Sort NODES
    assert simple.count("- Sort [") == 1
