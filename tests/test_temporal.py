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
