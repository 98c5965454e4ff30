"""ols_fit (grouped exact-sum linear regression) and
time_decayed_features (as-of exponential recency features): exact
mirrors, hand cases, leakage/degenerate contracts, fail-louds, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import datetime as dt
import io
import math
import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import (
    ols_fit_sql,
    time_decayed_features_sql,
)
from audiopro_essentia_spark.operators.aggregates import ols_fit
from audiopro_essentia_spark.operators.temporal import time_decayed_features


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _ols_mirror(pairs):
    xs = [_q(x) for x, _ in pairs]
    ys = [_q(y) for _, y in pairs]
    n = len(xs)
    if n == 0:
        return None
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    inum = sy * sxx - sx * sxy
    return (
        n,
        round(float(cov) / float(vx), 6) if vx > 0 else None,
        round(float(inum) / float(vx) / 1e6, 6) if vx > 0 else None,
        round(float(cov) / (math.sqrt(float(vx)) * math.sqrt(float(vy))), 6)
        if vx > 0 and vy > 0
        else None,
    )


def _xy(g, n=200):
    rnd = random.Random(3 + g)
    return [
        (round(rnd.uniform(-10, 10) * 4) / 4,
         round((1.5 * x if g else -0.5 * x) + rnd.uniform(-3, 3) * 0.25, 2))
        for x in (round(rnd.uniform(-10, 10) * 4) / 4 for _ in range(n))
    ]


def test_ols_mirror_and_hand(spark):
    rows = [(g, x, y) for g in range(3) for x, y in _xy(g)]
    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r"])
        for r in ols_fit(df, "x", "y", ["g"]).collect()
    }
    assert got == {g: _ols_mirror(_xy(g)) for g in range(3)}
    # global
    [r] = ols_fit(df.drop("g"), "x", "y").collect()
    assert (r["n"], r["slope"], r["intercept"], r["r"]) == _ols_mirror(
        [p for g in range(3) for p in _xy(g)]
    )
    # exact line y = 2x + 1
    d = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(-5, 6)], "x double, y double"
    )
    [r] = ols_fit(d, "x", "y").collect()
    assert (r["slope"], r["intercept"], r["r"]) == (2.0, 1.0, 1.0)
    # constant x: no fit; constant y: slope 0, r NULL
    d = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], "x double, y double")
    [r] = ols_fit(d, "x", "y").collect()
    assert (r["slope"], r["intercept"], r["r"]) == (None, None, None)
    d = spark.createDataFrame([(1.0, 2.0), (3.0, 2.0)], "x double, y double")
    [r] = ols_fit(d, "x", "y").collect()
    assert (r["slope"], r["intercept"], r["r"]) == (0.0, 2.0, None)


def test_ols_fail_louds_empty_twin(spark):
    for rows in ([(None, 1.0)], [(1.0, float("nan"))]):
        df = spark.createDataFrame(rows, "x double, y double")
        with pytest.raises(Exception, match="ols_fit: NULL/NaN"):
            ols_fit(df, "x", "y").collect()
    empty = spark.createDataFrame([], "g long, x double, y double")
    assert ols_fit(empty, "x", "y", ["g"]).collect() == []
    assert ols_fit(empty.drop("g"), "x", "y").collect() == []

    con = duckdb.connect()
    rows = [(g, x, y) for g in range(3) for x, y in _xy(g)]
    con.execute("CREATE TABLE t(g BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, x double, y double")
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            ols_fit_sql("SELECT g, x, y FROM t", ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r"])
        for r in ols_fit(df, "x", "y", ["g"]).collect()
    }
    assert got == want
    [wg] = con.execute(ols_fit_sql("SELECT x, y FROM t WHERE g = 2")).fetchall()
    [r] = ols_fit(df.where("g=2").drop("g"), "x", "y").collect()
    assert (r["n"], r["slope"], r["intercept"], r["r"]) == tuple(wg)


BASE = dt.datetime(2026, 1, 1)
NOW_US = int((BASE + dt.timedelta(days=2)).timestamp() * 1e6)


def _events(g, n=150):
    rnd = random.Random(17 + g)
    return [
        (
            g * 100 + rnd.randrange(5),
            BASE + dt.timedelta(seconds=rnd.randrange(0, 2 * 86400)),
            round(rnd.uniform(0, 50) * 4) / 4,
        )
        for _ in range(n)
    ]


def _decay_mirror(rows, hs, now_us):
    out = {}
    for u, ts, v in rows:
        tm = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        e = out.setdefault(u, {"n": 0, **{h: [0, 0] for h in hs}})
        e["n"] += 1
        for h in hs:
            w = math.pow(2.0, -((now_us - tm) / (h * 1e6)))
            e[h][0] += _q(w)
            e[h][1] += _q(v * w)
    return {
        u: (
            e["n"],
            *[x for h in hs for x in (round(e[h][0] / 1e6, 6),
                                       round(e[h][1] / 1e6, 6))],
        )
        for u, e in out.items()
    }


def test_decay_mirror_hand_merge(spark):
    hs = (3600, 86400)
    rows = [(u, ts, v) for g in range(2) for u, ts, v in _events(g)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    out = time_decayed_features(
        df, ["u"], "ts", now_us=NOW_US, half_lives_s=hs, value_col="v"
    )
    cols = ["n_events"] + [
        c for h in hs for c in (f"decay_count_{h}s", f"decay_sum_{h}s")
    ]
    got = {r["u"]: tuple(r[c] for c in cols) for r in out.collect()}
    assert got == _decay_mirror(rows, hs, NOW_US)
    # hand case: ages 2h and 1h at H=1h -> 0.25 + 0.5
    d = spark.createDataFrame(
        [(1, BASE, 2.0), (1, BASE + dt.timedelta(hours=1), 1.0)],
        "u long, ts timestamp, v double",
    )
    [r] = time_decayed_features(
        d, ["u"], "ts",
        now_us=int((BASE + dt.timedelta(hours=2)).timestamp() * 1e6),
        half_lives_s=(3600,), value_col="v",
    ).collect()
    assert (r["n_events"], r["decay_count_3600s"], r["decay_sum_3600s"]) == (
        2, 0.75, 1.0,
    )
    # MERGEABILITY at fixed now: per-shard decayed sums add exactly
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], "u long, ts timestamp, v double")
    b = spark.createDataFrame(rows[half:], "u long, ts timestamp, v double")
    def as_micro(df_):
        return {
            r["u"]: [round(r[c] * 1e6) for c in cols]
            for r in time_decayed_features(
                df_, ["u"], "ts", now_us=NOW_US, half_lives_s=hs,
                value_col="v",
            ).collect()
        }
    ga, gb, gu = as_micro(a), as_micro(b), as_micro(df)
    for u in gu:
        merged = [
            x + y
            for x, y in zip(ga.get(u, [0] * len(cols)),
                            gb.get(u, [0] * len(cols)))
        ]
        assert merged == gu[u], u


def test_decay_fail_louds_and_twin(spark):
    d_future = spark.createDataFrame(
        [(1, BASE + dt.timedelta(days=10), 1.0)],
        "u long, ts timestamp, v double",
    )
    with pytest.raises(Exception, match="future leakage"):
        time_decayed_features(
            d_future, ["u"], "ts", now_us=NOW_US, value_col="v"
        ).collect()
    d_null = spark.createDataFrame(
        [(1, None, 1.0)], "u long, ts timestamp, v double"
    )
    with pytest.raises(Exception, match="NULL ts"):
        time_decayed_features(
            d_null, ["u"], "ts", now_us=NOW_US
        ).collect()
    d = spark.createDataFrame(
        [(1, BASE, None)], "u long, ts timestamp, v double"
    )
    with pytest.raises(Exception, match="NULL/NaN v"):
        time_decayed_features(
            d, ["u"], "ts", now_us=NOW_US, value_col="v"
        ).collect()
    with pytest.raises(ValueError, match="now_us is required"):
        time_decayed_features(d, ["u"], "ts")
    with pytest.raises(ValueError, match="half_lives"):
        time_decayed_features(d, ["u"], "ts", now_us=NOW_US,
                              half_lives_s=(0,))
    # twin equality
    con = duckdb.connect()
    rows = [(u, ts, v) for g in range(2) for u, ts, v in _events(g)]
    con.execute("CREATE TABLE t(u BIGINT, tm BIGINT, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [
            (u,
             int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
             v)
            for u, ts, v in rows
        ],
    )
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    hs = (3600, 86400)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            time_decayed_features_sql(
                "SELECT u, tm, v FROM t", ("u",), NOW_US, hs, True
            )
        ).fetchall()
    }
    cols = ["n_events"] + [
        c for h in hs for c in (f"decay_count_{h}s", f"decay_sum_{h}s")
    ]
    got = {
        r["u"]: tuple(r[c] for c in cols)
        for r in time_decayed_features(
            df, ["u"], "ts", now_us=NOW_US, half_lives_s=hs, value_col="v"
        ).collect()
    }
    assert got == want


def test_plan_pins(spark):
    rows = [(g, x, y) for g in range(2) for x, y in _xy(g, n=40)]
    df = spark.createDataFrame(rows, "g long, x double, y double")
    ev = spark.createDataFrame(
        [(u, ts, v) for u, ts, v in _events(0, n=40)],
        "u long, ts timestamp, v double",
    )
    for out in (
        ols_fit(df, "x", "y", ["g"]),
        time_decayed_features(ev, ["u"], "ts", now_us=NOW_US,
                              value_col="v"),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue().split("Initial Plan")[0]
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "Window" not in plan
        assert "Join" not in plan  # one aggregate, nothing else
