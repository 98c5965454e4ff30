"""robust_stats (exact median / MAD / Iglewicz-Hoaglin fences) and
quantile_normalize (tie-averaged within-group CDF normalization):
exact sequential mirrors, hand cases, bucket invariance, fail-louds,
empty contracts, DuckDB twin equality, zero-Python plan pins."""

from __future__ import annotations

import contextlib
import io
import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import (
    quantile_normalize_sql,
    robust_stats_sql,
)
from audiopro_essentia_spark.operators.aggregates import (
    quantile_normalize,
    robust_stats,
)


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _robust_mirror(vals, k=3.0):
    ms = sorted(_q(v) for v in vals)
    n = len(ms)
    if n == 0:
        return None
    rlo, rhi = (n + 1) // 2, (n + 2) // 2
    med2 = ms[rlo - 1] + ms[rhi - 1]
    devs = sorted(abs(2 * m - med2) for m in ms)
    mad22 = devs[rlo - 1] + devs[rhi - 1]
    delta4 = int(math.floor(k * mad22 + 0.5))  # round half-away, k >= 0
    lo4, hi4 = 2 * med2 - delta4, 2 * med2 + delta4
    n_out = sum(1 for m in ms if 4 * m < lo4 or 4 * m > hi4)
    return (
        n,
        round(med2 / 2e6, 6),
        round(mad22 / 4e6, 6),
        round(lo4 / 4e6, 6),
        round(hi4 / 4e6, 6),
        n_out,
        round(n_out / n, 6),
    )


def _qnorm_mirror(vals):
    ms = [_q(v) for v in vals]
    cnt = Counter(ms)
    n = len(ms)
    return {
        v: round((2 * sum(c for u, c in cnt.items() if u < v) + cnt[v] + 1)
                 / (2 * n), 6)
        for v in cnt
    }


def _vals(g):
    # quarter-grid values (v * 1e6 exactly representable -> no
    # quantization tie disputes with the float mirror), negatives and a
    # heavy tie run included
    rnd = random.Random(42 + g)
    vs = [round(rnd.uniform(-5, 50) * 4) / 4 for _ in range(120 + g * 37)]
    return vs + [7.25] * 10


def _collect_robust(df, g=True):
    cols = ("n", "median", "mad", "lo_fence", "hi_fence", "n_outliers",
            "outlier_frac")
    rows = df.collect()
    if g:
        return {r["g"]: tuple(r[c] for c in cols) for r in rows}
    return [tuple(r[c] for c in cols) for r in rows]


def test_robust_mirror_and_buckets(spark):
    rows = [(g, v) for g in range(3) for v in _vals(g)]
    df = spark.createDataFrame(rows, "g long, v double")
    exp = {g: _robust_mirror(_vals(g)) for g in range(3)}
    for nb in (1, 7, 1024):
        got = _collect_robust(robust_stats(df, "v", ["g"], n_buckets=nb))
        assert got == exp, nb
    # global mode
    [got] = _collect_robust(robust_stats(df.drop("g"), "v"), g=False)
    assert got == _robust_mirror([v for g in range(3) for v in _vals(g)])


def test_robust_hand_cases(spark):
    def one(vals, k=3.0):
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        [r] = _collect_robust(robust_stats(df, "v", k=k), g=False)
        return r

    # 1..9: median 5, MAD 2, fences 5 -+ 6, nothing outside
    assert one(list(range(1, 10))) == (9, 5.0, 2.0, -1.0, 11.0, 0, 0.0)
    # even n exact midpoint + one planted giant: the giant flags
    assert one(list(range(1, 10)) + [100]) == (
        10, 5.5, 2.5, -2.0, 13.0, 1, 0.1,
    )
    # >50% mass on one value: mad = 0, fences = median, off-median flags
    assert one([5.0, 5.0, 5.0, 7.0]) == (4, 5.0, 0.0, 5.0, 5.0, 1, 0.25)
    # negatives + tight k
    assert one([-3.0, -1.0, -1.0, 0.0, 2.0], k=1.0) == (
        5, -1.0, 1.0, -2.0, 0.0, 2, 0.4,
    )
    # single row: mad 0, zero outliers
    assert one([42.0]) == (1, 42.0, 0.0, 42.0, 42.0, 0, 0.0)


def test_qnorm_mirror_and_hand(spark):
    rows = [(i, g, v) for g in range(3) for i, v in enumerate(_vals(g))]
    df = spark.createDataFrame(rows, "i long, g long, v double")
    got = {
        (r["g"], r["i"]): r["q"]
        for r in quantile_normalize(df, "v", ["g"], ["i"]).collect()
    }
    for g in range(3):
        exp = _qnorm_mirror(_vals(g))
        for i, v in enumerate(_vals(g)):
            assert got[(g, i)] == exp[_q(v)], (g, i)
    # hand case: ties share the average rank, max gets exactly 1.0
    d = spark.createDataFrame(
        [(0, 10.0), (1, 20.0), (2, 20.0), (3, 30.0)], "i long, v double"
    )
    q = {r["i"]: r["q"] for r in quantile_normalize(d, "v", None, ["i"]).collect()}
    assert q == {0: 0.25, 1: 0.625, 2: 0.625, 3: 1.0}
    # monotone within group
    by_v = sorted(((v, q[i]) for i, v in enumerate([10.0, 20.0, 20.0, 30.0])))
    assert all(a[1] <= b[1] for a, b in zip(by_v, by_v[1:]))


def test_fail_louds_and_empty(spark):
    bad_null = spark.createDataFrame([(1.0,), (None,)], "v double")
    bad_nan = spark.createDataFrame([(1.0,), (float("nan"),)], "v double")
    for bad in (bad_null, bad_nan):
        with pytest.raises(Exception, match="robust_stats: NULL/NaN"):
            robust_stats(bad, "v").collect()
        with pytest.raises(
            Exception, match="quantile_normalize: NULL/NaN"
        ):
            quantile_normalize(bad, "v").collect()
    with pytest.raises(ValueError, match="k must be >= 0"):
        robust_stats(spark.createDataFrame([(1.0,)], "v double"), "v", k=-1.0)
    # empty global frames: zero rows on both ops (funnel empty rule)
    empty = spark.createDataFrame([], "g long, v double")
    assert robust_stats(empty.drop("g"), "v").collect() == []
    assert robust_stats(empty, "v", ["g"]).collect() == []
    assert quantile_normalize(empty.drop("g"), "v").collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(i, g, v) for g in range(3) for i, v in enumerate(_vals(g))]
    con.execute("CREATE TABLE tv(i BIGINT, g BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO tv VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "i long, g long, v double")

    for k in (3.0, 2.5):
        want = {
            r[0]: tuple(r[1:])
            for r in con.execute(
                robust_stats_sql("SELECT g, v FROM tv", ("g",), k=k)
            ).fetchall()
        }
        got = _collect_robust(robust_stats(df, "v", ["g"], k=k))
        assert got == want, k
    # global mode (CROSS JOIN / WHERE guards)
    [wg] = con.execute(
        robust_stats_sql("SELECT v FROM tv WHERE g = 0")
    ).fetchall()
    [gg] = _collect_robust(robust_stats(df.where("g=0").drop("g"), "v"),
                           g=False)
    assert gg == tuple(wg)

    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            quantile_normalize_sql(
                "SELECT i, g, v FROM tv", ("g",), ("i",)
            )
        ).fetchall()
    }
    got = {
        (r["i"], r["g"]): (r["v"], r["q"])
        for r in quantile_normalize(df, "v", ["g"], ["i"]).collect()
    }
    assert got == want
    # global qnorm
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            quantile_normalize_sql(
                "SELECT i, v FROM tv WHERE g = 1", (), ("i",)
            )
        ).fetchall()
    }
    got = {
        r["i"]: (r["v"], r["q"])
        for r in quantile_normalize(
            df.where("g=1").drop("g"), "v", None, ["i"]
        ).collect()
    }
    assert got == want


def test_plan_pins(spark):
    rows = [(i, g, v) for g in range(3) for i, v in enumerate(_vals(g))]
    df = spark.createDataFrame(rows, "i long, g long, v double")
    for out in (
        robust_stats(df, "v", ["g"]),
        quantile_normalize(df, "v", ["g"], ["i"]),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue().split("Initial Plan")[0]
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
