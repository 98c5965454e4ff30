"""exact_quantiles: type-1 (inverted-CDF) distributed exact quantiles —
numpy mirror, bucket invariance, edge ranks, fail-louds, empty
contract, twin equality, zero-Python plan pin."""

from __future__ import annotations

import contextlib
import io
import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import exact_quantiles_sql
from audiopro_essentia_spark.operators.aggregates import exact_quantiles

QS = (0.5, 0.9, 0.99)
NAMES = ("p50", "p90", "p99")


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _mirror(vals, qs=QS):
    ms = sorted(_q(v) for v in vals)
    n = len(ms)
    if n == 0:
        return None
    out = [n]
    for q in qs:
        qu = _q(q)
        r = max(1, (n * qu + 999_999) // 1_000_000)
        out.append(round(ms[r - 1] / 1e6, 6))
    return tuple(out)


def _vals(g):
    rnd = random.Random(31 + g)
    vs = [round(rnd.uniform(-20, 500) * 4) / 4 for _ in range(200 + 41 * g)]
    return vs + [13.25] * 15  # tie run


def test_mirror_numpy_and_buckets(spark):
    rows = [(g, v) for g in range(3) for v in _vals(g)]
    df = spark.createDataFrame(rows, "g long, v double")
    exp = {g: _mirror(_vals(g)) for g in range(3)}
    for nb in (1, 7, 1024):
        got = {
            r["g"]: (r["n"], *[r[c] for c in NAMES])
            for r in exact_quantiles(df, "v", QS, ["g"], n_buckets=nb)
            .collect()
        }
        assert got == exp, nb
    # the convention IS numpy's inverted_cdf on the micro grid
    for g in range(3):
        ms = np.array(sorted(_q(v) for v in _vals(g)), dtype=np.int64)
        for q, name, got_v in zip(QS, NAMES, exp[g][1:]):
            np_v = float(np.quantile(ms, q, method="inverted_cdf")) / 1e6
            assert got_v == round(np_v, 6), (g, q)
    # global mode
    [r] = exact_quantiles(df.drop("g"), "v", QS).collect()
    assert (r["n"], *[r[c] for c in NAMES]) == _mirror(
        [v for g in range(3) for v in _vals(g)]
    )


def test_edges(spark):
    # q = 1.0 -> max; tiny q -> min (rank clamps to 1); single row
    d = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    )
    [r] = exact_quantiles(d, "v", (0.000001, 0.5, 1.0)).collect()
    assert (r["p0_0001"], r["p50"], r["p100"]) == (1.0, 5.0, 10.0)
    [r] = exact_quantiles(
        spark.createDataFrame([(42.5,)], "v double"), "v", (0.5,)
    ).collect()
    assert (r["n"], r["p50"]) == (1, 42.5)
    with pytest.raises(ValueError, match="qs must be in"):
        exact_quantiles(d, "v", (0.0,))
    with pytest.raises(ValueError, match="qs must be in"):
        exact_quantiles(d, "v", (1.5,))


def test_fail_louds_and_empty(spark):
    for rows in ([(None,)], [(float("nan"),)]):
        df = spark.createDataFrame(rows, "v double")
        with pytest.raises(Exception, match="exact_quantiles: NULL/NaN"):
            exact_quantiles(df, "v").collect()
    empty = spark.createDataFrame([], "g long, v double")
    assert exact_quantiles(empty, "v", QS, ["g"]).collect() == []
    assert exact_quantiles(empty.drop("g"), "v", QS).collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(g, v) for g in range(3) for v in _vals(g)]
    con.execute("CREATE TABLE t(g BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, v double")
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            exact_quantiles_sql("SELECT g, v FROM t", QS, ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: (r["n"], *[r[c] for c in NAMES])
        for r in exact_quantiles(df, "v", QS, ["g"]).collect()
    }
    assert got == want
    [wg] = con.execute(
        exact_quantiles_sql("SELECT v FROM t WHERE g = 0", QS)
    ).fetchall()
    [r] = exact_quantiles(df.where("g=0").drop("g"), "v", QS).collect()
    assert (r["n"], *[r[c] for c in NAMES]) == tuple(wg)


def test_plan_pin(spark):
    rows = [(g, v) for g in range(2) for v in _vals(g)[:60]]
    df = spark.createDataFrame(rows, "g long, v double")
    out = exact_quantiles(df, "v", QS, ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
