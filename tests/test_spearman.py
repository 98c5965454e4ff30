"""spearman_rho (exact tie-averaged Spearman rank correlation per
group): exact Python mirror (grouped + global), canonical hand cases
(perfect monotone +1 / reversed -1 / independent-ish / textbook tie
case), bucket invariance, fail-louds, constant-column and empty
contracts, direct DuckDB twin equality, zero-Python plan pin."""

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import spearman_rho_sql
from audiopro_essentia_spark.operators.evalmetrics import spearman_rho


def _dranks(vals):
    """doubled average ranks: d = 2*below + cnt + 1."""
    from collections import Counter

    c = Counter(vals)
    below = {}
    run = 0
    for v in sorted(c):
        below[v] = run
        run += c[v]
    return [2 * below[v] + c[v] + 1 for v in vals]


def _mirror(pairs):
    n = len(pairs)
    if n == 0:
        return None
    dx = _dranks([p[0] for p in pairs])
    dy = _dranks([p[1] for p in pairs])
    sx, sy = sum(dx), sum(dy)
    sxx = sum(d * d for d in dx)
    syy = sum(d * d for d in dy)
    sxy = sum(a * b for a, b in zip(dx, dy))
    den1, den2 = n * sxx - sx * sx, n * syy - sy * sy
    if den1 <= 0 or den2 <= 0:
        return (n, None)
    rho = float(n * sxy - sx * sy) / (
        math.sqrt(float(den1)) * math.sqrt(float(den2))
    )
    return (n, round(rho, 6))


def _pairs(g):
    # deterministic noisy-monotone pairs with heavy integer ties
    out = []
    for i in range(200):
        x = float((i * 7 + g) % 23)
        y = float(((i * 7 + g) % 23) + ((i * 13) % 5) - 2)
        out.append((x, y))
    return out


def _df(spark, grouped=True):
    rows = []
    for g in range(3):
        rows += [(g, x, y) for x, y in _pairs(g)]
    df = spark.createDataFrame(rows, "g long, x double, y double")
    return df if grouped else df.where("g = 2").drop("g")


def test_mirror_grouped_and_global(spark):
    got = {
        r["g"]: (r["n"], r["rho"])
        for r in spearman_rho(_df(spark), "x", "y", ["g"]).collect()
    }
    assert got == {g: _mirror(_pairs(g)) for g in range(3)}
    [r] = spearman_rho(_df(spark, False), "x", "y").collect()
    assert (r["n"], r["rho"]) == _mirror(_pairs(2))


def test_canonical_cases(spark):
    def one(pairs):
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in pairs], "x double, y double"
        )
        [r] = spearman_rho(df, "x", "y").collect()
        return (r["n"], r["rho"])

    mono = [(i, i * i) for i in range(10)]  # any monotone map -> +1
    assert one(mono) == (10, 1.0)
    rev = [(i, -i) for i in range(10)]
    assert one(rev) == (10, -1.0)
    # textbook tie case: x = 1,2,2,3 / y = 1,2,3,4 — doubled ranks
    # x: 2,5,5,8; y: 2,4,6,8 -> rho = 0.9486833 -> round6
    tie = [(1, 1), (2, 2), (2, 3), (3, 4)]
    assert one(tie) == (4, _mirror([(float(a), float(b)) for a, b in tie])[1])
    assert one(tie)[1] == pytest.approx(0.948683, abs=1e-6)
    # a monotone recalibration of y leaves rho unchanged (rank-only)
    tie_cal = [(a, math.exp(b)) for a, b in tie]
    assert one(tie_cal) == one(tie)


@pytest.mark.parametrize("nb", [1, 3, 1024])
def test_bucket_invariance(spark, nb):
    got = {
        r["g"]: (r["n"], r["rho"])
        for r in spearman_rho(
            _df(spark), "x", "y", ["g"], n_buckets=nb
        ).collect()
    }
    assert got == {g: _mirror(_pairs(g)) for g in range(3)}


def test_constant_column_and_single_row(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0), (1.0, 4.0)], "x double, y double"
    )
    [r] = spearman_rho(df, "x", "y").collect()
    assert (r["n"], r["rho"]) == (3, None)  # zero rank variance in x
    one = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    [r1] = spearman_rho(one, "x", "y").collect()
    assert (r1["n"], r1["rho"]) == (1, None)


def test_fail_louds_and_empty(spark):
    for rows, msg in (
        ([(None, 1.0), (2.0, 2.0)], "NULL or NaN x"),
        ([(float("nan"), 1.0), (2.0, 2.0)], "NULL or NaN x"),
        ([(1.0, None), (2.0, 2.0)], "NULL or NaN y"),
        ([(1.0, float("nan")), (2.0, 2.0)], "NULL or NaN y"),
    ):
        df = spark.createDataFrame(rows, "x double, y double")
        with pytest.raises(Exception, match=msg):
            spearman_rho(df, "x", "y").collect()
    empty = spark.createDataFrame([], "x double, y double")
    assert spearman_rho(empty, "x", "y").count() == 0


def test_twin_equality(spark):
    rows = []
    for g in range(3):
        rows += [(g, x, y) for x, y in _pairs(g)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            spearman_rho_sql("SELECT g, x, y FROM t", ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: (r["n"], r["rho"])
        for r in spearman_rho(_df(spark), "x", "y", ["g"]).collect()
    }
    assert got == want
    [wg] = con.execute(
        spearman_rho_sql("SELECT x, y FROM t WHERE g = 2")
    ).fetchall()
    [gg] = spearman_rho(_df(spark, False), "x", "y").collect()
    assert (gg["n"], gg["rho"]) == tuple(wg)


def test_no_python_in_plan(spark):
    out = spearman_rho(_df(spark), "x", "y", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
