"""hill_tail_index (operators/aggregates.py): Hill tail-exponent
estimator — order-statistic mirror (the outside definition) grouped+
global, exact e-powers and powers-of-2 hand cases, multiset tie
semantics, degenerate contracts, fail-louds, bucket invariance, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import hill_tail_index_sql
from audiopro_essentia_spark.operators.aggregates import hill_tail_index


def _rln(u: int) -> int:
    return round(math.log(u / 1e6) * 1e6)


def _mirror(rows, k, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        ms = sorted(
            (round(v * 1e6) for g, v in rows if gv is None or g == gv),
            reverse=True,
        )
        n = len(ms)
        ke = min(k, n - 1)
        vk1 = ms[ke] if ke < n else ms[-1]
        hsum = sum(_rln(u) - _rln(vk1) for u in ms[:ke])
        alpha = (
            round(ke * 1e6 / hsum, 6) if ke > 0 and hsum > 0 else None
        )
        out[gv] = (n, ke, round(vk1 / 1e6, 6), alpha)
    return out


def _rows():
    rows = []
    for i in range(80):  # heavy-ish tail with tie runs
        rows.append(("a", 1.0 + (i % 7) * 0.25))
    for i in range(12):
        rows.append(("a", float(2 ** (i % 9 + 1))))
    for i in range(40):
        rows.append(("b", 10.0 + (i % 5) * 0.5))
    rows.append(("c", 3.25))  # single row
    return rows


SCHEMA = "grp string, v double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n"], r["k_eff"], r["x_k1"], r["alpha"]
        )
        for r in df.collect()
    }


def test_mirror_grouped_and_global(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for k in (5, 20, 1000):
        got = _collect(hill_tail_index(df, "v", ["grp"], k), True)
        want = {g: v for g, v in _mirror(rows, k, True).items()}
        assert got == want, k
    got_g = _collect(hill_tail_index(df, "v", None, 10), False)
    assert got_g == _mirror(rows, 10, False)


def test_hand_cases(spark):
    # e-powers: ln ratios are exactly 3+2+1 micro-nats -> alpha 0.5
    e = math.e
    rows = [("g", e**3), ("g", e**2), ("g", e), ("g", 1.0), ("g", 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = hill_tail_index(df, "v", ["grp"], 3).collect()
    assert (r["n"], r["k_eff"], r["x_k1"], r["alpha"]) == (5, 3, 1.0, 0.5)
    # powers of two at k=4: H = (4+3+2+1) * rln-of-2 terms, alpha =
    # 4e6 / H from the definitional integers
    rows2 = [("g", float(x)) for x in (16, 8, 4, 2, 1)]
    df2 = spark.createDataFrame(rows2, SCHEMA)
    (r2,) = hill_tail_index(df2, "v", ["grp"], 4).collect()
    h = sum(_rln(u * 1_000_000) for u in (16, 8, 4, 2))
    assert r2["alpha"] == round(4e6 / h, 6)
    # ties AT the threshold contribute zero, multiset semantics:
    # duplicates of the threshold value don't change alpha
    rows3 = rows2 + [("g", 1.0), ("g", 1.0)]
    (r3,) = hill_tail_index(
        spark.createDataFrame(rows3, SCHEMA), "v", ["grp"], 4
    ).collect()
    assert r3["alpha"] == r2["alpha"]
    assert r3["x_k1"] == 1.0


def test_degenerates(spark):
    # single row: k_eff 0, alpha NULL
    df = spark.createDataFrame([("g", 5.0)], SCHEMA)
    (r,) = hill_tail_index(df, "v", ["grp"], 10).collect()
    assert (r["n"], r["k_eff"], r["alpha"]) == (1, 0, None)
    # all-equal values: H = 0 -> NULL alpha
    eq = spark.createDataFrame([("g", 2.0)] * 8, SCHEMA)
    (re_,) = hill_tail_index(eq, "v", ["grp"], 4).collect()
    assert (re_["k_eff"], re_["x_k1"], re_["alpha"]) == (4, 2.0, None)
    # n <= k: k_eff = n - 1
    sm = spark.createDataFrame([("g", 4.0), ("g", 2.0), ("g", 1.0)], SCHEMA)
    (rs,) = hill_tail_index(sm, "v", ["grp"], 100).collect()
    assert rs["k_eff"] == 2 and rs["x_k1"] == 1.0


def test_fail_louds(spark):
    for bad in (None, float("nan"), 0.0, -1.0, 4e-7):
        df = spark.createDataFrame([("g", bad)], SCHEMA)
        with pytest.raises(Exception, match="non-positive v"):
            hill_tail_index(df, "v", ["grp"], 5).collect()
    with pytest.raises(ValueError, match="k must be"):
        hill_tail_index(
            spark.createDataFrame([("g", 1.0)], SCHEMA), "v", k=0
        )


def test_bucket_invariance(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    ref = _collect(hill_tail_index(df, "v", ["grp"], 20, 1024), True)
    for nb in (1, 7):
        assert _collect(hill_tail_index(df, "v", ["grp"], 20, nb), True) == ref


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert hill_tail_index(df, "v", ["grp"], 5).collect() == []
    assert hill_tail_index(df, "v", None, 5).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE th(grp VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO th VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, k in ((True, 20), (True, 5), (False, 10)):
        g = ("grp",) if grouped else ()
        sql = hill_tail_index_sql("SELECT grp, v FROM th", g, k)
        if not grouped:
            sql = hill_tail_index_sql("SELECT v FROM th", g, k)
        res = con.execute(sql)
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (d["n"], d["k_eff"], d["x_k1"], d["alpha"])
        got = _collect(hill_tail_index(df, "v", list(g) or None, k), grouped)
        assert got == want, (grouped, k)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = hill_tail_index(df, "v", ["grp"], 20)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
