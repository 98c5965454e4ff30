"""winsorize (operators/aggregates.py): exact-quantile clamping —
order-statistic mirror grouped+global, bounds-are-data-values +
idempotence + monotonicity invariants, planted-outlier hand case,
fail-louds, guards, bucket invariance, empty contracts, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import winsorize_sql
from audiopro_essentia_spark.operators.aggregates import winsorize


def _q1(ms_sorted, q):
    n = len(ms_sorted)
    r = max(1, (n * round(q * 1e6) + 999_999) // 1_000_000)
    return ms_sorted[r - 1]


def _mirror(rows, q_lo, q_hi, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        ms = sorted(round(v * 1e6) for _, _, v in grows)
        lo, hi = _q1(ms, q_lo), _q1(ms, q_hi)
        for _, rid, v in grows:
            m = round(v * 1e6)
            w = min(max(m, lo), hi)
            flag = -1 if m < lo else (1 if m > hi else 0)
            out[(gv, rid)] = (
                round(m / 1e6, 6), round(w / 1e6, 6), flag
            )
    return out


def _rows():
    rows = []
    for i in range(60):
        rows.append(("a", f"a{i}", 10.0 + (i % 9) * 0.25))
    rows.append(("a", "a_hi", 500.0))    # planted giant
    rows.append(("a", "a_lo", -50.0))    # planted low outlier
    for i in range(25):
        rows.append(("b", f"b{i}", 1.0 + (i % 5) * 0.5))
    return rows


SCHEMA = "grp string, rid string, v double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None, r["id"]): (
            r["v"], r["v_wins"], r["clipped"]
        )
        for r in df.collect()
    }


def test_mirror_and_invariants(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for ql, qh in ((0.05, 0.95), (0.25, 0.75), (0.000001, 1.0)):
        got = _collect(winsorize(df, "v", "rid", ["grp"], ql, qh), True)
        assert got == _mirror(rows, ql, qh, True), (ql, qh)
    got_g = _collect(winsorize(df, "v", "rid", None, 0.1, 0.9), False)
    assert got_g == _mirror(rows, 0.1, 0.9, False)
    # row count preserved; clamp bounds are ACTUAL data values
    got = _collect(winsorize(df, "v", "rid", ["grp"], 0.05, 0.95), True)
    assert len(got) == len(rows)
    vals_a = {round(v * 1e6) for g, _, v in rows if g == "a"}
    wins_a = {round(w * 1e6) for (g, _), (_, w, _) in got.items() if g == "a"}
    assert wins_a <= vals_a
    # monotonicity: v1 <= v2 implies w1 <= w2
    pairs = sorted(
        ((v, w) for (g, _), (v, w, _) in got.items() if g == "a")
    )
    assert all(
        pairs[i][1] <= pairs[i + 1][1] for i in range(len(pairs) - 1)
    )


def test_outliers_and_idempotence(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(winsorize(df, "v", "rid", ["grp"], 0.05, 0.95), True)
    assert got[("a", "a_hi")][2] == 1      # giant clipped down
    assert got[("a", "a_lo")][2] == -1     # low outlier clipped up
    assert got[("a", "a_hi")][1] < 500.0
    assert got[("a", "a0")][2] == 0        # interior untouched
    assert got[("a", "a0")][0] == got[("a", "a0")][1]
    # idempotence: winsorizing the winsorized output changes nothing
    once = winsorize(df, "v", "rid", ["grp"], 0.05, 0.95)
    twice = winsorize(
        once.select("grp", "id", once["v_wins"].alias("v")),
        "v", "id", ["grp"], 0.05, 0.95,
    )
    tw = {(r["grp"], r["id"]): r["v_wins"] for r in twice.collect()}
    for key, (_, w, _) in got.items():
        assert tw[key] == w
    assert all(r["clipped"] == 0 for r in twice.collect())


def test_guards_and_fail_louds(spark):
    df = spark.createDataFrame([("g", "r", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="q_lo < q_hi"):
        winsorize(df, "v", "rid", q_lo=0.9, q_hi=0.1)
    with pytest.raises(ValueError, match="q_lo < q_hi"):
        winsorize(df, "v", "rid", q_lo=0.0, q_hi=0.9)
    with pytest.raises(ValueError, match="1e-6 multiple"):
        winsorize(df, "v", "rid", q_lo=1e-8, q_hi=0.9)
    bad = spark.createDataFrame([("g", "r", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN v"):
        winsorize(bad, "v", "rid", ["grp"]).collect()
    idbad = spark.createDataFrame([("g", None, 1.0)], SCHEMA)
    with pytest.raises(Exception, match="NULL rid"):
        winsorize(idbad, "v", "rid", ["grp"]).collect()


def test_bucket_invariance_and_empty(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    ref = _collect(
        winsorize(df, "v", "rid", ["grp"], 0.05, 0.95, 1024), True
    )
    for nb in (1, 7):
        assert (
            _collect(winsorize(df, "v", "rid", ["grp"], 0.05, 0.95, nb), True)
            == ref
        )
    empty = spark.createDataFrame([], SCHEMA)
    assert winsorize(empty, "v", "rid", ["grp"]).collect() == []
    assert winsorize(empty, "v", "rid").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(grp VARCHAR, rid VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, ql, qh in ((True, 0.05, 0.95), (False, 0.25, 0.75)):
        g = ("grp",) if grouped else ()
        cols = "grp, rid AS id, v" if grouped else "rid AS id, v"
        res = con.execute(
            winsorize_sql(f"SELECT {cols} FROM tw", g, ql, qh)
        )
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d.get("grp"), d["id"])] = (
                d["v"], d["v_wins"], d["clipped"]
            )
        got = _collect(
            winsorize(df, "v", "rid", list(g) or None, ql, qh), grouped
        )
        assert got == want, (grouped, ql, qh)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = winsorize(df, "v", "rid", ["grp"], 0.05, 0.95)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
