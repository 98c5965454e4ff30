"""pref_winrate (operators/evalmetrics.py): pairwise preference win
rates + Wilson intervals — count mirror, the Wilson closed form
checked against an independent hand evaluation and its two defining
properties (contains p, never escapes [0,1] — where Wald does),
pair-order canonicalization, tie semantics, fail-louds (winner not
in pair, self-pair), zero-decided contract, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import pref_winrate_sql
from audiopro_essentia_spark.operators.evalmetrics import pref_winrate


def _wilson(wins, losses, z):
    n = wins + losses
    if n == 0:
        return None, None, None
    p = wins / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (
        round(p, 6), round(center - half, 6), round(center + half, 6)
    )


SCHEMA = "grp string, a string, b string, w string"


def _rows():
    rows = []
    # pair (m1, m2): 12-5 with 3 ties, entered in BOTH orders
    for i in range(12):
        rows.append(("g", "m1" if i % 2 else "m2",
                     "m2" if i % 2 else "m1", "m1"))
    for i in range(5):
        rows.append(("g", "m1", "m2", "m2"))
    for i in range(3):
        rows.append(("g", "m2", "m1", None))
    # pair (m1, m3): all ties (decided = 0)
    rows.append(("g", "m1", "m3", None))
    return rows


def _collect(df, grouped=True):
    return {
        (r["lo"], r["hi"]): (
            r["n"], r["wins_lo"], r["wins_hi"], r["ties"],
            r["p_lo"], r["wilson_lo"], r["wilson_hi"],
        )
        for r in df.collect()
    }


def test_counts_wilson_and_canonicalization(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    got = _collect(pref_winrate(df, "a", "b", "w", ["grp"]))
    p, lo, hi = _wilson(12, 5, 1.96)
    assert got[("m1", "m2")] == (20, 12, 5, 3, p, lo, hi)
    # zero decided games: NULL rate and interval, ties visible
    assert got[("m1", "m3")] == (1, 0, 0, 1, None, None, None)
    # Wilson properties: interval contains p and stays inside [0, 1]
    assert lo < p < hi and 0.0 <= lo and hi <= 1.0
    # extreme p at tiny n: Wald collapses to zero width, Wilson won't
    ex = spark.createDataFrame(
        [("g", "x", "y", "x")] * 3, SCHEMA
    )
    ge = _collect(pref_winrate(ex, "a", "b", "w", ["grp"]))
    _, wlo, whi = _wilson(3, 0, 1.96)
    assert ge[("x", "y")][4] == 1.0
    assert ge[("x", "y")][5] == wlo and wlo < 1.0
    assert ge[("x", "y")][6] == 1.0


def test_z_parameter_and_global(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    for z in (1.0, 2.576):
        got = _collect(pref_winrate(df, "a", "b", "w", None, z))
        p, lo, hi = _wilson(12, 5, z)
        assert got[("m1", "m2")][4:] == (p, lo, hi), z
    # wider z -> wider interval
    g1 = _collect(pref_winrate(df, "a", "b", "w", None, 1.0))
    g2 = _collect(pref_winrate(df, "a", "b", "w", None, 2.576))
    assert g2[("m1", "m2")][5] < g1[("m1", "m2")][5]
    assert g2[("m1", "m2")][6] > g1[("m1", "m2")][6]


def test_fail_louds_and_guards(spark):
    bad = spark.createDataFrame([("g", "x", "y", "z")], SCHEMA)
    with pytest.raises(Exception, match="winner not in pair"):
        pref_winrate(bad, "a", "b", "w", ["grp"]).collect()
    selfp = spark.createDataFrame([("g", "x", "x", "x")], SCHEMA)
    with pytest.raises(Exception, match="self-pair"):
        pref_winrate(selfp, "a", "b", "w", ["grp"]).collect()
    nulla = spark.createDataFrame([("g", None, "y", "y")], SCHEMA)
    with pytest.raises(Exception, match="NULL a/b"):
        pref_winrate(nulla, "a", "b", "w", ["grp"]).collect()
    df = spark.createDataFrame([("g", "x", "y", "x")], SCHEMA)
    with pytest.raises(ValueError, match=r"z must be in"):
        pref_winrate(df, "a", "b", "w", z=0.0)
    empty = spark.createDataFrame([], SCHEMA)
    assert pref_winrate(empty, "a", "b", "w", ["grp"]).collect() == []
    assert pref_winrate(empty, "a", "b", "w").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, a VARCHAR, b VARCHAR, w VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, z in ((True, 1.96), (False, 2.576)):
        g = ("grp",) if grouped else ()
        cols = "grp, a, b, w" if grouped else "a, b, w"
        want = sorted(
            con.execute(
                pref_winrate_sql(f"SELECT {cols} FROM tw", g, z)
            ).fetchall()
        )
        got = sorted(
            tuple(r)
            for r in pref_winrate(
                df, "a", "b", "w", list(g) or None, z
            ).collect()
        )
        assert got == want, (grouped, z)


def test_plan_pins(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = pref_winrate(df, "a", "b", "w", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
