"""bh_fdr: exact integer Benjamini-Hochberg mirror, textbook hand
case, tie runs, no-rejection case, q monotonicity, fail-louds, empty
contract, twin equality, zero-Python plan pin."""

from __future__ import annotations

import contextlib
import io
import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import bh_fdr_sql
from audiopro_essentia_spark.operators.evalmetrics import bh_fdr


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _mirror(ps, alpha):
    """{p_micro: (reject, q)} — textbook BH on sorted p's, integer
    micro arithmetic matching the operator's spec."""
    import math

    au = int(math.floor(alpha * 1e6 + 0.5))
    us = sorted(_q(p) for p in ps)
    m = len(us)
    vstar = None
    for k, u in enumerate(us, 1):
        if u * m <= k * au:
            vstar = u
    # q: suffix min of floor(m*u/k) at each rank, ties -> largest rank
    qs = {}
    best = 10**18
    for k in range(m, 0, -1):
        u = us[k - 1]
        best = min(best, min(1_000_000, (m * u) // k))
        qs[u] = best  # overwritten by smaller k only via suffix-min --
        # within a tie run the LAST write (smallest k) has the same
        # suffix-min as the largest rank (candidates within the run
        # only grow the min downward identically)
    return {
        u: (
            1 if (vstar is not None and u <= vstar) else 0,
            round(qs[u] / 1e6, 6),
        )
        for u in us
    }


def _ps(g, n=120):
    rnd = random.Random(23 + g)
    # mixture of nulls (uniform) and signals (tiny), plus planted ties
    ps = [rnd.randrange(0, 1_000_001) / 1e6 for _ in range(n)]
    ps += [rnd.randrange(0, 2_001) / 1e6 for _ in range(20)]
    ps += [0.03, 0.03, 0.03, 1.0, 0.0]
    return ps


def test_mirror_grouped_and_global(spark):
    rows = [(g, i, p) for g in range(3) for i, p in enumerate(_ps(g))]
    df = spark.createDataFrame(rows, "g long, i long, p double")
    for alpha in (0.05, 0.2):
        got = {
            (r["g"], r["i"]): (r["reject"], r["q_value"])
            for r in bh_fdr(df, "p", alpha, ["g"], ["i"]).collect()
        }
        exp = {}
        for g in range(3):
            mir = _mirror(_ps(g), alpha)
            for i, p in enumerate(_ps(g)):
                exp[(g, i)] = mir[_q(p)]
        assert got == exp, alpha
    # global
    allp = [p for g in range(3) for p in _ps(g)]
    mir = _mirror(allp, 0.1)
    got = {
        r["i"]: (r["reject"], r["q_value"])
        for r in bh_fdr(
            df.withColumn("i", F.col("g") * 1000 + F.col("i")).drop("g"),
            "p", 0.1, None, ["i"],
        ).collect()
    }
    rowsg = [(g * 1000 + i, p) for g in range(3) for i, p in enumerate(_ps(g))]
    assert got == {i: mir[_q(p)] for i, p in rowsg}


def test_textbook_and_edges(spark):
    d = spark.createDataFrame(
        [(0, 0.01), (1, 0.04), (2, 0.03), (3, 0.005)], "i long, p double"
    )
    got = {
        r["i"]: (r["reject"], r["q_value"])
        for r in bh_fdr(d, "p", 0.05, None, ["i"]).collect()
    }
    assert got == {0: (1, 0.02), 1: (1, 0.04), 2: (1, 0.04), 3: (1, 0.02)}
    # nothing significant: uniform-ish large p's
    d = spark.createDataFrame(
        [(i, 0.5 + i / 10) for i in range(5)], "i long, p double"
    )
    out = bh_fdr(d, "p", 0.05, None, ["i"]).collect()
    assert all(r["reject"] == 0 for r in out)
    assert all(r["q_value"] >= 0.9 for r in out)
    # q monotone in p
    byp = sorted((r["p"], r["q_value"]) for r in out)
    assert all(a[1] <= b[1] for a, b in zip(byp, byp[1:]))
    # ties stand or fall together
    d = spark.createDataFrame(
        [(i, 0.02) for i in range(4)] + [(9, 0.9)], "i long, p double"
    )
    out = {
        r["i"]: r["reject"]
        for r in bh_fdr(d, "p", 0.05, None, ["i"]).collect()
    }
    assert {out[i] for i in range(4)} == {1} and out[9] == 0


def test_fail_louds_and_empty(spark):
    for rows in ([(None,)], [(1.5,)], [(float("nan"),)]):
        df = spark.createDataFrame(rows, "p double")
        with pytest.raises(Exception, match="bh_fdr: NULL/NaN/out-of-"):
            bh_fdr(df, "p").collect()
    with pytest.raises(ValueError, match="alpha"):
        bh_fdr(spark.createDataFrame([(0.5,)], "p double"), "p", alpha=1.0)
    empty = spark.createDataFrame([], "g long, p double")
    assert bh_fdr(empty, "p", 0.05, ["g"]).collect() == []
    assert bh_fdr(empty.drop("g"), "p").collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(g, i, p) for g in range(3) for i, p in enumerate(_ps(g))]
    con.execute("CREATE TABLE t(g BIGINT, i BIGINT, p DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, i long, p double")
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            bh_fdr_sql("SELECT i, g, p FROM t", ("g",), ("i",), 0.05)
        ).fetchall()
    }
    got = {
        (r["i"], r["g"]): (r["p"], r["reject"], r["q_value"])
        for r in bh_fdr(df, "p", 0.05, ["g"], ["i"]).collect()
    }
    assert got == want
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            bh_fdr_sql("SELECT i, p FROM t WHERE g = 1", (), ("i",), 0.1)
        ).fetchall()
    }
    got = {
        r["i"]: (r["p"], r["reject"], r["q_value"])
        for r in bh_fdr(
            df.where("g=1").drop("g"), "p", 0.1, None, ["i"]
        ).collect()
    }
    assert got == want


def test_plan_pin(spark):
    rows = [(g, i, p) for g in range(2) for i, p in enumerate(_ps(g, n=40))]
    df = spark.createDataFrame(rows, "g long, i long, p double")
    out = bh_fdr(df, "p", 0.05, ["g"], ["i"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
