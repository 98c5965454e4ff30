"""quality_checks (operators/checks.py): Deequ-style declarative
constraint suite — Python-mirror equality over every kind, exact
boundary semantics (metric == threshold PASSES, one micro-unit above
fails), all-NULL-group den=0/passed=NULL contract, NaN fail-loud,
driver-side validation guards, empty contracts, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import quality_checks_sql
from audiopro_essentia_spark.operators.checks import quality_checks

ROWS = [
    ("a", "r1", 1.5, "en", "abc"),
    ("a", "r2", 2.5, "en", "abd"),
    ("a", "r3", None, "EN", None),
    ("a", "r4", 4.0, "de", "xyz"),
    ("a", "r4", -1.0, None, "zz9"),
    ("b", "s1", 10.0, "fr", "aaa"),
    ("b", "s2", None, "fr", "bb"),
    ("c", "t1", None, None, None),
]
SCHEMA = "grp string, id string, val double, lang string, txt string"

CHECKS = [
    {"name": "c_id", "column": "id", "kind": "completeness", "threshold": 1.0},
    {"name": "c_val", "column": "val", "kind": "completeness", "threshold": 0.8},
    {"name": "u_id", "column": "id", "kind": "uniqueness", "threshold": 1.0},
    {"name": "d_lang", "column": "lang", "kind": "distinctness", "threshold": 0.5},
    {"name": "mn", "column": "val", "kind": "min_ge", "bound": -1.0},
    {"name": "mx", "column": "val", "kind": "max_le", "bound": 4.0},
    {"name": "mu", "column": "val", "kind": "mean_ge", "bound": 1.75},
    {"name": "pat", "column": "txt", "kind": "pattern", "threshold": 0.75,
     "pattern": "[a-z]+"},
    {"name": "ins", "column": "lang", "kind": "in_set", "threshold": 0.5,
     "values": ["en", "fr"]},
]


def _mirror(rows, checks, grouped):
    """Outside-definition Python mirror (plain set/regex/arith semantics,
    no shared derivation with the operator)."""
    import re

    groups = sorted({r[0] for r in rows}) if grouped else [None]
    cols = {"id": 1, "val": 2, "lang": 3, "txt": 4}
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        n = len(grows)
        if n == 0:
            continue
        for c in checks:
            vals = [r[cols[c["column"]]] for r in grows]
            nn = [v for v in vals if v is not None]
            kind = c["kind"]
            if kind == "completeness":
                num, den = len(nn), n
            elif kind == "uniqueness":
                num = sum(1 for v in set(nn) if nn.count(v) == 1)
                den = len(nn)
            elif kind == "distinctness":
                num, den = len(set(nn)), len(nn)
            elif kind == "pattern":
                num = sum(1 for v in nn if re.fullmatch(c["pattern"], v))
                den = len(nn)
            elif kind == "in_set":
                num = sum(1 for v in nn if v in c["values"])
                den = len(nn)
            else:
                mic = [round(v * 1e6) for v in nn]
                den = len(nn)
                b = round(c["bound"] * 1e6)
                if den == 0:
                    metric, passed = None, None
                elif kind == "min_ge":
                    metric = round(min(mic) / 1e6, 6)
                    passed = int(min(mic) >= b)
                elif kind == "max_le":
                    metric = round(max(mic) / 1e6, 6)
                    passed = int(max(mic) <= b)
                else:
                    s = sum(mic)
                    metric = round(s / (den * 1e6), 6)
                    passed = int(
                        s >= b * den if kind == "mean_ge" else s <= b * den
                    )
                out[(gv, c["name"])] = (
                    n, None, den, metric, round(b / 1e6, 6), passed
                )
                continue
            t = round(c["threshold"] * 1e6)
            metric = round(num / den, 6) if den else None
            passed = int(1_000_000 * num >= t * den) if den else None
            out[(gv, c["name"])] = (
                n, num, den, metric, round(t / 1e6, 6), passed
            )
    return out


def _collect(df, grouped):
    out = {}
    for r in df.collect():
        key = (r["grp"] if grouped else None, r["check_name"])
        assert key not in out
        out[key] = (
            r["n"], r["num"], r["den"], r["metric"], r["threshold"],
            r["passed"],
        )
    return out


def test_mirror_grouped_and_global(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect(quality_checks(df, CHECKS, ["grp"]), True)
    assert got == _mirror(ROWS, CHECKS, True)
    got_g = _collect(quality_checks(df, CHECKS), False)
    assert got_g == _mirror(ROWS, CHECKS, False)


def test_hand_invariants(spark):
    """Boundary cases tied to outside definitions, not the mirror."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _collect(quality_checks(df, CHECKS, ["grp"]), True)
    # metric EXACTLY equal to the threshold PASSES (>= semantics)
    assert got[("a", "c_val")] == (5, 4, 5, 0.8, 0.8, 1)
    assert got[("b", "d_lang")] == (2, 1, 2, 0.5, 0.5, 1)
    assert got[("a", "mu")][3:] == (1.75, 1.75, 1)  # mean == bound
    assert got[("a", "mn")][3:] == (-1.0, -1.0, 1)
    assert got[("a", "mx")][3:] == (4.0, 4.0, 1)
    assert got[("a", "pat")] == (5, 3, 4, 0.75, 0.75, 1)
    assert got[("a", "ins")] == (5, 2, 4, 0.5, 0.5, 1)  # 'EN' is NOT 'en'
    # duplicate id r4 kills uniqueness in group a; key-clean in b
    assert got[("a", "u_id")] == (5, 3, 5, 0.6, 1.0, 0)
    assert got[("b", "u_id")][5] == 1
    # all-NULL group c: den=0 -> metric/passed NULL, never a dropped row
    assert got[("c", "d_lang")] == (1, 0, 0, None, 0.5, None)
    assert got[("c", "mn")] == (1, None, 0, None, -1.0, None)
    assert got[("c", "pat")] == (1, 0, 0, None, 0.75, None)
    assert got[("c", "c_val")] == (1, 0, 1, 0.0, 0.8, 0)
    # one micro-unit above the metric fails — exact integer compare
    tight = [{"name": "u6", "column": "id", "kind": "uniqueness",
              "threshold": 0.600001}]
    g2 = _collect(quality_checks(df, tight, ["grp"]), True)
    assert g2[("a", "u6")][5] == 0


def test_nan_fails_loud(spark):
    df = spark.createDataFrame(
        [("a", "r1", float("nan"), "en", "x")], SCHEMA
    )
    bad = [{"name": "m", "column": "val", "kind": "min_ge", "bound": 0.0}]
    with pytest.raises(Exception, match="NaN val"):
        quality_checks(df, bad, ["grp"]).collect()


def test_validation_guards(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="empty check list"):
        quality_checks(df, [])
    with pytest.raises(ValueError, match="duplicate name"):
        quality_checks(df, [CHECKS[0], CHECKS[0]])
    with pytest.raises(ValueError, match="unknown column"):
        quality_checks(df, [{"name": "x", "column": "nope",
                             "kind": "completeness", "threshold": 1.0}])
    with pytest.raises(ValueError, match="unknown kind"):
        quality_checks(df, [{"name": "x", "column": "id",
                             "kind": "median_ge", "bound": 1.0}])
    with pytest.raises(ValueError, match="needs a numeric column"):
        quality_checks(df, [{"name": "x", "column": "id",
                             "kind": "min_ge", "bound": 1.0}])
    with pytest.raises(ValueError, match="threshold must be in"):
        quality_checks(df, [{"name": "x", "column": "id",
                             "kind": "completeness", "threshold": 1.5}])
    with pytest.raises(ValueError, match="multiple of 1e-6"):
        quality_checks(df, [{"name": "x", "column": "id",
                             "kind": "completeness",
                             "threshold": 0.33333333333}])
    with pytest.raises(ValueError, match="needs a string column"):
        quality_checks(df, [{"name": "x", "column": "val",
                             "kind": "in_set", "threshold": 0.5,
                             "values": ["1.0"]}])
    with pytest.raises(ValueError, match="pattern needs a string"):
        quality_checks(df, [{"name": "x", "column": "val",
                             "kind": "pattern", "threshold": 0.5,
                             "pattern": "x"}])
    with pytest.raises(ValueError, match="bound required"):
        quality_checks(df, [{"name": "x", "column": "val",
                             "kind": "min_ge"}])


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert quality_checks(df, CHECKS, ["grp"]).collect() == []
    assert quality_checks(df, CHECKS).collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tq(grp VARCHAR, id VARCHAR, val DOUBLE, "
        "lang VARCHAR, txt VARCHAR)"
    )
    con.executemany("INSERT INTO tq VALUES (?, ?, ?, ?, ?)", ROWS)
    df = spark.createDataFrame(ROWS, SCHEMA)
    src = "SELECT grp, id, val, lang, txt FROM tq"
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        sql = quality_checks_sql(src, CHECKS, g)
        cols = (["grp"] if grouped else []) + [
            "check_name", "n", "num", "den", "metric", "threshold", "passed"
        ]
        want = {}
        res = con.execute(sql)
        names = [d[0] for d in res.description]
        for row in res.fetchall():
            d = dict(zip(names, row))
            key = (d.get("grp"), d["check_name"])
            want[key] = (
                d["n"], d["num"], d["den"], d["metric"], d["threshold"],
                d["passed"],
            )
        got = _collect(
            quality_checks(df, CHECKS, list(g) or None), grouped
        )
        assert got == want, grouped


def test_plan_pins(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = quality_checks(df, CHECKS, ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
