"""kripp_alpha (operators/evalmetrics.py): Krippendorff's nominal
alpha — Fraction-exact definition mirror grouped+global, the
unequal-panel + excluded-single-rating contracts fleiss_kappa
refuses, perfect/chance degenerates, single-category NULL, guards,
empty contracts, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io
from collections import Counter
from fractions import Fraction as Fr

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import kripp_alpha_sql
from audiopro_essentia_spark.operators.evalmetrics import kripp_alpha

SCHEMA = "grp string, item string, label string"


def _mirror(rows, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        cells = Counter((i, l) for _, i, l in grows)
        ni = Counter()
        for (i, _), c in cells.items():
            ni[i] += c
        inc = {i for i, c in ni.items() if c >= 2}
        n_exc = len(ni) - len(inc)
        n = sum(ni[i] for i in inc)
        nc = Counter()
        for (i, l), c in cells.items():
            if i in inc:
                nc[l] += c
        if n < 2:
            out[gv] = (len(inc), n_exc, n, len(nc), None, None, None)
            continue
        # per-item terms micro-rounded once (the operator's contract)
        do_u = sum(
            round(
                float(
                    Fr(
                        ni[i] ** 2
                        - sum(
                            c * c
                            for (ii, _), c in cells.items()
                            if ii == i
                        ),
                        ni[i] - 1,
                    )
                )
                * 1e6
            )
            for i in inc
        )
        d_o = do_u / 1e6 / n
        d_e = (n * n - sum(v * v for v in nc.values())) / (n * (n - 1))
        alpha = (
            round(1.0 - d_o / d_e, 6)
            if round(d_e * 1e6) > 0
            else None
        )
        out[gv] = (
            len(inc), n_exc, n, len(nc),
            round(d_o, 6), round(d_e, 6), alpha,
        )
    return out


def _rows():
    return [
        ("g", "i1", "a"), ("g", "i1", "a"), ("g", "i1", "b"),
        ("g", "i2", "b"), ("g", "i2", "b"),
        ("g", "i3", "a"), ("g", "i3", "a"), ("g", "i3", "a"),
        ("g", "i3", "b"),
        ("g", "i4", "c"),                       # single rating: excluded
        ("h", "j1", "x"), ("h", "j1", "x"),
        ("h", "j2", "x"), ("h", "j2", "y"), ("h", "j2", "y"),
    ]


def _collect(df, grouped=True):
    return {
        (r["grp"] if grouped else None): tuple(r)[(1 if grouped else 0):]
        for r in df.collect()
    }


def test_mirror_and_unequal_panels(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(kripp_alpha(df, "item", "label", ["grp"]))
    assert got == _mirror(rows, True)
    # the worked case: D_o = 4/9, D_e = 5/9, alpha = 0.2 EXACTLY
    assert got["g"] == (3, 1, 9, 2, 0.444444, 0.555556, 0.2)
    got_g = _collect(kripp_alpha(df, "item", "label"), False)
    assert got_g == _mirror(rows, False)


def test_degenerates(spark):
    # perfect agreement across unequal panels: alpha exactly 1
    rows = (
        [("g", "i1", "a")] * 2
        + [("g", "i2", "b")] * 4
        + [("g", "i3", "a")] * 3
    )
    df = spark.createDataFrame(rows, SCHEMA)
    r = _collect(kripp_alpha(df, "item", "label", ["grp"]))["g"]
    assert r[4] == 0.0 and r[6] == 1.0
    # single category: D_e == 0 -> NULL alpha
    one = spark.createDataFrame(
        [("g", "i1", "z")] * 2 + [("g", "i2", "z")] * 3, SCHEMA
    )
    ro = _collect(kripp_alpha(one, "item", "label", ["grp"]))["g"]
    assert ro[6] is None and ro[3] == 1
    # ALL items single-rating: group still reports, all-NULL stats
    s = spark.createDataFrame(
        [("g", "i1", "a"), ("g", "i2", "b")], SCHEMA
    )
    rs = _collect(kripp_alpha(s, "item", "label", ["grp"]))["g"]
    assert rs == (0, 2, 0, 0, None, None, None)


def test_guards_and_empty(spark):
    bad = spark.createDataFrame([("g", None, "a")], SCHEMA)
    with pytest.raises(Exception, match="NULL item"):
        kripp_alpha(bad, "item", "label", ["grp"]).collect()
    badl = spark.createDataFrame([("g", "i", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL label"):
        kripp_alpha(badl, "item", "label", ["grp"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert kripp_alpha(empty, "item", "label", ["grp"]).collect() == []
    assert kripp_alpha(empty, "item", "label").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, item VARCHAR, label VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        cols = "grp, item, label" if grouped else "item, label"
        want = sorted(
            con.execute(
                kripp_alpha_sql(f"SELECT {cols} FROM tw", g)
            ).fetchall()
        )
        got = sorted(
            tuple(r)
            for r in kripp_alpha(
                df, "item", "label", list(g) or None
            ).collect()
        )
        assert got == want, grouped


def test_plan_pins(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = kripp_alpha(df, "item", "label", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
