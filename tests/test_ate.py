"""ate_ipw (operators/causal.py): Hajek IPW treatment effect — the
textbook confounding case where the naive difference reads 8.0 but the
design-exact IPW recovers ATE = 2.0 EXACTLY, the e=0.5 randomized
degenerate (IPW == simple difference), overlap trimming, ESS
diagnostics, mirror, fail-louds, empty contracts, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import ate_ipw_sql
from audiopro_essentia_spark.operators.causal import ate_ipw

SCHEMA = "grp string, y double, t long, e double"


def _confounded():
    """x in {0,1} equally likely, e(x)=0.2/0.8, y = 10x + 2T; cell
    counts exactly proportional to the design so Hajek IPW recovers
    ATE = 2.0 EXACTLY while the naive difference is 8.0."""
    rows = []
    rows += [("g", 2.0, 1, 0.2)] * 20   # x=0 treated
    rows += [("g", 0.0, 0, 0.2)] * 80   # x=0 control
    rows += [("g", 12.0, 1, 0.8)] * 80  # x=1 treated
    rows += [("g", 10.0, 0, 0.8)] * 20  # x=1 control
    return rows


def _mirror(rows, trim, grouped):
    t_u = round(trim * 1e6)
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        arms = {1: [0, 0, 0, 0], 0: [0, 0, 0, 0]}  # n, w, wy, ww
        trimmed = 0
        for _, y, t, e in grows:
            eu = round(e * 1e6)
            if not (t_u <= eu <= 1_000_000 - t_u):
                trimmed += 1
                continue
            w = round(1e6 / (e if t == 1 else 1.0 - e))
            yu = round(y * 1e6)
            a = arms[t]
            a[0] += 1
            a[1] += w
            a[2] += w * yu
            a[3] += w * w
        def mu(t):
            n, w, wy, _ = arms[t]
            return round(wy / w / 1e6, 6) if n else None
        def ess(t):
            n, w, _, ww = arms[t]
            return round(w * w / ww, 6) if n else None
        nt, nc = arms[1][0], arms[0][0]
        if nt + nc + trimmed == 0:
            continue
        ate = (
            round(mu(1) - mu(0), 6) if nt and nc else None
        )
        out[gv] = (nt, nc, trimmed, mu(1), mu(0), ate, ess(1), ess(0))
    return out


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n_t"], r["n_c"], r["n_trimmed"], r["mu_t"], r["mu_c"],
            r["ate"], r["ess_t"], r["ess_c"],
        )
        for r in df.collect()
    }


def test_confounding_recovered_exactly(spark):
    rows = _confounded()
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = ate_ipw(df, "y", "t", "e", ["grp"]).collect()
    assert (r["n_t"], r["n_c"], r["n_trimmed"]) == (100, 100, 0)
    assert (r["mu_t"], r["mu_c"], r["ate"]) == (7.0, 5.0, 2.0)
    # the naive as-assigned difference is badly confounded: 10 - 2 = 8
    naive = (20 * 2.0 + 80 * 12.0) / 100 - (80 * 0.0 + 20 * 10.0) / 100
    assert naive == 8.0 and abs(r["ate"] - naive) > 5.9


def test_randomized_degenerate_and_mirror(spark):
    # e = 0.5 everywhere: IPW == the simple difference of means
    rows = []
    for i in range(40):
        rows.append(("g", 3.0 + 0.25 * (i % 4), 1, 0.5))
        rows.append(("g", 1.0 + 0.25 * (i % 3), 0, 0.5))
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = ate_ipw(df, "y", "t", "e", ["grp"]).collect()
    m1 = sum(y for _, y, t, _ in rows if t == 1) / 40
    m0 = sum(y for _, y, t, _ in rows if t == 0) / 40
    assert r["ate"] == round(round(m1, 6) - round(m0, 6), 6)
    assert r["ess_t"] == 40.0 and r["ess_c"] == 40.0  # constant weights
    # full mirror over a mixed soup, grouped + global
    soup = _confounded() + [("h", 1.0 + 0.5 * i, i % 2,
                             0.1 + 0.05 * (i % 17)) for i in range(60)]
    dfs = spark.createDataFrame(soup, SCHEMA)
    for trim in (0.0, 0.15):
        got = _collect(ate_ipw(dfs, "y", "t", "e", ["grp"], trim), True)
        assert got == _mirror(soup, trim, True), trim
    got_g = _collect(ate_ipw(dfs, "y", "t", "e", None, 0.15), False)
    assert got_g == _mirror(soup, 0.15, False)


def test_trimming_counts_not_clamps(spark):
    rows = [("g", 1.0, 1, 0.001), ("g", 2.0, 1, 0.5),
            ("g", 3.0, 0, 0.999), ("g", 4.0, 0, 0.5)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = ate_ipw(df, "y", "t", "e", ["grp"], trim=0.05).collect()
    assert r["n_trimmed"] == 2
    assert (r["n_t"], r["n_c"]) == (1, 1)
    assert (r["mu_t"], r["mu_c"]) == (2.0, 4.0)


def test_fail_louds_and_guards(spark):
    with pytest.raises(ValueError, match="trim"):
        ate_ipw(
            spark.createDataFrame([("g", 1.0, 1, 0.5)], SCHEMA),
            "y", "t", "e", trim=0.5,
        )
    for rows, pat in (
        ([("g", None, 1, 0.5)], "NULL/NaN y"),
        ([("g", float("nan"), 0, 0.5)], "NULL/NaN y"),
        ([("g", 1.0, 2, 0.5)], "must be 0/1"),
        ([("g", 1.0, None, 0.5)], "must be 0/1"),
        ([("g", 1.0, 1, 0.0)], "must be in \\(0, 1\\)"),
        ([("g", 1.0, 1, 1.0)], "must be in \\(0, 1\\)"),
        ([("g", 1.0, 1, None)], "must be in \\(0, 1\\)"),
    ):
        df = spark.createDataFrame(rows, SCHEMA)
        with pytest.raises(Exception, match=pat):
            ate_ipw(df, "y", "t", "e", ["grp"]).collect()


def test_one_armed_group_and_empty(spark):
    df = spark.createDataFrame([("g", 1.0, 1, 0.5)], SCHEMA)
    (r,) = ate_ipw(df, "y", "t", "e", ["grp"]).collect()
    assert (r["n_t"], r["n_c"], r["mu_c"], r["ate"]) == (1, 0, None, None)
    empty = spark.createDataFrame([], SCHEMA)
    assert ate_ipw(empty, "y", "t", "e", ["grp"]).collect() == []
    assert ate_ipw(empty, "y", "t", "e").collect() == []


def test_twin_equality(spark):
    soup = _confounded() + [("h", 1.0 + 0.5 * i, i % 2,
                             0.1 + 0.05 * (i % 17)) for i in range(60)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ta2(grp VARCHAR, y DOUBLE, t BIGINT, e DOUBLE)"
    )
    con.executemany("INSERT INTO ta2 VALUES (?, ?, ?, ?)", soup)
    df = spark.createDataFrame(soup, SCHEMA)
    for grouped, trim in ((True, 0.0), (True, 0.15), (False, 0.05)):
        g = ("grp",) if grouped else ()
        pfx = "grp, " if grouped else ""
        res = con.execute(
            ate_ipw_sql(f"SELECT {pfx}y, t, e FROM ta2", g, trim)
        )
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (
                d["n_t"], d["n_c"], d["n_trimmed"], d["mu_t"], d["mu_c"],
                d["ate"], d["ess_t"], d["ess_c"],
            )
        got = _collect(
            ate_ipw(df, "y", "t", "e", list(g) or None, trim), grouped
        )
        assert got == want, (grouped, trim)


def test_plan_pins(spark):
    df = spark.createDataFrame(_confounded(), SCHEMA)
    out = ate_ipw(df, "y", "t", "e", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
