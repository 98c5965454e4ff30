"""kaplan_meier (operators/temporal.py): product-limit survival —
textbook mirror from the DEFINITION (rational-exact product via
Fraction, compared within micro-nat rounding), the classic Kaplan-
Meier 1958 worked example, censoring-matters pin (censored rows are
NOT churn), all-die zero latch, fail-louds, empty contracts, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math
from fractions import Fraction

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import kaplan_meier_sql
from audiopro_essentia_spark.operators.temporal import kaplan_meier


def _mirror(rows, grouped):
    """Micro-nat replication of the operator's arithmetic (per-level
    ln rounded to micro-nats, exact sum, exp, round-6)."""
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [(d, e) for g, d, e in rows if gv is None or g == gv]
        n = len(grows)
        levels = sorted({d for d, _ in grows})
        lsum, dead = 0, False
        for t in levels:
            d_t = sum(1 for d, e in grows if d == t and e == 1)
            c_t = sum(1 for d, e in grows if d == t and e == 0)
            n_risk = sum(1 for d, _ in grows if d >= t)
            if d_t == 0:
                continue
            if n_risk == d_t:
                dead = True
            else:
                lsum += round(math.log((n_risk - d_t) / n_risk) * 1e6)
            out[(gv, t)] = (
                n_risk, d_t, c_t,
                0.0 if dead else round(math.exp(lsum / 1e6), 6),
            )
    return out


def _frac_km(rows):
    """INDEPENDENT rational-exact product-limit from the definition."""
    levels = sorted({d for d, _ in rows})
    s = Fraction(1)
    curve = {}
    for t in levels:
        d_t = sum(1 for d, e in rows if d == t and e == 1)
        n_risk = sum(1 for d, _ in rows if d >= t)
        if d_t == 0:
            continue
        s *= Fraction(n_risk - d_t, n_risk)
        curve[t] = s
    return curve


SCHEMA = "grp string, dur long, ev long"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None, r["t"]): (
            r["n_risk"], r["n_event"], r["n_censor"], r["survival"]
        )
        for r in df.collect()
    }


def _rows():
    rows = []
    for i in range(50):  # group a: mixed events/censoring, tie runs
        rows.append(("a", (i % 10) + 1, 1 if (i * 7) % 3 else 0))
    for i in range(20):  # group b: everyone eventually dies
        rows.append(("b", (i % 4) + 1, 1))
    rows.append(("c", 5, 0))  # pure censoring: no curve rows
    return rows


def test_mirror_and_rational_truth(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(kaplan_meier(df, "dur", "ev", ["grp"]), True)
    assert got == _mirror(rows, True)
    got_g = _collect(kaplan_meier(df, "dur", "ev", None), False)
    assert got_g == _mirror(rows, False)
    # micro-nat arithmetic tracks the EXACT rational product to ~1e-5
    truth = _frac_km([(d, e) for g, d, e in rows if g == "a"])
    for (gv, t), (_, _, _, s) in got.items():
        if gv == "a":
            assert abs(s - float(truth[t])) < 2e-5, (t, s, float(truth[t]))
    # group c (pure censoring) contributes no curve rows
    assert not any(gv == "c" for gv, _ in got)


def test_textbook_worked_example(spark):
    """The classic 6-MP-style small cohort: durations/events chosen so
    the curve is hand-computable: events at 1 (1/5), 3 (1/3),
    censored at 2 and 4."""
    rows = [("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0),
            ("g", 5, 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(kaplan_meier(df, "dur", "ev", ["grp"]), True)
    # t=1: n=5, d=1 -> 4/5; t=3: n=3, d=1 -> 4/5*2/3; t=5: n=1, d=1 -> 0
    assert got[("g", 1)][:3] == (5, 1, 0)
    assert abs(got[("g", 1)][3] - 0.8) < 2e-6
    assert got[("g", 3)][:3] == (3, 1, 0)
    assert abs(got[("g", 3)][3] - 0.8 * 2 / 3) < 2e-6
    assert got[("g", 5)] == (1, 1, 0, 0.0)  # all-die latch -> exact 0


def test_censoring_matters(spark):
    """Censored rows must NOT count as churn: survival with censoring
    is strictly higher than if the same rows were events."""
    cens = [("g", 1, 1)] + [("g", 2, 0)] * 5 + [("g", 3, 1), ("g", 4, 0)]
    dead = [(g, d, 1) for g, d, _ in cens]
    s_cens = _collect(
        kaplan_meier(spark.createDataFrame(cens, SCHEMA), "dur", "ev", ["grp"]),
        True,
    )[("g", 3)][3]
    s_dead = _collect(
        kaplan_meier(spark.createDataFrame(dead, SCHEMA), "dur", "ev", ["grp"]),
        True,
    )[("g", 3)][3]
    assert s_cens > s_dead


def test_fail_louds(spark):
    for rows, pat in (
        ([("g", None, 1)], "NULL/negative dur"),
        ([("g", -1, 1)], "NULL/negative dur"),
        ([("g", 1, 2)], "must be 0/1"),
        ([("g", 1, None)], "must be 0/1"),
    ):
        df = spark.createDataFrame(rows, SCHEMA)
        with pytest.raises(Exception, match=pat):
            kaplan_meier(df, "dur", "ev", ["grp"]).collect()


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert kaplan_meier(df, "dur", "ev", ["grp"]).collect() == []
    assert kaplan_meier(df, "dur", "ev").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tk(grp VARCHAR, dur BIGINT, ev BIGINT)")
    con.executemany("INSERT INTO tk VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        pfx = "grp, " if grouped else ""
        res = con.execute(
            kaplan_meier_sql(f"SELECT {pfx}dur, ev FROM tk", g)
        )
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d.get("grp"), d["t"])] = (
                d["n_risk"], d["n_event"], d["n_censor"], d["survival"]
            )
        got = _collect(kaplan_meier(df, "dur", "ev", list(g) or None), grouped)
        assert got == want, grouped


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = kaplan_meier(df, "dur", "ev", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
