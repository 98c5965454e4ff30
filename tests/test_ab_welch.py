"""ab_welch_test (operators/evalmetrics.py): Welch two-sample test —
exact-int mirror grouped+global, textbook hand case computed from the
Welch-Satterthwaite definitions, degenerate contracts (constant arms,
n<2, one-sided groups), ignored variants, fail-louds, guards, empty
contracts, twin equality, one-aggregate plan pin."""

from __future__ import annotations

import contextlib
import io
import math
from statistics import NormalDist

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import ab_welch_test_sql
from audiopro_essentia_spark.operators.evalmetrics import ab_welch_test


def _mirror(rows, control, treatment, alpha, grouped):
    crit = round(NormalDist().inv_cdf(1 - alpha / 2), 6)
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        arms = {}
        for tag, name in (("c", control), ("t", treatment)):
            xs = [round(v * 1e6) for _, vn, v in grows if vn == name]
            arms[tag] = (len(xs), sum(xs), sum(x * x for x in xs))
        nc, sc, ssc = arms["c"]
        nt, st, sst = arms["t"]
        if nc == 0 and nt == 0:
            continue
        mean_c = round(sc / (nc * 1e6), 6) if nc else None
        mean_t = round(st / (nt * 1e6), 6) if nt else None
        diff = se = t = dfw = sig = None
        if nc and nt:
            diffm = (st * nc - sc * nt) / (nc * nt)
            diff = round(diffm / 1e6, 6)
            if nc > 1 and nt > 1:
                vnc = (nc * ssc - sc * sc) / (nc * (nc - 1)) / nc
                vnt = (nt * sst - st * st) / (nt * (nt - 1)) / nt
                sem = math.sqrt(vnc + vnt)
                se = round(sem / 1e6, 6)
                if sem > 0:
                    t = round(diffm / sem, 6)
                    dfw = round(
                        (vnc + vnt) ** 2
                        / (vnc * vnc / (nc - 1) + vnt * vnt / (nt - 1)),
                        6,
                    )
                    sig = int(abs(t) >= crit)
        out[gv] = (nc, nt, mean_c, mean_t, diff, se, t, dfw, sig)
    return out


def _rows():
    rows = []
    for i in range(40):  # group g1: real difference
        rows.append(("g1", "A", 10.0 + 0.25 * (i % 5)))
        rows.append(("g1", "B", 12.0 + 0.5 * (i % 7)))
    for i in range(30):  # group g2: same distribution
        rows.append(("g2", "A", 5.0 + 0.25 * (i % 4)))
        rows.append(("g2", "B", 5.0 + 0.25 * ((i + 2) % 4)))
    rows.append(("g3", "A", 1.0))  # n_c = 1 in g3
    for i in range(5):
        rows.append(("g3", "B", 2.0 + 0.5 * i))
    for i in range(4):
        rows.append(("g1", "C", 99.0))  # ignored variant
    return rows


SCHEMA = "grp string, variant string, v double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n_c"], r["n_t"], r["mean_c"], r["mean_t"], r["diff"],
            r["se"], r["t_stat"], r["df_welch"], r["significant"],
        )
        for r in df.collect()
    }


def test_mirror_grouped_and_global(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(ab_welch_test(df, "v", "variant", "A", "B", ["grp"]), True)
    want = {g: v for g, v in _mirror(rows, "A", "B", 0.05, True).items()}
    assert got == want
    got_g = _collect(
        ab_welch_test(df, "v", "variant", "A", "B", None, alpha=0.01), False
    )
    assert got_g == _mirror(rows, "A", "B", 0.01, False)
    # the real difference is significant, the null one is not
    assert got["g1"][8] == 1
    assert got["g2"][8] == 0
    # n_c = 1 in g3: counts/means visible, inference NULL
    assert got["g3"][0] == 1 and got["g3"][2] == 1.0
    assert got["g3"][5:] == (None, None, None, None)


def test_textbook_hand_case(spark):
    """control [1,2,3], treatment [2,4,6,8]: mean diff 3, se = sqrt(2),
    t = 3/sqrt(2), df = 4 / ((1/9)/2 + (25/9)/3) — from the
    Welch-Satterthwaite definitions, not the mirror."""
    rows = [("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
            ("g", "B", 2.0), ("g", "B", 4.0), ("g", "B", 6.0),
            ("g", "B", 8.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = ab_welch_test(df, "v", "variant", "A", "B", ["grp"]).collect()
    assert (r["n_c"], r["n_t"], r["mean_c"], r["mean_t"]) == (3, 4, 2.0, 5.0)
    assert r["diff"] == 3.0
    assert r["se"] == round(math.sqrt(2.0), 6)
    assert r["t_stat"] == round(3.0 / math.sqrt(2.0), 6)
    assert r["df_welch"] == round(
        4.0 / ((1 / 9) / 2 + (25 / 9) / 3), 6
    )
    assert r["significant"] == 1  # |2.121| >= 1.959964


def test_degenerate_contracts(spark):
    # both arms constant: se = 0, t undefined -> NULL (never a /0)
    rows = [("g", "A", 2.0)] * 5 + [("g", "B", 3.0)] * 5
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = ab_welch_test(df, "v", "variant", "A", "B", ["grp"]).collect()
    assert (r["diff"], r["se"]) == (1.0, 0.0)
    assert (r["t_stat"], r["df_welch"], r["significant"]) == (None,) * 3
    # group with only one variant: the other side's stats NULL
    one = spark.createDataFrame([("g", "A", 1.0), ("g", "A", 2.0)], SCHEMA)
    (r1,) = ab_welch_test(one, "v", "variant", "A", "B", ["grp"]).collect()
    assert (r1["n_c"], r1["n_t"], r1["mean_t"], r1["diff"]) == (
        2, 0, None, None
    )


def test_guards_and_fail_louds(spark):
    df = spark.createDataFrame([("g", "A", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="control == treatment"):
        ab_welch_test(df, "v", "variant", "A", "A")
    with pytest.raises(ValueError, match="alpha"):
        ab_welch_test(df, "v", "variant", "A", "B", alpha=0.0)
    bad = spark.createDataFrame([("g", "A", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN v"):
        ab_welch_test(bad, "v", "variant", "A", "B", ["grp"]).collect()
    nan = spark.createDataFrame([("g", "B", float("nan"))], SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN v"):
        ab_welch_test(nan, "v", "variant", "A", "B", ["grp"]).collect()
    # a NULL variant is simply not one of the two names: ignored
    nv = spark.createDataFrame(
        [("g", None, 5.0), ("g", "A", 1.0), ("g", "A", 2.0)], SCHEMA
    )
    (r,) = ab_welch_test(nv, "v", "variant", "A", "B", ["grp"]).collect()
    assert r["n_c"] == 2


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert ab_welch_test(df, "v", "variant", "A", "B", ["grp"]).collect() == []
    assert ab_welch_test(df, "v", "variant", "A", "B").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE ta(grp VARCHAR, variant VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO ta VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    src = "SELECT grp, variant AS v, v AS x FROM ta"
    # the twin source renames: (group..., v variant, x value)
    src = "SELECT grp, variant AS v, ta.v AS x FROM ta"
    for grouped, a in ((True, 0.05), (False, 0.2)):
        g = ("grp",) if grouped else ()
        res = con.execute(ab_welch_test_sql(src, "A", "B", g, a))
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (
                d["n_c"], d["n_t"], d["mean_c"], d["mean_t"], d["diff"],
                d["se"], d["t_stat"], d["df_welch"], d["significant"],
            )
        got = _collect(
            ab_welch_test(df, "v", "variant", "A", "B", list(g) or None, a),
            grouped,
        )
        assert got == want, (grouped, a)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = ab_welch_test(df, "v", "variant", "A", "B", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
