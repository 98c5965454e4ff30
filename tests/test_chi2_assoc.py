"""chi2_assoc (operators/evalmetrics.py): Pearson chi-square
independence + Cramér's V — micro-unit mirror grouped+global, the
2x2 closed-form hand case n(ad-bc)^2/(r1 r2 c1 c2) as the outside
definition, full-table (zero-cells-included) definition cross-check
of the observed-cells identity, an exact-zero independence design,
the dof=0 constant-column contract, fail-louds, empty contracts,
twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import chi2_assoc_sql
from audiopro_essentia_spark.operators.evalmetrics import chi2_assoc


def _half_away(x):
    return (
        int(math.floor(x + 0.5))
        if x >= 0
        else -int(math.floor(-x + 0.5))
    )


def _mirror(rows, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        cells = {}
        for _, x, y in grows:
            cells[(x, y)] = cells.get((x, y), 0) + 1
        nx = {}
        ny = {}
        for (x, y), c in cells.items():
            nx[x] = nx.get(x, 0) + c
            ny[y] = ny.get(y, 0) + c
        n = sum(cells.values())
        u = 0
        for (x, y), c in cells.items():
            e = (float(nx[x]) * float(ny[y])) / float(n)
            t = (float(c) - e) * (float(c) - e) / e - e
            u += _half_away(t * 1e6)
        chi2_u = u + n * 1_000_000
        r, c_ = len(nx), len(ny)
        k = min(r - 1, c_ - 1)
        v = (
            round(
                _half_away(
                    math.sqrt(max(chi2_u, 0) / 1e6 / (float(n) * k))
                    * 1e6
                )
                / 1e6,
                6,
            )
            if k >= 1
            else None
        )
        out[gv] = (
            n, r, c_, (r - 1) * (c_ - 1), round(chi2_u / 1e6, 6), v
        )
    return out


def _rows():
    rows = []
    for i in range(200):
        g = "a" if i % 2 == 0 else "b"
        x = f"x{i % 3}"
        # association: y depends on x in group a, not in group b
        y = f"y{(i % 3) % 2}" if g == "a" else f"y{(i * 7 + 3) % 2}"
        rows.append((g, x, y))
    return rows


SCHEMA = "grp string, x string, y string"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n"], r["x_levels"], r["y_levels"], r["dof"],
            r["chi2"], r["cramers_v"],
        )
        for r in df.collect()
    }


def test_mirror_and_full_table_definition(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(chi2_assoc(df, "x", "y", ["grp"]), True)
    assert got == _mirror(rows, True)
    got_g = _collect(chi2_assoc(df, "x", "y"), False)
    assert got_g == _mirror(rows, False)
    # the observed-cells identity equals the FULL-table definition
    # sum_all (o-e)^2/e including never-observed cells
    for gv in ("a", "b"):
        grows = [r for r in rows if r[0] == gv]
        xs = sorted({x for _, x, _ in grows})
        ys = sorted({y for _, _, y in grows})
        cells = {}
        for _, x, y in grows:
            cells[(x, y)] = cells.get((x, y), 0) + 1
        n = len(grows)
        chi2_def = 0.0
        for x in xs:
            for y in ys:
                nx = sum(c for (xx, _), c in cells.items() if xx == x)
                ny = sum(c for (_, yy), c in cells.items() if yy == y)
                e = nx * ny / n
                o = cells.get((x, y), 0)
                chi2_def += (o - e) ** 2 / e
        assert abs(got[gv][4] - chi2_def) < 1e-4, gv


def test_2x2_closed_form_hand_case(spark):
    # a=10 b=20 / c=30 d=40: chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    #   = 100*(10*40-20*30)^2/(30*70*40*60) = 4000000/5040000
    rows = (
        [("g", "r1", "c1")] * 10
        + [("g", "r1", "c2")] * 20
        + [("g", "r2", "c1")] * 30
        + [("g", "r2", "c2")] * 40
    )
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(chi2_assoc(df, "x", "y", ["grp"]), True)["g"]
    n, xl, yl, dof, chi2, v = got
    assert (n, xl, yl, dof) == (100, 2, 2, 1)
    want = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert abs(chi2 - want) < 5e-6
    # for 2x2, V is the phi coefficient sqrt(chi2/n)
    assert abs(v - math.sqrt(want / 100)) < 5e-6


def test_exact_zero_independence_and_dof0(spark):
    # product design with INTEGRAL expectations: every e is exact, so
    # chi2 comes out exactly 0.0 (not merely small)
    rows = []
    for x, base in (("a", 10), ("b", 20)):
        rows += [("g", x, "y0")] * base + [("g", x, "y1")] * base
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(chi2_assoc(df, "x", "y", ["grp"]), True)["g"]
    assert got == (60, 2, 2, 1, 0.0, 0.0)
    # constant column: dof = 0, association undefined -> NULL V
    const = spark.createDataFrame(
        [("g", f"x{i % 3}", "only") for i in range(30)], SCHEMA
    )
    gc = _collect(chi2_assoc(const, "x", "y", ["grp"]), True)["g"]
    assert gc == (30, 3, 1, 0, 0.0, None)


def test_fail_louds_and_empty(spark):
    bad = spark.createDataFrame([("g", None, "y")], SCHEMA)
    with pytest.raises(Exception, match="NULL x"):
        chi2_assoc(bad, "x", "y", ["grp"]).collect()
    bad2 = spark.createDataFrame([("g", "x", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL y"):
        chi2_assoc(bad2, "x", "y", ["grp"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert chi2_assoc(empty, "x", "y", ["grp"]).collect() == []
    assert chi2_assoc(empty, "x", "y").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(grp VARCHAR, x VARCHAR, y VARCHAR)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        cols = "grp, x, y" if grouped else "x, y"
        res = con.execute(
            chi2_assoc_sql(f"SELECT {cols} FROM tw", g)
        )
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (
                d["n"], d["x_levels"], d["y_levels"], d["dof"],
                d["chi2"], d["cramers_v"],
            )
        got = _collect(
            chi2_assoc(df, "x", "y", list(g) or None), grouped
        )
        assert got == want, grouped


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = chi2_assoc(df, "x", "y", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
