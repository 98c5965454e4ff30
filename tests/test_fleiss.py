"""fleiss_kappa (operators/evalmetrics.py): panel agreement — the
Fleiss 1971 textbook worked example (N=10, n=14, kappa ~= 0.2099) as
the outside definition, an exact Python mirror, perfect/chance
degenerate contracts, the unequal-panel fail-loud, single-category
and single-rater contracts, Landis-Koch bands, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import fleiss_kappa_sql
from audiopro_essentia_spark.operators.evalmetrics import fleiss_kappa

# the classic Fleiss (1971) psychiatric-diagnosis table: 10 subjects,
# 14 raters, 5 categories
FLEISS_TABLE = [
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def _table_rows(table, grp="g"):
    rows = []
    for i, cats in enumerate(table):
        for j, c in enumerate(cats):
            rows += [(grp, f"it{i}", f"c{j}")] * c
    return rows


def _mirror(rows):
    from collections import Counter, defaultdict

    cells = Counter((r[1], r[2]) for r in rows)
    items = sorted({r[1] for r in rows})
    cats = sorted({r[2] for r in rows})
    ns = {it: sum(cells[(it, c)] for c in cats) for it in items}
    n = ns[items[0]]
    assert all(v == n for v in ns.values())
    N = len(items)
    ss = sum(
        cells[(it, c)] * (cells[(it, c)] - 1)
        for it in items
        for c in cats
    )
    p_bar = ss / (N * n * (n - 1))
    pe_p = sum(
        round(
            (sum(cells[(it, c)] for it in items) / (N * n)) ** 2 * 1e12
        )
        for c in cats
    )
    p_e = pe_p / 1e12
    kappa = (p_bar - p_e) / (1.0 - p_e)
    return N, n, len(cats), round(p_bar, 6), round(p_e, 6), round(kappa, 6)


SCHEMA = "grp string, item string, label string"


def test_fleiss_1971_worked_example(spark):
    rows = _table_rows(FLEISS_TABLE)
    df = spark.createDataFrame(rows, SCHEMA)
    r = fleiss_kappa(df, "item", "label", ["grp"]).collect()[0]
    N, n, k, pb, pe, kap = _mirror(rows)
    assert (r["n_items"], r["n_raters"], r["n_categories"]) == (10, 14, 5)
    assert (r["p_bar"], r["p_e"], r["kappa"]) == (pb, pe, kap)
    # the published value of the textbook example
    assert abs(r["kappa"] - 0.2099) < 5e-4
    assert r["agreement"] == "fair"


def test_degenerates_and_bands(spark):
    # perfect agreement over >1 category: kappa exactly 1
    rows = [("g", f"i{i}", "a" if i % 2 else "b") for i in range(10)] * 3
    df = spark.createDataFrame(rows, SCHEMA)
    r = fleiss_kappa(df, "item", "label", ["grp"]).collect()[0]
    assert r["kappa"] == 1.0 and r["agreement"] == "almost_perfect"
    # single category: P_e == 1 -> NULL kappa, stats visible
    one = spark.createDataFrame(
        [("g", f"i{i}", "only") for i in range(4)] * 2, SCHEMA
    )
    ro = fleiss_kappa(one, "item", "label", ["grp"]).collect()[0]
    assert ro["kappa"] is None and ro["p_e"] == 1.0
    # single rater: NULL kappa and p_bar
    single = spark.createDataFrame(
        [("g", "i1", "a"), ("g", "i2", "b")], SCHEMA
    )
    rs = fleiss_kappa(single, "item", "label", ["grp"]).collect()[0]
    assert rs["n_raters"] == 1
    assert rs["kappa"] is None and rs["p_bar"] is None


def test_unequal_panels_fail_loud(spark):
    rows = [("g", "i1", "a"), ("g", "i1", "a"), ("g", "i2", "b")]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="unequal panel sizes"):
        fleiss_kappa(df, "item", "label", ["grp"]).collect()
    bad = spark.createDataFrame([("g", None, "a")], SCHEMA)
    with pytest.raises(Exception, match="NULL item"):
        fleiss_kappa(bad, "item", "label", ["grp"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert fleiss_kappa(empty, "item", "label", ["grp"]).collect() == []
    assert fleiss_kappa(empty, "item", "label").collect() == []


def test_twin_equality(spark):
    rows = _table_rows(FLEISS_TABLE) + _table_rows(
        [[3, 0], [2, 1], [0, 3]], grp="h"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, item VARCHAR, label VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        cols = "grp, item, label" if grouped else "item, label"
        src = f"SELECT {cols} FROM tw" + (
            "" if grouped else " WHERE grp = 'g'"
        )
        want = sorted(
            con.execute(fleiss_kappa_sql(src, g)).fetchall()
        )
        d2 = df if grouped else df.where("grp = 'g'")
        got = sorted(
            tuple(r)
            for r in fleiss_kappa(
                d2, "item", "label", list(g) or None
            ).collect()
        )
        assert got == want, grouped


def test_plan_pins(spark):
    df = spark.createDataFrame(_table_rows(FLEISS_TABLE), SCHEMA)
    out = fleiss_kappa(df, "item", "label", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
