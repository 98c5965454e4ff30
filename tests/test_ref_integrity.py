"""ref_integrity (operators/checks.py): cross-table FK/PK audit —
hand-built star with every branch live (orphans, NULL keys, dup
parents, unreferenced parents), exact-count mirror, clean-star
all-zeros contract, NULL-key-is-not-an-orphan pin, multi-column
keys, zero-denominator contracts, guards, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import ref_integrity_sql
from audiopro_essentia_spark.operators.checks import ref_integrity


def _collect(df):
    return tuple(df.collect()[0])


def test_hand_case_every_branch(spark):
    # parent keys: 1 (once), 2 (TWICE — dup), 3 (unreferenced), NULL
    parent = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (None,)], "k long"
    )
    # child: 1 x2, 2 x1, 99 x3 (orphans), NULL x2
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,), (None,)],
        "k long",
    )
    got = _collect(ref_integrity(child, parent, ["k"], ["k"]))
    # (n_child, n_child_null_key, n_orphan, orphan_rate, n_parent,
    #  n_parent_null_key, n_parent_keys, n_parent_dup_keys,
    #  n_parent_extra_rows, n_parent_unreferenced, ref_coverage)
    assert got == (8, 2, 3, 0.5, 5, 1, 3, 1, 1, 1, round(2 / 3, 6))


def test_clean_star_and_null_semantics(spark):
    parent = spark.createDataFrame([(i,) for i in range(10)], "k long")
    child = spark.createDataFrame(
        [(i % 10,) for i in range(50)], "k long"
    )
    got = _collect(ref_integrity(child, parent, ["k"], ["k"]))
    assert got == (50, 0, 0, 0.0, 10, 0, 10, 0, 0, 0, 1.0)
    # a NULL child key is NOT an orphan (SQL FK semantics)
    childn = spark.createDataFrame([(None,), (0,)], "k long")
    gn = _collect(ref_integrity(childn, parent, ["k"], ["k"]))
    assert gn[1] == 1 and gn[2] == 0 and gn[3] == 0.0


def test_multicol_keys_and_zero_denominators(spark):
    parent = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "s string, k long"
    )
    child = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 1)], "s string, k long"
    )
    got = _collect(
        ref_integrity(child, parent, ["s", "k"], ["s", "k"])
    )
    assert got[0] == 4 and got[2] == 1          # ("a",3) is the orphan
    assert got[6] == 3 and got[9] == 1          # ("a",2) unreferenced
    # all-NULL child keys: orphan_rate denominator 0 -> NULL
    cn = spark.createDataFrame([(None,)], "k long")
    pn = spark.createDataFrame([(1,)], "k long")
    g0 = _collect(ref_integrity(cn, pn, ["k"], ["k"]))
    assert g0[3] is None
    # empty parent: coverage NULL, every non-NULL child key an orphan
    pe = spark.createDataFrame([], "k long")
    ce = spark.createDataFrame([(1,), (2,)], "k long")
    ge = _collect(ref_integrity(ce, pe, ["k"], ["k"]))
    assert ge[2] == 2 and ge[10] is None
    # both empty: a single all-zero row (audits always report)
    gb = _collect(ref_integrity(pe, pe, ["k"], ["k"]))
    assert gb == (0, 0, 0, None, 0, 0, 0, 0, 0, 0, None)


def test_guards(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="same length"):
        ref_integrity(df, df, ["k"], [])
    with pytest.raises(ValueError, match="same length"):
        ref_integrity(df, df, [], [])


def test_twin_equality(spark):
    prows = [(1,), (2,), (2,), (3,), (None,)]
    crows = [(1,), (1,), (2,), (99,), (99,), (99,), (None,), (None,)]
    con = duckdb.connect()
    con.execute("CREATE TABLE pp(k BIGINT)")
    con.execute("CREATE TABLE cc(k BIGINT)")
    con.executemany("INSERT INTO pp VALUES (?)", prows)
    con.executemany("INSERT INTO cc VALUES (?)", crows)
    parent = spark.createDataFrame(prows, "k long")
    child = spark.createDataFrame(crows, "k long")
    want = con.execute(
        ref_integrity_sql(
            "SELECT k AS k0 FROM cc", "SELECT k AS k0 FROM pp", 1
        )
    ).fetchall()[0]
    got = _collect(ref_integrity(child, parent, ["k"], ["k"]))
    assert got == want


def test_plan_pins(spark):
    parent = spark.createDataFrame([(i,) for i in range(10)], "k long")
    child = spark.createDataFrame([(i % 10,) for i in range(50)], "k long")
    out = ref_integrity(child, parent, ["k"], ["k"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    # the histogram join is the ONLY non-broadcast join
    assert plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    ) <= 1
