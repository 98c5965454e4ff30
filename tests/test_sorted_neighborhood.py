"""sorted_neighborhood (operators/linkage.py): merge/purge blocking —
rank-definition mirror, hand case, key-tie determinism, window-size
contract, guards, empty contract, twin equality, single-Sort
zero-Join zero-Python plan pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import sorted_neighborhood_sql
from audiopro_essentia_spark.operators.linkage import sorted_neighborhood


def _mirror(rows, w):
    out = set()
    blocks = sorted({r[0] for r in rows})
    for blk in blocks:
        brows = sorted(
            ((k, str(rid)) for b, rid, k in rows if b == blk),
        )
        for i, (ka, ida) in enumerate(brows):
            for d in range(1, w + 1):
                if i + d < len(brows):
                    kb, idb = brows[i + d]
                    out.add((blk, ida, idb, ka, kb, d))
    return out


def _rows():
    rows = []
    for i in range(40):
        rows.append(("a", f"a{i:02d}", (i * 7) % 13))
    for i in range(15):
        rows.append(("b", f"b{i:02d}", (i * 3) % 5))  # heavy key ties
    return rows


SCHEMA = "blk string, rid string, k long"


def _collect(df):
    return {
        (r["blk"], r["id_a"], r["id_b"], r["key_a"], r["key_b"], r["dist"])
        for r in df.collect()
    }


def test_mirror_and_rank_definition(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for w in (1, 2, 5):
        got = _collect(sorted_neighborhood(df, "rid", "k", ["blk"], w))
        assert got == _mirror(rows, w), w
    # w=1 emits exactly n-1 adjacent pairs per block
    got1 = _collect(sorted_neighborhood(df, "rid", "k", ["blk"], 1))
    assert len([p for p in got1 if p[0] == "a"]) == 39
    assert len([p for p in got1 if p[0] == "b"]) == 14


def test_hand_case_and_tie_determinism(spark):
    df = spark.createDataFrame(
        [("g", "a", 3), ("g", "b", 1), ("g", "c", 2), ("g", "d", 10)],
        SCHEMA,
    )
    got = _collect(sorted_neighborhood(df, "rid", "k", ["blk"], 2))
    assert got == {
        ("g", "b", "c", 1, 2, 1),
        ("g", "b", "a", 1, 3, 2),
        ("g", "c", "a", 2, 3, 1),
        ("g", "c", "d", 2, 10, 2),
        ("g", "a", "d", 3, 10, 1),
    }
    # equal keys order by id string: x before y
    ties = spark.createDataFrame(
        [("g", "y", 5), ("g", "x", 5), ("g", "z", 6)], SCHEMA
    )
    gt = _collect(sorted_neighborhood(ties, "rid", "k", ["blk"], 1))
    assert gt == {("g", "x", "y", 5, 5, 1), ("g", "y", "z", 5, 6, 1)}


def test_guards_and_empty(spark):
    df = spark.createDataFrame([("g", "r", 1)], SCHEMA)
    with pytest.raises(ValueError, match="block_cols is required"):
        sorted_neighborhood(df, "rid", "k", [])
    with pytest.raises(ValueError, match=r"window must be in \[1, 64\]"):
        sorted_neighborhood(df, "rid", "k", ["blk"], 0)
    with pytest.raises(ValueError, match=r"window must be in \[1, 64\]"):
        sorted_neighborhood(df, "rid", "k", ["blk"], 65)
    bad = spark.createDataFrame([("g", "r", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL k"):
        sorted_neighborhood(bad, "rid", "k", ["blk"]).collect()
    idbad = spark.createDataFrame([("g", None, 1)], SCHEMA)
    with pytest.raises(Exception, match="NULL rid"):
        sorted_neighborhood(idbad, "rid", "k", ["blk"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert sorted_neighborhood(empty, "rid", "k", ["blk"]).collect() == []
    # single-row block emits no pairs
    one = spark.createDataFrame([("g", "r", 1)], SCHEMA)
    assert sorted_neighborhood(one, "rid", "k", ["blk"]).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(blk VARCHAR, rid VARCHAR, k BIGINT)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for w in (1, 3):
        res = con.execute(
            sorted_neighborhood_sql(
                "SELECT blk, rid AS id, k FROM tw", ("blk",), w
            )
        )
        names = [d[0] for d in res.description]
        want = {
            tuple(dict(zip(names, row))[c] for c in (
                "blk", "id_a", "id_b", "key_a", "key_b", "dist"
            ))
            for row in res.fetchall()
        }
        got = _collect(sorted_neighborhood(df, "rid", "k", ["blk"], w))
        assert got == want, w


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted_neighborhood(df, "rid", "k", ["blk"], 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert plan.count("Sort [") == 1       # ONE shared window sort
    assert plan.count("Window [") == 1     # ONE window node for all leads
    assert "Join" not in plan              # pairing via lead, no self-join
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
