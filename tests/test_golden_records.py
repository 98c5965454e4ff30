"""golden_records (operators/linkage.py): survivorship merge —
election mirror, majority + tie-break hand cases, all-NULL-field
visibility, representative rank/tie contracts, singleton clusters,
guards, empty contract, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import golden_records_sql
from audiopro_essentia_spark.operators.linkage import golden_records


def _mirror(rows, fields, use_rank):
    from collections import Counter, defaultdict

    out = {}
    clusters = defaultdict(list)
    for r in rows:
        clusters[str(r[0])].append(r)
    for cl, mem in clusters.items():
        rec = [cl, len(mem)]
        ranked = sorted(
            mem,
            key=lambda r: (
                -(r[2] if (use_rank and r[2] is not None) else float("-inf")),
                str(r[1]),
            ),
        )
        rec.append(str(ranked[0][1]))
        for fi in range(len(fields)):
            vals = [
                str(r[3 + fi]) for r in mem if r[3 + fi] is not None
            ]
            if not vals:
                rec += [None, 0]
            else:
                cnt = Counter(vals)
                win = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                rec += [win[0], win[1]]
        out[cl] = tuple(rec)
    return out


SCHEMA = "cl string, rid string, rk double, lang string, src string"


def _rows():
    return [
        # cluster A: lang majority en (2 vs 1); src tie fr/de -> 'de'
        ("A", "a1", 10.0, "en", "fr"),
        ("A", "a2", 30.0, "en", "de"),
        ("A", "a3", 20.0, "it", None),
        # cluster B: all-NULL lang; single src
        ("B", "b1", None, None, "xx"),
        ("B", "b2", 5.0, None, "xx"),
        # singleton
        ("C", "c9", 1.0, "pt", "yy"),
    ]


def _collect(df):
    return {r["cluster"]: tuple(r) for r in df.collect()}


def test_mirror_and_hand_cases(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(
        golden_records(df, "cl", "rid", ["lang", "src"], rank_col="rk")
    )
    assert got == _mirror(rows, ["lang", "src"], True)
    a = got["A"]
    # representative: highest rank (a2); majority lang en with support
    # 2; src tie at count 1 breaks to the SMALLEST value 'de'
    assert a == ("A", 3, "a2", "en", 2, "de", 1)
    # all-NULL field stays NULL with support 0 — visible, not invented
    assert got["B"] == ("B", 2, "b2", None, 0, "xx", 2)
    assert got["C"] == ("C", 1, "c9", "pt", 1, "yy", 1)


def test_rank_semantics(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    # no rank: canon_id is the smallest id string
    got = _collect(golden_records(df, "cl", "rid", ["lang"]))
    assert got["A"][2] == "a1" and got["B"][2] == "b1"
    # NULL ranks sort last: b1 (NULL) loses to b2 (5.0)
    gr = _collect(
        golden_records(df, "cl", "rid", ["lang"], rank_col="rk")
    )
    assert gr["B"][2] == "b2"
    # rank tie breaks by id asc
    t = spark.createDataFrame(
        [("T", "t2", 7.0, "x", "s"), ("T", "t1", 7.0, "y", "s")], SCHEMA
    )
    gt = _collect(golden_records(t, "cl", "rid", ["lang"], rank_col="rk"))
    assert gt["T"][2] == "t1"


def test_guards_and_empty(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    with pytest.raises(ValueError, match="field_cols is required"):
        golden_records(df, "cl", "rid", [])
    bad = spark.createDataFrame([(None, "r", 1.0, "x", "y")], SCHEMA)
    with pytest.raises(Exception, match="NULL cl"):
        golden_records(bad, "cl", "rid", ["lang"]).collect()
    idbad = spark.createDataFrame([("A", None, 1.0, "x", "y")], SCHEMA)
    with pytest.raises(Exception, match="NULL rid"):
        golden_records(idbad, "cl", "rid", ["lang"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert golden_records(empty, "cl", "rid", ["lang"]).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(cl VARCHAR, rid VARCHAR, rk DOUBLE, "
        "lang VARCHAR, src VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    want_rows = con.execute(
        golden_records_sql(
            "SELECT cl AS cluster, rid AS id, rk, lang, src FROM tw",
            ("lang", "src"),
        )
    ).fetchall()
    want = {r[0]: tuple(r) for r in want_rows}
    got = _collect(
        golden_records(df, "cl", "rid", ["lang", "src"], rank_col="rk")
    )
    assert got == want
    # no-rank variant: twin passes a constant 0.0 rank
    want2 = {
        r[0]: tuple(r)
        for r in con.execute(
            golden_records_sql(
                "SELECT cl AS cluster, rid AS id, CAST(0.0 AS DOUBLE) "
                "AS rk, lang FROM tw",
                ("lang",),
            )
        ).fetchall()
    }
    got2 = _collect(golden_records(df, "cl", "rid", ["lang"]))
    assert got2 == want2


def test_plan_pins(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = golden_records(df, "cl", "rid", ["lang", "src"], rank_col="rk")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
