"""containment_pairs: lossless asymmetric containment join —
brute-force losslessness across thresholds, the asymmetry the
symmetric Jaccard join cannot express, append-superset hand case,
guards, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import random

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import containment_pairs_sql
from audiopro_essentia_spark.operators.dedup import containment_pairs

NG = 3


def _shingles(text):
    ws = text.split(" ")  # words() is a plain single-space split
    return {
        " ".join(ws[i : i + NG]) for i in range(max(0, len(ws) - NG + 1))
    }


def _brute(rows, t):
    tm = round(t * 1e6)
    sets = {i: _shingles(x) for i, x in rows}
    out = {}
    for a, A in sets.items():
        if not A:
            continue
        for b, B in sets.items():
            if a == b or not B:
                continue
            inter = len(A & B)
            if 1_000_000 * inter >= tm * len(A):
                out[(a, b)] = (
                    inter, len(A), len(B), round(inter / len(A), 6)
                )
    return out


def _corpus():
    rnd = random.Random(99)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        n = rnd.randrange(5, 30)
        rows.append((f"d{i}", " ".join(rnd.choice(vocab) for _ in range(n))))
    # planted containments: subsets, append-supersets, exact dup
    base = " ".join(f"b{i}" for i in range(12))
    rows.append(("orig", base))
    rows.append(("super", "lead in words " + base + " trailing footer text"))
    rows.append(("dup", base))
    rows.append(("tiny", " ".join(f"b{i}" for i in range(5))))  # prefix of base
    return rows


def _collect(df):
    return {
        (r["id_a"], r["id_b"]): (
            r["n_inter"], r["n_a"], r["n_b"], r["containment"]
        )
        for r in df.collect()
    }


def test_lossless_vs_brute_force(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for t in (0.5, 0.8, 0.9, 1.0):
        got = _collect(containment_pairs(df, "text", "doc_id", NG, t))
        assert got == _brute(rows, t), t


def test_asymmetry_and_hand_cases(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = _collect(containment_pairs(df, "text", "doc_id", NG, 1.0))
    # the whole point: A-in-B found, B-in-A not (and symmetric Jaccard
    # at J = |A|/|B| ~ 10/16 would need a uselessly low threshold)
    assert ("orig", "super") in got and got[("orig", "super")][3] == 1.0
    assert ("super", "orig") not in got
    assert ("tiny", "orig") in got and ("orig", "tiny") not in got
    # exact duplicates contain each other BOTH ways
    assert ("orig", "dup") in got and ("dup", "orig") in got
    # zero-shingle docs never pair
    d = spark.createDataFrame(
        [("a", "only two"), ("b", "only two")], "doc_id string, text string"
    )
    assert containment_pairs(d, "text", "doc_id", NG, 0.5).collect() == []


def test_guards(spark):
    d = spark.createDataFrame([("a", "x y z w")], "doc_id string, text string")
    with pytest.raises(ValueError, match="threshold must be in"):
        containment_pairs(d, threshold=0.0)
    with pytest.raises(ValueError, match="multiple of 1e-6"):
        containment_pairs(d, threshold=0.33333333333)
    with pytest.raises(ValueError, match="ngram"):
        containment_pairs(d, ngram=0)


def test_twin_equality(spark):
    rows = _corpus()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for t in (0.8, 1.0):
        want = {
            (r[0], r[1]): tuple(r[2:])
            for r in con.execute(containment_pairs_sql(NG, t)).fetchall()
        }
        got = _collect(containment_pairs(df, "text", "doc_id", NG, t))
        assert got == want, t


def test_plan_pins(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = containment_pairs(df, "text", "doc_id", NG, 0.9)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
