"""rouge_n (operators/evalmetrics.py): micro-averaged corpus ROUGE-N
— Counter-based definition mirror grouped+global, hand cases
(perfect match, dropped-content recall, disjoint zero), precision/
recall asymmetry pin vs bleu's orientation, zero-denominator
contracts, guards, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io
from collections import Counter

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import rouge_n_sql
from audiopro_essentia_spark.operators.evalmetrics import rouge_n


def _ngrams(toks, n):
    return Counter(
        tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)
    )


def _mirror(rows, n, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        o = tc = tr = 0
        for _, _, cand, ref in grows:
            wc = [x for x in cand.split(" ") if x]
            wr = [x for x in ref.split(" ") if x]
            cg, rg = _ngrams(wc, n), _ngrams(wr, n)
            o += sum(min(c, rg[g_]) for g_, c in cg.items())
            tc += max(len(wc) - n + 1, 0)
            tr += max(len(wr) - n + 1, 0)
        p = round(o / tc, 6) if tc > 0 else None
        r = round(o / tr, 6) if tr > 0 else None
        if tc > 0 and tr > 0:
            f1 = (
                round(2 * (o / tc) * (o / tr) / (o / tc + o / tr), 6)
                if o > 0
                else 0.0
            )
        else:
            f1 = None
        out[gv] = (len(grows), o, tc, tr, p, r, f1)
    return out


def _rows():
    return [
        ("a", "1", "the cat sat", "the cat sat on the mat"),
        ("a", "2", "b c d", "a b c d e"),
        ("b", "3", "x y z", "p q r s"),
        ("b", "4", "m m m", "m m"),
    ]


SCHEMA = "grp string, id string, cand string, ref string"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): tuple(r)[(1 if grouped else 0):]
        for r in df.collect()
    }


def test_mirror_and_hand_cases(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for n in (1, 2):
        got = _collect(rouge_n(df, "id", "cand", "ref", ["grp"], n), True)
        want = _mirror(rows, n, True)
        for gv in want:
            for x, y in zip(got[gv], want[gv]):
                if x is None or y is None:
                    assert x == y, (n, gv, got[gv], want[gv])
                else:
                    assert abs(x - y) < 2e-6, (n, gv, got[gv], want[gv])
    got_g = _collect(rouge_n(df, "id", "cand", "ref", None, 2), False)
    want_g = _mirror(rows, 2, False)
    for x, y in zip(got_g[None], want_g[None]):
        assert (x is None and y is None) or abs(x - y) < 2e-6


def test_recall_orientation_pin(spark):
    # the dropped-content case BLEU's precision cannot see: candidate
    # = half the reference -> precision 1.0, recall ~0.5
    df = spark.createDataFrame(
        [("g", "1", "a b c d", "a b c d e f g h")], SCHEMA
    )
    r = rouge_n(df, "id", "cand", "ref", ["grp"], 1).collect()[0]
    assert r["precision"] == 1.0
    assert r["recall"] == 0.5
    assert abs(r["f1"] - 2 * 0.5 / 1.5) < 2e-6
    # perfect match
    p = spark.createDataFrame([("g", "1", "x y z", "x y z")], SCHEMA)
    rp = rouge_n(p, "id", "cand", "ref", ["grp"], 2).collect()[0]
    assert (rp["precision"], rp["recall"], rp["f1"]) == (1.0, 1.0, 1.0)
    # disjoint: exact zeros, f1 0.0 (not NULL)
    d = spark.createDataFrame([("g", "1", "a b", "x y")], SCHEMA)
    rd = rouge_n(d, "id", "cand", "ref", ["grp"], 1).collect()[0]
    assert (rd["precision"], rd["recall"], rd["f1"]) == (0.0, 0.0, 0.0)
    # empty candidate: precision NULL, recall 0, f1 NULL
    e = spark.createDataFrame([("g", "1", "", "x y")], SCHEMA)
    re_ = rouge_n(e, "id", "cand", "ref", ["grp"], 1).collect()[0]
    assert re_["precision"] is None and re_["recall"] == 0.0
    assert re_["f1"] is None


def test_guards_and_empty(spark):
    df = spark.createDataFrame([("g", "1", "a", "a")], SCHEMA)
    with pytest.raises(ValueError, match=r"n must be in \[1, 4\]"):
        rouge_n(df, "id", "cand", "ref", n=0)
    bad = spark.createDataFrame([("g", "1", None, "a")], SCHEMA)
    with pytest.raises(Exception, match="NULL cand"):
        rouge_n(bad, "id", "cand", "ref", ["grp"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert rouge_n(empty, "id", "cand", "ref", ["grp"]).collect() == []
    assert rouge_n(empty, "id", "cand", "ref").collect() == []
    # duplicate ids fail LOUD (the bleu_eval clipping-merge hazard)
    dup = spark.createDataFrame(
        [("g", "1", "a b", "a b"), ("g", "1", "c d", "c d")], SCHEMA
    )
    with pytest.raises(Exception, match="duplicate id"):
        rouge_n(dup, "id", "cand", "ref", ["grp"]).collect()


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, id VARCHAR, cand VARCHAR, ref VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, n in ((True, 2), (True, 1), (False, 3)):
        g = ("grp",) if grouped else ()
        cols = "grp, id, cand, ref" if grouped else "id, cand, ref"
        want = sorted(
            con.execute(
                rouge_n_sql(f"SELECT {cols} FROM tw", g, n)
            ).fetchall()
        )
        got = sorted(
            tuple(r)
            for r in rouge_n(
                df, "id", "cand", "ref", list(g) or None, n
            ).collect()
        )
        assert got == want, (grouped, n)


def test_plan_pins(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = rouge_n(df, "id", "cand", "ref", ["grp"], 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    # r6 shape: the per-pair clip runs in exactly ONE mapInArrow batch
    # pass (no row-at-a-time Python, no gram explode/exchange, no join)
    assert plan.count("MapInArrow") == 1, plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "Generate" not in plan  # the token-scale gram explode is gone
