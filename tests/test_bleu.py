"""bleu_eval (operators/evalmetrics.py): corpus BLEU — definition
mirror (independent Counter-based clipping + math-module formula)
grouped+global, Papineni's classic clipping hand case (p1 = 2/7),
perfect-match and zero-overlap exact values, brevity-penalty pin,
empty-candidate contract, guards, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import bleu_eval_sql
from audiopro_essentia_spark.operators.evalmetrics import bleu_eval


def _ngrams(toks, n):
    return Counter(
        tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)
    )


def _mirror(rows, max_n, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        o = [0] * (max_n + 1)
        t = [0] * (max_n + 1)
        c_len = r_len = 0
        for _, _, cand, ref in grows:
            wc = [w for w in cand.split(" ") if w != ""]
            wr = [w for w in ref.split(" ") if w != ""]
            c_len += len(wc)
            r_len += len(wr)
            for n in range(1, max_n + 1):
                cg, rg = _ngrams(wc, n), _ngrams(wr, n)
                o[n] += sum(min(c, rg[g]) for g, c in cg.items())
                t[n] += max(len(wc) - n + 1, 0)
        ps = [
            round(o[n] / t[n], 6) if c_len > 0 and t[n] > 0 else None
            for n in range(1, max_n + 1)
        ]
        if c_len == 0:
            bp = bleu = None
        else:
            bp_raw = (
                1.0 if c_len >= r_len else math.exp(1.0 - r_len / c_len)
            )
            bp = round(bp_raw, 6)
            if all(o[n] > 0 and t[n] > 0 for n in range(1, max_n + 1)):
                s = sum(
                    math.log(o[n] / t[n]) * (1.0 / max_n)
                    for n in range(1, max_n + 1)
                )
                bleu = round(bp_raw * math.exp(s), 6)
            else:
                bleu = 0.0
        out[gv] = (len(grows), c_len, r_len, *ps, bp, bleu)
    return out


def _rows():
    return [
        ("a", "1", "the cat sat on the mat", "the cat sat on the mat"),
        ("a", "2", "a quick brown fox jumps high", "the quick brown fox jumps over it"),
        ("b", "3", "alpha beta gamma delta", "alpha beta gamma delta epsilon zeta"),
        ("b", "4", "one two three four five six", "one two three four five six"),
    ]


SCHEMA = "grp string, id string, cand string, ref string"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): tuple(r)[(1 if grouped else 0):]
        for r in df.collect()
    }


def test_mirror_and_definition(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for mn in (2, 4):
        got = _collect(bleu_eval(df, "id", "cand", "ref", ["grp"], mn), True)
        want = _mirror(rows, mn, True)
        for gv in want:
            for a, b in zip(got[gv], want[gv]):
                if a is None or b is None:
                    assert a == b, (mn, gv)
                else:
                    assert abs(a - b) < 2e-6, (mn, gv, got[gv], want[gv])
    got_g = _collect(bleu_eval(df, "id", "cand", "ref", None, 4), False)
    want_g = _mirror(rows, 4, False)
    for a, b in zip(got_g[None], want_g[None]):
        assert (a is None and b is None) or abs(a - b) < 2e-6


def test_papineni_clipping_hand_case(spark):
    # ACL 2002's example: candidate "the the the the the the the" vs
    # reference "the cat is on the mat" -> clipped p1 = 2/7
    df = spark.createDataFrame(
        [("g", "1", "the the the the the the the", "the cat is on the mat")],
        SCHEMA,
    )
    r = bleu_eval(df, "id", "cand", "ref", ["grp"], 1).collect()[0]
    assert r["p1"] == round(2 / 7, 6)
    # any higher n has zero overlap -> bleu exactly 0
    r4 = bleu_eval(df, "id", "cand", "ref", ["grp"], 4).collect()[0]
    assert r4["bleu"] == 0.0 and r4["p2"] == 0.0


def test_perfect_match_bp_and_empty_cand(spark):
    p = spark.createDataFrame(
        [("g", "1", "x y z w v", "x y z w v")], SCHEMA
    )
    r = bleu_eval(p, "id", "cand", "ref", ["grp"]).collect()[0]
    assert (r["bp"], r["bleu"]) == (1.0, 1.0)
    # shorter candidate: BP = exp(1 - R/C) exactly (micro-rounded)
    s = spark.createDataFrame(
        [("g", "1", "x y z w", "x y z w v")], SCHEMA
    )
    rs = bleu_eval(s, "id", "cand", "ref", ["grp"], 2).collect()[0]
    assert rs["bp"] == round(math.exp(1.0 - 5.0 / 4.0), 6)
    assert rs["p1"] == 1.0 and rs["p2"] == 1.0
    assert rs["bleu"] == round(math.exp(1.0 - 5.0 / 4.0), 6)
    # all-empty candidates: counts visible, bp/bleu NULL
    e = spark.createDataFrame([("g", "1", "", "some ref")], SCHEMA)
    re_ = bleu_eval(e, "id", "cand", "ref", ["grp"]).collect()[0]
    assert re_["cand_len"] == 0 and re_["ref_len"] == 2
    assert re_["bp"] is None and re_["bleu"] is None


def test_guards_and_empty(spark):
    df = spark.createDataFrame([("g", "1", "a", "a")], SCHEMA)
    with pytest.raises(ValueError, match=r"max_n must be in \[1, 4\]"):
        bleu_eval(df, "id", "cand", "ref", max_n=5)
    bad = spark.createDataFrame([("g", "1", None, "a")], SCHEMA)
    with pytest.raises(Exception, match="NULL cand"):
        bleu_eval(bad, "id", "cand", "ref", ["grp"]).collect()
    badr = spark.createDataFrame([("g", "1", "a", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL ref"):
        bleu_eval(badr, "id", "cand", "ref", ["grp"]).collect()
    badi = spark.createDataFrame([("g", None, "a", "a")], SCHEMA)
    with pytest.raises(Exception, match="NULL id"):
        bleu_eval(badi, "id", "cand", "ref", ["grp"]).collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert bleu_eval(empty, "id", "cand", "ref", ["grp"]).collect() == []
    assert bleu_eval(empty, "id", "cand", "ref").collect() == []
    # duplicate ids within a group fail LOUD: their gram counts would
    # merge before clipping (min of sums != sum of per-pair mins —
    # ADVICE r4); same id in DIFFERENT groups stays legal
    dup = spark.createDataFrame(
        [("g", "1", "a b", "a b"), ("g", "1", "c d", "c d")], SCHEMA
    )
    with pytest.raises(Exception, match="duplicate id"):
        bleu_eval(dup, "id", "cand", "ref", ["grp"]).collect()
    ok = spark.createDataFrame(
        [("g1", "1", "a b", "a b"), ("g2", "1", "c d", "c d")], SCHEMA
    )
    assert len(bleu_eval(ok, "id", "cand", "ref", ["grp"]).collect()) == 2


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, id VARCHAR, cand VARCHAR, ref VARCHAR)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?,?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, mn in ((True, 4), (True, 2), (False, 3)):
        g = ("grp",) if grouped else ()
        cols = "grp, id, cand, ref" if grouped else "id, cand, ref"
        want = sorted(
            con.execute(
                bleu_eval_sql(f"SELECT {cols} FROM tw", g, mn)
            ).fetchall()
        )
        got = sorted(
            tuple(r)
            for r in bleu_eval(
                df, "id", "cand", "ref", list(g) or None, mn
            ).collect()
        )
        assert got == want, (grouped, mn)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = bleu_eval(df, "id", "cand", "ref", ["grp"])
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
