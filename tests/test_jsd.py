"""source_js_divergence (operators/aggregates.py): bounded symmetric
lexical drift — definition mirror, the <= ln 2 bound and [0,1]
normalization, symmetry property (swapping which side is the source
leaves the two-source JSD equal), identical-distribution near-zero,
spine parity with kl_drift's spec, twin equality, plan shape."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from audiopro_essentia_spark.duck_twins import js_sql
from audiopro_essentia_spark.operators.aggregates import (
    source_js_divergence,
    source_kl_divergence,
)

SCHEMA = "source string, text string"


def _mirror(rows, top_n, eps=1e-9):
    toks = []
    for src, text in rows:
        for w in text.split(" "):
            if w:
                toks.append((src, w))
    head = sorted(
        Counter(w for _, w in toks).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:top_n]
    words = [w for w, _ in head]
    c_all = dict(head)
    out = {}
    for src in sorted({s for s, _ in toks}):
        cs = Counter(w for s, w in toks if s == src and w in words)
        n_g = sum(cs.values())
        n_rest = sum(c_all.values()) - n_g
        u = 0
        for w in words:
            c = cs.get(w, 0)
            p = eps if n_g == 0 else max(c / n_g, eps)
            q = (
                eps
                if n_rest == 0
                else max((c_all[w] - c) / n_rest, eps)
            )
            m = (p + q) / 2.0
            t = (p * math.log(p / m) + q * math.log(q / m)) * 0.5
            u += round(t * 1e6)
        out[src] = (
            u, round(round(u / math.log(2.0)) / 1e6, 6), len(words), n_g
        )
    return out


def _rows():
    rows = []
    for i in range(30):
        rows.append(("a", "the quick brown fox " + "common word " * 3))
        rows.append(("b", "the slow red dog " + "common word " * 3))
        rows.append(("c", "zebra xylophone quartz " * 2))
    return rows


def _collect(df):
    return {
        r["source"]: (
            r["jsd_micronats"], r["jsd_norm"], r["n_terms"],
            r["n_head_toks"],
        )
        for r in df.collect()
    }


def test_mirror_bound_and_parity(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(source_js_divergence(df, top_n=20))
    want = _mirror(rows, 20)
    assert got == want
    # bounded: jsd <= ln 2 (micronats <= 693148), norm in [0, 1]
    # per-term micro rounding can overshoot the ln 2 bound by a few
    # micro-nats on a saturated source — reported as-is (the kl_drift
    # convention), so the checks carry that slack
    for u, jn, _, _ in got.values():
        assert 0 <= u <= 693_148 + 10
        assert -1e-5 <= jn <= 1.0 + 1e-5
    # the disjoint-vocabulary source saturates near the bound; the
    # overlapping pair sits well below it
    assert got["c"][1] > 0.9
    assert got["a"][1] < got["c"][1]
    # spine parity with kl_drift's spec: same n_terms / n_head_toks
    kl = {
        r["source"]: (r["n_terms"], r["n_head_toks"])
        for r in source_kl_divergence(df, top_n=20).collect()
    }
    assert {s: (t, n) for s, (_, _, t, n) in got.items()} == kl


def test_symmetry_and_identity(spark):
    # two sources with IDENTICAL texts: rest-of-corpus == self for
    # both, so jsd ~ 0 and the two rows are equal by symmetry
    rows = [("x", "alpha beta gamma delta")] * 10 + [
        ("y", "alpha beta gamma delta")
    ] * 10
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(source_js_divergence(df, top_n=10))
    assert got["x"] == got["y"]
    assert abs(got["x"][0]) <= 5  # micro-rounding slack around zero
    # empty frame
    empty = spark.createDataFrame([], SCHEMA)
    assert source_js_divergence(empty).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(js_sql(top_n=20)).fetchall()
    }
    got = _collect(source_js_divergence(df, top_n=20))
    assert got == want
