"""Graph ranking (graphrank.pagerank_micro / textrank_keywords):
exact integer-micro Python mirror, hub-beats-frequency property,
self-loop/short-doc/empty contracts, dangling fail-loud, guards,
zero-Python + TakeOrderedAndProject plan pins, and direct DuckDB twin
equality."""

import contextlib
import io
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import textrank_keywords_sql
from audiopro_essentia_spark.operators.graphrank import (
    pagerank_micro,
    textrank_keywords,
    textrank_word_graph,
)


def _mirror(texts, n_iter=10, damping_pct=85, top_k=100, min_count=1):
    edges = Counter()
    for t in texts:
        ws = [x for x in (t or "").split(" ") if x]
        for a, b in zip(ws, ws[1:]):
            if a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    edges = {k: v for k, v in edges.items() if v >= min_count}
    tw = Counter()
    for (a, _), w in edges.items():
        tw[a] += w
    s = {n: 1_000_000 for n in tw}
    base = (100 - damping_pct) * 10_000
    for _ in range(n_iter):
        acc = dict.fromkeys(tw, 0)
        for (a, b), w in edges.items():
            acc[b] += (w * s[a]) // tw[a]
        s = {n: base + (damping_pct * acc[n]) // 100 for n in acc}
    return sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "a a a a",  # only self-loops: contributes NO edges
    "single",  # one word: no bigram
    "",  # empty
    None,  # NULL
    "quick brown quick brown quick brown",  # heavy repeated pair
]


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r["word"], r["score_micro"])
        for r in textrank_keywords(df, **kw).collect()
    ]


def test_mirror_exact(spark):
    for kw in (
        dict(n_iter=10, top_k=100, min_count=1),
        dict(n_iter=3, top_k=5, min_count=2),
        dict(n_iter=1, top_k=100, damping_pct=50, min_count=1),
    ):
        assert _run(spark, CORPUS, **kw) == _mirror(CORPUS, **kw), kw


def test_hub_beats_frequency(spark):
    # 'hub' adjacent to 8 distinct words once each vs 'freq' repeated
    # in one isolated pair 8 times: hub's neighbors give it importance
    texts = [" ".join(f"hub n{i}" for i in range(8))] + [
        "freq only" for _ in range(8)
    ]
    got = dict(_run(spark, texts, n_iter=10))
    assert got["hub"] > got["freq"]


def test_degenerate_contracts(spark):
    # nothing but self-loops / short docs -> empty result, no crash
    assert _run(spark, ["a a a", "b", "", None]) == []
    # self-loop word 'a' participates only via NON-self adjacencies
    got = dict(_run(spark, ["a a b a a"]))
    assert set(got) == {"a", "b"}


def test_dangling_fails_loud(spark):
    e = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w long")
    out = pagerank_micro(e, n_iter=1)
    with pytest.raises(Exception, match="dangling destination node b"):
        out.collect()


def test_graph_symmetry(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    g = {
        (r["src"], r["dst"]): r["w"]
        for r in textrank_word_graph(df, min_count=2).collect()
    }
    assert g and all(g[(a, b)] == g[(b, a)] for (a, b) in g)
    assert all(a != b for (a, b) in g)


def test_guards(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="n_iter"):
        textrank_keywords(df, n_iter=0)
    with pytest.raises(ValueError, match="damping_pct"):
        textrank_keywords(df, damping_pct=100)
    with pytest.raises(ValueError, match="top_k"):
        textrank_keywords(df, top_k=0)
    with pytest.raises(ValueError, match="min_count"):
        textrank_keywords(df, min_count=0)


def test_plan_pins(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    out = textrank_keywords(df, n_iter=3, top_k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "TakeOrderedAndProject" in plan  # top-k never a full sort
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_twin_equality(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in CORPUS])
    for kw in (
        dict(n_iter=4, top_k=100, min_count=1),
        dict(n_iter=2, top_k=7, damping_pct=70, min_count=2),
    ):
        want = [
            tuple(r)
            for r in con.execute(
                textrank_keywords_sql(table="docs", **kw)
            ).fetchall()
        ]
        assert _run(spark, CORPUS, **kw) == want, kw
