"""DSIR importance resampling, BM25 retrieval, tokenizer fertility.

Hand-built fixtures with numpy-mirrored expectations (the test IS the
oracle; the driver's DuckDB twins re-verify at sf0.01:
dsir_select / bm25 / fertility).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.operators.aggregates import (  # noqa: E402
    tokenizer_fertility,
)
from audiopro_essentia_spark.operators.selection import (  # noqa: E402
    BM25_B,
    BM25_K1,
    bm25_topk,
    dsir_importance,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _dsir_expected(rows, target_ids, n_buckets, alpha):
    """Python mirror of dsir_importance, exact to the integer micro-nat."""
    feats = {}
    for doc_id, text in rows:
        ws = [w for w in text.split(" ") if w]
        fs = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        feats[doc_id] = [_h32(f) % n_buckets for f in fs]
    np_c, nq_c = {}, {}
    tp = tq = 0
    for doc_id, bs in feats.items():
        side = np_c if doc_id in target_ids else nq_c
        for b in bs:
            side[b] = side.get(b, 0) + 1
        if doc_id in target_ids:
            tp += len(bs)
        else:
            tq += len(bs)
    ab = alpha * n_buckets
    lr = {}
    buckets = set(np_c) | set(nq_c)
    for b in buckets:
        lr[b] = round(
            (
                math.log((np_c.get(b, 0) + alpha) / (tp + ab))
                - math.log((nq_c.get(b, 0) + alpha) / (tq + ab))
            )
            * 1e6
        )
    return {
        doc_id: (len(bs), sum(lr[b] for b in bs))
        for doc_id, bs in feats.items()
    }


def test_dsir_weights_exact_and_sign(spark):
    # target docs talk about cats, raw docs about dogs; a cat-like raw
    # doc must score positive, a dog-like one negative
    rows = [
        (1, "cat purrs softly"),
        (2, "cat naps often"),
        (3, "dog barks loudly"),
        (4, "dog digs holes"),
        (5, "cat purrs often"),   # raw but target-like
        (6, "dog barks holes"),   # raw and raw-like
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "source", F.when(F.col("doc_id") <= 2, "tgt").otherwise("raw")
    )
    out = {
        r["doc_id"]: (r["n_feats"], r["dsir_weight_micro"], r["keep"])
        for r in dsir_importance(
            df, is_target=F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    exp = _dsir_expected(rows, {1, 2}, 64, 0.5)
    for doc_id, (nf, wm) in exp.items():
        assert out[doc_id][0] == nf
        assert out[doc_id][1] == wm, f"doc {doc_id}"
        assert out[doc_id][2] == (wm > 0)
    assert out[5][1] > 0 and out[6][1] < 0


def test_dsir_empty_doc_kept_with_zero_weight(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "  ")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            df, is_target=F.col("doc_id") == 1, n_buckets=16
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d]["n_feats"] == 0
        assert out[d]["dsir_weight_micro"] == 0
        assert not out[d]["keep"]


def test_dsir_single_word_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_feats"]
        for r in dsir_importance(
            df, is_target=F.col("doc_id") == 1, n_buckets=16
        ).collect()
    }
    assert out[1] == 1          # 1 unigram, 0 bigrams
    assert out[2] == 3          # 2 unigrams + 1 bigram


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_expected(docs, queries, k1, b):
    """Exact float-op mirror of bm25_topk (same association order)."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in docs}
    n = float(len(docs))
    avgdl = float(sum(len(ws) for ws in toks.values())) / n
    out = {}
    for qid, q in queries:
        terms = sorted(set(w for w in q.split(" ") if w))
        scores = {}
        for d, ws in toks.items():
            dl = len(ws)
            hit = 0
            sm = 0
            for t in terms:
                tf = ws.count(t)
                if tf == 0:
                    continue
                df = sum(1 for ws2 in toks.values() if t in ws2)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                denom = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
                sm += round(idf * tf * (k1 + 1.0) / denom * 1e6)
                hit += 1
            if hit:
                scores[d] = (hit, sm)
        out[qid] = scores
    return out


def test_bm25_exact_scores_and_ranking(spark):
    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple apple apple apple"),
        (4, "durian elderberry fig"),
        (5, "apple banana cherry durian"),
    ]
    queries = [(0, "apple banana"), (1, "durian"), (2, "missingword")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    got = bm25_topk(ddf, qdf, k=3).collect()
    exp = _bm25_expected(docs, queries, BM25_K1, BM25_B)

    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    # query 2 matches nothing -> absent entirely
    assert 2 not in by_q
    for qid in (0, 1):
        ranked = sorted(
            exp[qid].items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:3]
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [(r["doc_id"], r["n_hit_terms"], r["score_micro"])
                for r in rows] == [
            (d, h, s) for d, (h, s) in ranked
        ]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_bm25_more_occurrences_rank_higher(spark):
    # same doc length, higher tf must win under BM25
    docs = [(1, "x y y y"), (2, "x x y y"), (3, "y y y y")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "x")], ["query_id", "query"])
    rows = sorted(bm25_topk(ddf, qdf, k=3).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [2, 1]


def test_bm25_duplicate_query_terms_score_once(spark):
    docs = [(1, "x y"), (2, "y z")]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    got1 = bm25_topk(
        ddf, spark.createDataFrame([(0, "x x x")], ["query_id", "query"]), k=2
    ).collect()
    got2 = bm25_topk(
        ddf, spark.createDataFrame([(0, "x")], ["query_id", "query"]), k=2
    ).collect()
    assert sorted((r["doc_id"], r["score_micro"]) for r in got1) == sorted(
        (r["doc_id"], r["score_micro"]) for r in got2
    )


# ---------------------------------------------------------------------------
# Fertility
# ---------------------------------------------------------------------------


def test_fertility_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta", "s1"),        # pieces: ceil(5/4)+ceil(4/4)=3; 9 chars
            (2, "gamma", "s1"),             # 1 word, 2 pieces, 5 chars
            (3, "hi", None),                # NULL source sentinel
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in tokenizer_fertility(df).collect()}
    s1 = out["s1"]
    assert (s1["n_docs"], s1["n_words"], s1["n_pieces"], s1["n_chars"]) == (
        2, 3, 5, 14,
    )
    assert s1["fertility"] == round(5 / 3, 6)
    assert s1["chars_per_piece"] == round(14 / 5, 6)
    assert s1["words_per_doc"] == 1.5
    nn = out["__none__"]
    assert (nn["n_docs"], nn["n_words"], nn["n_pieces"]) == (1, 1, 1)


def test_fertility_empty_text_zero_counts(spark):
    df = spark.createDataFrame([(1, "", "s")], ["doc_id", "text", "source"])
    r = tokenizer_fertility(df).collect()[0]
    assert r["n_words"] == 0
    assert r["n_pieces"] == 0  # ceil(len('')/4) = 0 for the single '' token
    assert r["n_chars"] == 0
    assert r["fertility"] is None
    assert r["chars_per_piece"] is None
    assert r["words_per_doc"] == 0.0
