"""Vocabulary build / encode / decode — hand-computed goldens plus the
round-trip contract (driver oracle re-verifies vocab/encode_tokens at
sf0.01 against DuckDB)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.operators.vocab import (  # noqa: E402
    UNK_ID,
    build_vocab,
    decode_documents,
    encode_documents,
)


def _corpus(spark):
    rows = [
        (1, "b a b c b a"),   # b:3 a:2 c:1
        (2, "a c a d"),       # a:2 c:1 d:1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_build_vocab_rank_and_ties(spark):
    # counts: a=4, b=3, c=2, d=1 -> ids 1..4; tie-break is (cnt desc, word)
    v = {r["word"]: (r["id"], r["cnt"]) for r in build_vocab(_corpus(spark)).collect()}
    assert v == {"a": (1, 4), "b": (2, 3), "c": (3, 2), "d": (4, 1)}


def test_build_vocab_caps_and_min_count(spark):
    v = build_vocab(_corpus(spark), max_vocab=2).collect()
    assert {r["word"] for r in v} == {"a", "b"}
    v2 = build_vocab(_corpus(spark), min_count=2).collect()
    assert {r["word"] for r in v2} == {"a", "b", "c"}


def test_encode_preserves_order_and_unk(spark):
    df = _corpus(spark)
    vocab = build_vocab(df, max_vocab=3)  # a=1 b=2 c=3; d -> UNK
    enc = {r["doc_id"]: r["ids"] for r in encode_documents(df, vocab).collect()}
    assert enc[1] == [2, 1, 2, 3, 2, 1]
    assert enc[2] == [1, 3, 1, UNK_ID]


def test_encode_decode_roundtrip(spark):
    df = _corpus(spark)
    vocab = build_vocab(df)  # full vocab -> lossless
    back = decode_documents(encode_documents(df, vocab), vocab)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == want


def test_decode_renders_unk(spark):
    df = _corpus(spark)
    vocab = build_vocab(df, max_vocab=3)
    back = decode_documents(encode_documents(df, vocab), vocab)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[2] == "a c a <unk>"


def test_encode_vocab_join_is_broadcast(spark):
    df = _corpus(spark)
    enc = encode_documents(df, build_vocab(df, max_vocab=3))
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
