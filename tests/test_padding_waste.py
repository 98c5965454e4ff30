"""padding_waste — batch-shape planner (naive per-example padding vs
concat-and-chunk lower bound). Hand-computed goldens; DuckDB twin
re-verifies at sf0.01 (padding_waste)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.operators.aggregates import padding_waste  # noqa: E402


def test_padding_waste_hand_golden(spark):
    rows = [
        # source a: counts 100, 250, 300 at L=100:
        #   naive: ceil->100,300,300 => total 700, pad 50
        #   packed: sum 650 -> ceil 700, pad 50... (same here)
        ("a", 100), ("a", 250), ("a", 300),
        # source b: 10, 20 at L=100: naive 200 (pad 170), packed 100 (pad 70)
        ("b", 10), ("b", 20),
        # NULL source -> sentinel; NULL and negative counts -> n_bad
        (None, 55), ("c", None), ("c", -5), ("c", 100),
    ]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    out = {r["source"]: r for r in padding_waste(df, "n_tok", 100).collect()}

    a = out["a"]
    assert (a["n_docs"], a["n_bad"], a["n_tokens"]) == (3, 0, 650)
    assert a["pad_naive"] == 50 and a["pad_packed"] == 50
    assert a["efficiency_naive"] == round(650 / 700, 6)

    b = out["b"]
    assert (b["n_tokens"], b["pad_naive"], b["pad_packed"]) == (30, 170, 70)
    assert b["efficiency_naive"] == 0.15
    assert b["efficiency_packed"] == 0.3

    n = out["__none__"]
    assert (n["n_docs"], n["n_tokens"], n["pad_naive"]) == (1, 55, 45)

    c = out["c"]
    assert (c["n_docs"], c["n_bad"], c["n_tokens"]) == (1, 2, 100)
    assert c["pad_naive"] == 0 and c["pad_packed"] == 0
    assert c["efficiency_naive"] == 1.0 and c["efficiency_packed"] == 1.0


def test_padding_waste_exact_multiples_and_zero(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 200)], "source string, n_tok long"
    )
    a = padding_waste(df, "n_tok", 100).collect()[0]
    # 0-token doc: ceil(0/L)=0 contexts, zero pad; 200 is an exact multiple
    assert a["n_tokens"] == 200
    assert a["pad_naive"] == 0 and a["pad_packed"] == 0


def test_padding_waste_bad_context_len(spark):
    df = spark.createDataFrame([("a", 1)], "source string, n_tok long")
    with pytest.raises(ValueError, match="positive"):
        padding_waste(df, "n_tok", 0)


# ---------------------------------------------------------------------------
# shard_manifest (packed-training boundary metadata on pack_shards)
# ---------------------------------------------------------------------------

from audiopro_essentia_spark.operators.packing import shard_manifest  # noqa: E402


def test_shard_manifest_hand_golden(spark):
    # bucket = doc_id % 64 == doc_id here, so pack order is plain doc_id
    rows = [(0, 10), (1, 20), (2, 4090), (3, 5), (4, 0), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {r["shard_id"]: r for r in shard_manifest(df, "n_tok", 100).collect()}
    # offsets: 0,10,30,4120,4125,4125 -> shards 0,0,0,41,41,41
    assert set(out) == {0, 41}
    s0 = out[0]
    assert (s0["n_docs"], s0["n_straddlers"], s0["n_tokens_started"]) == (3, 1, 4120)
    assert s0["boundaries"] == "0:0,10:1,30:2"
    s41 = out[41]
    assert (s41["n_docs"], s41["n_straddlers"], s41["n_tokens_started"]) == (3, 1, 105)
    # equal offsets (zero-token doc 4) tie-break by doc_id
    assert s41["boundaries"] == "20:3,25:4,25:5"


def test_new_ops_partition_count_invariant(spark):
    """shard_manifest / epoch_shuffle / span_scrub are order-sensitive
    internally (prefix sums, collect_list, canonical mins) — their OUTPUT
    must not depend on shuffle partitioning (README invariance claim)."""
    from audiopro_essentia_spark.operators.dedup import span_scrub
    from audiopro_essentia_spark.operators.shuffle import epoch_shuffle

    packs = spark.createDataFrame(
        [(i, (i * 37) % 211) for i in range(500)], "doc_id long, n_tok long"
    )
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
         for i in range(120)],
        "doc_id long, text string",
    )

    from pyspark.sql import functions as F

    from audiopro_essentia_spark.operators.aggregates import (
        source_kl_divergence,
        zipf_slope,
    )
    from audiopro_essentia_spark.operators.dedup import source_ngram_overlap
    from audiopro_essentia_spark.operators.sketch import hll_distinct

    sourced = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
    )

    def snapshot():
        return (
            sorted(map(tuple, shard_manifest(packs, "n_tok", 100).collect())),
            sorted(map(tuple, epoch_shuffle(packs, n_buckets=16).collect())),
            sorted(map(tuple, span_scrub(docs, n=4).collect())),
            # r4 monitoring ops: float estimate / micro-nat sums must not
            # depend on partitioning (exact dyadic sum / BIGINT sums)
            sorted(
                map(
                    tuple,
                    hll_distinct(
                        sourced.select(
                            "source",
                            F.explode(F.split("text", " ")).alias("w"),
                        ),
                        F.col("w"),
                        p=7,
                    ).collect(),
                )
            ),
            sorted(map(tuple, source_kl_divergence(sourced, top_n=10).collect())),
            sorted(map(tuple, zipf_slope(sourced, top_n=10).collect())),
            sorted(
                map(tuple, source_ngram_overlap(sourced, ngram=3).collect())
            ),
        )

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = snapshot()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = snapshot()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b


# ---------------------------------------------------------------------------
# pack_nosplit (greedy no-split, bucket-aligned)
# ---------------------------------------------------------------------------

from audiopro_essentia_spark.operators.packing import pack_nosplit  # noqa: E402


def test_pack_nosplit_hand_golden(spark):
    rows = [(0, 50), (1, 150), (2, 40), (3, 30), (4, 20), (5, 60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {
        r["doc_id"]: r for r in pack_nosplit(df, "n_tok", 100, n_buckets=2).collect()
    }
    # bucket 0 = docs 0,2,4: 50 -> (0,0); +40 fits -> (0,50); +20 doesn't -> (1,0)
    assert (out[0]["shard_seq"], out[0]["shard_offset"]) == (0, 0)
    assert (out[2]["shard_seq"], out[2]["shard_offset"]) == (0, 50)
    assert (out[4]["shard_seq"], out[4]["shard_offset"]) == (1, 0)
    # bucket 1 = docs 1,3,5: 150 oversize alone -> (0,0); 30 new shard ->
    # (1,0); +60 fits -> (1,30)
    assert (out[1]["shard_seq"], out[1]["shard_offset"], out[1]["oversize"]) == (0, 0, 1)
    assert (out[3]["shard_seq"], out[3]["shard_offset"]) == (1, 0)
    assert (out[5]["shard_seq"], out[5]["shard_offset"]) == (1, 30)
    assert all(out[i]["oversize"] == 0 for i in (0, 2, 3, 4, 5))


def test_pack_nosplit_no_doc_straddles(spark):
    """The defining invariant: every non-oversize doc fits entirely
    inside its shard."""
    rows = [(i, (i * 53) % 140) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    from pyspark.sql import functions as F
    bad = (
        pack_nosplit(df, "n_tok", 100, n_buckets=8)
        .filter((F.col("oversize") == 0)
                & (F.col("shard_offset") + F.col("n_tokens") > 100))
        .count()
    )
    assert bad == 0


def test_pack_nosplit_matches_python_mirror(spark):
    rows = [(i, (i * 37 + 11) % 130) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["bucket"], r["shard_seq"], r["shard_offset"], r["oversize"])
        for r in pack_nosplit(df, "n_tok", 100, n_buckets=16).collect()
    }
    exp = {}
    by_bucket = {}
    for i, n in rows:
        by_bucket.setdefault(i % 16, []).append((i, n))
    for b, docs in by_bucket.items():
        fill = None
        seq = 0
        for i, n in sorted(docs):
            if fill is None:
                seq, off, fill = 0, 0, n
            elif fill + n <= 100:
                off = fill
                fill += n
            else:
                seq, off, fill = seq + 1, 0, n
            exp[i] = (b, seq, off, 1 if n > 100 else 0)
    assert got == exp


def test_pack_nosplit_zero_and_bad_inputs(spark):
    df = spark.createDataFrame([(0, 0), (2, 100)], "doc_id long, n_tok long")
    out = {r["doc_id"]: r for r in pack_nosplit(df, "n_tok", 100, n_buckets=1).collect()}
    # zero-token doc opens the shard; the 100 still fits behind it
    assert (out[0]["shard_seq"], out[0]["shard_offset"]) == (0, 0)
    assert (out[2]["shard_seq"], out[2]["shard_offset"]) == (0, 0)

    import pytest as _pytest
    bad = spark.createDataFrame([(0, -5)], "doc_id long, n_tok long")
    with _pytest.raises(Exception, match="negative"):
        pack_nosplit(bad, "n_tok", 100).collect()
    # NULL counts arrive in pandas as float64 NaN (not None) — the guard
    # must fire on isna(), not identity; a silent NaN would mis-pack every
    # later doc in the bucket (fill=NaN makes fits-checks always False).
    nul = spark.createDataFrame(
        [(0, 10), (1, None), (2, 10)], "doc_id long, n_tok long"
    )
    with _pytest.raises(Exception, match="NULL"):
        pack_nosplit(nul, "n_tok", 100, n_buckets=1).collect()
    with _pytest.raises(ValueError, match="positive"):
        pack_nosplit(df, "n_tok", 0)
    txt = spark.createDataFrame([("a", 1)], "doc_id string, n_tok long")
    with _pytest.raises(ValueError, match="integral"):
        pack_nosplit(txt, "n_tok", 100)
