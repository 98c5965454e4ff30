"""Dedup / similarity / text / multimodal / streaming operator tests with
python-side oracles (the SQL twins are covered by driver_compare)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_with_planted_dup(spark, docs):
    from audiopro_essentia_spark.operators.dedup import exact_dedup

    planted = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    d2 = docs.unionByName(planted)
    out = exact_dedup(d2).collect()
    dups = [r for r in out if r.n_dups > 1]
    assert len(dups) == 3
    assert all(r.doc_id < 100000 for r in dups)  # min-id representative


def test_minhash_finds_planted_neardup(spark, docs):
    from audiopro_essentia_spark.operators.dedup import minhash_lsh_candidates

    # plant a near-duplicate: copy a doc, tweak the last word
    src = docs.filter(F.col("n_chars") > 300).limit(1)
    dup = src.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzz"))
    )
    d2 = docs.unionByName(dup)
    src_id = src.collect()[0].doc_id
    pairs = minhash_lsh_candidates(d2, k=16, bands=4).collect()
    assert any(
        r.id_a == src_id and r.id_b == src_id + 100000 for r in pairs
    ), pairs[:10]


def test_simhash_near_for_neardup_far_for_random(spark, docs):
    from audiopro_essentia_spark.operators.dedup import simhash64

    src = docs.filter(F.col("n_chars") > 300).limit(2)
    rows = src.collect()
    dup = src.limit(1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzz"))
    )
    sigs = {
        r.doc_id: r.s
        for r in src.unionByName(dup.withColumn("doc_id", F.col("doc_id") + 100000))
        .select("doc_id", simhash64(F.col("text")).alias("s"))
        .collect()
    }
    a, b = rows[0].doc_id, rows[1].doc_id
    ham_dup = bin((sigs[a] ^ sigs[a + 100000]) & (2**64 - 1)).count("1")
    ham_rand = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
    assert ham_dup <= 6
    assert ham_rand > ham_dup


def test_brute_force_topk_matches_numpy(spark, embeddings):
    from audiopro_essentia_spark.operators.similarity import brute_force_topk

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(embeddings, q, k=5).collect()
    pdf = embeddings.toPandas()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        cos = np.round((M @ M[qi]) / (norms * norms[qi]), 6)
        order = sorted(zip(-cos, ids))[:5]
        exp = [(i, -c) for c, i in order]
        g = sorted(
            [(r.vec_id, r.cosine) for r in got if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert [i for i, _ in g] == [i for i, _ in exp], (qid, g, exp)


def test_lsh_ann_subset_of_bruteforce_domain(spark, embeddings):
    from audiopro_essentia_spark.operators.similarity import lsh_topk

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_topk(embeddings, q, k=5, n_planes=4)
    rows = got.collect()
    assert len(rows) > 0
    # every query must at least retrieve itself (same signature, cosine 1)
    self_hits = {r.query_id for r in rows if r.vec_id == r.query_id}
    assert self_hits == {0, 1, 2}


def test_multimodal_plumbing(spark, docs):
    from audiopro_essentia_spark.operators.multimodal import (
        attach_binary_payload,
        extract_media_features,
    )

    media = attach_binary_payload(docs.limit(20))
    out = extract_media_features(media).collect()
    assert len(out) == 20
    for r in out:
        assert r.decode_status == "ok"
        assert r.byte_entropy is not None and 0 < r.byte_entropy <= 8
        assert len(r.byte_histogram) == 16
        assert abs(sum(r.byte_histogram) - 1.0) < 1e-9


def test_streaming_sessionize_matches_batch(spark):
    import datetime as dt

    import __spark_entry__ as E
    from audiopro_essentia_spark.operators.temporal import session_stats

    stream_out = E.q_streaming_session(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = session_stats(ev, ("user_id",), "ts", 1800.0)
    # append mode holds back sessions not yet past the watermark: compare
    # only sessions finalized before max_ts - watermark - gap
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(seconds=3600 + 1800)
    got = sorted(
        (r.user_id, r.n_events)
        for r in stream_out.collect()
        if r.session_end <= cutoff
    )
    exp = sorted(
        (r.user_id, r.n_events)
        for r in batch.collect()
        if r.session_end <= cutoff
    )
    assert got == exp and len(got) > 500


def test_quality_and_langid_shape(spark, docs):
    from audiopro_essentia_spark.functions.text import lang_id, quality_score

    out = docs.select(
        quality_score(F.col("text")).alias("q"), lang_id(F.col("text")).alias("l")
    ).collect()
    assert all(0.0 <= r.q <= 1.0 for r in out)
    assert {r.l for r in out} <= {"en", "de", "fr", "und"}


def test_jaccard_df_cap_kills_hot_shingle_blowup(spark):
    """One boilerplate shingle in 50% of docs must not make f^2 candidate
    rows: with a df cap the candidate count stays linear, and planted
    near-dups (which share specific shingles) are still found exactly."""
    from audiopro_essentia_spark.operators.dedup import (
        _jaccard_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from audiopro_essentia_spark.functions.text import word_ngrams

    n = 200
    rows = []
    for i in range(n):
        boiler = "click here to subscribe " if i % 2 == 0 else ""
        rows.append((i, f"{boiler}unique text body number {i} alpha beta"))
    # planted near-dup pair: same body, one word changed
    rows.append((9001, "the quick brown fox jumps over the lazy dog today"))
    rows.append((9002, "the quick brown fox jumps over the lazy dog tonight"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = df.select(
        "doc_id", word_ngrams(F.col("text"), 3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    uncapped = _jaccard_candidate_pairs(sh, "doc_id", None).count()
    capped = _jaccard_candidate_pairs(sh, "doc_id", 20).count()
    # hot shingles pair up the 100 boilerplate docs: ~100*99/2 extra pairs
    assert uncapped > 4000
    assert capped < 200  # linear in docs, not quadratic in df

    got = ngram_jaccard_pairs(df, threshold=0.5, max_df=20).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(9001, 9002)]


def test_embed_neardup_lsh_matches_exact_no_cartesian(spark, embeddings):
    """Banded-LSH candidates + exact verify must equal the all-pairs oracle
    on planted near-dups, with NO cartesian product in the plan."""
    import contextlib
    import io

    from audiopro_essentia_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_exact,
    )

    planted = embeddings.limit(4).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )  # exact copies -> cosine 1.0 pairs
    e2 = embeddings.unionByName(planted)
    lsh = embedding_neardup_pairs(
        e2, threshold=0.9, n_planes=16, band_bits=4
    )
    got = sorted((r.id_a, r.id_b, r.cosine) for r in lsh.collect())
    exp = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_neardup_pairs_exact(e2, threshold=0.9).collect()
    )
    assert got == exp and len(got) >= 4

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lsh.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_recall_and_exactness(spark, embeddings):
    from audiopro_essentia_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(embeddings, q, k=5).collect()
    }
    # full probe == exact (including tie-breaks)
    full = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(embeddings, q, k=5, n_centroids=8, nprobe=8).collect()
    }
    assert full == exact
    # partial probe: top-1 self-hit always survives (query is in corpus and
    # probes its own cell first); overall recall must be non-trivial
    part = ivf_topk(embeddings, q, k=5, n_centroids=8, nprobe=2).collect()
    got_pairs = {(r.query_id, r.vec_id) for r in part}
    exp_pairs = set()
    for (qid, _rank), vid in exact.items():
        exp_pairs.add((qid, vid))
    assert all((qid, qid) in got_pairs for qid in (0, 1, 2))
    recall = len(got_pairs & exp_pairs) / len(exp_pairs)
    assert recall >= 0.4


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation must cross multi-hop chains (diameter > 1),
    not just direct pairs."""
    from audiopro_essentia_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_jaccard_cap_still_exact_for_large_identical_groups(spark):
    """60 byte-identical docs (every shingle hot under the cap) must still
    yield ALL C(60,2) pairs — md5-equality union restores the exact-dup
    case the df cap would otherwise erase."""
    from audiopro_essentia_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, "identical boilerplate text repeated verbatim here") for i in range(60)]
    rows += [(100 + i, f"distinct filler number {i} goes here now") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ngram_jaccard_pairs(df, threshold=0.9, max_df=20).collect()
    assert len(got) == 60 * 59 // 2
    assert all(r.jaccard == 1.0 for r in got)


def test_hash_split_and_sample_determinism(spark, docs):
    from audiopro_essentia_spark.functions.sampling import hash_sample, hash_split

    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n  # exhaustive + disjoint
    assert counts["train"] > 0.6 * n  # ~80% within binomial noise
    # assignment is a pure function of doc_id: rerun identical
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b
    # sample: fraction honored approximately, subset deterministic
    s1 = {r.doc_id for r in hash_sample(docs, 0.25).select("doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, 0.25).select("doc_id").collect()}
    assert s1 == s2
    assert 0.1 * n < len(s1) < 0.4 * n
    # different salt -> different (independent) selection
    s3 = {r.doc_id for r in hash_sample(docs, 0.25, salt="v2").select("doc_id").collect()}
    assert s3 != s1


def test_curate_corpus_end_to_end(spark, docs):
    """Quality gate + lang filter + exact/near-dup collapse + split: planted
    exact dup and near-dup lose to their canonical doc; split exhaustive."""
    from audiopro_essentia_spark.plans.curate import curate_corpus

    base = docs.limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (900001, base.text),                      # exact dup of base
            (900002, base.text + " tail"),            # near dup of base
        ],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text")) \
     .withColumn("lang", F.lit(base.lang)) \
     .withColumn("source", F.lit(base.source))
    d2 = docs.unionByName(extra.select(*docs.columns))
    out = curate_corpus(d2, min_quality=0.0, langs=("en", "de", "fr", "und"))
    ids = {r.doc_id for r in out.collect()}
    assert base.doc_id in ids
    assert 900001 not in ids  # exact dup collapsed
    assert 900002 not in ids  # near-dup cluster collapsed
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}


def test_lsh_bucket_star_cap_stays_linear_and_connected(spark):
    """A bucket past max_bucket emits the linear star pattern (min-id x
    rest), not the quadratic all-pairs set — and the star keeps the group
    connected for clustering."""
    from audiopro_essentia_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(8)]  # identical -> one bucket per band
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_candidates(df, k=16, bands=4, max_bucket=4).collect()
    full = minhash_lsh_candidates(df, k=16, bands=4, max_bucket=1024).collect()
    assert {(r.id_a, r.id_b) for r in full} == {
        (a, b) for a in range(8) for b in range(a + 1, 8)
    }
    # every bucket holds all 8 docs (min id 0), so the capped output must
    # be EXACTLY the min-id star — not merely fewer arbitrary pairs
    assert {(r.id_a, r.id_b) for r in capped} == {(0, j) for j in range(1, 8)}
    # connectivity survives the cap: one cluster, canonical min-id 0
    from audiopro_essentia_spark.operators.dedup import connected_components

    pairs = minhash_lsh_candidates(df, k=16, bands=4, max_bucket=4)
    clusters = connected_components(pairs).collect()
    assert {r.cluster_id for r in clusters} == {0}
    assert {r.id for r in clusters} == set(range(8))


def test_repetition_profile_flags_repetitive_doc(spark):
    from audiopro_essentia_spark.operators.repetition import repetition_profile

    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "each word here is fully unique today"),
        (3, "x"),  # single word: no bigram -> zeroed gram signals
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_profile(df, ngram=2).collect()}
    assert out[1].dup_word_frac > 0.8 and out[2].dup_word_frac == 0.0
    assert out[1].dup_ngram_frac == 0.8  # 5 bigrams, 1 distinct
    # "spam spam" (9 chars) * 5 occurrences / 29 chars
    assert abs(out[1].top_ngram_char_frac - 45 / 29) < 1e-6
    assert out[3].dup_ngram_frac == 0.0 and out[3].top_ngram_char_frac == 0.0


def test_tfidf_prefers_rare_terms(spark):
    from audiopro_essentia_spark.operators.tfidf import tfidf_top_terms

    rows = [
        (1, "common zebra"),
        (2, "common words appear everywhere common"),
        (3, "common text common here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    top1 = {r.doc_id: r.term for r in out if r.rank == 1}
    # 'common' is in every doc (df=3 -> idf 1.0); at equal tf the rare
    # 'zebra' (idf = ln(2)+1) outranks it
    assert top1[1] == "zebra"
    ranks = [(r.doc_id, r.rank) for r in out]
    assert sorted(ranks) == [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)]


def test_simhash_udf_matches_expression_form(spark, docs):
    """The Arrow UDF and the pure-expression simhash64 must agree bit-for-
    bit (both build the 64 bits from the two halves of one md5 digest)."""
    from audiopro_essentia_spark.operators.dedup import simhash64, simhash64_fast

    d = docs.limit(25)
    got = d.select(
        "doc_id",
        simhash64(F.col("text"), ngram=2).alias("expr"),
        simhash64_fast(d, "text", ngram=2).alias("udf"),
    ).collect()
    assert len(got) == 25
    for r in got:
        assert r.expr == r.udf, r.doc_id


def test_pack_shards_contiguous_prefix_sum(spark):
    from audiopro_essentia_spark.operators.packing import pack_shards

    rows = [(i, 10 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sorted(
        pack_shards(df, "n", shard_tokens=256, n_buckets=8).collect(),
        key=lambda r: r.global_offset,
    )
    # offsets form one contiguous token stream: each doc starts where the
    # previous ended, and every doc appears exactly once
    pos = 0
    for r in out:
        assert r.global_offset == pos
        assert r.shard_id == pos // 256 and r.shard_offset == pos % 256
        pos += r.n_tokens
    assert pos == sum(n for _, n in rows)
    assert len(out) == 300


def test_incremental_dedup_flags_planted(spark, docs):
    from audiopro_essentia_spark.operators.dedup import incremental_dedup_flags

    corpus = docs.filter(F.col("n_chars") > 300).limit(5)
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    # new batch: one exact copy, one near-dup (word appended), one fresh doc
    exact = corpus.limit(1).withColumn("doc_id", F.lit(900001).cast("long"))
    near = (
        corpus.filter(F.col("doc_id") == ids[1])
        .withColumn("doc_id", F.lit(900002).cast("long"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzz")))
    )
    fresh = (
        corpus.limit(1)
        .withColumn("doc_id", F.lit(900003).cast("long"))
        .withColumn(
            "text",
            F.lit("entirely novel content never seen before in any corpus xyz abc"),
        )
    )
    new = exact.unionByName(near).unionByName(fresh)
    got = {
        r.doc_id: (r.dup_exact, r.dup_near)
        for r in incremental_dedup_flags(new, corpus, k=16, bands=4).collect()
    }
    assert got[900001] == (1, 1)   # exact copy: both flags
    assert got[900002] == (0, 1)   # near-dup: minhash only
    assert got[900003] == (0, 0)   # fresh doc: clean


def test_incremental_dedup_bloom_prefilter_identical(spark, docs):
    """The seen-set Bloom prefilter must not change a single flag: no
    false negatives by construction, and false positives die in the
    authoritative exact semi-joins. Pinned on a batch large enough to
    carry exact dups, near dups, AND many clean docs (the population the
    prefilter actually removes), at a deliberately tiny m (high FP rate
    — the identity must hold even on a saturated filter)."""
    from audiopro_essentia_spark.operators.dedup import (
        incremental_dedup_flags,
        seen_set_bloom,
    )

    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 == 1).limit(60)
    # plant one exact dup and one near dup from the corpus side
    planted_src = corpus.limit(2).collect()
    planted = spark.createDataFrame(
        [
            (900011, planted_src[0].text),
            (900012, planted_src[1].text + " zzz"),
        ],
        "doc_id long, text string",
    )
    new = new.select("doc_id", "text").unionByName(planted)
    base = {
        r.doc_id: (r.dup_exact, r.dup_near)
        for r in incremental_dedup_flags(new, corpus, k=16, bands=4).collect()
    }
    assert base[900011] == (1, 1)
    assert base[900012][1] == 1
    for m_bits in (1 << 14, 256):  # sane size AND a saturated filter
        regs = seen_set_bloom(corpus, k=16, bands=4, m_bits=m_bits, n_hashes=3)
        got = {
            r.doc_id: (r.dup_exact, r.dup_near)
            for r in incremental_dedup_flags(
                new, corpus, k=16, bands=4,
                bloom=regs, bloom_m_bits=m_bits, bloom_n_hashes=3,
            ).collect()
        }
        assert got == base


def test_normalize_text_collapses_variants(spark):
    from audiopro_essentia_spark.functions.text import normalize_text

    rows = [
        (1, "Hello, World!  How are   you?"),
        (2, "hello world how are you"),
        (3, "different entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n for r in df.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == "hello world how are you"
    assert out[3] == "different entirely"


def test_hashed_embedding_feeds_ann(spark, docs):
    """The hashing-trick vectors are unit-norm and plug straight into the
    ANN operators: every doc retrieves itself at cosine 1."""
    from audiopro_essentia_spark.operators.featurize import hashed_doc_embedding
    from audiopro_essentia_spark.operators.similarity import brute_force_topk

    emb = hashed_doc_embedding(docs.limit(20)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(emb, q, k=1).collect()
    assert {(r.query_id, r.vec_id, r.cosine) for r in got} == {
        (0, 0, 1.0), (1, 1, 1.0), (2, 2, 1.0)
    }


def test_bucket_pairs_semantics_parametrized(spark):
    """_bucket_pairs == all (a<b) pairs at/below the cap, min-id star
    above it — checked for several sizes around the boundary in one job."""
    from itertools import combinations

    from audiopro_essentia_spark.operators.dedup import _bucket_pairs

    rows = [(n, list(range(100, 100 + n))) for n in (2, 3, 4, 5, 8)]
    df = spark.createDataFrame(rows, "n int, ids array<bigint>")
    out = df.select(
        "n", F.explode(_bucket_pairs(F.col("ids"), 4)).alias("p")
    ).select("n", "p.id_a", "p.id_b").collect()
    got = {}
    for r in out:
        got.setdefault(r.n, set()).add((r.id_a, r.id_b))
    for n, ids in rows:
        if n <= 4:
            exp = set(combinations(ids, 2))
        else:
            exp = {(ids[0], j) for j in ids[1:]}
        assert got[n] == exp, n


def test_normalize_text_idempotent(spark):
    from audiopro_essentia_spark.functions.text import normalize_text

    rows = [(i, t) for i, t in enumerate([
        "Hello, World!", "  spaces   everywhere  ", "MIXED case; punct?",
        "already normalized text", "", "...", "a",
    ])]
    df = spark.createDataFrame(rows, "i long, text string")
    out = df.select(
        normalize_text(F.col("text")).alias("once"),
    ).select(
        "once", normalize_text(F.col("once")).alias("twice")
    ).collect()
    for r in out:
        assert r.once == r.twice


def test_incremental_dedup_from_materialized_index(spark, docs, tmp_path):
    """The production path: corpus signatures WRITTEN once, the increment
    joins against the on-disk index — flags identical to the inline
    computation."""
    from audiopro_essentia_spark.operators.dedup import (
        incremental_dedup_flags,
        minhash_band_signatures,
    )

    corpus = docs.filter(F.col("n_chars") > 300).limit(10)
    new = (
        corpus.limit(2)
        .withColumn("doc_id", F.col("doc_id") + 700000)  # exact dups
    )
    inline = {
        r.doc_id: (r.dup_exact, r.dup_near)
        for r in incremental_dedup_flags(new, corpus, k=16, bands=4).collect()
    }

    idx_path = str(tmp_path / "sig_index")
    minhash_band_signatures(corpus, k=16, bands=4).write.parquet(idx_path)
    cs = spark.read.parquet(idx_path)
    ns = minhash_band_signatures(new, k=16, bands=4)
    near_ids = {
        r.doc_id
        for r in ns.join(
            cs.select("band", "bsig").distinct(), ["band", "bsig"], "left_semi"
        ).select("doc_id").distinct().collect()
    }
    for doc_id, (_, dup_near) in inline.items():
        assert (doc_id in near_ids) == bool(dup_near)
    assert all(v == (1, 1) for v in inline.values())  # exact copies


def test_chunk_documents_overlap_and_short_docs(spark):
    from audiopro_essentia_spark.functions.text import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # 10 words, 2 chunks
        (2, "tiny doc"),                              # < chunk -> whole doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.chunk_idx): r for r in
           chunk_documents(df, chunk_words=6, overlap=2).collect()}
    # hop = 4: chunks at words [0:6] and [4:10]
    assert out[(1, 0)].chunk_text == "w0 w1 w2 w3 w4 w5"
    assert out[(1, 1)].chunk_text == "w4 w5 w6 w7 w8 w9"
    # overlap: last 2 words of chunk 0 == first 2 of chunk 1
    assert out[(1, 0)].chunk_text.split()[-2:] == out[(1, 1)].chunk_text.split()[:2]
    assert out[(2, 0)].chunk_text == "tiny doc" and out[(2, 0)].n_chunk_words == 2
    assert (2, 1) not in out


def test_contamination_flags_planted_overlap(spark):
    from audiopro_essentia_spark.operators.dedup import contamination_flags

    bench = spark.createDataFrame(
        [(900, "what is the capital city of france paris obviously")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "what is the capital city of france asked the student"),
            (2, "completely unrelated training document about cooking pasta well"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shared, r.contaminated)
        for r in contamination_flags(train, bench, ngram=5).collect()
    }
    assert got[1][0] >= 2 and got[1][1] == 1  # shares 5-gram prefix run
    assert got[2] == (0, 0)


def test_unigram_surprisal_rare_words_score_higher(spark):
    from audiopro_essentia_spark.operators.tfidf import unigram_surprisal

    rows = [
        (1, "common common common common"),
        (2, "common rareword common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.avg_logloss for r in unigram_surprisal(df).collect()}
    # P(common)=7/8, P(rareword)=1/8: doc 2 contains the rare token
    assert got[2] > got[1]
    import math
    assert abs(got[1] - (-math.log(7 / 8))) < 1e-6


def test_minhash_udf_matches_expression_form(spark, docs):
    """The banded Arrow UDF and the pure-expression minhash_signature use
    identical arithmetic — pin it (same contract the DuckDB twin relies
    on)."""
    from audiopro_essentia_spark.functions.text import word_ngrams
    from audiopro_essentia_spark.operators.dedup import (
        make_minhash_band_udf,
        minhash_signature,
    )

    d = docs.limit(10).select(
        "doc_id", word_ngrams(F.col("text"), 3).alias("sh")
    ).filter(F.size("sh") > 0)
    got = d.select(
        "doc_id",
        minhash_signature(F.col("sh"), k=16).alias("expr"),
        make_minhash_band_udf(16, 4)(F.col("sh")).alias("udf_bands"),
    ).collect()
    assert len(got) == 10
    for r in got:
        expr_bands = [
            ",".join(str(v) for v in r.expr[b * 4 : (b + 1) * 4])
            for b in range(4)
        ]
        assert expr_bands == list(r.udf_bands), r.doc_id


def test_curate_optional_gates_tighten_survivors(spark, docs):
    from audiopro_essentia_spark.plans.curate import curate_corpus

    base = curate_corpus(docs, min_quality=0.0, langs=("en", "de", "fr", "und"),
                         near_dup=False).count()
    bench = docs.limit(3)
    gated = curate_corpus(
        docs, min_quality=0.0, langs=("en", "de", "fr", "und"),
        near_dup=False,
        max_dup_word_frac=0.5,
        max_surprisal=8.0,
        benchmark=bench,
    ).count()
    # every benchmark doc contaminates at least itself -> strictly fewer
    assert 0 < gated < base


def test_mixture_sample_rates_and_stability(spark):
    from audiopro_essentia_spark.functions.sampling import mixture_sample

    rows = [(i, "wiki" if i % 2 == 0 else "cc") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mixture_sample(df, {"wiki": 1.0, "cc": 0.25}).collect()
    wiki = [r for r in kept if r.source == "wiki"]
    cc = [r for r in kept if r.source == "cc"]
    assert len(wiki) == 1000                      # 100% kept
    assert 180 <= len(cc) <= 320                  # ~25% (binomial)
    # stability: a doc's decision never changes when the corpus grows
    bigger = df.union(
        spark.createDataFrame(
            [(i, "cc") for i in range(2000, 3000)], "doc_id long, source string"
        )
    )
    kept2 = {r.doc_id for r in mixture_sample(bigger, {"wiki": 1.0, "cc": 0.25}).collect()}
    assert {r.doc_id for r in kept} <= kept2


def test_curate_scrub_pii_collapses_redacted_twins(spark):
    from audiopro_essentia_spark.plans.curate import curate_corpus

    base = "the data the table the row the scan the value the line"
    rows = [
        (1, base + " mail a@b.io"),
        (2, base + " mail c@d.io"),   # differs ONLY in the email
        (3, "the query the join the group the sort the batch the frame"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = curate_corpus(df, min_quality=0.0, langs=("en", "de", "fr", "und"),
                          near_dup=False)
    assert plain.count() == 3  # raw texts differ -> no collapse
    scrubbed = curate_corpus(df, min_quality=0.0,
                             langs=("en", "de", "fr", "und"),
                             near_dup=False, scrub_pii=True)
    kept = sorted(r["doc_id"] for r in scrubbed.collect())
    assert kept == [1, 3]  # 2 became an exact dup of 1 after redaction


def test_curate_span_gate_keeps_short_docs(spark):
    from audiopro_essentia_spark.plans.curate import curate_corpus

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared + " one extra words here now"),
        (2, shared + " two other filler words go"),  # shares both spans w/ 1
        (3, "unique tokens nothing shared anywhere at all"),
        (4, "tiny doc"),  # < span_words: no span stats row -> must survive
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate_corpus(df, min_quality=0.0, langs=("en", "de", "fr", "und"),
                        near_dup=False, max_dup_span_frac=0.4, span_words=3)
    kept = sorted(r["doc_id"] for r in out.collect())
    # docs 1+2 share 2 of their 3 three-word spans (ratio 2/3 > 0.4): gone
    assert kept == [3, 4]


def test_sampling_null_keys_and_fraction_validation(spark):
    import pytest

    from audiopro_essentia_spark.functions.sampling import (
        hash_sample,
        hash_split,
        per_mille,
    )

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "doc_id long, text string"
    )
    # NULL keys land in a deterministic bucket: full-rate sample keeps
    # them, and every row gets a non-NULL split (exhaustive + disjoint)
    assert hash_sample(df, 1.0).count() == 3
    splits = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    assert all(r["split"] is not None for r in splits)
    null_splits = {r["split"] for r in splits if r["doc_id"] is None}
    assert len(null_splits) == 1  # same key -> same deterministic split
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(df, 1.5)
    # HALF-UP per-mille: a sub-per-mille fraction must not silently zero
    assert per_mille(0.0005) == 1
    assert per_mille(0.8) == 800 and per_mille(0.9) == 900


def test_pack_shards_validation(spark):
    import pytest

    from audiopro_essentia_spark.operators.packing import pack_shards

    df = spark.createDataFrame([(1, 10), (2, None)], "doc_id long, n_tok int")
    with pytest.raises(ValueError, match="shard_tokens"):
        pack_shards(df, "n_tok", shard_tokens=0)
    with pytest.raises(Exception, match="NULL or negative"):
        pack_shards(df, "n_tok", shard_tokens=16).collect()


def test_sessionize_gap_threshold_not_truncated(spark):
    import datetime as dt

    from audiopro_essentia_spark.operators.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    # two events exactly 1.001s apart with gap_seconds=1.001: the gap
    # EQUALS the threshold -> same session (int() truncation to 1000999us
    # would have split them)
    df = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(microseconds=1_001_000))],
        ["user_id", "ts"],
    )
    out = sessionize(df, ("user_id",), "ts", gap_seconds=1.001).collect()
    assert {r["session_id"] for r in out} == {0}


def test_multimodal_null_payload_quarantines_not_crashes(spark):
    from audiopro_essentia_spark.operators.multimodal import (
        extract_media_features,
        sample_media_frames,
    )

    df = spark.createDataFrame(
        [("d1", "image", b"\x01\x02\x03", 3), ("d2", "image", None, None)],
        "doc_id string, media_type string, payload binary, n_bytes long",
    )
    out = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert out["d1"]["decode_status"] == "ok"
    assert out["d2"]["decode_status"] == "error:null_payload"
    assert out["d2"]["byte_entropy"] is None
    import pytest

    with pytest.raises(ValueError, match="n_frames"):
        sample_media_frames(df, n_frames=0)


def test_lsh_band_udf_null_embedding_yields_null(spark):
    import pytest
    from pyspark.sql import functions as F2

    from audiopro_essentia_spark.operators.similarity import make_lsh_band_udf

    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    udf = make_lsh_band_udf(8, 4)
    got = {r["vec_id"]: r["b"] for r in df.select("vec_id", udf(F2.col("embedding")).alias("b")).collect()}
    assert got[2] is None and got[1] is not None and got[3] is not None
    with pytest.raises(ValueError, match="divide"):
        make_lsh_band_udf(10, 4)


def test_minhash_bands_must_divide_k():
    import pytest

    from audiopro_essentia_spark.operators.dedup import make_minhash_band_udf

    with pytest.raises(ValueError, match="divide"):
        make_minhash_band_udf(32, 5)


def test_embed_neardup_star_cap_and_zero_norm(spark):
    """The r4 applyInPandas pair-fold must preserve _bucket_pairs'
    star-cap contract: past max_bucket, a bucket emits only min-id-star
    pairs (connectivity kept, O(n) rows); all-zero vectors (norm 0) get
    cosine 0 in both pair positions and never qualify."""
    from audiopro_essentia_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    # 6 identical vectors -> one bucket of 6 under any signature
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # capped: star pattern only — min id 0 paired with each of 1..5
    capped = sorted(
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.99, n_planes=8, band_bits=2, max_bucket=4
        ).collect()
    )
    assert capped == [(0, b) for b in range(1, 6)]

    # uncapped: full all-pairs of the 6 identical vectors, cosine 1.0
    full = embedding_neardup_pairs(
        df, threshold=0.99, n_planes=8, band_bits=2, max_bucket=1024
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in full) == [
        (a, b) for a in range(6) for b in range(a + 1, 6)
    ]
    assert all(r.cosine == 1.0 for r in full)
    # the zero vector never appears (cosine defined as 0 when a norm is 0)
    assert all(99 not in (r.id_a, r.id_b) for r in full)


def test_embed_neardup_null_embedding_dropped(spark):
    from audiopro_essentia_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.9, n_planes=4, band_bits=2
        ).collect()
    )
    assert got == [(1, 2)]  # NULL signature rows drop out of buckets


def test_embed_neardup_ragged_length_dropped_not_crash(spark):
    """One corrupt 3-dim row among 4-dim vectors must not kill the job
    (the applyInPandas rewrite's np.stack would raise on a ragged
    batch): SQL zip_with NULL-pads a mixed-length pair -> NULL dot ->
    cosine 0.0 -> dropped, so the observable contract is 'the corrupt
    row never pairs, everything else is unaffected'. The band UDF signs
    it with its own-dim seeded planes; margin_pair_fold folds only
    within same-length classes."""
    from audiopro_essentia_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(3)]
    rows.append((7, [1.0, 2.0, 3.0]))  # ragged: truncated upstream
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.99, n_planes=8, band_bits=2
        ).collect()
    )
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_semantic_dedup_ragged_length_row_never_dup_not_crash(spark):
    """A ragged embedding must not crash semantic_dedup (centroid
    assignment np.stack / pair-fold np.stack): it gets a NULL cluster
    assignment, never enters any pair, and comes back is_dup=False."""
    from audiopro_essentia_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(i % 4 == j) for j in range(4)]) for i in range(12)]
    rows.append((100, [1.0, 0.0, 0.0, 0.0]))  # exact dup of vec 0/4/8 class
    rows.append((200, [1.0, 0.0]))  # ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=4, iters=1, threshold=0.99).collect()
    by_id = {r.vec_id: r for r in out}
    assert set(by_id) == {r[0] for r in rows}  # no row vanishes
    assert by_id[200].is_dup is False and by_id[200].cluster_id is None
    # the genuine duplicate structure is still found
    assert any(r.is_dup for r in out)


def test_semantic_dedup_block_split_bit_identical(spark, monkeypatch):
    """r6 hot-cluster block split: splitting a cluster's pair scan into
    id-range block-pair tasks must be invisible in the OUTPUT — same
    cluster ids, same is_dup set, bit-for-bit — because every pair is
    evaluated exactly once with the identical plane-ordered IEEE fold
    (margin_cross_fold mirrors margin_pair_fold's tile loop). Forces
    nb > 1 by shrinking SEMANTIC_BLOCK_ROWS far below the cluster
    size, and compares against the unsplit run on the same frame."""
    from audiopro_essentia_spark.operators import similarity as S

    rng = np.random.RandomState(42)
    base = rng.normal(size=(150, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(150)]
    # planted near-dups: perturbed twins of every 7th row
    for i in range(0, 150, 7):
        v = base[i] + rng.normal(scale=1e-4, size=16)
        rows.append((1000 + i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def run():
        out = S.semantic_dedup(df, k=3, iters=1, threshold=0.98).collect()
        return sorted((r.vec_id, r.cluster_id, r.is_dup) for r in out)

    monkeypatch.setattr(S, "SEMANTIC_BLOCK_ROWS", 10**9)
    unsplit = run()
    monkeypatch.setattr(S, "SEMANTIC_BLOCK_ROWS", 16)  # ~9 blocks/cluster
    split = run()
    assert split == unsplit
    assert any(d for _, _, d in split)  # the planted dups are found


def test_margin_cross_fold_matches_triangle_fold():
    """Direct fold-level pin: cutting a sorted member list at any point
    and evaluating cross pairs with margin_cross_fold yields exactly
    the triangle fold's pairs for that rectangle, with bit-identical
    cosines (same plane-ordered accumulation)."""
    from audiopro_essentia_spark.operators.similarity import (
        margin_cross_fold,
        margin_pair_fold,
    )

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(400, 8))
    norms = np.linalg.norm(vecs, axis=1)
    ids = np.arange(400)
    vlist = np.empty(400, dtype=object)
    for i in range(400):
        vlist[i] = vecs[i].tolist()
    ia, ib, cos = margin_pair_fold(ids, vlist, norms, -2.0)  # keep all
    tri = {(a, b): c for a, b, c in zip(ia, ib, cos)}
    cut = 170
    ca, cb, cc = margin_cross_fold(
        vlist[:cut], norms[:cut], vlist[cut:], norms[cut:], -2.0
    )
    assert len(cc) == cut * (400 - cut)
    for a, b, c in zip(ca, cb, cc):
        assert tri[(a, cut + b)] == c  # bit-identical, not approx
