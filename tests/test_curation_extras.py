"""PII redaction, span-level dup profiling, and quarantined ingestion.

Deterministic hand-built fixtures with hand-computed expectations (same
strategy as test_aggregates.py: the test IS the oracle; the driver's
DuckDB twin re-verifies pii_redact/span_dedup at sf0.01).
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.functions.pii import pii_counts, redact_pii  # noqa: E402
from audiopro_essentia_spark.operators.dedup import duplicate_span_stats  # noqa: E402
from audiopro_essentia_spark.sources.ingest import (  # noqa: E402
    ingest_stats,
    read_csv_quarantine,
    read_json_quarantine,
)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_redact_pii_all_categories(spark):
    rows = [
        (1, "write to alice.smith+x@corp.example.org today"),
        (2, "server 192.168.1.200 rebooted"),
        (3, "call +1 555-123-4567 or 555 987 6543"),
        (4, "no pii here at all"),
        (5, "mixed bob@x.io from 10.0.0.1 dial 555-123-9999"),
        (6, "paren (555) 123-4567 and dotted 555.123.4567"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            *(c.alias(k) for k, c in pii_counts(F.col("t")).items()),
        ).collect()
    }
    assert out[1]["red"] == "write to <EMAIL> today"
    assert out[2]["red"] == "server <IP> rebooted"
    assert out[3]["red"] == "call <PHONE> or <PHONE>"
    assert out[4]["red"] == "no pii here at all"
    assert out[5]["red"] == "mixed <EMAIL> from <IP> dial <PHONE>"
    assert out[6]["red"] == "paren <PHONE> and dotted <PHONE>"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 2)
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1, 1)
    assert (out[6]["n_email"], out[6]["n_ipv4"], out[6]["n_phone"]) == (0, 0, 2)


def test_pii_ip_not_counted_as_phone(spark):
    # dotted quads must be redacted as IPs, never half-eaten as phones;
    # counts run on progressively-redacted text so nothing double-counts
    df = spark.createDataFrame([(1, "node 255.255.255.255 up")], ["id", "t"])
    r = df.select(
        *(c.alias(k) for k, c in pii_counts(F.col("t")).items())
    ).first()
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 1, 0)


# ---------------------------------------------------------------------------
# span-level dup stats
# ---------------------------------------------------------------------------


def test_duplicate_span_stats_hand_computed(spark):
    # spans of 2 words; "a b" and "c d" occur in BOTH doc 1 and doc 2;
    # doc 3 shares nothing; doc 4 is too short for one span (no output row)
    rows = [
        (1, "a b c d x y"),   # spans: [a b][c d][x y]
        (2, "a b c d"),       # spans: [a b][c d]
        (3, "p q r s"),       # spans: [p q][r s]
        (4, "z"),             # no full span
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(df, span_words=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (3, 2)
    assert abs(out[1]["dup_ratio"] - round(2 / 3, 6)) < 1e-9
    assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (2, 2)
    assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (2, 0)


def test_duplicate_span_stats_intra_doc_repeat_not_cross_doc(spark):
    # a span repeated WITHIN one doc is not "duplicated" (needs >=2 docs),
    # but every occurrence of a genuinely cross-doc span counts toward
    # the doc's dup-span tally
    rows = [(1, "a b a b"), (2, "c d c d"), (3, "a b e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicate_span_stats(df, span_words=2).collect()}
    assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (2, 2)  # both "a b"
    assert (out[2]["n_spans"], out[2]["n_dup_spans"]) == (2, 0)  # intra only
    assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (2, 1)


def test_duplicate_span_stats_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b x y")], ["doc_id", "text"])
    plan = duplicate_span_stats(df, span_words=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# quarantined ingestion
# ---------------------------------------------------------------------------

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_read_json_quarantine_splits_exactly(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok one"}),
        '{"doc_id": 2, "text": "broken',          # truncated JSON
        json.dumps({"doc_id": 3, "text": "ok three"}),
        "not json at all",
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_json_quarantine(spark, str(p), DOC_SCHEMA)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    assert all(r["reject_reason"] == "malformed_json" for r in bad_rows)
    assert {r["raw"] for r in bad_rows} == {'{"doc_id": 2, "text": "broken', "not json at all"}
    stats = ingest_stats(good, bad)
    assert stats == {"n_good": 2, "n_quarantined": 2, "quarantine_ratio": 0.5}


def test_read_csv_quarantine_type_mismatch(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("doc_id,text\n1,hello\nnot_a_number,world\n3,fine\n")
    good, bad = read_csv_quarantine(spark, str(p), DOC_SCHEMA)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["reject_reason"] == "malformed_csv"
    assert "not_a_number" in bad_rows[0]["raw"]


def test_ingest_requires_clean_schema(spark):
    import pytest

    with pytest.raises(ValueError):
        read_json_quarantine(
            spark,
            "/nonexistent",
            T.StructType([T.StructField("_corrupt_record", T.StringType())]),
        )


# ---------------------------------------------------------------------------
# int8 quantization + distinct profile
# ---------------------------------------------------------------------------


def test_quantize_roundtrip_error_bound(spark):
    from audiopro_essentia_spark.operators.featurize import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [3.0, 2.0, -3.0, 1.5]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, q all-zero
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = quantize_embeddings(df)
    got = {r["vec_id"]: r for r in q.collect()}
    assert got[1]["qvec"] == [64, -127, 32, 0]  # scale = 1/127
    assert got[2]["qvec"] == [127, 85, -127, 64]  # scale = 3/127
    assert got[3]["scale"] == 0.0 and got[3]["qvec"] == [0, 0, 0, 0]
    back = {
        r["vec_id"]: r["embedding"]
        for r in dequantize_embeddings(q).collect()
    }
    for vid, orig in ((1, rows[0][1]), (2, rows[1][1])):
        scale = got[vid]["scale"]
        for o, d in zip(orig, back[vid]):
            assert abs(o - d) <= scale / 2 + 1e-12


def test_quantize_plan_narrow(spark):
    from audiopro_essentia_spark.operators.featurize import quantize_embeddings

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row projection


def test_distinct_profile_approx_close_to_exact(spark):
    from audiopro_essentia_spark.operators.aggregates import distinct_profile

    rows = [
        (i, f"src{i % 3}", " ".join(f"w{(i * 7 + j) % 200}" for j in range(30)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    exact = {
        r["source"]: r["n_distinct_words"]
        for r in distinct_profile(df, exact=True).collect()
    }
    approx = {
        r["source"]: r["n_distinct_words"]
        for r in distinct_profile(df, exact=False, rsd=0.02).collect()
    }
    assert set(exact) == set(approx) == {"src0", "src1", "src2"}
    for s in exact:
        assert abs(approx[s] - exact[s]) / exact[s] < 0.1


# ---------------------------------------------------------------------------
# distributed k-means
# ---------------------------------------------------------------------------


def test_kmeans_recovers_separated_blobs(spark):
    from audiopro_essentia_spark.operators.similarity import kmeans_lite

    # three tight blobs around orthogonal axes; spherical k-means with
    # k=3 must put each blob in its own cluster after a few iterations
    rows = []
    vid = 0
    for axis in range(3):
        for j in range(8):
            v = [0.02 * ((j + d) % 5) for d in range(6)]
            v[axis * 2] = 1.0 + 0.01 * j
            rows.append((vid, axis, v))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "blob", "embedding"])
    assigned, centroids = kmeans_lite(df, k=3, iters=4)
    got = assigned.select("blob", "cluster_id").collect()
    by_blob = {}
    for r in got:
        by_blob.setdefault(r["blob"], set()).add(r["cluster_id"])
    # each blob maps to exactly one cluster, and the three are distinct
    assert all(len(cids) == 1 for cids in by_blob.values())
    assert len({next(iter(c)) for c in by_blob.values()}) == 3
    assert centroids.shape == (3, 6)


def test_kmeans_deterministic_init(spark):
    from audiopro_essentia_spark.operators.similarity import kmeans_lite

    rows = [(i, [float((i * 3 + d) % 7) for d in range(4)]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    _, c1 = kmeans_lite(df, k=4, iters=2)
    _, c2 = kmeans_lite(df, k=4, iters=2)
    assert (c1 == c2).all()


def test_kmeans_duplicate_vectors_still_k_distinct_centroids(spark):
    from audiopro_essentia_spark.operators.similarity import kmeans_lite

    # 10 copies of one vector + 3 distinct directions: the distinct-init
    # must still find 3 separate seeds (a raw sample would pick the
    # duplicated vector multiple times and never separate)
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(10)]
    rows += [(10, [0.0, 1.0, 0.0]), (11, [0.0, 0.0, 1.0]), (12, [1.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, centroids = kmeans_lite(df, k=3, iters=3)
    assert centroids.shape == (3, 3)
    # no two initial->final centroids collapsed onto the same point
    import numpy as np

    for i in range(3):
        for j in range(i + 1, 3):
            assert not np.allclose(centroids[i], centroids[j])


def test_kmeans_fails_loudly_below_k(spark):
    import pytest

    from audiopro_essentia_spark.operators.similarity import kmeans_lite

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], ["vec_id", "embedding"]
    )  # only ONE distinct vector
    with pytest.raises(ValueError, match="distinct vectors"):
        kmeans_lite(df, k=3, iters=1)
    with pytest.raises(ValueError):
        kmeans_lite(df.limit(0), k=2, iters=1)


def test_ingest_cache_false_matches_cached(spark, tmp_path):
    p = tmp_path / "nc.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nbroken line\n')
    good, bad = read_json_quarantine(spark, str(p), DOC_SCHEMA, cache=False)
    assert good.count() == 1 and bad.count() == 1


def test_distinct_profile_reports_empty_source_as_zero(spark):
    from audiopro_essentia_spark.operators.aggregates import distinct_profile

    rows = [(1, "a", "x y z"), (2, "b", ""), (3, "b", " ")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r["source"]: r for r in distinct_profile(df).collect()}
    assert got["a"]["n_distinct_words"] == 3
    # the all-empty source must APPEAR with 0, not vanish from the report
    assert got["b"]["n_docs"] == 2 and got["b"]["n_distinct_words"] == 0


def test_token_budget_sample_caps_kept_weight(spark):
    """Kept weight per capped source must land near the budget (binomial
    noise on the hash filter); uncapped sources are kept WHOLE; the
    selection is deterministic (same rows on rerun)."""
    from audiopro_essentia_spark.functions.sampling import token_budget_sample

    rows = [
        (i, "big" if i % 2 == 0 else "free", 100)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    # big: total 100k, budget 20k -> rate 200 per-mille
    out = token_budget_sample(df, {"big": 20_000})
    got = {
        r.source: r
        for r in out.groupBy("source").agg(
            F.sum("n_chars").alias("w"),
            F.count(F.lit(1)).alias("n"),
            F.max("rate_pm").alias("rate"),
        ).collect()
    }
    assert got["free"].n == 1000 and got["free"].rate == 1000  # kept whole
    assert got["big"].rate == 200
    # binomial(1000, 0.2): sd ~ 12.6 docs -> +-5 sd band on kept weight
    assert abs(got["big"].w - 20_000) < 5 * 12.65 * 100
    rerun = token_budget_sample(df, {"big": 20_000})
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in rerun.collect()
    )
    # budget >= total -> whole source kept
    whole = token_budget_sample(df, {"big": 10**9})
    assert whole.count() == 2000


def test_semantic_dedup_flags_twin_keeps_original(spark):
    """SemDeDup shape: exact-duplicate pair in one cluster -> larger id
    flagged, min id kept; far-apart vectors untouched; output covers
    every input row exactly once."""
    from audiopro_essentia_spark.operators.similarity import semantic_dedup

    rows = []
    # two tight groups along different axes + one singleton
    for i in range(4):
        rows.append((i, [1.0, 0.001 * i] + [0.0] * 6))
        rows.append((10 + i, [0.001 * i, 1.0] + [0.0] * 6))
    rows.append((99, [0.0] * 7 + [1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=3, threshold=0.999)
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 9 and out.count() == 9
    # within each tight group the min id survives, the rest are dups
    assert not got[0].is_dup and not got[10].is_dup and not got[99].is_dup
    for i in (1, 2, 3):
        # cosine of (1, .00x, ...) pairs ~ 0.9999995+ -> all collapse
        assert got[i].is_dup and got[10 + i].is_dup, i
    # dup rows share the keeper's cluster
    assert got[1].cluster_id == got[0].cluster_id


def test_bigram_surprisal_hand_computed(spark):
    """Closed-form check on a 3-doc corpus, incl. the <2-word doc
    (n_bigrams=0, NULL score)."""
    import math

    from audiopro_essentia_spark.operators.tfidf import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "a")],
        "doc_id long, text string",
    )
    # bigrams: d1: (a,b)x2 (b,a); d2: (a,b) (b,c); corpus c(a,b)=3,
    # c(b,a)=1, c(b,c)=1; unigrams c(a)=4 c(b)=3 c(c)=1; V=3; alpha=.5
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    V, al = 3.0, 0.5
    p_ab = (3 + al) / (4 + al * V)
    p_ba = (1 + al) / (3 + al * V)
    p_bc = (1 + al) / (3 + al * V)
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[1].n_bigrams == 3 and abs(got[1].avg_logloss - exp1) < 1e-6
    assert got[2].n_bigrams == 2 and abs(got[2].avg_logloss - exp2) < 1e-6
    assert got[3].n_bigrams == 0 and got[3].avg_logloss is None


def test_surprisal_mean_tie_rounding_portable(spark):
    """Regression pin for the r5 sf0.1 live mismatch: with micro-nat sum
    sm and n bigrams, -sm/(1e6 n) lands on an EXACT 6-decimal half
    whenever n | 2*sm with odd quotient (the real case: n=10,
    sm -> 3.4144135), and the engines' round(x, 6) tie rules split
    (Spark HALF_UP down-casts the sub-half double to 3.414413, DuckDB
    reads 3.414414). The shipped form — scale-0 round() on the ONE
    division -sm/n in micro units — ties away from zero in BOTH
    engines. Pin all three facts."""
    import duckdb

    # the engines AGREE on the shipped scale-0 form at the tie
    new_spark = spark.sql(
        "SELECT CAST(round(CAST(34144135 AS DOUBLE) / CAST(10 AS DOUBLE))"
        " AS BIGINT) / 1e6 AS v"
    ).collect()[0]["v"]
    new_duck = duckdb.connect().execute(
        "SELECT CAST(CAST(round(CAST(34144135 AS DOUBLE) /"
        " CAST(10 AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1e6"
    ).fetchone()[0]
    assert new_spark == new_duck == 3.414414
    # and the OLD round(x, 6) form is genuinely divergent at this value
    # (documents why the fix exists; if an engine upgrade ever makes
    # these agree, the pin below tells us the hazard class changed)
    old_spark = spark.sql(
        "SELECT round(CAST(34144135 AS DOUBLE) / 1e6 / 10, 6) AS v"
    ).collect()[0]["v"]
    old_duck = duckdb.connect().execute(
        "SELECT round(CAST(34144135 AS DOUBLE) / 1e6 / 10, 6)"
    ).fetchone()[0]
    assert old_spark == 3.414413 and old_duck == 3.414414


def test_round6_tie_mechanism_documented(spark):
    """Documentation pin refining the CLAUDE.md round-6 tie audit with
    the MEASURED divergence mechanism: Spark round(x, 6) rounds the
    double's EXACT decimal value HALF_UP, while DuckDB's scale-6 round
    goes through a x*1e6 double multiply — so:

    (a) at an exactly-representable binary half (1/128 = 0.0078125,
        the jaccard/reciprocal-rank denominator class) BOTH engines
        see the true half and BOTH round away from zero -> AGREE;
    (b) the divergent class is NON-representable near-halves from
        arbitrary-count ratios (34144135/(1e6*10) -> double just under
        the half: Spark's exact-decimal view rounds DOWN while
        DuckDB's multiply lands exactly on 3414413.5 and rounds UP —
        the live bigram_surprisal split, pinned in
        test_surprisal_mean_tie_rounding_portable).

    Consequence for the audit: binary-rational ratio sites are safe;
    only arbitrary-count-denominator sites carry the (twin-parity-
    only) limitation. If an engine upgrade changes this pin, re-run
    the audit."""
    import duckdb

    s6 = spark.sql(
        "SELECT round(CAST(1 AS DOUBLE) / CAST(128 AS DOUBLE), 6) AS v"
    ).collect()[0]["v"]
    d6 = duckdb.connect().execute(
        "SELECT round(CAST(1 AS DOUBLE) / CAST(128 AS DOUBLE), 6)"
    ).fetchone()[0]
    assert s6 == d6 == 0.007813  # representable half: both away, agree
    sm = spark.sql(
        "SELECT CAST(round(CAST(1 AS DOUBLE) / CAST(128 AS DOUBLE) * 1e6)"
        " AS BIGINT) / 1e6 AS v"
    ).collect()[0]["v"]
    dm = duckdb.connect().execute(
        "SELECT CAST(CAST(round(CAST(1 AS DOUBLE) / CAST(128 AS DOUBLE)"
        " * 1e6) AS BIGINT) AS DOUBLE) / 1e6"
    ).fetchone()[0]
    assert sm == dm == 0.007813  # the portable recipe agrees too


def test_quality_classifier_deterministic_and_bounded(spark):
    """Hashed linear classifier: scores in (0,1), deterministic across
    runs, 0.5 exactly for empty text (zero feature vector), and sensitive
    to content (different docs -> different scores in general)."""
    from audiopro_essentia_spark.functions.text import (
        classifier_weights,
        quality_classifier_score,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zxq9 qq11 blorp"), (3, ""), (4, "the the the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", quality_classifier_score(F.col("text")).alias("s")
    ).collect()}
    assert all(0.0 < v < 1.0 for v in out.values())
    assert out[3] == 0.5  # empty -> z = 0 -> sigmoid = 0.5
    rerun = {r.doc_id: r.s for r in df.select(
        "doc_id", quality_classifier_score(F.col("text")).alias("s")
    ).collect()}
    assert out == rerun
    assert len(set(out.values())) >= 3  # not a constant function
    # weights are seeded-stable (the oracle embeds them as literals)
    assert classifier_weights() == classifier_weights()


def test_token_budget_sample_null_source_and_zero_budget(spark):
    """The degenerate branches: NULL-source rows are 'absent from budgets'
    and must be kept WHOLE (null-safe totals join — a plain equi-join
    silently drops them); budget==0 drops the source entirely, even when
    its total weight is degenerate (0 / all-NULL, where the old code kept
    it whole via the total<=0 guard); a POSITIVE budget over a degenerate
    total keeps the source whole."""
    from audiopro_essentia_spark.functions.sampling import token_budget_sample

    rows = (
        [(i, None, 100) for i in range(50)]            # NULL source
        + [(100 + i, "zeroed", 0) for i in range(50)]  # budget 0, total 0
        + [(200 + i, "dud", None) for i in range(50)]  # budget >0, all-NULL
        + [(300 + i, "plain", 100) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    out = token_budget_sample(df, {"zeroed": 0, "dud": 1000})
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got.get(None) == 50        # NULL source kept whole, not dropped
    assert "zeroed" not in got        # budget 0 wins over degenerate total
    assert got.get("dud") == 50       # positive budget, nothing to apportion
    assert got.get("plain") == 50
    assert {r.rate_pm for r in out.filter(F.col("source").isNull()).collect()} == {1000}
