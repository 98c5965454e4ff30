"""End-to-end corpus curation — the training-data user story in one
composable plan: quality gate -> language filter -> exact-dup collapse ->
near-dup cluster collapse -> deterministic split assignment.

Every stage is an existing engine operator (functions/text.py,
operators/dedup.py, functions/sampling.py) composed declaratively, so
Catalyst fuses the scalar gates into ONE scan pass; only the dedup stages
shuffle (hash-agg on the md5 digest + the MinHash band join). The whole
plan is SQL-expressible, so the driver checks it value-exactly against a
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.sampling import hash_split
from ..operators import dedup as D


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    near_dup: bool = True,
    minhash_k: int = 16,
    minhash_bands: int = 4,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_intermediate: bool = False,
    max_dup_word_frac: float | None = None,
    max_surprisal: float | None = None,
    benchmark: DataFrame | None = None,
    scrub_pii: bool = False,
    max_dup_span_frac: float | None = None,
    span_words: int = 3,
) -> DataFrame:
    """Surviving docs with their curation verdicts.

    A doc survives iff: quality_score >= min_quality, predicted language in
    `langs`, it is the canonical (min-id) member of its exact-dup group,
    and (when near_dup) the canonical member of its MinHash near-dup
    cluster. Output: id_col, quality_score, lang_pred, split.

    Optional extra gates (None/absent = off, plan unchanged):
    - max_dup_word_frac: drop docs above this Gopher-style repetition
      fraction (repetition_profile join);
    - max_surprisal: drop docs whose unigram avg_logloss exceeds it
      (rare-token soup; unigram_surprisal join);
    - benchmark: drop docs sharing >=1 word 5-gram with this eval set
      (contamination_flags broadcast pass);
    - scrub_pii: redact emails/IPs/phones BEFORE everything (the scrub
      must precede dedup so redacted twins collapse; functions/pii.py) —
      folds into the same scan projection as the quality gate;
    - max_dup_span_frac: drop docs above this cross-doc duplicated-span
      ratio (duplicate_span_stats; anti-join on violators so short docs
      with no spans are KEPT, not silently dropped).

    Scale shape: the gates are narrow scan expressions; exact dedup is one
    hash-agg on a 16-byte digest; near-dup is the banded MinHash join +
    connected components over candidate pairs only (already-filtered
    corpus). Survivor selection uses broadcast anti-joins of the tiny
    non-canonical id lists where possible — at 10^12 docs the reject lists
    are data-dependent, so they flow through ordinary shuffled anti-joins
    that AQE sizes at runtime.
    """
    if scrub_pii:
        from ..functions.pii import redact_pii

        docs = docs.withColumn(text_col, redact_pii(F.col(text_col)))

    gated = docs.select(
        F.col(id_col),
        F.col(text_col),
        T.quality_score(F.col(text_col)).alias("quality_score"),
        T.lang_id(F.col(text_col)).alias("lang_pred"),
    ).filter(
        (F.col("quality_score") >= F.lit(min_quality))
        & F.col("lang_pred").isin(*langs)
    )

    # per-doc-independent gates run over the ALREADY-gated set (no point
    # exploding bigrams/shingles for docs the quality gate rejected);
    # surprisal deliberately stays corpus-wide — P(w) is a corpus
    # statistic and must not drift with the survivor subset
    if max_dup_word_frac is not None:
        from ..operators.repetition import repetition_profile

        ok = repetition_profile(gated, text_col, id_col).filter(
            F.col("dup_word_frac") <= max_dup_word_frac
        ).select(id_col)
        gated = gated.join(ok, id_col, "left_semi")
    if max_dup_span_frac is not None:
        bad = D.duplicate_span_stats(gated, text_col, id_col, span_words).filter(
            F.col("dup_ratio") > max_dup_span_frac
        ).select(id_col)
        gated = gated.join(bad, id_col, "left_anti")
    if max_surprisal is not None:
        from ..operators.tfidf import unigram_surprisal

        ok = unigram_surprisal(docs, text_col, id_col).filter(
            F.col("avg_logloss") <= max_surprisal
        ).select(id_col)
        gated = gated.join(ok, id_col, "left_semi")
    if benchmark is not None:
        from ..operators.dedup import contamination_flags

        clean = contamination_flags(gated, benchmark, text_col, id_col).filter(
            F.col("contaminated") == 0
        ).select(id_col)
        gated = gated.join(clean, id_col, "left_semi")

    # exact-dup collapse: keep min id per md5 group
    h = gated.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    canon = h.groupBy("_h").agg(F.min(id_col).alias("_keep"))
    exact_kept = h.join(canon, "_h").filter(
        F.col(id_col) == F.col("_keep")
    ).select(id_col)
    survivors = gated.join(exact_kept, id_col)
    if persist_intermediate:
        # the near-dup stage references `survivors` on BOTH sides of a
        # self-join-shaped DAG (cluster derivation + anti-join), and Spark
        # has no CTE materialization — without a persist the scan + gate
        # expressions re-run per reference. In a production pipeline this
        # boundary is a staged table write (CheckpointedWriter); for a
        # single-session query, MEMORY_AND_DISK persist is the analog.
        # Lifetime note: the cache entry lives until session end (the
        # plan is lazy, so there is no safe unpersist point here), but
        # REPEATED calls with the same input re-use the same entry —
        # Spark's cache manager matches by canonicalized plan — so it
        # does not accumulate per call.
        survivors = survivors.persist()

    if near_dup:
        # near-dup clusters over the surviving set; drop non-canonical
        clusters = D.dedup_clusters(
            survivors, text_col=text_col, id_col=id_col,
            k=minhash_k, bands=minhash_bands,
        )
        losers = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(
            id_col
        )
        survivors = survivors.join(losers, id_col, "left_anti")

    out = hash_split(
        survivors, split_weights or {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col=id_col,
    )
    return out.select(id_col, "quality_score", "lang_pred", "split")
