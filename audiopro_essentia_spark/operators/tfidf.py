"""TF-IDF top-terms per document — the keyword/feature-extraction step of
a text pipeline (smooth-idf formula as published in scikit-learn docs:
idf = ln((N+1)/(df+1)) + 1; independent re-implementation).

Scale design: every stage is a linear shuffle —
  tokens -> (doc, term) count        [shuffle on (doc, term)]
  -> per-term document frequency     [shuffle on term; map-side combine]
  -> score join back on term         [same key, AQE-planned]
  -> top-k per doc via row_number    [shuffle on doc]
The corpus size N is a one-row aggregate broadcast into the plan (never a
driver-side collect in the query path). Ranking orders by the ROUND-6
score (then term) so the tie-break is reproducible across engines — the
DuckDB twin ranks on the identically rounded value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import words


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, term, rank, score): the k highest-tf-idf terms per document."""
    # drop empty-string tokens (consecutive/leading/trailing spaces):
    # '' would otherwise get a df count and — sorting before every real
    # term — could claim a top-k slot on ties
    tokens = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("_tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("rank").cast("int").alias("rank"), "score")
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-trained unigram LM score per doc: avg_logloss = -mean over
    tokens of ln P(w), with P(w) = corpus count(w) / corpus tokens — the
    relational approximation of perplexity-based quality filtering (LM
    scoring as in public corpus reports, reduced to the unigram case so
    it needs NO external model: the corpus scores itself).

    High surprisal = rare-token soup (noise, boilerplate hashes); low =
    repetitive/common text. Scale shape: one (word) count aggregate with
    map-side combine, a broadcast one-row total, then a shuffle join of
    the token stream back on word and a per-doc mean — all linear."""
    tok = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("_w")
    ).where(F.col("_w") != "")
    wc = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    # total token count from the ALREADY-aggregated (tiny) word-count
    # table — summing tok again would be a third full pass over the
    # heaviest intermediate
    total = wc.agg(F.sum("_c").cast("double").alias("_n"))
    scored = tok.join(wc, "_w").crossJoin(F.broadcast(total))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(-F.avg(F.log(F.col("_c") / F.col("_n"))), 6).alias(
                "avg_logloss"
            ),
        )
    )
