"""Model-evaluation metrics over distributed score tables.

auc_mann_whitney: exact tie-corrected ROC AUC — the calibration
primitive behind every quality-classifier threshold decision (which
cut of the fasttext-shaped quality score keeps 30% of the corpus?
what does the gopher gate's score actually separate?). AUC equals the
Mann-Whitney U statistic normalized by P*N; with ties each pos-neg
pair at the SAME score contributes 1/2, so working in doubled units
keeps everything an exact BIGINT:

    2U = SUM over distinct scores v (ascending):
             pos_v * (2 * neg_below_v + neg_v)
    auc = round(2U / (2 * P * N), 6)

— one IEEE division of two exact BIGINTs at the end (the DSIR/BM25
integer-unit discipline). Exact while 2*P*N < 2^63, i.e. up to ~2e9
rows per group.

Scale shape: the per-(group, score) histogram is ONE map-side-
combinable aggregate; the cumulative-negatives prefix is NEVER a
single-partition global window — scores are range-bucketed by a
monotone equal-width map (bounds from a 1-row-per-group min/max
aggregate) and the prefix runs two-phase exactly like epoch_shuffle
(operators/shuffle.py): per-bucket window + tiny per-group bucket
offset table broadcast back. Bucketing is order-preserving, so the
DuckDB twin is the plain one-window form with identical output.

Reference analog: the reference's monitoring aggregates grade signal
quality (aggregates.py trim stats); this grades the GRADERS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_mann_whitney(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_cols: list[str] | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """(group..., n_pos, n_neg, auc) — exact tie-corrected AUC per
    group (one global row when group_cols is None/empty).

    NULL/NaN scores and NULL/non-binary labels fail LOUD at execution
    with the offending value (silently dropping rows skews the metric
    — pre-filter explicitly if exclusion is intended; the pack_shards
    raise_error rationale). One-class groups (P == 0 or N == 0) are a
    legitimate state: auc is NULL with both counts visible."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    g = list(group_cols or [])
    y0 = F.col(label_col).cast("long")
    y = (
        F.when(
            y0.isNull() | ~y0.isin(0, 1),
            F.raise_error(
                F.concat(
                    F.lit(f"auc_mann_whitney: NULL or non-binary {label_col}="),
                    # concat of a NULL operand nulls the whole message
                    F.coalesce(F.col(label_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(y0)
        .alias("_y")
    )
    s0 = F.col(score_col).cast("double")
    s = (
        F.when(
            s0.isNull() | F.isnan(s0),
            F.raise_error(
                F.lit(f"auc_mann_whitney: NULL or NaN {score_col}")
            ).cast("double"),
        )
        .otherwise(s0)
        .alias("_s")
    )
    b = df.select(*g, s, y)
    # distinct-score histogram: ONE map-side-combinable aggregate
    per = b.groupBy(*g, "_s").agg(
        F.sum("_y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("neg"),
    )
    # two consumers below (bounds + bucket join) -> checkpoint so the
    # corpus aggregate runs once (multi-consumer recompute rule)
    perc = per.localCheckpoint(eager=False)
    bounds = perc.groupBy(*g).agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    withb = (
        perc.join(F.broadcast(bounds), g)
        if g
        else perc.crossJoin(F.broadcast(bounds))
    )
    # monotone equal-width bucket: ONLY placement, never the result —
    # any weakly-monotone map gives the same cneg (the epoch_shuffle
    # order-preserving-bucket argument), so IEEE rounding is harmless
    nb = int(n_buckets)
    wb = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col("_s") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * nb
                ),
            )
        )
        .cast("int")
    )
    bk = withb.select(*g, "_s", "pos", "neg", wb.alias("_b"))
    # phase 1: within-bucket running negatives (parallel windows)
    w_intra = Window.partitionBy(*g, "_b").orderBy("_s")
    intra = bk.withColumn("_cn", F.sum("neg").over(w_intra) - F.col("neg"))
    # phase 2: tiny (group x bucket) offset table, exclusive prefix,
    # broadcast back — never a corpus-scale global window
    totals = bk.groupBy(*g, "_b").agg(F.sum("neg").alias("_bn"))
    w_b = (
        Window.partitionBy(*g)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *g, "_b", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_off")
    )
    j = intra.join(F.broadcast(offs), [*g, "_b"])
    out = j.groupBy(*g).agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos")
            * (2 * (F.col("_off") + F.col("_cn")) + F.col("neg"))
        )
        .cast("long")
        .alias("_u2"),
    )
    return out.select(
        *g,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("_u2")
                / (F.lit(2).cast("long") * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )
