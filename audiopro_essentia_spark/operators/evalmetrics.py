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

pr_curve: the operating-point view of the same histogram — exact
(tp, fp, precision, recall) at EVERY distinct score threshold
(predict positive iff score >= v), sharing the identical prefix
machinery, so one more metric costs zero new corpus passes.

Scale shape (both): the per-(group, score) histogram is ONE map-side-
combinable aggregate; the cumulative prefixes are NEVER a single-
partition global window — scores are range-bucketed by a monotone
equal-width map (bounds from a 1-row-per-group min/max aggregate) and
the prefix runs two-phase exactly like epoch_shuffle
(operators/shuffle.py): per-bucket window + tiny per-group bucket
offset table broadcast back. Bucketing is order-preserving, so the
DuckDB twins are the plain one-window form with identical output.

Reference analog: the reference's monitoring aggregates grade signal
quality (aggregates.py trim stats); these grade the GRADERS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _score_prefix(
    df: DataFrame,
    score_col: str,
    label_col: str,
    g: list[str],
    n_buckets: int,
) -> DataFrame:
    """(g..., _s, pos, neg, cpos, cneg): the validated distinct-score
    histogram with EXCLUSIVE below-prefixes of both classes, computed
    with the two-phase bucketed prefix (docstring above). The shared
    engine of auc_mann_whitney and pr_curve."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    y0 = F.col(label_col).cast("long")
    y = (
        F.when(
            y0.isNull() | ~y0.isin(0, 1),
            F.raise_error(
                F.concat(
                    F.lit(f"evalmetrics: NULL or non-binary {label_col}="),
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
                F.lit(f"evalmetrics: NULL or NaN {score_col}")
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
    # any weakly-monotone map gives the same prefixes (the epoch_shuffle
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
    # phase 1: within-bucket running sums (parallel windows, ONE sort
    # serves both classes)
    w_intra = Window.partitionBy(*g, "_b").orderBy("_s")
    intra = bk.select(
        *g,
        "_s",
        "pos",
        "neg",
        "_b",
        (F.sum("pos").over(w_intra) - F.col("pos")).alias("_ip"),
        (F.sum("neg").over(w_intra) - F.col("neg")).alias("_in"),
    )
    # phase 2: tiny (group x bucket) offset table, exclusive prefix,
    # broadcast back — never a corpus-scale global window
    totals = bk.groupBy(*g, "_b").agg(
        F.sum("pos").alias("_bp"), F.sum("neg").alias("_bn")
    )
    w_b = (
        Window.partitionBy(*g)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *g,
        "_b",
        F.coalesce(F.sum("_bp").over(w_b), F.lit(0)).alias("_op"),
        F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_on"),
    )
    return (
        intra.join(F.broadcast(offs), [*g, "_b"])
        .select(
            *g,
            "_s",
            "pos",
            "neg",
            (F.col("_op") + F.col("_ip")).cast("long").alias("cpos"),
            (F.col("_on") + F.col("_in")).cast("long").alias("cneg"),
        )
    )


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
    g = list(group_cols or [])
    pre = _score_prefix(df, score_col, label_col, g, n_buckets)
    out = pre.groupBy(*g).agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("cneg") + F.col("neg")))
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


def pr_curve(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_cols: list[str] | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """(group..., score, tp, fp, precision, recall) — the exact
    operating point at EVERY distinct score threshold (predict
    positive iff score >= v): tp/fp are exact BIGINTs from the shared
    below-prefix histogram (tp = P - pos_below, fp = N - neg_below),
    precision = tp/(tp+fp) (the denominator counts at least the
    threshold row itself, never zero), recall = tp/P (NULL when the
    group has no positives). Two IEEE divisions + round-6 per row —
    bit-stable cross-engine. Same validation contract and scale shape
    as auc_mann_whitney; the per-group totals are one more consumer of
    the checkpointed histogram, so the corpus still gets scanned
    exactly once."""
    g = list(group_cols or [])
    pre = _score_prefix(df, score_col, label_col, g, n_buckets)
    # pre is post-checkpoint plumbing over a bounded table, but it is
    # consumed twice below (totals + rows) — checkpoint the distinct-
    # score-sized result so the prefix joins run once
    prec_df = pre.localCheckpoint(eager=False)
    tot = prec_df.groupBy(*g).agg(
        F.sum("pos").cast("long").alias("_p"),
        F.sum("neg").cast("long").alias("_n"),
    )
    j = (
        prec_df.join(F.broadcast(tot), g)
        if g
        else prec_df.crossJoin(F.broadcast(tot))
    )
    tp = (F.col("_p") - F.col("cpos")).cast("long")
    fp = (F.col("_n") - F.col("cneg")).cast("long")
    return j.select(
        *g,
        F.col("_s").alias("score"),
        tp.alias("tp"),
        fp.alias("fp"),
        F.round(tp / (tp + fp), 6).alias("precision"),
        F.when(F.col("_p") > 0, F.round(tp / F.col("_p"), 6)).alias(
            "recall"
        ),
    )
