"""Poisson-bootstrap uncertainty for distributed aggregates.

The classic bootstrap resamples n rows WITH replacement B times — at
corpus scale that is B full shuffles of materialized resamples. The
Poisson bootstrap (Chamandy, Muralidharan, Najmi, Naidu 2012,
"Estimating Uncertainty for Massive Data Streams"; Hanley & MacGibbon
2006) replaces each row's multinomial resample count with an
independent Poisson(1) weight — for large n the replicate distribution
is indistinguishable, and every replicate becomes ONE conditional sum
in the SAME map-side-combinable aggregate pass, which is why it is the
standard map-reduce bootstrap. This adds the uncertainty tier the
point-statistics monitors (doc stats, drift, robust_stats) report
without: a confidence interval and bootstrap SE for each group mean.

Determinism (the portable-hash discipline): replicate weights are NOT
random-number-generator draws — row r's weight in replicate b is the
Poisson(1) inverse CDF evaluated at the portable 32-bit hash
u = h32(id || '|' || b) / 2^32, i.e. w = #{k : h >= T_k} with
T_k = floor(CDF_Poisson(1)(k) * 2^32) integer literals computed ONCE
driver-side — every comparison is an exact BIGINT compare, identical
in Spark and DuckDB, stable across partitionings and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32

# floor(P(Poisson(1) <= k) * 2^32) for k = 0..9; weights cap at 10
# (P(X > 9) ~ 1.1e-8 — one row in a hundred million replicates).
POISSON1_T32: tuple[int, ...] = tuple(
    int(sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1)) * 2**32)
    for k in range(10)
)

_D38 = "decimal(38,0)"


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    b_reps: int = 100,
    alpha: float = 0.05,
) -> DataFrame:
    """(group..., n, mean, se_boot, lo, hi, b_eff) — per-group mean of
    `value_col` with a Poisson-bootstrap percentile confidence interval
    and bootstrap standard error.

    Replicate b's mean is sum(w_rb * x_r) / sum(w_rb) with w_rb the
    deterministic hash-Poisson weight of (id, b); lo/hi are the
    type-1 / inverted-CDF order statistics of the replicate means at
    alpha/2 and 1 - alpha/2 (the exact_quantiles ceil-rank rule —
    ACTUAL replicate values, never an interpolation). Replicates whose
    total weight is 0 (probability e^-n — only tiny groups) are
    undefined and excluded identically in both engines; b_eff counts
    the defined ones (b_eff = 0 -> NULL se/lo/hi, b_eff = 1 -> NULL
    se, lo = hi).

    Exactness: values micro-quantize ONCE (NULL/NaN fail LOUD — a
    dropped row changes every replicate); weighted sums carry as
    DECIMAL(38,0)/HUGEINT; each replicate mean is ONE correctly-
    rounded division rounded half-away to integer micros (portable);
    the SE is sqrt((B'*Sum(m^2) - Sum(m)^2) / (B'*(B'-1))) with the
    variance numerator an EXACT integer, one division + sqrt + round-6.
    alpha/2 must be a multiple of 1e-6.

    Scale shape: ONE plain corpus pass for n/point-mean + ONE
    explode(B)-widened map-side-combinable groupBy(group, b) corpus
    pass; everything downstream lives on the bounded groups x B
    replicate table (the per-group sort is over <= b_reps values).
    Zero windows, zero Python, zero corpus-scale joins."""
    if not (2 <= b_reps <= 1000):
        raise ValueError(f"b_reps must be in [2, 1000], got {b_reps}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    q_lo_u = round(alpha / 2 * 1e6)
    if abs(alpha / 2 * 1e6 - q_lo_u) > 1e-6 or q_lo_u == 0:
        raise ValueError(
            f"alpha/2 must be a positive multiple of 1e-6, got {alpha!r}"
        )
    q_hi_u = 1_000_000 - q_lo_u
    g = list(group_cols or [])

    v0 = F.col(value_col).cast("double")
    x_u = (
        F.when(
            v0.isNull() | F.isnan(v0),
            F.raise_error(
                F.concat(
                    F.lit(f"bootstrap_ci: NULL/NaN {value_col} at {id_col}="),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(F.round(v0 * 1_000_000).cast("long"))
        .alias("_x")
    )
    rid = (
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(F.lit(f"bootstrap_ci: NULL {id_col}")).cast(
                "string"
            ),
        )
        .otherwise(F.col(id_col).cast("string"))
        .alias("_id")
    )
    base = df.select(*g, rid, x_u)

    pt = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_x").cast(_D38)).alias("_sall"),
    )

    h = portable_hash32(
        F.concat(F.col("_id"), F.lit("|"), F.col("_b").cast("string"))
    )
    w = None
    for t in POISSON1_T32:
        term = (h >= F.lit(t)).cast("long")
        w = term if w is None else w + term
    reps = base.select(
        *g,
        F.col("_id"),
        F.col("_x"),
        F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1))).alias("_b"),
    ).select(*g, "_x", "_b", w.alias("_w"))
    rb = reps.groupBy(*g, "_b").agg(
        F.sum((F.col("_w").cast(_D38) * F.col("_x").cast(_D38))).alias("_s"),
        F.sum("_w").cast("long").alias("_wt"),
    )
    means = rb.where(F.col("_wt") > 0).select(
        *g,
        F.round(
            F.col("_s").cast("double") / F.col("_wt").cast("double")
        )
        .cast("long")
        .alias("_m"),
    )
    stats = means.groupBy(*g).agg(
        F.sort_array(F.collect_list("_m")).alias("_sorted"),
        F.count(F.lit(1)).cast("long").alias("b_eff"),
        F.sum(F.col("_m").cast(_D38)).alias("_sm"),
        F.sum((F.col("_m").cast(_D38) * F.col("_m").cast(_D38))).alias(
            "_smm"
        ),
    )
    joined = (
        pt.join(stats, on=g, how="left")
        if g
        else pt.crossJoin(F.broadcast(stats))
    )
    be = F.coalesce(F.col("b_eff"), F.lit(0)).cast("long")
    rank = lambda qu: F.greatest(  # noqa: E731 — exact_quantiles ceil rank
        F.lit(1).cast("long"),
        F.expr(f"CAST((b_eff * {qu} + 999999) div 1000000 AS BIGINT)"),
    )
    var_num = (
        F.col("b_eff").cast(_D38) * F.col("_smm")
        - F.col("_sm") * F.col("_sm")
    )
    var_den = (F.col("b_eff") * (F.col("b_eff") - 1)).cast("long")
    return joined.where(F.col("n") > 0).select(
        *g,
        "n",
        F.round(
            F.col("_sall").cast("double")
            / (F.col("n") * F.lit(1_000_000)).cast("double"),
            6,
        ).alias("mean"),
        F.when(
            be > 1,
            F.round(
                F.sqrt(
                    var_num.cast("double") / var_den.cast("double")
                )
                / F.lit(1e6),
                6,
            ),
        ).alias("se_boot"),
        F.when(
            be > 0,
            F.round(
                F.element_at(F.col("_sorted"), rank(q_lo_u).cast("int"))
                .cast("double")
                / 1e6,
                6,
            ),
        ).alias("lo"),
        F.when(
            be > 0,
            F.round(
                F.element_at(F.col("_sorted"), rank(q_hi_u).cast("int"))
                .cast("double")
                / 1e6,
                6,
            ),
        ).alias("hi"),
        be.alias("b_eff"),
    )


def conformal_intervals(
    df_cal: DataFrame,
    df_new: DataFrame,
    pred_col: str,
    label_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.1,
    n_buckets: int = 1024,
) -> DataFrame:
    """(group..., id, pred, q_hat, lo, hi, n_cal) — split conformal
    prediction intervals (Vovk et al. 2005; Lei et al. JASA 2018, the
    split/inductive form): from a held-out CALIBRATION frame's
    absolute residuals |label - pred|, take

        q_hat = the r-th smallest residual,
        r = ceil((n_cal + 1) * (1 - alpha))

    and attach [pred - q_hat, pred + q_hat] to every NEW row in the
    same group. Under exchangeability this interval covers the true
    label with probability >= 1 - alpha REGARDLESS of how bad the
    underlying predictor is — the distribution-free companion of
    bootstrap_ci (which quantifies a statistic's sampling error; this
    wraps each individual prediction). The per-group split is the
    standard Mondrian/group-conditional form.

    Exactness: residuals micro-quantize ONCE (NULL/NaN pred or label
    fail LOUD — a dropped calibration row changes the rank); the rank
    is exact integer ceil arithmetic on the micro-quantized confidence
    ((n+1) * conf_u + 999999) div 1e6, and q_hat is an ACTUAL
    calibration residual selected by the exact_quantiles tie-run rule
    off the distinct-residual histogram + shared `_hist_prefix` engine
    (ninth consumer) — never an interpolation, bit-stable
    cross-engine. When r > n_cal (alpha too small for the calibration
    size — the finite-sample guarantee needs n_cal >= (1-alpha)/alpha)
    the interval is undefined: q_hat/lo/hi are NULL with n_cal
    visible. New-frame groups with NO calibration rows keep their rows
    with NULL q_hat/lo/hi and n_cal = 0 (LEFT join from the new side —
    never a silent drop). alpha must be a 1e-6 multiple in (0, 1).

    Scale shape: ONE map-side-combinable (group, residual) histogram
    pass over the calibration frame + the bounded two-phase prefix;
    the only corpus-scale join is the new-frame LEFT join onto the
    BROADCAST group-quantile table. Zero windows, zero Python."""
    from .evalmetrics import _hist_prefix  # type: ignore[attr-defined]

    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    conf_u = round((1.0 - alpha) * 1e6)
    if abs((1.0 - alpha) * 1e6 - conf_u) > 1e-6:
        raise ValueError(f"alpha must be a multiple of 1e-6, got {alpha!r}")
    g = list(group_cols or [])

    def micro(col: str, what: str):
        v = F.col(col).cast("double")
        return F.when(
            v.isNull() | F.isnan(v),
            F.raise_error(F.lit(f"conformal_intervals: NULL/NaN {what}")),
        ).otherwise(v)

    res = (
        F.round(
            F.abs(micro(label_col, label_col) - micro(pred_col, pred_col))
            * 1_000_000
        )
        .cast("long")
        .alias("_s")
    )
    per = (
        df_cal.select(*g, res)
        .groupBy(*g, "_s")
        .agg(F.count(F.lit(1)).cast("long").alias("pos"))
        .withColumn("neg", F.lit(0).cast("long"))
    )
    pre = _hist_prefix(per, g, n_buckets)
    tot = pre.groupBy(*g).agg(F.sum("pos").cast("long").alias("n_cal"))
    j = (
        pre.join(F.broadcast(tot), g)
        if g
        else pre.crossJoin(F.broadcast(tot))
    )
    r = F.expr(f"((n_cal + 1) * {conf_u} + 999999) div 1000000")
    qt = j.groupBy(*g).agg(
        F.max("n_cal").alias("n_cal"),
        F.sum(
            F.when(
                (F.col("cpos") < r)
                & (F.col("cpos") + F.col("pos") >= r),
                F.col("_s"),
            )
        )
        .cast("long")
        .alias("_q_u"),
    )
    rid = (
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(f"conformal_intervals: NULL {id_col}")
            ).cast("string"),
        )
        .otherwise(F.col(id_col).cast("string"))
        .alias("id")
    )
    p = micro(pred_col, pred_col)
    pu = F.round(p * 1_000_000).cast("long").alias("_p_u")
    new = df_new.select(*g, rid, pu)
    joined = (
        new.join(F.broadcast(qt), on=g, how="left")
        if g
        else new.join(F.broadcast(qt), F.lit(True), "left")
    )
    q_ok = F.col("_q_u").isNotNull()
    return joined.select(
        *g,
        "id",
        F.round(F.col("_p_u").cast("double") / 1e6, 6).alias("pred"),
        F.when(
            q_ok, F.round(F.col("_q_u").cast("double") / 1e6, 6)
        ).alias("q_hat"),
        F.when(
            q_ok,
            F.round(
                (F.col("_p_u") - F.col("_q_u")).cast("double") / 1e6, 6
            ),
        ).alias("lo"),
        F.when(
            q_ok,
            F.round(
                (F.col("_p_u") + F.col("_q_u")).cast("double") / 1e6, 6
            ),
        ).alias("hi"),
        F.coalesce(F.col("n_cal"), F.lit(0)).cast("long").alias("n_cal"),
    )
