"""Causal effect estimation from observational data.

ab_welch_test compares two cohorts AS ASSIGNED — valid for randomized
experiments. When treatment was NOT randomized (rollouts gated on
usage, opt-in features), the naive difference is confounded; inverse
propensity weighting (Horvitz-Thompson 1952; Hajek's self-normalized
form; Rosenbaum & Rubin 1983) reweights each arm by 1/P(assignment |
covariates) so both arms represent the same population:

    ATE = sum_T (y/e) / sum_T (1/e)  -  sum_C (y/(1-e)) / sum_C (1/(1-e))

The propensity e is an input column (from any upstream model — the
engine's target_encode/ols/encoding tier, or an external fit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def ate_ipw(
    df: DataFrame,
    outcome_col: str,
    treat_col: str,
    propensity_col: str,
    group_cols: list[str] | None = None,
    trim: float = 0.0,
) -> DataFrame:
    """(group..., n_t, n_c, n_trimmed, mu_t, mu_c, ate, ess_t, ess_c)
    — Hajek self-normalized IPW average treatment effect per group,
    with Kish effective sample sizes per weighted arm (the
    weight_diagnostics health check applied where it matters most:
    ess_t << n_t means a few extreme propensities own the estimate).

    `trim` (overlap trimming, Crump et al. 2009): rows with e outside
    [trim, 1 - trim] are EXCLUDED and counted in n_trimmed — an exact
    integer micro comparison, never a silent clamp (clamping changes
    the estimand silently; exclusion is visible). trim must be a
    1e-6 multiple in [0, 0.5).

    Exactness: y micro-quantizes ONCE; each row's weight 1/e (treated)
    or 1/(1-e) (control) is ONE correctly-rounded IEEE division of the
    input double rounded half-away to integer micro-units — identical
    cross-engine; weighted sums and squares carry DECIMAL(38,0)/
    HUGEINT; each arm mean is one correctly-rounded division of exact
    integers; ate = mu_t - mu_c on the round-6 outputs. NULL/NaN
    outcome, propensity outside (0, 1), or a treat value not in {0, 1}
    fail LOUD. Arms with no rows give NULL means/ate with counts
    visible.

    Scale shape: ONE map-side-combinable groupBy(group) corpus pass —
    zero windows, zero joins, zero Python."""
    t_u = round(trim * 1e6)
    if abs(trim * 1e6 - t_u) > 1e-6 or not (0.0 <= trim < 0.5):
        raise ValueError(
            f"ate_ipw: trim must be a 1e-6 multiple in [0, 0.5), got {trim!r}"
        )
    g = list(group_cols or [])
    y0 = F.col(outcome_col).cast("double")
    y = (
        F.when(
            y0.isNull() | F.isnan(y0),
            F.raise_error(
                F.lit(f"ate_ipw: NULL/NaN {outcome_col}")
            ).cast("long"),
        )
        .otherwise(F.round(y0 * 1_000_000).cast("long"))
        .alias("_y")
    )
    tr0 = F.col(treat_col).cast("long")
    tr = (
        F.when(
            tr0.isNull() | ~tr0.isin(0, 1),
            F.raise_error(
                F.concat(
                    F.lit(f"ate_ipw: {treat_col} must be 0/1, got "),
                    F.coalesce(F.col(treat_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(tr0)
        .alias("_t")
    )
    e0 = F.col(propensity_col).cast("double")
    e = (
        F.when(
            e0.isNull() | F.isnan(e0) | (e0 <= 0) | (e0 >= 1),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ate_ipw: {propensity_col} must be in (0, 1), got "
                    ),
                    F.coalesce(e0.cast("string"), F.lit("NULL")),
                )
            ).cast("double"),
        )
        .otherwise(e0)
        .alias("_e")
    )
    base = df.select(*g, y, tr, e)
    eu = F.round(F.col("_e") * 1_000_000).cast("long")
    kept = (eu >= F.lit(t_u)) & (eu <= F.lit(1_000_000 - t_u))
    # per-row micro weight: one correctly-rounded division + half-away
    w = F.round(
        F.lit(1e6)
        / F.when(F.col("_t") == 1, F.col("_e")).otherwise(
            F.lit(1.0) - F.col("_e")
        )
    ).cast("long")
    staged = base.select(
        *g,
        "_y",
        "_t",
        kept.alias("_k"),
        F.when(kept, w).alias("_w"),
    )

    def arm(t: int, tag: str):
        m = (F.col("_t") == t) & F.col("_k")
        wc = F.when(m, F.col("_w"))
        return [
            F.sum(m.cast("long")).cast("long").alias(f"n_{tag}"),
            F.sum(wc.cast(_D38)).alias(f"_w{tag}"),
            F.sum((wc.cast(_D38) * F.col("_y").cast(_D38))).alias(
                f"_wy{tag}"
            ),
            F.sum((wc.cast(_D38) * wc.cast(_D38))).alias(f"_ww{tag}"),
        ]

    agg = staged.groupBy(*g).agg(
        *arm(1, "t"),
        *arm(0, "c"),
        F.sum((~F.col("_k")).cast("long")).cast("long").alias("n_trimmed"),
    )

    def mu(tag: str):
        return F.when(
            F.col(f"n_{tag}") > 0,
            F.round(
                F.col(f"_wy{tag}").cast("double")
                / F.col(f"_w{tag}").cast("double")
                / F.lit(1e6),
                6,
            ),
        )

    def ess(tag: str):
        wsum, wsq = F.col(f"_w{tag}"), F.col(f"_ww{tag}")
        return F.when(
            F.col(f"n_{tag}") > 0,
            F.round(
                (wsum * wsum).cast("double") / wsq.cast("double"), 6
            ),
        )

    both = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    return agg.where((F.col("n_t") + F.col("n_c") + F.col("n_trimmed")) > 0).select(
        *g,
        "n_t",
        "n_c",
        "n_trimmed",
        mu("t").alias("mu_t"),
        mu("c").alias("mu_c"),
        F.when(both, F.round(mu("t") - mu("c"), 6)).alias("ate"),
        ess("t").alias("ess_t"),
        ess("c").alias("ess_c"),
    )
