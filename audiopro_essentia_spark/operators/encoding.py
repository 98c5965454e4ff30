"""Supervised categorical encodings over distributed corpora.

target_encode: smoothed mean target encoding — the standard way to
turn a million-level categorical column (url host, source domain,
author id) into ONE numeric feature: each category maps to a shrunken
estimate of its mean label,

    enc(c) = (S_c + m * prior) / (n_c + m),    prior = S / N

(m = smoothing pseudo-count: categories with few rows shrink toward
the group prior instead of memorizing noise; m = 0 is the raw mean,
m -> inf is the prior).

target_encode_loo: the leave-one-out variant for TRAINING rows — each
row's own label is excluded from its category's statistics,

    enc_i(c) = (S_c - y_i + m * prior) / (n_c - 1 + m)

which is what prevents the encoding from leaking the row's own label
into its feature (the classic target-leakage bug; a singleton
category with m = 0 has no leave-one-out estimate and yields NULL).
The prior deliberately stays the FULL group prior (documented
convention — excluding one row from a corpus-scale prior changes
nothing detectable and would cost a per-row rational).

Exactness (the DSIR/BM25/calibration integer discipline): labels
quantize ONCE to integer micro-units y_m = round(y * 1e6) (the
sample-key recipe) and both encodings are evaluated as ONE division
of two exact integers,

    enc   = (S_c * N * 1e6 + m_u * S) / (N * (n_c * 1e6 + m_u) * 1e6)
    enc_i = ((S_c - y_i) * N * 1e6 + m_u * S)
            / (N * ((n_c - 1) * 1e6 + m_u) * 1e6)

with m_u = round(m * 1e6) computed once driver-side and every product
carried as Spark DECIMAL(38,0) / DuckDB HUGEINT (exact while
S_c * N * 1e6 < 1e38 — binary labels at 1e12 rows sit near 1e30),
then ONE correctly-rounded cast-to-double division + round-6 —
bit-stable cross-engine and partitioning-free.

NULL categories and NULL/NaN labels fail LOUD (a silently-dropped row
changes every estimate in its category; pre-filter explicitly if
exclusion is intended).

Scale shape: ONE map-side-combinable groupBy(group, category)
aggregate is the only corpus-scale pass for the table form (group
totals aggregate the category table itself); the LOO form adds ONE
corpus-scale equi-join of the rows back onto the category table on
the same (group, category) key the aggregate shuffled on
(subset-of-keys clustering). Zero windows, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000
_D38 = "decimal(38,0)"


def _m_micro(m: float) -> int:
    mf = float(m)
    if not (mf >= 0.0):
        raise ValueError(f"target_encode: m must be >= 0, got {m}")
    import math

    return int(math.floor(mf * _MICRO + 0.5))


def _validated(df, cat_col, label_col, g):
    c0 = F.col(cat_col)
    c = (
        F.when(
            c0.isNull(),
            F.raise_error(
                F.lit(f"target_encode: NULL {cat_col}")
            ).cast(dict(df.dtypes)[cat_col]),
        )
        .otherwise(c0)
        .alias("_c")
    )
    y0 = F.col(label_col).cast("double")
    y = (
        F.when(
            y0.isNull() | F.isnan(y0),
            F.raise_error(
                F.concat(
                    F.lit(f"target_encode: NULL/NaN {label_col}="),
                    F.coalesce(y0.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(F.round(y0 * _MICRO).cast("long"))
        .alias("_y")
    )
    return c, y


def _cat_table(rows, g):
    """(g..., _c, n_c, _sc, _nn, _ss): the bounded category table with
    group totals attached — ONE corpus pass (totals aggregate the
    category table, not the corpus)."""
    per = rows.groupBy(*g, "_c").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("_y").cast("long").alias("_sc"),
    )
    tot = per.groupBy(*g).agg(
        F.sum("n_c").cast("long").alias("_nn"),
        F.sum("_sc").cast("long").alias("_ss"),
    )
    return (
        per.join(F.broadcast(tot), g)
        if g
        else per.crossJoin(F.broadcast(tot))
    )


def _enc_expr(sc, nc, mu):
    """One exact-integer division: (sc*N*1e6 + mu*S) / (N*(nc*1e6+mu));
    NULL when the denominator is zero (m=0 leave-one-out singleton)."""
    num = (
        sc.cast(_D38) * F.col("_nn").cast(_D38) * F.lit(_MICRO).cast(_D38)
        + F.lit(mu).cast(_D38) * F.col("_ss").cast(_D38)
    )
    den = (
        F.col("_nn").cast(_D38)
        * (nc.cast(_D38) * F.lit(_MICRO).cast(_D38) + F.lit(mu).cast(_D38))
        * F.lit(_MICRO).cast(_D38)
    )
    return F.when(
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    m: float = 20.0,
) -> DataFrame:
    """(group..., <cat_col>, n, label_mean, enc) — the smoothed
    category encoding table (module docstring). Apply to SERVING /
    held-out rows by joining on the category; training rows should use
    target_encode_loo instead."""
    mu = _m_micro(m)
    g = list(group_cols or [])
    c, y = _validated(df, cat_col, label_col, g)
    j = _cat_table(df.select(*g, c, y), g)
    return j.select(
        *g,
        F.col("_c").alias(cat_col),
        F.col("n_c").alias("n"),
        F.round(
            F.col("_sc").cast("double")
            / (F.col("n_c").cast("double") * float(_MICRO)),
            6,
        ).alias("label_mean"),
        _enc_expr(F.col("_sc"), F.col("n_c"), mu).alias("enc"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    id_cols: list[str] | None = None,
    m: float = 20.0,
) -> DataFrame:
    """(id..., group..., <cat_col>, enc_loo) — per-TRAINING-row
    leave-one-out encoding (module docstring): the row's own label is
    excluded from its category's statistics; a singleton category with
    m = 0 yields NULL enc_loo (no estimate exists)."""
    mu = _m_micro(m)
    g = list(group_cols or [])
    ids = list(id_cols or [])
    c, y = _validated(df, cat_col, label_col, g)
    rows = df.select(*ids, *g, c, y)
    cat = _cat_table(rows.select(*g, "_c", "_y"), g)
    j = rows.join(cat, [*g, "_c"])
    return j.select(
        *ids,
        *g,
        F.col("_c").alias(cat_col),
        _enc_expr(
            F.col("_sc") - F.col("_y"), F.col("n_c") - 1, mu
        ).alias("enc_loo"),
    )
