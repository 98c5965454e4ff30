"""Salted-key skew mitigation (SURVEY.md §4: the one physical strategy
Catalyst/AQE does not fully provide for non-join heavy keys).

The fixture corpus is 80% one `source` (FIXTURES.md §1) — a classic hot-key
shape at 100 TB. AQE splits skewed JOIN partitions, but a skewed
`groupBy(source)` still funnels one reducer; these helpers pre-split on a
salt (pmod(hash(...), k)) and re-aggregate, turning 1 hot reducer into k.

All composition is algebraic-merge aggregation (sum/count/min/max + derived
avg), so the two-level tree is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: tuple[str, ...] | None = None,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): pmod(hash(all/selected cols), k).
    Deterministic (row-content keyed), so resume/retry-safe — SURVEY.md §7(d)."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(salt_col, F.pmod(F.hash(*src), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: tuple[str, ...],
    n_salts: int = 16,
    sums: tuple[str, ...] = (),
    counts: bool = True,
    maxs: tuple[str, ...] = (),
    mins: tuple[str, ...] = (),
    salt_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Two-level aggregation: groupBy(key, salt) partial -> groupBy(key)
    final merge. Exact for sum/count/min/max and avg (sum/count)."""
    salted = with_salt(df, n_salts, salt_cols)
    partial_aggs = []
    for c in sums:
        partial_aggs.append(F.sum(c).alias(f"_sum_{c}"))
        # per-column NON-NULL count: avg = sum/n_rows diverges from SQL
        # AVG as soon as the summed column has NULLs
        partial_aggs.append(F.count(c).alias(f"_nn_{c}"))
    for c in maxs:
        partial_aggs.append(F.max(c).alias(f"_max_{c}"))
    for c in mins:
        partial_aggs.append(F.min(c).alias(f"_min_{c}"))
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("_cnt"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)

    final_aggs = []
    for c in sums:
        final_aggs.append(F.sum(f"_sum_{c}").alias(f"sum_{c}"))
        final_aggs.append(F.sum(f"_nn_{c}").alias(f"_nncnt_{c}"))
    for c in maxs:
        final_aggs.append(F.max(f"_max_{c}").alias(f"max_{c}"))
    for c in mins:
        final_aggs.append(F.min(f"_min_{c}").alias(f"min_{c}"))
    if counts:
        final_aggs.append(F.sum("_cnt").alias("n_rows"))
    out = partial.groupBy(*key_cols).agg(*final_aggs)
    for c in sums:
        # SQL-AVG semantics: sum over the per-column NON-NULL count
        # (NULL when the group has no non-null values, exactly like
        # F.avg). Unconditional: avg derives from _nncnt (always
        # computed), NOT from the counts=True row count — gating it on
        # `counts` silently dropped the documented avg columns while
        # still paying for their partial aggregates
        out = out.withColumn(
            f"avg_{c}",
            F.when(
                F.col(f"_nncnt_{c}") > 0,
                F.col(f"sum_{c}") / F.col(f"_nncnt_{c}"),
            ),
        )
    return out.drop(*[f"_nncnt_{c}" for c in sums])


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: tuple[str, ...],
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    across all salts, equi-join on (key, salt). With broadcast(small) this
    is shuffle-free; without, the salt spreads any hot key over n_salts
    reducers.

    The salt hashes the FULL row, never the join key alone — a key-derived
    salt is one constant per key, which would put every row of the hot key
    back on a single (key, salt) reducer (byte-identical duplicate rows
    still collide; that is the only residual skew)."""
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti"):
        # right/full would keep every unmatched REPLICA of a small-side
        # row: n_salts null-padded duplicates, silently wrong
        raise ValueError(
            f"salted_broadcast_join supports inner/left/semi/anti, not {how!r}"
        )
    big_s = with_salt(big, n_salts, None)
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    return big_s.join(
        F.broadcast(small_rep), [*on, "_salt"], how
    ).drop("_salt")


def capped_top_n(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    n_salts: int = 8,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-n rows per group by (order_col DESC, id_col ASC) —
    the per-domain document cap every curation pipeline applies so one
    hot domain cannot dominate the training mix.

    The naive form is one row_number window per group: a hot group (a
    domain with 10^9 docs at 100 TB) funnels through ONE reducer. Spark
    >=3.5 already softens this with WindowGroupLimit pushdown (each MAP
    partition pre-limits to its local top-n per group before the
    exchange, observed in the plan) — but the hot group's single reducer
    still receives n * num_map_partitions rows (n=1000 cap x 100k map
    partitions = 10^8 on one task). This two-phase hierarchical form
    splits that stream over n_salts reducers: phase 1 ranks within
    (group, content-hash salt) and keeps n per subgroup; phase 2 ranks
    the <= n_salts*n survivors per group (bounded, trivially small) and
    keeps the final n. The global top-n of a group is contained in the
    union of its subgroup top-n's, so the result is EXACTLY the
    single-window answer, and the (order, id) total order makes it
    deterministic — the DuckDB twin is the plain one-window QUALIFY.

    The salt is the portable content hash of id_col (not F.hash/rand):
    deterministic across engines, retries, and corpus growth."""
    from ..functions.text import portable_hash32

    order = (F.desc(order_col), F.asc(id_col))
    salt = F.pmod(portable_hash32(F.col(id_col).cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy(group_col, "_csalt").orderBy(*order)
    pre = (
        df.withColumn("_csalt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= n)
        .drop("_rk1", "_csalt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return pre.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= n
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 20,
) -> DataFrame:
    """(rank, key, cnt, share, cum_share, n_rows, n_keys, avg_per_key,
    hot_ratio) — join/aggregation KEY-SKEW profile: the measurement
    that DECIDES whether a planned shuffle needs salting (salted_agg /
    salted_broadcast_join / capped_top_n are this engine's remedies;
    this is the diagnosis). One row per top-k key by count (ties by
    key ASC — deterministic), each with its share of all rows and the
    cumulative head share; every row carries the table-level facts:
    n_rows, n_keys, avg_per_key = n_rows/n_keys, and hot_ratio =
    top-1 count / avg_per_key — the multiple of a fair reducer's load
    the hottest key imposes, i.e. the lower bound on the salt factor
    that would level it. NULL key values profile as a real level
    (rendered '__null__' — NULL keys are the classic skew accident
    and must never be dropped from a skew report); multi-column keys
    join with '|'. key_cols must be string/integer/boolean/date typed
    (fail-loud): CAST AS STRING on float/double/timestamp keys is not
    cross-engine portable (Java E-notation/tie rendering) — pre-render
    those via the SAMPLE_KEY micro-integer recipe.

    Exactness: counts are exact BIGINTs from ONE map-side-combinable
    key count; share/cum_share/avg/hot_ratio are single
    correctly-rounded divisions of exact integers with scale-0 micro
    rounding; cum_share accumulates the exact integer counts FIRST
    (a k-row window) and divides once.

    Scale shape: one (key) count shuffle (checkpointed — two
    consumers); the global top-k is TakeOrderedAndProject (never a
    full sort); the only windows run over the k returned rows; totals
    are a second fold of the SAME key-count table crossed in as a
    broadcast 1-row aggregate. Zero Python."""
    if not key_cols:
        raise ValueError("skew_profile: key_cols is required")
    if not (1 <= int(top_k) <= 10_000):
        raise ValueError(
            f"skew_profile: top_k must be in [1, 10000], got {top_k}"
        )
    # key rendering is CAST(col AS STRING), which is only cross-engine
    # byte-identical for string/integer/boolean/date keys — Spark's
    # Java float/double/timestamp rendering (E-notation thresholds,
    # tie rounding) diverges from DuckDB's, silently breaking twin
    # parity (ADVICE r4). Fractional keys must be pre-rendered by the
    # caller through the pinned SAMPLE_KEY micro-integer recipe
    # (CAST(round(CAST(x AS DOUBLE)*1e9) AS BIGINT) AS STRING) on
    # both engines; fail LOUD here rather than profile unportably.
    _ok_prefixes = ("string", "varchar", "bigint", "int", "smallint",
                    "tinyint", "boolean", "date")
    dtypes = dict(df.dtypes)
    for c in key_cols:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"skew_profile: unknown key col {c!r}")
        if not t.startswith(_ok_prefixes):
            raise ValueError(
                f"skew_profile: key col {c!r} has type {t} — only "
                "string/integer/boolean/date keys render portably; "
                "pre-render fractional or timestamp keys via the "
                "SAMPLE_KEY micro-integer recipe first"
            )
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("__null__"))
            for c in key_cols
        ],
    )
    counts = (
        df.select(key.alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)
    )
    tot = counts.groupBy().agg(
        F.sum("_c").cast("long").alias("_n_rows"),
        F.count(F.lit(1)).cast("long").alias("_n_keys"),
    )
    top = counts.orderBy(F.desc("_c"), F.asc("_k")).limit(int(top_k))
    w_rank = Window.orderBy(F.desc("_c"), F.asc("_k"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    # k rows — the single-partition windows are intentional and tiny
    ranked = top.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        F.col("_k").alias("key"),
        F.col("_c").alias("cnt"),
        F.sum("_c").over(w_cum).cast("long").alias("_cum"),
        F.max("_c")
        .over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_top1"),
    )
    out = ranked.crossJoin(F.broadcast(tot))

    def rnd(e):
        return F.round(e * F.lit(1e6)).cast("long").cast("double") / F.lit(
            1e6
        )

    avg = F.col("_n_rows").cast("double") / F.col("_n_keys").cast(
        "double"
    )
    return out.select(
        "rank",
        "key",
        "cnt",
        rnd(
            F.col("cnt").cast("double") / F.col("_n_rows").cast("double")
        ).alias("share"),
        rnd(
            F.col("_cum").cast("double") / F.col("_n_rows").cast("double")
        ).alias("cum_share"),
        F.col("_n_rows").alias("n_rows"),
        F.col("_n_keys").alias("n_keys"),
        rnd(avg).alias("avg_per_key"),
        rnd(F.col("_top1").cast("double") / avg).alias("hot_ratio"),
    )
