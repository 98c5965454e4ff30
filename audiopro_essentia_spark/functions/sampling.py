"""Deterministic, portable sampling / split assignment for training-data
pipelines.

Random sampling (df.sample / sampleBy) is seed-reproducible only within one
Spark version+partitioning; corpus pipelines instead derive sampling
decisions from a CONTENT hash so that (a) reruns, backfills, and different
engines agree row-by-row, and (b) a doc's split never changes as the corpus
grows. Both helpers use the engine's portable md5-prefix hash, so every
decision has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import portable_hash32

# hash space is 32 bits; bucket to per-mille for split arithmetic
_BUCKETS = 1000


def per_mille(frac: float) -> int:
    """frac -> integer threshold in [0, 1000], HALF-UP — int(round(x))
    is banker's rounding, which silently zeroes a requested 0.0005
    (round(0.5) == 0) and makes x.5 boundaries rate-dependent. Shared by
    the operators AND the generated DuckDB twins (duck_twins.curate_sql)
    so both engines use the identical literal."""
    import math

    return int(math.floor(frac * _BUCKETS + 0.5))


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable per-mille bucket in [0, 1000) from the portable hash of
    (key || salt). Different salts give independent bucketings.

    NULL keys hash as the empty string (coalesce) so they land in a
    deterministic bucket instead of propagating NULL through the hash —
    which would silently drop them from every sample and give them no
    split at all (breaking 'exhaustive and disjoint')."""
    return F.pmod(
        portable_hash32(
            F.concat(F.coalesce(key.cast("string"), F.lit("")), F.lit(salt))
        ),
        F.lit(_BUCKETS),
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket falls
    below fraction*1000. Same rows selected on every engine and every
    rerun; sampling error is the usual binomial, selection bias is none
    (md5 is uniform over the key space)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(
        hash_bucket(F.col(key_col), salt) < F.lit(per_mille(fraction))
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: contiguous per-mille bucket
    ranges in the given order. Exhaustive and disjoint by construction;
    a key's split never changes when other rows come or go."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0 (got {total})")
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        hi = per_mille(cum)
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Pretraining mixture weights: per-source deterministic sampling
    rates (e.g. upweight wiki by keeping 100%, downsample common_crawl to
    30%). Rates are keep-fractions in [0, 1]; sources absent from `rates`
    use `default_rate`. Same content-hash mechanics as hash_sample, so a
    doc's keep decision is stable under corpus growth and engine changes
    — and exactly DuckDB-twinnable. One narrow filter, no shuffle."""
    for s, r in {**rates, "<default>": default_rate}.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    b = hash_bucket(F.col(key_col), salt)
    thresh = F.lit(per_mille(default_rate))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(source_col) == s, F.lit(per_mille(r))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    weight_col: str = "n_chars",
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    rate_col: str = "rate_pm",
) -> DataFrame:
    """Downsample each source to a target TOKEN budget — the epoch-weighting
    primitive of pretraining mixtures ("use at most B tokens of source S"),
    where doc-count rates (mixture_sample) are the wrong unit because doc
    length varies by orders of magnitude across sources.

    Two passes: (1) per-source total weight — a tiny hash agg broadcast
    back; (2) keep-rate = min(1, budget/total) quantized HALF-UP to
    per-mille, applied as the usual deterministic content-hash filter.
    Expected kept weight = budget within binomial sampling noise. Sources
    absent from `budgets` are unlimited (kept whole) — including
    NULL-source rows (the totals join is null-safe, so they flow through
    with the default rate rather than being silently dropped). An explicit
    budget of 0 drops the source entirely, even when its total weight is
    degenerate (0 or all-NULL); a POSITIVE budget over a degenerate total
    keeps the source whole (nothing to apportion — there is no meaningful
    rate, and dropping data on a bookkeeping degeneracy is the worse
    failure).

    Scale shape: this is the 10^12-row-safe form — the exact alternative
    (per-source cumulative-sum window over hash order) sorts each source's
    entire row set through one reducer chain, which a hot source breaks.
    Here the wide work is ONE map-side-combinable sum per source; the
    filter stays narrow. The rate arithmetic (floor(b*1000.0/total + 0.5),
    exact-integer operands, one IEEE division) is bit-identical in DuckDB,
    so the selection is oracle-exact despite being 'approximate' in budget.

    Output: input rows that survive, plus `rate_col` (applied per-mille
    rate) for auditability.
    """
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("_total")
    )
    budget_expr: Column | None = None
    for s, b in sorted(budgets.items()):
        c = F.col(source_col) == s
        lit = F.lit(int(b)).cast("double")
        budget_expr = (
            F.when(c, lit) if budget_expr is None else budget_expr.when(c, lit)
        )
    budget_expr = (
        budget_expr.otherwise(F.lit(None)) if budget_expr is not None
        else F.lit(None).cast("double")
    )
    rate = (
        F.when(budget_expr == F.lit(0.0), F.lit(0))
        .when(budget_expr.isNull() | (F.col("_total") <= 0), F.lit(_BUCKETS))
        .otherwise(
            F.least(
                F.lit(_BUCKETS),
                F.floor(
                    budget_expr * F.lit(float(_BUCKETS)) / F.col("_total")
                    + F.lit(0.5)
                ),
            )
        )
        .cast("long")
    )
    totals = totals.withColumnRenamed(source_col, "_src_t")
    out = (
        df.join(
            F.broadcast(totals),
            F.col(source_col).eqNullSafe(F.col("_src_t")),
        )
        .withColumn(rate_col, rate)
        .filter(hash_bucket(F.col(key_col), salt) < F.col(rate_col))
    )
    return out.drop("_total", "_src_t")


def temperature_sample(
    df: DataFrame,
    tau: float = 0.5,
    weight_col: str = "n_chars",
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    rate_col: str = "rate_pm",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-pretraining
    rebalance: sample source s proportional to share_s^tau, tau<1 pulling
    the mix toward uniform — mBERT/XLM-R exponential smoothing, public
    recipe). Where mixture_sample takes rates as INPUT, this DERIVES them
    from the corpus itself: keep-rate_s = (total_s/min_total)^(tau-1),
    normalized so the smallest source is kept whole and larger sources
    are downsampled toward the tempered share.

    Exactness across engines: the demo tau=0.5 routes through sqrt
    (IEEE-correctly-rounded in BOTH JVM and C libm) on exact
    BIGINT-to-double inputs, so the per-mille quantization
    floor(rate*1000+0.5) is bit-identical in the DuckDB twin. General tau
    uses pow(), where JVM Math.pow is only 1-ulp-bounded — documented
    hazard: a rate landing within 1 ulp of a per-mille boundary could
    round differently cross-engine (never cross-run within Spark).

    Scale shape: one map-side-combinable per-source sum + a 1-row min
    agg, both broadcast back; the keep decision is the usual narrow
    content-hash filter. NULL sources group and join null-safely (same
    rule as token_budget_sample)."""
    if tau <= 0.0 or tau > 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("_total")
    )
    # min over POSITIVE totals only; a degenerate (zero/all-NULL-weight)
    # source is kept whole — token_budget_sample's rule: there is no
    # meaningful share to temper, and dropping data on a bookkeeping
    # degeneracy is the worse failure
    mn = totals.filter(F.col("_total") > 0).agg(
        F.min("_total").alias("_min_total")
    )
    ratio = F.col("_min_total").cast("double") / F.col("_total").cast("double")
    if tau == 0.5:
        scaled = F.sqrt(ratio)  # correctly-rounded path, oracle-exact
    else:
        scaled = F.pow(ratio, F.lit(1.0 - tau))
    rates = (
        totals.crossJoin(F.broadcast(mn))
        .withColumn(
            rate_col,
            F.coalesce(
                F.when(
                    F.col("_total") > 0,
                    F.floor(
                        scaled * F.lit(float(_BUCKETS)) + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(_BUCKETS).cast("long"),
            ),
        )
        .withColumnRenamed(source_col, "_src_t")
        .select("_src_t", rate_col)
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("_src_t")),
        )
        .filter(hash_bucket(F.col(key_col), salt) < F.col(rate_col))
        .drop("_src_t")
    )


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the doc's
    near-dup CLUSTER id (docs without a near-dup candidate fall back to
    their own id), so no near-duplicate pair can ever straddle train and
    eval — the split-time complement of decontamination (a doc_id-keyed
    hash_split puts ~2*p*(1-p) of every dup pair across the boundary,
    which silently inflates eval scores).

    `clusters` is (id_col, cluster_col) as produced by
    dedup.dedup_clusters — SPARSE (only docs that have a near-dup
    candidate appear), which is what makes this scale: the join's build
    side is the dup-pair membership table (a few percent of a deduped
    corpus), broadcast at typical rates, sort-merge at worst; the split
    itself stays a narrow content-hash predicate. Output:
    (id, cluster_id, split) for EVERY input doc — exhaustive and
    disjoint, and cluster-atomic by construction."""
    cl = clusters.select(F.col(id_col), F.col(cluster_col))
    j = (
        df.select(F.col(id_col))
        .join(cl, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(cluster_col), F.col(id_col)).alias(cluster_col),
        )
    )
    return hash_split(j, weights, key_col=cluster_col, salt=salt, split_col=split_col)


# 2^52 — the largest power of two whose full integer range is exact in a
# double; 13 md5 hex chars parse to exactly this many bits on both engines
_U52_DEN = 4503599627370496.0


def priority_key(key: Column, weight: Column, salt: str = "") -> Column:
    """Duffield–Lund–Thorup priority q = w / u with u uniform in (0, 1]
    derived from the content hash (first 13 md5 hex chars = 52 exact
    bits, u = (h+1)/2^52). Every step is exact-integer arithmetic or a
    single IEEE-correctly-rounded double op (one add, two divides), so
    the priority is BIT-identical in the DuckDB twin — no pow/ln
    transcendentals whose last ulp differs across libm implementations
    (the temperature_sample pow() hazard, designed out here).

    NULL keys hash as '' (the hash_bucket rule) so a NULL-keyed row gets
    a deterministic priority instead of silently vanishing."""
    h52 = F.conv(
        F.substring(
            F.md5(F.concat(F.coalesce(key.cast("string"), F.lit("")), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h52.cast("double") + F.lit(1.0)) / F.lit(_U52_DEN)
    return weight.cast("double") / u


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    stratum_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum, with
    unbiased Horvitz–Thompson weights: priority sampling (Duffield, Lund
    & Thorup, JACM 2007). Each row gets priority w/u; the k largest
    priorities per stratum are the sample; tau = the (k+1)-th priority;
    each selected row's adjusted weight max(w, tau) makes
    sum(adj_weight) an unbiased estimator of the stratum's total weight
    (exactly total when the stratum has <= k rows, where tau = 0). This
    is the corpus-scale answer to 'give me a size-k weighted sample per
    source AND let downstream aggregates extrapolate honestly' — the
    content-hash u makes the sample reproducible across engines, reruns,
    and corpus growth (a doc's u never changes, so adding rows can only
    displace it, never re-randomize it).

    Scale shape: ONE shuffle on the stratum. rank <= k+1 on row_number
    hits Spark's WindowGroupLimit, so each map task forwards at most k+1
    rows per stratum — the shuffle carries O(partitions * k), never the
    corpus. tau then comes from a second window over the SAME
    partitioning on the already-bounded survivors (no extra exchange).

    Rows with NULL or non-positive weight are excluded up front (their
    inclusion probability is undefined); the caller sees them via the
    usual quarantine path. Output: stratum, key, weight, rank,
    priority, adj_weight."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    base = df.filter(F.col(weight_col).isNotNull() & (w > 0.0)).select(
        F.col(stratum_col).alias("stratum"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        priority_key(F.col(key_col), w, salt).alias("priority"),
    )
    win = Window.partitionBy("stratum").orderBy(
        F.col("priority").desc(), F.col("key").asc()
    )
    ranked = base.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= F.lit(k + 1)
    )
    tau = F.max(F.when(F.col("rank") == k + 1, F.col("priority"))).over(
        Window.partitionBy("stratum")
    )
    return (
        ranked.withColumn(
            "adj_weight",
            F.greatest(F.col("weight").cast("double"), F.coalesce(tau, F.lit(0.0))),
        )
        .filter(F.col("rank") <= F.lit(k))
        .select("stratum", "key", "weight", "rank", "priority", "adj_weight")
    )


def unimax_allocation(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 1,
    weight_col: str = "n_tokens",
    source_col: str = "source",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. ICLR 2023): split a total
    training-token budget across sources as UNIFORMLY as possible,
    capped at max_epochs passes over each source — the fairness fix
    for temperature sampling (which still over-weights head sources
    and over-epochs tail ones at any tau).

    The paper's sequential waterfall has a closed form this computes
    with window functions instead of a loop: sort sources by capacity
    c_g = n_g * max_epochs ascending (ties by source — a total
    order), prefix-sum S_i; source i is CAPPED iff
    c_i * (G - i + 1) <= B - S_{i-1} (cappedness is monotone along
    this order by the standard exchange argument), so the capped set
    is the largest satisfying prefix k*. Capped sources get c_i;
    the m = G - k* uncapped sources split pool = B - S_{k*} as
    share = pool div m with the remainder given to the FIRST
    pool mod m uncapped sources in the same total order (+1 never
    violates a cap: c_i > pool/m implies c_i >= share + 1). Every
    quantity is an exact BIGINT — bit-stable across engines and
    partitionings; epochs_micro = (alloc * 1e6) div n_g reports the
    resulting per-source epoch count (NULL for zero-token sources).
    If budget exceeds total capacity, every source caps and the
    slack is the caller's to see as B - sum(allocation).

    Scale shape: ONE map-side-combinable per-source sum is the only
    corpus-scale pass; everything after runs on the G-row source
    table (single-partition windows over G rows are intentional and
    tiny — the epoch_shuffle offsets-table rule). Returns
    (source, n_tokens, capacity, allocation, epochs_micro)."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    b = int(budget_tokens)
    totals = df.groupBy(source_col).agg(
        F.sum(F.coalesce(F.col(weight_col), F.lit(0)))
        .cast("long")
        .alias("n_tokens")
    )
    cap = totals.select(
        F.col(source_col).alias("source"),
        "n_tokens",
        (F.col("n_tokens") * F.lit(int(max_epochs)))
        .cast("long")
        .alias("capacity"),
    )
    # G-row table from here on — tiny single-partition windows by design
    w = Window.orderBy("capacity", "source")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cap.select(
        "source",
        "n_tokens",
        "capacity",
        F.row_number().over(w).alias("_i"),
        F.sum("capacity").over(w).alias("_s"),  # inclusive prefix S_i
        F.count(F.lit(1)).over(wall).alias("_g"),
    )
    capped = ranked.select(
        "*",
        (
            F.col("capacity") * (F.col("_g") - F.col("_i") + 1)
            <= F.lit(b) - (F.col("_s") - F.col("capacity"))
        ).alias("_capped"),
    )
    kstar = capped.select(
        "*",
        F.sum(F.when(F.col("_capped"), 1).otherwise(0))
        .over(wall)
        .alias("_k"),
        F.sum(F.when(F.col("_capped"), F.col("capacity")).otherwise(0))
        .over(wall)
        .cast("long")
        .alias("_sk"),
    )
    # share/rem only evaluate on UNCAPPED rows (CaseWhen short-circuits),
    # where m = _g - _k > 0 by definition — no ANSI div-by-zero
    share = F.expr(f"({b} - _sk) div (_g - _k)")
    rem = F.expr(f"({b} - _sk) % (_g - _k)")
    alloc = (
        F.when(F.col("_capped"), F.col("capacity"))
        .otherwise(
            share + F.when(F.col("_i") - F.col("_k") <= rem, 1).otherwise(0)
        )
        .cast("long")
    )
    out = kstar.select(
        "source",
        "n_tokens",
        "capacity",
        alloc.alias("allocation"),
    )
    return out.select(
        "source",
        "n_tokens",
        "capacity",
        "allocation",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(allocation * 1000000) div n_tokens"),
        ).alias("epochs_micro"),
    )


def backtest_folds(
    df: DataFrame,
    ts_col: str,
    origins_us: list[int],
    horizon_us: int,
    embargo_us: int = 0,
    mode: str = "expanding",
    window_us: int | None = None,
) -> DataFrame:
    """Rolling-origin backtest fold assignment with embargo (the
    time-series cross-validation counterpart of cluster_safe_split's
    cluster-atomic leakage guard; Lopez de Prado 2018's purged/
    embargoed evaluation, Tashman 2000's rolling-origin protocol):
    for each explicit origin o_f,

      train: t <= o_f                     (expanding), or
             o_f - window_us < t <= o_f   (sliding)
      test:  o_f + embargo < t <= o_f + embargo + horizon

    rows inside the embargo gap (o_f, o_f + embargo] belong to NEITHER
    — the buffer that keeps trailing-window features computed on train
    rows from overlapping the test period. Origins are REQUIRED
    explicit epoch-micros (never wall clock — the time_decayed_features
    rule); each input row is emitted once per fold it qualifies for,
    tagged (fold, role).

    Exactness: every boundary is an exact BIGINT micros comparison —
    bit-stable cross-engine; NULL ts fails LOUD (a silently dropped
    row would vanish from every fold).

    Scale shape: ZERO shuffles (plan-pinned: no Exchange) — the fold
    table is a k-element in-row literal array; each row filters it
    with a HOF over its own named micros column (the funnel lesson:
    the lambda references a NAMED column, never a chained expression)
    and explodes only its qualifying (fold, role) pairs. Row
    amplification is bounded by k (and only for qualifying rows).

    The output prepends (fold, role, t_us) to the input's own columns,
    so those three names are RESERVED: an input already containing any
    of them would emit duplicate column names that only error on a
    downstream select — fail LOUD upfront instead (ADVICE r4)."""
    if not origins_us:
        raise ValueError("backtest_folds: empty origins")
    reserved = {"fold", "role", "t_us"} & set(df.columns)
    if reserved:
        raise ValueError(
            "backtest_folds: input columns collide with reserved "
            f"output names {sorted(reserved)} — rename them first"
        )
    if sorted(set(origins_us)) != list(origins_us):
        raise ValueError("backtest_folds: origins must be sorted unique")
    if len(origins_us) > 100:
        raise ValueError("backtest_folds: > 100 folds")
    if horizon_us <= 0 or embargo_us < 0:
        raise ValueError(
            f"backtest_folds: need horizon_us > 0 and embargo_us >= 0,"
            f" got {horizon_us}, {embargo_us}"
        )
    if mode not in ("expanding", "sliding"):
        raise ValueError(f"backtest_folds: unknown mode {mode!r}")
    if mode == "sliding":
        if window_us is None or window_us <= 0:
            raise ValueError(
                "backtest_folds: sliding mode needs window_us > 0"
            )
    elif window_us is not None:
        raise ValueError(
            "backtest_folds: window_us only applies to sliding mode"
        )

    dtypes = dict(df.dtypes)
    tt = dtypes.get(ts_col)
    if tt is None:
        raise ValueError(f"backtest_folds: unknown ts_col {ts_col!r}")
    if tt.startswith("timestamp") or tt == "date":
        t0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    elif tt in ("bigint", "int", "smallint", "tinyint"):
        t0 = F.col(ts_col).cast("long")
    else:
        raise ValueError(
            f"backtest_folds: ts_col must be timestamp/date/integer,"
            f" {ts_col} is {tt}"
        )
    t = (
        F.when(
            t0.isNull(),
            F.raise_error(
                F.lit(f"backtest_folds: NULL {ts_col}")
            ).cast("long"),
        )
        .otherwise(t0)
        .alias("_t_us")
    )
    folds = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("fold"),
                F.lit(o).cast("long").alias("o"),
            )
            for i, o in enumerate(origins_us)
        ]
    )
    tc = F.col("_t_us")

    def is_train(o: Column) -> Column:
        if mode == "expanding":
            return tc <= o
        return (tc > o - F.lit(window_us)) & (tc <= o)

    def is_test(o: Column) -> Column:
        lo = o + F.lit(embargo_us)
        return (tc > lo) & (tc <= lo + F.lit(horizon_us))

    qual = F.filter(
        folds, lambda s: is_train(s["o"]) | is_test(s["o"])
    )
    base = df.select(F.struct(*df.columns).alias("_row"), t)
    out = base.select(
        "_row", "_t_us", F.explode(qual).alias("_f")
    ).select(
        F.col("_f.fold").alias("fold"),
        F.when(is_train(F.col("_f.o")), F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("role"),
        F.col("_t_us").alias("t_us"),
        F.col("_row.*"),
    )
    return out


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    seed: str = "neg0",
    n_buckets: int = 64,
) -> DataFrame:
    """(id_a, id_b, draw) — deterministic corpus-uniform NEGATIVE pair
    sampling for contrastive training (SimCLR/CLIP-style objectives,
    hard-negative mining baselines, embedding-model eval pairs): each
    anchor gets k negatives drawn uniformly from the WHOLE corpus, not
    just its mini-batch — the corpus-negative regime in-batch
    sampling approximates. Draws are pure functions of (seed, id,
    draw), so regenerating a shard, resuming, or re-running an epoch
    reproduces the same pairs (the epoch_shuffle reproducibility
    contract, which this composes): a fresh seed is a fresh
    independent draw set.

    Mechanism: epoch_shuffle(seed) assigns every row a DENSE global
    position 0..n-1 (two-phase prefix rank — no global window); each
    anchor's draw j targets position t = H32(seed ':' id '|neg|' j)
    mod n, stepping to t+1 mod n on self-collision; the pair
    materializes by an equi-join on position. Self-pairs are filtered
    (an n=1 corpus yields zero pairs); draws are with-replacement
    ACROSS j (two draws of one anchor can tie — document-level
    sampling without replacement would need a per-anchor k-permutation,
    not worth a shuffle; dedupe downstream if the objective needs it).

    Scale shape: epoch_shuffle's two corpus passes + ONE position
    equi-join probing k rows per anchor; uniform positions mean no
    skew. Zero Python; the only windows are epoch_shuffle's
    per-bucket ranks.

    Reference parity: no reference analog (the reference is
    single-corpus feature extraction); this follows the contrastive
    data-prep conventions of the public SimCLR/CLIP literature."""
    from audiopro_essentia_spark.operators.shuffle import epoch_shuffle

    if not (1 <= int(k) <= 64):
        raise ValueError(
            f"negative_samples: k must be in [1, 64], got {k}"
        )
    pos = (
        epoch_shuffle(
            df, id_col=id_col, seed=f"{seed}|order", n_buckets=n_buckets
        )
        .select(
            F.col(id_col).cast("string").alias("_id"),
            F.col("epoch_pos").alias("_pos"),
        )
        # three consumers (count, anchors, the position join build):
        # checkpoint so the rank windows run ONCE, not per branch
        .localCheckpoint(eager=False)
    )
    ntab = pos.groupBy().agg(F.count(F.lit(1)).cast("long").alias("_n"))
    anchors = (
        pos.crossJoin(F.broadcast(ntab))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_pos").alias("_pa"),
            "_n",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(k)))
            ).alias("draw"),
        )
    )
    h = portable_hash32(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("id_a"),
            F.lit("|neg|"),
            F.col("draw").cast("string"),
        )
    )
    t = F.pmod(h, F.col("_n"))
    t2 = F.pmod(
        t + F.when(t == F.col("_pa"), F.lit(1)).otherwise(F.lit(0)),
        F.col("_n"),
    )
    probes = anchors.select(
        "id_a", F.col("draw").cast("long").alias("draw"), t2.alias("_t")
    )
    joined = probes.join(
        pos.select(F.col("_id").alias("id_b"), F.col("_pos").alias("_t")),
        "_t",
    )
    return joined.where(F.col("id_b") != F.col("id_a")).select(
        "id_a", "id_b", "draw"
    )
