"""W4-W6 — the temporal operator suite: lag/lead/rolling, forward/backward
fill, and gap-and-island sessionization.

The distributed generalization of the reference's ordered per-doc analytics:
np.diff over beat positions (/root/reference/src/audiopro/utils/audio.py:86,
controller.py:166), absent-feature-reads-as-None (models.py:62-66), and beat
segmentation (utils/audio.py:79-91) — per SURVEY.md §2.5 and the north rule.

Scale design: every operator here is a single hash-shuffle on the partition
key followed by an in-partition sort (Spark window exec); nothing collects
to the driver. For heavy keys, pre-split with skew.salted_* variants where
the semantics allow (rolling/fill require full key locality, so heavy single
keys are bounded by `max_rows_per_key` guidance instead — documented in
SKEW notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ord(order_col) -> tuple:
    return tuple(order_col) if isinstance(order_col, (list, tuple)) else (order_col,)


def _w(key_cols: list[str] | tuple[str, ...], order_col) -> Window:
    return Window.partitionBy(*key_cols).orderBy(*_ord(order_col))


def with_lag_lead(
    df: DataFrame,
    value_col: str,
    key_cols: tuple[str, ...],
    order_col: str,
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (1,),
) -> DataFrame:
    """W4: lag/lead columns `<value>_lag<k>` / `<value>_lead<k>`."""
    w = _w(key_cols, order_col)
    out = df
    for k in lags:
        out = out.withColumn(f"{value_col}_lag{k}", F.lag(value_col, k).over(w))
    for k in leads:
        out = out.withColumn(f"{value_col}_lead{k}", F.lead(value_col, k).over(w))
    return out


def with_rolling(
    df: DataFrame,
    value_col: str,
    key_cols: tuple[str, ...],
    order_col: str,
    window_rows: int,
    aggs: tuple[str, ...] = ("avg", "sum", "min", "max"),
    prefix: str | None = None,
) -> DataFrame:
    """Trailing rolling aggregates over the previous `window_rows` rows
    (inclusive of current) — the lag/lead/rolling surface of the north rule.
    Hop/window analog: window_rows=F//H reproduces the reference's
    overlapping-frame coverage at the row level."""
    if window_rows < 1:
        # rowsBetween(1, 0) is an inverted frame that fails deep in
        # Catalyst analysis with a confusing error — fail at the call site
        raise ValueError(f"window_rows must be >= 1 (got {window_rows})")
    w = _w(key_cols, order_col).rowsBetween(-(window_rows - 1), 0)
    p = prefix or f"{value_col}_roll{window_rows}"
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
           "stddev": F.stddev, "count": F.count}
    out = df
    for a in aggs:
        out = out.withColumn(f"{p}_{a}", fns[a](value_col).over(w))
    return out


def with_ffill(
    df: DataFrame,
    value_cols: tuple[str, ...],
    key_cols: tuple[str, ...],
    order_col: str,
    suffix: str = "_ffill",
) -> DataFrame:
    """W5 forward-fill: last non-null up to and including the current row
    (the 'missing feature reads as previous value' analog of
    models.py:62-66)."""
    w = _w(key_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in value_cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out


def with_bfill(
    df: DataFrame,
    value_cols: tuple[str, ...],
    key_cols: tuple[str, ...],
    order_col: str,
    suffix: str = "_bfill",
) -> DataFrame:
    """W5 backward-fill: first non-null at or after the current row."""
    w = _w(key_cols, order_col).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in value_cols:
        out = out.withColumn(c + suffix, F.first(c, ignorenulls=True).over(w))
    return out


def _gap_us(gap_seconds: float) -> int:
    """Gap threshold in integer microseconds, HALF-UP — int() truncation
    makes non-exactly-representable thresholds (e.g. 1.001 s ->
    1000999 us) split sessions whose gap EQUALS the threshold."""
    import math

    return int(math.floor(gap_seconds * 1e6 + 0.5))


def sessionize(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """W6 gap-and-island sessionization: a new session starts when the gap
    to the previous event exceeds `gap_seconds` (the distributed analog of
    beat segmentation, utils/audio.py:79-91). session_id is 0-based per key.

    Two window passes over ONE shuffle+sort: the cast-to-micros ordering
    value is materialized ONCE as a named column — ordering each window
    by the EXPRESSION hands every extracted window its own `_w0#N`
    alias, so the two Window nodes don't share a sort key and the lag
    pass and the running sum each pay a full Sort (measured: 2 Sort
    nodes before, 1 after — the with_time_rolling alias trap; this
    function's old docstring CLAIMED the sort was reused, and wasn't).

    The windows order by the same micros value the gap is measured on —
    ordering by the raw column while measuring cast values silently
    scrambles sessions for any ts representation whose raw sort is not
    chronological (e.g. numeric-epoch strings: '999999' sorts after
    '1000000'). Identical ordering for timestamp-typed input."""
    tagged = df.withColumn(
        "_sess_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    ts_us = F.col("_sess_us")
    w = Window.partitionBy(*key_cols).orderBy("_sess_us")
    prev_us = F.lag(ts_us).over(w)  # gap depends on ts only; ties => gap 0
    gap = ts_us - prev_us
    is_new = F.when(
        prev_us.isNull() | (gap > F.lit(_gap_us(gap_seconds))), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*key_cols).orderBy("_sess_us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return tagged.withColumn(session_col, F.sum(is_new).over(run) - 1).drop(
        "_sess_us"
    )


def session_stats(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Per-session aggregates: start/end/duration/event count. Partial
    aggregation (map-side combine) applies since it's a plain hash agg over
    (key, session_id)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).cast("double").alias("duration_us"),
    )


def session_tempo(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """A15/A16 analog: per key, session-start boundaries ->
    tempo = 60/median(diff(boundaries_sec)), 0.0 when <=1 boundary
    (utils/audio.py:82-89; zero-beat fallback controller.py:179-184).
    Exact median via sorted-array element_at (not percentile_approx).

    A session's start == its boundary event's own timestamp (the event
    whose lag-gap exceeds the threshold), so boundaries come straight off
    the lag pass — filter, then ONE hash agg. The previous form went
    through session_stats (groupBy (key, session_id) min(ts)) — a whole
    extra shuffle that re-derived what the lag already knew."""
    from .aggregates import tempo_from_boundaries_expr

    # order by the SAME cast-to-micros expression the gap is measured on
    # (see sessionize)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(ts_us)
    prev_us = F.lag(ts_us).over(w)
    gap = ts_us - prev_us
    boundaries = df.withColumn(
        "_is_new", prev_us.isNull() | (gap > F.lit(_gap_us(gap_seconds)))
    ).filter(F.col("_is_new"))
    bounds = boundaries.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(
                F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
            )
        ).alias("boundaries_sec"),
        F.count(F.lit(1)).alias("n_sessions"),
    )
    return bounds.withColumn(
        "tempo_analog",
        # boundaries_sec is already sorted by the aggregate's sort_array;
        # assume_sorted skips the expr's own array_sort, whose subtree
        # would otherwise be re-inlined per element (CLAUDE.md trap)
        tempo_from_boundaries_expr(F.col("boundaries_sec"), assume_sorted=True),
    )


def _bucket_of(us: Column, bucket_us: int) -> Column:
    """Exact FLOOR division of a micros BIGINT by the bucket width:
    (us - pmod(us, B)) / B — the numerator is an exact multiple of B and
    the quotient is far below 2^53, so the one double division is exact.
    A bare floor(us / B) would ride a rounded double quotient whose ulp
    closes in on 1/B as the epoch grows; pmod keeps it exact for any
    epoch (and is true floor semantics for pre-1970 negatives too)."""
    b = F.lit(bucket_us)
    return ((us - F.pmod(us, b)) / b).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key_cols: tuple[str, ...] = (),
    bucket_seconds: float = 3600.0,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Point-in-interval (range containment) join: one output row per
    (point, interval) pair with key equality and
    start <= ts <= end (inclusive bounds) — the temporal-containment
    member of the join family next to as-of (latest <=, operators/
    asof.py) and the time axis of the kernel's frequency-band
    containment (J3). The reference engine assigns each frame to its
    enclosing analysis window by direct indexing (single-process); at
    corpus scale the same containment must be a JOIN, and Spark plans a
    bare theta-join (ts BETWEEN start AND end) as BroadcastNestedLoop —
    a scan of every interval per point, quadratic at 100 TB.

    Bucket-equi-join shape instead: both sides map time onto
    bucket_seconds-wide integer buckets — points to ONE bucket,
    intervals EXPLODED to every bucket they overlap — so the pair space
    collapses to a hash equi-join on (*key_cols, bucket) whose residual
    BETWEEN runs inside the join. A matching pair meets in EXACTLY one
    bucket (the point's), so no de-duplication pass is needed — the
    explode multiplies only the interval side, by
    ceil(duration/bucket) rows. Pick bucket_seconds near the typical
    interval duration: larger buckets cut replication but admit more
    non-matching bucket-mates into the residual filter.

    Guards (the hop=0 / pack-shards discipline): bucket_seconds must be
    positive; an interval spanning > max_span_buckets buckets fails
    LOUD at execution (a malformed open-ended interval would otherwise
    silently explode the build side) — raise the cap deliberately for
    genuinely long intervals. Rows with NULL ts never match (NULL
    bucket); intervals with NULL or inverted bounds (end < start)
    contain no point by definition and are dropped, not raised — the
    well-defined containment semantics of an empty interval.

    100-TB shape: ONE hash shuffle per side on (*key_cols, bucket) —
    co-partitionable with an upstream sessionize/session_stats that
    already shuffled on the keys; never a nested-loop scan."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    if max_span_buckets < 1:
        raise ValueError(
            f"max_span_buckets must be >= 1, got {max_span_buckets}"
        )
    bucket_us = int(round(bucket_seconds * 1e6))
    if bucket_us < 1:
        raise ValueError(
            f"bucket_seconds={bucket_seconds} rounds below 1 microsecond"
        )
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pts = points.withColumn("_ivb", _bucket_of(ts_us, bucket_us))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    b0, b1 = _bucket_of(s_us, bucket_us), _bucket_of(e_us, bucket_us)
    span = b1 - b0 + 1
    guarded = F.when(
        span > F.lit(max_span_buckets),
        F.raise_error(
            F.format_string(
                "interval spans %s buckets > max_span_buckets=%s "
                "(start=%s end=%s bucket_seconds=%s)",
                span.cast("string"),
                F.lit(str(max_span_buckets)),
                F.col(start_col).cast("string"),
                F.col(end_col).cast("string"),
                F.lit(str(bucket_seconds)),
            )
        ).cast("long"),
    ).otherwise(b1)
    iv = intervals.where(
        s_us.isNotNull() & e_us.isNotNull() & (e_us >= s_us)
    ).withColumn("_ivb", F.explode(F.sequence(b0, guarded)))
    joined = pts.join(iv, [*key_cols, "_ivb"], "inner").where(
        (ts_us >= s_us) & (ts_us <= e_us)
    )
    return joined.drop("_ivb")


def with_time_rolling(
    df: DataFrame,
    value_col: str,
    key_cols: tuple[str, ...],
    ts_col: str,
    horizons_seconds: tuple[float, ...] = (3600.0,),
    aggs: tuple[str, ...] = ("count", "sum"),
    prefix: str | None = None,
) -> DataFrame:
    """Trailing TIME-range rolling aggregates as-of each row — the
    feature-store primitive the row-based with_rolling cannot express
    on irregularly spaced events: for each horizon H, aggregate the
    rows of the same key with ts in [row_ts - H, row_ts] (inclusive
    both ends, the asof_join <=-availability convention). Zero temporal
    leakage by construction: the frame's upper bound is the current
    row's timestamp.

    One hash shuffle + ONE in-partition sort serves every
    (horizon, agg) column — all windows share the same partitioning and
    the same unix_micros ordering, so Spark reuses the Exchange+Sort
    (the sessionize/silence_segments shuffle-sharing shape).

    Column naming: `<value>_<agg>_<H>s` (H as an integer second count
    when exact, else the raw float). NULL-ts rows sort into one frame
    group and poison range frames — filter them upstream (the
    sessionize NULLS FIRST/LAST cross-engine hazard); NULL values
    simply don't contribute (count counts rows via count(value) only
    when value is non-null — the SQL convention both engines share).

    Float-sum caution (the BM25/DSIR/monitor discipline): sum/avg over
    DOUBLE expose engine/partitioning-dependent accumulation order —
    for oracle-checked pipelines, round the value to an exact integer
    unit FIRST (cents, micro-units) and sum that."""
    if not horizons_seconds:
        raise ValueError("horizons_seconds must be nonempty")
    fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max,
           "avg": F.avg, "stddev": F.stddev}
    bad = [a for a in aggs if a not in fns]
    if bad:
        raise ValueError(f"unknown aggs {bad}; supported: {sorted(fns)}")
    # materialize the ordering expression ONCE as a named column:
    # ordering each window by the unix_micros EXPRESSION makes every
    # withColumn project a fresh `_w0#N` alias, so no two Window nodes
    # share a sort key — CollapseWindow can't merge them and
    # EnsureRequirements can't elide the sorts (measured: 8 Sort nodes
    # for 8 feature columns; 1 after this)
    out = df.withColumn(
        "_tr_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    for h in horizons_seconds:
        h_us = int(round(float(h) * 1e6))
        if h_us < 1:
            raise ValueError(
                f"horizon {h} s rounds below 1 microsecond"
            )
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("_tr_us")
            .rangeBetween(-h_us, 0)
        )
        label = str(int(h)) if float(h) == int(h) else str(h)
        p = prefix or value_col
        for a in aggs:
            out = out.withColumn(
                f"{p}_{a}_{label}s", fns[a](value_col).over(w)
            )
    return out.drop("_tr_us")


def funnel_steps(
    df: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Ordered funnel analysis — for each user, the timestamp at which
    each step of an ordered event-type sequence was FIRST completed,
    where step i must occur STRICTLY AFTER step i-1 (one physical event
    cannot complete two steps; two events at the same microsecond do
    not chain — the deterministic tie rule both engines agree on).
    step_1 anchors at the user's earliest step-1 event; with
    max_span_seconds set, every later step must also land within
    [step_1, step_1 + span] (the classic anchored conversion window —
    windows never re-open on a later step-1 event; re-anchoring funnels
    are a different, stateful operator).

    The greedy earliest-chain is OPTIMAL for "did the user reach depth
    d": taking the earliest valid event at each step only ever leaves
    MORE room for later steps (exchange argument), so depth here equals
    the max over all chains — no search needed.

    Scale shape: filter to the funnel's event types, then ONE hash
    shuffle on user_col into a single groupBy that collects one SORTED
    int64-micros array per step type (map-side combinable collect;
    NULL ts / NULL type rows drop at the filter). The chained
    first-after-threshold recurrence is sequential state — not
    window-expressible in one pass — but with the per-type arrays in
    hand it is a pure array expression: step_i =
    array_min(filter(t_i, t -> t > step_{i-1})), evaluated JVM-side
    with NULL propagating through the chain (no event after the
    threshold -> empty filter -> array_min NULL -> every later step
    NULL). Zero Python, k small. Per-user state is one sorted array
    per step type over that user's matching events — the same
    residency any per-user ordered analysis (sessionize's sort) has;
    cap or pre-filter bot users upstream if a key can exceed executor
    memory.

    Output: one row per user that has at least one step-1 event —
    (user, step_1_us .. step_k_us BIGINT epoch-micros, depth INT).
    Micros, not timestamps: exact integers survive every engine's
    rendering/rounding (the unix_micros twin rule)."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)}")
    if any(s is None or s == "" for s in steps):
        raise ValueError(f"steps must be non-empty strings, got {list(steps)}")
    if max_span_seconds is not None and max_span_seconds <= 0:
        raise ValueError(
            f"max_span_seconds must be > 0, got {max_span_seconds}"
        )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.where(
        F.col(type_col).isin(*steps) & us.isNotNull()
    ).select(F.col(user_col), F.col(type_col).alias("_ft"), us.alias("_us"))
    g = ev.groupBy(user_col).agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_ft") == F.lit(s), F.col("_us")))
            ).alias(f"_t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # Two hazards shape this block. (1) PySpark's HOF lambda inspection
    # counts DEFAULT parameters, so `lambda t, p=prev:` reads as 2-arg
    # and fails analysis — closure factories instead. (2) A lambda
    # referencing an OUTER expression re-inlines that expression PER
    # ELEMENT (the array_repeat rule in CLAUDE.md): filter(t_i,
    # t -> t > prev) evaluates prev's whole chained tree for every
    # element of t_i, making an l-step funnel O(prod |t_i|) per user —
    # measured 0.6 s -> 2.4 s from 3 to 4 steps at sf0.1. Route the
    # per-row scalars through zip_with(t_i, array_repeat(struct(...)))
    # so each threshold evaluates ONCE per row per mention.
    def _chained(t_arr: Column, pc: Column, span_us) -> Column:
        rep = F.array_repeat(pc, F.size(t_arr))

        def _pick(t, s):
            ok = t > s.getField("p")
            if span_us is not None:
                ok = ok & (t <= s.getField("c"))
            return F.when(ok, t)

        return F.array_min(F.zip_with(t_arr, rep, _pick))

    span_us = (
        None
        if max_span_seconds is None
        else int(round(max_span_seconds * 1e6))
    )
    cols: list[Column] = [F.array_min(F.col("_t0"))]
    for i in range(1, len(steps)):
        cap = (
            F.lit(0) if span_us is None else cols[0] + F.lit(span_us)
        )  # unused field when span_us is None
        pc = F.struct(cols[i - 1].alias("p"), cap.alias("c"))
        cols.append(_chained(F.col(f"_t{i}"), pc, span_us))
    depth = sum((c.isNotNull().cast("int") for c in cols), F.lit(0))
    return g.select(
        F.col(user_col),
        *[c.alias(f"step_{i + 1}_us") for i, c in enumerate(cols)],
        depth.alias("depth"),
    ).where(F.col("step_1_us").isNotNull())


def funnel_counts(
    df: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Per-step funnel conversion summary over funnel_steps: for each
    step index, how many users reached it (their chained step_i is
    non-NULL) and the conversion ratio vs step 1 — the number every
    funnel dashboard draws. Reached counts are nested by construction
    (step i+1 reached implies step i reached), so the unpivot emits
    exact BIGINTs and ONE double division rounded once (the exact-int
    ratio rule). Adds one tiny aggregate over funnel_steps' per-user
    frame — at most |users| rows into a k-row result."""
    fs = funnel_steps(
        df, steps, user_col=user_col, ts_col=ts_col, type_col=type_col,
        max_span_seconds=max_span_seconds,
    )
    per_step = fs.select(
        F.posexplode(
            F.array(
                *[
                    F.col(f"step_{i + 1}_us").isNotNull().cast("long")
                    for i in range(len(steps))
                ]
            )
        ).alias("_p0", "_reached")
    )
    agg = (
        per_step.select((F.col("_p0") + 1).alias("step"), "_reached")
        .groupBy("step")
        .agg(F.sum("_reached").alias("n_reached"))
    )
    total_w = Window.partitionBy()  # k-row frame: single-partition OK
    labels = F.array(*[F.lit(s) for s in steps])
    return agg.select(
        F.col("step").cast("int").alias("step"),
        F.element_at(labels, F.col("step").cast("int")).alias("step_type"),
        F.col("n_reached").cast("long").alias("n_reached"),
        F.round(
            F.col("n_reached").cast("double")
            / F.max(F.when(F.col("step") == 1, F.col("n_reached"))).over(
                total_w
            ),
            6,
        ).alias("conversion"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention grid — users are cohorted by the calendar
    period (width period_seconds, anchored at the epoch) of their FIRST
    event; a cohort's retention at offset o is how many of its users
    were active in the period o grid-steps later. The classic
    subscription/engagement analysis, computed exactly (true COUNT
    DISTINCT per cell, never a sketch — the cell counts feed ratios).

    Scale shape: the user's first period comes from a WINDOW min over
    user — not a groupBy + join-back, which scans the events twice and
    (when the per-user table outgrows broadcast) shuffles twice — so
    the corpus crosses the wire ONCE, on user; the distinct
    (user, cohort, offset) collapse reuses that same partitioning
    (subset-of-keys rule, no new exchange), and only the collapsed
    at-most-one-row-per-(user, period) stream reaches the final small
    (cohort, offset) shuffle. Cohort size rides a window over the
    final k×o grid (tiny). Period arithmetic is the exact pmod
    floor-division recipe (_bucket_of) on BIGINT micros — identical in
    the DuckDB twin, no date_trunc (engine week/tz conventions differ;
    the epoch grid is portable). NULL ts rows carry no time
    information and are dropped visibly at the filter.

    Output: (cohort_period BIGINT, period_offset BIGINT, n_active
    BIGINT, cohort_size BIGINT, retention DOUBLE round-6) — the name
    period_offset because bare `offset` is a reserved word in the twin
    engine. Offset 0 is the cohort definition itself, so retention
    there is 1.0 by construction — a cheap self-check cell."""
    if period_seconds <= 0:
        raise ValueError(f"period_seconds must be > 0, got {period_seconds}")
    period_us = int(period_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.where(us.isNotNull()).select(
        F.col(user_col), _bucket_of(us, period_us).alias("_per")
    )
    cohort = F.min("_per").over(Window.partitionBy(user_col))
    cells = (
        ev.select(
            F.col(user_col),
            cohort.alias("_cohort"),
            (F.col("_per") - cohort).alias("_off"),
        )
        .distinct()
        .groupBy("_cohort", "_off")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size_w = Window.partitionBy("_cohort")
    csize = F.max(F.when(F.col("_off") == 0, F.col("n_active"))).over(size_w)
    return cells.select(
        F.col("_cohort").cast("long").alias("cohort_period"),
        F.col("_off").cast("long").alias("period_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        csize.cast("long").alias("cohort_size"),
        F.round(F.col("n_active").cast("double") / csize, 6).alias(
            "retention"
        ),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_state: str = "__START__",
) -> DataFrame:
    """(prev, curr, cnt, prob) — the first-order Markov transition
    matrix of per-key event-type sequences: exact transition counts
    plus the row-normalized probability P(curr | prev). The
    whole-journey companion of the event-sequence family (sessionize
    bounds journeys, funnel_steps checks ONE prescribed path; this
    measures EVERY observed step). Each key's first event transitions
    from the reserved `start_state` row, so P(first event) is part of
    the same matrix.

    Determinism: events order by (epoch-micros, type) within a key — a
    total order on VALUES, so equal (ts, type) duplicates are
    interchangeable and the type-sequence (hence every count) is
    engine- and partitioning-independent. prob is ONE correctly-
    rounded IEEE division of two exact BIGINTs + round-6 — bit-stable
    cross-engine (the DSIR/BM25 integer-unit discipline).

    NULL key / ts / type fail LOUD: a silently-dropped event would
    splice its neighbours into a transition that never happened
    (pre-filter explicitly if exclusion is intended). `start_state`
    must not collide with a real event type (guarded in-plan).

    Scale shape: ONE hash exchange on the key + in-partition sort
    feeds the lag window (the sessionize shape — per-key residency is
    one user's events); then ONE map-side-combinable groupBy(prev,
    curr) onto the bounded |types|^2 pair table; row totals aggregate
    that table and broadcast back. Zero Python, no corpus-scale
    joins."""
    k0 = F.col(key_col)
    k = (
        F.when(
            k0.isNull(),
            F.raise_error(
                F.lit(f"transition_matrix: NULL {key_col}")
            ).cast("string"),
        )
        .otherwise(k0.cast("string"))
        .alias("_k")
    )
    us0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    us = (
        F.when(
            us0.isNull(),
            F.raise_error(
                F.lit(f"transition_matrix: NULL {ts_col}")
            ).cast("long"),
        )
        .otherwise(us0)
        .alias("_tm")
    )
    t0 = F.col(type_col).cast("string")
    t = (
        F.when(
            t0.isNull() | (t0 == F.lit(start_state)),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"transition_matrix: NULL or reserved {type_col}="
                    ),
                    F.coalesce(t0, F.lit("NULL")),
                )
            ).cast("string"),
        )
        .otherwise(t0)
        .alias("_t")
    )
    b = df.select(k, us, t)
    w = Window.partitionBy("_k").orderBy("_tm", "_t")
    seq = b.select(
        F.coalesce(F.lag("_t").over(w), F.lit(start_state)).alias("prev"),
        F.col("_t").alias("curr"),
    )
    # bounded |types|^2 table, two consumers (rows + totals)
    pairs = (
        seq.groupBy("prev", "curr")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = pairs.groupBy("prev").agg(F.sum("cnt").cast("long").alias("_tt"))
    return pairs.join(F.broadcast(tot), "prev").select(
        "prev",
        "curr",
        "cnt",
        F.round(F.col("cnt") / F.col("_tt"), 6).alias("prob"),
    )


def time_decayed_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    now_us: int | None = None,
    half_lives_s: tuple[int, ...] = (3600, 86400),
    value_col: str | None = None,
) -> DataFrame:
    """(key..., n_events, decay_count_<H>s..., decay_sum_<H>s...) —
    exponentially time-decayed activity features per key AS OF the
    explicit `now_us` (epoch microseconds): each event contributes
    2^(-age / half_life), so a key's decay_count_3600s is "how many
    events, recency-weighted with a 1-hour half-life" — the standard
    feature-store recency signal (a burst an hour ago and a trickle
    all week become distinguishable numbers), with one column per
    requested half-life and, when `value_col` is given, the matching
    value-weighted sums. The whole window is ONE pass and the result
    is MERGEABLE across shards/epochs at fixed now_us (sums of sums)
    — unlike with_time_rolling's per-event trailing windows, this is
    one snapshot row per key.

    `now_us` is REQUIRED and explicit (deterministic — never wall
    clock). An event AFTER now_us fails LOUD: a feature computed "as
    of now" that silently sees the future is the leakage bug
    feature-store as-of semantics exist to prevent (asof_join /
    with_time_rolling discipline); filter first if you mean it.

    Exactness: ages are exact BIGINT micros; each weight
    2^(-(age/H_us)) is ONE pow(2.0, -(dt/H)) evaluated in the same
    expression order in both engines, each per-row term rounded ONCE
    to integer micro-units and summed EXACTLY (the kl_drift micro-nat
    recipe — never an engine-order float sum); final round-6
    divisions by 1e6. NULL ts (and NULL value when value_col is set)
    fail LOUD.

    Scale shape: ONE map-side-combinable groupBy(key) aggregate —
    the cheapest possible corpus pass. Zero windows, zero joins,
    zero Python."""
    if now_us is None:
        raise ValueError(
            "time_decayed_features: now_us is required (explicit epoch "
            "micros — deterministic as-of time, never wall clock)"
        )
    if not half_lives_s or any(h <= 0 for h in half_lives_s):
        raise ValueError(
            f"time_decayed_features: half_lives_s must be positive, got "
            f"{half_lives_s}"
        )
    t0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt = (
        F.when(
            t0.isNull(),
            F.raise_error(
                F.lit(f"time_decayed_features: NULL {ts_col}")
            ).cast("long"),
        )
        .when(
            F.lit(int(now_us)).cast("long") - t0 < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "time_decayed_features: event after now_us "
                        f"(future leakage): {ts_col}="
                    ),
                    F.col(ts_col).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.lit(int(now_us)).cast("long") - t0)
    )
    cols = [dt.alias("_dt")]
    if value_col is not None:
        v0 = F.col(value_col).cast("double")
        cols.append(
            F.when(
                v0.isNull() | F.isnan(v0),
                F.raise_error(
                    F.lit(f"time_decayed_features: NULL/NaN {value_col}")
                ).cast("double"),
            )
            .otherwise(v0)
            .alias("_v")
        )
    rows = df.select(*key_cols, *cols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    outs = []
    for h in half_lives_s:
        hus = float(int(h) * 1_000_000)
        w = F.pow(F.lit(2.0), -(F.col("_dt").cast("double") / F.lit(hus)))
        aggs.append(
            F.sum(F.round(w * F.lit(1e6)).cast("long")).alias(f"_dc{h}")
        )
        outs.append((f"_dc{h}", f"decay_count_{h}s"))
        if value_col is not None:
            aggs.append(
                F.sum(
                    F.round(F.col("_v") * w * F.lit(1e6)).cast("long")
                ).alias(f"_ds{h}")
            )
            outs.append((f"_ds{h}", f"decay_sum_{h}s"))
    agg = rows.groupBy(*key_cols).agg(*aggs)
    return agg.select(
        *key_cols,
        "n_events",
        *[
            F.round(F.col(src).cast("double") / 1e6, 6).alias(dst)
            for src, dst in outs
        ],
    )


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    mu0_col: str,
    group_cols: list[str] | None = None,
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """(group..., t_us, x, s_pos, s_neg, alarm_pos, alarm_neg) — Page's
    two-sided CUSUM changepoint monitor (Page 1954) over each group's
    time series: S+_t = max(0, S+_{t-1} + x_t - mu0 - k) accumulates
    upward drift past the in-control mean `mu0_col` (a COLUMN — pass a
    literal or join a per-group baseline) with slack k, alarming when
    S+ > h; S- mirrors downward. The standard sequential drift
    detector for monitor series (daily counts per source, error rates
    per type) — one sustained shift alarms where per-point thresholds
    (drift_psi / ks_drift snapshots) stay quiet. No built-in reset:
    after an alarm S keeps accumulating (segment on the first alarm
    driver-side if repeated detection is wanted).

    Distribution shape: the recursion is evaluated through its CLOSED
    FORM S+_t = P_t - min(0, min_{j<=t} P_j) with P the running prefix
    sum of d_t = x_t - mu0_t - k — two window passes over the SAME
    named sort key (CollapseWindow merges them; one Sort), no
    sequential driver loop. Input is a MONITOR series (one row per
    group per period — thousands of rows, not a corpus): the per-group
    window residency is bounded by the series length.

    Exactness: x and mu0 micro-quantize ONCE (NULL/NaN fail LOUD); k
    and h must be non-negative 1e-6 multiples; prefix sums carry
    DECIMAL(38,0)/HUGEINT; every alarm is the EXACT integer comparison
    S_micro > h_micro — bit-stable cross-engine. Duplicate timestamps
    within a group fail LOUD (the prefix order would be
    engine-dependent); t_us is epoch micros of a timestamp ts_col or
    the integer ts_col passed through."""
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k}, h={h}")
    k_u = round(k * 1e6)
    h_u = round(h * 1e6)
    if abs(k * 1e6 - k_u) > 1e-6 or abs(h * 1e6 - h_u) > 1e-6:
        raise ValueError(f"k and h must be multiples of 1e-6: {k}, {h}")
    g = list(group_cols or [])
    d38 = "decimal(38,0)"
    dtypes = dict(df.dtypes)
    tt = dtypes.get(ts_col)
    if tt is None:
        raise ValueError(f"cusum_changepoints: unknown ts_col {ts_col!r}")
    if tt.startswith("timestamp") or tt == "date":
        t0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    elif tt in ("bigint", "int", "smallint", "tinyint"):
        t0 = F.col(ts_col).cast("long")
    else:
        raise ValueError(
            f"cusum_changepoints: ts_col must be timestamp/date/integer,"
            f" {ts_col} is {tt}"
        )
    t = (
        F.when(
            t0.isNull(),
            F.raise_error(
                F.lit(f"cusum_changepoints: NULL {ts_col}")
            ).cast("long"),
        )
        .otherwise(t0)
        .alias("_t")
    )

    def _micro(col: str, alias: str) -> Column:
        v = F.col(col).cast("double")
        return (
            F.when(
                v.isNull() | F.isnan(v),
                F.raise_error(
                    F.lit(f"cusum_changepoints: NULL/NaN {col}")
                ).cast("long"),
            )
            .otherwise(F.round(v * 1_000_000).cast("long"))
            .alias(alias)
        )

    base = df.select(*g, t, _micro(value_col, "_x"), _micro(mu0_col, "_mu"))
    w = Window.partitionBy(*g).orderBy("_t")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    dpos = (F.col("_x") - F.col("_mu") - F.lit(k_u)).cast(d38)
    dneg = (F.col("_mu") - F.lit(k_u) - F.col("_x")).cast(d38)
    staged = base.select(
        *g,
        "_t",
        "_x",
        F.sum(dpos).over(wcum).alias("_pp"),
        F.sum(dneg).over(wcum).alias("_pn"),
        # duplicate-ts guard shares the window's sort
        F.when(
            F.lag("_t").over(w) == F.col("_t"),
            F.raise_error(
                F.concat(
                    F.lit("cusum_changepoints: duplicate ts "),
                    F.col("_t").cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_z"),
    ).select(
        *g,
        "_t",
        "_x",
        "_z",
        "_pp",
        "_pn",
        F.min("_pp").over(wcum).alias("_mp"),
        F.min("_pn").over(wcum).alias("_mn"),
    )
    zero = F.lit(0).cast(d38)
    s_pos = F.col("_pp") - F.least(zero, F.col("_mp"))
    s_neg = F.col("_pn") - F.least(zero, F.col("_mn"))
    return staged.select(
        *g,
        (F.col("_t") + F.col("_z")).alias("t_us"),
        F.round(F.col("_x").cast("double") / 1e6, 6).alias("x"),
        F.round(s_pos.cast("double") / 1e6, 6).alias("s_pos"),
        F.round(s_neg.cast("double") / 1e6, 6).alias("s_neg"),
        (s_pos > F.lit(h_u).cast(d38)).cast("long").alias("alarm_pos"),
        (s_neg > F.lit(h_u).cast(d38)).cast("long").alias("alarm_neg"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., t, n_risk, n_event, n_censor, survival) — the
    Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) per group: one row per distinct duration with >= 1 observed
    event,

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    with d_i the events at t_i and n_i the at-risk count (rows with
    duration >= t_i). THE censoring-correct retention/churn curve:
    cohort_retention counts who was seen again (censored rows read as
    churn); this uses each row's observation window honestly —
    event=1 is an observed event (churn/failure), event=0 is censored
    at `duration` (still alive when observation ended, contributing
    risk-time but no event).

    Exactness: durations are exact BIGINTs (caller buckets timestamps
    — see scale note); each factor's ln((n_i - d_i)/n_i) is evaluated
    on doubles built from the exact integers in the same expression
    order both engines, rounded ONCE to integer micro-nats; the
    cumulative product is exp of the EXACT prefix sum (the kl_drift
    discipline lifted to products), one exp + round-6 per row — bit-
    stable cross-engine. A level where every at-risk row dies
    (n_i = d_i) sends S to exactly 0.0 from that level on (ln(0)
    guard, never a -inf float). NULL durations / non-0/1 event flags
    fail LOUD; negative durations fail LOUD.

    Scale shape: ONE map-side-combinable (group, duration) histogram
    corpus pass; at-risk counts come from the shared `_hist_prefix`
    below-prefix (n_risk = n - below, zero extra passes); the ln
    prefix-sum window runs over the DISTINCT-duration table — input
    durations should be bucketed (days, not micros) so that table is
    a bounded survival curve, not a corpus (the bh_fdr monitor-scale
    class). Zero Python."""
    from .evalmetrics import _hist_prefix

    g = list(group_cols or [])
    d0 = F.col(duration_col).cast("long")
    dur = (
        F.when(
            d0.isNull() | (d0 < 0),
            F.raise_error(
                F.concat(
                    F.lit(f"kaplan_meier: NULL/negative {duration_col}="),
                    F.coalesce(
                        F.col(duration_col).cast("string"), F.lit("NULL")
                    ),
                )
            ).cast("long"),
        )
        .otherwise(d0)
        .alias("_s")
    )
    e0 = F.col(event_col).cast("long")
    ev = (
        F.when(
            e0.isNull() | ~e0.isin(0, 1),
            F.raise_error(
                F.concat(
                    F.lit(f"kaplan_meier: {event_col} must be 0/1, got "),
                    F.coalesce(F.col(event_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(e0)
        .alias("_e")
    )
    per = (
        df.select(*g, dur, ev)
        .groupBy(*g, "_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("pos"),
            F.sum("_e").cast("long").alias("neg"),
        )
    )
    pre = _hist_prefix(per, g, 1024)
    tot = pre.groupBy(*g).agg(F.sum("pos").cast("long").alias("_n"))
    j = (
        pre.join(F.broadcast(tot), g)
        if g
        else pre.crossJoin(F.broadcast(tot))
    )
    n_risk = F.col("_n") - F.col("cpos")
    d = F.col("neg")
    # micro-nat ln factor; the all-die level is flagged, not ln(0)
    lnf = F.when(
        n_risk == d, F.lit(None).cast("long")
    ).otherwise(
        F.round(
            F.log(
                (n_risk - d).cast("double") / n_risk.cast("double")
            )
            * F.lit(1e6)
        ).cast("long")
    )
    lev = j.where(d > 0).select(
        *g,
        F.col("_s"),
        n_risk.alias("n_risk"),
        d.alias("n_event"),
        (F.col("pos") - d).alias("n_censor"),
        lnf.alias("_lnf"),
        F.when(n_risk == d, F.lit(1)).otherwise(F.lit(0)).alias("_dead"),
    )
    w = Window.partitionBy(*g).orderBy("_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = lev.select(
        *g,
        "_s",
        "n_risk",
        "n_event",
        "n_censor",
        F.sum("_lnf").over(w).alias("_lsum"),
        F.sum("_dead").over(w).alias("_anydead"),
    )
    return cum.select(
        *g,
        F.col("_s").alias("t"),
        "n_risk",
        "n_event",
        "n_censor",
        F.when(F.col("_anydead") > 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.col("_lsum").cast("double") / F.lit(1e6)), 6
            )
        )
        .alias("survival"),
    )


CUSUM_STATE_COLS = ("_t_last", "_pp_end", "_mp_end", "_pn_end", "_mn_end")


def cusum_epoch(
    df: DataFrame,
    prev_state: DataFrame | None,
    value_col: str,
    ts_col: str,
    mu0_col: str,
    group_cols: list[str] | None = None,
    k: float = 0.5,
    h: float = 5.0,
) -> tuple[DataFrame, DataFrame]:
    """Epoch-incremental CUSUM: (out, new_state) — the streaming
    continuation of cusum_changepoints. The batch closed form
    S_t = P_t - min(0, min_{j<=t} P_j) continues across epochs from
    FOUR exact integers per group-side: with carried (P_end, minP_end)
    an epoch's rows satisfy P_t = P_end + P_local_t and
    runmin_t = min(minP_end, P_end + runmin_local_t) — pure BIGINT
    arithmetic, so chaining epochs is EXACTLY the one-shot batch
    operator over the concatenated series (pytest-pinned through a
    real foreachBatch stream). A per-epoch restart (the naive
    recompute) instead resets S at every epoch boundary and can MISS a
    shift that straddles it — the counterexample is pinned.

    `prev_state` is the state frame returned by the previous call
    (None for the first epoch): (group..., _t_last, _pp_end, _mp_end,
    _pn_end, _mn_end). Rows at-or-before a group's carried _t_last
    fail LOUD (late/out-of-order arrivals would corrupt the carried
    prefix — the streaming_transitions watermark contract). Same
    quantization, guards and output schema as cusum_changepoints."""
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k}, h={h}")
    k_u = round(k * 1e6)
    h_u = round(h * 1e6)
    g = list(group_cols or [])
    d38 = "decimal(38,0)"
    dtypes = dict(df.dtypes)
    tt = dtypes.get(ts_col)
    if tt is None:
        raise ValueError(f"cusum_epoch: unknown ts_col {ts_col!r}")
    if tt.startswith("timestamp") or tt == "date":
        t0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:
        t0 = F.col(ts_col).cast("long")
    t = (
        F.when(
            t0.isNull(),
            F.raise_error(F.lit(f"cusum_epoch: NULL {ts_col}")).cast("long"),
        )
        .otherwise(t0)
        .alias("_t")
    )

    def _micro(col: str, alias: str) -> Column:
        v = F.col(col).cast("double")
        return (
            F.when(
                v.isNull() | F.isnan(v),
                F.raise_error(
                    F.lit(f"cusum_epoch: NULL/NaN {col}")
                ).cast("long"),
            )
            .otherwise(F.round(v * 1_000_000).cast("long"))
            .alias(alias)
        )

    base = df.select(*g, t, _micro(value_col, "_x"), _micro(mu0_col, "_mu"))
    if prev_state is None:
        st = None
    else:
        st = prev_state.select(*g, *CUSUM_STATE_COLS)
    if st is not None:
        based = (
            base.join(F.broadcast(st), on=g, how="left")
            if g
            else base.join(F.broadcast(st), F.lit(True), "left")
        )
    else:
        based = base.select(
            "*",
            F.lit(None).cast("long").alias("_t_last"),
            F.lit(None).cast(d38).alias("_pp_end"),
            F.lit(None).cast(d38).alias("_mp_end"),
            F.lit(None).cast(d38).alias("_pn_end"),
            F.lit(None).cast(d38).alias("_mn_end"),
        )
    # late-arrival guard against the carried watermark
    guarded = based.withColumn(
        "_t",
        F.when(
            F.col("_t_last").isNotNull() & (F.col("_t") <= F.col("_t_last")),
            F.raise_error(
                F.concat(
                    F.lit("cusum_epoch: out-of-order ts "),
                    F.col("_t").cast("string"),
                    F.lit(" <= carried watermark "),
                    F.col("_t_last").cast("string"),
                )
            ).cast("long"),
        ).otherwise(F.col("_t")),
    )
    w = Window.partitionBy(*g).orderBy("_t")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    dpos = (F.col("_x") - F.col("_mu") - F.lit(k_u)).cast(d38)
    dneg = (F.col("_mu") - F.lit(k_u) - F.col("_x")).cast(d38)
    p0 = F.coalesce(F.col("_pp_end"), F.lit(0).cast(d38))
    n0 = F.coalesce(F.col("_pn_end"), F.lit(0).cast(d38))
    staged = guarded.select(
        *g,
        "_t",
        "_x",
        "_pp_end",
        "_mp_end",
        "_pn_end",
        "_mn_end",
        (p0 + F.sum(dpos).over(wcum)).alias("_pp"),
        (n0 + F.sum(dneg).over(wcum)).alias("_pn"),
        F.when(
            F.lag("_t").over(w) == F.col("_t"),
            F.raise_error(
                F.concat(
                    F.lit("cusum_epoch: duplicate ts "),
                    F.col("_t").cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("_z"),
    ).select(
        *g,
        "_t",
        "_x",
        "_z",
        "_pp",
        "_pn",
        F.least(
            F.coalesce(F.col("_mp_end"), F.min("_pp").over(wcum)),
            F.min("_pp").over(wcum),
        ).alias("_mp"),
        F.least(
            F.coalesce(F.col("_mn_end"), F.min("_pn").over(wcum)),
            F.min("_pn").over(wcum),
        ).alias("_mn"),
    )
    zero = F.lit(0).cast(d38)
    s_pos = F.col("_pp") - F.least(zero, F.col("_mp"))
    s_neg = F.col("_pn") - F.least(zero, F.col("_mn"))
    out = staged.select(
        *g,
        (F.col("_t") + F.col("_z")).alias("t_us"),
        F.round(F.col("_x").cast("double") / 1e6, 6).alias("x"),
        F.round(s_pos.cast("double") / 1e6, 6).alias("s_pos"),
        F.round(s_neg.cast("double") / 1e6, 6).alias("s_neg"),
        (s_pos > F.lit(h_u).cast(d38)).cast("long").alias("alarm_pos"),
        (s_neg > F.lit(h_u).cast(d38)).cast("long").alias("alarm_neg"),
    )
    new_state = staged.groupBy(*g).agg(
        F.max("_t").cast("long").alias("_t_last"),
        F.max_by("_pp", "_t").alias("_pp_end"),
        F.min("_mp").alias("_mp_end"),
        F.max_by("_pn", "_t").alias("_pn_end"),
        F.min("_mn").alias("_mn_end"),
    )
    if st is not None:
        if g:
            # groups silent this epoch keep their carried state verbatim
            carried = st.join(new_state.select(*g), on=g, how="left_anti")
            new_state = new_state.unionByName(carried)
        else:
            # global: latest-wins fold (the new row, when it exists,
            # already folded the carried minima into its _m*_end)
            new_state = (
                new_state.unionByName(st)
                .groupBy()
                .agg(
                    *[
                        F.max_by(c, "_t_last").alias(c)
                        if c != "_t_last"
                        else F.max("_t_last").cast("long").alias(c)
                        for c in CUSUM_STATE_COLS
                    ]
                )
            )
    return out, new_state
