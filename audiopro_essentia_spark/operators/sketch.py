"""Deterministic mergeable sketches over a portable hash — HyperLogLog
(cardinality) and Count-Min (frequency).

The missing sketch family for a 100-TB curation pipeline: exact
`COUNT(DISTINCT)` over web-scale token streams needs a full shuffle of
every distinct value; an HLL register table is a few KB per group and
merges associatively (register-wise max), so per-shard sketches union
without re-reading data — the standard cardinality monitor shape
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm"; the reference engine has no sketch
surface, this extends it for pipeline monitoring).

Determinism contract (what makes this oracle-checkable, unlike the
builtin approx_count_distinct whose relativeSD path is engine-private):
- hash = portable md5-derived 32-bit value (functions.text.portable_hash32,
  byte-identical in DuckDB via ('0x'||substr(md5(x),1,8))::BIGINT),
- register index / remainder via exact integer shift/mask,
- rho (leading-zero rank) via the binary-string length of the remainder
  (`bin()` exists in BOTH engines; no float log2 near powers of two),
- the harmonic sum Σ 2^-M_j is a sum of dyadic rationals with common
  denominator 2^(32-p) over ≤ 2^p registers — every partial sum is EXACT
  in f64 (numerator < 2^53), so the estimate is independent of engine
  accumulation order. The only transcendental is the single ln() of the
  linear-counting branch, absorbed by round-6.

32-bit hash note: fine to ~10^8 distincts (the classic HLL32 regime); at
full 100-TB vocabulary scale swap in the 64-bit variant (two md5 halves,
same recipe) — the register algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32


def _rho(rem: Column, width: int) -> Column:
    """1 + leading zeros of `rem` as a `width`-bit value, exactly:
    bit_length(rem) = length(bin(rem)) for rem >= 1 (bin() emits no
    leading zeros); rem == 0 -> all-zero remainder -> width + 1."""
    return (
        F.when(rem == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rem)))
        .cast("int")
    )


def cms_registers(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
    d: int = 4,
    w: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min Sketch register table: (grp, row_j, col, cnt) — the
    mergeable FREQUENCY companion of hll_registers (cardinality). Each
    occurrence of `value` adds its weight (default 1) to counter
    (j, h_j(value) mod w) for j in 0..d-1; estimates are one-sided
    (never under the true count — Cormode & Muthukrishnan 2005, "An
    improved data stream summary: the count-min sketch and its
    applications").

    Scale shape: the d-row expansion happens BEFORE the hash aggregate,
    so Spark's map-side partial aggregation collapses each task's
    contribution to <= n_groups*d*w rows — the only shuffle carries
    bounded sketch state, never the vocabulary (contrast an exact
    per-word count: a full-vocab shuffle at 100 TB). Sketches from
    disjoint shards/epochs merge by register-wise SUM (counts are
    linear), so per-shard sketches union without re-reading data.

    Determinism: h_j = portable 32-bit md5 of `j || ':' || value`
    (byte-identical in DuckDB), column via integer mod — every register
    is an exact BIGINT; no float enters the sketch at all.

    NULL values are IGNORED (the hll_registers contract): a NULL
    occurrence is not a countable item, and md5(NULL) would silently
    drop the row anyway — filtered explicitly so the semantics are
    declared, not incidental."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2 (got d={d}, w={w})")
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    wt = (weight if weight is not None else F.lit(1)).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_j"),
                F.pmod(
                    portable_hash32(
                        F.concat(F.lit(f"{j}:"), value.cast("string"))
                    ),
                    F.lit(w),
                )
                .cast("int")
                .alias("col"),
            )
            for j in range(d)
        ]
    )
    return (
        df.where(value.isNotNull())
        .select(g.alias("grp"), wt.alias("_wt"), F.explode(rows).alias("_rc"))
        .groupBy("grp", F.col("_rc.row_j").alias("row_j"), F.col("_rc.col").alias("col"))
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_estimate(
    registers: DataFrame,
    queries: DataFrame,
    query_col: str = "word",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates from a cms_registers table: for every
    (grp, query) pair, estimate = min over the d rows of the counter the
    query hashes into (absent counter = 0). Output:
    (grp, query_col, cms_count).

    `queries` is a small candidate list (audit terms, per-partition local
    heavy-hitter union, a benchmark's eval vocabulary) — it expands to
    d rows per term, crosses the DISTINCT group spine from the sketch,
    and probes with one equi-join against the bounded register table, so
    the probe cost is O(groups * d * |queries|) regardless of corpus
    size. d and w must match the sketch's build parameters — a mismatch
    probes the wrong registers and silently inflates estimates, so they
    are explicit arguments, not defaults read off the table."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2 (got d={d}, w={w})")
    # the register table is consumed by TWO plan branches (the group
    # spine and the probe join); without lineage truncation each branch
    # re-runs the full corpus sketch pass — measured as a second
    # FileScan+explode+aggregate in the physical plan (the CLAUDE.md
    # multi-consumer rule). The sketch is bounded at groups*d*w rows,
    # so the lazy checkpoint costs nothing next to the scan it removes;
    # callers probing an already-materialized (persisted/read-back)
    # sketch pay one no-op truncation.
    registers = registers.localCheckpoint(eager=False)
    qv = F.col(query_col).cast("string")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_j"),
                F.pmod(
                    portable_hash32(F.concat(F.lit(f"{j}:"), qv)), F.lit(w)
                )
                .cast("int")
                .alias("col"),
            )
            for j in range(d)
        ]
    )
    probes = queries.where(qv.isNotNull()).select(
        qv.alias(query_col), F.explode(rows).alias("_rc")
    )
    spine = registers.select("grp").distinct()
    expanded = spine.crossJoin(F.broadcast(probes)).select(
        "grp",
        query_col,
        F.col("_rc.row_j").alias("row_j"),
        F.col("_rc.col").alias("col"),
    )
    return (
        expanded.join(registers, ["grp", "row_j", "col"], "left")
        .groupBy("grp", query_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_count"))
    )


def hll_registers(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
    p: int = 10,
) -> DataFrame:
    """Sparse HLL register table: (group, reg_idx, reg) with reg =
    max rho over values hashing into the register. Absent registers are
    zero (the estimate side fills them). ONE map-side-combinable groupBy
    — the only shuffle; register count per group is bounded by 2^p.

    Mergeability: registers from disjoint shards/epochs union via
    groupBy(grp, reg_idx).agg(max(reg)) — no raw-data re-read.

    NULL values are IGNORED (COUNT(DISTINCT) semantics): md5(NULL) would
    otherwise create a phantom NULL-register row that count() counts but
    the dyadic sum skips, biasing the estimate. A group whose values are
    all NULL therefore emits no row."""
    if not 7 <= p <= 16:
        # the m >= 128 alpha constant below is wrong for smaller m
        # (Flajolet et al. tabulate alpha_16/32/64 separately)
        raise ValueError(f"p must be in [7, 16], got {p}")
    width = 32 - p
    h = portable_hash32(value)
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    return (
        df.where(value.isNotNull())
        .select(
            g.alias("grp"),
            F.shiftright(h, width).cast("int").alias("reg_idx"),
            _rho(h.bitwiseAND(F.lit((1 << width) - 1)), width).alias("_rho"),
        )
        .groupBy("grp", "reg_idx")
        .agg(F.max("_rho").alias("reg"))
    )


def hll_distinct(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
    p: int = 10,
) -> DataFrame:
    """Per-group HLL cardinality estimate.

    Output: (group, n_reg_nonzero, estimate) — `estimate` is the
    standard-bias-corrected HLL with the small-range linear-counting
    branch (E <= 2.5m and zero registers exist -> m*ln(m/V)), round-6.

    Everything after the one register shuffle runs on <= n_groups * 2^p
    rows. The raw-estimate harmonic sum is exact (module docstring), so
    the round-6 twin is order-safe by construction."""
    m = 1 << p
    # alpha_m for m >= 128 (Flajolet et al. Fig. 3)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, value, group_col, p)
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_nonzero"),
        # present registers contribute 2^-reg; absent ones 2^0 = 1 each
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_nonzero")).cast("double")
    raw = F.lit(alpha * m) * F.lit(float(m)) / s
    v_zero = (F.lit(m) - F.col("n_nonzero")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_nonzero").cast("long").alias("n_reg_nonzero"),
        F.round(est, 6).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# Bloom filter (the MEMBERSHIP member of the mergeable sketch family:
# HLL = cardinality, CMS = frequency, LQ = quantiles, Bloom = membership)
# ---------------------------------------------------------------------------


def _bloom_check(m_bits: int, k: int) -> None:
    if k < 1 or m_bits < 32 or m_bits % 32 != 0:
        # 32-bit word packing: bit positions 0..31 keep every mask
        # <= 2^31 — strictly positive in BIGINT in BOTH engines, so no
        # sign-bit semantics enter the twin (1<<63 flips the sign in
        # Spark and overflow-errors in DuckDB; packing at 32 sidesteps
        # the divergence entirely for a 2x register-count cost)
        raise ValueError(
            f"need k >= 1 and m_bits a positive multiple of 32 "
            f"(got m_bits={m_bits}, k={k})"
        )


def _bloom_word_mask(value: Column, j: int, m_bits: int) -> Column:
    """(word_idx, mask) struct for hash j of `value`: position
    h_j = portable_hash32(j || ':' || value) mod m_bits (the CMS row-hash
    recipe), word = pos >> 5, mask = 1 << (pos & 31) — all exact integer
    shift/mask ops, byte-identical in DuckDB."""
    pos = F.pmod(
        portable_hash32(F.concat(F.lit(f"{j}:"), value.cast("string"))),
        F.lit(m_bits),
    )
    return F.struct(
        F.shiftright(pos, 5).cast("int").alias("word_idx"),
        # python-side F.shiftleft only takes a LITERAL shift count —
        # shifting by a column routes through the SQL function registry
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (pos.bitwiseAND(F.lit(31))).cast("int"),
        ).alias("mask"),
    )


def bloom_registers(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
    m_bits: int = 131072,
    k: int = 3,
) -> DataFrame:
    """Bloom filter register table: (grp, word_idx, bits) with the m_bits
    filter packed 32 bits per BIGINT word (sparse — absent words are
    zero; the probe side fills them). The membership member of the
    mergeable sketch family (Bloom 1970, "Space/time trade-offs in hash
    coding with allowable errors"): a seen-set over a 100-TB corpus is a
    few hundred KB of registers instead of a full shuffle of the key
    universe, which is exactly the incremental-dedup prefilter shape —
    probe the Bloom first, pay the exact semi-join only for hits.

    Scale shape: the k-hash expansion happens BEFORE the hash aggregate,
    so map-side partial aggregation collapses each task's contribution to
    <= n_groups * m_bits/32 rows — the only shuffle carries bounded
    sketch state, never the key universe. Sketches from disjoint
    shards/epochs merge by register-wise BIT_OR (set union is bit union),
    the same accumulation contract as HLL (max) / CMS (sum) / LQ
    (sum,min,max).

    Determinism: position j = portable md5 hash of `j || ':' || value`
    mod m_bits (the CMS recipe, byte-identical in DuckDB); word/bit via
    integer shift/mask; registers are exact BIGINTs < 2^32 — no float
    enters the sketch, and no mask touches the BIGINT sign bit in either
    engine (see _bloom_check).

    NULL values are IGNORED (the hll/cms contract): a NULL occurrence is
    not a storable key, and md5(NULL) would silently drop the row anyway
    — filtered explicitly so the semantics are declared."""
    _bloom_check(m_bits, k)
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    probes = F.array(*[_bloom_word_mask(value, j, m_bits) for j in range(k)])
    return (
        df.where(value.isNotNull())
        .select(g.alias("grp"), F.explode(probes).alias("_wm"))
        .groupBy("grp", F.col("_wm.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("_wm.mask")).alias("bits"))
    )


def bloom_probe(
    registers: DataFrame,
    queries: DataFrame,
    query_col: str = "word",
    m_bits: int = 131072,
    k: int = 3,
) -> DataFrame:
    """Membership probes against a bloom_registers table: for every
    (grp, query) pair, bloom_hit = 1 iff ALL k probe bits are set
    (absent register word = 0 -> miss). Output: (grp, query_col,
    bloom_hit int). No false negatives by construction; false positives
    at the standard (1 - e^{-kn/m})^k rate.

    `queries` is the candidate side (new-batch keys probing the seen-set,
    an audit list): it expands to k rows per key, crosses the DISTINCT
    group spine, and probes with one equi-join against the bounded
    register table — O(groups * k * |queries|) regardless of the size of
    the corpus the sketch was built from. m_bits and k must match the
    build parameters (the cms_estimate rule: a mismatch probes the wrong
    registers and silently degrades to noise, so they are explicit)."""
    _bloom_check(m_bits, k)
    # two plan branches consume the register table (group spine + probe
    # join) — without lineage truncation each branch re-runs the full
    # corpus build pass (the CLAUDE.md multi-consumer rule); the sketch
    # is bounded at groups * m_bits/32 rows so the checkpoint is cheap
    registers = registers.localCheckpoint(eager=False)
    qv = F.col(query_col).cast("string")
    probe_arr = F.array(*[_bloom_word_mask(qv, j, m_bits) for j in range(k)])
    probes = queries.where(qv.isNotNull()).select(
        qv.alias(query_col), F.explode(probe_arr).alias("_wm")
    )
    spine = registers.select("grp").distinct()
    expanded = spine.crossJoin(F.broadcast(probes)).select(
        "grp",
        query_col,
        F.col("_wm.word_idx").alias("word_idx"),
        F.col("_wm.mask").alias("mask"),
    )
    hit_j = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    return (
        expanded.join(registers, ["grp", "word_idx"], "left")
        .groupBy("grp", query_col)
        .agg(
            F.min(F.when(hit_j, 1).otherwise(0)).cast("int").alias("bloom_hit")
        )
    )


def bloom_stats(
    registers: DataFrame,
    m_bits: int = 131072,
    k: int = 3,
) -> DataFrame:
    """Per-group filter health: (grp, n_bits_set, fill_ratio, fpp_est)
    — fill = popcount sum / m (bit_count exists in BOTH engines on
    BIGINT), fpp_est = fill^k by EXPLICIT repeated multiplication (k
    exact IEEE multiplies mirror 1:1 in the twin; pow() may differ in
    the last ulp cross-engine), both round-6. The saturation monitor: a
    fill ratio past ~0.5 means the filter is undersized for the stream
    it absorbed and the false-positive rate is drifting up."""
    _bloom_check(m_bits, k)
    fill = F.sum(F.bit_count(F.col("bits"))).cast("double") / F.lit(
        float(m_bits)
    )
    fpp = fill
    for _ in range(k - 1):
        fpp = fpp * fill
    return registers.groupBy("grp").agg(
        F.sum(F.bit_count(F.col("bits"))).cast("long").alias("n_bits_set"),
        F.round(fill, 6).alias("fill_ratio"),
        F.round(fpp, 6).alias("fpp_est"),
    )


# ---------------------------------------------------------------------------
# log-histogram quantile sketch (the quantile member of the mergeable
# monitoring trio: HLL = cardinality, CMS = frequency, LQ = quantiles)
# ---------------------------------------------------------------------------


def lq_registers(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Mergeable log2-bucket quantile registers over a positive-integer
    measure (tokens per doc, bytes per doc, frames per sequence) — the
    DDSketch idea (Masson et al. 2019, VLDB: relative-error quantiles
    from log-width buckets that merge by register addition) instantiated
    at gamma=2 with EXACT integer boundaries so it is deterministic and
    byte-identical cross-engine:

      bucket(v) = floor(log2(v)) = length(bin(v)) - 1   for v >= 1
      (the HLL `_rho` trick — bin() exists in BOTH engines and emits no
      leading zeros; no float log2 misrounding near powers of two),
      bucket -1 collects the excluded rows (NULL or v < 1) so data
      quality is visible, never silently dropped.

    Register row: (grp, bucket, cnt, vmin, vmax) — all exact BIGINT.
    Shard/epoch sketches merge by (SUM cnt, MIN vmin, MAX vmax) on the
    same key, the streaming-accumulation contract HLL (max) and CMS
    (sum) already pin.

    100-TB shape: ONE map-side-combinable groupBy bounded at
    groups x 65 rows — quantile monitoring of a web-scale column for
    the cost of a count(*)."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    v = F.col(value_col).cast("long")
    good = v.isNotNull() & (v >= 1)
    bucket = F.when(good, F.length(F.bin(v)) - 1).otherwise(F.lit(-1))
    return (
        df.select(
            g.alias("grp"), v.alias("_v"), bucket.cast("int").alias("bucket")
        )
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("_v").alias("vmin"),
            F.max("_v").alias("vmax"),
        )
    )


def lq_quantiles(
    registers: DataFrame,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from an lq_registers table:
    (grp, q, rank, n_good, n_bad, est).

    rank = ceil(q * n_good) clamped to >= 1 (1-based; an exact integer
    from one IEEE multiply + ceil, deterministic in both engines); the
    owning bucket is the first whose cumulative count reaches rank;
    within the bucket the estimate interpolates linearly between the
    bucket's TRUE vmin/vmax (exact integers carried by the register):

      est = vmin + round6( (vmax-vmin) * (rank-cum_before-1)
                            / max(cnt-1, 1) )

    — exact whenever the owning bucket is a single value or constant
    (vmin == vmax), and never off by more than the bucket width
    (relative error <= 2x worst-case, far less with interpolation).
    Every input to the one double multiply/divide is an exact BIGINT,
    so the round-6 value is engine-independent.

    Cost: windows + joins over the register table only
    (groups x 65 rows) — never touches the corpus MORE THAN ONCE: the
    register table is lazily checkpointed here because two plan branches
    consume it (the cumulative walk and the good/bad totals) and
    Catalyst pushes the bucket>=0 filter below one branch's aggregate,
    making the two subtrees differ so ReusedExchange cannot fire
    (measured: 2 FileScans without the checkpoint, 1 with)."""
    from pyspark.sql import Window

    if not qs or any(not (0.0 < float(q) <= 1.0) for q in qs):
        # q > 1 would silently emit an est-NULL row (rank past every
        # bucket) and an empty qs an empty frame — fail loud instead,
        # the hop=0 / p-bounds guard discipline
        raise ValueError(f"qs must be nonempty with 0 < q <= 1; got {qs!r}")
    registers = registers.localCheckpoint(eager=False)
    reg = registers.filter(F.col("bucket") >= 0)
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = reg.select(
        "grp",
        "bucket",
        "cnt",
        "vmin",
        "vmax",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
    )
    totals = registers.groupBy("grp").agg(
        F.sum(F.when(F.col("bucket") >= 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_good"),
        F.sum(F.when(F.col("bucket") < 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_bad"),
    )
    ranks = totals.select(
        "grp",
        "n_good",
        "n_bad",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).select(
        "grp",
        "q",
        "n_good",
        "n_bad",
        F.greatest(
            F.ceil(F.col("q") * F.col("n_good").cast("double")), F.lit(1)
        )
        .cast("long")
        .alias("rank"),
    )
    est = (
        F.col("vmin").cast("double")
        + F.round(
            (F.col("vmax") - F.col("vmin")).cast("double")
            * (F.col("rank") - F.col("cum_before") - 1).cast("double")
            / F.greatest(F.col("cnt") - 1, F.lit(1)).cast("double"),
            6,
        )
    )
    return (
        ranks.join(
            cum,
            (ranks.grp == cum.grp)
            & (F.col("cum_before") < F.col("rank"))
            & (F.col("rank") <= F.col("cum")),
            "left",
        )
        .select(
            ranks.grp.alias("grp"),
            "q",
            "rank",
            "n_good",
            "n_bad",
            F.round(est, 6).alias("est"),
        )
    )


TWO_52 = 1 << 52  # 4503599627370496


def _h52(v: Column) -> Column:
    """First 13 hex chars of md5 as a BIGINT — 52 exact bits, the
    priority_sample recipe (fits a double's mantissa, so the one
    division below is IEEE-identical cross-engine)."""
    return F.conv(F.substring(F.md5(v), 1, 13), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    k: int = 256,
) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. RANDOM 2002;
    Beyer et al. SIGMOD 2007 "On synopses for distinct value
    estimation"): per group, the k smallest DISTINCT 52-bit hashes of
    the value column — (group, h) rows, at most k per group.

    Why it exists next to HLL: same mergeability (the sketch of a
    union is the k smallest of the union of sketches — plain set
    union + re-rank, no register algebra), but KMV additionally
    supports SET operations — the kmv_jaccard estimator below needs
    the actual hash values, which HLL registers discard. Deterministic
    and order-free: content-addressed md5 hashes, distinct-set
    semantics (NULL values ignored, COUNT DISTINCT style — the HLL
    rule), so the sketch is byte-identical across engines and
    partitionings.

    Scale shape: distinct-(group,h) collapses map-side before its
    exchange; the per-group rank <= k hits WindowGroupLimit so every
    map task forwards at most k rows per group into the group
    exchange; downstream per-group aggregates reuse that exchange
    (subset-of-keys rule). Two exchanges, both compacted; zero
    Python; driver state zero (the sketch stays distributed)."""
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2, got {k}")
    from pyspark.sql.window import Window

    dh = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            _h52(F.col(value_col)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        dh.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    k: int = 256,
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch:
    (group, n_sketch, kth_hash, est_distinct) with

        est = (k-1) * 2^52 / h_(k)        when the sketch is full,
        est = n_sketch exactly            when the group has < k
                                          distinct hashes.

    (k-1)*2^52 is an exact BIGINT whose double cast is EXACT (k-1
    fits the mantissa), h_(k) < 2^52 is exact, so the estimate is ONE
    IEEE division of two exactly-represented doubles, rounded once to
    6 places — bit-stable cross-engine (the priority_sample
    discipline). h_(k) >= k-1 >= 1 for k >= 2 (k distinct
    non-negative integers), so the division is total."""
    sk = kmv_sketch(df, value_col, group_col, k)
    agg = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_sketch") < k,
        F.round(F.col("n_sketch").cast("double"), 6),
    ).otherwise(
        F.round(
            F.lit((k - 1) * TWO_52).cast("double")
            / F.col("kth_hash").cast("double"),
            6,
        )
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_jaccard(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    k: int = 256,
) -> DataFrame:
    """Pairwise Jaccard similarity ESTIMATE between every two groups'
    value sets, from one KMV sketch per group (Beyer et al. SIGMOD
    2007, set-operation synopses): for a pair (a, b), take the k
    smallest of S_a UNION S_b — the k smallest of A UNION B are
    guaranteed to live in the sketch union (closure property) — and
    count how many are present in BOTH sketches:

        jaccard_est = |cut ∩ S_a ∩ S_b| / k_used,
        k_used = min(k, |S_a UNION S_b|).

    Output: (src_a, src_b, k_used, n_shared, jaccard_est) for every
    group pair a < b. The estimate costs O(G^2 k) rows TOTAL — a
    constant-size synopsis join — where the exact answer
    (source_overlap) pays a corpus-scale shingle shuffle; this is the
    monitoring-tier version of the same question. Exact integers
    until ONE round-6 division.

    Scale shape: the sketch is localCheckpoint'ed once (bounded G*k
    rows) because both pair sides consume it — the multi-consumer
    recompute rule; pair expansion broadcasts the G^2 pair list; the
    per-pair union/rank/aggregate chain is bounded by G^2 k rows,
    never corpus-scale. Zero Python."""
    from pyspark.sql.window import Window

    sk = kmv_sketch(df, value_col, group_col, k).localCheckpoint()
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("src_a"))
        .crossJoin(groups.select(F.col("g").alias("src_b")))
        .where(F.col("src_a") < F.col("src_b"))
    )
    ua = (
        F.broadcast(pairs)
        .join(sk.withColumnRenamed("g", "src_a"), "src_a")
        .select("src_a", "src_b", "h", F.lit(1).alias("_a"), F.lit(0).alias("_b"))
    )
    ub = (
        F.broadcast(pairs)
        .join(sk.withColumnRenamed("g", "src_b"), "src_b")
        .select("src_a", "src_b", "h", F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    )
    u = (
        ua.unionByName(ub)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("_a").alias("in_a"), F.max("_b").alias("in_b"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    cut = u.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    out = cut.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_shared"),
    )
    return out.select(
        "src_a",
        "src_b",
        F.col("k_used").cast("long").alias("k_used"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.round(
            F.col("n_shared").cast("double") / F.col("k_used").cast("double"), 6
        ).alias("jaccard_est"),
    )
