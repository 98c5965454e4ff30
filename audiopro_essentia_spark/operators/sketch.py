"""Deterministic cardinality sketching — HyperLogLog over a portable hash.

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
