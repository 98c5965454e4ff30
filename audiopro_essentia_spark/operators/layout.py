"""Z-order data layout — multi-column clustering for scan pruning.

The 100-TB problem this solves: parquet/Iceberg readers prune files and
row groups with per-column min/max statistics, but a table sorted on ONE
column has useless stats on every other column — each file spans the
full range of the second predicate column, so a query filtering on it
reads everything. Interleaving the bits of k columns into one key
(Morton / Z-order curve; the technique behind Delta's and Iceberg's
OPTIMIZE ZORDER) and range-partitioning + sorting on that key gives
every file a small bounding box in ALL k dimensions at once, so a
selective predicate on ANY of them prunes most files. The analog in the
reference is its per-batch output layout control
(/root/reference/src/audiopro/output/writers.py batching); here layout
is a first-class distributed operator.

Exactness: everything is pure BIGINT math — fixed-width bucketing is
one subtract + exact floor div, the interleave is an unrolled sum of
shift/mask terms — so the DuckDB twin (duck_twins.zorder_key_sql) is
hash-identical with no rounding anywhere.

Scale shape: bucketing and the key are narrow per-row expressions
(zero shuffle, zero Python); bounds come from a 1-row aggregate the
caller broadcasts (or from table statistics at 100 TB); the layout
itself is ONE repartitionByRange on the key (sampled range boundaries,
the same mechanism as a global sort) + in-partition sort — the only
shuffle, and the one you are buying the pruning with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_KEY_BITS = 62  # keep the interleaved key strictly below the sign bit


def _floor_div(n: Column, d: Column) -> Column:
    """Exact FLOOR division for non-negative BIGINTs below 2^53 — the
    temporal._bucket_of recipe: (n - pmod(n, d)) / d has a numerator
    that is an exact multiple of d and still double-representable, so
    the one double division is exact. A bare floor(n / d) rides a
    rounded double quotient."""
    return ((n - F.pmod(n, d)) / d).cast("long")


def zorder_bucket(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Fixed-width bucket a BIGINT column into [0, 2^bits) with pure
    integer math: width = ceil-div(hi - lo + 1, 2^bits), bucket =
    (c - lo) div width. Monotone, exact, and engine-portable (all
    operands non-negative, so truncation == floor == DuckDB //).
    The fixed-width form keeps every numerator <= the span — the
    multiply-first form (c-lo)*2^bits overflows double-exactness at
    micros spans beyond ~1.6 days, this one is exact to spans of 2^53
    (~285 years of micros). Values outside [lo, hi] fail loud — bounds
    are the caller's contract (a 1-row min/max aggregate, or table
    statistics at 100 TB)."""
    if not (1 <= bits <= 32):
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    m = F.lit(1 << bits)
    guarded = F.when(
        (c < lo) | (c > hi),
        F.raise_error(
            F.concat(
                F.lit("zorder_bucket: value out of [lo, hi]: "),
                c.cast("string"),
            )
        ),
    ).otherwise(c)
    span = hi.cast("long") - lo.cast("long") + F.lit(1)
    width = _floor_div(span + m - F.lit(1), m)
    return _floor_div(guarded.cast("long") - lo.cast("long"), width)


def zorder_key(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave k already-bucketed columns (each in
    [0, 2^bits)) into one BIGINT: bit j of column i lands at position
    j*k + i. Unrolled shift/mask sum — no lambda, no UDF, one
    whole-stage-codegen expression. Pass plain attribute refs (project
    bucket expressions into named columns first): every mention of a
    column here is one of bits*k terms, and Catalyst re-inlines
    EXPRESSIONS per mention (the repo's projection-collapse rule)."""
    k = len(bucket_cols)
    if k < 2:
        raise ValueError(f"need >= 2 columns to interleave, got {k}")
    if not (1 <= bits and bits * k <= MAX_KEY_BITS):
        raise ValueError(
            f"bits*k must be in [k, {MAX_KEY_BITS}], got bits={bits} k={k}"
        )
    terms = []
    for i, c in enumerate(bucket_cols):
        for j in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * k + i,
                ).cast("long")
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_zorder_key(
    df: DataFrame,
    bucket_col_names: list[str],
    bits: int = 16,
    key_col: str = "z_key",
) -> DataFrame:
    """Attach the interleaved key over ALREADY-projected bucket columns
    (named attribute refs, so the unrolled interleave never re-inlines
    bucket arithmetic)."""
    return df.withColumn(
        key_col, zorder_key([F.col(n) for n in bucket_col_names], bits)
    )


def zorder_layout(
    df: DataFrame,
    key_col: str = "z_key",
    n_files: int = 16,
) -> DataFrame:
    """Cluster rows for writing: ONE repartitionByRange on the z-key
    (contiguous z-ranges per output file = small per-file bounding box
    in every interleaved dimension) + in-partition sort so parquet
    row-group stats are tight too. Write the result with
    df.write.parquet(...); file/row-group pruning on any interleaved
    column's min/max does the rest."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    return df.repartitionByRange(n_files, F.col(key_col)).sortWithinPartitions(
        key_col
    )
