"""J1 — the point-in-time / as-of join: the engine's flagship operator.

The distributed promotion of the reference's ordered index<->feature
alignment (/root/reference/src/audiopro/audio/extractor.py:211-213 ordered
imap; processors.py:281-285 idx->time). Spark SQL has no native ASOF JOIN,
so it is built from first principles two ways:

1. strategy='union' (default, pure JVM): union-tag both sides, ONE
   hash-shuffle on the key + an in-partition sort on (ts, side), then a
   running `last(value, ignorenulls=True)` forward-fill carries the most
   recent right-side row onto every left row. O(n log n) per partition, no
   Python, AQE-coalesced. Ties (right.ts == left.ts) MATCH (as-of
   semantics, same as pandas merge_asof / DuckDB ASOF JOIN). All three
   directions run here: 'forward' is the identical running-last over time
   REVERSED (one extra sort, same single shuffle); 'nearest' computes both
   scans over the one shuffle and picks the closer match (backward wins
   equal distances — pandas' rule).
2. strategy='cogroup' (Arrow): groupBy(key).cogroup().applyInPandas with
   pd.merge_asof per key — an independent cross-check in tests and the
   escape hatch for semantics Spark expressions don't cover.

Tolerance: a match further back than `tolerance_us` is nulled out (pandas
merge_asof tolerance semantics).

Zero temporal leakage (north rule): join on the LEFT side's availability
timestamp (frame END per SURVEY.md §1.3) so no feature row can see right-
side facts from its own future; tests poison future rows and assert
invariance (tests/test_asof.py).

Scale notes: the union approach shuffles each side once on the join key —
identical cost to the shuffle of a sort-merge join, but skips the join
build side entirely. Heavy keys: a single doc_id's rows must be co-located
(window semantics); sub-key salting is NOT semantics-preserving here, so
heavy keys are bounded upstream by doc size, which the corpus guarantees
(a doc's frames ~ n_tok/H rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, ...] = ("doc_id",),
    left_ts: str = "available_ts",
    right_ts: str = "label_ts",
    right_values: tuple[str, ...] | None = None,
    tolerance_us: int | None = None,
    direction: str = "backward",
    strategy: str = "union",
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """As-of join `left` with the most recent `right` row per key.

    Output = all left rows + right_values columns (null when no match /
    outside tolerance) + `matched_ts_col` (the matched right timestamp).
    """
    if right_values is None:
        right_values = tuple(
            c for c in right.columns if c not in on and c != right_ts
        )
    clash = (set(right_values) | {matched_ts_col}) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_values/matched_ts collide with left columns: {sorted(clash)}; "
            "rename or pass explicit right_values"
        )
    if matched_ts_col in right_values:
        # would emit two columns with the same name (union path) or
        # duplicate pandas labels feeding merge_asof (cogroup path)
        raise ValueError(
            f"right_values contains {matched_ts_col!r}, which is also the "
            "matched-timestamp output column; rename one of them"
        )
    # a right row with NULL ts can never be a valid as-of match — without
    # this filter the union path's NULLS-FIRST sort would forward-fill it
    # into every left row before the first real right row (silent wrong
    # data), and pandas merge_asof refuses NULL right keys outright
    right = right.where(F.col(right_ts).isNotNull())
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if strategy == "cogroup":
        return _asof_cogroup(
            left, right, on, left_ts, right_ts, right_values,
            tolerance_us, direction, matched_ts_col,
        )

    on = tuple(on)
    lcols = [c for c in left.columns]
    l2 = left.select(
        *on,
        _ts_us(F.col(left_ts)).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lv"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    _ts_us(F.col(right_ts)).alias("_rts"),
                    *[F.col(c) for c in right_values],
                ).alias("x")
            ).schema["x"].dataType.simpleString()
        ).alias("_rv"),
    )
    r2 = right.select(
        *on,
        _ts_us(F.col(right_ts)).alias("_ts"),
        F.lit(0).alias("_side"),  # sorts BEFORE left at equal ts -> tie matches
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("x"))
            .schema["x"].dataType.simpleString()
        ).alias("_lv"),
        F.struct(
            _ts_us(F.col(right_ts)).alias("_rts"),
            *[F.col(c) for c in right_values],
        ).alias("_rv"),
    )
    u = l2.unionByName(r2)

    # `_rv` as the final sort key makes right-side ties on (key, ts)
    # deterministic (struct compare): last() picks the max struct, not an
    # arbitrary partition-order row. Left rows carry NULL _rv (sorts first
    # within its (_ts, _side) group; ignorenulls skips it). MapType is not
    # orderable in Spark — if any right_values column contains one, fall
    # back to (_ts, _side) ordering (tie choice then partition-dependent).
    def _orderable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    rschema = {f.name: f.dataType for f in right.schema.fields}
    tie_keys = (
        ["_rv"] if all(_orderable(rschema[c]) for c in right_values) else []
    )

    def _win(reverse: bool):
        # forward scan = the same running-last over time REVERSED.
        # desc_nulls_first keeps NULL-left-ts rows ahead of every right
        # row in BOTH scan directions (plain desc puts NULLs last, which
        # would hand a NULL-ts left row the earliest right row — silent
        # wrong data); _side asc keeps right (0) before left (1) at equal
        # ts, so ties match in both directions, matching merge_asof.
        ts = F.desc_nulls_first("_ts") if reverse else F.asc("_ts")
        return (
            Window.partitionBy(*on)
            .orderBy(ts, "_side", *tie_keys)
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    last_rv = F.last("_rv", ignorenulls=True)
    if direction == "backward":
        filled = u.withColumn("_rv_f", last_rv.over(_win(False)))
        dist = F.col("_ts") - F.col("_rv_f._rts")
    elif direction == "forward":
        filled = u.withColumn("_rv_f", last_rv.over(_win(True)))
        dist = F.col("_rv_f._rts") - F.col("_ts")
    else:  # nearest: both scans share ONE shuffle (same partitionBy);
        # equal distances resolve backward, pandas merge_asof's rule
        bdist = F.col("_ts") - F.col("_b._rts")
        fdist = F.col("_f._rts") - F.col("_ts")
        filled = (
            u.withColumn("_b", last_rv.over(_win(False)))
            .withColumn("_f", last_rv.over(_win(True)))
            .withColumn(
                "_rv_f",
                F.when(F.col("_b").isNull(), F.col("_f"))
                .when(F.col("_f").isNull(), F.col("_b"))
                .when(bdist <= fdist, F.col("_b"))
                .otherwise(F.col("_f")),
            )
        )
        dist = F.abs(F.col("_ts") - F.col("_rv_f._rts"))
    filled = filled.filter(F.col("_side") == 1)

    in_tol = (
        F.lit(True)
        if tolerance_us is None
        else dist <= F.lit(int(tolerance_us))
    )
    keep = F.col("_rv_f").isNotNull() & in_tol
    out_cols: list[Column] = [F.col(f"_lv.{c}").alias(c) for c in lcols]
    out_cols.append(
        F.when(keep, F.timestamp_micros(F.col("_rv_f._rts"))).alias(matched_ts_col)
    )
    for c in right_values:
        out_cols.append(F.when(keep, F.col(f"_rv_f.{c}")).alias(c))
    return filled.select(*out_cols)


def _asof_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, ...],
    left_ts: str,
    right_ts: str,
    right_values: tuple[str, ...],
    tolerance_us: int | None,
    direction: str,
    matched_ts_col: str,
) -> DataFrame:
    """Arrow cogroup variant: pd.merge_asof per key group."""
    import pandas as pd

    # normalize ts dtypes BEFORE the cogroup: merge_asof needs real
    # datetimes on both sides (string ts columns sort lexicographically
    # into an object-dtype MergeError; the union path gets this cast via
    # _ts_us, this path must match)
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))

    lcols = list(left.columns)
    out_schema = left.schema.simpleString()[7:-1]  # strip struct<...>
    rv_fields = []
    rschema = dict(right.dtypes)
    for c in right_values:
        rv_fields.append(f"{c}: {rschema[c]}")
    ddl = (
        out_schema
        + f", {matched_ts_col}: timestamp"
        + ("," + ",".join(rv_fields) if rv_fields else "")
    )

    tol = pd.Timedelta(microseconds=tolerance_us) if tolerance_us is not None else None

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(
                columns=lcols + [matched_ts_col] + list(right_values)
            )
        # NULL-ts LEFT rows pass through unmatched (merge_asof refuses
        # NaT keys; the union path gives them no-match too). NULL-ts
        # right rows were filtered before dispatch.
        null_l = lpdf[lpdf[left_ts].isna()]
        lpdf = lpdf[lpdf[left_ts].notna()].sort_values(left_ts)
        rpdf = rpdf.sort_values(right_ts).rename(columns={right_ts: matched_ts_col})
        rpdf = rpdf[[matched_ts_col, *right_values]]
        no_match = {matched_ts_col: pd.NaT, **{c: None for c in right_values}}
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=matched_ts_col,
            direction=direction,
            tolerance=tol,
        ) if len(lpdf) else lpdf.assign(**no_match)
        if len(null_l):
            merged = pd.concat(
                [merged, null_l.assign(**no_match)], ignore_index=True
            )
        return merged[lcols + [matched_ts_col] + list(right_values)]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(lambda l, r: merge(l, r), ddl)
    )
