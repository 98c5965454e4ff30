"""Bucketed table layout for co-located joins (SURVEY.md §2.3 engine-level
join surface; task brief: "bucketing for co-located joins").

At corpus scale the frame-features table is written bucketed by doc_id so
every downstream doc_id equi-join (labels, doc metadata, feature unions)
is exchange-free: both sides' bucket files align, Spark plans a sort-merge
join with NO shuffle (verified in tests by asserting zero Exchange nodes
in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — exchange-free."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return "Exchange" in buf.getvalue()
