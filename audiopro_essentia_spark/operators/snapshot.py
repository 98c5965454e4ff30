"""Corpus snapshot diffing — epoch-over-epoch change detection.

The incremental half of a training-data pipeline needs to answer "what
changed since the last snapshot" without re-reading content twice: new
docs go through the full gate stack, changed docs invalidate cached
features/signatures (the incremental-dedup index,
operators/dedup.py:minhash_band_signatures), removed docs are retired
from packed shards. The reference's analog is its resume-on-existing-
output check (one file at a time); this is the corpus-scale form.

Scale shape: each side computes an md5 content digest in the scan
projection (narrow JVM), then ONE full-outer hash join on the id — no
content ever crosses the shuffle, only (id, digest). At 10^12 rows both
sides partition on the same key, and AQE handles the skewless equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-id change status between two corpus snapshots.

    Output: (id_col, status) with status in
    'added' (id only in `new`), 'removed' (only in `old`),
    'changed' (both, digests differ), 'same' (both, digests equal).
    NULL content digests as the empty string's md5 via coalesce, so a
    NULL-vs-'' flip counts as 'same' — deliberate: both render to zero
    content downstream.
    """
    dig = F.md5(F.coalesce(F.col(content_col).cast("string"), F.lit("")))
    o = old.select(F.col(id_col).alias("_id"), dig.alias("_od"))
    n = new.select(F.col(id_col).alias("_id"), dig.alias("_nd"))
    joined = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") == F.col("_nd"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("_id").alias(id_col), status.alias("status"))
