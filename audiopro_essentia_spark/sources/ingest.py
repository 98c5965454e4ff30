"""Semi-structured ingestion with malformed-record quarantine.

The reference validates its input files before processing and fails loudly
on unreadable ones (reference src/audiopro/utils/path.py:35-70 — extension
+ existence checks before the load). At corpus scale the analogous problem
is malformed JSON/CSV lines inside multi-TB drops: a single bad line must
not kill the job, but silently dropping it is worse. This module reads
with an EXPLICIT schema in PERMISSIVE mode and splits the result into
(good, quarantined) DataFrames, mirroring the engine's row-level
quarantine stage (operators/aggregates.py:reject_reason_col).

Scale notes:
- An explicit schema is mandatory: schema inference is a second full scan
  of 100 TB. Callers pass the contract schema; drift surfaces as
  quarantined rows, not silent nulls.
- The corrupt-record column only materializes for rows that fail to
  parse, so the happy path stays a narrow columnar scan.
- Spark requires a filter on parsed columns (not only the corrupt-record
  column) unless the parsed Dataset is cached — we instead re-select the
  corrupt column THROUGH a projection that Spark permits, by including at
  least one data column in the referenced set (SPARK-38523 guidance:
  cache or avoid corrupt-column-only queries). Splitting on IS NULL of
  the corrupt column after a full projection is supported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already contains {CORRUPT_COL}")
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit contract schema; return
    (good, quarantine) where quarantine rows carry the raw malformed line
    in `raw` plus a constant `reject_reason`. Exactly-one-of: every input
    line lands in good XOR quarantine."""
    full = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark cannot plan a query whose ONLY referenced column is the
    # corrupt-record column; caching the full projection is the supported
    # pattern and also avoids re-parsing for the second branch.
    full = full.cache()
    good = full.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = full.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit("malformed_json").alias("reject_reason"),
    )
    return good, bad


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV analog of read_json_quarantine (PERMISSIVE + corrupt-record
    capture; type-mismatched or wrong-arity lines quarantine)."""
    full = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    full = full.cache()
    good = full.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = full.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit("malformed_csv").alias("reject_reason"),
    )
    return good, bad


def ingest_stats(good: DataFrame, bad: DataFrame) -> dict:
    """One-pass counts for lineage/monitoring (cached parse, so these two
    counts do not re-read the source)."""
    n_good, n_bad = good.count(), bad.count()
    total = n_good + n_bad
    return {
        "n_good": n_good,
        "n_quarantined": n_bad,
        "quarantine_ratio": (n_bad / total) if total else 0.0,
    }
