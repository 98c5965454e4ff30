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


def _split(full: DataFrame, reason: str) -> tuple[DataFrame, DataFrame]:
    """Split a cached PERMISSIVE parse into (good, quarantine).

    The cache is load-bearing twice: Spark refuses to plan reader queries
    whose referenced columns are ONLY the corrupt-record column
    (SPARK-38523), and it makes the two branches share one parse. The
    entry lives until session end — the same documented lifetime
    trade-off as plans/curate.py persist_intermediate; Spark's cache
    manager dedups repeated identical reads by canonicalized plan, so
    re-ingesting the same path does not accumulate entries."""
    full = full.cache()
    good = full.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = full.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit(reason).alias("reject_reason"),
    )
    return good, bad


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit contract schema; return
    (good, quarantine) where quarantine rows carry the raw malformed line
    in `raw` plus a constant `reject_reason`. Exactly-one-of: every
    NON-BLANK input line lands in good XOR quarantine.

    Blank/whitespace-only lines are the ONE documented divergence between
    the modes: Spark's native JSON source (cache=True) silently skips
    them before parsing — they land in neither branch and are invisible
    to ingest stats — while the text path (cache=False) reads them as
    value='' and quarantines them. Both behaviors are deterministic;
    pipelines that must account for every physical line (strict-audit
    ingest) should use cache=False.

    cache=True (default, interactive): one cached parse feeds both
    branches — see _split for the lifetime trade-off. cache=False (huge
    one-shot drops): NO cache pressure — the file is read as text and
    parsed per branch with from_json carrying the same corrupt-record
    column (identical quarantine semantics for non-blank lines, incl.
    type-mismatch rows); two pushdown text scans, the right shape when
    each branch is written out exactly once."""
    if cache:
        full = (
            spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
        return _split(full, "malformed_json")
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    ).alias("_p")
    both = lines.select(F.col("value"), parsed)
    bad_pred = F.col("_p").isNull() | F.col("_p")[CORRUPT_COL].isNotNull()
    good = both.where(~bad_pred).select("_p.*").drop(CORRUPT_COL)
    bad = both.where(bad_pred).select(
        F.col("value").alias("raw"),
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
    capture; type-mismatched or wrong-arity lines quarantine). Always the
    cached one-parse path: the text-scan alternative cannot reproduce the
    reader's header handling."""
    full = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(full, "malformed_csv")


def ingest_stats(good: DataFrame, bad: DataFrame) -> dict:
    """Counts for lineage/monitoring. With the default cache=True readers
    both counts share the one cached parse; on the cache=False JSON path
    each count is its own text scan — by design (that mode trades two
    pushdown scans for zero cache pressure), so call this only when the
    audit is worth the extra pass."""
    n_good, n_bad = good.count(), bad.count()
    total = n_good + n_bad
    return {
        "n_good": n_good,
        "n_quarantined": n_bad,
        "quarantine_ratio": (n_bad / total) if total else 0.0,
    }
