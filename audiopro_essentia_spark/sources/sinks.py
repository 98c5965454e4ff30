"""S4-S7 — sinks: the resumable, lineage-tracked checkpoint writer.

The distributed analog of the reference's incremental batched emission
(/root/reference/src/audiopro/audio/extractor.py:74,214-219 per-frame
callback; output_handler.py:28-75 format dispatch): output is committed
bucket-at-a-time with a lineage record per commit, so a killed job resumes
exactly where it stopped with exactly-once output (north rule: "resumable
from checkpoint with per-partition lineage + metrics").

Iceberg is the production target (`df.writeTo(table).append()` with
snapshot lineage for free); the sandbox has no Iceberg runtime on the
classpath, so the same contract is implemented over a partitioned Parquet
layout behind one facade:

    out_dir/
      data/bucket=<k>/*.parquet      (one atomic commit per bucket)
      _lineage/commit_<k>.json       (snapshot id, rows, errors, inputs)
      _SUCCESS.json                  (written when all buckets committed)

Buckets are deterministic content-keyed hashes of doc_id (pmod(hash, B)) —
stable across retries and speculative re-execution (SURVEY.md §7(d)).
Format dispatch (parquet/json, the reference's msgpack/json analog) mirrors
output_handler.py:22-25.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


class CheckpointedWriter:
    """Bucket-at-a-time resumable writer with per-commit lineage."""

    def __init__(
        self,
        out_dir: str,
        n_buckets: int = 16,
        key_col: str = "doc_id",
        fmt: str = "parquet",
    ):
        if fmt not in ("parquet", "json"):
            # format dispatch table analog — output_handler.py:22-25
            raise ValueError(f"unsupported format: {fmt}")
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.key_col = key_col
        self.fmt = fmt
        self.data_dir = os.path.join(out_dir, "data")
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- checkpoint state ---------------------------------------------------

    def committed_buckets(self) -> set[int]:
        out = set()
        for f in os.listdir(self.lineage_dir):
            if f.startswith("commit_") and f.endswith(".json"):
                out.add(int(f[len("commit_") : -len(".json")]))
        return out

    def _commit_path(self, bucket: int) -> str:
        return os.path.join(self.lineage_dir, f"commit_{bucket}.json")

    # -- write ----------------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        error_col: str | None = None,
        error_budget_pct: float | None = None,
        input_files: list[str] | None = None,
        max_failures: int | None = None,
    ) -> dict:
        """Write df bucket-at-a-time; skip buckets already committed.

        error_col: optional column whose non-null values count as row-level
        errors (the kernel's `ferror`); if the global error ratio exceeds
        error_budget_pct the job aborts BEFORE committing the offending
        bucket (reference error budget, extractor.py:184-207 — implementing
        the comment's 2.5% intent per SURVEY.md §2.8).
        """
        bucketed = df.withColumn(
            "bucket", F.pmod(F.hash(F.col(self.key_col)), F.lit(self.n_buckets))
        )
        # one pass to pin the bucket assignment; reused across bucket writes
        bucketed = bucketed.persist()
        try:
            done = self.committed_buckets()
            stats = {"committed": [], "skipped": sorted(done), "total_rows": 0,
                     "total_errors": 0}
            n_failed = 0
            for b in range(self.n_buckets):
                if b in done:
                    continue
                part = bucketed.filter(F.col("bucket") == b).drop("bucket")
                bucket_dir = os.path.join(self.data_dir, f"bucket={b}")
                if error_col is not None:
                    agg = part.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(F.col(error_col).isNotNull().cast("long")).alias("e"),
                    ).collect()[0]
                    n_rows, n_err = agg.n, int(agg.e or 0)
                else:
                    n_rows, n_err = part.count(), 0
                if (
                    error_budget_pct is not None
                    and n_rows > 0
                    and n_err / n_rows > error_budget_pct
                ):
                    n_failed += 1
                    budget = max_failures if max_failures is not None else 0
                    if n_failed > budget:
                        raise RuntimeError(
                            f"error budget exceeded in bucket {b}: "
                            f"{n_err}/{n_rows} > {error_budget_pct:.3%}"
                        )
                getattr(part.write.mode("overwrite"), self.fmt)(bucket_dir)
                lineage = {
                    "snapshot_id": uuid.uuid4().hex,
                    "bucket": b,
                    "row_count": n_rows,
                    "error_count": n_err,
                    "committed_at": time.time(),
                    "input_files": input_files or [],
                    "format": self.fmt,
                    "key_col": self.key_col,
                }
                tmp = self._commit_path(b) + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(lineage, fh)
                os.replace(tmp, self._commit_path(b))  # atomic commit
                stats["committed"].append(b)
                stats["total_rows"] += n_rows
                stats["total_errors"] += n_err
            with open(os.path.join(self.out_dir, "_SUCCESS.json"), "w") as fh:
                json.dump(stats, fh)
            return stats
        finally:
            bucketed.unpersist()

    def read(self, spark) -> DataFrame:
        return getattr(spark.read, self.fmt)(self.data_dir)

    def lineage(self) -> list[dict]:
        out = []
        for b in sorted(self.committed_buckets()):
            with open(self._commit_path(b)) as fh:
                out.append(json.load(fh))
        return out


def validate_output_path(path: str, fmt: str) -> str:
    """Refuse an extension inside the target identifier and normalize —
    analog of /root/reference/src/audiopro/utils/path.py:20-48."""
    base = os.path.basename(path)
    if "." in base:
        raise ValueError(
            f"output path must not carry an extension (got {base!r}); "
            f"the writer appends format={fmt}"
        )
    return path
