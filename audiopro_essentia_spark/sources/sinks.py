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
    # NOTE: plain `spark._jvm.org.apache.iceberg.Table` attribute access
    # NEVER raises — py4j hands back a JavaPackage stub for missing
    # classes; only Class.forName actually probes the classpath
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
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
        spark=None,
        table: str | None = None,
    ):
        if fmt == "iceberg":
            # production target: ONE writeTo(table).overwritePartitions()
            # per write call (the Iceberg analog of the parquet facade's
            # dynamic partition overwrite) with REAL snapshot-id lineage.
            # Requires the runtime on the classpath (spark.jars.packages
            # org.apache.iceberg:iceberg-spark-runtime-*) — exercised by
            # the opt-in tests/test_iceberg_optin.py, which skips offline.
            if spark is None or not _iceberg_available(spark):
                raise ValueError(
                    "fmt='iceberg' requires an Iceberg runtime on the "
                    "classpath; use the parquet facade (same commit/lineage "
                    "contract over partitioned parquet)"
                )
            if not table:
                raise ValueError("fmt='iceberg' requires table='cat.db.tbl'")
        elif fmt not in ("parquet", "json"):
            # format dispatch table analog — output_handler.py:22-25
            raise ValueError(f"unsupported format: {fmt}")
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.key_col = key_col
        self.fmt = fmt
        self.table = table
        self.data_dir = os.path.join(out_dir, "data")
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)
        self._check_writer_meta()
        self._recover_interrupted_compaction()

    def _check_writer_meta(self) -> None:
        """Pin (n_buckets, key_col, fmt) on first open and validate on
        every reopen. Without this, resuming a half-committed dir with a
        different n_buckets can make committed_buckets() == range(new
        n_buckets) — write() then sees nothing pending and stamps
        _SUCCESS over a dataset missing half its rows. Config drift must
        be a loud error, never silent data loss."""
        meta_path = os.path.join(self.lineage_dir, "writer_meta.json")
        mine = {
            "n_buckets": self.n_buckets,
            "key_col": self.key_col,
            "fmt": self.fmt,
            "table": self.table,
        }
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                prev = json.load(fh)
            diff = {k: (prev.get(k), v) for k, v in mine.items() if prev.get(k) != v}
            if diff:
                raise ValueError(
                    f"checkpoint dir {self.out_dir} was created with "
                    f"different writer config: {diff} (stored, requested); "
                    "reopen with the original config or use a new out_dir"
                )
        else:
            with open(meta_path, "w") as fh:
                json.dump(mine, fh)

    @classmethod
    def from_meta(cls, out_dir: str, spark=None) -> "CheckpointedWriter":
        """Reopen an existing checkpoint dir with its STORED config —
        the safe constructor for read-side consumers that do not know
        (and must not guess) the writer's n_buckets/key_col/fmt."""
        meta_path = os.path.join(out_dir, "_lineage", "writer_meta.json")
        if not os.path.exists(meta_path):
            raise FileNotFoundError(
                f"no writer_meta.json under {out_dir} — not a checkpoint "
                "dir created by this writer"
            )
        with open(meta_path) as fh:
            m = json.load(fh)
        return cls(
            out_dir,
            n_buckets=m["n_buckets"],
            key_col=m["key_col"],
            fmt=m["fmt"],
            spark=spark,
            table=m.get("table"),
        )

    def _recover_interrupted_compaction(self) -> None:
        """POSIX has no atomic directory exchange, so compact()'s swap
        (bucket -> .compact_old, tmp -> bucket) has a tiny window where a
        committed bucket has no data dir. Heal any leftover on open:
        missing bucket + surviving .compact_old -> roll the old data
        back; bucket present -> drop stale .compact_old/.compact_tmp."""
        import shutil as _shutil

        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if d.endswith(".compact_old"):
                target = full[: -len(".compact_old")]
                if os.path.isdir(target):
                    _shutil.rmtree(full)  # swap completed; old is garbage
                else:
                    os.rename(full, target)  # crashed mid-swap: roll back
            elif d.endswith(".compact_tmp"):
                _shutil.rmtree(full)  # never swapped in; rewrite next time

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
        stop_event=None,
    ) -> dict:
        """Write all pending (uncommitted) buckets in ONE partitionBy job,
        then ONE read-back aggregation for per-bucket row/error/category
        metrics. The previous design ran 2 Spark jobs PER bucket over a
        persisted full output — 2 x n_buckets sequential jobs and a full
        .persist(), which anti-scales (memory pressure + serial driver
        loop at 100x). Dynamic partition overwrite keeps resume
        granularity: committed buckets are filtered out of the write and
        their directories are never touched.

        Error budget (error_col = row-level error tag, the kernel's
        `ferror`; reference extractor.py:184-207, comment's 2.5% intent):
        - if the GLOBAL pending error ratio exceeds error_budget_pct the
          job aborts before committing anything;
        - an individual over-budget bucket is NOT committed (its data dir
          is uncommitted and will be rewritten idempotently on resume);
          more than max_failures such buckets aborts the job.

        stop_event (anything with `is_set() -> bool`, e.g. the event
        yielded by process.graceful_shutdown): a cooperative shutdown
        request, honored at the two clean boundaries — before the write
        job is launched, and between atomic bucket commits. Buckets
        committed before the stop are durable exactly-once; the rest
        stay uncommitted and the next write() resumes them idempotently
        (reference utils/process.py:14-50 stop-flag contract). A stopped
        run returns stats with stopped=True and never stamps _SUCCESS.
        """
        if "bucket" in df.columns:
            # silently overwriting a user column named 'bucket' would
            # persist engine bucket ids where data used to be (e.g. a
            # read() round-trip feeds its partition column back in)
            raise ValueError(
                "input already has a 'bucket' column (the writer's "
                "reserved partition column) — drop or rename it first"
            )
        if error_col is not None and error_col not in df.columns:
            # the read-back tolerance below (JSON omits all-null fields)
            # must not extend to the INPUT: a typo'd or transform-dropped
            # error column would silently disable the error-budget gate
            # and stamp _SUCCESS over error-laden data
            raise ValueError(
                f"error_col {error_col!r} is not a column of the input "
                f"DataFrame ({df.columns}) — the error-budget gate would "
                "be silently disabled"
            )
        done = self.committed_buckets()
        if stop_event is not None and stop_event.is_set():
            # shutdown requested before any work: no Spark job, nothing
            # committed — the caller's next run picks up where the last
            # COMPLETED write left off
            return {
                "committed": [],
                "skipped": sorted(done),
                "failed_buckets": [],
                "total_rows": 0,
                "total_errors": 0,
                "stopped": True,
            }
        bucketed = df.withColumn(
            "bucket", F.pmod(F.hash(F.col(self.key_col)), F.lit(self.n_buckets))
        )
        pending_df = (
            bucketed.filter(~F.col("bucket").isin(*done)) if done else bucketed
        )

        pending = sorted(set(range(self.n_buckets)) - done)
        spark = df.sparkSession
        if not pending:
            # fully committed already (retried orchestration step /
            # re-delivered epoch): NO write job — the parquet/json branch
            # below would otherwise re-scan the whole input to write
            # nothing
            back = None
        elif self.fmt == "iceberg":
            # manifest-level analog of the rm loop below: stale rows from a
            # crashed/over-budget run live in UNCOMMITTED (no lineage
            # marker -> invisible) partitions; delete them in one
            # transaction, then ONE append commit writes every pending
            # bucket. Snapshot-id lineage comes from the table itself.
            if spark.catalog.tableExists(self.table):
                spark.sql(
                    f"DELETE FROM {self.table} WHERE bucket IN "
                    f"({', '.join(str(b) for b in pending)})"
                )
                pending_df.writeTo(self.table).append()
            else:
                (
                    pending_df.writeTo(self.table)
                    .using("iceberg")
                    .partitionedBy(F.col("bucket"))
                    .create()
                )
            back = spark.table(self.table).filter(F.col("bucket").isin(pending))
        else:
            # clear UNCOMMITTED bucket dirs first: dynamic overwrite only
            # touches partitions present in the new data, so a bucket that
            # had stale data from a crashed/over-budget run but is EMPTY in
            # the current df would otherwise keep (and then commit) the
            # stale rows. Safe: no commit marker == invisible, so deletion
            # preserves exactly-once.
            import shutil

            for b in pending:
                d = os.path.join(self.data_dir, f"bucket={b}")
                if os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)

            # job 1: the only pass over the input — write every pending
            # bucket
            (
                pending_df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .format(self.fmt)
                .save(self.data_dir)
            )
            back = self._read_buckets(spark, pending)

        # job 2: per-bucket metrics from the WRITTEN output (committed
        # table/parquet/json; partition-pruned scan of only pending
        # buckets)
        metrics: dict[int, dict] = {
            b: {"row_count": 0, "error_count": 0, "error_categories": {}}
            for b in pending
        }
        if back is not None:
            # JSON omits null fields (ignoreNullFields), so an all-null
            # error column is absent from the inferred read-back schema —
            # treat a missing column as zero errors, not a crash
            err = (
                F.col(error_col)
                if error_col is not None and error_col in back.columns
                else F.lit(None).cast("string")
            )
            for r in (
                back.groupBy(F.col("bucket"), err.alias("_cat"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ):
                cat = r["_cat"]
                m = metrics[int(r["bucket"])]
                m["row_count"] += r["n"]
                if cat is not None:
                    m["error_count"] += r["n"]
                    m["error_categories"][cat] = (
                        m["error_categories"].get(cat, 0) + r["n"]
                    )

        stats = {
            "committed": [],
            "skipped": sorted(done),
            "failed_buckets": [],
            "total_rows": 0,
            "total_errors": 0,
            "stopped": False,
        }
        g_rows = sum(m["row_count"] for m in metrics.values())
        g_err = sum(m["error_count"] for m in metrics.values())
        if (
            error_budget_pct is not None
            and g_rows > 0
            and g_err / g_rows > error_budget_pct
        ):
            raise RuntimeError(
                f"error budget exceeded globally: {g_err}/{g_rows} "
                f"> {error_budget_pct:.3%} (no bucket committed)"
            )
        budget = max_failures if max_failures is not None else 0
        # ONE snapshot lookup for the whole commit loop: all pending
        # buckets share the single append/create snapshot (one atomic
        # commit), and querying per bucket both multiplies metadata
        # round-trips and races a concurrent writer's later snapshot
        # into this run's lineage
        run_snapshot = (
            self._latest_snapshot_id(spark)
            if self.fmt == "iceberg" and pending
            else None
        )
        for b in pending:
            if stop_event is not None and stop_event.is_set():
                # clean boundary between atomic commits: what's committed
                # stays; the rest (data already written, marker absent) is
                # invisible and rewritten idempotently on resume
                stats["stopped"] = True
                break
            m = metrics[b]
            if (
                error_budget_pct is not None
                and m["row_count"] > 0
                and m["error_count"] / m["row_count"] > error_budget_pct
            ):
                stats["failed_buckets"].append(b)
                if len(stats["failed_buckets"]) > budget:
                    raise RuntimeError(
                        f"error budget exceeded in bucket {b}: "
                        f"{m['error_count']}/{m['row_count']} "
                        f"> {error_budget_pct:.3%}"
                    )
                continue  # over-budget bucket stays UNCOMMITTED
            lineage = {
                # iceberg: the REAL table snapshot id of this write's
                # append/create commit (shared by all buckets it wrote —
                # one atomic commit); parquet/json facade: a synthetic id
                "snapshot_id": (
                    run_snapshot if self.fmt == "iceberg" else uuid.uuid4().hex
                ),
                "bucket": b,
                "row_count": m["row_count"],
                "error_count": m["error_count"],
                "error_categories": m["error_categories"],
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
            stats["total_rows"] += m["row_count"]
            stats["total_errors"] += m["error_count"]
        success = os.path.join(self.out_dir, "_SUCCESS.json")
        if len(self.committed_buckets()) == self.n_buckets:
            # a no-op call on a complete dataset (committed == []) must
            # not clobber the real run's totals with zeros
            if stats["committed"] or not os.path.exists(success):
                with open(success, "w") as fh:
                    json.dump(stats, fh)
        elif os.path.exists(success):
            os.remove(success)  # partial dataset must not look complete
        return stats


    def compact(self, spark, target_file_mb: int = 128) -> dict:
        """Compact committed buckets' small files — the small-files answer
        at corpus scale (a 100-TB table written by thousands of tasks ends
        up with millions of KB-size files; scans then pay per-file open
        cost and the NameNode/manifest layer bloats).

        Per committed bucket: coalesce to ceil(bytes / target_file_mb)
        files, rewrite into a temp dir, atomically swap the bucket dir,
        and update the lineage commit (new snapshot_id, compacted_from
        provenance, row_count re-verified). Resume/read semantics are
        untouched: the bucket stays committed throughout — a crash
        mid-compaction leaves either the old or the new complete dir.
        """
        import math
        import shutil
        import uuid as _uuid

        if self.fmt == "iceberg":
            raise NotImplementedError(
                "iceberg tables compact via the engine's own "
                "rewrite_data_files procedure (CALL "
                "cat.system.rewrite_data_files(...)), not this file-swap"
            )
        stats = {"compacted": [], "skipped": [], "files_before": 0, "files_after": 0}
        for b in sorted(self.committed_buckets()):
            bdir = os.path.join(self.data_dir, f"bucket={b}")
            if not os.path.isdir(bdir):
                stats["skipped"].append(b)
                continue
            files = [
                f for f in os.listdir(bdir)
                if not f.startswith((".", "_"))
            ]
            size = sum(os.path.getsize(os.path.join(bdir, f)) for f in files)
            n_target = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
            if len(files) <= n_target:
                stats["skipped"].append(b)
                continue
            df = spark.read.format(self.fmt).load(bdir)
            n_rows = df.count()
            with open(self._commit_path(b)) as fh:
                rec = json.load(fh)
            if rec["row_count"] != n_rows:
                # verify BEFORE any destructive step: data touched out of
                # band must abort the compaction, not be re-blessed
                raise RuntimeError(
                    f"bucket {b}: data dir has {n_rows} rows but lineage "
                    f"commit says {rec['row_count']} — refusing to compact"
                )
            tmp = bdir + ".compact_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            df.coalesce(n_target).write.format(self.fmt).mode("overwrite").save(tmp)
            old = bdir + ".compact_old"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(bdir, old)
            os.rename(tmp, bdir)
            shutil.rmtree(old)
            rec["compacted_from"] = rec["snapshot_id"]
            rec["snapshot_id"] = _uuid.uuid4().hex
            # record the ACTUAL file count (coalesce(n) may produce fewer
            # when the source had fewer partitions), not the target
            rec["files"] = len([
                f for f in os.listdir(bdir) if not f.startswith((".", "_"))
            ])
            tmp_commit = self._commit_path(b) + ".tmp"
            with open(tmp_commit, "w") as fh:
                json.dump(rec, fh)
            os.replace(tmp_commit, self._commit_path(b))
            stats["compacted"].append(b)
            stats["files_before"] += len(files)
            stats["files_after"] += rec["files"]
        return stats

    def _latest_snapshot_id(self, spark) -> str:
        """Most recent Iceberg snapshot id of self.table (the commit the
        current write just produced)."""
        rows = spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(rows[0][0]) if rows else ""

    def _read_buckets(self, spark, buckets) -> DataFrame | None:
        """Read only the given buckets' directories (basePath keeps the
        bucket partition column). Missing dirs (empty buckets) skipped."""
        paths = [
            os.path.join(self.data_dir, f"bucket={b}")
            for b in buckets
            if os.path.isdir(os.path.join(self.data_dir, f"bucket={b}"))
        ]
        if not paths:
            return None
        return (
            spark.read.option("basePath", self.data_dir)
            .format(self.fmt)
            .load(paths)
        )

    def read(self, spark) -> DataFrame:
        """Read the COMMITTED output only — data written for a bucket whose
        commit marker is missing (crash, over-budget skip) is invisible."""
        if self.fmt == "iceberg":
            done = sorted(self.committed_buckets())
            if not done:
                raise FileNotFoundError(
                    f"no committed buckets for {self.table}"
                )
            return spark.table(self.table).filter(F.col("bucket").isin(done))
        out = self._read_buckets(spark, sorted(self.committed_buckets()))
        if out is None:
            raise FileNotFoundError(
                f"no committed buckets under {self.data_dir}"
            )
        return out

    def lineage(self) -> list[dict]:
        out = []
        for b in sorted(self.committed_buckets()):
            with open(self._commit_path(b)) as fh:
                out.append(json.load(fh))
        return out

    def error_stats(self) -> dict:
        """Aggregated per-category error metrics across committed buckets —
        the analog of the reference's error-tracking surface
        (/root/reference/src/audiopro/errors/tracking.py:14-101): total
        rows/errors + per-category counts, durable across resume because
        they live in the per-bucket lineage commits."""
        cats: dict[str, int] = {}
        rows = errors = 0
        for rec in self.lineage():
            rows += rec["row_count"]
            errors += rec["error_count"]
            for k, v in rec.get("error_categories", {}).items():
                cats[k] = cats.get(k, 0) + v
        return {
            "total_rows": rows,
            "total_errors": errors,
            "error_rate": errors / rows if rows else 0.0,
            "categories": cats,
        }


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


def write_msgpack_dir(
    df: DataFrame, out_dir: str, gzip_output: bool = True
) -> None:
    """S5 proper: write rows as MessagePack (one .msgpack[.gz] file per
    partition, maps keyed by column name) — the reference's msgpack+gzip
    output format (/root/reference/src/audiopro/output/output_handler.py
    dispatch, arg_parser --format/--gzip), self-implemented from the
    public spec since no msgpack wheel ships here.

    Executor-side foreachPartition: each task streams its split straight
    to its own file (named by partition id -> task retries overwrite
    idempotently, no duplicates). Row-at-a-time conversion is inherent to
    the format and confined to this sink — use it for DOC-LEVEL outputs
    (one row per doc), keep frame tables in parquet."""
    import gzip as _gzip

    os.makedirs(out_dir, exist_ok=True)
    # a re-run with fewer partitions must not leave stale part files for
    # read_msgpack_dir to merge back in — clear previous output first
    # (also drops any _SUCCESS marker until this write completes)
    for f in os.listdir(out_dir):
        if f.startswith("part-") or f == "_SUCCESS.json":
            os.remove(os.path.join(out_dir, f))
    cols = df.columns
    ext = ".msgpack.gz" if gzip_output else ".msgpack"

    def _write(rows) -> None:
        from pyspark import TaskContext

        from ..functions.msgpack import packb

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        # write to an attempt-unique temp then atomically rename: with
        # speculative execution (or a zombie task racing its retry) two
        # attempts of the SAME partition would otherwise interleave into
        # one open file -> corrupt gzip stream. os.replace makes last
        # completed attempt win wholesale.
        tmp = f"{path}.attempt-{ctx.taskAttemptId()}.tmp"
        opener = _gzip.open if gzip_output else open
        def conv(v):
            # datetime/date (any nesting depth) -> ISO string
            if hasattr(v, "isoformat"):
                return v.isoformat()
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v

        with opener(tmp, "wb") as fh:
            for r in rows:
                d = r.asDict(recursive=True)
                fh.write(packb({c: conv(d[c]) for c in cols}))
        os.replace(tmp, path)

    df.foreachPartition(_write)
    # completeness marker: consumers must treat a dir without it as a
    # partial (killed) write — mirrors the frame data's commit contract
    with open(os.path.join(out_dir, "_SUCCESS.json"), "w") as fh:
        json.dump({"files": sorted(
            f for f in os.listdir(out_dir) if f.startswith("part-")
        )}, fh)


def read_msgpack_dir(out_dir: str, require_success: bool = True) -> list[dict]:
    """Decode every row written by write_msgpack_dir (verification/tests)."""
    import gzip as _gzip

    from ..functions.msgpack import unpack_stream

    if require_success and not os.path.exists(
        os.path.join(out_dir, "_SUCCESS.json")
    ):
        raise FileNotFoundError(
            f"no _SUCCESS.json under {out_dir} — partial msgpack write"
        )
    out: list[dict] = []
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        if f.endswith(".msgpack.gz"):
            out.extend(unpack_stream(_gzip.open(p, "rb").read()))
        elif f.endswith(".msgpack"):
            out.extend(unpack_stream(open(p, "rb").read()))
    return out
