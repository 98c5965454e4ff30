"""CheckpointedWriter resume/lineage/error-budget + salted-skew equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.operators.skew import salted_agg, salted_broadcast_join
from audiopro_essentia_spark.sources.sinks import CheckpointedWriter, validate_output_path


@pytest.fixture()
def small_df(spark):
    return spark.range(1000).select(
        F.concat(F.lit("doc"), (F.col("id") % 37).cast("string")).alias("doc_id"),
        F.col("id").alias("v"),
        F.when(F.col("id") % 100 == 0, F.lit("boom")).alias("ferror"),
    )


def test_write_resume_exactly_once(spark, small_df, tmp_path):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=4)
    stats = w.write(small_df)
    assert sorted(stats["committed"]) == [0, 1, 2, 3]
    assert stats["total_rows"] == 1000
    # simulate crash: drop one commit marker, data dir stays
    os.remove(os.path.join(out, "_lineage", "commit_1.json"))
    stats2 = CheckpointedWriter(out, n_buckets=4).write(small_df)
    assert stats2["committed"] == [1]
    back = w.read(spark)
    assert back.count() == 1000
    assert back.select("doc_id", "v").distinct().count() == 1000


def test_lineage_records(spark, small_df, tmp_path):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=2)
    w.write(small_df, error_col="ferror", error_budget_pct=0.5, input_files=["x"])
    lin = w.lineage()
    assert len(lin) == 2
    assert sum(r["row_count"] for r in lin) == 1000
    assert sum(r["error_count"] for r in lin) == 10
    assert all(r["input_files"] == ["x"] for r in lin)


def test_error_budget_abort(spark, small_df, tmp_path):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=2)
    with pytest.raises(RuntimeError, match="error budget"):
        w.write(small_df, error_col="ferror", error_budget_pct=0.001)


def test_validate_output_path():
    assert validate_output_path("/tmp/x/out_dir", "parquet") == "/tmp/x/out_dir"
    with pytest.raises(ValueError):
        validate_output_path("/tmp/x/out.msgpack", "json")


def test_salted_agg_equals_plain(spark):
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 8, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    got = {
        r.k: (r.sum_v, r.n_rows, r.avg_v, r.max_v)
        for r in salted_agg(df, ("k",), n_salts=8, sums=("v",), maxs=("v",)).collect()
    }
    exp = {
        r.k: (r.sum_v, r.n_rows, r.avg_v, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).alias("n_rows"),
            F.avg("v").alias("avg_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == exp


def test_salted_broadcast_join_equals_plain(spark):
    big = spark.range(5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    got = salted_broadcast_join(big, small, ("k",), n_salts=4).orderBy("v").collect()
    exp = big.join(small, "k", "left").orderBy("v").collect()
    assert [(r.k, r.v, r.w) for r in got] == [(r.k, r.v, r.w) for r in exp]


def test_error_stats_survive_resume(spark, small_df, tmp_path):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=4)
    w.write(small_df, error_col="ferror", error_budget_pct=0.5)
    before = w.error_stats()
    assert before["total_rows"] == 1000
    assert before["total_errors"] == 10
    assert before["categories"] == {"boom": 10}
    # crash one bucket, resume: stats re-aggregate identically
    os.remove(os.path.join(out, "_lineage", "commit_2.json"))
    CheckpointedWriter(out, n_buckets=4).write(
        small_df, error_col="ferror", error_budget_pct=0.5
    )
    assert CheckpointedWriter(out, n_buckets=4).error_stats() == before


def test_over_budget_bucket_not_committed_when_tolerated(spark, tmp_path):
    # bucket-skewed errors: key "hot" rows all error; others clean
    df = spark.range(400).select(
        F.when(F.col("id") % 4 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("doc"), (F.col("id") % 29).cast("string")))
        .alias("doc_id"),
        F.col("id").alias("v"),
        F.when(F.col("id") % 4 == 0, F.lit("boom")).alias("ferror"),
    )
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=4)
    stats = w.write(df, error_col="ferror", error_budget_pct=0.3, max_failures=2)
    assert stats["failed_buckets"], "expected an over-budget bucket"
    # failed buckets are NOT committed and NOT readable
    assert set(stats["failed_buckets"]) & (set(range(4)) - set(stats["committed"]))
    back = w.read(spark)
    assert back.filter(F.col("ferror") == "boom").count() == 0
    # resume with a clean budget commits the remaining buckets idempotently
    stats2 = CheckpointedWriter(out, n_buckets=4).write(df, error_col="ferror")
    assert sorted(stats2["committed"]) == sorted(stats["failed_buckets"])
    assert CheckpointedWriter(out, n_buckets=4).read(spark).count() == 400


def test_iceberg_fmt_fails_loud_without_runtime(spark, tmp_path):
    with pytest.raises(ValueError, match="Iceberg runtime"):
        CheckpointedWriter(str(tmp_path / "o"), fmt="iceberg", spark=spark)


def test_json_write_with_clean_error_col(spark, tmp_path):
    """JSON omits all-null fields; a clean run with error_col must not
    crash the metrics read-back (regression: UNRESOLVED_COLUMN)."""
    df = spark.range(50).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("v"),
        F.lit(None).cast("string").alias("ferror"),
    )
    w = CheckpointedWriter(str(tmp_path / "o"), n_buckets=2, fmt="json")
    stats = w.write(df, error_col="ferror", error_budget_pct=0.1)
    assert stats["total_rows"] == 50 and stats["total_errors"] == 0


def test_stale_bucket_data_cleared_on_resume(spark, small_df, tmp_path):
    """A bucket left uncommitted by a crash must be truncated on resume
    even when the new df has NO rows for it — stale rows must never be
    counted or committed."""
    out = str(tmp_path / "out")
    CheckpointedWriter(out, n_buckets=4).write(small_df)
    os.remove(os.path.join(out, "_lineage", "commit_3.json"))
    # resume with bucket 3 filtered out of the input entirely
    from pyspark.sql.functions import pmod, hash as fhash, col

    df2 = small_df.filter(pmod(fhash(col("doc_id")), 4) != 3)
    n2 = df2.count()
    stats = CheckpointedWriter(out, n_buckets=4).write(df2)
    assert stats["committed"] == [3]
    rec3 = [r for r in CheckpointedWriter(out, n_buckets=4).lineage() if r["bucket"] == 3][0]
    assert rec3["row_count"] == 0
    back = CheckpointedWriter(out, n_buckets=4).read(spark)
    assert back.count() == n2


def test_salted_join_spreads_hot_key(spark):
    """The big side's salt must derive from row CONTENT: a key-derived salt
    is constant per key and the hot key stays on one reducer."""
    from audiopro_essentia_spark.operators.skew import with_salt

    big = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    n = (
        with_salt(big, 8)
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 8


def test_compact_merges_small_files_identical_rows(spark, tmp_path):
    """compact() reduces per-bucket file counts, keeps every row, stays
    committed throughout, and records compaction provenance in lineage."""
    from audiopro_essentia_spark.sources.sinks import CheckpointedWriter

    out = str(tmp_path / "cp")
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    ).repartition(16)  # many tiny files per bucket
    w = CheckpointedWriter(out, n_buckets=2, key_col="doc_id")
    w.write(df)
    before = {
        (r.doc_id, r.v) for r in w.read(spark).select("doc_id", "v").collect()
    }
    import os as _os

    bdir = _os.path.join(out, "data", "bucket=0")
    n_before = len([f for f in _os.listdir(bdir) if f.endswith(".parquet")])
    assert n_before > 1

    stats = w.compact(spark, target_file_mb=128)
    assert sorted(stats["compacted"]) == [0, 1]
    n_after = len([f for f in _os.listdir(bdir) if f.endswith(".parquet")])
    assert n_after == 1
    after = {
        (r.doc_id, r.v) for r in w.read(spark).select("doc_id", "v").collect()
    }
    assert after == before
    rec = w.lineage()[0]
    assert "compacted_from" in rec and rec["snapshot_id"] != rec["compacted_from"]
    # still fully committed: resume skips everything
    again = w.write(df)
    assert again["committed"] == []


def test_compact_crash_mid_swap_recovers_on_open(spark, tmp_path):
    """A crash between compact()'s two renames leaves bucket=K missing and
    bucket=K.compact_old present; re-opening the writer heals it."""
    import os as _os
    import shutil

    from audiopro_essentia_spark.sources.sinks import CheckpointedWriter

    out = str(tmp_path / "cp2")
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.col("id").alias("v")
    )
    w = CheckpointedWriter(out, n_buckets=2, key_col="doc_id")
    w.write(df)
    n0 = w.read(spark).count()

    bdir = _os.path.join(out, "data", "bucket=0")
    _os.rename(bdir, bdir + ".compact_old")  # simulate crash mid-swap
    assert not _os.path.isdir(bdir)

    w2 = CheckpointedWriter(out, n_buckets=2, key_col="doc_id")  # heals
    assert _os.path.isdir(bdir)
    assert w2.read(spark).count() == n0

    # completed-swap leftovers are garbage-collected too
    shutil.copytree(bdir, bdir + ".compact_old")
    (tmp := _os.path.join(out, "data", "bucket=1.compact_tmp")) and None
    shutil.copytree(bdir, tmp)
    CheckpointedWriter(out, n_buckets=2, key_col="doc_id")
    assert not _os.path.exists(bdir + ".compact_old")
    assert not _os.path.exists(tmp)


def test_writer_config_drift_fails_loudly(spark, tmp_path):
    out = str(tmp_path / "drift")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("v")
    )
    CheckpointedWriter(out, n_buckets=4).write(df)
    # reopening with a different n_buckets would make committed_buckets()
    # cover the new range and stamp _SUCCESS over missing data — must raise
    with pytest.raises(ValueError, match="different writer config"):
        CheckpointedWriter(out, n_buckets=8)
    with pytest.raises(ValueError, match="different writer config"):
        CheckpointedWriter(out, n_buckets=4, key_col="other")
    # same config reopens fine, and from_meta never guesses
    assert CheckpointedWriter.from_meta(out).n_buckets == 4


def test_writer_rejects_reserved_bucket_column(spark, tmp_path):
    out = str(tmp_path / "clash")
    w = CheckpointedWriter(out, n_buckets=2)
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("bucket")
    )
    with pytest.raises(ValueError, match="reserved"):
        w.write(df)


def test_salted_agg_avg_ignores_nulls(spark):
    from audiopro_essentia_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k", 1.0), ("k", 3.0), ("k", None)], "k string, v double"
    )
    r = salted_agg(df, ("k",), n_salts=4, sums=("v",)).collect()[0]
    assert r["n_rows"] == 3 and r["sum_v"] == 4.0
    assert abs(r["avg_v"] - 2.0) < 1e-12  # SQL AVG, not sum/count(*)


def test_salted_broadcast_join_rejects_right_full(spark):
    from audiopro_essentia_spark.operators.skew import salted_broadcast_join

    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "y"), (2, "z")], "k long, b string")
    with pytest.raises(ValueError, match="salted_broadcast_join"):
        salted_broadcast_join(big, small, ("k",), how="full")


def test_get_spark_parses_local_with_retries():
    from audiopro_essentia_spark.session import get_spark

    s = get_spark(app_name="retries", master="local[2,3]")
    assert s is not None


def test_salted_broadcast_join_plan_is_broadcast(spark):
    """The salted join must stay a BroadcastHashJoin — a SortMergeJoin
    would re-introduce the hot-key shuffle the salt exists to kill."""
    big = spark.range(5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    j = salted_broadcast_join(big, small, ("k",), n_salts=4)
    j.collect()  # finalize the AdaptiveSparkPlan (CLAUDE.md: executedPlan
    # stays isFinalPlan=false until THIS DataFrame executes)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


class _StopAfter:
    """Fake stop event: is_set() turns True after n checks — drives the
    writer to a deterministic stop point without real signals (the
    writer's contract is anything with is_set())."""

    def __init__(self, n):
        self.n = n

    def is_set(self):
        self.n -= 1
        return self.n < 0


def test_writer_stop_event_between_commits_resumes_exactly_once(
    spark, small_df, tmp_path
):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=4)
    # checks: 1 before the write job + 1 per bucket commit -> n=2 stops
    # after exactly ONE bucket committed
    stats = w.write(small_df, stop_event=_StopAfter(2))
    assert stats["stopped"] is True
    assert len(stats["committed"]) == 1
    assert not os.path.exists(os.path.join(out, "_SUCCESS.json"))
    # resume with no stop: remaining three buckets commit, the stopped
    # run's bucket is skipped untouched, read-back is exactly-once
    stats2 = CheckpointedWriter(out, n_buckets=4).write(small_df)
    assert stats2["stopped"] is False
    assert sorted(stats2["committed"] + stats["committed"]) == [0, 1, 2, 3]
    assert stats2["skipped"] == stats["committed"]
    back = w.read(spark)
    assert back.count() == 1000
    assert back.select("doc_id", "v").distinct().count() == 1000
    assert os.path.exists(os.path.join(out, "_SUCCESS.json"))


def test_writer_stop_event_preset_runs_no_job(spark, small_df, tmp_path):
    out = str(tmp_path / "out")
    w = CheckpointedWriter(out, n_buckets=4)
    ev = _StopAfter(0)  # already set
    stats = w.write(small_df, stop_event=ev)
    assert stats == {
        "committed": [],
        "skipped": [],
        "failed_buckets": [],
        "total_rows": 0,
        "total_errors": 0,
        "stopped": True,
    }
    # no Spark job ran: the (eagerly created) data dir has no bucket output
    assert os.listdir(os.path.join(out, "data")) == []


def test_graceful_shutdown_signal_sets_event_and_restores_handlers():
    import signal

    from audiopro_essentia_spark.process import graceful_shutdown

    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    with graceful_shutdown() as stop:
        assert not stop.is_set()
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.wait(5.0)  # handler set the flag, process survived
    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int
