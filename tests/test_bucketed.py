"""Bucketed co-located joins: same-bucketed tables join with NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.sources.bucketed import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    feats = spark.range(2000).select(
        F.concat(F.lit("doc"), (F.col("id") % 100).cast("string")).alias("doc_id"),
        F.col("id").alias("frame_idx"),
        (F.col("id") * 1.5).alias("rms"),
    )
    labels = spark.range(100).select(
        F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") * 2.0).alias("label"),
    )
    write_bucketed(feats, "bt_feats", n_buckets=8, sort_col="doc_id")
    write_bucketed(labels, "bt_labels", n_buckets=8, sort_col="doc_id")
    yield "bt_feats", "bt_labels"
    spark.sql("DROP TABLE IF EXISTS bt_feats")
    spark.sql("DROP TABLE IF EXISTS bt_labels")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the co-location (not a broadcast) kills the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "doc_id")
        assert not plan_has_exchange(j), "bucketed join still shuffles"
        # and a plain (non-bucketed) join DOES shuffle, for contrast
        plain = spark.table(lt).join(
            spark.table(rt).withColumn("label", F.col("label") + 0), "doc_id"
        )
        assert plain.count() == j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_values_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "doc_id")
    row = j.filter("doc_id = 'doc7' and frame_idx = 7").collect()[0]
    assert row.label == 14.0
