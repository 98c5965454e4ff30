"""cluster_safe_split — leakage-safe (cluster-atomic) train/val/test.

Hand-built dup corpus with an exact python mirror of the split hash;
the driver's DuckDB twin re-verifies at sf0.01 (leak_split)."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.functions.sampling import (  # noqa: E402
    cluster_safe_split,
    per_mille,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _expected_split(cluster_id: int, weights) -> str:
    b = _h32(f"{cluster_id}") % 1000
    cum = 0.0
    for name, w in weights.items():
        cum += w
        if b < per_mille(cum):
            return name
    raise AssertionError("non-exhaustive weights")


WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _run(spark, ids, cluster_rows):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    clusters = spark.createDataFrame(
        cluster_rows or [(None, None)], "doc_id long, cluster_id long"
    )
    if not cluster_rows:
        clusters = clusters.filter(F.col("doc_id").isNotNull())
    return {
        r["doc_id"]: r
        for r in cluster_safe_split(docs, clusters, WEIGHTS).collect()
    }


def test_cluster_members_share_split_and_singletons_fall_back(spark):
    ids = list(range(100))
    # docs 3,7,11 are one near-dup cluster (canonical 3); 20,21 another
    cluster_rows = [(3, 3), (7, 3), (11, 3), (20, 20), (21, 20)]
    out = _run(spark, ids, cluster_rows)

    assert len(out) == 100  # exhaustive: every doc got a split
    for i, c in [(3, 3), (7, 3), (11, 3), (20, 20), (21, 20)]:
        assert out[i]["cluster_id"] == c
    # cluster-atomic: all members carry the cluster's split
    assert out[3]["split"] == out[7]["split"] == out[11]["split"]
    assert out[20]["split"] == out[21]["split"]
    # and that split is the hash of the CLUSTER id, not the doc id
    assert out[7]["split"] == _expected_split(3, WEIGHTS)
    assert out[21]["split"] == _expected_split(20, WEIGHTS)
    # singletons: own id is the key
    for i in (0, 50, 99):
        assert out[i]["cluster_id"] == i
        assert out[i]["split"] == _expected_split(i, WEIGHTS)


def test_split_is_stable_under_corpus_growth(spark):
    """A doc's split must not change when unrelated docs are added —
    the property that makes incremental corpus refreshes safe."""
    small = _run(spark, list(range(30)), [(1, 1), (2, 1)])
    big = _run(spark, list(range(300)), [(1, 1), (2, 1)])
    for i in range(30):
        assert small[i]["split"] == big[i]["split"]


def test_no_cluster_straddles_splits(spark):
    ids = list(range(400))
    # every 4th doc joins cluster (i // 8) * 8 — several multi-member
    cluster_rows = [(i, (i // 8) * 8) for i in ids if i % 4 == 0]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    clusters = spark.createDataFrame(
        cluster_rows, "doc_id long, cluster_id long"
    )
    out = cluster_safe_split(docs, clusters, WEIGHTS)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0


def test_bad_weights_fail_loud(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    clusters = docs.withColumn("cluster_id", F.col("doc_id"))
    with pytest.raises(ValueError, match="sum to 1.0"):
        cluster_safe_split(docs, clusters, {"train": 0.5, "val": 0.1})
