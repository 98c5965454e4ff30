"""operators/deltas.py (delta regression + CMVN) and
sources/sequences.with_sequence_metadata — hand-computed goldens.

The driver's DuckDB twins re-verify the fixture-scale queries
(`mfcc_delta`, `seq_metadata`) at sf0.01; these tests pin the semantics
on hand-built frames where every number is derived in the comment.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.operators.deltas import (  # noqa: E402
    with_cmvn,
    with_frame_deltas,
)
from audiopro_essentia_spark.sources.sequences import (  # noqa: E402
    with_sequence_metadata,
)


def _delta_ref(xs, width=2):
    """Pure-python HTK delta with edge replication (the module spec)."""
    n = len(xs)
    denom = 2.0 * sum(k * k for k in range(1, width + 1))
    out = []
    for t in range(n):
        acc = 0.0
        for k in range(1, width + 1):
            fut = xs[min(t + k, n - 1)]
            pst = xs[max(t - k, 0)]
            if fut is None or pst is None:
                acc = None
                break
            acc += k * (fut - pst)
        out.append(None if acc is None else acc / denom)
    return out


def test_delta_matches_reference_formula(spark):
    xs = [1.0, 4.0, 9.0, 16.0, 25.0, 36.0]
    df = spark.createDataFrame(
        [("d", i, v) for i, v in enumerate(xs)], ["doc_id", "frame_idx", "x"]
    )
    got = (
        with_frame_deltas(df, ("x",))
        .orderBy("frame_idx")
        .select("x_d1")
        .collect()
    )
    want = _delta_ref(xs)
    for g, w in zip(got, want):
        assert g.x_d1 == pytest.approx(w, abs=1e-12)


def test_delta_edge_replication_exact(spark):
    # 3 frames [a,b,c]: t=0 replicates a for both lags ->
    # (1*(b-a) + 2*(c-a))/10; t=2 replicates c for both leads.
    a, b, c = 2.0, 7.0, 5.0
    df = spark.createDataFrame(
        [("d", 0, a), ("d", 1, b), ("d", 2, c)], ["doc_id", "frame_idx", "x"]
    )
    got = [
        r.x_d1
        for r in with_frame_deltas(df, ("x",))
        .orderBy("frame_idx")
        .collect()
    ]
    assert got[0] == pytest.approx((1 * (b - a) + 2 * (c - a)) / 10.0)
    assert got[1] == pytest.approx((1 * (c - a) + 2 * (c - a)) / 10.0)
    assert got[2] == pytest.approx((1 * (c - b) + 2 * (c - a)) / 10.0)


def test_delta_null_propagates_and_doc_isolation(spark):
    # NULL at frame 1 poisons every delta whose NEIGHBOR window touches
    # it; the regression never reads the center value, so frame 1's own
    # delta is defined: (1*(x2-x0) + 2*(x3-x0_replicated))/10 = 0.8.
    # Doc "e" (single frame) gets delta 0 (all terms replicate the frame).
    df = spark.createDataFrame(
        [("d", 0, 1.0), ("d", 1, None), ("d", 2, 3.0), ("d", 3, 4.0),
         ("e", 0, 9.0)],
        ["doc_id", "frame_idx", "x"],
    )
    rows = {
        (r.doc_id, r.frame_idx): r.x_d1
        for r in with_frame_deltas(df, ("x",)).collect()
    }
    assert rows[("d", 0)] is None  # lead1 reads frame 1
    assert rows[("d", 1)] == pytest.approx((1 * (3 - 1) + 2 * (4 - 1)) / 10.0)
    assert rows[("d", 2)] is None  # lag1 reads frame 1
    assert rows[("d", 3)] is None  # lag2 reads frame 1
    assert rows[("e", 0)] == pytest.approx(0.0)


def test_cmvn_moments(spark):
    xs = [2.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [("d", i, v) for i, v in enumerate(xs)], ["doc_id", "frame_idx", "x"]
    )
    mean = sum(xs) / 3.0
    var = sum((v - mean) ** 2 for v in xs) / 3.0
    cmn = {
        r.frame_idx: r.x_cmn
        for r in with_cmvn(df, ("x",)).collect()
    }
    assert cmn == {
        i: pytest.approx(v - mean, abs=1e-12) for i, v in enumerate(xs)
    }
    cmvn = {
        r.frame_idx: r.x_cmvn
        for r in with_cmvn(df, ("x",), variance=True, suffix="_cmvn").collect()
    }
    for i, v in enumerate(xs):
        assert cmvn[i] == pytest.approx(
            (v - mean) / math.sqrt(var + 1e-10), abs=1e-9
        )


def test_sequence_metadata_golden(spark):
    df = spark.createDataFrame(
        [("a", [3, 1, 4, 1, 5]), ("b", [7]), ("c", [2, 2, 2])],
        ["doc_id", "tokens"],
    )
    rows = {r.doc_id: r for r in with_sequence_metadata(df).collect()}
    a = rows["a"]
    assert a.content_md5 == hashlib.md5(b"3,1,4,1,5").hexdigest()
    assert a.content_sha256 == hashlib.sha256(b"3,1,4,1,5").hexdigest()
    assert a.n_tok == 5
    assert a.duration_sec == pytest.approx(round(5 / 44100.0, 6))
    assert (a.sample_rate, a.channels, a.codec) == (44100, 1, "tokens-v1")
    assert (a.vocab_size, a.tok_min, a.tok_max) == (4, 1, 5)
    assert a.bit_rate == 2 * 44100  # ceil(log2(4)) = 2 — exact-power edge
    b = rows["b"]
    assert (b.vocab_size, b.bit_rate) == (1, 1 * 44100)  # vocab<=1 floor
    c = rows["c"]
    assert c.content_md5 == hashlib.md5(b"2,2,2").hexdigest()
    assert (c.vocab_size, c.tok_min, c.tok_max) == (1, 2, 2)


def test_snapshot_diff_statuses(spark):
    from audiopro_essentia_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (5, None)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d"), (5, "")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "same",
        2: "changed",
        3: "removed",
        4: "added",
        5: "same",  # NULL and '' digest identically — documented
    }


def test_snapshot_diff_driver_class_counts(spark):
    """The q_snapshot_diff mutation must make every class non-vacuous at
    sf0.001 and partition exactly: removed+same+changed = |old| and
    added = |removed| (re-added under shifted ids)."""
    import __spark_entry__ as e

    out = e.queries()["snapshot_diff"](spark, "/root/testdata/sf0.001")
    counts = {r.status: r.n for r in
              out.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"added", "removed", "changed", "same"}
    assert counts["added"] == counts["removed"]
