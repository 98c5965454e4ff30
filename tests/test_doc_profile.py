"""doc_profile_fused (vectorized pass) must equal the expression forms
with_doc_stats + reject_reason_col, and the pipeline built on it must keep
its quarantine semantics."""

from __future__ import annotations

import numpy as np
import pytest

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.operators.aggregates import (
    doc_profile_fused,
    with_doc_stats,
)

KEYS = (
    "peak_amplitude",
    "rms_amplitude",
    "dynamic_range_db",
    "dc_offset",
    "silence_ratio",
    "potentially_clipped",
    "signal_energy",
)


def test_profile_equals_expression_forms(spark, tiny_seqs):
    prof = {r.doc_id: r for r in doc_profile_fused(tiny_seqs).collect()}
    expr = {r.doc_id: r for r in with_doc_stats(tiny_seqs).collect()}
    assert prof.keys() == expr.keys()
    for doc_id, p in prof.items():
        e = expr[doc_id]
        for k in KEYS:
            assert np.allclose(getattr(p, k), getattr(e, k), rtol=1e-12), (
                doc_id, k,
            )


def test_profile_reject_matches_oracle(spark, tiny_seqs, tiny_table):
    prof = {r.doc_id: r.reject_reason for r in doc_profile_fused(tiny_seqs).collect()}
    tbl = tiny_table.to_pydict()
    for doc_id, toks in zip(tbl["doc_id"], tbl["tokens"]):
        assert prof[doc_id] == oracle.reject_reason(
            np.asarray(toks, dtype=np.int64)
        ), doc_id


def test_pipeline_quarantine_and_validated_frames(spark, tmp_path):
    import pyarrow.parquet as pq

    from audiopro_essentia_spark.fixtures import make_sequences
    from audiopro_essentia_spark.plans.pipeline import analyze_sequences

    p = str(tmp_path / "seqs.parquet")
    pq.write_table(make_sequences(profile="tiny"), p)
    res = analyze_sequences(spark, p, repartition_output=False)
    reasons = {r.doc_id: r.reject_reason for r in res["quarantine"].collect()}
    assert reasons["doc000100"] == "low_energy"
    assert reasons["doc000102"] == "empty"
    assert reasons["doc000000"] == "too_short"
    # rejected docs produce NO frames (validated in-kernel)
    frame_docs = {
        r.doc_id for r in res["frame_features"].select("doc_id").distinct().collect()
    }
    assert frame_docs.isdisjoint(reasons)
    # accepted docs all framed
    meta_docs = {r.doc_id for r in res["doc_metadata"].select("doc_id").collect()}
    assert frame_docs == meta_docs
