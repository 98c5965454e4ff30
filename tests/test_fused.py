"""Fused mapInPandas path must be semantically IDENTICAL to the
explode+slice+kernel path and to the numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.operators.fused import (
    fused_frame_features,
    nest_frequency_bands,
)

SCALARS = (
    "rms",
    "volume",
    "zero_crossing_rate",
    "spectral_centroid",
    "spectral_bandwidth",
    "spectral_flatness",
    "spectral_rolloff",
)


@pytest.fixture(scope="module")
def fused_rows(spark, tiny_seqs):
    df = nest_frequency_bands(fused_frame_features(tiny_seqs))
    return df.orderBy("doc_id", "frame_idx").collect()


def test_fused_full_oracle_parity(fused_rows, tiny_table):
    exp_map = {}
    tbl = tiny_table.to_pydict()
    for doc_id, toks in zip(tbl["doc_id"], tbl["tokens"]):
        wins = oracle.frame_windows(np.asarray(toks, dtype=np.int32))
        for i, w in enumerate(wins):
            exp_map[(doc_id, i)] = oracle.frame_features(w)
    assert len(fused_rows) == len(exp_map) > 100
    for row in fused_rows:
        exp = exp_map[(row.doc_id, row.frame_idx)]
        if exp is None:
            assert row.ferror is not None
            continue
        assert row.ferror is None
        for k in SCALARS:
            assert np.allclose(getattr(row, k), exp[k], rtol=1e-5, atol=1e-8), (
                k, row.doc_id, row.frame_idx,
            )
        assert np.allclose(row.mfcc, exp["mfcc"], rtol=1e-5, atol=1e-8)
        assert np.allclose(row.chroma, exp["chroma"], rtol=1e-3, atol=1e-6)
        got_fb = row.frequency_bands.asDict()
        for b, v in exp["frequency_bands"].items():
            assert np.allclose(got_fb[b], v, rtol=1e-5, atol=1e-8)
        assert row.time_ms == pytest.approx(oracle.frame_time_ms(row.frame_idx))


def test_fused_timestamps_match_framing_path(spark, tiny_seqs):
    from audiopro_essentia_spark.operators.framing import frame_tokens

    fused = {
        (r.doc_id, r.frame_idx): (r.event_ts, r.available_ts)
        for r in fused_frame_features(
            tiny_seqs, features=("rms",)
        ).collect()
    }
    framed = {
        (r.doc_id, r.frame_idx): (r.event_ts, r.available_ts)
        for r in frame_tokens(tiny_seqs, with_window=False).collect()
    }
    assert fused.keys() == framed.keys()
    for k, v in framed.items():
        assert fused[k] == v, k


def test_fused_feature_pushdown(spark, tiny_seqs):
    df = fused_frame_features(tiny_seqs, features=("rms", "volume"))
    assert "rms" in df.columns and "mfcc" not in df.columns
    n = df.count()
    assert n > 100


def test_fused_timestamps_half_up_on_exact_ties(spark):
    """Power-of-two sample rate makes start*1e6/sr land on exact .5 µs
    ties; both paths must round HALF_UP identically (np.round would
    banker's-round and diverge by 1 µs)."""
    import pandas as pd
    import pyarrow as pa

    from audiopro_essentia_spark.operators.framing import frame_tokens

    tbl = pa.table(
        {
            "doc_id": ["tie"],
            "tokens": [list(range(64))],
            "base_ts": [pd.Timestamp("2024-01-01")],
        }
    )
    df = spark.createDataFrame(tbl.to_pandas())
    kw = dict(frame_length=8, hop=3, sample_rate=128)  # 1e6/128 = 7812.5
    fused = {
        r.frame_idx: (r.event_ts, r.available_ts)
        for r in fused_frame_features(df, features=("rms",), **kw).collect()
    }
    framed = {
        r.frame_idx: (r.event_ts, r.available_ts)
        for r in frame_tokens(
            df, with_window=False, carry_cols=(), **kw
        ).collect()
    }
    assert fused == framed and len(fused) > 10


def test_fused_null_base_ts_yields_null_timestamps(spark):
    import pandas as pd
    import pyarrow as pa

    tbl = pa.table(
        {
            "doc_id": ["a", "b"],
            "tokens": [list(range(32)), list(range(32))],
            "base_ts": [pd.Timestamp("2024-01-01"), None],
        }
    )
    df = spark.createDataFrame(tbl.to_pandas())
    rows = fused_frame_features(
        df, features=("rms",), frame_length=8, hop=4
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.event_ts, r.available_ts))
    assert all(e is not None and a is not None for e, a in by_doc["a"])
    assert all(e is None and a is None for e, a in by_doc["b"])


def test_analyze_sequences_unfused_path_matches_fused(spark, tmp_path):
    """The oracle-form composition (fused=False: split_quarantine ->
    frame_tokens -> with_frame_features) must equal the fused kernel
    pipeline row-for-row on the shared scalar features."""
    import pyarrow.parquet as pq

    from audiopro_essentia_spark.fixtures import make_sequences
    from audiopro_essentia_spark.plans.pipeline import analyze_sequences

    p = str(tmp_path / "seqs.parquet")
    pq.write_table(make_sequences(profile="tiny"), p)

    res_f = analyze_sequences(spark, p, repartition_output=False, fused=True)
    res_u = analyze_sequences(spark, p, repartition_output=False, fused=False)
    cols = ["doc_id", "frame_idx", "rms", "volume", "spectral_centroid"]

    def snap(df):
        return {
            (r.doc_id, r.frame_idx): (
                round(r.rms, 9), round(r.volume, 9),
                round(r.spectral_centroid, 9),
            )
            for r in df.select(*cols).collect()
        }

    a, b = snap(res_f["frame_features"]), snap(res_u["frame_features"])
    assert len(a) == len(b) > 100
    assert a == b


def test_fused_null_tokens_row_skipped_not_crashed(spark):
    from pyspark.sql import types as T2

    from audiopro_essentia_spark.operators.fused import fused_frame_features

    schema = T2.StructType([
        T2.StructField("doc_id", T2.StringType()),
        T2.StructField("tokens", T2.ArrayType(T2.IntegerType())),
    ])
    df = spark.createDataFrame(
        [("ok", list(range(64))), ("nulldoc", None)], schema
    )
    out = fused_frame_features(
        df, features=("rms",), frame_length=16, hop=8, with_timestamps=False
    ).collect()
    assert {r["doc_id"] for r in out} == {"ok"}


def test_fused_null_token_element_flags_nonfinite(spark):
    # Arrow delivers a null ELEMENT as NaN in a float array (not an
    # object array), so it flows into the kernel's nonfinite guard: the
    # frames covering it get ferror='nonfinite_frame' + NULL features,
    # exactly the reference's bad-frame semantics — not a crash, not a
    # silent number. (The object-dtype ValueError in fused.py remains as
    # a defensive guard for exotic Arrow paths.)
    from pyspark.sql import types as T2

    from audiopro_essentia_spark.operators.fused import fused_frame_features

    schema = T2.StructType([
        T2.StructField("doc_id", T2.StringType()),
        T2.StructField("tokens", T2.ArrayType(T2.IntegerType())),
    ])
    df = spark.createDataFrame(
        [("bad", [1, None] + list(range(62)))], schema
    )
    rows = fused_frame_features(
        df, features=("rms",), frame_length=16, hop=8, with_timestamps=False
    ).collect()
    by_idx = {r["frame_idx"]: r for r in rows}
    assert by_idx[0]["ferror"] == "nonfinite_frame"  # covers the null
    assert by_idx[0]["rms"] is None
    assert by_idx[2]["ferror"] is None  # past the null: clean frame
    assert by_idx[2]["rms"] is not None
