"""A16 grouped-map rhythm analog, P3 time-range slicing, S4 JSON sink,
A17 monitor, W1 streaming sliding window."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.operators.rhythm import detect_beats, extract_rhythm
from audiopro_essentia_spark.sources.sequences import slice_time_range


def test_rhythm_is_narrow_zero_exchange(spark, tiny_seqs):
    from audiopro_essentia_spark.sources.bucketed import plan_has_exchange

    assert not plan_has_exchange(extract_rhythm(tiny_seqs))


def test_rhythm_grouped_map_matches_local(spark, tiny_seqs, tiny_table):
    got = {r.doc_id: r for r in extract_rhythm(tiny_seqs).collect()}
    tbl = tiny_table.to_pydict()
    checked = 0
    for doc_id, toks in zip(tbl["doc_id"], tbl["tokens"]):
        tempo, tempo_acf, beats = detect_beats(np.asarray(toks, dtype=np.int64))
        r = got[doc_id]
        assert r.tempo == pytest.approx(tempo)
        assert r.tempo_acf == pytest.approx(tempo_acf)
        assert r.n_beats == len(beats)
        assert np.allclose(r.beats, beats)
        if len(beats) > 1:
            checked += 1
            # tempo re-estimation formula == reference utils/audio.py:82-89
            assert r.tempo == pytest.approx(
                oracle.tempo_from_boundaries(beats)
            )
    assert checked >= 1  # at least one doc with real beats


def test_detect_beats_recovers_periodic_impulse_tempo():
    """VERDICT r2 item 5 'done' gate: a synthetic doc with an impulse
    every P frames must induce T* = P via the envelope autocorrelation —
    tempo_acf == 60*sr/(P*hop) — and the tempo-constrained keep must
    recover one beat per impulse, so the median re-estimated tempo
    agrees."""
    from audiopro_essentia_spark.constants import (
        FRAME_LENGTH,
        HOP_LENGTH,
        SAMPLE_RATE,
    )

    P = 9  # impulse period in frames (not a multiple of min_sep to be sure)
    n_frames = 80
    toks = np.zeros(FRAME_LENGTH + (n_frames - 1) * HOP_LENGTH, dtype=np.int64)
    # one-hop-wide bursts every P frames: frame energy spikes at those frames
    for k in range(0, n_frames, P):
        s = k * HOP_LENGTH
        toks[s : s + HOP_LENGTH] = 40
    tempo, tempo_acf, beats = detect_beats(toks)
    assert tempo_acf == pytest.approx(60.0 * SAMPLE_RATE / (P * HOP_LENGTH))
    # beats land once per impulse -> median interval = P frames
    assert tempo == pytest.approx(60.0 * SAMPLE_RATE / (P * HOP_LENGTH))
    assert len(beats) >= n_frames // P - 2
    # off-period double-fires are vetoed by the induced period:
    # min observed separation >= P//2 frames
    if len(beats) > 1:
        min_gap = np.diff(beats).min() * SAMPLE_RATE / HOP_LENGTH
        assert min_gap >= P // 2


def test_time_range_slice(spark, tiny_seqs):
    # [0.01s, 0.03s) at sr=44100 -> samples [441, 1323)
    out, start = slice_time_range(tiny_seqs, 0.01, 0.03)
    assert start == 441
    rows = {r.doc_id: r for r in out.collect()}
    full = {r.doc_id: r for r in tiny_seqs.collect()}
    for doc_id, r in rows.items():
        orig = full[doc_id].tokens
        exp = orig[441 : min(1323, len(orig))]
        assert list(r.tokens) == list(exp), doc_id
        assert r.n_tok == len(exp)


def test_time_range_offsets_frame_times(spark, tiny_seqs):
    from audiopro_essentia_spark.operators.framing import frame_tokens

    out, start = slice_time_range(tiny_seqs, 0.1, None)
    framed = frame_tokens(out, start_sample=start).filter(
        "doc_id = 'doc000007' and frame_idx = 0"
    )
    row = framed.collect()[0]
    # time_ms = (start_sample + 0)/sr*1000 (processors.py:281-283)
    assert row.time_ms == pytest.approx(oracle.frame_time_ms(0, start_sample=start))


def test_json_sink(spark, tmp_path):
    from audiopro_essentia_spark.sources.sinks import CheckpointedWriter

    df = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("v"),
    )
    w = CheckpointedWriter(str(tmp_path / "o"), n_buckets=2, fmt="json")
    stats = w.write(df)
    assert stats["total_rows"] == 100
    back = w.read(spark)
    assert back.count() == 100


def test_monitor_summary():
    import time

    from audiopro_essentia_spark.monitor import PerformanceMonitor

    m = PerformanceMonitor(interval=0.05).start()
    _ = sum(i * i for i in range(3_000_000))  # burn some CPU
    time.sleep(0.3)
    m.stop()
    s = m.summary()
    assert s["samples"] >= 3
    assert 0 <= s["avg_cpu_pct"] <= 100 * s["n_cpus"]
    assert s["peak_rss_gb"] > 0


def test_streaming_sliding_window(spark):
    import __spark_entry__  # noqa: F401  (sys.path side effect)
    from audiopro_essentia_spark.streaming.stream_ops import (
        run_to_memory,
        sliding_window_agg,
    )
    import os
    import tempfile

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    d = tempfile.mkdtemp()
    os.symlink(f"{sf}/events.parquet", os.path.join(d, "e.parquet"))
    stream = spark.readStream.schema(ev.schema).parquet(d)
    out = run_to_memory(
        sliding_window_agg(stream, window_dur="3600 seconds", hop="900 seconds"),
        "slide_out",
    )
    rows = out.collect()
    assert len(rows) > 0
    # spot-check one finalized window against a batch computation
    r = rows[len(rows) // 2]
    batch = ev.filter(
        (F.col("ts").cast("timestamp") >= r.window.start)
        & (F.col("ts").cast("timestamp") < r.window.end)
        & (F.col("user_id") == r.user_id)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(F.avg(F.col("value") * F.col("value"))).alias("rms"),
    ).collect()[0]
    assert batch.n == r.n_events
    assert batch.rms == pytest.approx(r.rms)


def test_rhythm_chunked_ingestion_matches_whole_doc(spark, tiny_seqs):
    """Chunk reassembly (grouped-map) == whole-doc rhythm, independent of
    chunk boundaries and row order."""
    from audiopro_essentia_spark.operators.rhythm import (
        extract_rhythm,
        extract_rhythm_chunked,
    )

    whole = {r.doc_id: (r.tempo, r.n_beats) for r in extract_rhythm(tiny_seqs).collect()}
    # split each doc into 3 uneven chunks, shuffle row order
    chunked = (
        tiny_seqs.select(
            "doc_id",
            F.posexplode(
                F.array(
                    F.slice("tokens", 1, 1000),
                    F.slice("tokens", 1001, 2500),
                    F.expr("slice(tokens, 3501, size(tokens))"),
                )
            ).alias("chunk_idx", "tokens"),
        )
        .orderBy(F.md5(F.concat_ws(":", "doc_id", F.col("chunk_idx").cast("string"))))
    )
    got = {
        r.doc_id: (r.tempo, r.n_beats)
        for r in extract_rhythm_chunked(chunked).collect()
    }
    assert got == whole
