"""W1/W2 framing parity: exact window equality vs the numpy oracle
(BASELINE.json: "exact token-array equality on reconstructed windows")."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.constants import FRAME_LENGTH, HOP_LENGTH, SAMPLE_RATE
from audiopro_essentia_spark.operators.framing import frame_tokens


def test_frame_count_formula():
    # reference extractor.py:149 + odd-trim audio_loader.py:84-86
    assert oracle.n_frames(100) == 0
    assert oracle.n_frames(2047) == 0
    assert oracle.n_frames(2048) == 1
    assert oracle.n_frames(2049) == 1  # odd-trim -> 2048
    assert oracle.n_frames(2048 + 512) == 2
    assert oracle.n_frames(10240) == 1 + (10240 - 2048) // 512


@given(n=st.integers(min_value=0, max_value=30000))
@settings(max_examples=60, deadline=None)
def test_frame_windows_match_sliding_view(n):
    toks = np.arange(n, dtype=np.int32)
    w = oracle.frame_windows(toks)
    t = oracle.trim_odd(toks)
    assert len(w) == oracle.n_frames(n)
    if len(t) >= FRAME_LENGTH:
        sv = np.lib.stride_tricks.sliding_window_view(t, FRAME_LENGTH)[::HOP_LENGTH]
        assert np.array_equal(w, sv)


@pytest.mark.usefixtures("spark")
def test_spark_framing_exact_parity(spark, tiny_seqs, tiny_table):
    framed = frame_tokens(tiny_seqs).orderBy("doc_id", "frame_idx")
    got = framed.collect()

    # oracle per doc
    expected = {}
    tbl = tiny_table.to_pydict()
    for doc_id, toks in zip(tbl["doc_id"], tbl["tokens"]):
        wins = oracle.frame_windows(np.asarray(toks, dtype=np.int32))
        expected[doc_id] = wins

    seen: dict[str, int] = {}
    for row in got:
        w = expected[row.doc_id][row.frame_idx]
        assert np.array_equal(np.asarray(row.window, dtype=np.int32), w), (
            row.doc_id,
            row.frame_idx,
        )
        assert row.time_ms == pytest.approx(
            oracle.frame_time_ms(row.frame_idx), rel=0, abs=1e-9
        )
        seen[row.doc_id] = seen.get(row.doc_id, 0) + 1

    for doc_id, wins in expected.items():
        assert seen.get(doc_id, 0) == len(wins), doc_id
    # docs with n_tok < F produce no frames (quarantine path)
    assert "doc000000" not in seen  # n_tok=100


def test_event_and_available_ts(spark, tiny_seqs):
    row = (
        frame_tokens(tiny_seqs)
        .filter("doc_id = 'doc000006' and frame_idx = 3")
        .collect()[0]
    )
    base_us = 1_767_225_600_000_000 + 6 * 1_000_000  # 2026-01-01 + 6s
    start = 3 * HOP_LENGTH
    exp_event = base_us + round(start / SAMPLE_RATE * 1e6)
    exp_avail = base_us + round((start + FRAME_LENGTH - 1) / SAMPLE_RATE * 1e6)
    import calendar

    got_event = calendar.timegm(row.event_ts.timetuple()) * 1_000_000 + row.event_ts.microsecond
    got_avail = calendar.timegm(row.available_ts.timetuple()) * 1_000_000 + row.available_ts.microsecond
    assert got_event == exp_event
    assert got_avail == exp_avail
    # leakage rule: available_ts strictly after event_ts (frame END)
    assert row.available_ts > row.event_ts
