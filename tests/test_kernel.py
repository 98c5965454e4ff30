"""A1-A11 fused-kernel parity vs the numpy oracle at every
doc_id x frame_idx (np.allclose gate per FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np
import pytest

from audiopro_essentia_spark import oracle
from audiopro_essentia_spark.constants import ALL_FRAME_FEATURES, FREQUENCY_BANDS
from audiopro_essentia_spark.operators.framing import frame_tokens
from audiopro_essentia_spark.operators.kernel import with_frame_features

RTOL = 1e-5
ATOL = 1e-8
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
def features_df(spark, tiny_seqs):
    frames = frame_tokens(tiny_seqs)
    return with_frame_features(frames).orderBy("doc_id", "frame_idx").collect()


@pytest.fixture(scope="module")
def oracle_map(tiny_table):
    out = {}
    tbl = tiny_table.to_pydict()
    for doc_id, toks in zip(tbl["doc_id"], tbl["tokens"]):
        wins = oracle.frame_windows(np.asarray(toks, dtype=np.int32))
        for i, w in enumerate(wins):
            out[(doc_id, i)] = oracle.frame_features(w)
    return out


def test_full_parity_every_frame(features_df, oracle_map):
    assert len(features_df) == len(oracle_map) > 100
    for row in features_df:
        exp = oracle_map[(row.doc_id, row.frame_idx)]
        if exp is None:
            # zero-spectrum frame (all-zero doc): engine tags ferror
            assert row.ferror is not None, (row.doc_id, row.frame_idx)
            continue
        assert row.ferror is None, (row.doc_id, row.frame_idx, row.ferror)
        for k in SCALARS:
            assert np.allclose(getattr(row, k), exp[k], rtol=RTOL, atol=ATOL), (
                k,
                row.doc_id,
                row.frame_idx,
                getattr(row, k),
                exp[k],
            )
        assert np.allclose(row.mfcc, exp["mfcc"], rtol=RTOL, atol=ATOL)
        assert np.allclose(row.chroma, exp["chroma"], rtol=1e-3, atol=1e-6)
        got_fb = row.frequency_bands.asDict()
        for b in FREQUENCY_BANDS:
            assert np.allclose(
                got_fb[b], exp["frequency_bands"][b], rtol=RTOL, atol=ATOL
            ), (b, row.doc_id, row.frame_idx)


def _parab_triple(M, alpha, p0):
    """Spectrum triple (a, b, c) of the parabola with vertex (p0, M):
    parabolic interpolation must recover p0 and M EXACTLY."""
    return (
        M - alpha * (1 + p0) ** 2,
        M - alpha * p0**2,
        M - alpha * (1 - p0) ** 2,
    )


def test_chroma_hpcp_interpolated_fold_two_tone():
    """Numpy golden for the HPCP-shaped fold (VERDICT r2 item 4) on a
    synthetic two-peak spectrum at the PRODUCTION geometry:
    - parabolic interpolation recovers the vertex exactly, and the
      recovered (not bin-center) frequency decides the pitch class:
      bin 25 (538.3 Hz -> pc 3) with vertex offset +0.45 (543.1 Hz)
      must fold dominantly onto pc 4;
    - the squared-cosine split between the two straddled classes matches
      the closed form (weights sum to 1 at windowSize=1);
    - the 40-5000 Hz default gate excludes a LOUDER 6008 Hz peak, which
      takes over under a full-range chroma_band."""
    from audiopro_essentia_spark.operators.kernel import chroma_fold

    SR, F = 44100, 2048
    step = SR / F
    k0, p0, M = 25, 0.45, 3.0
    k1, M1 = 279, 50.0  # 279 * 21.53 = 6008 Hz > 5000 -> gated off
    spec = np.zeros((1, F // 2 + 1))
    spec[0, k0 - 1 : k0 + 2] = _parab_triple(M, 1.0, p0)
    spec[0, k1 - 1 : k1 + 2] = _parab_triple(M1, 1.0, 0.0)
    got = chroma_fold(spec, SR, F)[0]

    s = np.mod(12.0 * np.log2((k0 + p0) * step / 440.0), 12.0)  # 3.801
    lo_pc, frac = int(np.floor(s)), s - np.floor(s)
    w_lo = np.cos(np.pi / 2.0 * frac) ** 2
    w_hi = np.cos(np.pi / 2.0 * (1.0 - frac)) ** 2
    assert int(np.argmax(got)) == lo_pc + 1 == 4  # interpolated class wins
    exp = np.zeros(12)
    exp[lo_pc], exp[lo_pc + 1] = w_lo * M * M, w_hi * M * M
    exp /= exp.max()
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12)
    # bin-CENTER class (3) must NOT be the argmax — interpolation matters
    assert got[3] < got[4]

    full = chroma_fold(spec, SR, F, chroma_band=(0.0, SR / 2.0))[0]
    s1 = np.mod(12.0 * np.log2(k1 * step / 440.0), 12.0)
    assert int(np.argmax(full)) == int(np.round(s1)) % 12
    assert full.max() == 1.0


def test_chroma_hpcp_harmonics_subfold():
    """harmonics=h re-folds each peak at f/1..f/(h+1) with energy/n
    (re-spec; the reference runs the es.HPCP default harmonics=0).
    h=1 only adds f/2 — one octave down, the SAME pitch class — so the
    normalized fold is invariant; h=2 adds f/3 (octave+fifth down),
    which must light the class a fifth below at energy/3."""
    from audiopro_essentia_spark.operators.kernel import chroma_fold

    SR, F = 44100, 2048
    step = SR / F
    k0 = int(round(880.0 / step))  # bin 41 -> 882.8 Hz -> pc 0 (A-ish)
    spec = np.zeros((1, F // 2 + 1))
    spec[0, k0 - 1 : k0 + 2] = _parab_triple(4.0, 1.0, 0.0)
    plain = chroma_fold(spec, SR, F, harmonics=0)[0]
    octave = chroma_fold(spec, SR, F, harmonics=1)[0]
    assert np.allclose(plain, octave)  # f/2 folds onto the same class

    fifth = chroma_fold(spec, SR, F, harmonics=2)[0]
    s1 = np.mod(12.0 * np.log2(k0 * step / 440.0), 12.0)
    p_main = int(np.round(s1)) % 12
    s3 = np.mod(s1 - 12.0 * np.log2(3.0), 12.0)  # ~7.02 below, mod 12
    assert int(np.argmax(fifth)) == p_main
    # closed form: max class holds cos^2(d_main)-weighted M^2*(1 + 1/2)
    # (f and f/2 stack); each sub class gets its cos^2 share of M^2/3
    d_main = min(abs(s1 - p_main), 12.0 - abs(s1 - p_main))
    w_main = np.cos(np.pi / 2.0 * d_main) ** 2
    for pc in (int(np.floor(s3)), (int(np.floor(s3)) + 1) % 12):
        d = abs(s3 - pc)
        d = min(d, 12.0 - d)
        w = np.cos(np.pi / 2.0 * d) ** 2 if d <= 1.0 else 0.0
        exp = (w / 3.0) / (1.5 * w_main)
        assert np.isclose(fifth[pc % 12], exp, rtol=1e-9), (pc, exp)
        assert plain[pc % 12] == 0.0


def test_silence_doc_volume_floor(features_df):
    """All-zero doc: rms=0, volume=20*log10(eps) (processors.py:167-177);
    spectral features NULL (zero spectrum dropped in reference)."""
    rows = [r for r in features_df if r.doc_id == "doc000100"]
    assert rows
    for r in rows:
        assert r.rms == 0.0
        assert np.isclose(r.volume, 20 * np.log10(np.finfo(float).eps))
        assert r.ferror is not None


def test_feature_selection_pushdown(spark, tiny_seqs):
    """P1/P2: only requested features appear; no spectral work requested ->
    no spectrum columns (analog of needs_spectrum, processors.py:190-194)."""
    frames = frame_tokens(tiny_seqs).limit(50)
    df = with_frame_features(frames, features=("rms", "volume"))
    assert "rms" in df.columns and "volume" in df.columns
    assert "spectral_centroid" not in df.columns
    assert "mfcc" not in df.columns
    rows = df.collect()
    assert all(r.rms is not None for r in rows)


def test_all_features_present_by_default(features_df):
    row = features_df[0]
    for f in ALL_FRAME_FEATURES:
        assert hasattr(row, f)


def test_spectral_flux_matches_numpy_golden(spark, tiny_seqs):
    """flux[t] = sum(max(0, |S_t| - |S_{t-1}|)) with the kernel's exact
    f32-quantize/Hann recipe; first frame of each doc is 0.0."""
    import numpy as np

    from audiopro_essentia_spark.constants import (
        FRAME_LENGTH,
        HOP_LENGTH,
        SAMPLE_RATE,
        TOKEN_SCALE,
    )
    from audiopro_essentia_spark.operators.flux import spectral_flux
    from audiopro_essentia_spark.operators.kernel import _consts

    frames = frame_tokens(tiny_seqs, carry_cols=(), base_ts_col=None)
    got = {
        (r.doc_id, r.frame_idx): (r.flux, r.is_onset)
        for r in spectral_flux(frames).collect()
    }
    assert len(got) > 100

    hann = _consts(FRAME_LENGTH, SAMPLE_RATE, 1)["hann"]
    pdf = tiny_seqs.select("doc_id", "tokens").toPandas()
    n_checked = 0
    for _, row in pdf.iterrows():
        toks = np.asarray(row.tokens)
        t_len = len(toks) - (len(toks) % 2)
        toks = toks[:t_len]
        if t_len < FRAME_LENGTH:
            continue
        nf = (t_len - FRAME_LENGTH) // HOP_LENGTH + 1
        prev = None
        for i in range(min(nf, 4)):
            w = toks[i * HOP_LENGTH : i * HOP_LENGTH + FRAME_LENGTH]
            x = w.astype(np.float32) / np.float32(TOKEN_SCALE)
            spec = np.abs(np.fft.rfft((x * hann).astype(np.float64)))
            exp = 0.0 if prev is None else float(
                np.maximum(spec - prev, 0.0).sum()
            )
            assert abs(got[(row.doc_id, i)][0] - round(exp, 6)) <= 1e-6
            prev = spec
            n_checked += 1
    assert n_checked > 20
    # onset flags: some onsets exist, never on a doc's first frame
    onsets = [k for k, v in got.items() if v[1] == 1]
    assert onsets and all(fi != 0 for _, fi in onsets)


def test_spectral_contrast_numpy_golden(spark, tiny_seqs):
    """contrast_b = ln(mean(top-k)/mean(bottom-k)) of sorted band bins."""
    import numpy as np

    from audiopro_essentia_spark.constants import (
        FRAME_LENGTH,
        HOP_LENGTH,
        SAMPLE_RATE,
        TOKEN_SCALE,
    )
    from audiopro_essentia_spark.operators.flux import spectral_contrast
    from audiopro_essentia_spark.operators.kernel import _consts

    frames = frame_tokens(tiny_seqs, carry_cols=(), base_ts_col=None)
    got = {
        (r.doc_id, r.frame_idx): (r.contrast_0, r.contrast_1, r.contrast_2)
        for r in spectral_contrast(frames).collect()
    }
    assert len(got) > 100

    hann = _consts(FRAME_LENGTH, SAMPLE_RATE, 1)["hann"]
    nb = FRAME_LENGTH // 2 + 1
    edges = [round(i * nb / 3) for i in range(4)]
    pdf = tiny_seqs.select("doc_id", "tokens").toPandas()
    checked = 0
    for _, row in pdf.iterrows():
        toks = np.asarray(row.tokens)
        t_len = len(toks) - (len(toks) % 2)
        if t_len < FRAME_LENGTH:
            continue
        for i in range(2):
            w = toks[i * HOP_LENGTH : i * HOP_LENGTH + FRAME_LENGTH]
            if len(w) < FRAME_LENGTH:
                break
            x = w.astype(np.float32) / np.float32(TOKEN_SCALE)
            spec = np.abs(np.fft.rfft((x * hann).astype(np.float64)))
            exp = []
            for b in range(3):
                band = np.sort(spec[edges[b]:edges[b + 1]])
                k = max(1, int(len(band) * 0.2))
                exp.append(
                    np.log((band[-k:].mean() + 1e-10) / (band[:k].mean() + 1e-10))
                )
            g = got[(row.doc_id, i)]
            for b in range(3):
                assert abs(g[b] - round(exp[b], 6)) <= 1e-6, (row.doc_id, i, b)
            checked += 1
        if checked >= 8:
            break
    assert checked >= 4
