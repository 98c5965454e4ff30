"""A16 — the rhythm/beat-tracking analog as a narrow Arrow map stage.

The reference's RhythmExtractor2013 is an inherently sequential per-file
C++ algorithm (/root/reference/src/audiopro/utils/audio.py:16-37,79-80).
Since one doc == one input row, the right distributed shape is
`mapInPandas` (narrow, zero shuffle) — NOT `groupBy.applyInPandas`, which
would shuffle the full token payload into single-row groups.
Essentia is not in this sandbox, so the algorithm is OUR deterministic
re-specification of multi-feature beat tracking over a token signal:

  1. frame the scaled signal (F=2048, H=512) and compute per-frame energy;
  2. onset envelope = positive energy flux (diff clipped at 0);
  3. TEMPO INDUCTION (the multifeature-shaped stage RhythmExtractor2013
     runs as its periodicity estimation): raw autocorrelation of the
     onset envelope over lags [lag_min, lag_max]; the induced period
     T* = argmax lag (smallest lag on ties). The envelope values are
     exact binary rationals (see below), so the argmax is deterministic
     and engine-independent;
  4. TEMPO-CONSTRAINED beat picking: local maxima of the envelope above
     mean + 0.5*std, greedily kept with separation
     >= max(min_sep_frames, T* // 2) — the induced period vetoes
     off-beat double-fires instead of a fixed gap doing it;
  5. beat times in seconds; tempo_acf = 60*sr/(T**hop); final tempo =
     60/median(diff(beats)) when >1 beat (exactly the reference's
     re-estimation, utils/audio.py:82-89), else 0.0
     (controller.py:179-184).

Exactness note (why the DuckDB twin can hash-match): energies and fluxes
are sums of rationals with power-of-two denominators whose numerators
stay far below 2^52 — bit-identical in ANY summation order. The
AUTOCORRELATION stage is weaker: flux PRODUCTS need up to ~2x the flux
bit-width, so the r[L] sums round, and np.dot's BLAS accumulation order
differs from the twin's sequential sum. Cross-engine argmax therefore
agrees except when two lags are mathematically tied within ~1 ulp (an
exactly periodic signal engineered to tie) — not exercised by the
fixtures, and a 1-ulp r difference cannot move argmax otherwise. The
downstream round-6 outputs are stable for any untied corpus.

The same algorithm exists in the numpy oracle (oracle_rhythm) for parity
tests. Per-doc state never crosses docs — one shuffle on doc_id, then pure
vectorized numpy per group, Arrow both ways.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..constants import FRAME_LENGTH, HOP_LENGTH, SAMPLE_RATE, TOKEN_SCALE

OUT_SCHEMA = (
    "doc_id string, tempo double, tempo_acf double, n_beats int, "
    "beats array<double>"
)


def detect_beats(
    tokens: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    frame_length: int = FRAME_LENGTH,
    hop: int = HOP_LENGTH,
    token_scale: float = TOKEN_SCALE,
    min_sep_frames: int = 4,
    lag_min: int = 2,
    lag_max: int = 64,
) -> tuple[float, float, np.ndarray]:
    """Deterministic onset-based beat detection: autocorrelation tempo
    induction over the onset envelope + tempo-constrained greedy peak
    keep + median-interval re-estimation (module docstring has the full
    pinned spec). Returns (tempo, tempo_acf, beat_times). Shared by the
    Spark grouped-map UDF and the test oracle caller."""
    x = np.asarray(tokens, dtype=np.float32) / np.float32(token_scale)
    n = len(x) - (len(x) % 2)
    if n < frame_length:
        return 0.0, 0.0, np.empty(0, dtype=np.float64)
    nf = 1 + (n - frame_length) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(frame_length)[None, :]
    frames = x[:n][idx]
    energy = (frames.astype(np.float64) ** 2).mean(axis=1)
    flux = np.clip(np.diff(energy, prepend=energy[0]), 0.0, None)
    if flux.max() <= 0:
        return 0.0, 0.0, np.empty(0, dtype=np.float64)
    # tempo induction: raw autocorrelation of the envelope; smallest lag
    # wins ties (np.argmax's first-max rule == DuckDB list_position)
    hi = min(lag_max, nf - 1)
    T = 0
    if hi >= lag_min:
        r = np.array(
            [float(np.dot(flux[: nf - L], flux[L:])) for L in range(lag_min, hi + 1)]
        )
        if r.max() > 0:
            T = lag_min + int(np.argmax(r))
    tempo_acf = 60.0 * sample_rate / (T * hop) if T > 0 else 0.0
    sep = max(min_sep_frames, T // 2)
    thresh = flux.mean() + 0.5 * flux.std()
    is_peak = np.zeros(nf, dtype=bool)
    is_peak[1:-1] = (
        (flux[1:-1] > flux[:-2]) & (flux[1:-1] >= flux[2:]) & (flux[1:-1] > thresh)
    )
    peaks = np.flatnonzero(is_peak)
    beats: list[int] = []
    for p in peaks:
        if not beats or p - beats[-1] >= sep:
            beats.append(int(p))
    beat_times = np.array(beats, dtype=np.float64) * hop / sample_rate
    if len(beat_times) > 1:
        med = float(np.median(np.diff(beat_times)))
        tempo = 60.0 / med if med > 0 else 0.0
    else:
        tempo = 0.0
    return tempo, tempo_acf, beat_times


def extract_rhythm(
    seqs: DataFrame,
    sample_rate: int = SAMPLE_RATE,
    frame_length: int = FRAME_LENGTH,
    hop: int = HOP_LENGTH,
    token_scale: float = TOKEN_SCALE,
) -> DataFrame:
    """mapInPandas beat/tempo extraction. Each doc is exactly ONE row of
    the sequences table, so per-doc state never spans rows and the
    grouped-map shape (groupBy(doc_id).applyInPandas) would hash-shuffle
    the full token payload into single-row groups for nothing — this is a
    NARROW stage: zero Exchange (asserted in tests), docs looped inside
    the Arrow batch exactly like fused.py."""

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                # NULL tokens -> empty doc (tempo 0, no beats), never a
                # np.asarray TypeError killing the stage on one bad row
                # (same contract as fused.py's raw-is-None guard)
                tempo, tempo_acf, beats = detect_beats(
                    np.zeros(0, dtype=np.int64)
                    if tokens is None
                    else np.asarray(tokens, dtype=np.int64),
                    sample_rate, frame_length, hop, token_scale,
                )
                out.append(
                    (doc_id, tempo, tempo_acf, len(beats), beats.tolist())
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "tempo", "tempo_acf", "n_beats", "beats"],
            )

    return seqs.select("doc_id", "tokens").mapInPandas(gen, OUT_SCHEMA)


def extract_rhythm_chunked(
    chunks: DataFrame,
    sample_rate: int = SAMPLE_RATE,
    frame_length: int = FRAME_LENGTH,
    hop: int = HOP_LENGTH,
    token_scale: float = TOKEN_SCALE,
) -> DataFrame:
    """Grouped-map rhythm over CHUNKED ingestion: a doc's tokens arrive
    split across rows (doc_id, chunk_idx, tokens) — the shape huge docs
    take at corpus scale. Here groupBy(doc_id).applyInPandas is the RIGHT
    plan (unlike one-row-per-doc input, see extract_rhythm): reassembly
    genuinely requires co-locating a doc's chunks, so the shuffle buys the
    grouping; concatenation order is pinned by chunk_idx, not partition
    order. Results are identical to extract_rhythm on the unsplit doc
    (asserted in tests)."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_idx")
        # NULL chunks contribute nothing (the unsplit-doc equivalence is
        # over well-formed chunks; a corrupt NULL must not kill the stage)
        toks = np.concatenate(
            [np.zeros(0, dtype=np.int64)]
            + [
                np.asarray(t, dtype=np.int64)
                for t in pdf["tokens"]
                if t is not None
            ]
        )
        tempo, tempo_acf, beats = detect_beats(
            toks, sample_rate, frame_length, hop, token_scale
        )
        return pd.DataFrame(
            [
                (
                    pdf["doc_id"].iloc[0],
                    tempo,
                    tempo_acf,
                    len(beats),
                    beats.tolist(),
                )
            ],
            columns=["doc_id", "tempo", "tempo_acf", "n_beats", "beats"],
        )

    return (
        chunks.select("doc_id", "chunk_idx", "tokens")
        .groupBy("doc_id")
        .applyInPandas(per_doc, OUT_SCHEMA)
    )
