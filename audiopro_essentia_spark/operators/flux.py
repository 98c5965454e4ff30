"""Spectral flux / onset-strength — the cross-frame novelty signal that
drives beat tracking (the quantity the reference's rhythm stage consumes
conceptually; extractor surface: /root/reference/src/audiopro/audio/
processors.py:90-302 computes per-frame spectra, this operator adds the
frame-to-frame half-wave-rectified difference).

Distributed shape: the per-frame magnitude spectrum is a STATELESS Arrow
UDF (same f32-quantize -> Hann -> f64 rfft recipe as the kernel, so the
DuckDB DFT twin reuses the same literals), and the cross-frame difference
is a declarative window lag over (doc, frame_idx) — Catalyst owns the
ordering, so there is no chunk-boundary state to carry and the plan is
one window sort per doc partition. Onset flags are a second window pass
over the SAME partitioning (mean + sigma * stddev_pop of the round-6
flux), which reuses the sort.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import FRAME_LENGTH, SAMPLE_RATE, TOKEN_SCALE
from .kernel import _consts


def make_spectrum_udf(
    frame_length: int, token_scale: float, n_mels: int | None = None
):
    """Arrow UDF: int token window -> magnitude spectrum (array<double>),
    bit-identical to the kernel's spectral path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    hann = _consts(frame_length, SAMPLE_RATE, n_mels or 1)["hann"]

    @pandas_udf("array<double>")
    def _spec(windows):
        # BATCHED: stack the whole Arrow batch and run ONE rfft per
        # <=KERNEL_CHUNK rows (kernel discipline: per-row np.fft calls
        # pay Python dispatch per frame; the batched transform is the
        # same pocketfft per-row algorithm, bit-identical output)
        from .kernel import KERNEL_CHUNK

        vals = list(windows)
        # wrong-length windows (a framing/flux frame_length mismatch)
        # must not kill the stage in np.stack — they yield a NULL
        # spectrum like NULL windows do (the kernel sibling's NaN-fill
        # hardening, adapted: flux's contract is NULL row, not ferror)
        idx = [
            i
            for i, w in enumerate(vals)
            if w is not None and len(w) == len(hann)
        ]
        out = [None] * len(vals)
        for c0 in range(0, len(idx), KERNEL_CHUNK):
            chunk = idx[c0 : c0 + KERNEL_CHUNK]
            W = np.stack([np.asarray(vals[i], dtype=np.float32) for i in chunk])
            # identical to kernel.py:120-122 (f32 quantize, f32 Hann
            # multiply, ONE upcast before the FFT)
            w64 = ((W / np.float32(token_scale)) * hann[None, :]).astype(
                np.float64
            )
            spec = np.abs(np.fft.rfft(w64, axis=1))
            for j, i in enumerate(chunk):
                out[i] = spec[j].tolist()
        return pd.Series(out, dtype=object)

    return _spec


def spectral_flux(
    frames: DataFrame,
    frame_length: int = FRAME_LENGTH,
    token_scale: float = TOKEN_SCALE,
    window_col: str = "window",
    id_cols: tuple[str, ...] = ("doc_id",),
    onset_sigma: float = 1.5,
) -> DataFrame:
    """(id_cols..., frame_idx, flux, is_onset) from framed token windows.

    flux[t] = sum over bins of max(0, |S_t| - |S_{t-1}|), 0.0 for the
    first frame of a doc; is_onset = flux > mean + onset_sigma * stddev
    of the doc's round-6 flux (population stddev — deterministic and
    identical in the SQL twin)."""
    udf = make_spectrum_udf(frame_length, token_scale).asNondeterministic()
    spec = frames.select(
        *id_cols, "frame_idx", udf(F.col(window_col)).alias("_spec")
    )
    w = Window.partitionBy(*id_cols).orderBy("frame_idx")
    prev = F.lag("_spec").over(w)
    flux_raw = F.when(prev.isNull(), F.lit(0.0)).otherwise(
        F.aggregate(
            F.zip_with("_spec", prev, lambda a, b: F.greatest(a - b, F.lit(0.0))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    wd = Window.partitionBy(*id_cols)
    out = spec.withColumn("flux", F.round(flux_raw, 6)).drop("_spec")
    # round-6 threshold: the comparison is then between two 1e-6-grid
    # numbers, immune to last-ulp summation-order differences vs the twin
    thresh = F.round(
        F.avg("flux").over(wd) + onset_sigma * F.stddev_pop("flux").over(wd), 6
    )
    return out.withColumn(
        "is_onset", (F.col("flux") > thresh).cast("int")
    )


def spectral_contrast(
    frames: DataFrame,
    frame_length: int = FRAME_LENGTH,
    token_scale: float = TOKEN_SCALE,
    window_col: str = "window",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_bands: int = 3,
    alpha: float = 0.2,
) -> DataFrame:
    """Per-frame spectral contrast: ln(peak/valley) per frequency band,
    where peak/valley are the means of the top/bottom alpha-fraction of
    sorted bin magnitudes in the band (the librosa-family feature,
    public formulation; independent implementation).

    Same stateless spectrum UDF as spectral_flux; the band split /
    sort / quantile means are pure JVM array expressions after it —
    no extra Python, no shuffle (narrow over the framed rows)."""
    nb = frame_length // 2 + 1
    if n_bands > nb:
        raise ValueError(
            f"n_bands={n_bands} exceeds the {nb} spectrum bins of "
            f"frame_length={frame_length}"
        )
    edges = [round(i * nb / n_bands) for i in range(n_bands + 1)]
    if len(set(edges)) != len(edges):
        raise ValueError(
            f"n_bands={n_bands} yields an empty band for {nb} bins "
            f"(edges {edges}) — use fewer bands"
        )
    udf = make_spectrum_udf(frame_length, token_scale).asNondeterministic()
    spec = frames.select(
        *id_cols, "frame_idx", udf(F.col(window_col)).alias("_spec")
    )
    eps = F.lit(1e-10)
    cols = [F.col(c) for c in (*id_cols, "frame_idx")]
    for b in range(n_bands):
        lo, hi = edges[b], edges[b + 1]
        band = F.array_sort(F.slice("_spec", lo + 1, hi - lo))
        k = max(1, int((hi - lo) * alpha))
        valley = F.aggregate(
            F.slice(band, 1, k), F.lit(0.0), lambda a, x: a + x
        ) / F.lit(float(k))
        peak = F.aggregate(
            F.slice(band, hi - lo - k + 1, k), F.lit(0.0), lambda a, x: a + x
        ) / F.lit(float(k))
        cols.append(
            F.round(F.log((peak + eps) / (valley + eps)), 6).alias(
                f"contrast_{b}"
            )
        )
    return spec.select(*cols)
