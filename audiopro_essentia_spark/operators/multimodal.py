"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted via Arrow-batched mapInPandas.

The real thing at 100 TB: image/audio/video bytes live in a `binary` column
(or object-store pointers), metadata in typed sibling columns; decode and
feature-extraction run as vectorized pandas stages. The decode libraries are
NOT in this container, so the decode step is a clearly-marked deterministic
STUB — but the Spark-side plumbing (schema, partitioning, UDF signature,
Arrow batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_type string, payload binary, "
    "n_bytes long, declared_format string"
)

FEATURE_SCHEMA = (
    "doc_id string, media_type string, n_bytes long, "
    "byte_entropy double, byte_histogram array<double>, "
    "decode_status string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from a text table: payload = utf-8 bytes (stands
    in for image/audio bytes), media_type assigned deterministically (md5
    prefix — portable to the DuckDB oracle, unlike crc32)."""
    from ..functions.text import portable_hash32

    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(portable_hash32(F.col(text_col)), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
        F.lit("raw/v1").alias("declared_format"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB for the real decoder (PIL/ffmpeg/torchaudio are not in this
    container). Deterministic fake: the raw bytes themselves. A production
    build replaces ONLY this function; everything around it (batching,
    schema, partitioning) is the real pipeline."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    return np.frombuffer(payload, dtype=np.uint8)


def extract_media_features(
    media: DataFrame, hist_bins: int = 16
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: byte histogram +
    entropy (the deterministic stand-ins for embeddings / spectrograms /
    frame samples). Arrow-batched; one Python crossing per batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload, nb in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"], pdf["n_bytes"]
            ):
                # NULL payload/size rows become error-status rows like any
                # other malformed input — bytes(None)/int(NaN) would raise
                # TypeError past the NotImplementedError handler and kill
                # the whole mapInPandas job
                if payload is None or nb is None or pd.isna(nb):
                    rows.append(
                        (doc_id, mt, None, None, None, "error:null_payload")
                    )
                    continue
                try:
                    arr = _decode_stub(bytes(payload), mt)
                    hist = np.histogram(
                        arr, bins=hist_bins, range=(0, 256), density=False
                    )[0].astype(np.float64)
                    total = hist.sum()
                    # ONE normalization reused by entropy AND the stored
                    # histogram — two hand-written variants of the same
                    # expression is a silent-divergence trap
                    p = hist / total if total else hist
                    nz = p[p > 0]
                    ent = float(-(nz * np.log2(nz)).sum()) if len(nz) else 0.0
                    rows.append((doc_id, mt, int(nb), ent, p.tolist(), "ok"))
                except NotImplementedError as e:
                    rows.append((doc_id, mt, int(nb), None, None, f"stub:{e}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "byte_entropy",
                    "byte_histogram",
                    "decode_status",
                ],
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def sample_media_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """Frame-sampling over opaque binary payloads — the video
    frame-extraction analog: n_frames evenly-strided byte windows per
    payload, each fingerprinted. Pure JVM expressions (sequence/explode/
    substring/hex/md5 on binary) — NO Python in this path; a real decoder
    would replace the slice with a keyframe extractor, everything else
    (stride plan, schema, checksums) is the production shape.

    frame_md5 = md5 of the UPPERCASE-HEX rendering of the slice bytes
    (identical in Spark and DuckDB), NOT md5 of the raw bytes: DuckDB
    1.x md5() only accepts VARCHAR, and the previous twin's
    decode(from_hex(...)) round-trip VALIDATES UTF-8 — any slice
    boundary that splits a multibyte character crashed the oracle
    (found by the unicode parity sweep; real media bytes are not UTF-8
    at all). Hex-of-bytes is an injective rendering, so the fingerprint
    is equally collision-resistant and now byte-true for ARBITRARY
    payloads on both engines."""
    if n_frames < 1 or frame_bytes < 1:
        # sequence(0, n_frames-1) DESCENDS for n_frames=0 (the Spark
        # footgun dedup/text already guard) — bogus negative offsets
        raise ValueError("n_frames and frame_bytes must be >= 1")
    stride = F.greatest(
        F.floor(F.col("n_bytes") / F.lit(n_frames)).cast("long"), F.lit(1).cast("long")
    )
    frames = media.select(
        "doc_id",
        "media_type",
        "payload",
        "n_bytes",
        stride.alias("_stride"),
        # explode of 0..n-1 IS the frame number (posexplode's pos and
        # value were identical by construction — one redundant column)
        F.explode(
            F.sequence(F.lit(0), F.lit(n_frames - 1))
        ).alias("frame_no"),
    ).withColumn("_off", F.col("frame_no") * F.col("_stride") + 1)
    # only frames fully inside the payload (tail truncation, same rule as
    # the token framing)
    inside = F.col("_off") + frame_bytes - 1 <= F.col("n_bytes")
    sliced = F.expr(f"substring(payload, _off, {frame_bytes})")
    return frames.filter(inside).select(
        "doc_id",
        "media_type",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.col("_off").cast("long").alias("byte_offset"),
        F.md5(F.hex(sliced)).alias("frame_md5"),
    )
