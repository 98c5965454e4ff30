"""Silence segmentation — gaps-and-islands over frame energy.

The reference computes a doc-level `silence_ratio` scalar (reference
src/audiopro/audio/metadata.py:75: mean(|audio| < eps)) and rejects
all-silence inputs (validator.py:113). This module supplies the
OPERATIONAL form a curation pipeline needs: the actual active segments
(start/end), so downstream stages can trim leading/trailing silence or
split a long recording into voiced spans before framing/training — plus
the reference-shaped per-doc ratio.

Integer-exact by construction: tokens are small ints, so per-frame energy
sum(x^2) is an exact BIGINT, the active test is an integer comparison, and
the segment RMS is sqrt of an exact rational — bit-identical in the DuckDB
twin with zero float-ordering hazards (no float aggregation anywhere).

Scale shape: the island windows partition by doc_id and order by
frame_idx — per-doc state only, bounded by doc length, embarrassingly
parallel across docs (one shuffle on doc_id shared by both window passes
and the final groupBy; Catalyst reuses the exchange since partitioning and
ordering are identical across all three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frame_energy(window_col) -> F.Column:
    """Exact integer frame energy: sum of squared token values (tokens are
    char-length ints, so v*v sums stay far below 2^63)."""
    return F.aggregate(
        F.transform(window_col, lambda v: v.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )


def silence_segments(
    framed: DataFrame,
    min_energy: int,
    frame_length: int,
    hop: int,
    id_col: str = "doc_id",
    idx_col: str = "frame_idx",
    window_col: str = "window",
) -> DataFrame:
    """Contiguous ACTIVE (energy >= min_energy) frame runs per doc:
    (doc_id, start_frame, end_frame, n_frames, start_token, end_token,
    seg_rms). Token offsets use the framing contract start = idx*hop,
    end = idx*hop + frame_length (the span COVERED, overlapping frames
    included).

    Classic gaps-and-islands: flag flips open a new island (running sum
    of change markers), then one hash-agg per (doc, island). seg_rms =
    sqrt(total_energy / (n_frames*frame_length)) from exact integers —
    the mean RMS over possibly-overlapping frames, NOT the span RMS
    (frames double-count overlap when hop < frame_length; documented so
    the number is interpretable)."""
    energy = frame_energy(F.col(window_col)).alias("_energy")
    w = Window.partitionBy(id_col).orderBy(idx_col)
    flagged = framed.select(
        id_col, idx_col, energy
    ).withColumn("_active", F.col("_energy") >= F.lit(int(min_energy)))
    change = F.when(
        F.lag("_active").over(w).isNull()
        | (F.lag("_active").over(w) != F.col("_active")),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = flagged.withColumn(
        "_seg",
        F.sum(change).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    segs = (
        islands.filter(F.col("_active"))
        .groupBy(id_col, "_seg")
        .agg(
            F.min(idx_col).cast("long").alias("start_frame"),
            F.max(idx_col).cast("long").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("_energy").cast("long").alias("_tot_energy"),
        )
    )
    denom = F.col("n_frames") * F.lit(int(frame_length))
    return segs.select(
        id_col,
        "start_frame",
        "end_frame",
        "n_frames",
        (F.col("start_frame") * F.lit(int(hop))).cast("long").alias("start_token"),
        (F.col("end_frame") * F.lit(int(hop)) + F.lit(int(frame_length)))
        .cast("long")
        .alias("end_token"),
        F.round(
            F.sqrt(F.col("_tot_energy").cast("double") / denom.cast("double")), 6
        ).alias("seg_rms"),
    )


def silence_ratio(
    framed: DataFrame,
    min_energy: int,
    id_col: str = "doc_id",
    window_col: str = "window",
) -> DataFrame:
    """Reference-shaped doc scalar (metadata.py:75), frame-granular: the
    fraction of frames below the energy threshold. Exact rational
    (integer counts) rounded at 6 — one hash agg, no windows."""
    energy = frame_energy(F.col(window_col))
    return (
        framed.select(
            id_col, (energy < F.lit(int(min_energy))).cast("int").alias("_s")
        )
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum("_s").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("silence_ratio"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
        )
    )
