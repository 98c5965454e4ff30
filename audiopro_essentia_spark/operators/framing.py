"""W1/W2 — sliding-window framing as native Spark array expressions.

The distributed analog of the reference frame generator
(/root/reference/src/audiopro/audio/extractor.py:45-67): frames of
FRAME_LENGTH every HOP_LENGTH tokens, complete frames only, count
1 + (N - F) // H (extractor.py:149), after odd-length trim
(audio_loader.py:84-86).

Scale design: everything here is JVM-side whole-stage-codegen — explode a
frame-index sequence then F.slice per row; the full tokens array is never
replicated into more than one in-flight row per output frame, and Catalyst
prunes `tokens` immediately after the slice. Frames of a doc stay in the
doc's partition (explode is narrow: NO shuffle). Downstream wide ops should
`repartitionByRange('doc_id','event_ts')` themselves (see asof.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import FRAME_LENGTH, HOP_LENGTH, SAMPLE_RATE


def trimmed_len(n: Column) -> Column:
    """Odd-length trim (audio_loader.py:84-86)."""
    return n - (n % 2)


def n_frames_col(
    n: Column, frame_length: int = FRAME_LENGTH, hop: int = HOP_LENGTH
) -> Column:
    """1 + (N - F) // H after odd-trim; 0 when N < F (extractor.py:122-125,149)."""
    t = trimmed_len(n)
    return F.when(t >= frame_length, ((t - frame_length) / hop).cast("int") + 1).otherwise(
        F.lit(0)
    )


def frame_tokens(
    df: DataFrame,
    frame_length: int = FRAME_LENGTH,
    hop: int = HOP_LENGTH,
    sample_rate: int = SAMPLE_RATE,
    start_sample: int = 0,
    tokens_col: str = "tokens",
    id_cols: tuple[str, ...] = ("doc_id",),
    carry_cols: tuple[str, ...] = ("source",),
    base_ts_col: str | None = "base_ts",
    with_window: bool = True,
) -> DataFrame:
    """Explode sequences into frame rows.

    Output: id_cols..., carry_cols..., frame_idx int, window array<int>,
    time_ms double, and (when base_ts_col given) event_ts / available_ts
    timestamps. time_ms = ((start + idx*H)/sr)*1000 (processors.py:281-283);
    available_ts is the frame END (leakage rule, SURVEY.md §1.3).
    """
    if frame_length < 1 or hop < 1:
        # hop=0 hits DIVIDE_BY_ZERO (ANSI) or an unbounded frame-index
        # sequence deep inside the job — fail at the call site instead
        raise ValueError(
            f"frame_length and hop must be >= 1 "
            f"(got frame_length={frame_length}, hop={hop})"
        )
    t_len = trimmed_len(F.size(F.col(tokens_col)))
    nf = n_frames_col(F.size(F.col(tokens_col)), frame_length, hop)

    framed = (
        df.filter(t_len >= frame_length)
        .select(
            *id_cols,
            *carry_cols,
            *([base_ts_col] if base_ts_col else []),
            F.slice(F.col(tokens_col), 1, t_len).alias("_toks"),
            F.explode(F.sequence(F.lit(0), nf - 1)).alias("frame_idx"),
        )
    )
    cols = [
        *id_cols,
        *carry_cols,
        F.col("frame_idx").cast("int").alias("frame_idx"),
    ]
    if with_window:
        cols.append(
            F.slice(F.col("_toks"), F.col("frame_idx") * hop + 1, frame_length).alias(
                "window"
            )
        )
    start = F.lit(start_sample) + F.col("frame_idx").cast("long") * hop
    time_ms = start.cast("double") / sample_rate * 1000.0
    cols.append(time_ms.alias("time_ms"))
    if base_ts_col:
        # parquet tz-less timestamps arrive as TIMESTAMP_NTZ in Spark 4;
        # session TZ is pinned UTC, so the cast is semantics-preserving.
        base_us = F.unix_micros(F.col(base_ts_col).cast("timestamp"))
        cols.append(
            F.timestamp_micros(
                base_us + F.round(start * F.lit(1e6) / sample_rate).cast("long")
            ).alias("event_ts")
        )
        last = start + frame_length - 1
        cols.append(
            F.timestamp_micros(
                base_us + F.round(last * F.lit(1e6) / sample_rate).cast("long")
            ).alias("available_ts")
        )
    return framed.select(*cols)
