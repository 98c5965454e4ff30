"""Post-kernel frame-feature transforms: delta (differential) features and
per-doc cepstral mean (/variance) normalization.

The reference emits per-frame feature rows and leaves temporal context to
consumers (/root/reference/src/audiopro/audio/processors.py:62-118 computes
each frame independently; controller.py:166 does the only cross-frame step,
a np.diff over beats). Delta regression and CMVN are the standard next
stage of a framed feature pipeline (HTK/Kaldi-style), so they are part of
the engine's first-class surface rather than a consumer afterthought.

Spark-first shape: every output here is a window expression over ONE
(doc) hash partition + ONE in-partition sort — the same Exchange serves
the delta lags/leads, the edge-replication first/last values, and the
doc-level CMVN moments (Catalyst groups same-spec window functions into a
shared Window exec over one sort). Nothing collects to the driver; per-doc
frame counts bound the window state, so the op scales with doc size, not
corpus size.

Delta spec (width W, default 2 — the HTK formula):

    delta_t = sum_{k=1..W} k * (x_{t+k} - x_{t-k}) / (2 * sum_{k} k^2)

with edge replication: x at positions before the doc's first frame reads
the first frame's value, past the last frame the last frame's value
(librosa mode='nearest'). A NULL feature value (silent/ferror frame)
propagates: any NULL among the referenced neighbors makes the delta NULL
(the regression never reads the center value itself, so a NULL-center
frame with valid neighbors still gets a delta).

Requires a DENSE integer order column (consecutive per doc) — frame_idx
from operators.framing satisfies this; the min/max-index boundary test
assumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_frame_deltas(
    df: DataFrame,
    cols: tuple[str, ...],
    key_cols: tuple[str, ...] = ("doc_id",),
    order_col: str = "frame_idx",
    width: int = 2,
    suffix: str = "_d1",
) -> DataFrame:
    """Append `<col><suffix>` delta-regression columns (see module doc)."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    denom = float(2 * sum(k * k for k in range(1, width + 1)))
    mn = F.min(order_col).over(wf)
    mx = F.max(order_col).over(wf)
    out = df
    for c in cols:
        first = F.first(c).over(wf)
        last = F.last(c).over(wf)
        acc = None
        for k in range(1, width + 1):
            past = F.when(F.col(order_col) - k >= mn, F.lag(c, k).over(w)).otherwise(first)
            fut = F.when(F.col(order_col) + k <= mx, F.lead(c, k).over(w)).otherwise(last)
            term = F.lit(float(k)) * (fut - past)
            acc = term if acc is None else acc + term
        out = out.withColumn(f"{c}{suffix}", acc / F.lit(denom))
    return out


def with_cmvn(
    df: DataFrame,
    cols: tuple[str, ...],
    key_cols: tuple[str, ...] = ("doc_id",),
    variance: bool = False,
    eps: float = 1e-10,
    suffix: str = "_cmn",
) -> DataFrame:
    """Append per-key mean-subtracted (`variance=False`, classic CMN) or
    fully standardized (`variance=True`, CMVN) copies of `cols`.

    The moments are unordered-window aggregates over the same (doc)
    partitioning as the delta pass, so stacking with_frame_deltas +
    with_cmvn still costs one Exchange. NULL frames are excluded from the
    moments (avg/var_pop ignore NULLs) and stay NULL in the output.
    """
    wk = Window.partitionBy(*key_cols)
    out = df
    for c in cols:
        centered = F.col(c) - F.avg(c).over(wk)
        if variance:
            centered = centered / F.sqrt(F.var_pop(c).over(wk) + F.lit(eps))
        out = out.withColumn(f"{c}{suffix}", centered)
    return out
