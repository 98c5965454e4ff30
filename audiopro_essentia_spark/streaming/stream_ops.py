"""Structured Streaming surface (SURVEY.md §2.8).

The reference streams per-frame rows through a callback while upstream
stages run (/root/reference/src/audiopro/audio/extractor.py:214-217,
controller.py:96-100). The streaming analogs here:

- sliding windowed aggregates == the hop/window loop (`window(ts, F, H)`);
- watermark == the leakage rule (a frame is available only at its END
  timestamp, SURVEY.md §1.3) — late data beyond the watermark is dropped;
- session_window == gap-and-island sessionization (W6);
- foreachBatch == the incremental batched emission (S7) writing through the
  CheckpointedWriter for exactly-once.

Local tests drive these with a file source + memory sink +
processAllAvailable() (synchronous completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_dur: str = "2048 seconds",
    hop: str = "512 seconds",
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Sliding-window per-key aggregates — the streaming form of W1 framing
    (frame length F seconds, hop H seconds) with rms-style stats (A1)."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur, hop), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sqrt(F.avg(F.col(value_col) * F.col(value_col))).alias("rms"),
            F.avg(value_col).alias("mean"),
        )
    )


def streaming_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "1800 seconds",
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Native session_window sessionization — streaming W6."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def streaming_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact content dedup ON INGEST — the streaming twin of
    operators.dedup.exact_dedup: the first arrival of each md5(text) wins,
    later copies are dropped. dropDuplicatesWithinWatermark bounds the
    dedup state to the watermark horizon, so state size is
    O(arrival rate x watermark), not O(corpus) — the only shape that
    survives an unbounded stream. (Exact-once cross-restart delivery comes
    from the checkpointed foreachBatch sink, stream_to_checkpointed.)"""
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        docs.withColumn("_h", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def stateful_running_stats(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-key running (count, sum, sum-of-squares) state emitting cumulative
    rms per batch — the streaming form of the reference's incremental
    per-frame accumulation (extractor.py:214-219). State survives across
    micro-batches (GroupState), the analog of the mp.Pool worker's
    algorithm singletons."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        ", ".join(f"{k} {dict(events.dtypes)[k]}" for k in keys)
        + ", n_events long, running_rms double"
    )
    state_schema = "n long, s double, sq double"

    def update(key, pdfs, state):
        n, s, sq = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            v = pdf[value_col].astype("float64")
            n += int(v.count())
            s += float(v.sum())
            sq += float((v * v).sum())
        state.update((n, s, sq))
        rms = (sq / n) ** 0.5 if n else 0.0
        yield pd.DataFrame([[*key, n, rms]], columns=[*keys, "n_events", "running_rms"])

    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .groupBy(*keys)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_state: str = "__START__",
) -> DataFrame:
    """Streaming form of temporal.transition_matrix: per-key Markov
    transition increments with the key's LAST EVENT carried as
    GroupState across micro-batches — the boundary transition between
    the last event of epoch e and the first event of epoch e+1 exists
    ONLY because of that carried state (a per-batch lag would silently
    drop one transition per key per epoch; sum-mergeable sketches
    never face this — chains are the non-mergeable case that needs
    applyInPandasWithState).

    Emits (key, prev, curr, cnt) increment rows per micro-batch
    (append mode); downstream sums by (prev, curr) — pinned equal to
    the batch transition_matrix over the union in
    tests/test_transitions_stream.py.

    Contract: per-key event-time MONOTONE arrival across batches (the
    log-ingestion norm; late data needs watermarked reordering
    upstream) — an out-of-order batch fails LOUD rather than silently
    splicing a transition that never happened. Within a batch, events
    sort by (epoch-micros, type): the same total order on values as
    the batch operator. NULL ts/type fail LOUD.

    Scale shape: state per key is ONE (last_tm, last_type) pair;
    per-batch work is the same key-hash shuffle the batch operator
    pays, Arrow-batched."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_t = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_t}, prev string, curr string, cnt long"
    )
    state_schema = "last_tm long, last_t string"

    def update(key, pdfs, state):
        from collections import Counter

        parts = []
        for pdf in pdfs:
            if pdf[ts_col].isna().any():
                raise ValueError(f"streaming_transitions: NULL {ts_col}")
            if pdf[type_col].isna().any():
                raise ValueError(f"streaming_transitions: NULL {type_col}")
            tm = (
                pdf[ts_col]
                .to_numpy(dtype="datetime64[us]")
                .astype("int64")
            )
            parts.append(
                pd.DataFrame(
                    {"tm": tm, "t": pdf[type_col].astype(str)}
                )
            )
        if not parts:
            return
        b = pd.concat(parts).sort_values(
            ["tm", "t"], kind="mergesort", ignore_index=True
        )
        if state.exists:
            last_tm, prev = state.get
            if int(b["tm"].iloc[0]) < last_tm:
                raise ValueError(
                    f"streaming_transitions: out-of-order arrival for"
                    f" key {key}: batch min {int(b['tm'].iloc[0])} <"
                    f" carried {last_tm}"
                )
        else:
            prev = start_state
        counts = Counter()
        for t in b["t"]:
            counts[(prev, t)] += 1
            prev = t
        state.update((int(b["tm"].iloc[-1]), prev))
        yield pd.DataFrame(
            [[*key, p, c, n] for (p, c), n in counts.items()],
            columns=[key_col, "prev", "curr", "cnt"],
        )

    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def epoch_writer(
    out_dir: str,
    key_col: str = "user_id",
    n_buckets: int = 4,
    fmt: str = "parquet",
    transform=None,
    error_col: str | None = None,
    error_budget_pct: float | None = None,
):
    """foreachBatch handler factory: each micro-batch (optionally passed
    through `transform`, an ordinary DataFrame -> DataFrame function)
    writes through a CheckpointedWriter rooted at out_dir/epoch=<epochId>.
    Exactly-once by idempotence: Spark re-delivers an epoch only when the
    handler did not complete before the streaming checkpoint committed
    it, and a re-run of the same (epoch, data) skips already-committed
    buckets / rewrites uncommitted ones atomically (S7 semantics lifted
    into §2.8). This factory is the ONE owner of the epoch-dir layout —
    streaming_token_pipeline parameterizes it rather than re-implementing
    it."""
    import os as _os

    from ..sources.sinks import CheckpointedWriter

    def handle(bdf: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            bdf = transform(bdf)
        w = CheckpointedWriter(
            _os.path.join(out_dir, f"epoch={epoch_id}"),
            n_buckets=n_buckets,
            key_col=key_col,
            fmt=fmt,
        )
        w.write(bdf, error_col=error_col, error_budget_pct=error_budget_pct)

    return handle


def stream_to_checkpointed(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    n_buckets: int = 4,
    fmt: str = "parquet",
    output_mode: str = "append",
    transform=None,
    error_col: str | None = None,
    error_budget_pct: float | None = None,
) -> None:
    """Drive a (bounded) stream through the foreachBatch checkpointed sink
    to completion — the streaming form of the incremental batched emission
    (reference extractor.py:214-219 callback -> output_handler write).
    The ONE owner of the writeStream/trigger/awaitTermination boilerplate;
    streaming_token_pipeline parameterizes this instead of copying it."""
    q = (
        stream_df.writeStream.foreachBatch(
            epoch_writer(
                out_dir,
                key_col,
                n_buckets,
                fmt,
                transform=transform,
                error_col=error_col,
                error_budget_pct=error_budget_pct,
            )
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_token_pipeline(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    features: tuple | None = None,
    frame_length: int | None = None,
    hop: int | None = None,
    n_buckets: int = 4,
    error_budget_pct: float | None = None,
) -> None:
    """The reference's real-time analog end-to-end: a STREAM of token
    sequences -> fused Arrow feature kernel -> resumable checkpointed
    sink, one epoch per micro-batch. Inside foreachBatch the micro-batch
    is an ordinary DataFrame, so the exact batch operators run unchanged
    — no second implementation to drift; exactly-once comes from the
    idempotent epoch dirs (see epoch_writer). `error_budget_pct` arms the
    same per-epoch abort gate the batch pipeline enforces (default None:
    metrics recorded, no abort — a stream usually prefers quarantined
    epochs over a dead query)."""
    from ..constants import FRAME_LENGTH, HOP_LENGTH
    from ..operators.fused import fused_frame_features, nest_frequency_bands

    fl = frame_length or FRAME_LENGTH
    hp = hop or HOP_LENGTH

    stream_to_checkpointed(
        stream_df,
        out_dir,
        checkpoint_dir,
        key_col="doc_id",
        n_buckets=n_buckets,
        transform=lambda bdf: nest_frequency_bands(
            fused_frame_features(
                bdf, features=features, frame_length=fl, hop=hp, validate=True
            )
        ),
        error_col="ferror",
        error_budget_pct=error_budget_pct,
    )


def read_epochs(spark, out_dir: str) -> DataFrame:
    """Union of COMMITTED data across all epoch directories (each epoch's
    format/config comes from its stored writer_meta)."""
    import os as _os

    from pyspark.sql import DataFrame as _DF

    from ..sources.sinks import CheckpointedWriter

    parts: list[_DF] = []
    for d in sorted(_os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        # from_meta: reopen with the STORED writer config — guessing
        # n_buckets/key_col here would trip the config-drift guard
        w = CheckpointedWriter.from_meta(_os.path.join(out_dir, d))
        if w.committed_buckets():
            parts.append(w.read(spark).drop("bucket"))
    if not parts:
        raise FileNotFoundError(f"no committed epochs under {out_dir}")
    out = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: JSON epochs drop all-null columns from the
        # inferred read-back schema (sinks.py documents the omission), so
        # an epoch whose every row had ferror=NULL must not crash the
        # union of a fully committed dataset — the missing column comes
        # back as NULL
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append") -> DataFrame:
    """Drive a bounded streaming query to completion synchronously and
    return the result table (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
