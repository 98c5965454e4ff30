"""Sequence packing — assign documents to fixed-capacity training shards
by cumulative token count (the concat-and-chunk packing step of an LLM
pretraining pipeline; documents may straddle a shard boundary, exactly as
token streams do).

Scale design: a naive `sum() OVER (ORDER BY doc_id)` is a SINGLE-
PARTITION global window — the classic driver-shaped bottleneck. This
operator runs the distributed two-phase prefix sum instead:
  1. bucket rows by a deterministic key range (pmod of the id),
  2. intra-bucket running sum (window per bucket — parallel),
  3. per-bucket totals -> tiny B-row cumulative offset table
     (single-partition is fine for B rows) -> broadcast join back.
Global order is (bucket, id) on BOTH sides, so the DuckDB twin is the
plain one-window form and the integer arithmetic matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    count_col: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, global_offset, shard_id, shard_offset): the position
    of each doc in the packed token stream ordered by (pmod(id, B), id).

    shard_id = global_offset // shard_tokens; shard_offset is the doc's
    start position within its shard."""
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # pmod of a non-numeric id silently NULLs every bucket -> the
        # whole table collapses into ONE window partition (the exact
        # bottleneck this operator exists to avoid). Fail loud instead.
        raise ValueError(
            f"pack_shards needs an integral id column; {id_col} is {id_type}"
        )
    if shard_tokens <= 0:
        # DIV 0 under non-ANSI Spark silently NULLs every shard_id
        raise ValueError(f"shard_tokens must be positive (got {shard_tokens})")
    cnt = F.col(count_col).cast("long")
    # a NULL/negative count would silently corrupt every later offset in
    # its bucket (NULL propagates through the running sum) — fail loud at
    # execution with the offending id, same rationale as the id-type check
    cnt = F.when(
        cnt.isNull() | (cnt < 0),
        F.raise_error(
            F.concat(
                F.lit(f"pack_shards: NULL or negative {count_col} for {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(cnt)
    b = df.select(
        F.col(id_col),
        cnt.alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("_b"),
    )
    w_intra = (
        Window.partitionBy("_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = b.withColumn("_cum_in", F.sum("n_tokens").over(w_intra))
    totals = b.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
    w_b = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )  # B rows only — single partition is intentional and tiny
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).alias("_off")
    )
    out = intra.join(F.broadcast(offsets), "_b").select(
        id_col,
        "n_tokens",
        (F.col("_off") + F.col("_cum_in") - F.col("n_tokens")).alias(
            "global_offset"
        ),
    )
    return out.select(
        id_col,
        "n_tokens",
        "global_offset",
        # integer DIV, not float /: double division of longs loses
        # exactness past 2^53 — real at 100-TB token-stream offsets
        F.expr(f"global_offset DIV {int(shard_tokens)}").alias("shard_id"),
        (F.col("global_offset") % shard_tokens).alias("shard_offset"),
    )


def shard_manifest(
    df: DataFrame,
    count_col: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-shard training manifest — the metadata a packed-training
    loader actually consumes: for each shard, how many documents START
    in it, how many straddle into the next shard (their attention mask
    must not cross the boundary), and the ordered (offset:doc) boundary
    list for example reconstruction.

    Built ON pack_shards' distributed two-phase prefix sum; adds ONE
    groupBy(shard_id). The per-shard state is bounded by construction —
    at most shard_tokens/min_doc_tokens (+1 straddler) docs can start in
    one shard — so the collect_list can never become an unbounded
    hot-group straggler the way a per-source or per-user collect could.

    `boundaries` is emitted as an 'offset:id,offset:id,...' string
    ordered by (offset, id) rather than an array-of-structs column, so
    the DuckDB twin (string_agg ... ORDER BY) is byte-identical.

    CONTRACT: a manifest row exists only for shards in which >= 1
    document STARTS. A document longer than shard_tokens spans
    interior shards that get no row of their own — those shards are
    fully covered by the straddler and a loader reconstructs them from
    the PREVIOUS manifest row's last boundary entry plus that doc's
    token count (the straddle counter marks the handoff). Consumers
    must therefore iterate shard ids from pack_shards (dense) rather
    than assume manifest rows are gap-free."""
    p = pack_shards(df, count_col, shard_tokens, id_col, n_buckets)
    bounds = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("shard_offset").alias("off"), F.col(id_col).alias("id")
                )
            )
        ),
        lambda s: F.concat(
            s["off"].cast("string"), F.lit(":"), s["id"].cast("string")
        ),
    )
    return (
        p.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (
                    F.col("shard_offset") + F.col("n_tokens")
                    > F.lit(int(shard_tokens))
                ).cast("long")
            )
            .cast("long")
            .alias("n_straddlers"),
            F.sum("n_tokens").cast("long").alias("n_tokens_started"),
            F.concat_ws(",", bounds).alias("boundaries"),
        )
    )


def pack_nosplit(
    df: DataFrame,
    count_col: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy NO-SPLIT packing: documents never straddle a shard boundary
    (the packing discipline used when cross-document attention must not
    leak across examples) — a doc joins the current shard iff it fits,
    else it starts a new one; a doc larger than the shard gets its own
    shard and an `oversize` flag (the loader truncates; never silent).

    Greedy fill is a NON-associative recurrence, so the two-phase prefix
    sum of pack_shards cannot express it. Distributed form:
    BUCKET-ALIGNED packing — shards never span the deterministic id
    buckets, so every bucket folds independently (one applyInPandas per
    bucket group); the cost is at most one partial shard of waste per
    bucket, and shard identity is the pair (bucket, shard_seq) — no
    global coordination, no driver state. Size n_buckets so a bucket's
    rows fit one task comfortably (corpus_docs / n_buckets); at 10^12
    docs that means ~10^6 buckets, still a single shuffle.

    State recurrence (doc i in bucket order, cap = shard_tokens):
      fits:     seq_i = seq_{i-1}, off_i = fill_{i-1}, fill_i += n_i
      else new: seq_i = seq_{i-1}+1, off_i = 0, fill_i = n_i
    (an oversize doc has n_i > cap, so fill_i = n_i guarantees the next
    doc opens a new shard). The DuckDB twin replays the same recurrence
    as a recursive CTE stepping all buckets in parallel."""
    import pandas as pd

    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive (got {shard_tokens})")
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"pack_nosplit needs an integral id column; {id_col} is {id_type}"
        )
    cap = int(shard_tokens)
    b = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(count_col).cast("long").alias("_n"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("_b"),
    )

    def fold(pdf):
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        # Arrow hands nullable longs to pandas as float64 with NaN for NULL,
        # so a `n is None` check never fires — test isna() on the column.
        if pdf["_n"].isna().any():
            raise ValueError("pack_nosplit: NULL count")
        ns = [int(n) for n in pdf["_n"].tolist()]
        seqs, offs, overs = [], [], []
        seq, fill = 0, None
        for n in ns:
            if n < 0:
                raise ValueError("pack_nosplit: negative count")
            if fill is None:
                seq, off, fill = 0, 0, n
            elif fill + n <= cap:
                off = fill
                fill += n
            else:
                seq, off, fill = seq + 1, 0, n
            seqs.append(seq)
            offs.append(off)
            overs.append(1 if n > cap else 0)
        out = pd.DataFrame(
            {
                "_id": pdf["_id"],
                "_n": pdf["_n"],
                "_b": pdf["_b"],
                "shard_seq": seqs,
                "shard_offset": offs,
                "oversize": overs,
            }
        )
        return out

    schema = (
        "_id long, _n long, _b int, shard_seq long, shard_offset long, "
        "oversize int"
    )
    out = b.groupBy("_b").applyInPandas(fold, schema=schema)
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_n").alias("n_tokens"),
        F.col("_b").alias("bucket"),
        "shard_seq",
        "shard_offset",
        "oversize",
    )
