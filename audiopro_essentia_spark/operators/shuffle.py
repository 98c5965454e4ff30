"""Deterministic global corpus shuffle — the epoch-ordering step of a
training-data pipeline (every example gets a stable pseudo-random global
position, reproducible across runs and engines).

Order key: portable 32-bit md5 hash of ``seed || ':' || id`` (ties broken
by id), so the permutation is a pure function of (seed, id) — re-running
an epoch, resuming mid-epoch, or regenerating one shard never reshuffles
the rest. A different seed string gives an independent epoch order.

Scale shape: the naive ``row_number() OVER (ORDER BY key)`` is a
single-partition global window — the same driver-shaped bottleneck
pack_shards (operators/packing.py) exists to avoid, and the same
two-phase fix applies, with one twist: buckets must be RANGES OF THE KEY
(key DIV 2^32/B), not pmod, so that (bucket, key, id) order == global
(key, id) order. The md5 key is uniform, so range buckets are balanced
without sampling — a free range partitioner.

  1. bucket = key DIV ceil(2^32 / B)      (monotone in key, balanced)
  2. per-bucket row_number window          (parallel)
  3. B-row bucket-count table -> exclusive prefix sum (tiny, single
     partition by design) -> broadcast join back

The DuckDB twin is the plain one-window form over (key, id) — identical
output because bucketing is order-preserving.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audiopro_essentia_spark.functions.text import portable_hash32

_HASH_SPACE = 1 << 32


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, shuffle_key, epoch_pos): deterministic global permutation.

    epoch_pos is the 0-based rank in (shuffle_key, id) order, computed
    with the distributed two-phase prefix rank (no global window).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
    span = -(-_HASH_SPACE // n_buckets)  # ceil — keys are < 2^32
    key = portable_hash32(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    b = df.select(F.col(id_col), key.alias("shuffle_key")).withColumn(
        # integer DIV: float division would be exact only for power-of-2
        # spans, and span here is ceil(2^32 / B) for arbitrary B
        "_b",
        F.expr(f"shuffle_key DIV {int(span)}").cast("int"),
    )
    w_intra = Window.partitionBy("_b").orderBy("shuffle_key", id_col)
    intra = b.withColumn("_rk", F.row_number().over(w_intra))
    totals = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_b = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # B rows — single partition is intentional and tiny
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_n").over(w_b), F.lit(0)).alias("_off")
    )
    return (
        intra.join(F.broadcast(offsets), "_b")
        .select(
            F.col(id_col),
            F.col("shuffle_key"),
            (F.col("_off") + F.col("_rk") - F.lit(1)).cast("long").alias("epoch_pos"),
        )
    )
