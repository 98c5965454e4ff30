"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k (exact baseline) and LSH / IVF bucketed variants (scale path).

Scale design:
- brute-force: queries are broadcast (small side), corpus streams; the dot
  product is a native `F.aggregate(F.zip_with(...))` — JVM-side, no Python.
  At 100 TB the corpus scan parallelizes; cost is linear per query, so it is
  the oracle/baseline, not the serving path.
- LSH (random hyperplanes): deterministic seeded hyperplanes -> sign-bit
  signature -> candidates share a signature prefix band; only candidates get
  exact cosine. One equi-join shuffle on the band key.
- IVF: k centroids (deterministic seeded sample), assign each corpus vector
  to nearest centroid (one broadcast map pass); a query probes only its
  `nprobe` nearest centroid lists.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return F.coalesce(
        F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b)), F.lit(0.0)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the queries, one corpus scan,
    Window row_number <= k. Deterministic tie-break on (cosine desc, id asc)."""
    q = queries.select(
        F.col(query_id), F.col(query_vec).alias("_qv")
    )
    joined = corpus.crossJoin(F.broadcast(q)).select(
        query_id,
        F.col(corpus_id),
        F.round(cosine_expr(F.col("_qv"), F.col(corpus_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc(corpus_id)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature string over deterministic random hyperplanes."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot_expr(vec, arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the query's LSH
    signature; exact cosine re-rank inside the bucket. Recall grows with
    fewer planes / multi-probe; this is the scale path (equi-join instead of
    cross join)."""
    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("_sig", lsh_signature_col(F.col(corpus_vec), planes))
    q = queries.select(
        F.col(query_id),
        F.col(query_vec).alias("_qv"),
        lsh_signature_col(F.col(query_vec), planes).alias("_sig"),
    )
    joined = c.join(F.broadcast(q), "_sig").select(
        query_id,
        F.col(corpus_id),
        F.round(cosine_expr(F.col("_qv"), F.col(corpus_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return joined.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_vec: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: deterministic centroid sample (seeded corpus
    rows), assign every vector to its nearest centroid (broadcast map pass,
    no shuffle). Returns (corpus + cluster_id, centroids)."""
    sample = np.array(
        [
            r[0]
            for r in corpus.select(corpus_vec)
            .orderBy(F.md5(F.concat_ws(",", F.col(corpus_vec).cast("array<string>"))))
            .limit(n_centroids)
            .collect()
        ],
        dtype=np.float64,
    )
    best = None
    best_d = None
    for i, cvec in enumerate(sample):
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.lit(1.0) - cosine_expr(F.col(corpus_vec), arr)
        if best is None:
            best, best_d = F.lit(i), d
        else:
            cond = d < best_d
            best = F.when(cond, F.lit(i)).otherwise(best)
            best_d = F.when(cond, d).otherwise(best_d)
    return corpus.withColumn("cluster_id", best), sample
