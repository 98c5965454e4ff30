"""Product quantization (PQ) approximate nearest-neighbor search.

The fourth member of the similarity-search family (brute force, sign-LSH,
IVF, PQ — similarity.py holds the first three). PQ is the memory-scale
path: each d-dim vector is stored as `m_sub` small integer codes (one per
subspace), and query-to-vector distance is approximated by table lookups
(ADC — asymmetric distance computation) instead of d multiplies.  At
64-dim f32 with m_sub=8/k=16 that is 8 bytes of codes vs 256 bytes of
vector — the difference between an index that fits in cluster memory at
100 TB and one that does not.  Algorithm: Jégou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011.  The
reference repo has no ANN surface; this extends the training-data
pipeline family the engine adds beyond reference parity (README §LLM
ops), alongside brute/LSH/IVF (similarity.py:152,255,522).

Execution shape (the 100-TB posture):
  - codebook training: md5-ordered deterministic init (the kmeans_lite
    recipe, similarity.py:461) + Lloyd refinement where each iteration is
    ONE Arrow assignment pass and ONE map-side-combinable groupBy bounded
    at m_sub*k*ds output rows; the driver holds only the (m_sub, k, ds)
    codebook — never vectors.
  - encode: one narrow Arrow pass, zero shuffle, codebook broadcast in
    the UDF closure.
  - search: queries (with precomputed LUTs) broadcast against the coded
    corpus — the corpus is never shuffled and each pair costs m_sub
    array lookups, not d multiplies; per-query top-k row_number filters
    qualify for Spark's WindowGroupLimit map-side pushdown.

Cross-engine determinism contract (the DuckDB twin in
duck_twins.pq_ann_sql must be hash-identical at round-6):
  - every f32 element widens to f64 exactly once (exact in IEEE);
  - every subspace distance is a SEQUENTIAL fold over the ds dims in
    index order — the UDFs accumulate plane-by-plane (`for j: acc +=
    (v_j - c_j)^2`, the semantic_dedup recipe) matching DuckDB's
    sequential list_sum, so distances are BIT-identical, and argmin
    tie-break on lowest code id is therefore deterministic both sides;
  - the Lloyd update sums round(val*1e9)-scaled BIGINTs — exact
    integers, so the updated codebook is independent of partitioning /
    summation order (the money-cents rule); the mean is the single
    deterministic expression (CAST(s AS DOUBLE) / cnt) / 1e9 on both
    engines.  Spark 4 ANSI mode makes a (theoretical, ~9e8 rows per
    cell) BIGINT overflow fail loud rather than silently wrap.
  - ADC distance folds the m_sub LUT entries in subspace order
    (F.aggregate — sequential) matching list_sum over an ORDER BY m
    list in the twin.

NULL / corrupt inputs: NULL or wrong-dimension vectors get NULL codes
(and are excluded from training sums and search) instead of crashing the
stage — the margin_pair_fold contract.  Zero vectors are fine: PQ is
plain L2, there is no norm division.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _md5_sample

__all__ = ["pq_codebook", "pq_encode", "pq_topk", "pq_recall"]


def _check_codebook(codebook: np.ndarray) -> tuple[int, int, int]:
    if codebook.ndim != 3:
        raise ValueError(
            f"codebook must be (m_sub, k, ds), got shape {codebook.shape}"
        )
    m_sub, k, ds = codebook.shape
    if m_sub < 1 or k < 1 or ds < 1:
        raise ValueError(f"degenerate codebook shape {codebook.shape}")
    return m_sub, k, ds


def _make_encode_udf(codebook: np.ndarray):
    """vector -> array<int> of m_sub code ids (argmin squared-L2 per
    subspace, ties to the LOWEST code id — np.argmin's first-occurrence
    rule, mirrored by the twin's `ORDER BY dist, code`).  ONE Arrow pass
    with the codebook in the closure; distances accumulate plane-by-plane
    in index order so they are bit-identical to DuckDB's sequential
    list_sum (module docstring).  NULL / wrong-dim vectors -> NULL.

    Marked nondeterministic (it is not — this only disables Catalyst
    moves): the output feeds a not-NULL filter and a posexplode-adjacent
    aggregate, the two plan shapes where Catalyst duplicates a
    deterministic Python UDF subtree (CLAUDE.md; dedup.py signature
    UDFs)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(codebook, dtype=np.float64)
    m_sub, k, ds = C.shape
    d = m_sub * ds

    @pandas_udf("array<int>")
    def _enc(vecs):
        vlist = vecs.tolist()
        ok = [i for i, v in enumerate(vlist) if v is not None and len(v) == d]
        out = [None] * len(vlist)
        if ok:
            E = np.array([vlist[i] for i in ok], dtype=np.float64)  # (B, d)
            codes = np.empty((len(ok), m_sub), dtype=np.int64)
            for m in range(m_sub):
                acc = np.zeros((len(ok), k), dtype=np.float64)
                for j in range(ds):
                    diff = E[:, m * ds + j][:, None] - C[m, :, j][None, :]
                    acc += diff * diff
                codes[:, m] = np.argmin(acc, axis=1)
            for i, row in zip(ok, codes):
                out[i] = [int(c) for c in row]
        return pd.Series(out, dtype=object)

    return _enc.asNondeterministic()


def _make_lut_udf(codebook: np.ndarray):
    """query vector -> array<array<double>>: lut[m][c] = squared L2
    between the query's m-th subvector and codebook[m][c], accumulated
    plane-by-plane in index order (bit-identical to the twin's
    list_sum).  NULL / wrong-dim queries -> NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(codebook, dtype=np.float64)
    m_sub, k, ds = C.shape
    d = m_sub * ds

    @pandas_udf("array<array<double>>")
    def _lut(vecs):
        vlist = vecs.tolist()
        ok = [i for i, v in enumerate(vlist) if v is not None and len(v) == d]
        out = [None] * len(vlist)
        if ok:
            Q = np.array([vlist[i] for i in ok], dtype=np.float64)  # (B, d)
            luts = np.zeros((len(ok), m_sub, k), dtype=np.float64)
            for m in range(m_sub):
                for j in range(ds):
                    diff = Q[:, m * ds + j][:, None] - C[m, :, j][None, :]
                    luts[:, m] += diff * diff
            for i, tab in zip(ok, luts):
                out[i] = [[float(x) for x in row] for row in tab]
        return pd.Series(out, dtype=object)

    return _lut.asNondeterministic()


def pq_codebook(
    corpus: DataFrame,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 1,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train a PQ codebook: (m_sub, k, ds) ndarray, ds = dim / m_sub.

    Init: the k md5-ordered DISTINCT corpus vectors (deterministic,
    content-addressed, DuckDB-reproducible — similarity.sample_key_expr),
    each sliced into its m_sub subvectors, so subspace m's k init
    centroids come from the same k sampled rows.  Then `iters` Lloyd
    refinements per subspace, ALL subspaces in one job per iteration:
    one Arrow assignment pass + one groupBy (m, code, j) with exact
    scaled-integer sums (module docstring), collected at its bounded
    m_sub*k*ds size.  Empty cells keep their previous centroid (the
    kmeans_lite rule).  iters=0 returns the raw init codebook.

    Raises when the corpus has < k distinct vectors (duplicate init
    centroids can never separate) or dim % m_sub != 0."""
    if m_sub < 1 or k < 1 or iters < 0:
        raise ValueError(f"bad PQ params m_sub={m_sub} k={k} iters={iters}")
    sample = _md5_sample(corpus, vec_col, k, distinct=True)
    if sample.ndim != 2 or sample.shape[0] < k:
        found = 0 if sample.ndim != 2 else sample.shape[0]
        raise ValueError(f"pq_codebook needs >= {k} distinct vectors, found {found}")
    d = sample.shape[1]
    if d % m_sub != 0:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    # (k, d) -> (k, m_sub, ds) -> (m_sub, k, ds)
    C = np.ascontiguousarray(
        sample.reshape(k, m_sub, ds).transpose(1, 0, 2), dtype=np.float64
    )
    for _ in range(iters):
        enc = _make_encode_udf(C)
        coded = (
            corpus.select(
                F.col(vec_col).alias("_v"), enc(F.col(vec_col)).alias("_codes")
            )
            .where(F.col("_codes").isNotNull())
        )
        stats = (
            coded.select(F.posexplode("_v").alias("pos", "val"), "_codes")
            .select(
                F.expr("CAST(pos DIV {0} AS INT)".format(ds)).alias("m"),
                F.expr("CAST(pos % {0} AS INT)".format(ds)).alias("j"),
                F.col("val").cast("double").alias("val"),
                F.col("_codes").alias("codes"),
            )
            .select(
                "m",
                "j",
                "val",
                F.element_at("codes", F.col("m") + 1).alias("code"),
            )
            .groupBy("m", "code", "j")
            .agg(
                F.sum(
                    F.round(F.col("val") * F.lit(1000000000.0)).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        newC = C.copy()
        cells: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in stats:
            cells.setdefault((r["m"], r["code"]), {})[r["j"]] = (r["s"], r["c"])
        for (m, code), dims in cells.items():
            if len(dims) != ds:
                continue  # defensive: ragged row slipped through
            newC[m, code] = np.array(
                [(float(dims[j][0]) / float(dims[j][1])) / 1e9 for j in range(ds)],
                dtype=np.float64,
            )
        C = newC
    return C


def pq_encode(
    corpus: DataFrame,
    codebook: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """corpus + `out_col` (array<int>, one code per subspace). NULL /
    wrong-dim vectors get NULL codes.  One narrow Arrow pass."""
    _check_codebook(codebook)
    enc = _make_encode_udf(codebook)
    return corpus.withColumn(out_col, enc(F.col(vec_col)))


def _adc_expr(codes: Column, lut: Column) -> Column:
    """Approximate squared distance: fold the per-subspace LUT entries in
    subspace order (sequential — matches the twin's list_sum over an
    ORDER BY m list)."""
    return F.aggregate(
        F.zip_with(codes, lut, lambda c, l: F.element_at(l, c + F.lit(1))),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _sqdist_expr(a: Column, b: Column) -> Column:
    """Exact squared L2 between two SOURCE array columns: sequential
    zip_with fold in element order (bit-reproducible against a python
    index-order loop; never over a BUILT array — CLAUDE.md re-inline
    rule)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k_top: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """ADC search: encode the corpus once (one Arrow pass), precompute
    each query's (m_sub x k) lookup table on the broadcast side, then
    each (query, vector) pair costs m_sub lookups.  Output
    (query_id, corpus_id, adist, rank) with adist = round-6 approximate
    squared L2 and rank by (adist asc, corpus_id asc) — the
    deterministic tie-break the whole ANN family uses.  Corrupt rows
    (NULL codes / NULL LUT) never enter the join.

    `rerank=R` (R >= k_top) adds the exact re-rank stage (the FAISS
    IVFADC+R pattern — the remedy for ADC's lossy ordering, which on
    structureless uniform vectors is severe: measured recall@10 0.29
    pure-ADC vs 0.83 at R=100 on the dim-64 fixture corpus): ADC
    shortlists R candidates per query, the raw vectors of ONLY those
    R*|queries| rows join back (sparse equi-join on corpus_id — the
    corpus scan itself still never touches d floats per pair), and
    `adist` becomes the exact round-6 squared L2 (sequential zip_with
    fold).  Rank/tie-break discipline unchanged."""
    if k_top < 1:
        raise ValueError(f"k_top must be >= 1, got {k_top}")
    if rerank is not None and rerank < k_top:
        raise ValueError(f"rerank {rerank} must be >= k_top {k_top}")
    _check_codebook(codebook)
    coded = pq_encode(corpus, codebook, vec_col=corpus_vec, out_col="_codes")
    coded = coded.select(F.col(corpus_id), "_codes").where(
        F.col("_codes").isNotNull()
    )
    lut = _make_lut_udf(codebook)
    q = (
        queries.select(F.col(query_id), lut(F.col(query_vec)).alias("_lut"))
        .where(F.col("_lut").isNotNull())
    )
    joined = coded.crossJoin(F.broadcast(q)).select(
        query_id,
        F.col(corpus_id),
        F.round(_adc_expr(F.col("_codes"), F.col("_lut")), 6).alias("adist"),
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("adist"), F.asc(corpus_id))
    if rerank is None:
        return joined.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k_top
        )
    short = joined.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= rerank
    )
    cvec = corpus.select(
        F.col(corpus_id), F.col(corpus_vec).alias("_cv")
    ).where(F.col(corpus_vec).isNotNull())
    qvec = queries.select(
        F.col(query_id), F.col(query_vec).alias("_qv")
    ).where(F.col(query_vec).isNotNull())
    exact = (
        short.select(query_id, corpus_id)
        .join(cvec, corpus_id)
        .join(F.broadcast(qvec), query_id)
        .select(
            query_id,
            F.col(corpus_id),
            F.round(_sqdist_expr(F.col("_qv"), F.col("_cv")), 6).alias(
                "adist"
            ),
        )
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_top
    )


def pq_recall(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k_top: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """Measure, don't guess (the ann_recall discipline, L2 edition):
    per-query recall of the PQ top-k against the exact squared-L2
    brute-force top-k.  Output (query_id, n_exact, n_hit, recall).
    Both sides exclude NULL / wrong-dimension rows identically, so the
    comparison is over the same candidate universe."""
    m_sub, _, ds = _check_codebook(codebook)
    d = m_sub * ds
    approx = pq_topk(
        corpus, queries, codebook, k_top=k_top, corpus_id=corpus_id,
        corpus_vec=corpus_vec, query_id=query_id, query_vec=query_vec,
        rerank=rerank,
    )
    cvec = corpus.select(
        F.col(corpus_id), F.col(corpus_vec).alias("_cv")
    ).where(F.col(corpus_vec).isNotNull() & (F.size(corpus_vec) == d))
    qvec = queries.select(
        F.col(query_id), F.col(query_vec).alias("_qv")
    ).where(F.col(query_vec).isNotNull() & (F.size(query_vec) == d))
    w = Window.partitionBy(query_id).orderBy(F.asc("dist"), F.asc(corpus_id))
    exact = (
        cvec.crossJoin(F.broadcast(qvec))
        .select(
            query_id,
            F.col(corpus_id),
            F.round(_sqdist_expr(F.col("_qv"), F.col("_cv")), 6).alias(
                "dist"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
    )
    hits = exact.select(query_id, corpus_id).join(
        approx.select(query_id, corpus_id), [query_id, corpus_id],
        "left_semi",
    )
    n_exact = exact.groupBy(query_id).agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy(query_id).agg(F.count(F.lit(1)).alias("n_hit"))
    return n_exact.join(n_hit, query_id, "left").select(
        query_id,
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact"),
            6,
        ).alias("recall"),
    )
