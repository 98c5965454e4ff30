"""Distributed PCA — top principal component by EXACT-INTEGER power
iteration over an embedding column.

The classic scale shape: each iteration is ONE narrow partial-aggregate
pass over the data (d sums of ``v[i] * s`` plus two scalars), the d-vector
state lives on the driver (like the k x d k-means centroids,
operators/similarity.py), and the per-row work is a single dot product —
no d x d covariance materialization, no shuffle beyond the aggregate's
own exchange, no Python UDF anywhere.

Why integers: float power iteration is summation-order-sensitive, so a
Spark run and a DuckDB oracle run would drift. Instead the embeddings
are quantized once (``round(x * scale)`` -> BIGINT) and every subsequent
operation — the dot products, the centered matrix-vector product, the
renormalization — is exact 64-bit integer arithmetic that both engines
(and the numpy golden) reproduce bit-for-bit:

  s_r      = sum_i v_r[i] * w[i]                    (per row)
  A_i      = sum_r v_r[i] * s_r ; B_i = sum_r v_r[i] ; S = sum_r s_r
  raw_i    = A_i - B_i * tdiv(S, n)        # centered C.w (up to exact
                                           # integer truncation of mean)
  D        = max(1, tdiv(max_i |raw_i|, 2**target_bits))
  w'_i     = tdiv(raw_i, D)                # renormalize to ~target_bits

``tdiv`` is TRUNCATING division (toward zero) — DuckDB's BIGINT ``//``
truncates (measured: -7 // 2 = -3) while Python's ``//`` floors, so the
driver-side mirror must not use the native operator.

Overflow bounds (|v| <= scale * max|x| ~ 100, d = 64, |w| < 2**18):
|s| <= 64*100*2^18 ~ 1.7e9, |A_i| <= n * 100 * |s|max — safe in BIGINT
through n ~ 10^8 rows; at larger n, pre-scale `scale` down.

Reference analog: the reference ships per-feature matrices but no
decomposition; this is the embedding-column counterpart of its batched
feature statistics (src/audiopro/audio/extractor.py frame loop) lifted
to a corpus-level spectral summary.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — mirrors DuckDB BIGINT
    `//` and Spark's `div` exactly; Python's `//` floors instead."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def quantized_vec(col, scale: int):
    """array<float> -> array<bigint>: round(x * scale). The ONE lossy step;
    everything after is exact."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _dot_literal(vcol, w: list):
    """Exact integer dot(v, w) with w embedded as literals, as a flat
    multiply-add chain: element_at(v, i) * w_i terms summed left to
    right. Higher-order-function lambdas (the old aggregate(zip_with(..))
    form) are interpreted per element with no codegen — 2d interpreted
    lambda frames plus a zipped-array allocation per ROW — while the
    chain stays inside whole-stage codegen (measured: the dominant cost
    of the pca_power passes). Integer adds are order-free, so the value
    is bit-identical; NULL rows still yield NULL (NULL propagates
    through every + in the chain exactly as it poisoned the fold).

    `vcol` MUST be a cheap reference (an attribute, not an expression
    tree): it is referenced len(w) times, and Catalyst re-inlines
    expression arguments per reference (the array_repeat/zip_with rule,
    CLAUDE.md). Rows shorter than len(w) must be excluded upstream —
    element_at is out-of-bounds-strict under ANSI."""
    expr = None
    for i, x in enumerate(w):
        t = F.element_at(vcol, i + 1) * F.lit(int(x)).cast("long")
        expr = t if expr is None else expr + t
    return expr if expr is not None else F.lit(0).cast("long")


def _dot_quantized_inline(col, w: list, scale: int):
    """dot(quantize(col), w) with per-element quantization INLINE in each
    chain term — passing quantized_vec(col) to _dot_literal would
    re-inline the whole d-element transform per term (d^2 interpreted
    evals). round/cast run once per term here, the same per-element
    count as the transform, but in codegen. try_element_at gives NULL
    past the end, so short rows yield NULL exactly like zip_with's
    NULL-padding poisoned the old fold (and NULL arrays stay NULL)."""
    expr = None
    for i, x in enumerate(w):
        q = F.round(
            F.try_element_at(col, F.lit(i + 1)).cast("double")
            * F.lit(float(scale))
        ).cast("long")
        t = q * F.lit(int(x)).cast("long")
        expr = t if expr is None else expr + t
    return expr if expr is not None else F.lit(0).cast("long")


def power_iteration(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 2,
    scale: int = 100,
    target_bits: int = 16,
) -> list:
    """Run `n_iter` exact-integer power-iteration steps from w0 = all-ones;
    return the final integer direction vector w (length `dim`).

    Each step is one narrow aggregate job (d+2 sums); driver state is the
    d-vector only. The caller projects rows with `project_component`.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1 (got {n_iter})")
    # NULL / wrong-length rows are EXCLUDED up front: F.sum would skip a
    # NULL row's contribution while F.count(F.lit(1)) still counted it,
    # silently biasing mean_s (and a short array would throw
    # ArrayIndexOutOfBounds from element_at under ANSI mid-aggregate).
    # A no-op on well-formed corpora, so the SQL twin is unchanged.
    valid = df.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    )
    v = valid.select(quantized_vec(F.col(vec_col), scale).alias("v"))
    if n_iter > 1:
        # each iteration is one aggregate pass over v; persisting the
        # quantized projection trades one materialization for n_iter-1
        # re-scans (and re-quantizations) of the source table
        v = v.persist()
    # B_i and n are iteration-invariant: fold them into the first pass
    w = [1] * dim
    b_vec = None
    n_rows = None
    for _ in range(n_iter):
        s = v.withColumn("s", _dot_literal(F.col("v"), w))
        aggs = [
            F.sum(F.element_at("v", i + 1) * F.col("s")).alias(f"a{i}")
            for i in range(dim)
        ]
        if b_vec is None:
            aggs += [F.sum(F.element_at("v", i + 1)).alias(f"b{i}") for i in range(dim)]
            aggs += [F.count(F.lit(1)).alias("n")]
        aggs += [F.sum("s").alias("st")]
        row = s.agg(*aggs).collect()[0]
        if b_vec is None:
            n_rows = int(row["n"])
            if n_rows == 0:
                # the sums are NULL on empty input — fail loud before
                # touching them
                raise ValueError("power_iteration on an empty DataFrame")
            b_vec = [int(row[f"b{i}"]) for i in range(dim)]
        st = int(row["st"])
        mean_s = tdiv(st, n_rows)
        raw = [int(row[f"a{i}"]) - b_vec[i] * mean_s for i in range(dim)]
        max_abs = max(abs(r) for r in raw)
        if max_abs == 0:
            # degenerate (zero centered covariance, e.g. constant input):
            # no principal direction exists — return the zero vector,
            # exactly what the SQL twin computes (raw_i = 0 for all i),
            # so the branch is oracle-consistent rather than divergent
            w = [0] * dim
            break
        d_scale = max(1, tdiv(max_abs, 1 << target_bits))
        w = [tdiv(r, d_scale) for r in raw]
    if n_iter > 1:
        v.unpersist()
    return w


def project_component(
    df: DataFrame,
    w: list,
    vec_col: str = "embedding",
    id_cols: tuple = ("vec_id",),
    scale: int = 100,
    out_col: str = "pc1_proj",
) -> DataFrame:
    """Per-row exact integer projection score dot(quantize(v), w)."""
    return df.select(
        *[F.col(c) for c in id_cols],
        _dot_quantized_inline(F.col(vec_col), w, scale).alias(out_col),
    )
