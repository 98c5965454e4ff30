"""Hashing-trick document embeddings — deterministic bag-of-words vectors
with no ML library: v[H(word) mod dim] += 1, then L2-normalize. The
standard featurization for similarity / clustering / near-dup when no
model is available (public method — 'feature hashing', Weinberger et al.
2009; independent re-implementation on the engine's portable hash).

Scale shape: fully relational — explode -> (doc, slot) count (map-side
combinable hash agg) -> per-doc map_from_entries -> dense array via a
transform over 0..dim-1. No UDF, no per-doc Python; the vector column
feeds the existing ANN / embedding near-dup operators directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32, words


def hashed_doc_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """(id, embedding array<double>): hashed bag-of-words, L2-normalized
    unless `normalize=False` (raw counts)."""
    tok = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("_w")
    )
    slot = tok.select(
        id_col, F.pmod(portable_hash32(F.col("_w")), F.lit(dim)).alias("_i")
    )
    cnt = slot.groupBy(id_col, "_i").agg(F.count(F.lit(1)).alias("_c"))
    # the L2 norm comes out of the SAME aggregate as a scalar (sum of
    # squared counts == ||dense vector||^2): expressing it as
    # aggregate(arr, ...) instead lets Catalyst's projection collapse
    # re-inline the whole 64-lookup array build into EVERY element's
    # division — measured 64x expression blow-up (the CLAUDE.md trap)
    m = cnt.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_i"), F.col("_c")))
        ).alias("_m"),
        F.sum(F.col("_c") * F.col("_c")).cast("double").alias("_sq"),
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at("_m", j), F.lit(0)).cast("double"),
    )
    if normalize:
        vec = F.transform(arr, lambda x: x / F.sqrt("_sq"))  # >=1 word
    else:
        vec = arr
    return m.select(F.col(id_col), vec.alias("embedding"))
