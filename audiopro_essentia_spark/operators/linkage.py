"""Fellegi-Sunter probabilistic record-linkage scoring.

The classical entity-resolution decision model (Fellegi & Sunter JASA
1969; the scoring core of Splink/dedupe-style linkers): given candidate
pairs from ANY blocking stage (minhash/simhash/allpairs/containment —
this engine's whole candidate-generation family), each compared field
contributes a log-likelihood-ratio weight — ln(m/u) on agreement,
ln((1-m)/(1-u)) on disagreement — where m = P(agree | same entity) and
u = P(agree | different entities) are declared per field. The summed
weight orders pairs by match likelihood and two thresholds cut it into
link / possible (clerical review) / non_link.

Exactness: m/u are driver-side parameters, so BOTH weights per field
are integer micro-nat LITERALS computed once in Python — the score is
an exact BIGINT sum of literals and every decision an exact integer
comparison; no ln() ever runs engine-side. Agreement is three-valued:
+1 both sides non-NULL and equal, -1 both non-NULL and unequal, 0 when
either side is NULL (a missing field is NO evidence — the standard FS
treatment, never a silent disagreement).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validate_fields(fields, schema_cols):
    if not fields:
        raise ValueError("fs_link_scores: empty field list")
    out = []
    seen = set()
    for f in fields:
        name, ca, cb = f.get("name"), f.get("col_a"), f.get("col_b")
        m, u = f.get("m"), f.get("u")
        if not name or name in seen:
            raise ValueError(
                f"fs_link_scores: missing/duplicate field name {name!r}"
            )
        seen.add(name)
        for c in (ca, cb):
            if c not in schema_cols:
                raise ValueError(
                    f"fs_link_scores[{name}]: unknown column {c!r}"
                )
        if m is None or u is None or not (0.0 < u < m < 1.0):
            raise ValueError(
                f"fs_link_scores[{name}]: need 0 < u < m < 1, got"
                f" m={m}, u={u} (m <= u means agreement is evidence"
                f" AGAINST a match — declare the field the other way)"
            )
        out.append(
            {
                "name": name,
                "col_a": ca,
                "col_b": cb,
                "wa": round(math.log(m / u) * 1e6),
                "wd": round(math.log((1.0 - m) / (1.0 - u)) * 1e6),
            }
        )
    return out


def fs_link_scores(
    pairs: DataFrame,
    fields: list[dict],
    id_a: str = "id_a",
    id_b: str = "id_b",
    lower: float = 0.0,
    upper: float = 4.0,
) -> DataFrame:
    """(id_a, id_b, agree_<field>..., score, decision) — Fellegi-Sunter
    match scores over a candidate-pair frame. Each field spec is
    {name, col_a, col_b, m, u} (m = P(agree|match), u =
    P(agree|non-match), 0 < u < m < 1 validated at plan time); `lower`
    and `upper` are the decision thresholds in nats (score <= lower ->
    'non_link', >= upper -> 'link', else 'possible' — both compared as
    exact micro-nat integers).

    agree_<field> is +1 / -1 / 0 (agree / disagree / either side NULL
    = no evidence, weight 0). score is the round-6 nat rendering of
    the exact BIGINT micro-nat sum.

    Scale shape: ZERO shuffles (plan-pinned: no Exchange) — one
    codegen projection over the pair frame; pair generation belongs to
    the upstream blocking stage (minhash_lsh / simhash / allpairs /
    containment), never here. Zero Python."""
    if lower >= upper:
        raise ValueError(
            f"fs_link_scores: need lower < upper, got {lower}, {upper}"
        )
    lo_u = round(lower * 1e6)
    hi_u = round(upper * 1e6)
    specs = _validate_fields(fields, set(pairs.columns))
    agrees = []
    score = F.lit(0).cast("long")
    for s in specs:
        a, b = F.col(s["col_a"]), F.col(s["col_b"])
        ag = (
            F.when(a.isNull() | b.isNull(), F.lit(0))
            .when(a == b, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
        )
        agrees.append(ag.alias(f"agree_{s['name']}"))
        score = score + (
            F.when(ag == 1, F.lit(s["wa"]))
            .when(ag == -1, F.lit(s["wd"]))
            .otherwise(F.lit(0))
            .cast("long")
        )
    su = score.alias("_su")
    staged = pairs.select(
        F.col(id_a).alias("id_a"),
        F.col(id_b).alias("id_b"),
        *agrees,
        su,
    )
    return staged.select(
        "id_a",
        "id_b",
        *[f"agree_{s['name']}" for s in specs],
        F.round(F.col("_su").cast("double") / 1e6, 6).alias("score"),
        F.when(F.col("_su") >= hi_u, F.lit("link"))
        .when(F.col("_su") <= lo_u, F.lit("non_link"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )


def sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    key_col: str,
    block_cols: list[str],
    window: int = 3,
) -> DataFrame:
    """(block..., id_a, id_b, key_a, key_b, dist) — sorted-neighborhood
    candidate-pair generation (Hernández & Stolfo's merge/purge,
    SIGMOD 1995): within each block, records sort by a fuzzy blocking
    key and every record pairs with its `window` successors in that
    order (dist = 1..window). The classic blocking stage for records
    whose keys are CLOSE but not equal — near-equal lengths, adjacent
    timestamps, similar name keys — where equi-join blocking
    (minhash buckets, exact keys) can't put near-misses in one
    bucket; its pairs feed fs_link_scores (or any verifier) exactly
    like the hash-blocking families do.

    Semantics: total order is (key, id-as-string) — deterministic
    under key ties; each row emits (row, succ_i) for i = 1..window
    via lead(), so the pair set is exactly {(a, b) : 1 <= rank(b) -
    rank(a) <= window} per block with NO self-join. Rows with
    identical (key, id) are indistinguishable, so their arbitrary
    relative order cannot change the output multiset. NULL ids and
    NULL keys fail LOUD (a silently-dropped row shifts every
    neighborhood behind it). Float keys should be quantized by the
    caller (the micro recipe) — the key passes through to the output.

    Scale shape: block_cols is REQUIRED and is the scale contract —
    the sort window partitions by block (the merge/purge form), so a
    block must fit a partition's memory, same as every
    applyInPandas-per-bucket operator here; a corpus-scale GLOBAL
    neighborhood would be a single-partition window — derive a
    range-bucket block from the key instead (epoch_shuffle's
    two-phase trick) and accept the bucket-boundary pair loss, or
    keep blocks real (that is the algorithm's point). All `window`
    lead() columns share ONE window spec over NAMED sort columns →
    exactly one Exchange + one Sort, zero joins, zero Python
    (plan-pinned).

    Reference parity: the reference has no linkage stage; this is the
    standard-literature blocking complement of fs_link_scores
    (linkage.py) following the candidate-generation contract of
    dedup.py's minhash/simhash/containment families."""
    if not block_cols:
        raise ValueError(
            "sorted_neighborhood: block_cols is required — blocks are "
            "the scale contract (see docstring); for a global "
            "neighborhood derive a range bucket from the key"
        )
    if not (1 <= int(window) <= 64):
        raise ValueError(
            f"sorted_neighborhood: window must be in [1, 64], got {window}"
        )
    w = int(window)
    g = list(block_cols)
    ktype = dict(df.dtypes)[key_col]
    k0 = F.col(key_col)
    kv = (
        F.when(
            k0.isNull(),
            F.raise_error(
                F.lit(f"sorted_neighborhood: NULL {key_col}")
            ).cast(ktype),
        )
        .otherwise(k0)
        .alias("_k")
    )
    rid = (
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(f"sorted_neighborhood: NULL {id_col}")
            ).cast("string"),
        )
        .otherwise(F.col(id_col).cast("string"))
        .alias("_id")
    )
    rows = df.select(*g, rid, kv)
    from pyspark.sql import Window as W

    spec = W.partitionBy(*g).orderBy("_k", "_id")
    # window exprs must be top-level projection columns (not inside a
    # generator) — one projection computes the leads, the next explodes
    led = rows.select(
        *g,
        "_id",
        "_k",
        *[
            c
            for i in range(1, w + 1)
            for c in (
                F.lead("_id", i).over(spec).alias(f"_idb{i}"),
                F.lead("_k", i).over(spec).alias(f"_kb{i}"),
            )
        ],
    )
    succ = F.array(
        *[
            F.struct(
                F.col(f"_idb{i}").alias("idb"),
                F.col(f"_kb{i}").alias("kb"),
            )
            for i in range(1, w + 1)
        ]
    )
    ex = led.select(
        *g,
        F.col("_id").alias("id_a"),
        F.col("_k").alias("key_a"),
        F.posexplode(succ).alias("_pos", "_s"),
    )
    return ex.where(F.col("_s.idb").isNotNull()).select(
        *g,
        "id_a",
        F.col("_s.idb").alias("id_b"),
        "key_a",
        F.col("_s.kb").alias("key_b"),
        (F.col("_pos") + 1).cast("long").alias("dist"),
    )


def golden_records(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    field_cols: list[str],
    rank_col: str | None = None,
) -> DataFrame:
    """(cluster, n_members, canon_id, <field>, <field>_support, ...) —
    survivorship / golden-record merge: the stage AFTER blocking
    (sorted_neighborhood / minhash / containment), scoring
    (fs_link_scores) and clustering (dedup_clusters) that the
    entity-resolution family was missing — each cluster of linked
    records collapses to ONE canonical row. Per field the elected
    value is the most frequent NON-NULL value ("majority wins", the
    standard survivorship rule), with the deterministic tie-break
    (count DESC, value ASC); <field>_support is the winner's count
    (support 0 / NULL value when the field is NULL across the whole
    cluster — visible, never silently invented). canon_id is the
    representative member: the id whose (rank, id) is
    (rank DESC, id ASC)-first when rank_col is given (rank = a
    quality/recency score — NULL ranks sort LAST), else the smallest
    id string.

    Fields are elected AS STRINGS (cast once): golden-record merge is
    a text-pipeline operation, and a single melted (cluster, field,
    value) pass beats one shuffle per field; numeric tie-breaks
    therefore order lexicographically — zero-pad numerics upstream if
    that matters (counts, the primary order, are unaffected). NULL
    cluster or id fail LOUD (an unclustered row belongs in no golden
    record; dedup_clusters emits every member).

    Scale shape: ONE melted explode pass -> map-side-combinable
    (cluster, field, value) counts -> per-(cluster, field) election
    window (partition bounded by the cluster's distinct values) ->
    conditional-aggregation pivot back to one row per cluster; the
    representative election is a per-cluster window (bounded by
    cluster size, the dedup_clusters contract). Zero Python, zero
    corpus-partition windows."""
    if not field_cols:
        raise ValueError("golden_records: field_cols is required")
    from pyspark.sql import Window as W

    cl = (
        F.when(
            F.col(cluster_col).isNull(),
            F.raise_error(
                F.lit(f"golden_records: NULL {cluster_col}")
            ).cast("string"),
        )
        .otherwise(F.col(cluster_col).cast("string"))
        .alias("cluster")
    )
    rid = (
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(F.lit(f"golden_records: NULL {id_col}")).cast(
                "string"
            ),
        )
        .otherwise(F.col(id_col).cast("string"))
        .alias("_id")
    )
    rk = (
        F.col(rank_col).cast("double").alias("_rk")
        if rank_col
        else F.lit(0.0).alias("_rk")
    )
    rows = df.select(
        cl,
        rid,
        rk,
        *[F.col(c).cast("string").alias(f"_f_{c}") for c in field_cols],
    ).localCheckpoint(eager=False)
    melted = rows.select(
        "cluster",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("field"),
                        F.col(f"_f_{c}").alias("value"),
                    )
                    for c in field_cols
                ]
            )
        ).alias("_s"),
    ).select(
        "cluster", F.col("_s.field").alias("_field"),
        F.col("_s.value").alias("_value"),
    )
    counts = (
        melted.where(F.col("_value").isNotNull())
        .groupBy("cluster", "_field", "_value")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    ew = W.partitionBy("cluster", "_field").orderBy(
        F.col("_cnt").desc(), F.col("_value").asc()
    )
    winners = (
        counts.withColumn("_rn", F.row_number().over(ew))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    piv = winners.groupBy("cluster").agg(
        *[
            x
            for c in field_cols
            for x in (
                F.max(
                    F.when(F.col("_field") == c, F.col("_value"))
                ).alias(f"_win_{c}"),
                F.coalesce(
                    F.max(
                        F.when(F.col("_field") == c, F.col("_cnt"))
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"_sup_{c}"),
            )
        ]
    )
    rw = W.partitionBy("cluster").orderBy(
        F.col("_rk").desc_nulls_last(), F.col("_id").asc()
    )
    members = (
        rows.withColumn("_rn", F.row_number().over(rw))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.when(F.col("_rn") == 1, F.col("_id"))).alias(
                "canon_id"
            ),
        )
    )
    out = members.join(piv, "cluster", "left")
    return out.select(
        "cluster",
        "n_members",
        "canon_id",
        *[
            x
            for c in field_cols
            for x in (
                F.col(f"_win_{c}").alias(c),
                F.coalesce(F.col(f"_sup_{c}"), F.lit(0).cast("long")).alias(
                    f"{c}_support"
                ),
            )
        ],
    )
