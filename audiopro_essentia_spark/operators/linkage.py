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
