"""allpairs_jaccard_pairs — lossless prefix-filtered all-pairs Jaccard
join (Bayardo et al. WWW'07): brute-force losslessness at several
thresholds, exact-integer outputs vs a python mirror, the recall case
the df-capped ngram index documents as lost, guards, scale-plan pins,
twin equality."""

import random

import duckdb
import pandas as pd
import pytest

from audiopro_essentia_spark.duck_twins import allpairs_jaccard_sql
from audiopro_essentia_spark.operators.dedup import (
    allpairs_jaccard_pairs,
    ngram_jaccard_pairs,
)

VOCAB = [f"w{i:02d}" for i in range(40)]


def _corpus():
    """Deterministic mixed corpus: random docs, planted near-dup pairs
    at several overlap levels, short docs below the shingle floor."""
    rng = random.Random(7)
    docs = []
    for i in range(30):
        n = rng.randint(8, 30)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    # planted near-dups: append / flip a word
    for k, (i, t) in enumerate(docs[:8]):
        ws = t.split(" ")
        if k % 2 == 0:
            ws = ws + ["zz"]
        else:
            ws[len(ws) // 2] = "zz"
        docs.append((100 + i, " ".join(ws)))
    docs.append((200, "a b"))  # below the 3-gram floor: zero shingles
    docs.append((201, "a b"))
    return docs


def _shingles(text, ngram=3):
    ws = text.split(" ")
    return set(
        " ".join(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1)
    )


def _mirror(docs, threshold, ngram=3):
    t_micro = round(threshold * 1e6)
    sets = {i: _shingles(t, ngram) for i, t in docs}
    out = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if 1_000_000 * inter >= t_micro * union:
                out.append((a, b, inter, union, round(inter / union, 6)))
    return sorted(out)


def _run(spark, docs, threshold):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = allpairs_jaccard_pairs(df, threshold=threshold).collect()
    return sorted(
        (r.id_a, r.id_b, r.n_inter, r.n_union, r.jaccard) for r in got
    )


@pytest.mark.parametrize("threshold", [0.5, 0.8, 0.9, 1.0])
def test_lossless_vs_brute_force(spark, threshold):
    """THE prefix-filter guarantee: output == exhaustive all-pairs exact
    Jaccard at the threshold — nothing lost, nothing extra, exact
    integer inter/union."""
    docs = _corpus()
    assert _run(spark, docs, threshold) == _mirror(docs, threshold)


def test_finds_pairs_the_df_cap_loses(spark):
    """The documented ngram_jaccard max_df recall hole: a group of
    near-identical (but NOT byte-identical) docs larger than max_df
    shares only shingles hotter than the cap, so the capped index
    drops every pair — the prefix filter keeps them all."""
    base = " ".join(f"t{i}" for i in range(20))
    group = [(i, base + f" x{i}") for i in range(6)]  # pairwise J = 18/24
    docs = group + [(50 + i, " ".join(f"q{i}b{j}" for j in range(10)))
                    for i in range(4)]
    expect = _mirror(docs, 0.7)
    assert len(expect) == 15  # all C(6,2) group pairs qualify
    assert _run(spark, docs, 0.7) == expect
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, threshold=0.7, max_df=3).collect()
    assert capped == []  # the cap loses every pair; allpairs does not


def test_guards(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        allpairs_jaccard_pairs(df, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        allpairs_jaccard_pairs(df, threshold=1.5)
    with pytest.raises(ValueError, match="multiple of 1e-6"):
        allpairs_jaccard_pairs(df, threshold=0.8 + 1e-9)
    with pytest.raises(ValueError, match="ngram"):
        allpairs_jaccard_pairs(df, ngram=0)


def test_plan_scale_pins(spark):
    """Zero Python, no cartesian anywhere — candidates come from
    per-shingle prefix buckets, never a cross join."""
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    plan = (
        allpairs_jaccard_pairs(df, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the O(n) intersect appears ONCE in the pushed join condition and
    # once in the output projection — the naive two-mention acceptance
    # filter re-inlined it to 3 evals per candidate pair
    assert plan.count("array_intersect") <= 2, plan


def test_twin_matches_duckdb(spark):
    docs = _corpus()
    sp = (
        allpairs_jaccard_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            threshold=0.8,
        )
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    dd = con.execute(
        allpairs_jaccard_sql(threshold=0.8) + " ORDER BY id_a, id_b"
    ).fetchdf()
    dd = dd.astype(sp.dtypes.to_dict())
    assert sp.reset_index(drop=True).equals(dd.reset_index(drop=True))
