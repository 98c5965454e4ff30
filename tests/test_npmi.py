"""npmi_collocations — Church-Hanks PMI, Bouma-normalized: python
micro-nat mirror, planted-collocation ranking, min_count/top_k
contracts, deterministic tie order, scale-plan pin, twin equality."""

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from audiopro_essentia_spark.duck_twins import npmi_collocations_sql
from audiopro_essentia_spark.operators.tfidf import npmi_collocations

# 'new york' is a true collocation: both words frequent, ALWAYS adjacent;
# filler words co-occur incidentally
DOCS = [
    (i, "the city of new york has the people and the parks of new york")
    for i in range(6)
] + [
    (10 + i, "the people and the parks and the city are busy today now")
    for i in range(6)
]


def _mirror(texts, min_count, top_k):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        ws = [x for x in (t or "").split(" ") if x]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n1, n2 = sum(uni.values()), sum(bi.values())
    r = lambda c: round(math.log(c) * 1e6)
    out = []
    for (w1, w2), cb in bi.items():
        if cb < min_count:
            continue
        pmi = r(cb) + 2 * r(n1) - r(uni[w1]) - r(uni[w2]) - r(n2)
        dn = r(n2) - r(cb)
        if dn <= 0:
            continue
        out.append((w1, w2, cb, uni[w1], uni[w2], pmi, round(pmi / dn, 6)))
    out.sort(key=lambda x: (-x[6], x[0], x[1]))
    return out[:top_k]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_python_micro_nat_mirror(spark):
    got = [
        tuple(r)
        for r in npmi_collocations(_df(spark), min_count=3, top_k=30)
        .collect()
    ]
    assert got == _mirror([t for _, t in DOCS], 3, 30)


def test_planted_collocation_ranks_first(spark):
    top = npmi_collocations(_df(spark), min_count=3, top_k=5).collect()
    assert (top[0].w1, top[0].w2) == ("new", "york")
    assert top[0].npmi > 0.9  # always-adjacent pair is near-perfect


def test_min_count_filters_hapax(spark):
    out = npmi_collocations(_df(spark), min_count=7, top_k=100).collect()
    assert out and all(r.pair_count >= 7 for r in out)


def test_guards(spark):
    with pytest.raises(ValueError, match="min_count"):
        npmi_collocations(_df(spark), min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        npmi_collocations(_df(spark), top_k=0)


def test_plan_distributed_topk(spark):
    """Scale pins: the global top-k is TakeOrderedAndProject (partial
    per-partition top-k merged on the driver), never a full Sort of the
    filtered pair table; zero Python; and the visible plan explodes the
    corpus exactly ONCE (bigrams — the unigram subtree runs once behind
    the eager localCheckpoint and appears as a Scan ExistingRDD). The
    first form paid five corpus passes: Catalyst re-ran the unigram
    subtree for each of its three consumers and the bigram subtree for
    both of its two (totals now come from one narrow size() aggregate,
    the vocab table is checkpointed)."""
    plan = (
        npmi_collocations(_df(spark), min_count=3, top_k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan
    assert plan.count("Generate explode") == 1, plan


def test_twin_matches_duckdb(spark):
    sp = npmi_collocations(_df(spark), min_count=3, top_k=25).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    dd = con.execute(npmi_collocations_sql(min_count=3, top_k=25)).fetchdf()
    dd = dd.astype(sp.dtypes.to_dict())
    assert sp.reset_index(drop=True).equals(dd.reset_index(drop=True))
