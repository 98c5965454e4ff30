"""rrf_fuse (Reciprocal Rank Fusion, Cormack-Clarke-Buettcher SIGIR'09)
— exact python micro-unit mirror (incl. missing-from-one-list docs and
rrf_micro ties), fail-loud guards (NULL/zero rank, duplicated row),
arg guards, scale-plan pins, and full hybrid-twin equality on a
constructed corpus (bm25 + brute-cosine -> fuse vs rrf_hybrid_sql)."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import rrf_hybrid_sql
from audiopro_essentia_spark.operators.selection import bm25_topk, rrf_fuse
from audiopro_essentia_spark.operators.similarity import brute_force_topk


def _contrib(rank, k=60):
    # Spark/DuckDB round() = half away from zero; python round() is
    # banker's — mirror half-away explicitly (1e6/(60+r) CAN tie: r=68)
    return math.floor(1e6 / (k + rank) + 0.5)


def _mirror(lists, k=60, topk=10):
    acc: dict = {}
    for lst in lists:
        for q, d, r in lst:
            n, s = acc.get((q, d), (0, 0))
            acc[(q, d)] = (n + 1, s + _contrib(r, k))
    rows = sorted(
        ((q, d, n, s) for (q, d), (n, s) in acc.items()),
        key=lambda x: (x[0], -x[3], x[1]),
    )
    out = []
    for q in sorted({r[0] for r in rows}):
        grp = [r for r in rows if r[0] == q][:topk]
        out += [(*r, i + 1) for i, r in enumerate(grp)]
    return out


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


LIST_A = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2)]
# doc 11 in both lists; docs 13/22 dense-only; doc 68-rank exercises the
# decimal-half tie (1e6/128 = 7812.5 -> 7813 half-away in both engines)
LIST_B = [(0, 11, 1), (0, 13, 2), (1, 22, 1), (1, 20, 68)]


def test_python_micro_mirror(spark):
    got = [
        tuple(r)
        for r in rrf_fuse(
            [_ranked(spark, LIST_A), _ranked(spark, LIST_B)], topk=10
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == _mirror([LIST_A, LIST_B])
    # the tie-exercising rank-68 contribution really is the half-away case
    assert _contrib(68) == 7813 and 1e6 / 128 == 7812.5


def test_shared_doc_outranks_single_system(spark):
    out = {
        (r.query_id, r.doc_id): r
        for r in rrf_fuse(
            [_ranked(spark, LIST_A), _ranked(spark, LIST_B)], topk=10
        ).collect()
    }
    both = out[(0, 11)]  # rank 2 lexical + rank 1 dense
    assert both.n_systems == 2 and both.rank == 1
    assert out[(0, 10)].n_systems == 1  # lexical rank 1 alone loses
    assert both.rrf_micro == _contrib(2) + _contrib(1)


def test_single_list_is_rank_passthrough(spark):
    out = (
        rrf_fuse([_ranked(spark, LIST_A)], topk=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.doc_id, r.rank) for r in out] == [
        (q, d, r) for q, d, r in sorted(LIST_A)
    ]
    assert all(r.n_systems == 1 for r in out)


def test_topk_cuts(spark):
    out = rrf_fuse(
        [_ranked(spark, LIST_A), _ranked(spark, LIST_B)], topk=2
    ).collect()
    assert len(out) == 4  # 2 queries x top-2
    assert all(r.rank <= 2 for r in out)


def test_guards(spark):
    with pytest.raises(ValueError, match=">= 1 ranked"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k_const"):
        rrf_fuse([_ranked(spark, LIST_A)], k_const=0)
    with pytest.raises(ValueError, match="topk"):
        rrf_fuse([_ranked(spark, LIST_A)], topk=0)


def test_null_or_zero_rank_fails_loud(spark):
    bad = spark.createDataFrame(
        [(0, 10, None)], "query_id long, doc_id long, rank int"
    )
    with pytest.raises(Exception, match="rrf_fuse: NULL or < 1 rank"):
        rrf_fuse([bad]).collect()
    with pytest.raises(Exception, match="rrf_fuse: NULL or < 1 rank"):
        rrf_fuse([_ranked(spark, [(0, 10, 0)])]).collect()


def test_duplicate_row_within_list_fails_loud(spark):
    dup = _ranked(spark, [(0, 10, 1), (0, 10, 2)])
    with pytest.raises(Exception, match="duplicate \\(query, id\\)"):
        rrf_fuse([dup]).collect()


def test_plan_pins(spark):
    """Scale pins: zero Python anywhere; the final per-query top-k is the
    two-phase salted window with WindowGroupLimit partial pushdown on
    BOTH phases (4 nodes: Partial+Final x 2), so a hot query's fusion
    never funnels through one reducer."""
    df = rrf_fuse([_ranked(spark, LIST_A), _ranked(spark, LIST_B)])
    df.collect()
    # AQE's toString prints "== Final Plan ==" then "== Initial Plan =="
    # — count nodes in the final section only
    simple = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Python" not in simple
    assert simple.count("WindowGroupLimit") == 4, simple


DOCS = [
    (0, "spark window functions rank rows"),
    (1, "lexical match spark filter scan"),
    (2, "cosine vectors embed space"),
    (3, "rank fusion hybrid search spark"),
    (4, "filter scan pushdown parquet"),
    (5, "window agg over partitions"),
    (6, "totally unrelated pottery glaze"),
    (7, "spark rank window filter scan"),
]
# dim-4 embeddings; ids align with DOCS
VECS = [
    (0, [1.0, 0.0, 0.0, 0.5]),
    (1, [0.9, 0.1, 0.0, 0.4]),
    (2, [0.0, 1.0, 0.2, 0.0]),
    (3, [0.1, 0.9, 0.3, 0.0]),
    (4, [0.0, 0.0, 1.0, 0.1]),
    (5, [0.1, 0.0, 0.9, 0.2]),
    (6, [0.5, 0.5, 0.5, 0.5]),
    (7, [0.8, 0.0, 0.1, 0.6]),
]
QUERIES = ((0, "spark rank window"), (1, "filter scan"), (2, "cosine space"))


def test_hybrid_twin_matches_duckdb(spark):
    """End-to-end hybrid parity on a constructed corpus: Spark bm25 +
    brute-cosine + rrf_fuse vs the one rrf_hybrid_sql statement DuckDB
    runs — full-frame equality, not just hashes."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    e = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(list(QUERIES), "query_id int, query string")
    lex = bm25_topk(d, qs, k=5).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "rank",
    )
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("long").alias("query_id"), "embedding"
    )
    dense = brute_force_topk(e, qv, k=5).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("doc_id"),
        "rank",
    )
    sp = (
        rrf_fuse([lex, dense], k_const=60, topk=4)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register(
        "embeddings", pd.DataFrame(VECS, columns=["vec_id", "embedding"])
    )
    sql = rrf_hybrid_sql(
        ", ".join(f"({i}, '{s}')" for i, s in QUERIES),
        n_dense_q=3,
        k_lex=5,
        k_dense=5,
        k_const=60,
        topk=4,
    )
    dd = (
        con.execute(sql)
        .fetchdf()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype(sp.dtypes.to_dict())
    )
    assert sp.reset_index(drop=True).equals(dd)
