"""ranking_report (exact NDCG@k / MRR@k / MAP@k per query): exact
Python mirror (grouped + global), textbook hand cases (perfect /
reversed / no-relevant rankings), k edges, fail-louds (NULL order,
bad grades, ambiguous duplicate sort keys), empty contract, direct
DuckDB twin equality, and a zero-Python plan pin."""

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import ranking_report_sql
from audiopro_essentia_spark.operators.evalmetrics import (
    ndcg_weights,
    ranking_report,
)

MICRO = 10**6


def _mirror(rows, k):
    """rows: [(s, tie, rel)] for ONE query — the spec, written as the
    obvious sequential program."""
    w = ndcg_weights(k)
    byrank = sorted(rows, key=lambda r: (-r[0], r[1]))
    ideal = sorted(rows, key=lambda r: (-r[2], r[1]))
    n, n_rel = len(rows), sum(1 for r in rows if r[2] > 0)
    dcg = sum((2 ** r[2] - 1) * w[i] for i, r in enumerate(byrank[:k]))
    idcg = sum((2 ** r[2] - 1) * w[j] for j, r in enumerate(ideal[:k]))
    hits = apn = 0
    fr = None
    for i, r in enumerate(byrank[:k], start=1):
        if r[2] > 0:
            hits += 1
            if fr is None:
                fr = i
            apn += (hits * MICRO) // i
    return (
        n,
        n_rel,
        round(dcg / idcg, 6) if idcg > 0 else None,
        round(1.0 / fr, 6) if fr else 0.0,
        round((apn // min(n_rel, k)) / 1e6, 6) if n_rel > 0 else None,
    )


def _qrows(q):
    # deterministic per-query candidate soup: scores on a coarse grid
    # (real ties), graded rel 0..3 correlated with score
    out = []
    for i in range(40):
        s = float((i * 7 + q * 3) % 13)
        rel = max(0, ((i * 5 + q) % 7) - 3)
        out.append((s, i, rel))
    return out


def _df(spark, grouped=True):
    rows = []
    for q in range(4):
        rows += [(q, s, t, r) for s, t, r in _qrows(q)]
    df = spark.createDataFrame(
        rows, "q long, score double, tie long, rel long"
    )
    return df if grouped else df.where("q = 1").drop("q")


def _tup(r):
    return (r["n_items"], r["n_rel"], r["ndcg"], r["mrr"], r["ap"])


def test_mirror_grouped_and_global(spark):
    got = {
        r["q"]: _tup(r)
        for r in ranking_report(
            _df(spark), "score", "rel", "tie", ["q"], k=10
        ).collect()
    }
    assert got == {q: _mirror(_qrows(q), 10) for q in range(4)}
    [g] = ranking_report(_df(spark, False), "score", "rel", "tie", k=10).collect()
    assert _tup(g) == _mirror(_qrows(1), 10)


def test_perfect_and_reversed(spark):
    # ranking == ideal -> ndcg 1.0, mrr 1.0, ap 1.0 (binary rels)
    rows = [(float(10 - i), i, 1 if i < 3 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, tie long, rel long")
    [r] = ranking_report(df, "score", "rel", "tie", k=10).collect()
    assert _tup(r) == (10, 3, 1.0, 1.0, 1.0)
    # relevant items ranked LAST; textbook check at k=10:
    # ranks 8,9,10 -> mirror is the spec
    rows_rev = [(float(10 - i), i, 1 if i >= 7 else 0) for i in range(10)]
    df2 = spark.createDataFrame(rows_rev, "score double, tie long, rel long")
    [r2] = ranking_report(df2, "score", "rel", "tie", k=10).collect()
    assert _tup(r2) == _mirror([(s, t, rl) for s, t, rl in rows_rev], 10)
    assert r2["mrr"] == 0.125  # first relevant at rank 8


def test_graded_gains_textbook(spark):
    # Wang et al. style toy: rels (3,2,3,0,1,2) in rank order at k=6
    rels = [3, 2, 3, 0, 1, 2]
    rows = [(float(len(rels) - i), i, rels[i]) for i in range(len(rels))]
    df = spark.createDataFrame(rows, "score double, tie long, rel long")
    [r] = ranking_report(df, "score", "rel", "tie", k=6).collect()
    want = _mirror(rows, 6)
    assert _tup(r) == want
    w = ndcg_weights(6)
    dcg = sum((2**g - 1) * w[i] for i, g in enumerate(rels))
    idcg = sum((2**g - 1) * w[i] for i, g in enumerate(sorted(rels, reverse=True)))
    assert r["ndcg"] == round(dcg / idcg, 6)


def test_no_relevant_and_k_edges(spark):
    rows = [(float(i), i, 0) for i in range(5)]
    df = spark.createDataFrame(rows, "score double, tie long, rel long")
    [r] = ranking_report(df, "score", "rel", "tie", k=3).collect()
    assert _tup(r) == (5, 0, None, 0.0, None)
    # k = 1: only the top item counts
    rows2 = [(2.0, 0, 0), (1.0, 1, 1)]
    df2 = spark.createDataFrame(rows2, "score double, tie long, rel long")
    [r2] = ranking_report(df2, "score", "rel", "tie", k=1).collect()
    assert _tup(r2) == (2, 1, 0.0, 0.0, 0.0)
    # k beyond list length: weights cover k, ranks stop at n
    [r3] = ranking_report(df2, "score", "rel", "tie", k=50).collect()
    assert _tup(r3) == _mirror(rows2, 50)
    with pytest.raises(ValueError, match="k must be"):
        ranking_report(df2, "score", "rel", "tie", k=0)


def test_tie_break_is_deterministic(spark):
    # equal scores: tie ASC decides; moving the relevant item's tie
    # from 0 to 9 flips mrr from 1 to 1/10 (ALL scores equal)
    for tie, want_mrr in ((0, 1.0), (9, 0.1)):
        rows = [(5.0, t, 1 if t == tie else 0) for t in range(10)]
        df = spark.createDataFrame(rows, "score double, tie long, rel long")
        [r] = ranking_report(df, "score", "rel", "tie", k=10).collect()
        assert r["mrr"] == want_mrr


def test_fail_louds(spark):
    base = [(2.0, 0, 1), (1.0, 1, 0)]
    for bad, msg in (
        ((None, 2, 0), "NULL or NaN score"),
        ((float("nan"), 2, 0), "NULL or NaN score"),
        ((0.5, 2, None), "NULL/negative/>30 rel"),
        ((0.5, 2, -1), "NULL/negative/>30 rel"),
        ((0.5, 2, 31), "NULL/negative/>30 rel"),
        ((2.0, 0, 0), "duplicate"),  # (score, tie) collides with base[0]
    ):
        df = spark.createDataFrame(
            base + [bad], "score double, tie long, rel long"
        )
        with pytest.raises(Exception, match=msg):
            ranking_report(df, "score", "rel", "tie", k=5).collect()


def test_empty(spark):
    empty = spark.createDataFrame([], "score double, tie long, rel long")
    assert ranking_report(empty, "score", "rel", "tie", k=5).count() == 0


def test_twin_equality(spark):
    rows = []
    for q in range(4):
        rows += [(q, s, t, r) for s, t, r in _qrows(q)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(q BIGINT, s DOUBLE, tie BIGINT, rel BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            ranking_report_sql(
                "SELECT q, s, tie, rel FROM t", ("q",), k=10
            )
        ).fetchall()
    }
    got = {
        r["q"]: _tup(r)
        for r in ranking_report(
            _df(spark), "score", "rel", "tie", ["q"], k=10
        ).collect()
    }
    assert got == want
    [wg] = con.execute(
        ranking_report_sql("SELECT s, tie, rel FROM t WHERE q = 1", k=10)
    ).fetchall()
    [gg] = ranking_report(
        _df(spark, False), "score", "rel", "tie", k=10
    ).collect()
    assert _tup(gg) == tuple(wg)


def test_no_python_one_exchange(spark):
    out = ranking_report(_df(spark), "score", "rel", "tie", ["q"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    # both windows partition by q: ONE q-key exchange feeds them
    assert plan.count("hashpartitioning(q") <= 1
