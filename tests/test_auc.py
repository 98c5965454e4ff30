"""Exact tie-corrected Mann-Whitney AUC (evalmetrics.auc_mann_whitney):
exact Python mirror incl. heavy ties, hand-computed canonical cases,
bucket-count INVARIANCE (n_buckets=1 == 3 == 1024 — the two-phase
prefix is placement only), one-class NULL contract, NULL/NaN/non-binary
fail-louds, guards, grouped + global modes, and direct DuckDB twin
equality."""

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import auc_mann_whitney_sql
from audiopro_essentia_spark.operators.evalmetrics import auc_mann_whitney


def _mirror(pairs):
    pos, neg = Counter(), Counter()
    for s, y in pairs:
        (pos if y else neg)[s] += 1
    p, n = sum(pos.values()), sum(neg.values())
    if p == 0 or n == 0:
        return (p, n, None)
    u2, cneg = 0, 0
    for v in sorted(set(pos) | set(neg)):
        u2 += pos[v] * (2 * cneg + neg[v])
        cneg += neg[v]
    return (p, n, round(u2 / (2 * p * n), 6))


def _pairs(g):
    # deterministic overlapping distributions with heavy ties: scores
    # are integers mod 17 / mod 23 shifted by label
    out = []
    for i in range(400):
        y = (i * 7 + g) % 3 == 0
        s = float((i * 13 + g) % 17 + (4 if y else 0))
        out.append((s, 1 if y else 0))
    return out


def _df(spark, grouped=True):
    rows = []
    for g in range(4):
        rows += [(g, s, y) for s, y in _pairs(g)]
    df = spark.createDataFrame(rows, "cohort long, score double, label long")
    return df if grouped else df.drop("cohort")


def test_mirror_grouped_and_global(spark):
    got = {
        r["cohort"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_mann_whitney(
            _df(spark), "score", "label", ["cohort"]
        ).collect()
    }
    for g in range(4):
        assert got[g] == _mirror(_pairs(g)), g
    allp = [p for g in range(4) for p in _pairs(g)]
    [row] = auc_mann_whitney(_df(spark, grouped=False)).collect()
    assert (row["n_pos"], row["n_neg"], row["auc"]) == _mirror(allp)


@pytest.mark.parametrize("nb", [1, 3, 1024])
def test_bucket_invariance(spark, nb):
    got = {
        r["cohort"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_mann_whitney(
            _df(spark), "score", "label", ["cohort"], n_buckets=nb
        ).collect()
    }
    assert got == {g: _mirror(_pairs(g)) for g in range(4)}


def test_canonical_cases(spark):
    def one(pairs):
        df = spark.createDataFrame(pairs, "score double, label long")
        [r] = auc_mann_whitney(df).collect()
        return (r["n_pos"], r["n_neg"], r["auc"])

    # perfect separation / reversed / all-tied / textbook half-credit
    assert one([(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]) == (2, 2, 1.0)
    assert one([(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)]) == (2, 2, 0.0)
    assert one([(5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)]) == (2, 2, 0.5)
    # one tie at 2.0: pairs (pos2,neg1)=1, (pos2,neg2)=0.5, (pos3,*)=2
    # -> U=3.5, AUC=3.5/4
    assert one([(1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1)]) == (2, 2, 0.875)
    # one-class group: NULL auc, counts visible
    assert one([(1.0, 1), (2.0, 1)]) == (2, 0, None)


def test_fail_louds(spark):
    base = [(1.0, 0), (2.0, 1)]
    for bad, msg in (
        ((None, 1), "NULL or NaN score"),
        ((float("nan"), 0), "NULL or NaN score"),
        ((3.0, None), "NULL or non-binary label"),
        ((3.0, 2), "NULL or non-binary label"),
    ):
        df = spark.createDataFrame(base + [bad], "score double, label long")
        with pytest.raises(Exception, match=msg):
            auc_mann_whitney(df).collect()


def test_guards(spark):
    df = spark.createDataFrame([(1.0, 1)], "score double, label long")
    with pytest.raises(ValueError, match="n_buckets"):
        auc_mann_whitney(df, n_buckets=0)


def test_no_python_in_plan(spark):
    import contextlib
    import io

    out = auc_mann_whitney(_df(spark), "score", "label", ["cohort"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_twin_equality(spark):
    rows = []
    for g in range(4):
        rows += [(g, s, y) for s, y in _pairs(g)]
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(cohort BIGINT, score DOUBLE, label BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            auc_mann_whitney_sql(
                "SELECT cohort, score, label FROM ev", ("cohort",)
            )
        ).fetchall()
    }
    got = {
        r["cohort"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_mann_whitney(
            _df(spark), "score", "label", ["cohort"]
        ).collect()
    }
    assert got == want
    # global twin too
    [wg] = con.execute(
        auc_mann_whitney_sql("SELECT score, label FROM ev")
    ).fetchall()
    [rg] = auc_mann_whitney(_df(spark, grouped=False)).collect()
    assert (rg["n_pos"], rg["n_neg"], rg["auc"]) == tuple(wg)


# ---- pr_curve (shares _score_prefix with auc) ----


def _mirror_pr(pairs):
    pos, neg = Counter(), Counter()
    for s, y in pairs:
        (pos if y else neg)[s] += 1
    p, n = sum(pos.values()), sum(neg.values())
    out, cpos, cneg = {}, 0, 0
    for v in sorted(set(pos) | set(neg)):
        tp, fp = p - cpos, n - cneg
        out[v] = (
            tp,
            fp,
            round(tp / (tp + fp), 6),
            round(tp / p, 6) if p > 0 else None,
        )
        cpos += pos[v]
        cneg += neg[v]
    return out


def test_pr_curve_mirror(spark):
    from audiopro_essentia_spark.operators.evalmetrics import pr_curve

    res = pr_curve(_df(spark), "score", "label", ["cohort"]).collect()
    got = {}
    for r in res:
        got.setdefault(r["cohort"], {})[r["score"]] = (
            r["tp"], r["fp"], r["precision"], r["recall"]
        )
    for g in range(4):
        assert got[g] == _mirror_pr(_pairs(g)), g
    # global mode + threshold monotonicity: recall non-increasing in v
    rows = sorted(
        pr_curve(_df(spark, grouped=False)).collect(),
        key=lambda r: r["score"],
    )
    allp = [p for g in range(4) for p in _pairs(g)]
    assert {
        r["score"]: (r["tp"], r["fp"], r["precision"], r["recall"])
        for r in rows
    } == _mirror_pr(allp)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    # lowest threshold predicts everything positive: recall 1.0
    assert rows[0]["recall"] == 1.0


def test_pr_curve_no_positives(spark):
    from audiopro_essentia_spark.operators.evalmetrics import pr_curve

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0)], "score double, label long"
    )
    rows = pr_curve(df).collect()
    assert [(r["tp"], r["precision"], r["recall"]) for r in rows] == [
        (0, 0.0, None),
        (0, 0.0, None),
    ]


def test_pr_curve_twin_equality(spark):
    from audiopro_essentia_spark.duck_twins import pr_curve_sql
    from audiopro_essentia_spark.operators.evalmetrics import pr_curve

    rows = []
    for g in range(4):
        rows += [(g, s, y) for s, y in _pairs(g)]
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(cohort BIGINT, score DOUBLE, label BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            pr_curve_sql("SELECT cohort, score, label FROM ev", ("cohort",))
        ).fetchall()
    )
    got = sorted(
        (r["cohort"], r["score"], r["tp"], r["fp"], r["precision"],
         r["recall"])
        for r in pr_curve(_df(spark), "score", "label", ["cohort"]).collect()
    )
    assert got == want
