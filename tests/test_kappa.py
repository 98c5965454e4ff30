"""cohen_kappa (exact chance-corrected inter-rater agreement per
group): exact Python mirror (grouped + global, multi-class), the
classic textbook 2x2 case (po 0.7 / pe 0.5 / kappa 0.4), perfect /
constant / disjoint-label edge contracts, fail-louds, empty contract,
direct DuckDB twin equality, zero-Python plan pin."""

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import cohen_kappa_sql
from audiopro_essentia_spark.operators.evalmetrics import cohen_kappa


def _mirror(pairs):
    from collections import Counter

    n = len(pairs)
    conf = Counter(pairs)
    diag = sum(c for (a, b), c in conf.items() if a == b)
    ra, cb = Counter(), Counter()
    for (a, b), c in conf.items():
        ra[a] += c
        cb[b] += c
    pen = sum(ra[cat] * cb[cat] for cat in set(ra) & set(cb))
    po = round(diag / n, 6)
    pe = round(pen / (n * n), 6)
    den = n * n - pen
    kappa = round((n * diag - pen) / den, 6) if den > 0 else None
    return (n, po, pe, kappa)


def _pairs(g):
    # deterministic 3-class raters with group-dependent disagreement
    cats = ["x", "y", "z"]
    out = []
    for i in range(240):
        a = cats[(i * 7 + g) % 3]
        b = cats[(i * 7 + g) % 3 if (i * 11 + g) % 4 else (i * 5) % 3]
        out.append((a, b))
    return out


def _df(spark, grouped=True):
    rows = []
    for g in range(3):
        rows += [(g, a, b) for a, b in _pairs(g)]
    df = spark.createDataFrame(rows, "g long, a string, b string")
    return df if grouped else df.where("g = 1").drop("g")


def _tup(r):
    return (r["n"], r["po"], r["pe"], r["kappa"])


def test_mirror_grouped_and_global(spark):
    got = {
        r["g"]: _tup(r)
        for r in cohen_kappa(_df(spark), "a", "b", ["g"]).collect()
    }
    assert got == {g: _mirror(_pairs(g)) for g in range(3)}
    [r] = cohen_kappa(_df(spark, False), "a", "b").collect()
    assert _tup(r) == _mirror(_pairs(1))


def test_textbook_2x2(spark):
    # Cohen's classic: 20 yy, 15 nn, 10 yn, 5 ny ->
    # po = 35/50 = 0.7, pe = (30*25 + 20*25)/2500 = 0.5, kappa = 0.4
    rows = (
        [("yes", "yes")] * 20
        + [("no", "no")] * 15
        + [("yes", "no")] * 10
        + [("no", "yes")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = cohen_kappa(df, "a", "b").collect()
    assert _tup(r) == (50, 0.7, 0.5, 0.4)


def test_edge_contracts(spark):
    # perfect agreement -> kappa 1
    rows = [("x", "x")] * 3 + [("y", "y")] * 2
    [r] = cohen_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()
    assert _tup(r) == (5, 1.0, _mirror(rows)[2], 1.0)
    # both raters constant and equal: pe = 1 -> kappa NULL
    const = [("x", "x")] * 4
    [rc] = cohen_kappa(
        spark.createDataFrame(const, "a string, b string"), "a", "b"
    ).collect()
    assert _tup(rc) == (4, 1.0, 1.0, None)
    # disjoint label sets: no shared category -> pe 0, kappa 0
    dis = [("x", "p")] * 3 + [("y", "q")] * 2
    [rd] = cohen_kappa(
        spark.createDataFrame(dis, "a string, b string"), "a", "b"
    ).collect()
    assert _tup(rd) == (5, 0.0, 0.0, 0.0)
    # integer categories compare as their string renderings
    ints = [(1, 1), (2, 2), (1, 2)]
    [ri] = cohen_kappa(
        spark.createDataFrame(ints, "a long, b long"), "a", "b"
    ).collect()
    assert _tup(ri) == _mirror([("1", "1"), ("2", "2"), ("1", "2")])


def test_fail_louds_and_empty(spark):
    for rows, msg in (
        ([("x", "x"), (None, "y")], "NULL a"),
        ([("x", "x"), ("y", None)], "NULL b"),
    ):
        df = spark.createDataFrame(rows, "a string, b string")
        with pytest.raises(Exception, match=msg):
            cohen_kappa(df, "a", "b").collect()
    empty = spark.createDataFrame([], "a string, b string")
    assert cohen_kappa(empty, "a", "b").count() == 0


def test_twin_equality(spark):
    rows = []
    for g in range(3):
        rows += [(g, a, b) for a, b in _pairs(g)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            cohen_kappa_sql("SELECT g, a, b FROM t", ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: _tup(r)
        for r in cohen_kappa(_df(spark), "a", "b", ["g"]).collect()
    }
    assert got == want
    [wg] = con.execute(
        cohen_kappa_sql("SELECT a, b FROM t WHERE g = 1")
    ).fetchall()
    [gg] = cohen_kappa(_df(spark, False), "a", "b").collect()
    assert _tup(gg) == tuple(wg)
    # disjoint-label global case exercises the LEFT JOIN ON TRUE path
    con.execute("CREATE TABLE d(a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?)", [("x", "p")] * 3 + [("y", "q")] * 2
    )
    [wd] = con.execute(cohen_kappa_sql("SELECT a, b FROM d")).fetchall()
    assert tuple(wd) == (5, 0.0, 0.0, 0.0)


def test_no_python_in_plan(spark):
    out = cohen_kappa(_df(spark), "a", "b", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
