"""gini_concentration / weight_diagnostics / chao1_richness — the
corpus-statistics trio: exact Python mirrors (gini against the O(n^2)
pairwise-|diff| DEFINITION, proving the histogram fold), canonical
hand cases (equal -> gini 0 / ess n; one-hot -> gini 1-1/n / ess 1;
all-singletons chao1 = d + f1(f1-1)/2), bucket invariance, fail-louds,
empty contracts, direct DuckDB twin equality, plan pins."""

import contextlib
import io
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import (
    chao1_richness_sql,
    gini_concentration_sql,
    weight_diagnostics_sql,
)
from audiopro_essentia_spark.operators.aggregates import (
    chao1_richness,
    gini_concentration,
    weight_diagnostics,
)

MICRO = 10**6


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _gini_mirror(vals):
    ms = [_q(v) for v in vals]
    n, tm = len(ms), sum(ms)
    if n == 0:
        return None
    num = sum(abs(a - b) for a in ms for b in ms)
    return (
        n,
        round(tm / 1e6, 6),
        round(num / (2 * n * tm), 6) if tm > 0 else None,
    )


def _ess_mirror(vals):
    ms = [_q(v) for v in vals]
    n, sw = len(ms), sum(ms)
    if n == 0:
        return None
    sww = sum(m * m for m in ms)
    if sw == 0:
        return (n, 0.0, None, None, None)
    return (
        n,
        round(sw / 1e6, 6),
        round(sw * sw / sww, 6),
        round(sw * sw / (sww * n), 6),
        round(max(ms) / sw, 6),
    )


def _chao_mirror(terms):
    from collections import Counter

    c = Counter(terms)
    if not c:
        return None
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    return (
        len(terms),
        len(c),
        f1,
        f2,
        round(len(c) + f1 * (f1 - 1) / (2 * (f2 + 1)), 6),
    )


def _vals(g):
    # skewed non-negative values with ties and exact-half micro edges
    return [
        float(((i * 7 + g) % 13) ** 2) / 7 for i in range(150)
    ] + [0.0, 0.0, 0.0000005]


def _terms(g):
    return [f"w{(i * i + g * 3) % 60}" for i in range(200)]


def test_gini_mirror_and_buckets(spark):
    rows = [(g, v) for g in range(3) for v in _vals(g)]
    df = spark.createDataFrame(rows, "g long, v double")
    for nb in (1, 7, 1024):
        got = {
            r["g"]: (r["n"], r["total"], r["gini"])
            for r in gini_concentration(
                df, "v", ["g"], n_buckets=nb
            ).collect()
        }
        assert got == {g: _gini_mirror(_vals(g)) for g in range(3)}
    [r] = gini_concentration(df.where("g=1").drop("g"), "v").collect()
    assert (r["n"], r["total"], r["gini"]) == _gini_mirror(_vals(1))


def test_gini_hand_cases(spark):
    def one(vals):
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        [r] = gini_concentration(df, "v").collect()
        return (r["n"], r["total"], r["gini"])

    assert one([5, 5, 5, 5]) == (4, 20.0, 0.0)  # perfectly even
    assert one([0, 0, 0, 1]) == (4, 1.0, 0.75)  # one-hot: 1 - 1/n
    assert one([0.0, 0.0]) == (2, 0.0, None)  # zero mass -> NULL
    assert one([3]) == (1, 3.0, 0.0)  # single row


def test_ess_mirror_and_hand(spark):
    rows = [(g, v) for g in range(3) for v in _vals(g)]
    df = spark.createDataFrame(rows, "g long, w double")
    got = {
        r["g"]: (r["n"], r["w_sum"], r["ess"], r["ess_frac"], r["max_frac"])
        for r in weight_diagnostics(df, "w", ["g"]).collect()
    }
    assert got == {g: _ess_mirror(_vals(g)) for g in range(3)}

    def one(vals):
        d = spark.createDataFrame([(float(v),) for v in vals], "w double")
        [r] = weight_diagnostics(d, "w").collect()
        return (r["n"], r["w_sum"], r["ess"], r["ess_frac"], r["max_frac"])

    assert one([2, 2, 2, 2]) == (4, 8.0, 4.0, 1.0, 0.25)  # equal -> ess n
    assert one([0, 0, 5]) == (3, 5.0, 1.0, round(1 / 3, 6), 1.0)  # one-hot
    assert one([0.0, 0.0]) == (2, 0.0, None, None, None)  # zero mass


def test_chao1_mirror_and_hand(spark):
    rows = [(g, t) for g in range(3) for t in _terms(g)]
    df = spark.createDataFrame(rows, "g long, t string")
    got = {
        r["g"]: (r["n_tokens"], r["n_distinct"], r["f1"], r["f2"], r["chao1"])
        for r in chao1_richness(df, "t", ["g"]).collect()
    }
    assert got == {g: _chao_mirror(_terms(g)) for g in range(3)}

    def one(terms):
        d = spark.createDataFrame([(t,) for t in terms], "t string")
        [r] = chao1_richness(d, "t").collect()
        return (r["n_tokens"], r["n_distinct"], r["f1"], r["f2"], r["chao1"])

    # all singletons: chao1 = d + d(d-1)/2
    assert one(["a", "b", "c", "d", "e"]) == (5, 5, 5, 0, 15.0)
    # saturated vocab (no singletons/doubletons): chao1 == d
    assert one(["a"] * 3 + ["b"] * 4) == (7, 2, 0, 0, 2.0)
    # textbook mixed: d=4, f1=2, f2=1 -> 4 + 2*1/(2*2) = 4.5
    assert one(["a", "b", "c", "c", "d", "d", "d"]) == (7, 4, 2, 1, 4.5)


def test_fail_louds_and_empty(spark):
    for op, schema, rows, msg in (
        (
            lambda d: gini_concentration(d, "v"),
            "v double",
            [(1.0,), (None,)],
            "NULL/NaN/negative v",
        ),
        (
            lambda d: gini_concentration(d, "v"),
            "v double",
            [(1.0,), (-0.5,)],
            "NULL/NaN/negative v",
        ),
        (
            lambda d: weight_diagnostics(d, "w"),
            "w double",
            [(1.0,), (float("nan"),)],
            "NULL/NaN/negative w",
        ),
        (
            lambda d: chao1_richness(d, "t"),
            "t string",
            [("a",), (None,)],
            "NULL t",
        ),
    ):
        df = spark.createDataFrame(rows, schema)
        with pytest.raises(Exception, match=msg):
            op(df).collect()
    for op, schema in (
        (lambda d: gini_concentration(d, "v"), "v double"),
        (lambda d: weight_diagnostics(d, "w"), "w double"),
        (lambda d: chao1_richness(d, "t"), "t string"),
    ):
        assert op(spark.createDataFrame([], schema)).count() == 0


def test_twin_equality(spark):
    con = duckdb.connect()
    rows_v = [(g, v) for g in range(3) for v in _vals(g)]
    con.execute("CREATE TABLE tv(g BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO tv VALUES (?, ?)", rows_v)
    rows_t = [(g, t) for g in range(3) for t in _terms(g)]
    con.execute("CREATE TABLE tt(g BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows_t)
    dfv = spark.createDataFrame(rows_v, "g long, v double")
    dft = spark.createDataFrame(rows_t, "g long, t string")

    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            gini_concentration_sql("SELECT g, v FROM tv", ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_concentration(dfv, "v", ["g"]).collect()
    }
    assert got == want

    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            weight_diagnostics_sql(
                "SELECT g, v AS w FROM tv", ("g",)
            )
        ).fetchall()
    }
    got = {
        r["g"]: (r["n"], r["w_sum"], r["ess"], r["ess_frac"], r["max_frac"])
        for r in weight_diagnostics(
            dfv.withColumnRenamed("v", "w"), "w", ["g"]
        ).collect()
    }
    assert got == want

    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            chao1_richness_sql("SELECT g, t FROM tt", ("g",))
        ).fetchall()
    }
    got = {
        r["g"]: (r["n_tokens"], r["n_distinct"], r["f1"], r["f2"], r["chao1"])
        for r in chao1_richness(dft, "t", ["g"]).collect()
    }
    assert got == want
    # global modes (CROSS JOIN / WHERE guards)
    [wg] = con.execute(
        gini_concentration_sql("SELECT v FROM tv WHERE g = 0")
    ).fetchall()
    [gg] = gini_concentration(dfv.where("g=0").drop("g"), "v").collect()
    assert (gg["n"], gg["total"], gg["gini"]) == tuple(wg)


def test_plan_pins(spark):
    rows_v = [(g, v) for g in range(3) for v in _vals(g)]
    dfv = spark.createDataFrame(rows_v, "g long, v double")
    dft = spark.createDataFrame(
        [(g, t) for g in range(3) for t in _terms(g)], "g long, t string"
    )
    for out, windowless in (
        (gini_concentration(dfv, "v", ["g"]), False),
        (weight_diagnostics(dfv, "v", ["g"]), True),
        (chao1_richness(dft, "t", ["g"]), True),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue().split("Initial Plan")[0]
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        if windowless:
            assert "Window" not in plan
