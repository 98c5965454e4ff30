"""target_encode / target_encode_loo: exact integer mirror, smoothing
limits, leakage hand cases, fail-louds, empty contracts, DuckDB twin
equality, zero-Python plan pins."""

from __future__ import annotations

import contextlib
import io
import random
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import (
    target_encode_loo_sql,
    target_encode_sql,
)
from audiopro_essentia_spark.operators.encoding import (
    target_encode,
    target_encode_loo,
)

M = 1_000_000


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _mu(m):
    import math

    return int(math.floor(m * M + 0.5))


def _enc_int(sc, nc, nn, ss, mu):
    num = sc * nn * M + mu * ss
    den = nn * (nc * M + mu) * M
    return round(float(num) / float(den), 6) if den > 0 else None


def _table_mirror(rows, m):
    """rows: (cat, y). -> {cat: (n, label_mean, enc)}"""
    mu = _mu(m)
    agg = defaultdict(lambda: [0, 0])
    for c, y in rows:
        agg[c][0] += 1
        agg[c][1] += _q(y)
    nn = sum(a[0] for a in agg.values())
    ss = sum(a[1] for a in agg.values())
    return {
        c: (n, round(sc / (n * 1e6), 6), _enc_int(sc, n, nn, ss, mu))
        for c, (n, sc) in agg.items()
    }


def _loo_mirror(rows, m):
    """rows: (id, cat, y). -> {id: enc_loo}"""
    mu = _mu(m)
    agg = defaultdict(lambda: [0, 0])
    for _, c, y in rows:
        agg[c][0] += 1
        agg[c][1] += _q(y)
    nn = sum(a[0] for a in agg.values())
    ss = sum(a[1] for a in agg.values())
    return {
        i: _enc_int(agg[c][1] - _q(y), agg[c][0] - 1, nn, ss, mu)
        for i, c, y in rows
    }


def _rows(g, n=300):
    rnd = random.Random(11 + g)
    cats = [f"host{j}" for j in range(1 + g, 25)]
    out = []
    for i in range(n + 13 * g):
        c = rnd.choice(cats)
        out.append((i, c, float(rnd.random() < 0.2 + 0.5 * (hash(c) % 3 == 0))))
    out.append((n + 13 * g, "singleton_host", 1.0))
    return out


def test_table_mirror_grouped_and_global(spark):
    rows = [(g, i, c, y) for g in range(2) for i, c, y in _rows(g)]
    df = spark.createDataFrame(rows, "g long, i long, c string, y double")
    for m in (20.0, 0.5, 0.0):
        got = {
            (r["g"], r["c"]): (r["n"], r["label_mean"], r["enc"])
            for r in target_encode(df, "c", "y", ["g"], m=m).collect()
        }
        exp = {}
        for g in range(2):
            for c, t in _table_mirror(
                [(c, y) for _, c, y in _rows(g)], m
            ).items():
                exp[(g, c)] = t
        assert got == exp, m
        # m = 0 is the raw mean wherever defined (same rational via a
        # different IEEE evaluation order -> equal to 1e-6, not bitwise)
        if m == 0.0:
            assert all(
                v[2] == pytest.approx(v[1], abs=2e-6) for v in got.values()
            )
    # global mode
    allr = [(c, y) for g in range(2) for _, c, y in _rows(g)]
    got = {
        r["c"]: (r["n"], r["label_mean"], r["enc"])
        for r in target_encode(df.drop("g", "i"), "c", "y", m=7.0).collect()
    }
    assert got == _table_mirror(allr, 7.0)


def test_loo_mirror_and_leakage_hand_cases(spark):
    rows = [(g, i, c, y) for g in range(2) for i, c, y in _rows(g)]
    df = spark.createDataFrame(rows, "g long, i long, c string, y double")
    for m in (20.0, 0.0):
        got = {
            (r["g"], r["i"]): r["enc_loo"]
            for r in target_encode_loo(
                df, "c", "y", ["g"], ["i"], m=m
            ).collect()
        }
        exp = {}
        for g in range(2):
            for i, v in _loo_mirror(_rows(g), m).items():
                exp[(g, i)] = v
        assert got == exp, m
    # the leakage hand case: two-row category [1, 0] at m=0 — each row's
    # LOO estimate is EXACTLY the other row's label (own label excluded)
    d = spark.createDataFrame(
        [(0, "a", 1.0), (1, "a", 0.0), (2, "b", 1.0)],
        "i long, c string, y double",
    )
    got = {
        r["i"]: r["enc_loo"]
        for r in target_encode_loo(d, "c", "y", None, ["i"], m=0.0).collect()
    }
    assert got[0] == 0.0 and got[1] == 1.0
    # singleton at m=0: no estimate exists -> NULL
    assert got[2] is None
    # singleton at m>0 shrinks all the way to the global prior
    got = {
        r["i"]: r["enc_loo"]
        for r in target_encode_loo(d, "c", "y", None, ["i"], m=5.0).collect()
    }
    prior = 2 / 3
    assert got[2] == pytest.approx(prior, abs=2e-6)
    # huge m: every row ~ prior
    got = target_encode(d, "c", "y", m=1e6).collect()
    for r in got:
        assert r["enc"] == pytest.approx(prior, abs=1e-4)


def test_fail_louds_and_empty(spark):
    for rows, schema, msg in (
        ([(None, 1.0)], "c string, y double", "NULL c"),
        ([("a", None)], "c string, y double", "NULL/NaN y"),
        ([("a", float("nan"))], "c string, y double", "NULL/NaN y"),
    ):
        df = spark.createDataFrame(rows, schema)
        with pytest.raises(Exception, match=msg):
            target_encode(df, "c", "y").collect()
        with pytest.raises(Exception, match=msg):
            target_encode_loo(df, "c", "y").collect()
    with pytest.raises(ValueError, match="m must be >= 0"):
        target_encode(
            spark.createDataFrame([("a", 1.0)], "c string, y double"),
            "c", "y", m=-1.0,
        )
    empty = spark.createDataFrame([], "g long, i long, c string, y double")
    assert target_encode(empty, "c", "y", ["g"]).collect() == []
    assert target_encode(empty.drop("g", "i"), "c", "y").collect() == []
    assert target_encode_loo(empty, "c", "y", ["g"], ["i"]).collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(g, i, c, y) for g in range(2) for i, c, y in _rows(g)]
    con.execute("CREATE TABLE t(g BIGINT, i BIGINT, c VARCHAR, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, i long, c string, y double")
    for m in (20.0, 0.5):
        want = {
            (r[0], r[1]): tuple(r[2:])
            for r in con.execute(
                target_encode_sql("SELECT g, c, y FROM t", ("g",), m=m)
            ).fetchall()
        }
        got = {
            (r["g"], r["c"]): (r["n"], r["label_mean"], r["enc"])
            for r in target_encode(df, "c", "y", ["g"], m=m).collect()
        }
        assert got == want, m
        want = {
            (r[0], r[1]): (r[2], r[3])
            for r in con.execute(
                target_encode_loo_sql(
                    "SELECT i, g, c, y FROM t", ("g",), ("i",), m=m
                )
            ).fetchall()
        }
        got = {
            (r["i"], r["g"]): (r["c"], r["enc_loo"])
            for r in target_encode_loo(
                df, "c", "y", ["g"], ["i"], m=m
            ).collect()
        }
        assert got == want, m
    # global modes
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            target_encode_sql("SELECT c, y FROM t WHERE g = 0", (), m=3.0)
        ).fetchall()
    }
    got = {
        r["c"]: (r["n"], r["label_mean"], r["enc"])
        for r in target_encode(
            df.where("g=0").drop("g", "i"), "c", "y", m=3.0
        ).collect()
    }
    assert got == want
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            target_encode_loo_sql(
                "SELECT i, c, y FROM t WHERE g = 0", (), ("i",), m=3.0
            )
        ).fetchall()
    }
    got = {
        r["i"]: (r["c"], r["enc_loo"])
        for r in target_encode_loo(
            df.where("g=0").drop("g"), "c", "y", None, ["i"], m=3.0
        ).collect()
    }
    assert got == want


def test_plan_pins(spark):
    rows = [(g, i, c, y) for g in range(2) for i, c, y in _rows(g, n=60)]
    df = spark.createDataFrame(rows, "g long, i long, c string, y double")
    for out in (
        target_encode(df, "c", "y", ["g"]),
        target_encode_loo(df, "c", "y", ["g"], ["i"]),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue().split("Initial Plan")[0]
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "Window" not in plan
