"""mutual_information: exact micro-nat mirror, canonical hand cases
(identity, independence, constant), fail-louds, empty contract, twin
equality, zero-Python plan pin."""

from __future__ import annotations

import contextlib
import io
import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import mutual_information_sql
from audiopro_essentia_spark.operators.evalmetrics import mutual_information


def _rnd(x):
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _mirror(pairs):
    cells = Counter(pairs)
    mx, my = Counter(), Counter()
    for (x, y), c in cells.items():
        mx[x] += c
        my[y] += c
    n = sum(cells.values())
    if n == 0:
        return None
    mi_u = sum(
        _rnd((c / n) * math.log((c * n) / (mx[x] * my[y])) * 1e6)
        for (x, y), c in cells.items()
    )
    hx_u = sum(_rnd(-((c / n) * math.log(c / n)) * 1e6) for c in mx.values())
    hy_u = sum(_rnd(-((c / n) * math.log(c / n)) * 1e6) for c in my.values())
    nmi = (
        round(mi_u / (math.sqrt(hx_u) * math.sqrt(hy_u)), 6)
        if hx_u > 0 and hy_u > 0
        else None
    )
    return (
        n, len(mx), len(my),
        round(mi_u / 1e6, 6), round(hx_u / 1e6, 6), round(hy_u / 1e6, 6),
        nmi,
    )


def _pairs(g, n=400):
    rnd = random.Random(5 + g)
    out = []
    for _ in range(n + 29 * g):
        x = rnd.choice("abcdef"[: 3 + g])
        # y correlates with x but noisily
        y = (ord(x) + (0 if rnd.random() < 0.6 else rnd.randrange(3))) % 3
        out.append((x, y))
    return out


COLS = ("n", "x_levels", "y_levels", "mi", "hx", "hy", "nmi")


def _collect(df, g=True):
    rows = df.collect()
    if g:
        return {r["g"]: tuple(r[c] for c in COLS) for r in rows}
    [r] = rows
    return tuple(r[c] for c in COLS)


def test_mirror_grouped_and_global(spark):
    rows = [(g, x, y) for g in range(3) for x, y in _pairs(g)]
    df = spark.createDataFrame(rows, "g long, x string, y long")
    got = _collect(mutual_information(df, "x", "y", ["g"]))
    assert got == {g: _mirror(_pairs(g)) for g in range(3)}
    got = _collect(mutual_information(df.drop("g"), "x", "y"), g=False)
    assert got == _mirror([p for g in range(3) for p in _pairs(g)])


def test_hand_cases(spark):
    # X == Y: mi == hx == hy, nmi == 1
    d = spark.createDataFrame(
        [(str(i % 3), str(i % 3)) for i in range(30)], "x string, y string"
    )
    r = _collect(mutual_information(d, "x", "y"), g=False)
    assert r[3] == r[4] == r[5] > 1.0  # ln 3 = 1.0986 nats
    assert r[6] == pytest.approx(1.0, abs=1e-6)
    # exact independence on a product grid with equal counts: every
    # cell term is ln(1) = 0 EXACTLY
    d = spark.createDataFrame(
        [(x, y) for x in "ab" for y in range(3) for _ in range(5)],
        "x string, y long",
    )
    r = _collect(mutual_information(d, "x", "y"), g=False)
    assert r == (30, 2, 3, 0.0, round(_ln2_u() / 1e6, 6),
                 round(_ln3_u() / 1e6, 6), 0.0)
    # constant column: hx = 0, nmi NULL
    d = spark.createDataFrame(
        [("k", i % 2) for i in range(10)], "x string, y long"
    )
    r = _collect(mutual_information(d, "x", "y"), g=False)
    assert r[1] == 1 and r[4] == 0.0 and r[6] is None and r[3] == 0.0


def _ln2_u():
    return _rnd(-0.5 * math.log(0.5) * 1e6) * 2


def _ln3_u():
    return _rnd(-(1 / 3) * math.log(1 / 3) * 1e6) * 3


def test_fail_louds_and_empty(spark):
    for rows, msg in (
        ([(None, 1)], "NULL x"),
        ([("a", None)], "NULL y"),
    ):
        df = spark.createDataFrame(rows, "x string, y long")
        with pytest.raises(Exception, match=msg):
            mutual_information(df, "x", "y").collect()
    empty = spark.createDataFrame([], "g long, x string, y long")
    assert mutual_information(empty, "x", "y", ["g"]).collect() == []
    assert mutual_information(empty.drop("g"), "x", "y").collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(g, x, int(y)) for g in range(3) for x, y in _pairs(g)]
    con.execute("CREATE TABLE t(g BIGINT, x VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, x string, y long")
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            mutual_information_sql("SELECT g, x, y FROM t", ("g",))
        ).fetchall()
    }
    assert _collect(mutual_information(df, "x", "y", ["g"])) == want
    [wg] = con.execute(
        mutual_information_sql("SELECT x, y FROM t WHERE g = 1")
    ).fetchall()
    got = _collect(
        mutual_information(df.where("g=1").drop("g"), "x", "y"), g=False
    )
    assert got == tuple(wg)


def test_plan_pin(spark):
    rows = [(g, x, y) for g in range(2) for x, y in _pairs(g, n=60)]
    df = spark.createDataFrame(rows, "g long, x string, y long")
    out = mutual_information(df, "x", "y", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
