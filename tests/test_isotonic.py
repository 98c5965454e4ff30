"""isotonic_calibrate: PAV calibration via the minimax identity —
pinned against an INDEPENDENT Fraction-exact PAV stack mirror (the
textbook pool-adjacent-violators algorithm), hand cases, monotonicity,
fail-louds, empty contract, DuckDB twin equality, zero-Python pin."""

from __future__ import annotations

import contextlib
import io
import math
import random
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import isotonic_calibrate_sql
from audiopro_essentia_spark.operators.evalmetrics import isotonic_calibrate


def _q(v):
    return int(
        Decimal(repr(v * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _pav_mirror(pairs, nb):
    """Textbook PAV over the same micro-quantized bins, exact Fractions
    throughout, truncated to micro-units at the END — the operator's
    minimax-with-truncated-windows must equal floor(1e6 * true fit)."""
    bins = {}
    for s, y in pairs:
        b = min(nb - 1, _q(s) * nb // 1_000_000)
        c, p = bins.get(b, (0, 0))
        bins[b] = (c + 1, p + y)
    stack = []  # blocks: [weight, pos, [bins...]]
    for b in sorted(bins):
        c, p = bins[b]
        cur = [c, p, [b]]
        while stack and Fraction(stack[-1][1], stack[-1][0]) >= Fraction(
            cur[1], cur[0]
        ):
            pw, pp, pb = stack.pop()
            cur = [pw + cur[0], pp + cur[1], pb + cur[2]]
        stack.append(cur)
    out = {}
    for w, p, bs in stack:
        v = math.floor(Fraction(p * 1_000_000, w))
        for b in bs:
            out[b] = (bins[b][0], bins[b][1],
                      round(bins[b][1] / bins[b][0], 6), round(v / 1e6, 6))
    return out


def _pairs(g, n=400):
    """Noisy monotone-ish score/label soup: enough violations that PAV
    actually pools, plus exact-representable scores."""
    rnd = random.Random(7 + g)
    out = []
    for _ in range(n + 37 * g):
        s = rnd.randrange(0, 1_000_001) / 1e6
        p_true = 0.15 + 0.7 * round(s)  # step at 0.5 + noise below
        y = 1 if rnd.random() < p_true * (0.6 + 0.8 * s) else 0
        out.append((s, y))
    return out


def _collect(df, g=True):
    cols = ("bin", "cnt", "n_pos", "pos_frac", "iso_p")
    rows = df.collect()
    if g:
        return {(r["g"], r["bin"]): tuple(r[c] for c in cols[1:]) for r in rows}
    return {r["bin"]: tuple(r[c] for c in cols[1:]) for r in rows}


def test_pav_mirror_grouped_and_global(spark):
    rows = [(g, s, y) for g in range(3) for s, y in _pairs(g)]
    df = spark.createDataFrame(rows, "g long, s double, y long")
    for nb in (10, 100):
        got = _collect(isotonic_calibrate(df, "s", "y", ["g"], n_bins=nb))
        exp = {}
        for g in range(3):
            for b, t in _pav_mirror(_pairs(g), nb).items():
                exp[(g, b)] = t
        assert got == exp, nb
    # global mode
    allp = [(s, y) for g in range(3) for s, y in _pairs(g)]
    got = _collect(isotonic_calibrate(df.drop("g"), "s", "y", n_bins=20),
                   g=False)
    assert got == {b: t for b, t in _pav_mirror(allp, 20).items()}


def test_hand_cases_and_monotonicity(spark):
    def one(pairs, nb=10):
        df = spark.createDataFrame(
            [(float(s), int(y)) for s, y in pairs], "s double, y long"
        )
        out = sorted(
            (r["bin"], r["cnt"], r["n_pos"], r["iso_p"])
            for r in isotonic_calibrate(df, "s", "y", n_bins=nb).collect()
        )
        # monotonicity is the defining invariant
        isos = [r[3] for r in out]
        assert isos == sorted(isos), out
        return out

    # already-monotone rates: iso == raw rate (fit touches the data)
    got = one(
        [(0.05, 0), (0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1), (0.95, 0)]
    )
    assert got == [(0, 3, 1, round(1 / 3 // 1e-6 / 1e6, 6)),
                   (9, 3, 2, 0.666666)]
    # a violation pools to the weighted mean: (3 pos of 4) then (1 of 4)
    got = one(
        [(0.1, 1), (0.1, 1), (0.1, 1), (0.1, 0),
         (0.9, 1), (0.9, 0), (0.9, 0), (0.9, 0)]
    )
    assert got == [(1, 4, 3, 0.5), (9, 4, 1, 0.5)]
    # anti-monotone three bins with different weights: global rate
    got = one(
        [(0.05, 1), (0.05, 1),
         (0.55, 1), (0.55, 0),
         (0.95, 0), (0.95, 0), (0.95, 0)]
    )
    assert [r[3] for r in got] == [round(3_000_000 // 7 / 1e6, 6)] * 3
    # single bin
    assert one([(0.5, 1), (0.5, 0)]) == [(5, 2, 1, 0.5)]


def test_fail_louds_and_empty(spark):
    for rows, msg in (
        ([(None, 0)], "isotonic: NULL/NaN"),
        ([(1.5, 0)], "out-of-"),
        ([(float("nan"), 0)], "isotonic: NULL/NaN"),
        ([(0.5, 2)], "non-binary"),
        ([(0.5, None)], "non-binary"),
    ):
        df = spark.createDataFrame(rows, "s double, y long")
        with pytest.raises(Exception, match=msg):
            isotonic_calibrate(df, "s", "y").collect()
    with pytest.raises(ValueError, match="n_bins"):
        isotonic_calibrate(
            spark.createDataFrame([(0.5, 1)], "s double, y long"),
            "s", "y", n_bins=0,
        )
    empty = spark.createDataFrame([], "g long, s double, y long")
    assert isotonic_calibrate(empty, "s", "y", ["g"]).collect() == []
    assert isotonic_calibrate(empty.drop("g"), "s", "y").collect() == []


def test_twin_equality(spark):
    con = duckdb.connect()
    rows = [(g, s, y) for g in range(3) for s, y in _pairs(g)]
    con.execute("CREATE TABLE t(g BIGINT, s DOUBLE, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g long, s double, y long")
    for nb in (10, 64):
        want = {
            (r[0], r[1]): tuple(r[2:])
            for r in con.execute(
                isotonic_calibrate_sql("SELECT g, s, y FROM t", ("g",), nb)
            ).fetchall()
        }
        got = _collect(isotonic_calibrate(df, "s", "y", ["g"], n_bins=nb))
        assert got == want, nb
    # global
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            isotonic_calibrate_sql("SELECT s, y FROM t WHERE g = 1", (), 20)
        ).fetchall()
    }
    got = _collect(
        isotonic_calibrate(df.where("g=1").drop("g"), "s", "y", n_bins=20),
        g=False,
    )
    assert got == want


def test_plan_pin(spark):
    rows = [(g, s, y) for g in range(2) for s, y in _pairs(g, n=50)]
    df = spark.createDataFrame(rows, "g long, s double, y long")
    out = isotonic_calibrate(df, "s", "y", ["g"], n_bins=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
