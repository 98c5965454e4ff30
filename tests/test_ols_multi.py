"""ols_multi (operators/aggregates.py): multivariate OLS/ridge via
exact normal equations + shared-string Cramer solve — exact-plane
recovery at d=1..3, d=1 consistency with ols_fit, numpy closed-form
cross-checks (OLS and ridge), exactly-singular collinear NULL
contract, constant-y SST=0 contract, guards, empty contracts, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import numpy as np
import pytest

from audiopro_essentia_spark.duck_twins import ols_multi_sql
from audiopro_essentia_spark.operators.aggregates import (
    _ols_multi_exprs,
    ols_fit,
    ols_multi,
)


def _data(n=60, d=3):
    rows = []
    for i in range(n):
        xs = [
            float((i * 7 + j * 3) % 11) + 0.25 * ((i + j) % 4)
            for j in range(d)
        ]
        y = 1.5 + sum((j + 1) * 0.5 * x for j, x in enumerate(xs))
        y += 0.125 * ((i * 5) % 8)  # deterministic "noise"
        rows.append(("g", *xs, y))
    return rows


def _np_fit(rows, d, ridge=0.0):
    X = np.array([[1.0] + [round(r[1 + j] * 1e6) / 1e6 for j in range(d)]
                  for r in rows])
    y = np.array([round(r[1 + d] * 1e6) / 1e6 for r in rows])
    pen = np.eye(d + 1) * ridge
    pen[0, 0] = 0.0
    beta = np.linalg.solve(X.T @ X + pen, X.T @ y)
    resid = y - X @ beta
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    return beta, r2


def _schema(d):
    return "grp string, " + ", ".join(
        f"x{j + 1} double" for j in range(d)
    ) + ", y double"


def test_exact_plane_recovery(spark):
    for d in (1, 2, 3):
        rows = []
        coef = [2.0] + [float(j + 1) * (1 if j % 2 == 0 else -1) for j in range(d)]
        for i in range(40):
            xs = [float((i * (j + 3)) % 7) for j in range(d)]
            y = coef[0] + sum(c * x for c, x in zip(coef[1:], xs))
            rows.append(("g", *xs, y))
        df = spark.createDataFrame(rows, _schema(d))
        r = ols_multi(df, "y", [f"x{j + 1}" for j in range(d)], ["grp"]).collect()[0]
        assert r["intercept"] == 2.0, d
        for j in range(d):
            assert r[f"beta{j + 1}"] == coef[j + 1], (d, j)
        assert r["r2"] == 1.0


def test_numpy_cross_check_and_ols_fit_consistency(spark):
    for d, ridge in ((1, 0.0), (2, 0.0), (3, 0.0), (2, 1.5)):
        rows = _data(d=d)
        df = spark.createDataFrame(rows, _schema(d))
        got = ols_multi(
            df, "y", [f"x{j + 1}" for j in range(d)], ["grp"], ridge
        ).collect()[0]
        beta, r2 = _np_fit(rows, d, ridge)
        assert abs(got["intercept"] - beta[0]) < 1e-4, (d, ridge)
        for j in range(d):
            assert abs(got[f"beta{j + 1}"] - beta[j + 1]) < 1e-4
        if ridge == 0.0:
            assert abs(got["r2"] - r2) < 1e-4
    # d=1 agrees with ols_fit's independent closed form
    rows = _data(d=1)
    df = spark.createDataFrame(rows, _schema(1))
    m = ols_multi(df, "y", ["x1"], ["grp"]).collect()[0]
    f = ols_fit(df, "x1", "y", ["grp"]).collect()[0]
    assert abs(m["beta1"] - f["slope"]) < 2e-6
    assert abs(m["intercept"] - f["intercept"]) < 2e-6


def test_singular_and_constant_contracts(spark):
    # x2 = 2*x1 with tiny integers: X'X is EXACTLY singular and every
    # double in the Cramer tree is exact, so det == 0.0 -> NULL fit
    rows = [("g", float(i % 4), 2.0 * (i % 4), float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, _schema(2))
    r = ols_multi(df, "y", ["x1", "x2"], ["grp"]).collect()[0]
    assert r["n"] == 12
    assert r["intercept"] is None and r["beta1"] is None
    assert r["r2"] is None
    # ridge rescues the collinear design
    rr = ols_multi(df, "y", ["x1", "x2"], ["grp"], ridge=0.5).collect()[0]
    assert rr["beta1"] is not None
    # n < p underdetermined -> NULL even if float det were noise
    few = spark.createDataFrame(rows[:2], _schema(2))
    rf = ols_multi(few, "y", ["x1", "x2"], ["grp"]).collect()[0]
    assert rf["intercept"] is None
    # constant y: coefficients exist, SST = 0 -> NULL r2
    cy = spark.createDataFrame(
        [("g", float(i), 5.0) for i in range(10)], _schema(1)
    )
    rc = ols_multi(cy, "y", ["x1"], ["grp"]).collect()[0]
    assert rc["intercept"] == 5.0 and rc["beta1"] == 0.0
    assert rc["r2"] is None


def test_guards_and_empty(spark):
    df = spark.createDataFrame([("g", 1.0, 1.0)], _schema(1))
    with pytest.raises(ValueError, match=r"d must be in \[1, 3\]"):
        ols_multi(df, "y", [], ["grp"])
    with pytest.raises(ValueError, match=r"d must be in \[1, 3\]"):
        _ols_multi_exprs(4, 0.0)
    with pytest.raises(ValueError, match="bad ridge"):
        _ols_multi_exprs(2, -1.0)
    bad = spark.createDataFrame([("g", None, 1.0)], _schema(1))
    with pytest.raises(Exception, match="NULL/NaN x1"):
        ols_multi(bad, "y", ["x1"], ["grp"]).collect()
    empty = spark.createDataFrame([], _schema(2))
    assert ols_multi(empty, "y", ["x1", "x2"], ["grp"]).collect() == []
    assert ols_multi(empty, "y", ["x1", "x2"]).collect() == []


def test_twin_equality(spark):
    rows = _data(n=50, d=3)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tw(grp VARCHAR, x1 DOUBLE, x2 DOUBLE, "
        "x3 DOUBLE, y DOUBLE)"
    )
    con.executemany("INSERT INTO tw VALUES (?,?,?,?,?)", rows)
    df = spark.createDataFrame(rows, _schema(3))
    for d, ridge, grouped in (
        (1, 0.0, True), (2, 0.5, True), (3, 0.0, True), (2, 0.0, False)
    ):
        xs = ", ".join(f"x{j + 1}" for j in range(d))
        cols = f"grp, {xs}, y" if grouped else f"{xs}, y"
        g = ("grp",) if grouped else ()
        want = con.execute(
            ols_multi_sql(f"SELECT {cols} FROM tw", d, g, ridge)
        ).fetchall()
        got = [
            tuple(r)
            for r in ols_multi(
                df, "y", [f"x{j + 1}" for j in range(d)],
                list(g) or None, ridge
            ).collect()
        ]
        assert sorted(got) == sorted(want), (d, ridge, grouped)


def test_plan_pins(spark):
    rows = _data(n=30, d=2)
    df = spark.createDataFrame(rows, _schema(2))
    out = ols_multi(df, "y", ["x1", "x2"], ["grp"], ridge=0.5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "Join" not in plan
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
