"""benford_test (operators/checks.py): first-digit conformity — exact
digit-extraction mirror (string-rendered micro ints), a log-spaced
conforming sample vs a flat nonconforming one, power-of-ten edge
digits, Nigrini band boundaries, fail-louds, empty contracts, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import benford_test_sql
from audiopro_essentia_spark.operators.checks import benford_test

PROBS = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def _mirror(rows, grouped):
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        ms = [round(v * 1e6) for g, v in rows if gv is None or g == gv]
        n = len(ms)
        cnt = {d: 0 for d in range(1, 10)}
        for m in ms:
            cnt[int(str(m)[0])] += 1
        chi = mad = 0.0
        for d in range(1, 10):
            p = PROBS[d]
            chi += (cnt[d] - n * p) * (cnt[d] - n * p) / (n * p)
            mad += abs(cnt[d] / n - p)
        mad_r = round(mad / 9.0, 6)
        mu = round(mad_r * 1e6)
        conf = (
            "close" if mu < 6000
            else "acceptable" if mu < 12000
            else "marginal" if mu < 15000
            else "nonconforming"
        )
        out[gv] = (
            n,
            tuple(round(cnt[d] / n, 6) for d in range(1, 10)),
            round(chi, 6),
            mad_r,
            conf,
        )
    return out


def _rows():
    rows = []
    for i in range(600):  # log-spaced: Benford-conforming
        rows.append(("log", 10 ** ((i * 37 % 600) / 97.0)))
    for i in range(450):  # flat first digits: nonconforming
        rows.append(("flat", float(1 + (i % 9)) * (10 ** (i % 3))))
    return rows


SCHEMA = "grp string, v double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n"],
            tuple(r[f"d{d}"] for d in range(1, 10)),
            r["chi2"],
            r["mad"],
            r["conformity"],
        )
        for r in df.collect()
    }


def test_mirror_and_conformity_split(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(benford_test(df, "v", ["grp"]), True)
    assert got == _mirror(rows, True)
    got_g = _collect(benford_test(df, "v", None), False)
    assert got_g == _mirror(rows, False)
    # the log-spaced sample conforms; the flat one does not
    assert got[("log")][4] in ("close", "acceptable")
    assert got[("flat")][4] == "nonconforming"
    assert got[("flat")][2] > got[("log")][2]  # chi2 orders them too


def test_digit_extraction_edges(spark):
    # exact powers of ten and boundary magnitudes all extract '1'/'9'
    rows = [("g", 1000.0), ("g", 0.001), ("g", 1.0), ("g", 1e-6),
            ("g", 9.999999), ("g", 0.000009)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = benford_test(df, "v", ["grp"]).collect()
    assert r["n"] == 6
    assert r["d1"] == round(4 / 6, 6)
    assert r["d9"] == round(2 / 6, 6)


def test_fail_louds(spark):
    for bad in (None, float("nan"), 0.0, -5.0, 4e-7):
        df = spark.createDataFrame([("g", bad)], SCHEMA)
        with pytest.raises(Exception, match="non-positive v"):
            benford_test(df, "v", ["grp"]).collect()


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert benford_test(df, "v", ["grp"]).collect() == []
    assert benford_test(df, "v").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tb2(grp VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO tb2 VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped in (True, False):
        g = ("grp",) if grouped else ()
        pfx = "grp, " if grouped else ""
        res = con.execute(benford_test_sql(f"SELECT {pfx}v FROM tb2", g))
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (
                d["n"],
                tuple(d[f"d{i}"] for i in range(1, 10)),
                d["chi2"],
                d["mad"],
                d["conformity"],
            )
        got = _collect(benford_test(df, "v", list(g) or None), grouped)
        assert got == want, grouped


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = benford_test(df, "v", ["grp"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
