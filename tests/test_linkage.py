"""fs_link_scores (operators/linkage.py): Fellegi-Sunter scoring —
hand-computed weight mirror from the DEFINITION, the three-valued
missing-is-no-evidence contract, exact threshold boundaries, m<=u
guard, twin equality, zero-Exchange plan pin."""

from __future__ import annotations

import contextlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import fs_link_scores_sql
from audiopro_essentia_spark.operators.linkage import fs_link_scores

FIELDS = [
    {"name": "lang", "col_a": "lang_a", "col_b": "lang_b",
     "m": 0.95, "u": 0.2},
    {"name": "src", "col_a": "src_a", "col_b": "src_b",
     "m": 0.9, "u": 0.05},
    {"name": "band", "col_a": "band_a", "col_b": "band_b",
     "m": 0.8, "u": 0.1},
]
SCHEMA = (
    "id_a string, id_b string, lang_a string, lang_b string, "
    "src_a string, src_b string, band_a long, band_b long"
)


def _w(m, u):
    return round(math.log(m / u) * 1e6), round(
        math.log((1 - m) / (1 - u)) * 1e6
    )


def _mirror(rows, lower, upper):
    lo_u, hi_u = round(lower * 1e6), round(upper * 1e6)
    out = {}
    for r in rows:
        ida, idb = r[0], r[1]
        vals = {"lang": (r[2], r[3]), "src": (r[4], r[5]),
                "band": (r[6], r[7])}
        ag, su = {}, 0
        for f in FIELDS:
            a, b = vals[f["name"]]
            wa, wd = _w(f["m"], f["u"])
            if a is None or b is None:
                ag[f["name"]] = 0
            elif a == b:
                ag[f["name"]] = 1
                su += wa
            else:
                ag[f["name"]] = -1
                su += wd
        dec = (
            "link" if su >= hi_u
            else ("non_link" if su <= lo_u else "possible")
        )
        out[(ida, idb)] = (
            ag["lang"], ag["src"], ag["band"], round(su / 1e6, 6), dec
        )
    return out


def _rows():
    return [
        ("a1", "b1", "en", "en", "s0", "s0", 3, 3),      # full agree
        ("a2", "b2", "en", "de", "s0", "s1", 3, 7),      # full disagree
        ("a3", "b3", "en", "en", "s0", "s1", 3, 3),      # mixed
        ("a4", "b4", None, "en", "s0", "s0", 3, None),   # missing fields
        ("a5", "b5", "en", "en", None, None, 2, 2),
    ]


def _collect(df):
    return {
        (r["id_a"], r["id_b"]): (
            r["agree_lang"], r["agree_src"], r["agree_band"],
            r["score"], r["decision"],
        )
        for r in df.collect()
    }


def test_mirror_and_hand_weights(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(fs_link_scores(df, FIELDS, lower=0.0, upper=4.0))
    assert got == _mirror(rows, 0.0, 4.0)
    # the full-agree pair's score IS the sum of the ln(m/u) literals
    wsum = sum(_w(f["m"], f["u"])[0] for f in FIELDS)
    assert got[("a1", "b1")][3] == round(wsum / 1e6, 6)
    assert got[("a1", "b1")][4] == "link"        # 1.558+2.890+2.079 nats
    assert got[("a2", "b2")][4] == "non_link"    # all-disagree
    # missing fields contribute ZERO (neither reward nor penalty)
    assert got[("a4", "b4")][:3] == (0, 1, 0)
    assert got[("a4", "b4")][3] == round(_w(0.9, 0.05)[0] / 1e6, 6)


def test_threshold_boundaries_exact(spark):
    # a single field whose agreement weight is exactly ln(m/u):
    # upper == that weight -> >= semantics makes the pair a LINK
    f = [{"name": "lang", "col_a": "lang_a", "col_b": "lang_b",
          "m": 0.95, "u": 0.2}]
    wa = _w(0.95, 0.2)[0]
    rows = [("a", "b", "en", "en", None, None, None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = fs_link_scores(df, f, upper=round(wa / 1e6, 6)).collect()
    assert r["decision"] == "link"
    (r2,) = fs_link_scores(
        df, f, upper=round((wa + 1) / 1e6, 6)
    ).collect()
    assert r2["decision"] == "possible"


def test_guards(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    with pytest.raises(ValueError, match="empty field list"):
        fs_link_scores(df, [])
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_link_scores(df, [{"name": "x", "col_a": "lang_a",
                             "col_b": "lang_b", "m": 0.2, "u": 0.95}])
    with pytest.raises(ValueError, match="unknown column"):
        fs_link_scores(df, [{"name": "x", "col_a": "nope",
                             "col_b": "lang_b", "m": 0.9, "u": 0.1}])
    with pytest.raises(ValueError, match="duplicate field"):
        fs_link_scores(df, [FIELDS[0], FIELDS[0]])
    with pytest.raises(ValueError, match="lower < upper"):
        fs_link_scores(df, FIELDS, lower=4.0, upper=0.0)


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert fs_link_scores(df, FIELDS).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tp(id_a VARCHAR, id_b VARCHAR, lang_a VARCHAR, "
        "lang_b VARCHAR, src_a VARCHAR, src_b VARCHAR, band_a BIGINT, "
        "band_b BIGINT)"
    )
    con.executemany(
        "INSERT INTO tp VALUES (?, ?, ?, ?, ?, ?, ?, ?)", rows
    )
    df = spark.createDataFrame(rows, SCHEMA)
    for lo, hi in ((0.0, 4.0), (-1.5, 2.0)):
        sql = fs_link_scores_sql("SELECT * FROM tp", FIELDS, lo, hi)
        res = con.execute(sql)
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d["id_a"], d["id_b"])] = (
                d["agree_lang"], d["agree_src"], d["agree_band"],
                d["score"], d["decision"],
            )
        got = _collect(fs_link_scores(df, FIELDS, lower=lo, upper=hi))
        assert got == want, (lo, hi)


def test_plan_pins(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = fs_link_scores(df, FIELDS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "Exchange" not in plan      # ZERO shuffles
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
