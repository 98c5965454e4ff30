"""cusum_changepoints (operators/temporal.py): Page's two-sided CUSUM
— the prefix-sum CLOSED FORM pinned against the textbook RECURSION
S_t = max(0, S_{t-1} + d_t) (the outside definition), planted-shift
detection both directions, slack suppresses in-control noise,
duplicate-ts and NULL fail-louds, guards, empty contracts, twin
equality, single-Sort plan pin."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import cusum_sql
from audiopro_essentia_spark.operators.temporal import cusum_changepoints


def _mirror(rows, k, h, grouped):
    """Textbook sequential recursion — NOT the closed form."""
    k_u, h_u = round(k * 1e6), round(h * 1e6)
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = sorted(
            [r for r in rows if gv is None or r[0] == gv],
            key=lambda r: r[1],
        )
        sp = sn = 0
        for _, t, x, mu in grows:
            xu, muu = round(x * 1e6), round(mu * 1e6)
            sp = max(0, sp + xu - muu - k_u)
            sn = max(0, sn + muu - k_u - xu)
            out[(gv, t)] = (
                round(xu / 1e6, 6),
                round(sp / 1e6, 6),
                round(sn / 1e6, 6),
                int(sp > h_u),
                int(sn > h_u),
            )
    return out


def _rows():
    rows = []
    # group a: in-control around 10, upward shift to 13 from t=30
    for t in range(50):
        base = 10.0 if t < 30 else 13.0
        rows.append(("a", t, base + 0.25 * ((t * 7) % 5 - 2), 10.0))
    # group b: downward shift
    for t in range(40):
        base = 5.0 if t < 20 else 2.5
        rows.append(("b", t, base + 0.5 * ((t * 3) % 3 - 1), 5.0))
    # group c: pure in-control noise within the slack
    for t in range(30):
        rows.append(("c", t, 7.0 + 0.25 * ((t * 11) % 4 - 1), 7.0))
    return rows


SCHEMA = "grp string, t long, x double, mu double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None, r["t_us"]): (
            r["x"], r["s_pos"], r["s_neg"], r["alarm_pos"], r["alarm_neg"]
        )
        for r in df.collect()
    }


def test_closed_form_equals_recursion(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for k, h in ((0.5, 5.0), (0.0, 2.0), (1.0, 10.0)):
        got = _collect(cusum_changepoints(df, "x", "t", "mu", ["grp"], k, h), True)
        assert got == _mirror(rows, k, h, True), (k, h)
    one = [r for r in rows if r[0] == "a"]
    got_g = _collect(
        cusum_changepoints(
            spark.createDataFrame(one, SCHEMA), "x", "t", "mu", None, 0.5, 5.0
        ),
        False,
    )
    assert got_g == _mirror(one, 0.5, 5.0, False)


def test_shift_detection_and_slack(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(cusum_changepoints(df, "x", "t", "mu", ["grp"], 0.5, 5.0), True)
    # upward shift in a: no alarm before the shift, alarm after it
    assert all(got[("a", t)][3] == 0 for t in range(30))
    assert got[("a", 49)][3] == 1
    assert any(got[("a", t)][3] for t in range(30, 50))
    # the first alarm comes AFTER the change point, not before
    first = min(t for t in range(50) if got[("a", t)][3])
    assert first >= 30
    # downward shift in b fires the NEGATIVE side only
    assert any(got[("b", t)][4] for t in range(20, 40))
    assert all(got[("b", t)][3] == 0 for t in range(40))
    # in-control noise within slack never alarms, S stays pinned low
    assert all(
        got[("c", t)][3] == 0 and got[("c", t)][4] == 0 for t in range(30)
    )


def test_fail_louds_and_guards(spark):
    df = spark.createDataFrame([("a", 1, 1.0, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="k >= 0 and h > 0"):
        cusum_changepoints(df, "x", "t", "mu", h=0.0)
    with pytest.raises(ValueError, match="multiples of 1e-6"):
        cusum_changepoints(df, "x", "t", "mu", k=1e-8)
    with pytest.raises(ValueError, match="unknown ts_col"):
        cusum_changepoints(df, "x", "nope", "mu")
    with pytest.raises(ValueError, match="timestamp/date/integer"):
        cusum_changepoints(df, "x", "grp", "mu")
    dup = spark.createDataFrame(
        [("a", 1, 1.0, 1.0), ("a", 1, 2.0, 1.0)], SCHEMA
    )
    with pytest.raises(Exception, match="duplicate ts"):
        cusum_changepoints(dup, "x", "t", "mu", ["grp"]).collect()
    for col, pat in (("x", "NULL/NaN x"), ("mu", "NULL/NaN mu")):
        bad = spark.createDataFrame(
            [("a", 1, None if col == "x" else 1.0,
              None if col == "mu" else 1.0)], SCHEMA
        )
        with pytest.raises(Exception, match=pat):
            cusum_changepoints(bad, "x", "t", "mu", ["grp"]).collect()
    tsbad = spark.createDataFrame(
        [("a", None, 1.0, 1.0)], SCHEMA
    )
    with pytest.raises(Exception, match="NULL t"):
        cusum_changepoints(tsbad, "x", "t", "mu", ["grp"]).collect()


def test_timestamp_ts_col(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 3.0, 1.0),
         ("a", "2024-01-02 00:00:00", 3.0, 1.0)],
        "grp string, ts string, x double, mu double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = cusum_changepoints(df, "x", "ts", "mu", ["grp"], 0.5, 1.0).collect()
    assert [r["t_us"] for r in sorted(rows, key=lambda r: r["t_us"])] == [
        1704067200000000, 1704153600000000
    ]
    assert all(r["alarm_pos"] for r in rows)  # d = 1.5 each step


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert cusum_changepoints(df, "x", "t", "mu", ["grp"]).collect() == []
    assert cusum_changepoints(df, "x", "t", "mu").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tc(grp VARCHAR, t BIGINT, x DOUBLE, mu DOUBLE)"
    )
    con.executemany("INSERT INTO tc VALUES (?, ?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    src = "SELECT grp, t, x, mu FROM tc"
    for g, k, h in ((("grp",), 0.5, 5.0), (("grp",), 0.0, 2.0)):
        res = con.execute(cusum_sql(src, g, k, h))
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d["grp"], d["t_us"])] = (
                d["x"], d["s_pos"], d["s_neg"], d["alarm_pos"],
                d["alarm_neg"],
            )
        got = _collect(
            cusum_changepoints(df, "x", "t", "mu", list(g), k, h), True
        )
        assert got == want, (k, h)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = cusum_changepoints(df, "x", "t", "mu", ["grp"], 0.5, 5.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # all three windows order by the SAME named column: one Sort only
    assert plan.count("Sort ") <= 1, plan
