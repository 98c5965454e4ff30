"""quantile_bin (operators/aggregates.py): exact-quantile
equal-frequency discretization — order-statistic mirror
grouped+global, clean-quartile hand case (1..100 -> 25/25/25/25, the
outside definition), heavy-tie empties-a-bin pin, equal-values-share-
a-bin + monotonicity invariants, edge-exposure contract, guards,
bucket invariance, empty contracts, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import quantile_bin_sql
from audiopro_essentia_spark.operators.aggregates import (
    quantile_bin,
    quantile_bin_qus,
)


def _q1(ms_sorted, qu):
    n = len(ms_sorted)
    r = max(1, (n * qu + 999_999) // 1_000_000)
    return ms_sorted[r - 1]


def _mirror(rows, n_bins, grouped):
    qus = [round(b * 1_000_000 / n_bins) for b in range(1, n_bins)]
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        ms = sorted(round(v * 1e6) for _, _, v in grows)
        bounds = [_q1(ms, qu) for qu in qus]
        for _, rid, v in grows:
            m = round(v * 1e6)
            b = sum(1 for bd in bounds if m > bd)
            lo = bounds[b - 1] if b >= 1 else None
            hi = bounds[b] if b < len(bounds) else None
            out[(gv, rid)] = (
                round(m / 1e6, 6),
                b,
                None if lo is None else round(lo / 1e6, 6),
                None if hi is None else round(hi / 1e6, 6),
            )
    return out


def _rows():
    rows = []
    for i in range(60):
        rows.append(("a", f"a{i}", 10.0 + (i % 9) * 0.25))
    rows.append(("a", "a_hi", 500.0))
    rows.append(("a", "a_lo", -50.0))
    for i in range(25):
        rows.append(("b", f"b{i}", 1.0 + (i % 5) * 0.5))
    return rows


SCHEMA = "grp string, rid string, v double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None, r["id"]): (
            r["v"], r["bin"], r["b_lo"], r["b_hi"]
        )
        for r in df.collect()
    }


def test_mirror_and_invariants(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    for nb in (2, 4, 5):
        got = _collect(quantile_bin(df, "v", "rid", ["grp"], nb), True)
        assert got == _mirror(rows, nb, True), nb
    got_g = _collect(quantile_bin(df, "v", "rid", None, 3), False)
    assert got_g == _mirror(rows, 3, False)
    # monotonicity: v1 <= v2 implies bin1 <= bin2; equal v share a bin
    got = _collect(quantile_bin(df, "v", "rid", ["grp"], 4), True)
    assert len(got) == len(rows)
    by_v = {}
    pairs = []
    for (g, _), (v, b, _, _) in got.items():
        if g != "a":
            continue
        pairs.append((v, b))
        by_v.setdefault(v, set()).add(b)
    assert all(len(bs) == 1 for bs in by_v.values())
    pairs.sort()
    assert all(
        pairs[i][1] <= pairs[i + 1][1] for i in range(len(pairs) - 1)
    )


def test_clean_quartiles_hand_case(spark):
    # 1..100 distinct, n_bins=4: bounds are the rank-25/50/75 values
    # (25, 50, 75) and every bin holds exactly 25 rows — the outside
    # definition of equal-frequency quartiles on a clean design.
    rows = [("g", f"r{i}", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(quantile_bin(df, "v", "rid", ["grp"], 4), True)
    from collections import Counter

    counts = Counter(b for _, b, _, _ in got.values())
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}
    assert got[("g", "r25")] == (25.0, 0, None, 25.0)
    assert got[("g", "r26")] == (26.0, 1, 25.0, 50.0)
    assert got[("g", "r75")] == (75.0, 2, 50.0, 75.0)
    assert got[("g", "r76")] == (76.0, 3, 75.0, None)


def test_heavy_ties_empty_bins(spark):
    # 60x value 1 and 40x value 2 at n_bins=4: bounds collapse to
    # (1, 1, 2) so bins are {0: 60, 2: 40} — a tie run is NEVER split
    # across bins; the intermediate bins honestly empty instead.
    rows = [("g", f"a{i}", 1.0) for i in range(60)] + [
        ("g", f"b{i}", 2.0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(quantile_bin(df, "v", "rid", ["grp"], 4), True)
    from collections import Counter

    counts = Counter(b for _, b, _, _ in got.values())
    assert counts == {0: 60, 2: 40}
    # all-equal degenerate: everything in bin 0
    same = spark.createDataFrame(
        [("g", f"r{i}", 7.0) for i in range(10)], SCHEMA
    )
    got_s = _collect(quantile_bin(same, "v", "rid", ["grp"], 4), True)
    assert {b for _, b, _, _ in got_s.values()} == {0}


def test_guards_and_fail_louds(spark):
    df = spark.createDataFrame([("g", "r", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match=r"n_bins must be in \[2, 64\]"):
        quantile_bin(df, "v", "rid", n_bins=1)
    with pytest.raises(ValueError, match=r"n_bins must be in \[2, 64\]"):
        quantile_bin(df, "v", "rid", n_bins=65)
    with pytest.raises(ValueError, match=r"n_bins must be in \[2, 64\]"):
        quantile_bin_qus(100)
    bad = spark.createDataFrame([("g", "r", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN v"):
        quantile_bin(bad, "v", "rid", ["grp"]).collect()
    idbad = spark.createDataFrame([("g", None, 1.0)], SCHEMA)
    with pytest.raises(Exception, match="NULL rid"):
        quantile_bin(idbad, "v", "rid", ["grp"]).collect()


def test_bucket_invariance_and_empty(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    ref = _collect(quantile_bin(df, "v", "rid", ["grp"], 4, 1024), True)
    for nb in (1, 7):
        assert (
            _collect(quantile_bin(df, "v", "rid", ["grp"], 4, nb), True)
            == ref
        )
    empty = spark.createDataFrame([], SCHEMA)
    assert quantile_bin(empty, "v", "rid", ["grp"]).collect() == []
    assert quantile_bin(empty, "v", "rid").collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(grp VARCHAR, rid VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for grouped, nb in ((True, 4), (True, 5), (False, 3)):
        g = ("grp",) if grouped else ()
        cols = "grp, rid AS id, v" if grouped else "rid AS id, v"
        res = con.execute(
            quantile_bin_sql(f"SELECT {cols} FROM tw", g, nb)
        )
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d.get("grp"), d["id"])] = (
                d["v"], d["bin"], d["b_lo"], d["b_hi"]
            )
        got = _collect(
            quantile_bin(df, "v", "rid", list(g) or None, nb), grouped
        )
        assert got == want, (grouped, nb)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = quantile_bin(df, "v", "rid", ["grp"], 5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
