"""backtest_folds (functions/sampling.py): rolling-origin backtest
assignment with embargo — the NO-LEAKAGE invariant asserted from the
output itself, exact boundary semantics at every edge, expanding vs
sliding windows, Python mirror, guards, empty contracts, twin
equality, zero-Exchange plan pin."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import backtest_folds_sql
from audiopro_essentia_spark.functions.sampling import backtest_folds

O = [1000, 2000, 3000]
H = 500
E = 100


def _mirror(rows, origins, horizon, embargo, mode, window):
    out = set()
    for rid, t in rows:
        for f, o in enumerate(origins):
            if mode == "expanding":
                train = t <= o
            else:
                train = o - window < t <= o
            test = o + embargo < t <= o + embargo + horizon
            if train:
                out.add((f, "train", t, rid))
            elif test:
                out.add((f, "test", t, rid))
    return out


def _rows():
    # a grid hitting every boundary of every fold, plus embargo interiors
    ts = set()
    for o in O:
        ts.update([o - 1, o, o + 1, o + E, o + E + 1,
                   o + E + H, o + E + H + 1, o + 50])
    ts.update([1, 500, 1500, 2500, 3900])
    return [(f"r{t}", t) for t in sorted(ts)]


SCHEMA = "rid string, t long"


def _collect(df):
    return {
        (r["fold"], r["role"], r["t_us"], r["rid"]) for r in df.collect()
    }


def test_mirror_and_no_leakage(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(backtest_folds(df, "t", O, H, E))
    assert got == _mirror(rows, O, H, E, "expanding", None)
    # THE invariant: every test row strictly after its origin + embargo,
    # every train row at-or-before its origin; train/test disjoint per fold
    for f, role, t, _ in got:
        if role == "train":
            assert t <= O[f]
        else:
            assert O[f] + E < t <= O[f] + E + H
    keys = [(f, t, r) for f, role, t, r in got]
    assert len(keys) == len(set(keys))  # one role per (fold, row)


def test_boundaries_and_embargo(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(backtest_folds(df, "t", O, H, E))
    o = O[0]
    assert (0, "train", o, f"r{o}") in got            # t == o -> train
    # embargo interior (o, o+E]: in NO role for fold 0
    assert not any(f == 0 and t in (o + 50, o + E) for f, _, t, _ in got)
    assert (0, "test", o + E + 1, f"r{o + E + 1}") in got
    assert (0, "test", o + E + H, f"r{o + E + H}") in got
    assert not any(
        f == 0 and r == "test" and t == o + E + H + 1 for f, r, t, _ in got
    )
    # an embargo row for fold 0 is still TRAIN for later folds
    assert (1, "train", o + 50, f"r{o + 50}") in got


def test_sliding_mode(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    w = 600
    got = _collect(backtest_folds(df, "t", O, H, E, "sliding", w))
    assert got == _mirror(rows, O, H, E, "sliding", w)
    # sliding train window excludes old rows the expanding mode keeps
    assert not any(
        f == 2 and r == "train" and t <= O[2] - w for f, r, t, _ in got
    )
    assert (2, "train", O[2], f"r{O[2]}") in got


def test_guards_and_fail_louds(spark):
    df = spark.createDataFrame([("a", 1)], SCHEMA)
    with pytest.raises(ValueError, match="empty origins"):
        backtest_folds(df, "t", [], H)
    with pytest.raises(ValueError, match="sorted unique"):
        backtest_folds(df, "t", [2000, 1000], H)
    with pytest.raises(ValueError, match="horizon_us > 0"):
        backtest_folds(df, "t", O, 0)
    with pytest.raises(ValueError, match="unknown mode"):
        backtest_folds(df, "t", O, H, mode="nope")
    with pytest.raises(ValueError, match="needs window_us"):
        backtest_folds(df, "t", O, H, mode="sliding")
    with pytest.raises(ValueError, match="only applies to sliding"):
        backtest_folds(df, "t", O, H, window_us=10)
    with pytest.raises(ValueError, match="unknown ts_col"):
        backtest_folds(df, "nope", O, H)
    with pytest.raises(ValueError, match="timestamp/date/integer"):
        backtest_folds(df, "rid", O, H)
    bad = spark.createDataFrame([("a", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL t"):
        backtest_folds(bad, "t", O, H).collect()
    # reserved output names collide upfront, not on downstream select
    # (ADVICE r4)
    clash = spark.createDataFrame(
        [("a", 1, 0)], "rid string, t long, fold long"
    )
    with pytest.raises(ValueError, match="reserved output names"):
        backtest_folds(clash, "t", O, H)
    clash2 = spark.createDataFrame(
        [("a", 1, "x")], "rid string, t long, role string"
    )
    with pytest.raises(ValueError, match="reserved output names"):
        backtest_folds(clash2, "t", O, H)


def test_empty_contract(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert backtest_folds(df, "t", O, H, E).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tf(rid VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO tf VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, SCHEMA)
    for mode, w in (("expanding", None), ("sliding", 600)):
        sql = backtest_folds_sql(
            "SELECT t, rid FROM tf", O, H, E, mode, w, ("rid",)
        )
        want = {
            (r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
        }
        got = _collect(backtest_folds(df, "t", O, H, E, mode, w))
        assert got == want, mode


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = backtest_folds(df, "t", O, H, E)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "Exchange" not in plan      # ZERO shuffles
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
