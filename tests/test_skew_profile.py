"""skew_profile (operators/skew.py): key-skew diagnosis — count
mirror on a designed skewed table, hot_ratio-is-the-salt-bound
semantics, NULL-key-as-level pin, multi-column keys, tie
determinism, uniform-table degenerate, guards, empty contract, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import io
from collections import Counter

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import skew_profile_sql
from audiopro_essentia_spark.operators.skew import skew_profile


def _mirror(keys, top_k):
    cnt = Counter(keys)
    n_rows = len(keys)
    n_keys = len(cnt)
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    avg = n_rows / n_keys
    top1 = order[0][1]
    out = []
    cum = 0
    for r, (k, c) in enumerate(order, 1):
        cum += c
        out.append(
            (
                r, k, c,
                round(c / n_rows, 6), round(cum / n_rows, 6),
                n_rows, n_keys,
                round(avg, 6), round(top1 / avg, 6),
            )
        )
    return out


def _rows():
    keys = ["hot"] * 50 + ["warm"] * 20 + ["null-ish"] * 5
    for i in range(25):
        keys.append(f"cold{i:02d}")
    return keys


def test_mirror_and_salt_semantics(spark):
    keys = _rows()
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = sorted(
        tuple(r) for r in skew_profile(df, ["k"], top_k=10).collect()
    )
    assert got == sorted(_mirror(keys, 10))
    # hot_ratio is top-1 count over the fair average — the salt bound
    r1 = [r for r in got if r[0] == 1][0]
    assert r1[1] == "hot" and r1[2] == 50
    assert r1[8] == round(50 / (100 / 28), 6)  # 28 keys -> ratio 14.0
    # cum_share at the last returned rank <= 1; shares descend
    shares = [r[3] for r in sorted(got)]
    assert shares == sorted(shares, reverse=True)


def test_null_keys_ties_and_multicol(spark):
    df = spark.createDataFrame(
        [(None, 1)] * 4 + [("a", 1)] * 4 + [("a", 2)] * 2,
        "s string, i long",
    )
    got = {r["key"]: r for r in skew_profile(df, ["s", "i"], 5).collect()}
    # NULL renders as a real level and is NOT dropped
    assert got["__null__|1"]["cnt"] == 4
    assert got["a|1"]["cnt"] == 4
    # tie at cnt 4 breaks by key ASC: '__null__|1' < 'a|1'
    assert got["__null__|1"]["rank"] == 1 and got["a|1"]["rank"] == 2
    assert got["a|2"]["rank"] == 3
    # uniform table: hot_ratio exactly 1
    u = spark.createDataFrame([(f"k{i}",) for i in range(8)], "k string")
    ru = skew_profile(u, ["k"], 3).collect()[0]
    assert ru["hot_ratio"] == 1.0 and ru["avg_per_key"] == 1.0


def test_guards_and_empty(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="key_cols is required"):
        skew_profile(df, [])
    with pytest.raises(ValueError, match=r"top_k must be in"):
        skew_profile(df, ["k"], 0)
    empty = spark.createDataFrame([], "k string")
    assert skew_profile(empty, ["k"]).collect() == []
    # fractional/timestamp keys fail LOUD: CAST AS STRING rendering is
    # not cross-engine portable for them (ADVICE r4); string/int/
    # boolean/date pass the gate
    frac = spark.createDataFrame([(0.5, "a")], "f double, k string")
    with pytest.raises(ValueError, match="only string/integer"):
        skew_profile(frac, ["f"])
    with pytest.raises(ValueError, match="only string/integer"):
        skew_profile(
            spark.sql("SELECT TIMESTAMP'2020-01-01' AS ts"), ["ts"]
        )
    with pytest.raises(ValueError, match="unknown key col"):
        skew_profile(frac, ["nope"])
    okd = spark.sql(
        "SELECT 'x' AS s, CAST(1 AS BIGINT) AS i, TRUE AS b, "
        "DATE'2020-01-01' AS d"
    )
    assert len(skew_profile(okd, ["s", "i", "b", "d"]).collect()) == 1


def test_twin_equality(spark):
    keys = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(k VARCHAR)")
    con.executemany("INSERT INTO tw VALUES (?)", [(k,) for k in keys])
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    for tk in (5, 50):
        want = sorted(
            con.execute(
                skew_profile_sql("SELECT k AS k0 FROM tw", 1, tk)
            ).fetchall()
        )
        got = sorted(
            tuple(r) for r in skew_profile(df, ["k"], tk).collect()
        )
        assert got == want, tk


def test_plan_pins(spark):
    df = spark.createDataFrame([(k,) for k in _rows()], "k string")
    out = skew_profile(df, ["k"], 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "TakeOrderedAndProject" in plan   # top-k, never a full sort
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
