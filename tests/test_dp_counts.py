"""dp_counts (operators/checks.py): differentially-private group
counts — hash-threshold mirror, the data-independence pin (noise is a
function of (salt, group) only — the property the DP proof requires
of the mechanism's randomness), reproducibility + fresh-salt
contracts, threshold-table properties against the two-sided-geometric
definition, empirical distribution sanity, guards, empty contracts,
twin equality, plan pins."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import dp_counts_sql
from audiopro_essentia_spark.operators.checks import (
    dp_counts,
    dp_geometric_thresholds,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _noise(salt: str, parts: list[str], eps: float) -> int:
    k, ts = dp_geometric_thresholds(eps)
    u = _h32("|".join([f"{salt}:"] + parts))
    return -k + sum(1 for t in ts if u >= t)


def test_threshold_table_matches_definition():
    # independent check of the truncated two-sided geometric CDF
    for eps in (0.5, 1.0, 3.0):
        k, ts = dp_geometric_thresholds(eps)
        a = math.exp(-eps)
        w = [a ** abs(j) for j in range(-k, k + 1)]
        s = sum(w)
        assert len(ts) == 2 * k
        acc = 0.0
        for j, t in enumerate(ts):
            acc += w[j]
            assert t == round(acc / s * 2.0**32), (eps, j)
        # symmetry of the law: P(j) == P(-j) via threshold diffs
        diffs = [ts[0]] + [ts[i] - ts[i - 1] for i in range(1, len(ts))]
        probs = diffs + [2**32 - ts[-1]]
        for j in range(k):
            assert abs(probs[j] - probs[2 * k - j]) <= 1, j
        # truncated tail really is < 2^-32 per side
        assert w[0] / s < 2.0**-32 or k == 1024
    with pytest.raises(ValueError, match=r"epsilon must be in"):
        dp_geometric_thresholds(0.01)
    with pytest.raises(ValueError, match=r"epsilon must be in"):
        dp_geometric_thresholds(30.0)


def test_mirror_and_determinism(spark):
    rows = [("a", "x")] * 5 + [("b", "x")] * 3 + [("c", "y")] * 10
    df = spark.createDataFrame(rows, "s string, l string")
    got = {
        (r["s"], r["l"]): r["n_noisy"]
        for r in dp_counts(df, ["s", "l"], 1.0, "saltA").collect()
    }
    from collections import Counter

    counts = Counter(rows)
    assert got == {
        k: n + _noise("saltA", list(k), 1.0) for k, n in counts.items()
    }
    # byte-reproducible: same salt -> same release
    again = {
        (r["s"], r["l"]): r["n_noisy"]
        for r in dp_counts(df, ["s", "l"], 1.0, "saltA").collect()
    }
    assert again == got
    # a fresh salt is a fresh draw (some group must move)
    other = {
        (r["s"], r["l"]): r["n_noisy"]
        for r in dp_counts(df, ["s", "l"], 1.0, "saltB").collect()
    }
    assert other != got


def test_noise_independent_of_data(spark):
    # THE mechanism property: noise is a function of (salt, group)
    # only — growing a group's count must shift n_noisy by exactly
    # the growth, and cannot change any other group's release.
    small = [("a",)] * 2 + [("b",)] * 7
    big = [("a",)] * 102 + [("b",)] * 7
    d1 = spark.createDataFrame(small, "s string")
    d2 = spark.createDataFrame(big, "s string")
    r1 = {r["s"]: r["n_noisy"] for r in dp_counts(d1, ["s"], 1.0, "z").collect()}
    r2 = {r["s"]: r["n_noisy"] for r in dp_counts(d2, ["s"], 1.0, "z").collect()}
    assert r2["a"] - r1["a"] == 100
    assert r2["b"] == r1["b"]


def test_distribution_sanity(spark):
    # 2000 singleton groups at eps=1: empirical P(noise = 0) must sit
    # near the law's (1-a)/(1+a) = 0.462, and the mean near 0
    n = 2000
    df = spark.createDataFrame([(f"g{i}",) for i in range(n)], "s string")
    rel = dp_counts(df, ["s"], 1.0, "dist")
    noises = [r["n_noisy"] - 1 for r in rel.collect()]
    a = math.exp(-1.0)
    p0 = sum(1 for x in noises if x == 0) / n
    assert abs(p0 - (1 - a) / (1 + a)) < 0.05
    assert abs(sum(noises) / n) < 0.15
    assert min(noises) < 0 < max(noises)


def test_guards_and_empty(spark):
    bad = spark.createDataFrame([(None,)], "s string")
    with pytest.raises(Exception, match="NULL s"):
        dp_counts(bad, ["s"], 1.0, "gtest").collect()
    empty = spark.createDataFrame([], "s string")
    assert dp_counts(empty, ["s"], 1.0, "gtest").collect() == []
    # salt is REQUIRED and the historical default constant is rejected
    # (keyed-PRF assumption: a public/guessable salt voids the DP
    # guarantee — ADVICE r4)
    with pytest.raises(ValueError, match="salt is required"):
        dp_counts(empty, ["s"])
    with pytest.raises(ValueError, match="salt is required"):
        dp_counts(empty, ["s"], 1.0, "release0")
    with pytest.raises(ValueError, match="salt is required"):
        dp_counts(empty, ["s"], 1.0, "")
    # a global release of an empty table is a noisy zero, not no rows
    # (count's empty-aggregate row is a real answer here)
    g = dp_counts(empty, [], 1.0, "e").collect()
    assert len(g) == 1
    assert g[0]["n_noisy"] == 0 + _noise("e", [], 1.0)


def test_twin_equality(spark):
    rows = [("a", "x")] * 5 + [("b", "x")] * 3 + [("c", "y")] * 10
    con = duckdb.connect()
    con.execute("CREATE TABLE tw(s VARCHAR, l VARCHAR)")
    con.executemany("INSERT INTO tw VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, "s string, l string")
    for g, eps, salt in ((("s", "l"), 1.0, "tA"), (("s",), 0.5, "tB"), ((), 2.0, "tC")):
        got = sorted(
            tuple(r) for r in dp_counts(df, list(g), eps, salt).collect()
        )
        want = sorted(
            con.execute(
                dp_counts_sql("SELECT s, l FROM tw", g, eps, salt)
            ).fetchall()
        )
        assert got == want, (g, eps)


def test_plan_pins(spark):
    df = spark.createDataFrame([("a", "x")] * 5, "s string, l string")
    out = dp_counts(df, ["s", "l"], 1.0, "p")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert plan.count("Exchange") == 1     # the one count shuffle
    assert "Join" not in plan
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
