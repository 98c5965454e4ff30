"""bootstrap_ci (operators/bootstrap.py): deterministic hash-Poisson
bootstrap — hashlib-exact mirror grouped+global, the Poisson(1) weight
distribution checked against its outside definition (P(0) = e^-1, mean
1), constant-column degenerate (se = 0, lo = hi = mean), coverage on a
smooth sample, tiny-group b_eff exclusion, fail-louds, guards, empty
contracts, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import bootstrap_ci_sql
from audiopro_essentia_spark.operators.bootstrap import (
    POISSON1_T32,
    bootstrap_ci,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _w(id_: str, b: int) -> int:
    h = _h32(f"{id_}|{b}")
    return sum(1 for t in POISSON1_T32 if h >= t)


def _rha(num: int, den: int) -> int:
    """round(num/den) half AWAY from zero (engine round semantics)."""
    assert den > 0
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((2 * (-num) + den) // (2 * den))


def _mirror(rows, b_reps, alpha, grouped):
    q_lo_u = round(alpha / 2 * 1e6)
    q_hi_u = 1_000_000 - q_lo_u
    groups = sorted({r[0] for r in rows}) if grouped else [None]
    out = {}
    for gv in groups:
        grows = [r for r in rows if gv is None or r[0] == gv]
        n = len(grows)
        xs = {rid: round(v * 1e6) for _, rid, v in grows}
        sall = sum(xs.values())
        ms = []
        for b in range(b_reps):
            s = wt = 0
            for rid, x in xs.items():
                w = _w(rid, b)
                s += w * x
                wt += w
            if wt > 0:
                ms.append(_rha(s, wt))
        ms.sort()
        be = len(ms)
        mean = round(sall / (n * 1e6), 6)
        if be > 1:
            sm, smm = sum(ms), sum(m * m for m in ms)
            se = round(
                math.sqrt((be * smm - sm * sm) / (be * (be - 1))) / 1e6, 6
            )
        else:
            se = None
        if be > 0:
            rlo = max(1, (be * q_lo_u + 999999) // 1_000_000)
            rhi = max(1, (be * q_hi_u + 999999) // 1_000_000)
            lo = round(ms[rlo - 1] / 1e6, 6)
            hi = round(ms[rhi - 1] / 1e6, 6)
        else:
            lo = hi = None
        out[gv] = (n, mean, se, lo, hi, be)
    return out


def _rows():
    # quarter-grid values: micro quantization is exact, no round ties
    rows = []
    for i in range(60):
        rows.append(("a", f"a{i}", (i % 17) + 0.25 * (i % 4)))
    for i in range(25):
        rows.append(("b", f"b{i}", 100.0 + 0.5 * (i % 9)))
    rows.append(("c", "c0", 7.25))  # single-row group
    return rows


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None): (
            r["n"], r["mean"], r["se_boot"], r["lo"], r["hi"], r["b_eff"]
        )
        for r in df.collect()
    }


def test_mirror_grouped_and_global(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp string, id string, v double")
    got = _collect(bootstrap_ci(df, "v", "id", ["grp"], 40, 0.05), True)
    want = {g: v for g, v in _mirror(rows, 40, 0.05, True).items()}
    assert got == want
    got_g = _collect(bootstrap_ci(df, "v", "id", None, 40, 0.1), False)
    assert got_g == _mirror(rows, 40, 0.1, False)


def test_poisson_weight_distribution():
    """The thresholds against their OUTSIDE definition: Poisson(1)."""
    draws = [_w(f"r{i}", b) for i in range(500) for b in range(10)]
    n = len(draws)
    frac0 = sum(1 for w in draws if w == 0) / n
    assert abs(frac0 - math.exp(-1)) < 0.02          # P(0) = e^-1
    assert abs(sum(draws) / n - 1.0) < 0.03          # E[w] = 1
    frac1 = sum(1 for w in draws if w == 1) / n
    assert abs(frac1 - math.exp(-1)) < 0.02          # P(1) = e^-1
    assert max(draws) <= 10
    # CDF thresholds are what the docstring claims
    assert POISSON1_T32[0] == int(math.exp(-1) * 2**32)


def test_constant_column_degenerate(spark):
    """Every replicate of a constant column averages to the constant:
    se EXACTLY 0, lo = hi = mean — the m=0-style outside invariant."""
    rows = [("a", f"r{i}", 3.5) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, id string, v double")
    (r,) = bootstrap_ci(df, "v", "id", ["grp"], 30, 0.05).collect()
    assert (r["mean"], r["se_boot"], r["lo"], r["hi"]) == (3.5, 0.0, 3.5, 3.5)
    assert r["b_eff"] == 30


def test_coverage_and_tiny_group(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp string, id string, v double")
    got = _collect(bootstrap_ci(df, "v", "id", ["grp"], 60, 0.05), True)
    n, mean, se, lo, hi, be = got["a"]
    # a smooth 60-row sample: the 95% CI brackets the sample mean
    assert lo <= mean <= hi and lo < hi and se > 0
    assert be == 60
    # single-row group: ~e^-1 of replicates have weight 0 and are
    # excluded; the defined ones all equal the single value
    n1, mean1, se1, lo1, hi1, be1 = got["c"]
    assert (n1, mean1, lo1, hi1) == (1, 7.25, 7.25, 7.25)
    assert 0 < be1 < 60
    assert se1 == 0.0


def test_guards_and_fail_louds(spark):
    df = spark.createDataFrame(
        [("a", "r1", 1.0)], "grp string, id string, v double"
    )
    with pytest.raises(ValueError, match="b_reps"):
        bootstrap_ci(df, "v", "id", b_reps=1)
    with pytest.raises(ValueError, match="alpha must be in"):
        bootstrap_ci(df, "v", "id", alpha=1.5)
    with pytest.raises(ValueError, match="multiple of 1e-6"):
        bootstrap_ci(df, "v", "id", alpha=0.0000001)
    bad = spark.createDataFrame(
        [("a", "r1", None)], "grp string, id string, v double"
    )
    with pytest.raises(Exception, match="NULL/NaN v"):
        bootstrap_ci(bad, "v", "id", ["grp"], 5).collect()
    nanbad = spark.createDataFrame(
        [("a", "r1", float("nan"))], "grp string, id string, v double"
    )
    with pytest.raises(Exception, match="NULL/NaN v"):
        bootstrap_ci(nanbad, "v", "id", ["grp"], 5).collect()
    idbad = spark.createDataFrame(
        [("a", None, 1.0)], "grp string, id string, v double"
    )
    with pytest.raises(Exception, match="NULL id"):
        bootstrap_ci(idbad, "v", "id", ["grp"], 5).collect()


def test_empty_contract(spark):
    df = spark.createDataFrame([], "grp string, id string, v double")
    assert bootstrap_ci(df, "v", "id", ["grp"], 10).collect() == []
    assert bootstrap_ci(df, "v", "id", None, 10).collect() == []


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE tb(grp VARCHAR, id VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO tb VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "grp string, id string, v double")
    src = "SELECT grp, id, v FROM tb"
    for grouped, b, a in ((True, 40, 0.05), (False, 25, 0.1)):
        g = ("grp",) if grouped else ()
        res = con.execute(bootstrap_ci_sql(src, g, b, a))
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[d.get("grp")] = (
                d["n"], d["mean"], d["se_boot"], d["lo"], d["hi"],
                d["b_eff"],
            )
        got = _collect(
            bootstrap_ci(df, "v", "id", list(g) or None, b, a), grouped
        )
        assert got == want, (grouped, b, a)


def test_plan_pins(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp string, id string, v double")
    out = bootstrap_ci(df, "v", "id", ["grp"], 40, 0.05)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
