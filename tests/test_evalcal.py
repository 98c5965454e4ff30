"""calibration_report (exact micro-unit Brier + ECE + reliability
bins) and ks_drift (exact two-sample Kolmogorov-Smirnov distance vs a
baseline group): exact Python mirrors, hand-computed canonical cases
(perfectly-calibrated -> ece 0 / brier E[p(1-p)]; identical / shifted
/ disjoint distributions -> D 0 / 0.5 / 1.0), bucket-count invariance,
fail-louds, guards, grouped + global modes, zero-Python plan pins, and
direct DuckDB twin equality."""

import contextlib
import io
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import (
    calibration_report_sql,
    ks_drift_sql,
)
from audiopro_essentia_spark.operators.evalmetrics import (
    calibration_report,
    ks_drift,
)

MICRO = 10**6


def _q(s):
    # round(s*1e6) ties away from zero — the cross-engine recipe both
    # Spark (BigDecimal HALF_UP on the shortest repr) and DuckDB
    # (binary half-away) implement; all halves < 2^52 so they agree
    return int(
        Decimal(repr(s * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _cal_mirror(rows, n_bins=10):
    per = {}
    for s, y in rows:
        m = _q(s)
        b = min(n_bins - 1, (m * n_bins) // MICRO)
        c = per.setdefault(b, [0, 0, 0, 0])
        c[0] += 1
        c[1] += y
        c[2] += m
        c[3] += (m - y * MICRO) ** 2
    n_all = sum(c[0] for c in per.values())
    brier = round(sum(c[3] for c in per.values()) / (n_all * 1e12), 6)
    ece = round(
        sum(abs(c[2] - c[1] * MICRO) for c in per.values())
        / (n_all * MICRO),
        6,
    )
    return {
        b: (
            cnt,
            npos,
            round(sm / (cnt * MICRO), 6),
            round(npos / cnt, 6),
            round(abs(sm - npos * MICRO) / (cnt * MICRO), 6),
            brier,
            ece,
        )
        for b, (cnt, npos, sm, sq) in per.items()
    }


def _ks_mirror(vals_g, vals_b):
    from collections import Counter

    cg, cb = Counter(vals_g), Counter(vals_b)
    n, m = len(vals_g), len(vals_b)
    rp = rn = 0
    best = 0.0
    for v in sorted(set(cg) | set(cb)):
        rp += cg[v]
        rn += cb[v]
        best = max(best, abs(rp / n - rn / m))
    return (n, m, round(best, 6))


def _cal_pairs(g):
    # deterministic scores on a 1/100 grid in [0,1], label correlated
    # with score so bins are non-trivially mis-calibrated
    out = []
    for i in range(300):
        s = ((i * 13 + g * 7) % 101) / 100.0
        y = 1 if (i * 11 + g) % 10 < round(s * 8) else 0
        out.append((s, y))
    return out


def _cal_df(spark, grouped=True):
    rows = []
    for g in range(3):
        rows += [(g, s, y) for s, y in _cal_pairs(g)]
    df = spark.createDataFrame(rows, "cohort long, score double, label long")
    return df if grouped else df.drop("cohort")


def _cal_rows(res):
    out = {}
    for r in res:
        key = r["cohort"] if "cohort" in r.asDict() else None
        out.setdefault(key, {})[r["bin"]] = (
            r["cnt"],
            r["n_pos"],
            r["mean_score"],
            r["pos_frac"],
            r["gap"],
            r["brier"],
            r["ece"],
        )
    return out


def test_cal_mirror_grouped_and_global(spark):
    got = _cal_rows(
        calibration_report(
            _cal_df(spark), "score", "label", ["cohort"]
        ).collect()
    )
    for g in range(3):
        assert got[g] == _cal_mirror(_cal_pairs(g)), g
    allp = [p for g in range(3) for p in _cal_pairs(g)]
    got_g = _cal_rows(calibration_report(_cal_df(spark, False)).collect())
    assert got_g[None] == _cal_mirror(allp)


def test_cal_perfectly_calibrated(spark):
    rows = [(0.25, 1)] + [(0.25, 0)] * 3 + [(0.75, 1)] * 3 + [(0.75, 0)]
    df = spark.createDataFrame(rows, "score double, label long")
    res = {r["bin"]: r for r in calibration_report(df).collect()}
    assert set(res) == {2, 7}
    for b in (2, 7):
        assert res[b]["gap"] == 0.0
        assert res[b]["ece"] == 0.0
        # calibrated Brier = E[p(1-p)] = 0.25*0.75
        assert res[b]["brier"] == 0.1875
    assert (res[2]["cnt"], res[2]["n_pos"], res[2]["pos_frac"]) == (4, 1, 0.25)
    assert (res[7]["mean_score"], res[7]["pos_frac"]) == (0.75, 0.75)


def test_cal_bin_edges(spark):
    # m*n_bins div 1e6 edges: 0.1 lands in bin 1 (inclusive lower
    # edge), 1.0 clamps into the last bin, 0.0999995 rounds UP to
    # 100000 micro -> bin 1, 0.0999994 stays bin 0
    rows = [(0.0, 0), (0.1, 0), (1.0, 1), (0.0999995, 0), (0.0999994, 0)]
    df = spark.createDataFrame(rows, "score double, label long")
    got = {r["bin"]: r["cnt"] for r in calibration_report(df).collect()}
    assert got == {0: 2, 1: 2, 9: 1}


def test_cal_fail_louds(spark):
    base = [(0.5, 0), (0.7, 1)]
    for bad, msg in (
        ((None, 1), "NULL/NaN/out-of"),
        ((float("nan"), 0), "NULL/NaN/out-of"),
        ((-0.1, 0), "NULL/NaN/out-of"),
        ((1.0000001, 0), "NULL/NaN/out-of"),
        ((0.5, None), "NULL or non-binary label"),
        ((0.5, 2), "NULL or non-binary label"),
    ):
        df = spark.createDataFrame(base + [bad], "score double, label long")
        with pytest.raises(Exception, match=msg):
            calibration_report(df).collect()


def test_cal_guards_and_empty(spark):
    df = spark.createDataFrame([(0.5, 1)], "score double, label long")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(df, n_bins=0)
    empty = spark.createDataFrame([], "score double, label long")
    assert calibration_report(empty).count() == 0


def test_cal_twin_equality(spark):
    rows = []
    for g in range(3):
        rows += [(g, s, y) for s, y in _cal_pairs(g)]
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(cohort BIGINT, score DOUBLE, label BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    want = {}
    for r in con.execute(
        calibration_report_sql(
            "SELECT cohort, score, label FROM ev", ("cohort",)
        )
    ).fetchall():
        want.setdefault(r[0], {})[r[1]] = tuple(r[2:])
    got = {}
    for r in calibration_report(
        _cal_df(spark), "score", "label", ["cohort"]
    ).collect():
        got.setdefault(r["cohort"], {})[r["bin"]] = (
            r["cnt"], r["n_pos"], r["mean_score"], r["pos_frac"],
            r["gap"], r["brier"], r["ece"],
        )
    assert got == want
    wg = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            calibration_report_sql("SELECT score, label FROM ev")
        ).fetchall()
    }
    gg = {
        r["bin"]: (
            r["cnt"], r["n_pos"], r["mean_score"], r["pos_frac"],
            r["gap"], r["brier"], r["ece"],
        )
        for r in calibration_report(_cal_df(spark, False)).collect()
    }
    assert gg == wg


# ---- ks_drift ----


def _ks_vals(g):
    # overlapping integer-grid distributions shifted per group
    return [float((i * 17 + 3 * g * g) % 97 + 5 * g) for i in range(400)]


def _ks_df(spark, groups=("base", "a", "b", "c")):
    rows = []
    for g in groups:
        shift = 0 if g == "base" else 1 + ord(g[0]) % 5
        rows += [(g, v) for v in _ks_vals(shift)]
    return spark.createDataFrame(rows, "src string, v double")


def test_ks_mirror(spark):
    got = {
        r["src"]: (r["n"], r["n_base"], r["ks"])
        for r in ks_drift(_ks_df(spark), "v", "src", "base").collect()
    }
    base = _ks_vals(0)
    want = {
        g: _ks_mirror(_ks_vals(1 + ord(g) % 5), base) for g in "abc"
    }
    assert got == want
    assert "base" not in got  # baseline excluded from output


def test_ks_canonical(spark):
    def one(a_vals, b_vals):
        rows = [("a", float(v)) for v in a_vals]
        rows += [("base", float(v)) for v in b_vals]
        df = spark.createDataFrame(rows, "src string, v double")
        [r] = ks_drift(df, "v", "src", "base").collect()
        return (r["n"], r["n_base"], r["ks"])

    r100 = list(range(100))
    assert one(r100, r100) == (100, 100, 0.0)  # identical -> 0
    assert one([v + 100 for v in r100], r100) == (100, 100, 1.0)  # disjoint
    assert one([v + 50 for v in r100], r100) == (100, 100, 0.5)  # shifted
    # unequal sizes with ties: A={1,1,2}, B={1,2}: D at v=1 is
    # |2/3 - 1/2| = 1/6
    assert one([1, 1, 2], [1, 2]) == (3, 2, round(1 / 6, 6))


@pytest.mark.parametrize("nb", [1, 3, 1024])
def test_ks_bucket_invariance(spark, nb):
    got = {
        r["src"]: (r["n"], r["n_base"], r["ks"])
        for r in ks_drift(
            _ks_df(spark), "v", "src", "base", n_buckets=nb
        ).collect()
    }
    base = _ks_vals(0)
    assert got == {
        g: _ks_mirror(_ks_vals(1 + ord(g) % 5), base) for g in "abc"
    }


def test_ks_fail_louds(spark):
    for rows, msg in (
        ([("a", 1.0), ("base", None)], "NULL or NaN v"),
        ([("a", float("nan")), ("base", 1.0)], "NULL or NaN v"),
        ([(None, 1.0), ("base", 1.0)], "NULL src"),
        ([("a", 1.0), ("b", 2.0)], "baseline group 'base' not found"),
    ):
        df = spark.createDataFrame(rows, "src string, v double")
        with pytest.raises(Exception, match=msg):
            ks_drift(df, "v", "src", "base").collect()


def test_ks_empty_and_baseline_only(spark):
    empty = spark.createDataFrame([], "src string, v double")
    assert ks_drift(empty, "v", "src", "base").count() == 0
    only_base = spark.createDataFrame(
        [("base", 1.0), ("base", 2.0)], "src string, v double"
    )
    assert ks_drift(only_base, "v", "src", "base").count() == 0


def test_ks_twin_equality(spark):
    df = _ks_df(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(src VARCHAR, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(r["src"], r["v"]) for r in df.collect()],
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            ks_drift_sql("SELECT src, v FROM t", "base", "src")
        ).fetchall()
    }
    got = {
        r["src"]: (r["n"], r["n_base"], r["ks"])
        for r in ks_drift(df, "v", "src", "base").collect()
    }
    assert got == want


def test_no_python_in_plan(spark):
    for out in (
        calibration_report(_cal_df(spark), "score", "label", ["cohort"]),
        ks_drift(_ks_df(spark), "v", "src", "base"),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue().split("Initial Plan")[0]
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
