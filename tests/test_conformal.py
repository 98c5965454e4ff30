"""conformal_intervals (operators/bootstrap.py): split conformal —
order-statistic mirror grouped+global, the finite-sample COVERAGE
guarantee checked empirically on exchangeable data, the 1..10
textbook rank hand case, r > n_cal undefined contract, no-calibration
groups kept with NULLs, fail-louds, guards, empty contracts, twin
equality, plan pins."""

from __future__ import annotations

import contextlib
import hashlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import conformal_intervals_sql
from audiopro_essentia_spark.operators.bootstrap import conformal_intervals


def _qhat(residuals_micro, alpha):
    ms = sorted(residuals_micro)
    n = len(ms)
    r = ((n + 1) * round((1 - alpha) * 1e6) + 999_999) // 1_000_000
    return ms[r - 1] if r <= n else None


def _mirror(cal, new, alpha, grouped):
    groups = sorted({r[0] for r in new}) if grouped else [None]
    out = {}
    for gv in groups:
        res = [
            round(abs(l - p) * 1e6)
            for g, p, l in cal
            if gv is None or g == gv
        ]
        q = _qhat(res, alpha) if res else None
        for g, rid, p in new:
            if gv is not None and g != gv:
                continue
            pu = round(p * 1e6)
            if q is None:
                out[(gv, rid)] = (
                    round(pu / 1e6, 6), None, None, None, len(res)
                )
            else:
                out[(gv, rid)] = (
                    round(pu / 1e6, 6),
                    round(q / 1e6, 6),
                    round((pu - q) / 1e6, 6),
                    round((pu + q) / 1e6, 6),
                    len(res),
                )
    return out


def _noise(key: str) -> float:
    """Deterministic exchangeable 'noise' in [-2, 2)."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return (h % 4_000_000) / 1_000_000 - 2.0


def _frames():
    cal, new = [], []
    for i in range(200):
        cal.append(("a", 10.0, 10.0 + _noise(f"ca{i}")))
        cal.append(("b", 5.0, 5.0 + 0.5 * _noise(f"cb{i}")))
    for i in range(100):
        new.append(("a", f"na{i}", 10.0))
        new.append(("b", f"nb{i}", 5.0))
    new.append(("zz", "norphan", 1.0))  # group with NO calibration
    return cal, new


CAL_SCHEMA = "grp string, pred double, label double"
NEW_SCHEMA = "grp string, rid string, pred double"


def _collect(df, grouped):
    return {
        (r["grp"] if grouped else None, r["id"]): (
            r["pred"], r["q_hat"], r["lo"], r["hi"], r["n_cal"]
        )
        for r in df.collect()
    }


def test_mirror_grouped_and_global(spark):
    cal, new = _frames()
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    for a in (0.1, 0.05):
        got = _collect(
            conformal_intervals(dc, dn, "pred", "label", "rid", ["grp"], a),
            True,
        )
        assert got == _mirror(cal, new, a, True), a
    got_g = _collect(
        conformal_intervals(dc, dn, "pred", "label", "rid", None, 0.2),
        False,
    )
    assert got_g == _mirror(cal, new, 0.2, False)


def test_coverage_guarantee(spark):
    """Fresh exchangeable labels drawn the same way as calibration:
    empirical coverage tracks >= 1 - alpha (the split-conformal
    finite-sample guarantee, checked on a fixed deterministic draw)."""
    cal, _ = _frames()
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    test_rows = [("a", f"t{i}", 10.0) for i in range(300)]
    dn = spark.createDataFrame(test_rows, NEW_SCHEMA)
    got = _collect(
        conformal_intervals(dc, dn, "pred", "label", "rid", ["grp"], 0.1),
        True,
    )
    covered = 0
    for i in range(300):
        truth = 10.0 + _noise(f"t{i}")
        _, _, lo, hi, _ = got[("a", f"t{i}")]
        covered += int(lo <= truth <= hi)
    assert covered / 300 >= 0.9 - 0.04


def test_textbook_rank_and_undefined(spark):
    # residuals 1..10, alpha = 0.2: r = ceil(11 * 0.8) = 9 -> q = 9
    cal = [("g", 0.0, float(i)) for i in range(1, 11)]
    new = [("g", "x", 100.0)]
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    (r,) = conformal_intervals(
        dc, dn, "pred", "label", "rid", ["grp"], 0.2
    ).collect()
    assert (r["q_hat"], r["lo"], r["hi"], r["n_cal"]) == (
        9.0, 91.0, 109.0, 10
    )
    # alpha = 0.05: r = ceil(11 * 0.95) = 11 > 10 -> undefined
    (r2,) = conformal_intervals(
        dc, dn, "pred", "label", "rid", ["grp"], 0.05
    ).collect()
    assert (r2["q_hat"], r2["lo"], r2["hi"], r2["n_cal"]) == (
        None, None, None, 10
    )


def test_no_calibration_group_kept(spark):
    cal, new = _frames()
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    got = _collect(
        conformal_intervals(dc, dn, "pred", "label", "rid", ["grp"], 0.1),
        True,
    )
    assert got[("zz", "norphan")] == (1.0, None, None, None, 0)


def test_guards_and_fail_louds(spark):
    cal = [("g", 1.0, 2.0)]
    new = [("g", "x", 1.0)]
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    with pytest.raises(ValueError, match="alpha must be in"):
        conformal_intervals(dc, dn, "pred", "label", "rid", alpha=0.0)
    with pytest.raises(ValueError, match="multiple of 1e-6"):
        conformal_intervals(dc, dn, "pred", "label", "rid", alpha=1e-8)
    badc = spark.createDataFrame([("g", 1.0, None)], CAL_SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN label"):
        conformal_intervals(
            badc, dn, "pred", "label", "rid", ["grp"]
        ).collect()
    badn = spark.createDataFrame([("g", None, 1.0)], NEW_SCHEMA)
    with pytest.raises(Exception, match="NULL rid"):
        conformal_intervals(
            dc, badn, "pred", "label", "rid", ["grp"]
        ).collect()
    nanp = spark.createDataFrame([("g", "x", float("nan"))], NEW_SCHEMA)
    with pytest.raises(Exception, match="NULL/NaN pred"):
        conformal_intervals(
            dc, nanp, "pred", "label", "rid", ["grp"]
        ).collect()


def test_empty_contracts(spark):
    cal = spark.createDataFrame([], CAL_SCHEMA)
    new = spark.createDataFrame([], NEW_SCHEMA)
    assert conformal_intervals(
        cal, new, "pred", "label", "rid", ["grp"]
    ).collect() == []
    # empty NEW frame with calibration present: zero rows
    dc = spark.createDataFrame([("g", 1.0, 2.0)], CAL_SCHEMA)
    assert conformal_intervals(
        dc, new, "pred", "label", "rid", ["grp"]
    ).collect() == []


def test_twin_equality(spark):
    cal, new = _frames()
    con = duckdb.connect()
    con.execute("CREATE TABLE cal(grp VARCHAR, pred DOUBLE, label DOUBLE)")
    con.execute("CREATE TABLE nw(grp VARCHAR, rid VARCHAR, pred DOUBLE)")
    con.executemany("INSERT INTO cal VALUES (?, ?, ?)", cal)
    con.executemany("INSERT INTO nw VALUES (?, ?, ?)", new)
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    for grouped, a in ((True, 0.1), (False, 0.2)):
        g = ("grp",) if grouped else ()
        pfx = "grp, " if grouped else ""
        sql = conformal_intervals_sql(
            f"SELECT {pfx}pred, label FROM cal",
            f"SELECT {pfx}rid AS id, pred FROM nw",
            g,
            a,
        )
        res = con.execute(sql)
        names = [d[0] for d in res.description]
        want = {}
        for row in res.fetchall():
            d = dict(zip(names, row))
            want[(d.get("grp"), d["id"])] = (
                d["pred"], d["q_hat"], d["lo"], d["hi"], d["n_cal"]
            )
        got = _collect(
            conformal_intervals(
                dc, dn, "pred", "label", "rid", list(g) or None, a
            ),
            grouped,
        )
        assert got == want, (grouped, a)


def test_plan_pins(spark):
    cal, new = _frames()
    dc = spark.createDataFrame(cal, CAL_SCHEMA)
    dn = spark.createDataFrame(new, NEW_SCHEMA)
    out = conformal_intervals(dc, dn, "pred", "label", "rid", ["grp"], 0.1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
