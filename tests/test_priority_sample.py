"""priority_sample — Duffield–Lund–Thorup priority sampling (JACM 2007):
weighted sampling without replacement, k per stratum, with unbiased
Horvitz–Thompson adjusted weights. The numpy/hashlib mirror pins the exact
selection AND the exact adj_weight arithmetic; the scheme's unbiasedness is
verified statistically on the mirror (fast — no Spark loop over salts)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.functions.sampling import priority_sample

U52 = 4503599627370496.0  # 2^52


def mirror_priorities(rows, salt=""):
    """rows: list[(stratum, key, weight)] -> dict key -> priority, exactly
    the operator's arithmetic: u = (first-13-md5-hex + 1)/2^52, q = w/u."""
    out = {}
    for _, key, w in rows:
        h = int(hashlib.md5((str(key) + salt).encode()).hexdigest()[:13], 16)
        u = (float(h) + 1.0) / U52
        out[key] = float(w) / u
    return out


def mirror_sample(rows, k, salt=""):
    """Full mirror: per-stratum top-k by priority (tie key asc), tau =
    (k+1)-th, adj = max(w, tau)."""
    pr = mirror_priorities(rows, salt)
    by_s = {}
    for s, key, w in rows:
        by_s.setdefault(s, []).append((key, w))
    out = {}
    for s, kws in by_s.items():
        order = sorted(kws, key=lambda kw: (-pr[kw[0]], kw[0]))
        tau = pr[order[k][0]] if len(order) > k else 0.0
        for rank, (key, w) in enumerate(order[:k], 1):
            out[(s, key)] = (w, rank, pr[key], max(float(w), tau))
    return out


ROWS = [
    ("a", 1, 10), ("a", 2, 500), ("a", 3, 7), ("a", 4, 90), ("a", 5, 90),
    ("a", 6, 2000), ("a", 7, 1), ("b", 10, 3), ("b", 11, 3),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id long, n_chars long")


def test_matches_hand_mirror_exactly(spark):
    got = {
        (r.stratum, r.key): (r.weight, r.rank, r.priority, r.adj_weight)
        for r in priority_sample(_df(spark, ROWS), k=3).collect()
    }
    want = mirror_sample(ROWS, k=3)
    assert set(got) == set(want)
    for key in want:
        gw, gr, gp, ga = got[key]
        ww, wr, wp, wa = want[key]
        assert (gw, gr) == (ww, wr)
        # bit-exact, not approx: the chain is one add + two IEEE divides
        assert gp == wp and ga == wa, key


def test_small_stratum_is_exact_total(spark):
    """Stratum with <= k rows: everything selected, tau = 0, adj == w —
    the estimator degrades to the exact total."""
    out = {
        r.key: r
        for r in priority_sample(_df(spark, ROWS), k=3).collect()
        if r.stratum == "b"
    }
    assert set(out) == {10, 11}
    for r in out.values():
        assert r.adj_weight == float(r.weight)


def test_ht_estimator_is_unbiased_on_mirror():
    """E[sum(adj_weight)] = total weight — the scheme's defining property
    (Duffield et al. 2007 Thm 1), checked over 400 salt draws on the
    mirror. Deterministic: fixed salt list."""
    rows = [("s", i, w) for i, w in enumerate([1, 2, 3, 5, 8, 13, 21, 34, 55, 400, 7, 90])]
    total = sum(w for _, _, w in rows)
    k = 4
    ests = []
    for t in range(400):
        sam = mirror_sample(rows, k, salt=f"_trial{t}")
        ests.append(sum(v[3] for v in sam.values()))
    mean = float(np.mean(ests))
    # se of the mean over 400 trials is ~1-2% here; 6% is comfortably
    # outside noise while still failing on any systematic bias
    assert abs(mean - total) / total < 0.06, (mean, total)


def test_weight_guard_and_null_exclusion(spark):
    rows = [("a", 1, 10), ("a", 2, 0), ("a", 3, -5), ("a", 4, None)]
    out = priority_sample(_df(spark, rows), k=4).collect()
    assert [r.key for r in out] == [1]
    with pytest.raises(ValueError, match="k must be >= 1"):
        priority_sample(_df(spark, rows), k=0)


def test_sample_is_stable_under_corpus_growth(spark):
    """A row's priority never changes when other rows arrive — new rows
    can displace, never re-randomize: the selected set from the grown
    corpus is exactly the mirror's top-k over the union."""
    grown = ROWS + [("a", 100, 50_000), ("a", 101, 4)]
    base = {r.key for r in priority_sample(_df(spark, ROWS), k=3).collect() if r.stratum == "a"}
    after = {r.key for r in priority_sample(_df(spark, grown), k=3).collect() if r.stratum == "a"}
    want_after = {key for (s, key) in mirror_sample(grown, 3) if s == "a"}
    assert after == want_after
    # displaced-only: survivors of the grown corpus that were already
    # eligible must have been in the base sample
    assert (after & {k for _, k, _ in ROWS}) <= base


def test_plan_windowgrouplimit_single_exchange(spark):
    """Scale pins: the rank <= k+1 filter must hit WindowGroupLimit (map
    tasks forward <= k+1 rows per stratum) and tau's window must reuse
    the rank window's exchange — ONE Exchange total, zero Python."""
    df = _df(spark, ROWS)
    plan = (
        priority_sample(df, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
