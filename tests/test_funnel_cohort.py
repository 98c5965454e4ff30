"""funnel_steps / funnel_counts / cohort_retention — ordered funnel
analysis and cohort retention over the events table: hand-mirror
semantics, the strictly-after and anchored-span rules, greedy-chain
optimality, guards, scale-shape plan pins, and direct DuckDB-twin
equality (exact BIGINT micros end-to-end)."""

from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

from audiopro_essentia_spark.duck_twins import (
    cohort_retention_sql,
    funnel_counts_sql,
    funnel_steps_sql,
)
from audiopro_essentia_spark.operators.temporal import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)

EPOCH = datetime(1970, 1, 1)


def _ts(sec: float) -> datetime:
    # session TZ is pinned UTC, so naive datetimes ARE epoch-anchored
    return EPOCH + timedelta(seconds=sec)


STEPS = ("signup", "view", "click", "purchase")

FUNNEL_ROWS = [
    # u1: full chain in order -> depth 4
    (1, _ts(10), "signup"), (1, _ts(20), "view"),
    (1, _ts(30), "click"), (1, _ts(40), "purchase"),
    # u2: view BEFORE signup never chains -> depth 1
    (2, _ts(10), "view"), (2, _ts(20), "signup"), (2, _ts(5), "click"),
    # u3: view at the SAME microsecond as signup -> strictly-after -> 1
    (3, _ts(10), "signup"), (3, _ts(10), "view"),
    # u4: skips click -> depth 2
    (4, _ts(10), "signup"), (4, _ts(20), "view"), (4, _ts(30), "purchase"),
    # u5: no signup at all -> excluded from output
    (5, _ts(10), "view"), (5, _ts(20), "click"),
    # u6: greedy earliest-chain is optimal: view@2 then click@5 reaches
    # depth 3; taking the later view@10 would miss click@5
    (6, _ts(1), "signup"), (6, _ts(2), "view"),
    (6, _ts(10), "view"), (6, _ts(5), "click"),
    # u7: NULL ts rows carry no time -> dropped (u7 keeps only view)
    (7, None, "signup"), (7, _ts(20), "view"),
    # noise types are filtered before the shuffle
    (1, _ts(15), "error"),
]


def _fdf(spark, rows=FUNNEL_ROWS):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_hand_mirror(spark):
    got = {
        r.user_id: (
            r.step_1_us, r.step_2_us, r.step_3_us, r.step_4_us, r.depth
        )
        for r in funnel_steps(_fdf(spark), STEPS).collect()
    }
    m = 1_000_000
    assert got == {
        1: (10 * m, 20 * m, 30 * m, 40 * m, 4),
        2: (20 * m, None, None, None, 1),
        3: (10 * m, None, None, None, 1),
        4: (10 * m, 20 * m, None, None, 2),
        6: (1 * m, 2 * m, 5 * m, None, 3),
    }  # u5 (no step-1 event) and u7 (only a NULL-ts signup) are absent


def test_funnel_anchored_span(spark):
    """With max_span_seconds, later steps must land in
    [step_1, step_1 + span]; the window anchors at the FIRST step-1
    event and never re-opens."""
    rows = [
        (1, _ts(0), "signup"), (1, _ts(8 * 86400), "view"),
        # a second signup inside view's reach must NOT re-anchor
        (1, _ts(7 * 86400), "signup"),
    ]
    no_span = funnel_steps(_fdf(spark, rows), ("signup", "view")).collect()
    assert no_span[0].depth == 2
    spanned = funnel_steps(
        _fdf(spark, rows), ("signup", "view"), max_span_seconds=7 * 86400
    ).collect()
    assert spanned[0].depth == 1 and spanned[0].step_2_us is None


def test_funnel_repeated_step_type(spark):
    """steps may repeat a type (view -> view): the second occurrence
    needs a strictly later event of the same type."""
    rows = [(1, _ts(10), "view"), (1, _ts(20), "view"),
            (2, _ts(10), "view")]
    got = {
        r.user_id: (r.step_1_us, r.step_2_us, r.depth)
        for r in funnel_steps(_fdf(spark, rows), ("view", "view")).collect()
    }
    m = 1_000_000
    assert got == {1: (10 * m, 20 * m, 2), 2: (10 * m, None, 1)}


def test_funnel_counts_nested(spark):
    out = {
        r.step: (r.step_type, r.n_reached, r.conversion)
        for r in funnel_counts(_fdf(spark), STEPS).collect()
    }
    assert out == {
        1: ("signup", 5, 1.0),
        2: ("view", 3, 0.6),
        3: ("click", 2, 0.4),
        4: ("purchase", 1, 0.2),
    }
    reached = [out[i][1] for i in sorted(out)]
    assert reached == sorted(reached, reverse=True)  # nested by design


def test_funnel_guards(spark):
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel_steps(_fdf(spark), ("signup",))
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(_fdf(spark), ("signup", ""))
    with pytest.raises(ValueError, match="max_span_seconds"):
        funnel_steps(_fdf(spark), STEPS, max_span_seconds=0)


def test_funnel_plan_one_exchange_zero_python(spark):
    """Scale pin: the whole per-user funnel is ONE hash shuffle on
    user_id feeding a single groupBy of sorted per-type arrays — no
    Sort node (sort_array is an expression), no Python, and the type
    filter is PUSHED to the scan."""
    plan = (
        funnel_steps(_fdf(spark), STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan and "Sort [" not in plan


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_funnel_filter_pushed_to_scan(spark, sf_dir):
    from audiopro_essentia_spark.operators.temporal import funnel_steps as fs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = fs(ev, STEPS)._jdf.queryExecution().executedPlan().toString()
    assert "In(event_type" in plan, plan  # PushedFilters reaches parquet


def _duck(rows):
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    con.register("events", pdf)
    return con


def _assert_frames_equal(sp, dd):
    sp = sp.reset_index(drop=True)
    dd = dd.reset_index(drop=True).astype(sp.dtypes.to_dict())
    a = sp.astype(object).where(pd.notna(sp), None)
    b = dd.astype(object).where(pd.notna(dd), None)
    assert a.equals(b), f"\nspark:\n{a}\nduck:\n{b}"


def test_funnel_twin_matches_duckdb(spark):
    sp = (
        funnel_steps(_fdf(spark), STEPS, max_span_seconds=25)
        .orderBy("user_id")
        .toPandas()
    )
    dd = _duck(FUNNEL_ROWS).execute(
        funnel_steps_sql(STEPS, max_span_seconds=25) + " ORDER BY user_id"
    ).fetchdf()
    _assert_frames_equal(sp, dd)


def test_funnel_counts_twin_matches_duckdb(spark):
    sp = funnel_counts(_fdf(spark), STEPS).orderBy("step").toPandas()
    dd = _duck(FUNNEL_ROWS).execute(
        funnel_counts_sql(STEPS) + " ORDER BY step"
    ).fetchdf()
    _assert_frames_equal(sp, dd)


COHORT_ROWS = [
    # period = 10 s; u1 cohort 0 active at offsets {0, 1, 3}
    (1, _ts(5), "view"), (1, _ts(15), "view"), (1, _ts(35), "view"),
    # u4 cohort 0, offset 0 only
    (4, _ts(8), "view"),
    # u2 cohort 1
    (2, _ts(12), "view"), (2, _ts(18), "view"),
    # u3 cohort 2, offsets {0, 2}
    (3, _ts(25), "view"), (3, _ts(45), "view"),
    # NULL ts dropped
    (9, None, "view"),
]


def test_cohort_hand_mirror(spark):
    got = {
        (r.cohort_period, r.period_offset): (
            r.n_active, r.cohort_size, r.retention
        )
        for r in cohort_retention(
            _fdf(spark, COHORT_ROWS), period_seconds=10
        ).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (0, 3): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
        (2, 0): (1, 1, 1.0),
        (2, 2): (1, 1, 1.0),
    }


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_cohort_offset_zero_is_identity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = cohort_retention(ev, period_seconds=86400)
    zero = out.where("period_offset = 0").collect()
    assert zero and all(
        r.retention == 1.0 and r.n_active == r.cohort_size for r in zero
    )


def test_cohort_guard(spark):
    with pytest.raises(ValueError, match="period_seconds"):
        cohort_retention(_fdf(spark, COHORT_ROWS), period_seconds=0)


def test_cohort_plan_one_corpus_shuffle(spark):
    """Scale pin: ONE FileScan, ONE corpus-scale exchange (user) — the
    window-min cohorting; distinct reuses it (subset rule) — plus two
    grid-sized exchanges ((cohort, offset) aggregate, cohort-size
    window). Zero Python; the two window uses of min(_per) share one
    Window node."""
    plan = (
        cohort_retention(_fdf(spark, COHORT_ROWS), period_seconds=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 3, plan
    assert plan.count("hashpartitioning(user_id#") == 1, plan
    assert "Python" not in plan


def test_cohort_twin_matches_duckdb(spark):
    sp = (
        cohort_retention(_fdf(spark, COHORT_ROWS), period_seconds=10)
        .orderBy("cohort_period", "period_offset")
        .toPandas()
    )
    dd = _duck(COHORT_ROWS).execute(
        cohort_retention_sql(period_seconds=10)
        + " ORDER BY cohort_period, period_offset"
    ).fetchdf()
    _assert_frames_equal(sp, dd)


def _mirror_funnel(rows, steps, span_us=None):
    """Driver-side python mirror of the funnel chain semantics."""
    per: dict = {}
    for u, ts, et in rows:
        if ts is None or et not in steps:
            continue
        us = int((ts - EPOCH).total_seconds() * 1_000_000)
        arrs = per.setdefault(u, [[] for _ in steps])
        for i, s in enumerate(steps):
            if et == s:
                arrs[i].append(us)
    out = {}
    for u, arrs in per.items():
        s1 = min(arrs[0]) if arrs[0] else None
        if s1 is None:
            continue
        chain = [s1]
        for i in range(1, len(steps)):
            prev = chain[-1]
            cand = (
                []
                if prev is None
                else [
                    t
                    for t in arrs[i]
                    if t > prev and (span_us is None or t <= s1 + span_us)
                ]
            )
            chain.append(min(cand) if cand else None)
        out[u] = (tuple(chain), sum(c is not None for c in chain))
    return out


def test_funnel_property_random_vs_mirror(spark):
    """Property: random event soups (ties, noise types, NULL ts, users
    missing any step) — Spark AND the DuckDB twin both equal the
    python mirror, with and without an anchored span."""
    from hypothesis import given, settings, strategies as st

    types = list(STEPS) + ["error", "other"]

    @settings(max_examples=12, deadline=None)
    @given(st.data())
    def run(data):
        rows = []
        for u in range(data.draw(st.integers(1, 6))):
            n = data.draw(st.integers(0, 10))
            for _ in range(n):
                sec = data.draw(st.integers(0, 40))
                et = data.draw(st.sampled_from(types))
                null_ts = data.draw(st.booleans()) and sec == 0
                rows.append((u, None if null_ts else _ts(sec), et))
        if not rows:
            rows = [(0, _ts(1), "signup")]
        span_s = data.draw(st.sampled_from([None, 10, 25]))
        span_us = None if span_s is None else span_s * 1_000_000
        exp = _mirror_funnel(rows, STEPS, span_us)
        got = {
            r.user_id: (
                (r.step_1_us, r.step_2_us, r.step_3_us, r.step_4_us),
                r.depth,
            )
            for r in funnel_steps(
                _fdf(spark, rows), STEPS, max_span_seconds=span_s
            ).collect()
        }
        assert got == exp, (rows, span_s)
        dd = _duck(rows).execute(
            funnel_steps_sql(STEPS, max_span_seconds=span_s)
        ).fetchdf()
        dgot = {
            int(r.user_id): (
                tuple(
                    None if pd.isna(v) else int(v)
                    for v in (r.step_1_us, r.step_2_us,
                              r.step_3_us, r.step_4_us)
                ),
                int(r.depth),
            )
            for r in dd.itertuples()
        }
        assert dgot == exp, (rows, span_s)

    run()


def test_cohort_property_random_vs_mirror(spark):
    """Property: random activity — Spark and the DuckDB twin equal an
    independent python mirror of the cohort grid."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        p = data.draw(st.sampled_from([7, 10]))
        rows = []
        for u in range(data.draw(st.integers(1, 6))):
            secs = data.draw(
                st.lists(st.integers(0, 60), min_size=1, max_size=8)
            )
            rows.extend((u, _ts(s), "view") for s in secs)
        firsts, cells = {}, set()
        for u, ts, _ in rows:
            us = int((ts - EPOCH).total_seconds() * 1_000_000)
            per = us // (p * 1_000_000)
            firsts[u] = min(firsts.get(u, per), per)
        for u, ts, _ in rows:
            us = int((ts - EPOCH).total_seconds() * 1_000_000)
            per = us // (p * 1_000_000)
            cells.add((u, firsts[u], per - firsts[u]))
        exp_active: dict = {}
        for _, c, o in cells:
            exp_active[(c, o)] = exp_active.get((c, o), 0) + 1
        exp = {
            k: (n, exp_active[(k[0], 0)],
                round(n / exp_active[(k[0], 0)], 6))
            for k, n in exp_active.items()
        }
        got = {
            (r.cohort_period, r.period_offset): (
                r.n_active, r.cohort_size, r.retention
            )
            for r in cohort_retention(
                _fdf(spark, rows), period_seconds=p
            ).collect()
        }
        assert got == exp, (rows, p)
        dd = _duck(rows).execute(cohort_retention_sql(period_seconds=p)
                                 ).fetchdf()
        dgot = {
            (int(r.cohort_period), int(r.period_offset)): (
                int(r.n_active), int(r.cohort_size), float(r.retention)
            )
            for r in dd.itertuples()
        }
        assert dgot == exp, (rows, p)

    run()


def test_funnel_counts_no_step1_both_engines_empty(spark):
    """The empty-sweep divergence: with no step-1 event anywhere, Spark's
    groupBy over the empty per-user frame emits 0 rows — each DuckDB
    UNION branch is a global aggregate that would emit one
    (n_reached=0, conversion NaN) row without its HAVING count(*) > 0
    guard. Both engines must return empty."""
    rows = [(1, _ts(10), "view"), (2, _ts(20), "click")]
    assert funnel_counts(_fdf(spark, rows), STEPS).count() == 0
    dd = _duck(rows).execute(funnel_counts_sql(STEPS)).fetchdf()
    assert len(dd) == 0
