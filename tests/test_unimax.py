"""UniMax budget allocation (sampling.unimax_allocation): exact mirror
of the paper's SEQUENTIAL waterfall (the closed form must reproduce
the loop), conservation/cap/fairness invariants, degenerate contracts
(all-capped slack budget, zero-token sources, empty input), guards,
and direct DuckDB twin equality."""

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import unimax_allocation_sql
from audiopro_essentia_spark.functions.sampling import unimax_allocation


def _waterfall(counts, budget, max_epochs):
    """The ICLR'23 sequential algorithm, verbatim: repeatedly give the
    remaining budget equally to remaining sources; whoever would
    exceed capacity caps out; repeat. Integer shares via div with the
    remainder to the first sources in (capacity, source) order."""
    caps = {s: n * max_epochs for s, n in counts.items()}
    order = sorted(caps, key=lambda s: (caps[s], s if s is not None else ""))
    alloc = {}
    remaining = list(order)
    pool = budget
    while remaining:
        share = pool // len(remaining)
        capped = [s for s in remaining if caps[s] <= share]
        if not capped:
            rem = pool % len(remaining)
            for idx, s in enumerate(remaining):
                alloc[s] = share + (1 if idx < rem else 0)
            break
        for s in capped:
            alloc[s] = caps[s]
            pool -= caps[s]
            remaining.remove(s)
    return alloc


def _run(spark, counts, budget, max_epochs=1):
    rows = [(s, n) for s, n in counts.items()]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    return {
        r["source"]: (
            r["n_tokens"],
            r["capacity"],
            r["allocation"],
            r["epochs_micro"],
        )
        for r in unimax_allocation(
            df, budget_tokens=budget, max_epochs=max_epochs
        ).collect()
    }


CASES = [
    # mixed capped/uncapped with remainder
    ({"a": 100, "b": 500, "c": 500, "d": 2000}, 2001, 1),
    # nobody capped, remainder distribution
    ({"a": 1000, "b": 1000, "c": 1000}, 1000, 2),
    # everyone capped, slack budget
    ({"a": 10, "b": 20}, 1000, 3),
    # capacity ties broken by source name
    ({"x": 50, "y": 50, "z": 50}, 100, 1),
    # zero-token source
    ({"a": 0, "b": 300}, 200, 1),
]


@pytest.mark.parametrize("counts,budget,epochs", CASES)
def test_matches_sequential_waterfall(spark, counts, budget, epochs):
    got = _run(spark, counts, budget, epochs)
    want = _waterfall(counts, budget, epochs)
    assert {s: v[2] for s, v in got.items()} == want
    for s, (n, cap, a, em) in got.items():
        assert cap == counts[s] * epochs and a <= cap
        assert em == (a * 1_000_000) // n if n > 0 else em is None
    # conservation: full budget spent unless everyone capped
    total_cap = sum(counts.values()) * epochs
    assert sum(v[2] for v in got.values()) == min(budget, total_cap)


def test_fairness_dominance(spark):
    # no uncapped source ends with LESS than any capped one (UniMax's
    # point: tail sources reach their cap before head sources pile up)
    counts = {f"s{i}": 100 * (i + 1) for i in range(10)}
    got = _run(spark, counts, 3000, 1)
    capped = [v[2] for v in got.values() if v[2] == v[1]]
    uncapped = [v[2] for v in got.values() if v[2] < v[1]]
    assert capped and uncapped
    assert min(uncapped) >= max(capped)


def test_degenerate_contracts(spark):
    df = spark.createDataFrame([], "source string, n_tokens long")
    assert unimax_allocation(df, budget_tokens=100).collect() == []
    # budget zero: everyone gets 0 (no caps triggered except zero-cap)
    got = _run(spark, {"a": 5, "b": 7}, 0)
    assert {s: v[2] for s, v in got.items()} == {"a": 0, "b": 0}


def test_guards(spark):
    df = spark.createDataFrame([("a", 1)], "source string, n_tokens long")
    with pytest.raises(ValueError, match="budget_tokens"):
        unimax_allocation(df, budget_tokens=-1)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, budget_tokens=1, max_epochs=0)


@pytest.mark.parametrize("counts,budget,epochs", CASES)
def test_twin_equality(spark, counts, budget, epochs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(source VARCHAR, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(counts.items()))
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            unimax_allocation_sql(
                budget, epochs, source="SELECT source, n_tokens FROM t"
            )
        ).fetchall()
    }
    assert _run(spark, counts, budget, epochs) == want
