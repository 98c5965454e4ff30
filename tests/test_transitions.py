"""transition_matrix (exact first-order Markov transitions over
per-key event sequences): exact Python mirror, hand-chain case,
same-timestamp tie determinism, conservation invariants (counts sum
to n_events, per-prev probs sum to ~1), fail-louds (NULL key/ts/type,
reserved start state), empty contract, direct DuckDB twin equality,
zero-Python plan pin."""

import contextlib
import io
from datetime import datetime, timedelta

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import transition_matrix_sql
from audiopro_essentia_spark.operators.temporal import transition_matrix

T0 = datetime(2024, 1, 1)
TYPES = ["view", "click", "purchase"]


def _mirror(rows, start="__START__"):
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for k, tm, t in rows:
        seqs[k].append((tm, t))
    pairs = Counter()
    for k, evs in seqs.items():
        prev = start
        for _, t in sorted(evs):
            pairs[(prev, t)] += 1
            prev = t
    tot = Counter()
    for (p, _), c in pairs.items():
        tot[p] += c
    return {
        (p, c): (n, round(n / tot[p], 6)) for (p, c), n in pairs.items()
    }


def _rows():
    out = []
    for u in range(8):
        for i in range(30):
            t = TYPES[(i * 7 + u) % 3]
            # coarse minutes -> real (ts, type) ties within users
            tm = (i * 13 + u * 5) % 40
            out.append((u, tm, t))
    return out


def _df(spark, rows):
    data = [(str(k), T0 + timedelta(minutes=tm), t) for k, tm, t in rows]
    return spark.createDataFrame(data, "user_id string, ts timestamp, event_type string")


def _got(res):
    return {(r["prev"], r["curr"]): (r["cnt"], r["prob"]) for r in res}


def test_mirror(spark):
    got = _got(transition_matrix(_df(spark, _rows())).collect())
    assert got == _mirror(_rows())


def test_hand_chain(spark):
    rows = [("u", 0, "a"), ("u", 1, "b"), ("u", 2, "a"), ("u", 3, "a")]
    got = _got(transition_matrix(_df(spark, rows)).collect())
    assert got == {
        ("__START__", "a"): (1, 1.0),
        ("a", "b"): (1, 0.5),
        ("b", "a"): (1, 1.0),
        ("a", "a"): (1, 0.5),
    }


def test_tie_order_is_by_type(spark):
    # two events at the SAME timestamp: 'click' sorts before 'view',
    # so the chain is START -> click -> view deterministically
    rows = [("u", 0, "view"), ("u", 0, "click")]
    got = _got(transition_matrix(_df(spark, rows)).collect())
    assert got == {
        ("__START__", "click"): (1, 1.0),
        ("click", "view"): (1, 1.0),
    }


def test_conservation(spark):
    rows = _rows()
    res = transition_matrix(_df(spark, rows)).collect()
    assert sum(r["cnt"] for r in res) == len(rows)
    from collections import defaultdict

    byprev = defaultdict(float)
    for r in res:
        byprev[r["prev"]] += r["prob"]
    for p, s in byprev.items():
        assert abs(s - 1.0) < 1e-4, (p, s)
    # every key contributes exactly one START transition
    starts = sum(r["cnt"] for r in res if r["prev"] == "__START__")
    assert starts == len({k for k, _, _ in rows})


def test_fail_louds_and_empty(spark):
    base = [("u", T0, "a")]
    for row, msg in (
        ((None, T0, "a"), "NULL user_id"),
        (("v", None, "a"), "NULL ts"),
        (("v", T0, None), "NULL or reserved event_type"),
        (("v", T0, "__START__"), "NULL or reserved event_type"),
    ):
        df = spark.createDataFrame(
            base + [row], "user_id string, ts timestamp, event_type string"
        )
        with pytest.raises(Exception, match=msg):
            transition_matrix(df).collect()
    empty = spark.createDataFrame(
        [], "user_id string, ts timestamp, event_type string"
    )
    assert transition_matrix(empty).count() == 0


def test_twin_equality(spark):
    rows = _rows()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, tm BIGINT, t VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(str(k), tm * 60_000_000, t) for k, tm, t in rows],
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            transition_matrix_sql("SELECT k, tm, t FROM t")
        ).fetchall()
    }
    got = _got(transition_matrix(_df(spark, rows)).collect())
    assert got == want


def test_no_python_in_plan(spark):
    out = transition_matrix(_df(spark, _rows()))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
