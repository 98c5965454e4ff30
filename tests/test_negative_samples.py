"""negative_samples (functions/sampling.py): deterministic
contrastive negative sampling — md5 mirror over the epoch_shuffle
order, exact-count and no-self-pair invariants, reproducibility +
fresh-seed contracts, uniformity sanity, the n=1 zero-pair
degenerate, guards, empty contract, twin equality, plan pins."""

from __future__ import annotations

import contextlib
import hashlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import negative_samples_sql
from audiopro_essentia_spark.functions.sampling import negative_samples


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _mirror(ids, k, seed):
    order = sorted(ids, key=lambda i: (_h32(f"{seed}|order:{i}"), i))
    pos = {str(i): p for p, i in enumerate(order)}
    by_pos = {p: str(i) for p, i in enumerate(order)}
    n = len(ids)
    out = set()
    for i in ids:
        sid = str(i)
        for j in range(1, k + 1):
            t = _h32(f"{seed}:{sid}|neg|{j}") % n
            if t == pos[sid]:
                t = (t + 1) % n
            if by_pos[t] != sid:
                out.add((sid, by_pos[t], j))
    return out


def test_mirror_and_invariants(spark):
    ids = list(range(53))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        tuple(r) for r in negative_samples(df, "doc_id", 3, "sA").collect()
    }
    assert got == _mirror(ids, 3, "sA")
    assert len(got) == 53 * 3            # n>1: every draw lands
    assert all(a != b for a, b, _ in got)
    # reproducible; fresh seed differs
    again = {
        tuple(r) for r in negative_samples(df, "doc_id", 3, "sA").collect()
    }
    assert again == got
    other = {
        tuple(r) for r in negative_samples(df, "doc_id", 3, "sB").collect()
    }
    assert other != got


def test_uniformity_sanity(spark):
    # 400 anchors x 4 draws: each doc should serve as a negative
    # ~4 times; no doc should dominate (law-of-large-numbers band)
    n, k = 400, 4
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rows = negative_samples(df, "doc_id", k, "u").collect()
    from collections import Counter

    served = Counter(r["id_b"] for r in rows)
    assert len(rows) == n * k
    assert max(served.values()) <= 20    # mean 4, Poisson-ish tail
    assert len(served) > n * 0.9         # almost every doc serves


def test_degenerates_guards_empty(spark):
    one = spark.createDataFrame([(7,)], "doc_id long")
    assert negative_samples(one, "doc_id", 2).collect() == []
    two = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = negative_samples(two, "doc_id", 2).collect()
    assert all(r["id_a"] != r["id_b"] for r in pairs)
    assert len(pairs) == 4               # each anchor: both draws hit
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match=r"k must be in \[1, 64\]"):
        negative_samples(df, "doc_id", 0)
    with pytest.raises(ValueError, match=r"k must be in \[1, 64\]"):
        negative_samples(df, "doc_id", 65)
    empty = spark.createDataFrame([], "doc_id long")
    assert negative_samples(empty, "doc_id", 2).collect() == []


def test_twin_equality(spark):
    ids = [(i,) for i in range(41)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", ids)
    df = spark.createDataFrame(ids, "doc_id long")
    for k, seed in ((1, "tA"), (4, "tB")):
        got = sorted(
            tuple(r)
            for r in negative_samples(df, "doc_id", k, seed).collect()
        )
        want = sorted(
            con.execute(
                negative_samples_sql(
                    "SELECT doc_id AS id FROM t", k, seed
                )
            ).fetchall()
        )
        assert got == want, (k, seed)


def test_plan_pins(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = negative_samples(df, "doc_id", 2, "p")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the only windows are epoch_shuffle's per-bucket rank and its
    # tiny B-row offset prefix — never a corpus-partition window
    assert plan.count("Window") <= 2
