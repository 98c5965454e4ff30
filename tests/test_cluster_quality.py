"""cluster_quality (operators/similarity.py): Calinski-Harabasz +
scatter decomposition — numpy definition cross-check, the T = W + B
identity, separation ordering (tight/separated beats random beats
anti-structured), degenerate contracts (k=1, k=n, W=0 duplicates),
ragged-dim and dim-disagreement fail-louds, twin equality, plan
pins."""

from __future__ import annotations

import contextlib
import io

import duckdb
import numpy as np
import pytest

from audiopro_essentia_spark.duck_twins import cluster_quality_sql
from audiopro_essentia_spark.operators.similarity import cluster_quality

SCHEMA = "cl string, embedding array<double>"


def _np_ch(rows):
    X = np.array([[round(v * 1e6) / 1e6 for v in r[1]] for r in rows])
    lab = np.array([r[0] for r in rows])
    gm = X.mean(0)
    t = float(((X - gm) ** 2).sum())
    w = float(
        sum(
            ((X[lab == c] - X[lab == c].mean(0)) ** 2).sum()
            for c in set(lab)
        )
    )
    b = t - w
    n, k = len(rows), len(set(lab))
    ch = (b / (k - 1)) / (w / (n - k)) if (k > 1 and n > k and w > 0) else None
    return w, b, t, ch


def _sep_rows():
    rows = []
    for i in range(12):
        rows.append(("a", [0.01 * i, 0.0, 1.0]))
        rows.append(("b", [6.0, 6.0 + 0.01 * i, -1.0]))
    return rows


def test_definition_and_identity(spark):
    rows = _sep_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    r = cluster_quality(df, "cl", "embedding").collect()[0]
    w, b, t, ch = _np_ch(rows)
    assert (r["k"], r["n"], r["dim"]) == (2, 24, 3)
    assert abs(r["within"] - w) < 1e-3
    assert abs(r["between"] - b) < 1e-3
    assert abs(r["total"] - t) < 1e-3
    assert abs(r["ch"] - ch) < abs(ch) * 1e-4
    # the decomposition identity holds on the reported numbers
    assert abs(r["within"] + r["between"] - r["total"]) < 2e-5


def test_separation_ordering(spark):
    # tight separated clusters >> hash-random assignment of same data
    rows = _sep_rows()
    sep = cluster_quality(
        spark.createDataFrame(rows, SCHEMA), "cl", "embedding"
    ).collect()[0]
    # rows alternate true clusters, so i%2 would just swap labels —
    # i%4<2 gives each label half of EACH true cluster (no structure)
    rand_rows = [
        ("a" if i % 4 < 2 else "b", r[1]) for i, r in enumerate(rows)
    ]
    rnd = cluster_quality(
        spark.createDataFrame(rand_rows, SCHEMA), "cl", "embedding"
    ).collect()[0]
    assert sep["ch"] > 100 * rnd["ch"]
    # same total scatter either way (T ignores labels)
    assert abs(sep["total"] - rnd["total"]) < 2e-6


def test_degenerates(spark):
    # k = 1: no between structure
    one = spark.createDataFrame(
        [("a", [float(i), 0.0]) for i in range(5)], SCHEMA
    )
    r1 = cluster_quality(one, "cl", "embedding").collect()[0]
    assert r1["k"] == 1 and r1["ch"] is None
    assert r1["between"] == 0.0
    # k = n: no within freedom
    kn = spark.createDataFrame(
        [(f"c{i}", [float(i), 1.0]) for i in range(4)], SCHEMA
    )
    rn = cluster_quality(kn, "cl", "embedding").collect()[0]
    assert rn["k"] == 4 and rn["n"] == 4 and rn["ch"] is None
    assert rn["within"] == 0.0
    # duplicates: W == 0 with k < n -> NULL ch (infinite ratio orders
    # nothing), W visible as exactly 0.0
    dup = spark.createDataFrame(
        [("a", [1.0, 2.0])] * 3 + [("b", [5.0, 5.0])] * 3, SCHEMA
    )
    rd = cluster_quality(dup, "cl", "embedding").collect()[0]
    assert rd["within"] == 0.0 and rd["ch"] is None
    assert rd["between"] > 0


def test_fail_louds_and_empty(spark):
    ragged = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [1.0])], SCHEMA
    )
    with pytest.raises(Exception, match="ragged vector dims"):
        cluster_quality(ragged, "cl", "embedding").collect()
    dis = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [1.0, 2.0, 3.0])], SCHEMA
    )
    with pytest.raises(Exception, match="disagree on vector dim"):
        cluster_quality(dis, "cl", "embedding").collect()
    nullc = spark.createDataFrame([(None, [1.0])], SCHEMA)
    with pytest.raises(Exception, match="NULL cl"):
        cluster_quality(nullc, "cl", "embedding").collect()
    nullv = spark.createDataFrame([("a", None)], SCHEMA)
    with pytest.raises(Exception, match="NULL/empty embedding"):
        cluster_quality(nullv, "cl", "embedding").collect()
    empty = spark.createDataFrame([], SCHEMA)
    assert cluster_quality(empty, "cl", "embedding").collect() == []


def test_twin_equality(spark):
    for rows in (_sep_rows(), [("a", [1.0, 2.0])] * 3 + [("b", [5.0, 5.0])] * 3):
        con = duckdb.connect()
        con.execute("CREATE TABLE t(cl VARCHAR, vec DOUBLE[])")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        df = spark.createDataFrame(rows, SCHEMA)
        got = [
            tuple(r)
            for r in cluster_quality(df, "cl", "embedding").collect()
        ]
        want = con.execute(
            cluster_quality_sql("SELECT cl AS cluster, vec FROM t")
        ).fetchall()
        assert got == want
        con.close()


def test_plan_pins(spark):
    df = spark.createDataFrame(_sep_rows(), SCHEMA)
    out = cluster_quality(df, "cl", "embedding")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
