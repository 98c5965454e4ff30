"""C4-style line cleaning, exact-integer PCA power iteration, and the
deterministic epoch shuffle.

Hand-built fixtures with exact Python/numpy mirrors (the test IS the
oracle; the driver's DuckDB twins re-verify at sf0.01:
c4_clean / pca_power / epoch_shuffle).
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.functions.cleaning import (  # noqa: E402
    c4_clean,
    synthesize_lines,
)
from audiopro_essentia_spark.operators.decomp import (  # noqa: E402
    power_iteration,
    project_component,
    tdiv,
)
from audiopro_essentia_spark.operators.shuffle import epoch_shuffle  # noqa: E402


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# c4_clean
# ---------------------------------------------------------------------------


def test_c4_clean_line_and_doc_rules(spark):
    rows = [
        # 3 good lines -> kept whole
        (1, "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa!\nlambda mu nu xi omicron?"),
        # line too short / no terminal punct / javascript -> all dropped
        (2, "just four words here.\nthis line has no terminal punctuation\nenable javascript to view this page."),
        # only 2 good lines -> doc dropped, lines still counted
        (3, "one two three four five.\nsix seven eight nine ten.\nbad"),
        # lorem ipsum gate: lines fine, doc dropped
        (4, 'quick brown fox jumps over.\nlazy dog sits very still.\nlorem ipsum dolor sit amet.'),
        # brace gate
        (5, "var x = 1 set.\nthis config has braces {ok}.\nthird line of five words.\nfourth line of five words."),
        # empty text
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}

    assert out[1]["n_lines"] == 3 and out[1]["n_kept_lines"] == 3
    assert out[1]["keep"] == 1
    assert out[1]["clean_text"].count("\n") == 2

    assert out[2]["n_kept_lines"] == 0 and out[2]["keep"] == 0
    assert out[2]["clean_text"] == ""

    assert out[3]["n_lines"] == 3 and out[3]["n_kept_lines"] == 2
    assert out[3]["keep"] == 0

    assert out[4]["n_kept_lines"] == 3 and out[4]["keep"] == 0  # lorem gate
    assert out[5]["n_kept_lines"] >= 3 and out[5]["keep"] == 0  # brace gate

    for i in (6, 7):
        assert out[i]["n_lines"] == 1  # split('') == ['']
        assert out[i]["n_kept_lines"] == 0 and out[i]["keep"] == 0


def test_c4_quote_terminal_punct(spark):
    df = spark.createDataFrame(
        [(1, 'he said five words to me"')], "doc_id long, text string"
    )
    assert c4_clean(df).collect()[0]["n_kept_lines"] == 1


def test_synthesize_lines_matches_python_mirror(spark):
    text = " ".join(f"w{i}" for i in range(23))  # 3 chunks: 10/10/3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = df.select(synthesize_lines(F.col("text")).alias("t")).collect()[0]["t"]

    ws = text.split(" ")
    lines = []
    for i in range(0, len(ws), 10):
        raw = " ".join(ws[i : i + 10])
        lines.append(raw + ("." if _h32(raw) % 3 != 0 else ""))
    assert got == "\n".join(lines)
    # empty text -> empty string, not a 1-element phantom line
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert empty.select(synthesize_lines(F.col("text")).alias("t")).collect()[0]["t"] == ""


def test_c4_clean_plan_is_narrow(spark):
    """The whole operator must fuse into the scan projection: no
    Exchange, no Python eval."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(1, "five words ending in dot.")], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        c4_clean(df).explain()
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------


def _power_mirror(vecs, n_iter, scale=100, target_bits=16, dim=None):
    """Exact integer mirror of operators/decomp.power_iteration."""
    dim = dim or len(vecs[0])
    q = [[int(np.round(float(x) * scale)) for x in v] for v in vecs]
    n = len(q)
    b = [sum(v[i] for v in q) for i in range(dim)]
    w = [1] * dim
    for _ in range(n_iter):
        s = [sum(v[i] * w[i] for i in range(dim)) for v in q]
        a = [sum(v[i] * sv for v, sv in zip(q, s)) for i in range(dim)]
        st = sum(s)
        mean_s = tdiv(st, n)
        raw = [a[i] - b[i] * mean_s for i in range(dim)]
        max_abs = max(abs(r) for r in raw)
        if max_abs == 0:
            return q, [0] * dim
        d_scale = max(1, tdiv(max_abs, 1 << target_bits))
        w = [tdiv(r, d_scale) for r in raw]
    return q, w


def test_tdiv_truncates_toward_zero():
    assert tdiv(-7, 2) == -3 and tdiv(7, 2) == 3  # DuckDB: -7 // 2 = -3
    assert tdiv(-7, -2) == 3 and tdiv(7, -2) == -3
    assert tdiv(-1234567890123456789, 97) == -12727504021891307


def test_power_iteration_matches_exact_mirror(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant direction u, noise 10x smaller
    u = rng.standard_normal(8)
    u /= np.linalg.norm(u)
    vecs = [
        (rng.standard_normal() * 1.0) * u + 0.1 * rng.standard_normal(8)
        for _ in range(40)
    ]
    vecs = [[float(x) for x in v] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    # quantization in the engine happens from float32 storage; mirror that
    vecs32 = [[float(np.float32(x)) for x in v] for v in vecs]
    for n_iter in (1, 3):
        w = power_iteration(df, dim=8, n_iter=n_iter)
        q, w_exp = _power_mirror(vecs32, n_iter, dim=8)
        assert w == w_exp, f"n_iter={n_iter}"
    # direction converges to numpy's top eigenvector of the centered cov
    x = np.array(vecs, dtype=np.float64)
    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, -1]
    wv = np.array(power_iteration(df, dim=8, n_iter=6), dtype=np.float64)
    cos = abs(wv @ top) / (np.linalg.norm(wv) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_project_component_exact(spark):
    vecs = [[0.5, -1.25], [2.0, 0.75], [-0.333, 0.0]]
    df = spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    w = [3, -2]
    got = {
        r["vec_id"]: r["pc1_proj"] for r in project_component(df, w).collect()
    }
    for i, v in enumerate(vecs):
        q = [int(np.round(float(np.float32(x)) * 100)) for x in v]
        assert got[i] == q[0] * 3 + q[1] * (-2)


def test_power_iteration_degenerate_constant_input(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    # centered covariance is zero -> zero vector (matches the SQL twin's
    # raw_i = 0), never a divide-by-zero
    assert power_iteration(df, dim=2, n_iter=3) == [0, 0]


def test_power_iteration_empty_fails_loud(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="empty"):
        power_iteration(df, dim=2, n_iter=1)


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_exact_global_rank(spark):
    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = epoch_shuffle(df, seed="epochA", n_buckets=16).collect()
    keys = {i: _h32(f"epochA:{i}") for i in ids}
    expected_order = sorted(ids, key=lambda i: (keys[i], i))
    expected_pos = {i: p for p, i in enumerate(expected_order)}
    assert len(out) == len(ids)
    for r in out:
        assert r["shuffle_key"] == keys[r["doc_id"]]
        assert r["epoch_pos"] == expected_pos[r["doc_id"]]
    # positions are a permutation of 0..n-1
    assert sorted(r["epoch_pos"] for r in out) == list(range(len(ids)))


def test_epoch_shuffle_seed_changes_order_deterministically(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a1 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(df, seed="e1").collect()}
    a2 = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(df, seed="e1").collect()}
    b = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(df, seed="e2").collect()}
    assert a1 == a2  # reproducible
    assert a1 != b  # seed actually changes the permutation


def test_epoch_shuffle_no_global_window(spark):
    """The big-table window must be bucket-partitioned; only the B-row
    offsets table may run order-only (it is B rows by construction)."""
    import re

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = (
        epoch_shuffle(df, n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the row_number over the data rows must be PARTITIONED by _b ...
    assert re.search(r"windowspecdefinition\(_b#\d+, shuffle_key#\d+L? ASC", plan), plan
    # ... and no window may globally order the full table by shuffle_key
    assert not re.search(r"windowspecdefinition\(shuffle_key", plan), plan


def test_epoch_shuffle_scale_invariants(spark):
    """200k rows across all 64 buckets: epoch_pos must be exactly the
    permutation 0..n-1 (distributed asserts — nothing collected). The
    200-row golden can't catch bucket-boundary off-by-ones; this can."""
    n = 200_000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, seed="big", n_buckets=64)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("epoch_pos").alias("lo"),
        F.max("epoch_pos").alias("hi"),
        F.countDistinct("epoch_pos").alias("nd"),
    ).collect()[0]
    assert (row["n"], row["lo"], row["hi"], row["nd"]) == (n, 0, n - 1, n)
