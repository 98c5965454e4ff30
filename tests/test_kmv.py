"""KMV distinct sketch (kmv_sketch / kmv_distinct / kmv_jaccard):
exact hashlib mirror, estimator accuracy vs exact counts, under-full
exactness, set-union mergeability (the HLL/CMS/Bloom/LQ epoch
discipline), guards, scale-plan pins, and direct DuckDB twin
equality."""

import contextlib
import hashlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import (
    kmv_distinct_sql,
    kmv_jaccard_sql,
)
from audiopro_essentia_spark.operators.sketch import (
    TWO_52,
    kmv_distinct,
    kmv_jaccard,
    kmv_sketch,
)


def _h52(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:13], 16)


def _mirror_sketch(elems, k):
    return sorted({_h52(v) for v in elems if v is not None})[:k]


def _mirror_est(elems, k):
    sk = _mirror_sketch(elems, k)
    if len(sk) < k:
        return round(float(len(sk)), 6)
    return round((k - 1) * TWO_52 / sk[-1], 6)


def _mirror_jaccard(a_elems, b_elems, k):
    sa, sb = set(_mirror_sketch(a_elems, k)), set(_mirror_sketch(b_elems, k))
    cut = sorted(sa | sb)[:k]
    shared = sum(1 for h in cut if h in sa and h in sb)
    return len(cut), shared, round(shared / len(cut), 6)


def _corpus():
    # three sources with engineered overlap: s0 and s1 share the first
    # 600 of 900 words (true J = 600/1200 = 0.5); s2 is small (< k)
    w = lambda i: f"word{i:05d}"
    rows = []
    for i in range(900):
        rows.append(("s0", w(i)))
    for i in range(300, 1200):
        rows.append(("s1", w(i)))
        rows.append(("s1", w(i)))  # within-group dups must not matter
    for i in range(40):
        rows.append(("s2", w(i)))
    rows.append(("s0", None))  # NULL values ignored
    return rows


def _df(spark, rows=None):
    return spark.createDataFrame(rows or _corpus(), "source string, w string")


def test_mirror_sketch_and_estimates(spark):
    k = 64
    rows = _corpus()
    got_sk = {
        g: sorted(r["h"] for r in grp)
        for g, grp in __import__("itertools").groupby(
            sorted(kmv_sketch(_df(spark), "w", "source", k).collect(),
                   key=lambda r: (r["g"], r["h"])),
            key=lambda r: r["g"],
        )
    }
    elems = lambda g: [v for s, v in rows if s == g]
    for g in ("s0", "s1", "s2"):
        assert got_sk[g] == _mirror_sketch(elems(g), k), g
    got = {r["source"]: r for r in
           kmv_distinct(_df(spark), "w", "source", k).collect()}
    for g in ("s0", "s1", "s2"):
        assert got[g]["est_distinct"] == _mirror_est(elems(g), k), g
    # under-full group is exact
    assert got["s2"]["n_sketch"] == 40 and got["s2"]["est_distinct"] == 40.0
    ja = {(r["src_a"], r["src_b"]): r for r in
          kmv_jaccard(_df(spark), "w", "source", k).collect()}
    for a, b in (("s0", "s1"), ("s0", "s2"), ("s1", "s2")):
        ku, ns, je = _mirror_jaccard(elems(a), elems(b), k)
        r = ja[(a, b)]
        assert (r["k_used"], r["n_shared"], r["jaccard_est"]) == (ku, ns, je)


def test_estimator_accuracy(spark):
    # k=256 -> relative standard error ~ 1/sqrt(k-2) = 6.3%; assert 4x
    k, n = 256, 5000
    rows = [("g", f"item{i}") for i in range(n)]
    est = kmv_distinct(_df(spark, rows), "w", "source", k).collect()[0]
    assert abs(est["est_distinct"] - n) / n < 0.25
    # true J = 0.5 pair from the corpus; KMV-Jaccard RSE ~ sqrt(J(1-J)/k)
    ja = {(r["src_a"], r["src_b"]): r["jaccard_est"]
          for r in kmv_jaccard(_df(spark), "w", "source", 256).collect()}
    assert abs(ja[("s0", "s1")] - 0.5) < 0.15


def test_mergeability_set_union(spark):
    # sketch(shard1 UNION shard2) == k smallest of union of shard
    # sketches — the streaming/epoch merge contract
    k = 32
    rows = _corpus()
    sh1, sh2 = rows[::2], rows[1::2]
    s1 = {(r["g"], r["h"]) for r in
          kmv_sketch(_df(spark, sh1), "w", "source", k).collect()}
    s2 = {(r["g"], r["h"]) for r in
          kmv_sketch(_df(spark, sh2), "w", "source", k).collect()}
    merged = {}
    for g, h in s1 | s2:
        merged.setdefault(g, set()).add(h)
    merged = {(g, h) for g, hs in merged.items()
              for h in sorted(hs)[:k]}
    full = {(r["g"], r["h"]) for r in
            kmv_sketch(_df(spark), "w", "source", k).collect()}
    assert merged == full


def test_guards(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_sketch(_df(spark), "w", "source", k=1)


def test_twin_equality(spark):
    rows = _corpus()
    con = duckdb.connect()
    con.execute("CREATE TABLE elems(g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO elems VALUES (?, ?)", rows)
    el = "SELECT g, v FROM elems"
    k = 64
    want_d = sorted(con.execute(
        kmv_distinct_sql(k=k, elements=el, group_alias="source")).fetchall())
    got_d = sorted(tuple(r) for r in
                   kmv_distinct(_df(spark), "w", "source", k).collect())
    assert got_d == want_d
    want_j = sorted(con.execute(kmv_jaccard_sql(k=k, elements=el)).fetchall())
    got_j = sorted(tuple(r) for r in
                   kmv_jaccard(_df(spark), "w", "source", k).collect())
    assert got_j == want_j


def test_plan_pins(spark):
    def simple(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    p = simple(kmv_distinct(_df(spark), "w", "source", 16))
    assert "Python" not in p, p
    # distinct-(g,h) exchange + group exchange; the final per-group agg
    # reuses the window's clustering (subset-of-keys rule)
    assert p.count("Exchange") == 2, p
    # rank <= k pushes a partial top-k below the group exchange
    assert "WindowGroupLimit" in p, p
    # jaccard: sketch is checkpointed once for its two pair-side
    # consumers; everything downstream is bounded G^2 k rows
    pj = simple(kmv_jaccard(_df(spark), "w", "source", 16))
    assert "Python" not in pj, pj
    assert pj.count("Scan ExistingRDD") >= 1, pj
