"""Winnowing fingerprints (dedup.winnow_fingerprints): exact hashlib
mirror of the DIRECT per-window definition vs Spark's run-length
reformulation, tie/edge contracts (rightmost min, short docs, empty/
NULL), the SIGMOD'03 density + shared-run guarantees, guards, plan
pins (1 Exchange / 1 Sort / 1 Window, zero Python), and direct DuckDB
twin equality."""

import contextlib
import hashlib
import io

import duckdb
import pytest

from audiopro_essentia_spark.duck_twins import winnow_fingerprints_sql
from audiopro_essentia_spark.operators.dedup import winnow_fingerprints


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _mirror(text, k, w):
    """The direct SIGMOD'03 definition: every window, rightmost min,
    distinct selected positions (1-based)."""
    ws = [x for x in (text or "").split(" ") if x]
    if len(ws) < k:
        return set()
    hl = [_h32(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)]
    m = len(hl)
    wm = min(w, m)
    out = set()
    for i in range(m - wm + 1):
        win = hl[i : i + wm]
        minv = min(win)
        p = i + max(j for j, v in enumerate(win) if v == minv)
        out.add((p + 1, hl[p]))
    return out


def _run(spark, rows, k=3, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k_gram=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return got


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "a b a b a b a b a b a b"),  # heavy hash ties -> rightmost rule
    (2, "x y z"),  # exactly k words: m=1, single fp at pos 1
    (3, "x y"),  # k-1 words: no shingle, no rows
    (4, ""),  # empty
    (5, None),  # NULL
    (6, "  padded   with    extra  spaces  between   words  here  "),
    (7, "one two three four five"),  # m=3 < w=4: single short window
    (8, "z z z z z z z z"),  # ALL hashes equal: rightmost-of-each-window
]


def test_mirror_exact(spark):
    got = _run(spark, CORPUS)
    for doc_id, text in CORPUS:
        want = _mirror(text, 3, 4)
        assert got.get(doc_id, set()) == want, (doc_id, text)
    # contract rows: no-row docs genuinely absent
    assert 3 not in got and 4 not in got and 5 not in got
    # m=1 doc: exactly the one shingle at pos 1
    assert got[2] == {(1, _h32("x y z"))}
    # all-equal hashes: direct def says every window selects its LAST
    # position -> positions w..m plus none earlier except... mirror owns it
    assert got[8] == _mirror(CORPUS[8][1], 3, 4)


@pytest.mark.parametrize("k,w", [(1, 2), (2, 3), (3, 4), (4, 5), (5, 2)])
def test_mirror_geometries(spark, k, w):
    rows = [(i, t) for i, t in CORPUS if t]
    got = _run(spark, rows, k=k, w=w)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _mirror(text, k, w), (doc_id, k, w)


def test_density_and_window_guarantee(spark):
    # one fingerprint per window of positions (the paper's guarantee):
    # every length-wm run of positions contains >= 1 selected position
    text = " ".join(f"w{i * 7919 % 1000}" for i in range(200))
    k, w = 3, 4
    got = sorted(p for p, _ in _run(spark, [(0, text)], k, w)[0])
    m = 200 - k + 1
    assert all(b - a <= w for a, b in zip(got, got[1:]))
    assert got[0] <= w and got[-1] >= m - w + 1
    # expected density 2/(w+1) = 0.4 — allow a wide band
    assert 0.25 <= len(got) / m <= 0.55


def test_shared_run_guarantee(spark):
    # two docs sharing a run of >= w+k-1 = 6 words share a fingerprint
    # HASH (positions differ — doc 1 is shifted by its distinct prefix)
    shared = "alpha beta gamma delta epsilon zeta"
    a = "p1 p2 p3 " + shared + " s1 s2"
    b = "q1 q2 q3 q4 q5 " + shared + " t1"
    got = _run(spark, [(0, a), (1, b)])
    fps_a = {fp for _, fp in got[0]}
    fps_b = {fp for _, fp in got[1]}
    assert fps_a & fps_b


def test_guards(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k_gram"):
        winnow_fingerprints(df, k_gram=0, window=4)
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints(df, k_gram=3, window=1)


def test_plan_pins(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = winnow_fingerprints(df, k_gram=3, window=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert plan.count("Exchange") == 1  # ONE hash exchange on doc_id
    assert plan.count("Sort ") == 1  # ONE sort serves the lag/lead chain
    assert plan.count("Window") == 1  # m rides the explode, no count window
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_twin_equality(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", CORPUS)
    for k, w in ((3, 4), (2, 5)):
        want = {}
        for doc_id, pos, fp in con.execute(
            winnow_fingerprints_sql(k_gram=k, window=w, table="docs")
        ).fetchall():
            want.setdefault(doc_id, set()).add((pos, fp))
        got = _run(spark, CORPUS, k=k, w=w)
        assert got == want, (k, w)
