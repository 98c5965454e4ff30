"""Round-3 pipeline operators: BPE training, temperature sampling,
hierarchical capping, silence segmentation.

Hand-built fixtures with hand-computed expectations (the test IS the
oracle; the driver's DuckDB twins re-verify the fixture-scale queries at
sf0.01: bpe_merges / temperature_sample / cap_per_group /
silence_segments).
"""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.functions.sampling import (  # noqa: E402
    hash_bucket,
    temperature_sample,
)
from audiopro_essentia_spark.operators.bpe import (  # noqa: E402
    segment_words,
    train_bpe,
)
from audiopro_essentia_spark.operators.segmentation import (  # noqa: E402
    silence_ratio,
    silence_segments,
)
from audiopro_essentia_spark.operators.skew import capped_top_n  # noqa: E402


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def test_bpe_textbook_merges(spark):
    # Sennrich et al.'s low/lower/lowest shape; every count hand-derived.
    df = spark.createDataFrame(
        [("low low lower",), ("lowest low",)], ["text"]
    )
    got = [tuple(r) for r in train_bpe(spark, df, n_merges=4).collect()]
    # merge 1: (l,o) and (o,w) both 5 — tie-break left asc picks (l,o)
    # merge 4: (lowe,r)/(lowe,s)/(s,t) all 1 — (lowe,r) wins on right asc
    assert got == [
        (1, "l", "o", 5),
        (2, "lo", "w", 5),
        (3, "low", "e", 2),
        (4, "lowe", "r", 1),
    ]


def test_bpe_single_pass_leftmost_no_cascade(spark):
    df = spark.createDataFrame([("aaa aaaa",)], ["text"])
    segs = {
        r["word"]: r["sym"]
        for r in segment_words(df, [("a", "a")]).collect()
    }
    # leftmost non-overlapping, and the merged 'aa' never re-triggers
    # within the same pass
    assert segs["aaa"] == ["aa", "a"]
    assert segs["aaaa"] == ["aa", "aa"]
    # a second application of the SAME merge now pairs the 'aa' symbols
    segs2 = {
        r["word"]: r["sym"]
        for r in segment_words(df, [("a", "a"), ("aa", "aa")]).collect()
    }
    assert segs2["aaaa"] == ["aaaa"]
    assert segs2["aaa"] == ["aa", "a"]


def test_bpe_exhausts_early(spark):
    # 'ab' has exactly one mergeable pair; asking for 3 merges stops at 1
    df = spark.createDataFrame([("ab ab",)], ["text"])
    got = [tuple(r) for r in train_bpe(spark, df, n_merges=3).collect()]
    assert got == [(1, "a", "b", 2)]


def _mirror_pair_counts(words):
    """Driver-side exact pair-count mirror: {(l, r): freq-weighted count}."""
    from collections import Counter

    c = Counter()
    for sym, freq in words:
        for a, b in zip(sym, sym[1:]):
            c[(a, b)] += freq
    return c


def _mirror_apply(words, left, right):
    out = []
    for sym, freq in words:
        acc = []
        for s in sym:
            if acc and acc[-1] == left and s == right:
                acc[-1] = left + right
            else:
                acc.append(s)
        out.append((acc, freq))
    return out


def _mirror_textbook_bpe(corpus_words, n_merges):
    """Driver-side textbook BPE: greedy exact argmax per merge with the
    documented (count desc, left asc, right asc) tie-break — the
    INDEPENDENT reference m=1 must equal (comparing m=1 against itself
    via the default would be vacuous)."""
    from collections import Counter

    wf = Counter(corpus_words)
    words = [(list(w), f) for w, f in sorted(wf.items())]
    merges = []
    for rank in range(1, n_merges + 1):
        pc = _mirror_pair_counts(words)
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        words = _mirror_apply(words, left, right)
    return merges


def test_bpe_batched_m1_equals_exact(spark):
    """m=1 must reproduce the textbook greedy-exact sequence, judged
    against a DRIVER-SIDE mirror (not against another train_bpe call,
    which would share any regression)."""
    df = spark.createDataFrame(
        [("low low lower",), ("lowest low",)], ["text"]
    )
    corpus_words = "low low lower lowest low".split()
    want = _mirror_textbook_bpe(corpus_words, 4)
    m1 = [
        tuple(r)
        for r in train_bpe(
            spark, df, n_merges=4, merges_per_round=1
        ).collect()
    ]
    assert m1 == want


def test_bpe_batched_counts_exact_at_application(spark, monkeypatch):
    """The compatibility theorem, checked end-to-end: every batched
    merge's recorded pair_cnt equals the EXACT corpus count at its
    application point (replayed by a driver-side mirror), batches are
    pairwise symbol-disjoint, and the round count is ~n_merges/m
    (3 pair-count jobs for 6 merges at m=3 on the textbook corpus,
    vs 6 exact)."""
    import audiopro_essentia_spark.operators.bpe as bpe_mod

    calls = {"n": 0}
    real = bpe_mod.pair_counts

    def counting(words):
        calls["n"] += 1
        return real(words)

    monkeypatch.setattr(bpe_mod, "pair_counts", counting)
    df = spark.createDataFrame(
        [("low low lower",), ("lowest low",)], ["text"]
    )
    got = [
        tuple(r)
        for r in train_bpe(
            spark, df, n_merges=6, merges_per_round=3
        ).collect()
    ]
    # hand-derived: round 1 picks (l,o):5 then skips (o,w) [shares o],
    # picks (w,e):2, skips (e,r)/(e,s) [share e], picks (s,t):1;
    # round 2 picks (lo,w):3, skips (lo,we), picks (we,r):1, skips
    # (we,st) -> only 2 fit; round 3 picks (lo,we):1 on right-asc
    # tie-break. The rank-2/3 divergence from exact mode ((lo,w) before
    # (w,e)) is the documented in-batch creation blindness.
    assert got == [
        (1, "l", "o", 5),
        (2, "w", "e", 2),
        (3, "s", "t", 1),
        (4, "lo", "w", 3),
        (5, "we", "r", 1),
        (6, "lo", "we", 1),
    ]
    assert calls["n"] == 3  # ~n_merges/m jobs, not n_merges
    # frozen-count exactness: replay the merge list on a driver mirror,
    # asserting each recorded count equals the true count at application
    words = [
        (list("low"), 3),
        (list("lower"), 1),
        (list("lowest"), 1),
    ]
    for _, left, right, cnt in got:
        assert _mirror_pair_counts(words)[(left, right)] == cnt, (left, right)
        words = _mirror_apply(words, left, right)


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_rates_sqrt_path(spark):
    # totals: A=100, B=400 -> rates A=1000 (smallest kept whole),
    # B=floor(sqrt(100/400)*1000+0.5)=500
    rows = [("A", i, 10) for i in range(10)] + [
        ("B", 100 + i, 20) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = temperature_sample(df, tau=0.5)
    rates = {
        r["source"]: r["rate_pm"]
        for r in out.select("source", "rate_pm").distinct().collect()
    }
    assert rates["A"] == 1000
    assert rates.get("B", 500) == 500  # B may vanish if no bucket < 500
    # the kept set is exactly the content-hash decision
    kept = {r["doc_id"] for r in out.collect()}
    expect = {
        r["doc_id"]
        for r in df.withColumn("b", hash_bucket(F.col("doc_id")))
        .collect()
        if (r["source"] == "A" and r["b"] < 1000)
        or (r["source"] == "B" and r["b"] < 500)
    }
    assert kept == expect


def test_temperature_degenerate_source_kept_whole(spark):
    # all-NULL weight -> no meaningful share -> kept whole at rate 1000
    rows = [("A", 1, 100), ("A", 2, 100), ("Z", 3, None), ("Z", 4, None)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_chars long"
    )
    out = temperature_sample(df, tau=0.5)
    z = {r["doc_id"]: r["rate_pm"] for r in out.filter("source='Z'").collect()}
    assert z == {3: 1000, 4: 1000}


def test_temperature_tau_validation(spark):
    df = spark.createDataFrame([("A", 1, 1)], ["source", "doc_id", "n_chars"])
    with pytest.raises(ValueError):
        temperature_sample(df, tau=0.0)
    with pytest.raises(ValueError):
        temperature_sample(df, tau=1.5)


# ---------------------------------------------------------------------------
# hierarchical capped top-n
# ---------------------------------------------------------------------------


def test_capped_top_n_equals_single_window(spark):
    rows = [
        ("g1", i, (i * 7) % 13) for i in range(40)
    ] + [("g2", 100 + i, i % 3) for i in range(9)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    got = sorted(
        tuple(r)
        for r in capped_top_n(df, n=5, n_salts=4)
        .select("source", "doc_id", "n_chars", "rank")
        .collect()
    )
    # expected = plain top-5 per group by (n_chars desc, doc_id asc)
    expect = []
    for g in ("g1", "g2"):
        grp = sorted(
            ((s, d, c) for s, d, c in rows if s == g),
            key=lambda t: (-t[2], t[1]),
        )[:5]
        expect.extend((s, d, c, i + 1) for i, (s, d, c) in enumerate(grp))
    assert got == sorted(expect)


def test_capped_top_n_ties_deterministic(spark):
    rows = [("g", i, 7) for i in range(10)]  # all-tied order values
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    got = [
        r["doc_id"]
        for r in capped_top_n(df, n=3, n_salts=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == [0, 1, 2]  # id asc breaks ties, salt-invariant


# ---------------------------------------------------------------------------
# silence segmentation
# ---------------------------------------------------------------------------


def _framed_fixture(spark):
    # energies: 10, 200, 300, 5, 400 -> active @100: F T T F T
    wins = [
        (1, 0, [1, 3, 0, 0]),
        (1, 1, [10, 10, 0, 0]),
        (1, 2, [10, 10, 10, 0]),
        (1, 3, [1, 2, 0, 0]),
        (1, 4, [20, 0, 0, 0]),
        (2, 0, [1, 1, 1, 1]),  # energy 4: fully silent doc
    ]
    return spark.createDataFrame(
        wins, "doc_id long, frame_idx int, window array<int>"
    )


def test_silence_segments_islands(spark):
    out = {
        (r["doc_id"], r["start_frame"]): r
        for r in silence_segments(
            _framed_fixture(spark), min_energy=100, frame_length=4, hop=2
        ).collect()
    }
    assert set(out) == {(1, 1), (1, 4)}
    s1 = out[(1, 1)]
    assert (s1["end_frame"], s1["n_frames"]) == (2, 2)
    assert (s1["start_token"], s1["end_token"]) == (2, 8)
    assert s1["seg_rms"] == round(math.sqrt((200 + 300) / 8.0), 6)
    s2 = out[(1, 4)]
    assert (s2["end_frame"], s2["n_frames"]) == (4, 1)
    assert (s2["start_token"], s2["end_token"]) == (8, 12)
    assert s2["seg_rms"] == round(math.sqrt(400 / 4.0), 6)


def test_silence_ratio_reference_shape(spark):
    out = {
        r["doc_id"]: r
        for r in silence_ratio(
            _framed_fixture(spark), min_energy=100
        ).collect()
    }
    assert out[1]["silence_ratio"] == 0.4  # 2 of 5 frames silent
    assert out[2]["silence_ratio"] == 1.0
    assert out[2]["n_frames"] == 1
