"""Gopher quality rules (cleaning.gopher_quality) and edit-distance-verified
near-dup (dedup.edit_neardup_pairs): hand mirrors, rule-boundary docs, and
direct DuckDB twin equality on in-memory corpora (the same twin SQL the
driver oracle will run when these are wired into queries())."""

from __future__ import annotations

import duckdb
import pytest

from audiopro_essentia_spark import duck_twins as DT
from audiopro_essentia_spark.functions.cleaning import (
    GOPHER_STOPWORDS,
    gopher_quality,
)
from audiopro_essentia_spark.operators.dedup import edit_neardup_pairs

GOPHER_DOCS = [
    # keep: 12 words, sane lengths, 2 stopwords, no symbols
    (0, "the cat sat on a mat and dogs ran far away today"),
    # word-count rule: 3 words
    (1, "the and cat"),
    # mean-word-length rule: > 10 chars/word (still 2 stopwords... no:
    # stopwords would drag the mean; keep it pure long words)
    (2, "extraordinarily incomprehensible " * 6),
    # hash-symbol rule: 1 '#' per word
    (3, "the# and# cat# dog# run# far# sit# now# red# big# old# new#"),
    # ellipsis-symbol rule
    (4, "the... and... cat... dog... run... far... sit... now..."),
    # bullet-line rule: every line starts with '-'
    (5, "- the cat\n- and dog\n- ran far\n- sat down\n- more list"),
    # ellipsis-line rule: every line ends '...'
    (6, "the cat ran...\nand the dog sat...\nmore text here..."),
    # alpha-word rule: mostly numbers
    (7, "the 123 456 789 012 345 678 901 234 567 and 890 123 456"),
    # stop-word rule: zero stopwords
    (8, "cats dogs run far sit now red big old new hot cold"),
    (9, None),
    (10, ""),
    (11, "   "),  # only empty words
]


def _mirror_gopher(doc_id, text, min_words, max_words):
    t = text if text is not None else ""
    ws = [w for w in t.split(" ") if w != ""]
    n_words = len(ws)
    mean_wl = round(sum(len(w) for w in ws) / n_words, 6) if n_words else 0.0
    n_hash = t.count("#")
    n_ell = (len(t) - len(t.replace("...", ""))) // 3
    lines = t.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if l[:1] in ("•", "-", "*"))
    n_ell_end = sum(1 for l in lines if l.endswith("..."))
    n_alpha = sum(1 for w in ws if any(c.isalpha() and c.isascii() for c in w))
    n_stop = sum(1 for s in GOPHER_STOPWORDS if s in ws)
    rw = lambda n: round(n / n_words, 6) if n_words else 0.0
    rl = lambda n: round(n / n_lines, 6)
    row = (
        doc_id,
        n_words,
        mean_wl,
        rw(n_hash),
        rw(n_ell),
        rl(n_bullet),
        rl(n_ell_end),
        rw(n_alpha),
        n_stop,
    )
    keep = int(
        min_words <= n_words <= max_words
        and 3.0 <= mean_wl <= 10.0
        and rw(n_hash) <= 0.1
        and rw(n_ell) <= 0.1
        and rl(n_bullet) <= 0.9
        and rl(n_ell_end) <= 0.3
        and rw(n_alpha) >= 0.8
        and n_stop >= 2
    )
    return row + (keep,)


def test_gopher_rules_hand_mirror(spark):
    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got = sorted(
        map(tuple, gopher_quality(df, min_words=5, max_words=100).collect())
    )
    want = sorted(
        _mirror_gopher(i, t, 5, 100) for i, t in GOPHER_DOCS
    )
    assert got == want
    by_id = {r[0]: r[-1] for r in got}
    # each constructed violation doc is rejected, the good doc survives
    assert by_id[0] == 1
    assert all(by_id[i] == 0 for i in range(1, 12))


def test_gopher_twin_matches_duckdb(spark):
    import pandas as pd

    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got = sorted(
        map(tuple, gopher_quality(df, min_words=5, max_words=100).collect())
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(GOPHER_DOCS, columns=["doc_id", "text"])
    )
    want = sorted(
        map(tuple, con.sql(DT.gopher_sql(min_words=5, max_words=100)).fetchall())
    )
    assert got == want


# A one-shingle change flips every simhash bit whose +/-1 sum sits within
# 2 of zero, so SHORT docs land well past hamming 3 (measured: 9 on a
# 10-shingle doc). This 40-word base was searched deterministically for
# tails whose single-shingle perturbations stay within the chunk-blocking
# recall bound (hamming 3) — the same reason the driver near-dup demos
# use perturbed twins, pinned here as literals.
_EDIT_BASE = " ".join(f"w0x{i:02d}" for i in range(40))
EDIT_DOCS = [
    # near-dup pair: one char edit in the last word (hamming 3, lev 1)
    (1, _EDIT_BASE + " ending"),
    (2, _EDIT_BASE + " endinG"),
    # candidate pair (hamming 3) but edit distance 6 — excluded at
    # max_dist 4
    (3, _EDIT_BASE + " AAAAAA"),
    (4, _EDIT_BASE + " BBBBBB"),
    # unrelated doc
    (5, "completely different text about entirely other topics here"),
    (6, None),
    (7, "one"),  # too short for a 2-gram shingle
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_neardup_finds_and_bounds(spark):
    df = spark.createDataFrame(EDIT_DOCS, "doc_id long, text string")
    rows = edit_neardup_pairs(df, max_dist=4).collect()
    got = {(r.id_a, r.id_b): r.edit_dist for r in rows}
    # the one-edit pair is found with the exact DP distance
    assert got.get((1, 2)) == _lev(EDIT_DOCS[0][1], EDIT_DOCS[1][1]) == 1
    # the distance-6 pair is candidate-blocked together but verify-excluded
    assert (3, 4) not in got
    assert _lev(EDIT_DOCS[2][1], EDIT_DOCS[3][1]) == 6
    # nothing pairs with the unrelated / NULL / sub-shingle docs
    assert all(5 not in p and 6 not in p and 7 not in p for p in got)
    # raising the bound admits the distance-6 pair with its true distance
    wide = {
        (r.id_a, r.id_b): r.edit_dist
        for r in edit_neardup_pairs(df, max_dist=8).collect()
    }
    assert wide.get((3, 4)) == 6


def test_edit_neardup_twin_matches_duckdb(spark):
    import pandas as pd

    df = spark.createDataFrame(EDIT_DOCS, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.hamming, r.edit_dist)
        for r in edit_neardup_pairs(df, max_dist=4).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(EDIT_DOCS, columns=["doc_id", "text"])
    )
    want = sorted(
        map(tuple, con.sql(DT.edit_neardup_sql(max_dist=4)).fetchall())
    )
    assert got == want


def test_edit_neardup_rejects_negative_bound(spark):
    df = spark.createDataFrame(EDIT_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_neardup_pairs(df, max_dist=-1)


def _fuzz_docs(n=200, seed=11):
    """Deterministic messy corpus: bullets, newlines, '#'/'...' runs,
    digit words, stopwords, doubled spaces, empties, NULLs — the
    twin-drift hazard surface for the staged r5 queries."""
    import random

    rng = random.Random(seed)
    vocab = (
        ["the", "be", "to", "of", "and", "that", "have", "with"]
        + [f"word{i}" for i in range(30)]
        + ["123", "9#9", "x...", "#", "...", "-", "•", "*", "a" * 15, ""]
    )
    docs = []
    for i in range(n):
        if i % 37 == 0:
            docs.append((i, None))
            continue
        k = rng.randint(0, 60)
        words = [rng.choice(vocab) for _ in range(k)]
        sep = lambda: rng.choice([" ", " ", " ", "  ", "\n", "\n- ", "\n• "])
        text = ""
        for j, w in enumerate(words):
            text += (sep() if j else "") + w
        if rng.random() < 0.3:
            text += rng.choice(["...", "\n...", " ..."])
        docs.append((i, text))
    return docs


def test_gopher_and_lq_twins_on_fuzz_corpus(spark):
    """Cross-engine equality on a deterministic fuzz corpus — the
    strongest drift pin for the staged twins (a python mirror would
    itself diverge on round-half ties; Spark vs DuckDB is the contract
    the driver oracle actually checks)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.sketch import (
        lq_quantiles,
        lq_registers,
    )

    docs = _fuzz_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con.register("documents", pdf)

    got_g = sorted(
        map(tuple, gopher_quality(df, min_words=5, max_words=100).collect())
    )
    want_g = sorted(
        map(
            tuple,
            con.sql(DT.gopher_sql(min_words=5, max_words=100)).fetchall(),
        )
    )
    assert got_g == want_g

    # lq twin groups by source — derive one from doc_id
    sourced = [
        (i, f"s{i % 4}" if i % 11 else None, t) for i, t in docs
    ]
    df2 = spark.createDataFrame(sourced, "doc_id long, source string, text string")
    con2 = duckdb.connect()
    con2.register(
        "documents",
        pd.DataFrame(sourced, columns=["doc_id", "source", "text"]),
    )
    v = F.size(nonempty_words(F.col("text"), null_as_empty=True))
    got_l = sorted(
        map(
            tuple,
            lq_quantiles(
                lq_registers(df2.withColumn("v", v), "v")
            ).collect(),
        )
    )
    want_l = sorted(
        map(tuple, con2.sql(DT.lq_quantiles_sql()).fetchall())
    )
    assert got_l == want_l


def test_edit_neardup_twin_on_fuzz_corpus(spark):
    import pandas as pd

    docs = [(i, t) for i, t in _fuzz_docs(n=60, seed=23)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.hamming, r.edit_dist)
        for r in edit_neardup_pairs(df, max_dist=12).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = sorted(
        map(tuple, con.sql(DT.edit_neardup_sql(max_dist=12)).fetchall())
    )
    assert got == want


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_staged_driver_entries_oracle_green(spark, sf_dir):
    """The three r5 window candidates run through the SAME compare
    harness the driver uses (tests/driver_compare.compare_one) against
    their staged oracles on the real fixture tables — r5 wiring moves
    these entries into queries()/oracle_sql() verbatim."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry_staged",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    E = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(E)
    from driver_compare import compare_one, duck_con

    qs = E._staged_queries()
    sqls = E._staged_oracle_sql()
    assert set(qs) == set(sqls)
    con = duck_con(sf_dir)
    bad = {}
    n_rows = {}
    for name, qfn in qs.items():
        problems, n = compare_one(spark, con, name, qfn, sqls[name], sf_dir)
        if problems:
            bad[name] = problems
        n_rows[name] = n
    assert bad == {}
    # non-vacuous: the gopher/lq demos cover every doc/source; the
    # edit-neardup perturbed twins must actually surface pairs
    assert n_rows["gopher_quality"] >= 50
    assert n_rows["lq_quantiles"] >= 3
    assert n_rows["edit_neardup"] >= 1
    # one row per distinct corpus shingle; build side is ~10k of them
    assert n_rows["bloom_membership"] >= 1000
    # every event lands in exactly its own session: rows == events
    assert n_rows["interval_join"] >= 500
    # one feature row per (non-NULL-ts) event
    assert n_rows["time_rolling"] >= 500
    # k=20 per source, 20 sources at every sf tier
    assert n_rows["priority_sample"] >= 100
    # one row per input doc, scrubbed or not
    assert n_rows["line_scrub"] >= 400
    # one row per user with a signup (15 users at sf0.001)
    assert n_rows["funnel"] >= 10
    # daily cohort grid over a 30-day event span
    assert n_rows["cohort_retention"] >= 25
    # one row per doc with >= 1 word
    assert n_rows["cdc_chunks"] >= 400
    # top-200 collocations (the sf0.001 corpus has plenty past count 5)
    assert n_rows["npmi"] == 200
    # every >=11-word perturbed twin is a J = m/(m+1) >= 0.9 pair
    assert n_rows["allpairs_jaccard"] >= 10
    # every superset twin contains its original at C = 1.0
    assert n_rows["containment"] >= 10
    # one verdict row per (source, check): 20 sources x 9 checks
    assert n_rows["dq_checks"] == 180
    # one CI row per source
    assert n_rows["boot_ci"] == 20
    # one CUSUM row per (event_type, day): 5 types x 30 days
    assert n_rows["cusum_drift"] == 150
    # one Welch row per user-id decile
    assert n_rows["ab_welch"] == 10
    # every event before Jan 20 is train in fold 2 at minimum
    assert n_rows["backtest"] >= 900
    # one Hill row per source
    assert n_rows["hill_tail"] == 20
    # one winsorized row per doc (row count preserved)
    assert n_rows["winsor_tokens"] >= 400
    # one interval per Jan-23+ event
    assert n_rows["conformal"] >= 200
    # 3 cohorts x day levels 0..3 with conversions
    assert n_rows["survival"] >= 6
    # one scored row per consecutive-id pair
    assert n_rows["fs_linkage"] >= 400
    # one Benford row per event type
    assert n_rows["benford"] == 5
    # one ATE row per user cohort
    assert n_rows["ate_effect"] == 5
    # one readability row per doc
    assert n_rows["readability"] >= 400
    # one z-key row per event with user+ts
    assert n_rows["zorder_key"] >= 900
    # one row per doc plus one per junk twin (doc_id % 7 == 0)
    assert n_rows["byte_entropy"] >= 550
    # one sketch row per source; one pair row per source pair
    assert n_rows["kmv_distinct"] == 20
    assert n_rows["kmv_jaccard"] == 190
