"""readability_metrics (functions/text.py): ARI — Python-mirror from
the definition, hand cases (known counts, fragment floors at 1
sentence, NULL/empty/whitespace contracts), unicode chars, twin
equality, zero-Exchange plan pin."""

from __future__ import annotations

import contextlib
import io
import math
import re

import duckdb
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import readability_sql
from audiopro_essentia_spark.functions.text import (
    ARI_STRIP,
    readability_metrics,
)

_STRIP_TBL = str.maketrans("", "", ARI_STRIP)


def _mirror(text):
    t = text or ""
    ws = [w for w in t.split(" ") if w != ""]
    n_words = len(ws)
    # ARI counts letters+digits: spaces AND ASCII punctuation stripped
    n_chars = len(t.translate(_STRIP_TBL))
    n_sent = max(1, len(re.findall(r"[.!?]+", t)))
    if n_words:
        raw = (4.71 * (n_chars / n_words) + 0.5 * (n_words / n_sent)
               - 21.43) * 1e6
        # scale-0 half-AWAY (the engines' round() semantics)
        m = math.floor(raw + 0.5) if raw >= 0 else math.ceil(raw - 0.5)
        ari = m / 1e6
    else:
        ari = None
    return (n_words, n_chars, n_sent, ari)


DOCS = [
    (0, "The cat sat. The dog ran! Did it rain?"),
    (1, "no terminal punctuation at all"),
    (2, "Ellipsis... counts as one run. Really?!  Yes."),
    (3, None),
    (4, ""),
    (5, "   "),
    (6, "Ünïcödé wörds. Zähl die Zeichen!"),
    (7, "one.two.three. runs?!?!"),
]


def _apply(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    m = readability_metrics(F.col("text"))
    return {
        r["doc_id"]: (r["w"], r["c"], r["s"], r["a"])
        for r in df.select(
            "doc_id",
            m["n_words"].alias("w"),
            m["n_letter_chars"].alias("c"),
            m["n_sentences"].alias("s"),
            m["ari"].alias("a"),
        ).collect()
    }


def test_mirror_and_hand_cases(spark):
    got = _apply(spark, DOCS)
    for i, t in DOCS:
        assert got[i] == _mirror(t), (i, t)
    # hand counts on doc 0: 9 words, 27 letter chars (the three
    # sentence terminators no longer count — ARI is letters+digits),
    # 3 sentences
    assert got[0][:3] == (9, 27, 3)
    # punctuation-only "word" contributes words but ZERO chars now
    got_p = _apply(spark, [(0, "a -- b")])
    assert got_p[0][:2] == (3, 2)
    # fragments floor at ONE sentence (never a /0)
    assert got[1][2] == 1
    # '...' and '?!' are each ONE maximal run: '...', '.', '?!', '.'
    assert got[2][2] == 4
    # three separate '.' runs + one '?!?!' run
    assert got[7][2] == 4
    # NULL/empty/whitespace: zero words -> NULL ari
    for i in (3, 4, 5):
        assert got[i][0] == 0 and got[i][3] is None


def test_twin_equality(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(readability_sql("documents")).fetchall()
    }
    got = _apply(spark, DOCS)
    # the twin filters doc_id IS NOT NULL only; all DOCS ids non-null
    assert got == want


def test_plan_pins(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    m = readability_metrics(F.col("text"))
    out = df.select("doc_id", m["ari"].alias("ari"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue().split("Initial Plan")[0]
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
