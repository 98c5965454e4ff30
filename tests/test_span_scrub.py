"""span_scrub — exact duplicate-span removal (word-granular Lee et al.
2022 re-spec). Hand goldens; the driver's DuckDB twin re-verifies at
sf0.01 (span_scrub)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.operators.dedup import span_scrub  # noqa: E402


def _run(spark, rows, n=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in span_scrub(df, n=n).collect()}


def test_cross_doc_duplicate_span_removed_from_non_canonical(spark):
    rows = [
        (1, "a b c d e f g h x y"),   # canonical owner of span 'a..h'
        (2, "a b c d e f g h q r"),   # non-canonical: words 1-8 masked
    ]
    out = _run(spark, rows)
    assert out[1]["n_masked"] == 0
    assert out[1]["scrub_text"] == "a b c d e f g h x y"
    assert out[2]["n_words"] == 10 and out[2]["n_masked"] == 8
    assert out[2]["scrub_text"] == "q r"


def test_self_repeat_keeps_first_occurrence(spark):
    rows = [(3, "p q r s t u v w p q r s t u v w")]
    out = _run(spark, rows)
    assert out[3]["n_words"] == 16 and out[3]["n_masked"] == 8
    assert out[3]["scrub_text"] == "p q r s t u v w"


def test_overlapping_duplicate_spans_mask_their_union(spark):
    # doc 5 copies a 9-word run from doc 4 -> two overlapping dup spans
    # (pos 1 and pos 2); the mask is the union [1, 10), i.e. all 9 words
    rows = [
        (4, "a b c d e f g h i j k"),
        (5, "a b c d e f g h i z1 z2"),
    ]
    out = _run(spark, rows)
    assert out[4]["n_masked"] == 0
    assert out[5]["n_masked"] == 9
    assert out[5]["scrub_text"] == "z1 z2"


def test_short_empty_and_null_docs_pass_through(spark):
    rows = [(6, "x y z"), (7, ""), (8, None)]
    out = _run(spark, rows)
    assert out[6]["n_words"] == 3 and out[6]["n_masked"] == 0
    assert out[6]["scrub_text"] == "x y z"
    for i in (7, 8):
        assert out[i]["n_words"] == 0 and out[i]["n_masked"] == 0
        assert out[i]["scrub_text"] == ""


def test_canonical_is_lexicographic_min_doc_then_pos(spark):
    # the span appears at (10, pos 3) and (2, pos 5): doc 2 wins even
    # though its occurrence starts later in its text
    rows = [
        (10, "f1 f2 a b c d e f g h t1"),
        (2, "g1 g2 g3 g4 a b c d e f g h"),
    ]
    out = _run(spark, rows)
    assert out[2]["n_masked"] == 0
    assert out[10]["n_masked"] == 8
    assert out[10]["scrub_text"] == "f1 f2 t1"


# ---------------------------------------------------------------------------
# property test vs a brute-force python mirror
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _mirror(docs: dict, n: int) -> dict:
    """Brute-force python spec of span_scrub (1-based positions)."""
    words = {d: [w for w in (t or "").split(" ") if w] for d, t in docs.items()}
    occ = {}  # span -> list[(doc, pos)]
    for d in sorted(words):
        ws = words[d]
        for p in range(1, len(ws) - n + 2):
            occ.setdefault(tuple(ws[p - 1 : p - 1 + n]), []).append((d, p))
    masked = {d: set() for d in words}
    for places in occ.values():
        if len(places) < 2:
            continue
        canon = min(places)
        for d, p in places:
            if (d, p) != canon:
                masked[d].update(range(p, p + n))
    out = {}
    for d, ws in words.items():
        keep = [w for i, w in enumerate(ws, start=1) if i not in masked[d]]
        out[d] = (len(ws), len(ws) - len(keep), " ".join(keep))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=12),
        min_size=1,
        max_size=7,
    )
)
def test_span_scrub_matches_brute_force_mirror(spark, doc_words):
    n = 3
    docs = {i: " ".join(ws) for i, ws in enumerate(doc_words)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_scrub(df, n=n).collect()}
    exp = _mirror(docs, n)
    assert set(got) == set(exp)
    for d, (nw, nm, txt) in exp.items():
        assert (got[d]["n_words"], got[d]["n_masked"], got[d]["scrub_text"]) == (
            nw, nm, txt,
        ), f"doc {d}"
