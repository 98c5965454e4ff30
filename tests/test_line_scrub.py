"""line_scrub — CCNet/C4 corpus-frequency line (paragraph) scrubbing:
non-empty lines in >= min_doc_freq DISTINCT docs are removed everywhere.
Hand-mirror semantics, edge contracts, the one-shuffle plan pin, and
direct DuckDB-twin equality."""

import duckdb
import pandas as pd
import pytest

from audiopro_essentia_spark.duck_twins import line_scrub_sql
from audiopro_essentia_spark.operators.dedup import line_scrub

ROWS = [
    (1, "unique content one\nsubscribe now\nmore unique text"),
    (2, "different stuff\nsubscribe now\n\nanother line"),
    (3, "subscribe now\nsubscribe now\nbody three"),  # within-doc dup: df += 1
    (4, None),                # NULL text -> one empty line, untouched
    (5, ""),                  # empty text likewise
    (6, "subscribe now"),     # all lines scrubbed -> ''
    (7, "keep me\nkeep me"),  # within-doc dup alone: doc-freq 1, kept
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_mirror_semantics(spark):
    got = {
        r.doc_id: (r.n_lines, r.n_scrubbed, r.text_clean)
        for r in line_scrub(_df(spark), min_doc_freq=3).collect()
    }
    assert got == {
        1: (3, 1, "unique content one\nmore unique text"),
        2: (4, 1, "different stuff\n\nanother line"),
        3: (3, 2, "body three"),
        4: (1, 0, ""),
        5: (1, 0, ""),
        6: (1, 1, ""),
        7: (2, 0, "keep me\nkeep me"),
    }


def test_empty_lines_never_scrubbed(spark):
    """'' separates paragraphs in most docs — it must never count as a
    frequent line, however many docs contain it."""
    rows = [(i, "a unique line %d\n\nand more %d" % (i, i)) for i in range(10)]
    out = line_scrub(_df(spark, rows), min_doc_freq=2).collect()
    assert all(r.n_scrubbed == 0 for r in out)
    assert all("\n\n" in r.text_clean for r in out)


def test_untouched_docs_roundtrip_exactly(spark):
    """split + rejoin must be lossless: a doc with no frequent line
    comes back byte-identical (trailing newline, empty lines, spacing)."""
    rows = [(1, "alpha\n\nbeta  two\n"), (2, "wholly different text")]
    got = {r.doc_id: r.text_clean
           for r in line_scrub(_df(spark, rows), min_doc_freq=2).collect()}
    assert got[1] == "alpha\n\nbeta  two\n" and got[2] == "wholly different text"


def test_guard(spark):
    with pytest.raises(ValueError, match="min_doc_freq"):
        line_scrub(_df(spark), min_doc_freq=1)


def test_twin_matches_duckdb(spark):
    out = (
        line_scrub(_df(spark), min_doc_freq=3)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    dd = con.execute(line_scrub_sql(min_doc_freq=3) + " ORDER BY doc_id").fetchdf()
    assert out.equals(dd.astype(out.dtypes))


def test_plan_one_line_key_shuffle(spark):
    """Scale pin: ONE corpus-scale shuffle on the line key serves both
    the per-(doc,line) aggregate and the doc-frequency window
    (HashPartitioning(h,h2) satisfies the (doc,h,h2) clustering by the
    subset rule) — total 3 exchanges (line key, sparse mask groupBy,
    base join side), zero Python."""
    plan = (
        line_scrub(_df(spark), min_doc_freq=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 3, plan
    assert plan.count("hashpartitioning(h#") == 1, plan
    assert "Python" not in plan
