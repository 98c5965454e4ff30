"""C4-style line-level corpus cleaning (Raffel et al. 2020, JMLR — the
public C4 pipeline rules), expressed as pure Catalyst expressions.

Rules implemented (each a narrow JVM expression, no Python, no shuffle):
  line level — keep a line iff it has >= `min_words_per_line` whitespace
    words, ends in a terminal punctuation mark (. ! ? "), and does not
    mention 'javascript' (case-insensitive);
  document level — keep a document iff >= `min_kept_lines` lines survive,
    and the raw text contains neither 'lorem ipsum' (case-insensitive)
    nor a curly brace '{'.

This is the text-corpus analog of the reference's per-file validation
gates (reference: src/audiopro/audio/audio_loader.py:40-58 rejects
files failing load-time integrity checks before any feature work): both
drop malformed payload early, before the expensive pipeline stages.

Scale notes: the whole operator is one whole-stage-codegen projection
over the documents scan — filters compose with Catalyst pushdown, and
`keep` is a plain boolean column so a downstream `.filter("keep")`
prunes before any shuffle. Every rule has an exact DuckDB twin
(string_split / list_filter / array_to_string).

The corpus fixtures are single-line word soup with no punctuation, so
the driver demo first derives a deterministic lined corpus with
`synthesize_lines` (10-word chunks; a chunk gets terminal punctuation
iff the portable md5 hash of its raw text is nonzero mod 3) and injects
lorem/brace contamination keyed on doc_id — the same perturbed-twin
pattern the near-dup demos use, constructed identically in the oracle.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from audiopro_essentia_spark.functions.text import (
    nonempty_words,
    portable_hash32,
)

TERMINAL_PUNCT = (".", "!", "?", '"')


def synthesize_lines(text: Column, words_per_line: int = 10) -> Column:
    """Deterministically re-shape single-line word-soup text into a
    multi-line document: consecutive `words_per_line`-word chunks become
    lines, and a chunk receives a trailing '.' iff
    portable_hash32(chunk) % 3 != 0 (so ~2/3 of lines end in terminal
    punctuation). Pure expressions, exact DuckDB twin."""
    ws = nonempty_words(text, null_as_empty=True)
    n_lines = F.ceil(F.size(ws) / F.lit(float(words_per_line))).cast("int")
    raw = lambda i: F.concat_ws(
        " ", F.slice(ws, (i - F.lit(1)) * words_per_line + F.lit(1), words_per_line)
    )
    line = lambda i: F.concat(
        raw(i),
        F.when(F.pmod(portable_hash32(raw(i)), F.lit(3)) != 0, F.lit(".")).otherwise(
            F.lit("")
        ),
    )
    return F.when(n_lines < 1, F.lit("")).otherwise(
        F.array_join(F.transform(F.sequence(F.lit(1), F.greatest(n_lines, F.lit(1))), line), "\n")
    )


def c4_line_keep(line: Column, min_words_per_line: int = 5) -> Column:
    """The C4 per-line predicate (see module docstring)."""
    n_words = F.size(nonempty_words(line))
    last = F.substring(line, -1, 1)
    return (
        (n_words >= min_words_per_line)
        & last.isin(*TERMINAL_PUNCT)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """(id, n_lines, n_kept_lines, keep, clean_text): C4 line filtering +
    document gates. `clean_text` is the surviving lines re-joined with
    newlines ('' when none survive); `keep` is the document-level verdict."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda l: c4_line_keep(l, min_words_per_line))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        (
            (F.size(kept) >= min_kept_lines) & ~has_lorem & ~has_brace
        ).cast("int").alias("keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
