"""Text-analysis function surface for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Spark SQL expressions (whole-stage codegen, no Python) and all
deterministic + portable: each has an exact ANSI-SQL twin runnable by DuckDB
(the driver's correctness oracle). The portable 32-bit hash is
int(hex(md5(s)[:8])) — identical in Spark (`conv(substring(md5(x),1,8),16,10)`)
and DuckDB (`('0x'||substr(md5(x),1,8))::BIGINT`).

Scale notes: everything is a narrow map over the documents table; token
arrays are transient projections (Catalyst prunes them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "zu", "ist", "nicht", "ein", "mit", "von"),
    "fr": ("le", "la", "et", "de", "un", "est", "pas", "une", "pour", "que"),
}


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space split; portable with DuckDB
    string_split)."""
    return F.split(text, " ")


def nonempty_words(text: Column, null_as_empty: bool = False) -> Column:
    """filter(words(text), w != '') — THE nonempty tokenization predicate
    (doubled/leading/trailing spaces yield '' entries that must not count
    as words). One owner; hand-copies of this filter drifted across five
    modules before it existed. null_as_empty=True additionally coalesces
    NULL text to '' (an empty array instead of NULL)."""
    src = F.coalesce(text, F.lit("")) if null_as_empty else text
    return F.filter(words(src), lambda w: w != F.lit(""))


def token_lengths(text: Column) -> Column:
    """tokens := per-word character lengths — the deterministic, SQL-portable
    derivation of an array<int> payload from a text column (used by the
    driver harness where no physical tokens column exists)."""
    return F.transform(words(text), F.length)


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count: word-pieces of <=4 chars —
    sum(ceil(len(word)/4)) over whitespace words."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def portable_hash32(s: Column) -> Column:
    """First 8 hex chars of md5 as a BIGINT — identical in DuckDB."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def portable_hash32_hi(s: Column) -> Column:
    """Hex chars 9-16 of the SAME md5 as a BIGINT — a second independent
    32-bit hash for free (one digest, two halves; SimHash needs 64 bits)."""
    return F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")


def quality_metrics(text: Column) -> dict[str, Column]:
    """Document quality scoring: length, word stats, punctuation / stopword /
    digit ratios. The doc-quality analog of the reference's per-file quality
    metrics (silence ratio / clipping — metadata.py:73-77)."""
    n_chars = F.length(text).cast("double")
    ws = words(text)
    n_words = F.size(ws).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    ).cast("double")
    n_digit = (n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))).cast("double")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).cast("double")
    avg_word_len = F.coalesce(
        F.try_divide(
            F.aggregate(ws, F.lit(0.0), lambda a, w: a + F.length(w)), n_words
        ),
        F.lit(0.0),
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": avg_word_len,
        "punct_ratio": F.coalesce(F.try_divide(n_punct, n_chars), F.lit(0.0)),
        "digit_ratio": F.coalesce(F.try_divide(n_digit, n_chars), F.lit(0.0)),
        "stopword_ratio": F.coalesce(F.try_divide(n_stop, n_words), F.lit(0.0)),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and sane word
    length, penalizes punctuation/digit noise. Deterministic linear blend."""
    m = quality_metrics(text)
    word_len_ok = F.lit(1.0) - F.least(
        F.abs(m["avg_word_len"] - F.lit(5.0)) / F.lit(10.0), F.lit(1.0)
    )
    s = (
        F.lit(0.4) * F.least(m["stopword_ratio"] * F.lit(4.0), F.lit(1.0))
        + F.lit(0.3) * word_len_ok
        + F.lit(0.15) * (F.lit(1.0) - F.least(m["punct_ratio"] * 5.0, F.lit(1.0)))
        + F.lit(0.15) * (F.lit(1.0) - F.least(m["digit_ratio"] * 5.0, F.lit(1.0)))
    )
    return F.round(s, 6)


CLASSIFIER_DIM = 64  # hashed feature buckets (fasttext-style hashing trick)


def classifier_weights(dim: int = CLASSIFIER_DIM, seed: int = 7) -> list[float]:
    """Deterministic seeded weight vector for the hashed linear
    classifier — the stand-in for trained fasttext/logreg weights (no
    training data ships with the engine; swap in real weights at deploy
    time). Round-trip-exact f64 literals, shared with the DuckDB twin."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim) * 0.5]


def quality_classifier_score(
    text: Column,
    weights: list[float] | None = None,
    bias: float = 0.0,
) -> Column:
    """Fasttext-SHAPED document classifier, fully JVM-side: mean of
    hashed-bag-of-words bucket weights -> linear -> sigmoid. This is the
    architecture of the quality/domain classifiers every public corpus
    pipeline runs (CCNet/fasttext: hashing-trick features, linear model,
    probability out) expressed as ONE narrow Catalyst expression — no
    UDF, no shuffle, whole-stage codegen. Buckets via the engine's
    portable md5 hash, so the score has an exact DuckDB twin.

    score = sigmoid(bias + mean over words of W[h(w) mod dim])."""
    ws = F.filter(words(text), lambda x: x != "")
    w_arr = F.array(*[F.lit(w) for w in (weights or classifier_weights())])
    dim = len(weights) if weights else CLASSIFIER_DIM
    acc = F.aggregate(
        ws,
        F.lit(0.0),
        lambda a, x: a
        + F.element_at(w_arr, (F.pmod(portable_hash32(x), F.lit(dim)) + 1).cast("int")),
    )
    z = F.lit(bias) + F.coalesce(
        F.try_divide(acc, F.size(ws).cast("double")), F.lit(0.0)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword hit-rate per language — the n-gram-free language-ID
    heuristic. Deterministic, portable."""
    ws = words(text)
    n_words = F.size(ws).cast("double")
    out = {}
    for lang, stops in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in stops])
        hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).cast("double")
        out[lang] = F.coalesce(F.try_divide(hits, n_words), F.lit(0.0))
    return out


def lang_id(text: Column) -> Column:
    """argmax language; 'und' (undetermined) when all scores are zero.
    Deterministic tie-break by (score desc, lang DESC) — array_max on
    struct(score, lang) compares fields in order, so equal scores pick
    the lexicographically LAST language code. The direction is
    arbitrary for a heuristic tie; what matters (and what the DuckDB
    twin mirrors) is that it is total and deterministic."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(F.round(c, 9).alias("score"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, mod: int = 2_147_483_647, mult: int = 31) -> Column:
    """Order-sensitive rolling document fingerprint:
    fp = fold(words, 0, (acc, w) -> (acc*31 + H32(w)) mod p). Portable."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * F.lit(mult) + portable_hash32(w)) % F.lit(mod),
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) — dedup shingling."""
    ws = words(text)
    cnt = F.size(ws) - (n - 1)
    # sequence(1, 0) would DESCEND in Spark — emit an empty array instead
    grams = F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )
    )
    return F.array_distinct(grams)


def raw_word_ngrams(text: Column, n: int = 2) -> Column:
    """NON-distinct word n-grams, occurrence-preserving — repetition
    profiling needs the multiset (word_ngrams dedups for shingling)."""
    ws = words(text)
    cnt = F.size(ws) - (n - 1)
    return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )
    )


ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup: ASCII-fold case, strip punctuation,
    collapse whitespace runs, trim — the C4-style normalization that lets
    exact dedup catch case/punctuation variants.

    Case folding is deliberately ASCII-ONLY (translate A-Z -> a-z), not
    lower(): this string feeds a CONTENT-ADDRESSED KEY (md5 -> dedup
    group), and full Unicode casing is neither cross-engine- nor
    cross-version-stable — Java lowercases with context rules and
    expansions (final sigma 'ΟΔΟΣ' -> 'οδος', 'İ' -> 'i'+U+0307) while
    DuckDB/utf8proc applies per-code-point simple mappings ('İ' -> 'i',
    'Σ' -> 'σ' everywhere), and the Unicode casing tables themselves
    change between releases, so a full-cased key silently RE-KEYS an
    entire corpus after a JDK/ICU upgrade (found by the unicode parity
    sweep, tools_unicode_sweep.py: Spark and DuckDB grouped the Turkish-
    and Greek-cased docs differently). translate() is per-code-point in
    both engines, so the key is bit-stable by construction; non-Latin
    case variants intentionally do NOT merge — pre-fold upstream if your
    corpus needs ICU semantics. The \\s and punctuation classes are
    ASCII in both engines' regex dialects (Java default + RE2)."""
    t = F.translate(text, ASCII_UPPER, ASCII_LOWER)
    t = F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def chunk_documents(
    df,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """RAG-prep chunking: sliding word windows of `chunk_words` with
    `overlap` words shared between neighbors — the TEXT form of the
    engine's token framing (same explode+slice narrow plan, zero
    shuffle). Docs shorter than one chunk yield a single whole-doc chunk;
    a partial tail shorter than the overlap step is dropped (standard
    sliding-window semantics, mirrors frame_tokens).

    Output: (id, chunk_idx, chunk_text, n_chunk_words)."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    hop = chunk_words - overlap
    ws = words(F.col(text_col))
    n = F.size(ws)
    n_chunks = F.when(n <= chunk_words, F.lit(1)).otherwise(
        (n - chunk_words) / hop + 1
    ).cast("int")
    exploded = df.select(
        F.col(id_col),
        ws.alias("_ws"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_ws"), F.col("chunk_idx") * hop + 1, chunk_words)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_chunk_words"),
    )


# the ARI char-count strip set: space + the 32 ASCII punctuation
# chars (string.punctuation, written out so the set is pinned in
# source, not to a stdlib that could drift). Single source of truth
# for the operator, the DuckDB twin (escaped there) and the pytest
# mirror — per-code-point translate is exact on all three engines.
ARI_STRIP = " " + "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def readability_metrics(text: Column) -> dict[str, Column]:
    """Exact-integer readability features for corpus filtering
    (educational-value / complexity gates): ARI (Automated Readability
    Index, Senter & Smith 1967 — chosen over Flesch because it needs
    NO syllable heuristic: every input is an exact integer count),
    plus the raw counts.

        ARI = 4.71 * chars/words + 0.5 * words/sentences - 21.43

    chars = characters excluding spaces AND ASCII punctuation
    (ARI_STRIP): Senter & Smith define the count over letters and
    digits, so punctuation must not inflate it (ADVICE r4 — the old
    all-non-space count overstated ARI on punctuation-heavy docs).
    Stripping is a per-code-point translate — the only mechanism
    BOTH engines apply identically (regex Unicode-letter classes
    track different Unicode versions across Java/RE2). Documented residual
    deviation: non-ASCII punctuation/symbols still count as chars
    (multibyte letters MUST count, and no portable class separates
    them). sentences = number of MAXIMAL runs of [.!?] (regexp_count;
    the '[.!?]+' pattern sits in the Java/RE2 common subset), floored
    at 1 so a fragment without terminal punctuation reads as one
    sentence (never a /0 — ANSI raises). NULL text counts as empty.
    Docs with zero words give NULL ari.

    Exactness: both ratios are single correctly-rounded IEEE divisions
    of exact BIGINT counts, combined in one fixed expression order +
    round-6 — bit-stable cross-engine."""
    ws = nonempty_words(text, null_as_empty=True)
    n_words = F.size(ws).cast("long")
    # letters+digits(+non-ASCII) = length with separators and ASCII
    # punctuation removed — NEVER aggregate() over the built array:
    # the lambda re-inlines the split per element
    # (the CLAUDE.md array-build re-inline hazard, O(words^2))
    n_chars = F.length(
        F.translate(F.coalesce(text, F.lit("")), ARI_STRIP, "")
    ).cast("long")
    n_sent = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(F.coalesce(text, F.lit("")), F.lit(r"[.!?]+")).cast(
            "long"
        ),
    )
    # round-6 via the scale-0 micro recipe, NOT F.round(x, 6): ARI's
    # rational inputs land on exact decimal halves (measured:
    # 4.71*294/64 + 32 - 21.43 = 32.2065625 — Spark HALF_UP rounds
    # ...63, DuckDB half-even ...62); round() to INTEGER ties away
    # from zero in BOTH engines (the SAMPLE_KEY recipe)
    raw = (
        F.lit(4.71) * (n_chars.cast("double") / n_words.cast("double"))
        + F.lit(0.5) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(21.43)
    )
    ari = F.when(
        n_words > 0,
        F.round(raw * F.lit(1e6)).cast("long").cast("double")
        / F.lit(1e6),
    )
    return {
        "n_words": n_words,
        "n_letter_chars": n_chars,
        "n_sentences": n_sent,
        "ari": ari,
    }
