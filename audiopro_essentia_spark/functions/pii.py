"""PII detection + redaction for training-data curation.

Replaces emails, IPv4 addresses, and phone numbers with typed placeholder
tokens before the text enters a training corpus — the standard pre-training
scrub stage (reference has no text-PII stage; this is part of the
large-scale-pipeline surface the engine adds on top of the reference's
operator set, like functions/text.py).

All pure JVM expressions (`regexp_replace` / `regexp_count`, whole-stage
codegen, no Python) over regexes written in the common subset of Java
regex and RE2 so the DuckDB oracle runs the IDENTICAL patterns:

- no backreferences, no lookaround, no possessive quantifiers;
- `\\d`, `[...]`, `{m,n}`, `\\b` behave identically in both engines.

Scale: a narrow per-row map — no shuffle, pushdown-transparent. At 100 TB
this runs inside the same scan stage as any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: email first (contains digits/dots that the looser patterns could
# clip), then IPv4 (dotted digits — must precede phone so '10.0.3.7' is not
# half-eaten as a phone), then phone.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # +1 555-123-4567 / 555 987 6543 / (555) 123-4567 / 555.123.4567 /
    # 5551234567 — optional country code, then 3-3-4 with -, space, or
    # dot separators, area code optionally parenthesized; non-capturing
    # groups are in the Java∩RE2 common subset. Dots cannot collide with
    # IPv4 (redacted in the prior step) and 3-3-4 never matches a dotted
    # quad's 1-3 digit octets.
    (
        "phone",
        r"(?:\+?\d{1,3}[- ])?(?:\(\d{3}\)[- ]?|\d{3}[-. ]?)\d{3}[-. ]?\d{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(text: Column) -> Column:
    """Apply every PII pattern in order, substituting the typed
    placeholder. Deterministic: replacement order is fixed, so the output
    text (and its hash) is reproducible across engines."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (audit signal: how much PII a source
    emits drives source-level filtering decisions). Counted on the
    PROGRESSIVELY redacted text exactly like redact_pii substitutes, so a
    phone-like run inside an IP never double-counts."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def pii_sql_steps(x: str) -> str:
    """DuckDB expression applying the same ordered redaction to `x`
    (oracle twin; RE2 'g' flag == Java regexp_replace all-matches)."""
    expr = x
    for _, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted strings are literal (no backslash escapes),
        # so the Python pattern string passes through verbatim.
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def pii_count_sql(x: str) -> dict[str, str]:
    """DuckDB twins of pii_counts (len(regexp_extract_all) == regexp_count),
    on the same progressively-redacted text."""
    out: dict[str, str] = {}
    cur = x
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return out
