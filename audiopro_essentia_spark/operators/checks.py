"""Declarative data-quality constraint suite (Deequ-style).

The generalization of the reference engine's validation tier (source /
signal gates before compute — reference src/audiopro/audio/
audio_loader.py:61-104 validates inputs field-by-field before the
pipeline touches them) to the declarative per-column constraint
verification every production ingest runs at corpus scale (the AWS
Deequ / Great Expectations shape): a list of named checks compiles into
ONE shared map-side-combinable aggregate pass over the corpus (plus one
bounded value-frequency pass per uniqueness/distinctness COLUMN),
emitting a long-format verdict table — (group..., check_name, column,
kind, n, num, den, metric, threshold, passed).

Exactness contract (the weight_diagnostics discipline): numeric values
micro-quantize ONCE (round(v * 1e6) — half-away in both engines);
fraction metrics are ONE correctly-rounded division of exact BIGINTs +
round-6; every PASS/FAIL verdict is an EXACT integer comparison
(1e6 * num >= t_micro * den for fractions, min/max micros vs the
micro-quantized bound, exact DECIMAL(38,0)/HUGEINT sum vs bound * den
for means) — bit-stable cross-engine, never a float threshold test.
thresholds and bounds must be multiples of 1e-6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FRAC_KINDS = (
    "completeness",
    "uniqueness",
    "distinctness",
    "pattern",
    "in_set",
)
BOUND_KINDS = ("min_ge", "max_le", "mean_ge", "mean_le")
VALUE_KINDS = ("uniqueness", "distinctness")

_D38 = "decimal(38,0)"


def _micro(x: float, what: str) -> int:
    u = round(x * 1e6)
    if abs(x * 1e6 - u) > 1e-6:
        raise ValueError(f"{what} must be a multiple of 1e-6, got {x!r}")
    return u


def _validate(checks, schema) -> list[dict]:
    if not checks:
        raise ValueError("quality_checks: empty check list")
    by_name = {}
    fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    numeric = ("int", "bigint", "smallint", "tinyint", "float", "double")
    out = []
    for c in checks:
        name = c.get("name")
        col = c.get("column")
        kind = c.get("kind")
        if not name or name in by_name:
            raise ValueError(f"quality_checks: missing/duplicate name {name!r}")
        by_name[name] = True
        if col not in fields:
            raise ValueError(f"quality_checks[{name}]: unknown column {col!r}")
        if kind not in FRAC_KINDS + BOUND_KINDS:
            raise ValueError(f"quality_checks[{name}]: unknown kind {kind!r}")
        spec = {"name": name, "column": col, "kind": kind}
        if kind in FRAC_KINDS:
            t = c.get("threshold")
            if t is None or not (0.0 <= t <= 1.0):
                raise ValueError(
                    f"quality_checks[{name}]: threshold must be in [0, 1]"
                )
            spec["t_micro"] = _micro(float(t), f"quality_checks[{name}] threshold")
        else:
            b = c.get("bound")
            if b is None:
                raise ValueError(f"quality_checks[{name}]: bound required")
            spec["b_micro"] = _micro(float(b), f"quality_checks[{name}] bound")
        if kind in BOUND_KINDS and fields[col] not in numeric:
            raise ValueError(
                f"quality_checks[{name}]: {kind} needs a numeric column,"
                f" {col} is {fields[col]}"
            )
        if kind == "pattern":
            p = c.get("pattern")
            if not p or not isinstance(p, str):
                raise ValueError(f"quality_checks[{name}]: pattern required")
            if fields[col] != "string":
                raise ValueError(
                    f"quality_checks[{name}]: pattern needs a string column"
                )
            spec["pattern"] = p
        if kind == "in_set":
            vals = c.get("values")
            if not vals or not all(isinstance(v, str) for v in vals):
                raise ValueError(
                    f"quality_checks[{name}]: values must be non-empty strings"
                )
            if fields[col] != "string":
                raise ValueError(
                    f"quality_checks[{name}]: in_set needs a string column"
                    f" (numeric-vs-string IN casting is not cross-engine"
                    f" portable)"
                )
            spec["values"] = list(vals)
        out.append(spec)
    return out


def _nan_loud(col: str) -> Column:
    v = F.col(col).cast("double")
    return F.when(
        F.isnan(v),
        F.raise_error(F.lit(f"quality_checks: NaN {col}")).cast("long"),
    ).otherwise(F.round(v * 1_000_000).cast("long"))


def _verdict_struct(
    name: str,
    col: str,
    kind: str,
    num: Column,
    den: Column,
    metric: Column,
    threshold: float,
    passed: Column,
) -> Column:
    return F.struct(
        F.lit(name).alias("check_name"),
        F.lit(col).alias("column"),
        F.lit(kind).alias("kind"),
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        metric.cast("double").alias("metric"),
        F.lit(threshold).cast("double").alias("threshold"),
        passed.cast("long").alias("passed"),
    )


def _frac_verdict(num: Column, den: Column, t_micro: int):
    metric = F.when(
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    )
    passed = F.when(
        den > 0,
        (
            num.cast(_D38) * F.lit(1_000_000).cast(_D38)
            >= F.lit(t_micro).cast(_D38) * den.cast(_D38)
        ).cast("long"),
    )
    return metric, passed


def quality_checks(
    df: DataFrame,
    checks: list[dict],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Verify a declared constraint suite per group; one verdict row per
    (group, check). Kinds (all verdicts exact-integer, see module doc):

    - completeness: non-NULL fraction of `column` >= threshold
      (denominator = group rows; NaN counts as PRESENT — NULLness is
      what this kind measures).
    - uniqueness: fraction of non-NULL rows whose value occurs EXACTLY
      once in the group >= threshold (Deequ's definition; 1.0 == the
      column is a key among non-NULL rows).
    - distinctness: distinct non-NULL values / non-NULL rows >=
      threshold.
    - min_ge / max_le: group min/max of the micro-quantized value vs
      the micro-quantized bound (NULLs skipped — completeness is the
      NULL check; NaN fails LOUD, its ordering is not portable).
    - mean_ge / mean_le: exact micro-unit sum vs bound * count —
      DECIMAL(38,0)/HUGEINT, never a float mean compare.
    - pattern: FULL-string regex match fraction among non-NULL rows >=
      threshold. Spark anchors `^(?:p)$`; the twin uses DuckDB
      regexp_full_match — keep p inside the Java/RE2 common subset
      (literals, classes, quantifiers, alternation; no backrefs).
    - in_set: fraction of non-NULL rows whose value (string columns
      only — numeric-vs-string IN casting is not cross-engine
      portable) is in the declared list >= threshold.

    passed is 1/0, or NULL when the check's denominator is 0 (no
    evidence either way — e.g. a pattern check on an all-NULL group).
    Empty input (or an empty group — impossible by construction)
    yields zero rows.

    Scale shape: every completeness/bound/pattern/in_set check rides
    ONE shared map-side-combinable groupBy(group) corpus pass;
    each uniqueness/distinctness COLUMN adds one map-side-combinable
    groupBy(group, value) corpus pass whose downstream is bounded by
    group cardinality. Zero windows, zero Python, zero corpus-scale
    joins (the uniqueness join-back is group-cardinality x
    group-cardinality)."""
    g = list(group_cols or [])
    specs = _validate(checks, df.schema)
    shared = [s for s in specs if s["kind"] not in VALUE_KINDS]
    valued = [s for s in specs if s["kind"] in VALUE_KINDS]

    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, s in enumerate(shared):
        c, kind = s["column"], s["kind"]
        if kind == "completeness":
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"_num{i}")
            )
        elif kind == "pattern":
            anchored = f"^(?:{s['pattern']})$"
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & F.col(c).rlike(anchored), 1
                    )
                    .otherwise(0)
                    .cast("long")
                ).alias(f"_num{i}")
            )
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"_den{i}")
            )
        elif kind == "in_set":
            aggs.append(
                F.sum(
                    F.when(F.col(c).isin(s["values"]), 1)
                    .otherwise(0)
                    .cast("long")
                ).alias(f"_num{i}")
            )
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"_den{i}")
            )
        elif kind in ("min_ge", "max_le"):
            fn = F.min if kind == "min_ge" else F.max
            aggs.append(fn(_nan_loud(c)).alias(f"_ext{i}"))
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"_den{i}")
            )
        else:  # mean_ge / mean_le
            aggs.append(F.sum(_nan_loud(c).cast(_D38)).alias(f"_sum{i}"))
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"_den{i}")
            )
    base = df.groupBy(*g).agg(*aggs)

    structs = []
    for i, s in enumerate(shared):
        kind, t = s["kind"], None
        if kind == "completeness":
            t = s["t_micro"]
            num, den = F.col(f"_num{i}"), F.col("n")
            metric, passed = _frac_verdict(num, den, t)
        elif kind in ("pattern", "in_set"):
            t = s["t_micro"]
            num, den = F.col(f"_num{i}"), F.col(f"_den{i}")
            metric, passed = _frac_verdict(num, den, t)
        elif kind in ("min_ge", "max_le"):
            b = s["b_micro"]
            num, den = F.lit(None).cast("long"), F.col(f"_den{i}")
            ext = F.col(f"_ext{i}")
            metric = F.round(ext.cast("double") / 1e6, 6)
            ok = ext >= F.lit(b) if kind == "min_ge" else ext <= F.lit(b)
            passed = F.when(den > 0, ok.cast("long"))
            t = b
        else:  # mean_ge / mean_le
            b = s["b_micro"]
            num, den = F.lit(None).cast("long"), F.col(f"_den{i}")
            sm = F.col(f"_sum{i}")
            metric = F.when(
                den > 0,
                F.round(
                    sm.cast("double") / (den * F.lit(1_000_000)).cast("double"),
                    6,
                ),
            )
            bound_side = F.lit(b).cast(_D38) * den.cast(_D38)
            ok = sm >= bound_side if kind == "mean_ge" else sm <= bound_side
            passed = F.when(den > 0, ok.cast("long"))
            t = b
        structs.append(
            _verdict_struct(
                s["name"], s["column"], kind, num, den, metric,
                round(t / 1e6, 6), passed,
            )
        )

    parts = []
    if structs:
        parts.append(
            base.where(F.col("n") > 0).select(
                *g,
                F.col("n"),
                F.explode(F.array(*structs)).alias("_v"),
            )
        )

    n_tab = base.select(*g, "n")
    for col in sorted({s["column"] for s in valued}):
        per = (
            df.where(F.col(col).isNotNull())
            .groupBy(*g, col)
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        ua = per.groupBy(*g).agg(
            F.sum((F.col("_c") == 1).cast("long")).cast("long").alias("_singles"),
            F.count(F.lit(1)).cast("long").alias("_dst"),
            F.sum("_c").cast("long").alias("_nn"),
        )
        # LEFT join from the group spine: an all-NULL group still gets
        # its verdict row (den = 0, passed = NULL), never a silent drop
        joined = (
            n_tab.join(ua, on=g, how="left")
            if g
            else n_tab.crossJoin(F.broadcast(ua))
        )
        nn = F.coalesce(F.col("_nn"), F.lit(0)).cast("long")
        col_structs = []
        for s in valued:
            if s["column"] != col:
                continue
            num = F.coalesce(
                F.col("_singles")
                if s["kind"] == "uniqueness"
                else F.col("_dst"),
                F.lit(0),
            ).cast("long")
            metric, passed = _frac_verdict(num, nn, s["t_micro"])
            col_structs.append(
                _verdict_struct(
                    s["name"], col, s["kind"], num, nn, metric,
                    round(s["t_micro"] / 1e6, 6), passed,
                )
            )
        parts.append(
            joined.where(F.col("n") > 0).select(
                *g,
                F.col("n"),
                F.explode(F.array(*col_structs)).alias("_v"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        *g,
        F.col("_v.check_name").alias("check_name"),
        F.col("_v.column").alias("column"),
        F.col("_v.kind").alias("kind"),
        F.col("n"),
        F.col("_v.num").alias("num"),
        F.col("_v.den").alias("den"),
        F.col("_v.metric").alias("metric"),
        F.col("_v.threshold").alias("threshold"),
        F.col("_v.passed").alias("passed"),
    )


def benford_test(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., n, d1..d9 observed fractions, chi2, mad, conformity)
    — first-significant-digit conformity against Benford's law
    (Newcomb 1881 / Benford 1938: P(d) = log10(1 + 1/d)), the
    data-forensics screen for fabricated, unit-mixed, or truncated
    numeric columns (organically-grown magnitudes follow it; invented
    or clipped ones don't). chi2 is Pearson's statistic over the 9
    digit cells; `mad` is Nigrini's mean absolute deviation of the
    digit fractions with his published conformity bands (close <
    0.006, acceptable < 0.012, marginal < 0.015, else nonconforming —
    compared as exact integer micro thresholds on the rounded value).

    Exactness: the first significant digit is extracted from the
    STRING rendering of the micro-quantized BIGINT (both engines
    render integers identically — no log10 float extraction, whose
    floor flickers at exact powers of ten); values must be POSITIVE
    and >= 1e-6 (micro >= 1, so the leading character IS the leading
    significant digit) — NULL/NaN/non-positive fail LOUD. Expected
    probabilities are driver-side micro literals; chi2/mad are
    evaluated on doubles built from exact integer counts in one fixed
    expression order + round-6. Groups with n = 0 cannot occur; all
    nine digit columns are emitted (0.0 when absent).

    Scale shape: ONE map-side-combinable groupBy(group, digit) corpus
    pass onto the bounded groups x 9 table. Zero windows, zero joins,
    zero Python."""
    g = list(group_cols or [])
    v0 = F.col(value_col).cast("double")
    m = (
        F.when(
            v0.isNull() | F.isnan(v0) | (v0 <= 0)
            | (F.round(v0 * 1_000_000) < 1),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"benford_test: NULL/NaN/non-positive {value_col}="
                    ),
                    F.coalesce(v0.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(F.round(v0 * 1_000_000).cast("long"))
        .alias("_m")
    )
    digit = F.substring(F.col("_m").cast("string"), 1, 1).alias("_d")
    per = (
        df.select(*g, m)
        .select(*g, digit)
        .groupBy(*g, "_d")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    import math

    probs = {str(d): math.log10(1 + 1 / d) for d in range(1, 10)}
    aggs = [F.sum("_c").cast("long").alias("n")]
    for d in range(1, 10):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("_d") == str(d), F.col("_c"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"_c{d}")
        )
    # empty-global-frame contract: groupBy().agg yields one NULL-n row
    agg = per.groupBy(*g).agg(*aggs).where(F.col("n").isNotNull())
    n = F.col("n").cast("double")
    chi2 = None
    mad = None
    outs = []
    for d in range(1, 10):
        p = probs[str(d)]
        c = F.col(f"_c{d}").cast("double")
        outs.append(F.round(c / n, 6).alias(f"d{d}"))
        term = (c - n * F.lit(p)) * (c - n * F.lit(p)) / (n * F.lit(p))
        dev = F.abs(c / n - F.lit(p))
        chi2 = term if chi2 is None else chi2 + term
        mad = dev if mad is None else mad + dev
    mad_r = F.round(mad / F.lit(9.0), 6)
    return agg.select(
        *g,
        "n",
        *outs,
        F.round(chi2, 6).alias("chi2"),
        mad_r.alias("mad"),
        F.when(
            F.round(mad_r * F.lit(1e6)).cast("long") < 6000, F.lit("close")
        )
        .when(
            F.round(mad_r * F.lit(1e6)).cast("long") < 12000,
            F.lit("acceptable"),
        )
        .when(
            F.round(mad_r * F.lit(1e6)).cast("long") < 15000,
            F.lit("marginal"),
        )
        .otherwise(F.lit("nonconforming"))
        .alias("conformity"),
    )


def dp_geometric_thresholds(epsilon: float) -> tuple[int, list[int]]:
    """(K, thresholds) for dp_counts' truncated two-sided geometric
    noise — the SINGLE source both the operator and its DuckDB twin
    render from (the fs_link_scores literal-desync rule). The
    two-sided geometric ("discrete Laplace") law P(k) proportional to
    alpha^|k| with alpha = exp(-epsilon) is the integer-valued
    epsilon-DP mechanism for sensitivity-1 counts (Ghosh, Roughgarden
    & Sundararajan 2009 — where it is proved UNIVERSALLY optimal for
    count queries). Truncation at +-K with per-tail mass < 2^-33
    (K = ceil(33*ln2/epsilon), capped at 1024) makes the inverse-CDF
    table finite; the truncated mechanism is (epsilon, delta)-DP with
    delta < 2^-32 — far below any delta this mechanism's uniform
    32-bit draw could resolve anyway.

    thresholds[j] = round(CDF(-K + j) * 2^32) for j = 0..2K-1, so
    noise(u) = -K + #{t : u >= t} for a uniform 32-bit u."""
    import math

    eps = float(epsilon)
    if not (0.05 <= eps <= 20.0):
        raise ValueError(
            f"dp_counts: epsilon must be in [0.05, 20], got {epsilon}"
        )
    alpha = math.exp(-eps)
    k_trunc = min(1024, int(math.ceil(33.0 * math.log(2.0) / eps)))
    weights = [alpha ** abs(k) for k in range(-k_trunc, k_trunc + 1)]
    total = sum(weights)
    acc = 0.0
    thresholds = []
    for w in weights[:-1]:
        acc += w
        thresholds.append(round(acc / total * 2.0**32))
    return k_trunc, thresholds


def dp_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str | None = None,
) -> DataFrame:
    """(group..., n_noisy, epsilon) — differentially-private group
    counts: each group's exact count plus two-sided-geometric noise
    with parameter exp(-epsilon) (the discrete-Laplace mechanism,
    universally optimal for sensitivity-1 counts — see
    dp_geometric_thresholds). The governance release path for corpus
    composition stats (docs per source/lang/band) that must not leak
    whether any single ROW is present: row-level epsilon-DP; a
    contributor owning many rows needs a contribution bound upstream
    (cap rows per user first — the cap_per_group operator) before the
    guarantee is user-level.

    Determinism contract: the noise draw is the portable 32-bit hash
    of salt ':' group-values (concat_ws '|'), pushed through the
    driver-side inverse-CDF threshold literals — so (1) one salt is
    ONE release: re-running reproduces the same table byte-for-byte
    (audit-friendly), and (2) releasing AGAIN under a fresh salt is a
    fresh epsilon spend that composes additively — the caller's
    budget ledger owns that. The noise depends ONLY on (salt, group),
    never on the data (pytest-pinned). SECURITY CAVEAT (the keyed-PRF
    assumption this mechanism rests on): md5(salt || group) is
    adversary-unpredictable ONLY while the salt is secret and
    high-entropy. Anyone who knows or guesses the salt recomputes the
    noise exactly and recovers the raw counts — PUBLISHING the salt,
    REUSING it across releases, or picking a guessable constant
    forfeits the epsilon-DP guarantee entirely. The caller must draw
    the salt from a secret high-entropy source (>= 128 bits of
    randomness; a secrets-manager entry, never a code literal) and
    treat it like a key; `salt` is therefore REQUIRED (no default —
    a shared default constant would make every deployment's noise
    public knowledge) and the historical default 'release0' is
    rejected outright. Test/demo fixtures that commit their salt are
    reproducibility demos of the mechanism, NOT private releases.
    Noisy counts can be negative (published as-is — clamping is
    post-processing the caller may apply, but a silent floor here
    would bias downstream sums).

    NULL group values fail LOUD (a NULL key would silently merge into
    one released row). Raw counts and noise are deliberately NOT
    output columns. Group values containing '|' are the caller's
    delimiter responsibility (document keys, don't free-text them).

    Scale shape: ONE map-side-combinable count shuffle onto the
    bounded group table; noise is a codegen literal fold — zero
    windows, zero joins, zero Python."""
    from ..functions.text import portable_hash32

    if not salt or salt == "release0":
        raise ValueError(
            "dp_counts: salt is required and must not be the historical "
            "default constant 'release0' — supply a SECRET high-entropy "
            "salt (keyed-PRF assumption; see docstring)"
        )
    k_trunc, thresholds = dp_geometric_thresholds(epsilon)
    g = list(group_cols or [])

    def val(col):
        return (
            F.when(
                F.col(col).isNull(),
                F.raise_error(F.lit(f"dp_counts: NULL {col}")).cast(
                    dict(df.dtypes)[col]
                ),
            )
            .otherwise(F.col(col))
            .alias(col)
        )

    rows = df.select(*[val(c) for c in g]) if g else df.select()
    counts = rows.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    if not g:
        counts = counts.where(F.col("_n").isNotNull())
    u = portable_hash32(
        F.concat_ws(
            "|", F.lit(f"{salt}:"), *[F.col(c).cast("string") for c in g]
        )
    )
    noise = F.lit(-k_trunc).cast("long")
    for t in thresholds:
        noise = noise + (u >= F.lit(t)).cast("long")
    return counts.select(
        *g,
        (F.col("_n") + noise).cast("long").alias("n_noisy"),
        F.lit(float(epsilon)).cast("double").alias("epsilon"),
    )


def ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_keys: list[str],
    parent_keys: list[str],
) -> DataFrame:
    """One-row referential-integrity audit between a child (fact /
    FK side) and parent (dimension / PK side) table — the CROSS-table
    check quality_checks' single-table constraint kinds cannot
    express, and the first thing a pipeline audit asks of a star
    schema (orders -> customers, frames -> docs, pairs -> corpus):

      n_child / n_parent            — total rows each side
      n_child_null_key              — child rows with ANY NULL key col
                                      (SQL FK semantics: a NULL key
                                      cannot violate — reported, never
                                      silently an orphan)
      n_orphan, orphan_rate         — non-NULL-key child rows with NO
                                      matching parent key; rate over
                                      the non-NULL-key child rows
      n_parent_null_key             — parent rows with ANY NULL key
      n_parent_keys                 — distinct non-NULL parent keys
      n_parent_dup_keys,            — parent keys occurring > once (a
      n_parent_extra_rows             PK violation), and the rows
                                      beyond the first per such key
      n_parent_unreferenced,        — parent keys no child references;
      ref_coverage                    coverage = 1 - unreferenced/keys

    Exactness: every count is an exact BIGINT; the two rates are one
    correctly-rounded division each with the SCALE-0 micro rounding
    (rational p/q can land on exact 6-decimal halves — the round(x, 6)
    half-tie hazard). Zero-denominator rates are NULL (no non-NULL-key
    child rows / no parent keys). Multi-column keys match on ALL
    columns equal.

    Scale shape: one (key -> count) histogram per side (map-side
    combinable), ONE full-outer equi-join of the two key histograms
    (the minimal comparison — never a row-level join), two row-level
    NULL-count aggregates, and a constant number of 1-row broadcast
    combines. Zero windows, zero Python.

    Reference parity: generalizes the reference's single-table input
    validation (audio_loader.py field checks) to the cross-table
    contract a distributed star layout needs."""
    if not child_keys or len(child_keys) != len(parent_keys):
        raise ValueError(
            "ref_integrity: child_keys and parent_keys must be "
            f"nonempty and same length, got {child_keys} / {parent_keys}"
        )

    def null_any(cols):
        cond = F.lit(False)
        for c in cols:
            cond = cond | F.col(c).isNull()
        return cond

    c_tot = child.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.coalesce(F.sum(null_any(child_keys).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_child_null_key"),
    )
    p_tot = parent.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_parent"),
        F.coalesce(F.sum(null_any(parent_keys).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_parent_null_key"),
    )
    kcols = [F.col(c).alias(f"_k{i}") for i, c in enumerate(child_keys)]
    ck = (
        child.where(~null_any(child_keys))
        .select(*kcols)
        .groupBy(*[f"_k{i}" for i in range(len(child_keys))])
        .agg(F.count(F.lit(1)).cast("long").alias("_cc"))
    )
    pcols = [F.col(c).alias(f"_k{i}") for i, c in enumerate(parent_keys)]
    pk = (
        parent.where(~null_any(parent_keys))
        .select(*pcols)
        .groupBy(*[f"_k{i}" for i in range(len(parent_keys))])
        .agg(F.count(F.lit(1)).cast("long").alias("_pc"))
    )
    j = ck.join(pk, [f"_k{i}" for i in range(len(child_keys))], "full_outer")
    cc = F.coalesce(F.col("_cc"), F.lit(0).cast("long"))
    pc = F.coalesce(F.col("_pc"), F.lit(0).cast("long"))
    agg = j.groupBy().agg(
        F.coalesce(F.sum(F.when(pc == 0, cc)), F.lit(0))
        .cast("long")
        .alias("n_orphan"),
        F.coalesce(F.sum(((pc > 0)).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_parent_keys"),
        F.coalesce(F.sum((pc > 1).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_parent_dup_keys"),
        F.coalesce(F.sum(F.when(pc > 0, pc - 1)), F.lit(0))
        .cast("long")
        .alias("n_parent_extra_rows"),
        F.coalesce(F.sum(((pc > 0) & (cc == 0)).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_parent_unreferenced"),
    )
    out = c_tot.crossJoin(F.broadcast(p_tot)).crossJoin(F.broadcast(agg))

    def rate(num, den):
        return F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double") * F.lit(1e6))
            .cast("long")
            .cast("double")
            / F.lit(1e6),
        )

    nn = F.col("n_child") - F.col("n_child_null_key")
    return out.select(
        "n_child",
        "n_child_null_key",
        "n_orphan",
        rate(F.col("n_orphan"), nn).alias("orphan_rate"),
        "n_parent",
        "n_parent_null_key",
        "n_parent_keys",
        "n_parent_dup_keys",
        "n_parent_extra_rows",
        "n_parent_unreferenced",
        rate(
            F.col("n_parent_keys") - F.col("n_parent_unreferenced"),
            F.col("n_parent_keys"),
        ).alias("ref_coverage"),
    )
