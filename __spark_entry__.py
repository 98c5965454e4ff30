"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator from SURVEY.md §2
plus the training-data-pipeline extras (dedup / similarity / text /
multimodal); `oracle_sql()` gives the DuckDB-runnable ANSI-SQL twin for
every SQL-expressible one. Column names and rounding are matched pairwise.

The `input_hint` token payload (array<int32>) has no physical table in
/root/testdata, so token-based operators derive a deterministic token array
from documents.text (per-word character lengths) IDENTICALLY in Spark and
DuckDB; the real token pipeline is exercised on synthesized sequences by
the pytest goldens and bench.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audiopro_essentia_spark.constants import EPS  # noqa: E402
from audiopro_essentia_spark.functions import text as T  # noqa: E402
from audiopro_essentia_spark.operators import dedup as D  # noqa: E402
from audiopro_essentia_spark.operators import similarity as SIM  # noqa: E402
from audiopro_essentia_spark.operators.aggregates import reject_reason_col  # noqa: E402
from audiopro_essentia_spark.operators.asof import asof_join  # noqa: E402
from audiopro_essentia_spark.operators.framing import frame_tokens  # noqa: E402
from audiopro_essentia_spark.operators.kernel import with_frame_features  # noqa: E402
from audiopro_essentia_spark.operators.skew import salted_agg  # noqa: E402
from audiopro_essentia_spark.operators.temporal import (  # noqa: E402
    session_tempo,
    sessionize,
    with_ffill,
    with_lag_lead,
    with_rolling,
)

from audiopro_essentia_spark import duck_twins as DT  # noqa: E402
from audiopro_essentia_spark.functions.text import classifier_weights  # noqa: E402

# driver-scale framing params (token arrays here are ~30-90 words long)
DF_, DH_ = 8, 3
# hashed linear classifier (quality_classifier): dim + f64 weight literals
# shared verbatim between the Spark expression and its DuckDB twin
CLF_DIM = 64
DT_CLF_WEIGHTS = (
    "[" + ",".join(f"CAST({w!r} AS DOUBLE)" for w in classifier_weights()) + "]"
)
# kernel-surface framing params (FFT features; 9 rfft bins, 7 mels)
KF_, KH_, KSR_, KSCALE_ = 16, 4, 44100, 64.0
GEO_REP_ = 64  # token-array replication for the F=2048 full-geometry query
KMELS_ = 7  # min(N_MELS, max(2, KF_//2 - 1)) — kernel.make_frame_kernel
KERNEL_FEATURES = (
    "rms", "volume", "zero_crossing_rate", "spectral_centroid",
    "spectral_bandwidth", "spectral_flatness", "spectral_rolloff",
    "mfcc", "chroma", "frequency_bands",
)
FUSED_FEATURES = ("rms", "volume", "spectral_centroid", "mfcc")
GAP = 1800.0  # sessionization gap (seconds)
MERSENNE = D.MERSENNE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokens := per-word char lengths of documents.text (portable).

    r6: conditional `_spread_mat` of the raw (doc_id, text) rows BEFORE
    the token projection — the driver testdata doc table is one parquet
    row group, so every `_framed`-derived kernel/token query
    (frame_rms, kernel_features/full_geometry, spectral_*, rhythm,
    mfcc_delta, silence_segments, session_tempo, ...) ran its frame
    explode and Arrow kernel on 1-2 of 32 cores (measured: kernel
    stages `(1+1)/2` at sf1.0). The lazy-checkpoint form rather than a
    bare `_spread`: consumers filter on DERIVED token columns (e.g.
    mfcc_delta's size(toks) frame gate) and Catalyst pushes those
    filters below a bare spread exchange, re-tokenizing on the single
    scan partition (caught by the mfcc_delta plan pin). The spread
    shuffles only the ~6 MB compact doc rows — NOT the exploded
    token/frame payload (CLAUDE.md rule) — and no-ops when the scan is
    already parallel (the 100-TB case). Kernel internals untouched
    (VERDICT #7)."""
    from audiopro_essentia_spark.operators.dedup import _spread_mat

    return _spread_mat(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        F.col("doc_id"),
        T.token_lengths(F.col("text")).alias("toks"),
    )


# SQL twins of _docs_tokens / frame_tokens (DuckDB)
TOKS_CTE = DT.toks_cte()
FRAMES_CTE = DT.frames_cte(DF_, DH_)


def _project_kernel_scalars(
    df: DataFrame, feats: tuple[str, ...], n_mfcc: int
) -> DataFrame:
    """Round-6 scalar projection of a frame-feature DataFrame: array-typed
    outputs (mfcc) become mfcc_i columns, frequency_bands struct becomes
    fb_* columns — the driver canonicalizer cannot hash raw arrays."""
    from audiopro_essentia_spark.operators.kernel import BAND_NAMES

    cols = [
        F.col("doc_id"),
        F.col("frame_idx"),
        F.round("time_ms", 6).alias("time_ms"),
    ]
    from audiopro_essentia_spark.constants import N_CHROMA

    for f in feats:
        if f == "mfcc":
            cols.extend(
                F.round(F.element_at("mfcc", i + 1), 6).alias(f"mfcc_{i}")
                for i in range(n_mfcc)
            )
        elif f == "chroma":
            cols.extend(
                F.round(F.element_at("chroma", i + 1), 6).alias(f"chroma_{i}")
                for i in range(N_CHROMA)
            )
        elif f == "frequency_bands":
            src = (
                "frequency_bands.{b}"
                if "frequency_bands" in df.columns
                else "fb_{b}"
            )
            cols.extend(
                F.round(F.col(src.format(b=b)), 6).alias(f"fb_{b}")
                for b in BAND_NAMES
            )
        else:
            cols.append(F.round(f, 6).alias(f))
    return df.select(*cols)


def _framed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_tokens(
        _docs_tokens(spark, sf_dir),
        frame_length=DF_,
        hop=DH_,
        tokens_col="toks",
        id_cols=("doc_id",),
        carry_cols=(),
        base_ts_col=None,
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_framing_counts(spark, sf_dir):
    """W1: frame count per doc = 1 + (N' - F) // H after odd-trim."""
    return (
        _framed(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_frames"))
    )


def q_frame_rms(spark, sf_dir):
    """A1+A2: per-frame rms + volume as native SQL exprs (no Hann/scale in
    the portable variant)."""
    framed = _framed(spark, sf_dir)
    x = F.transform(F.col("window"), lambda v: v.cast("double"))
    sq = F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v)
    rms = F.sqrt(sq / F.lit(float(DF_)))
    return framed.select(
        "doc_id",
        "frame_idx",
        F.round(rms, 6).alias("rms"),
        F.round(F.lit(20.0) * F.log10(rms + F.lit(EPS)), 6).alias("volume"),
    )


def q_frame_zcr(spark, sf_dir):
    """A3 analog: mean-crossing rate per frame (tokens are nonneg, so
    crossings are measured around the frame mean)."""
    framed = _framed(spark, sf_dir)
    x = F.transform(F.col("window"), lambda v: v.cast("double"))
    m = F.aggregate(x, F.lit(0.0), lambda a, v: a + v) / F.lit(float(DF_))
    flips = F.aggregate(
        F.zip_with(
            F.slice(x, 1, DF_ - 1),
            F.slice(x, 2, DF_ - 1),
            lambda a, b: ((a > m) != (b > m)).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return framed.select(
        "doc_id",
        "frame_idx",
        F.round(flips.cast("double") / F.lit(float(DF_ - 1)), 6).alias("mcr"),
    )


def q_doc_stats(spark, sf_dir):
    """A12/A13: one-pass doc aggregates over the token array."""
    toks = _docs_tokens(spark, sf_dir)
    x = F.transform(F.col("toks"), lambda v: v.cast("double"))
    n = F.size("toks").cast("double")
    s = F.aggregate(x, F.lit(0.0), lambda a, v: a + v)
    sq = F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v)
    mx = F.array_max(x)
    return toks.filter(F.size("toks") > 0).select(
        "doc_id",
        F.round(mx, 6).alias("peak"),
        F.round(F.sqrt(sq / n), 6).alias("rms"),
        F.round(s / n, 6).alias("dc_offset"),
        F.round(sq, 6).alias("energy"),
    )


def q_quarantine(spark, sf_dir):
    """S2/S3: validation split counts by reject reason (NULL = accepted)."""
    toks = _docs_tokens(spark, sf_dir)
    tagged = toks.withColumn(
        "reject_reason",
        reject_reason_col("toks", token_scale=1.0, frame_length=DF_),
    )
    return (
        tagged.groupBy("reject_reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_lag_lead(spark, sf_dir):
    """W4: lag/lead over the events stream."""
    ev = _t(spark, sf_dir, "events")
    return with_lag_lead(
        ev, "value", ("user_id",), ("ts", "event_id")
    ).select("user_id", "event_id", "value", "value_lag1", "value_lead1")


def q_monitor_stats(spark, sf_dir):
    """A17: ±2σ outlier-trimmed per-group avg/peak — the distributed
    analog of the reference monitor summary (monitor.py:99-129)."""
    from audiopro_essentia_spark.operators.aggregates import trimmed_stats

    ev = _t(spark, sf_dir, "events")
    return trimmed_stats(ev, "event_type", "value", 2.0)


def q_rolling(spark, sf_dir):
    """W3/W4: trailing rolling aggregates (5-row window ~ hop/window batching)."""
    ev = _t(spark, sf_dir, "events")
    out = with_rolling(
        ev, "value", ("user_id",), ("ts", "event_id"), 5, aggs=("avg", "sum", "min")
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value_roll5_avg", 6).alias("roll_avg"),
        F.round("value_roll5_sum", 6).alias("roll_sum"),
        F.round("value_roll5_min", 6).alias("roll_min"),
    )


def q_ffill(spark, sf_dir):
    """W5: forward/backward-fill sparse values (purchase value carried)."""
    from audiopro_essentia_spark.operators.temporal import with_bfill

    ev = _t(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    filled = with_bfill(
        with_ffill(ev, ("v",), ("user_id",), ("ts", "event_id")),
        ("v",),
        ("user_id",),
        ("ts", "event_id"),
    )
    return filled.select(
        "user_id",
        "event_id",
        F.round("v_ffill", 6).alias("v_ffill"),
        F.round("v_bfill", 6).alias("v_bfill"),
    )


def q_sessionize(spark, sf_dir):
    """W6: gap-and-island session ids per user."""
    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, ("user_id",), "ts", GAP).select(
        "user_id", "event_id", F.col("session_id").cast("long").alias("session_id")
    )


def q_session_tempo(spark, sf_dir):
    """A15/A16 analog: 60/median(diff(session boundaries)) per user."""
    ev = _t(spark, sf_dir, "events")
    out = session_tempo(ev, ("user_id",), "ts", GAP)
    return out.select(
        "user_id",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.round("tempo_analog", 6).alias("tempo_analog"),
    )


def q_asof_join(spark, sf_dir):
    """J1 flagship: backward as-of join clicks <- latest purchase per user."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof_join(
        clicks, purchases, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("pvalue",),
    )
    return out.select(
        "user_id", "event_id", F.round("value", 6).alias("value"),
        "matched_ts", F.round("pvalue", 6).alias("pvalue"),
    )


def q_pit_assembly(spark, sf_dir):
    """J1 at full north-rule shape: MULTI-TABLE point-in-time training-
    matrix assembly — each click (the label spine) picks up, strictly
    as-of its own timestamp, (1) the latest purchase value + its age,
    (2) the latest view value, (3) the user's cumulative error count.
    Three chained union-window as-of joins (operators/asof.py), each one
    hash-shuffle + in-partition sort; zero temporal leakage by
    construction (every feature read is <= the click ts). DuckDB twin:
    three native ASOF LEFT JOINs over the same pre-aggregated streams."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("vvalue"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    errc = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "user_id", "ts", F.sum("_n").over(w).cast("long").alias("cum_err")
        )
    )
    out = asof_join(
        clicks, purch, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("pvalue",), matched_ts_col="p_ts",
    )
    out = asof_join(
        out, views, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("vvalue",), matched_ts_col="v_ts",
    )
    out = asof_join(
        out, errc, on=("user_id",), left_ts="ts", right_ts="ts",
        right_values=("cum_err",), matched_ts_col="e_ts",
    )
    age = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("p_ts").cast("timestamp")
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("pvalue", 6).alias("pvalue"),
        age.cast("long").alias("purchase_age_us"),
        F.round("vvalue", 6).alias("vvalue"),
        F.coalesce(F.col("cum_err"), F.lit(0)).cast("long").alias("n_err"),
    )


def q_enrich_broadcast(spark, sf_dir):
    """J2: broadcast enrichment join orders <- customer <- nation with exact
    integer-cents revenue."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.withColumn("cents", cents)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


def q_salted_agg(spark, sf_dir):
    """Skew: salted two-level aggregation over the hot `source` key — must
    equal a plain GROUP BY exactly."""
    d = _t(spark, sf_dir, "documents")
    out = salted_agg(d, ("source",), n_salts=16, sums=("n_chars",))
    return out.select(
        "source",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_n_chars").cast("long").alias("sum_n_chars"),
        F.round("avg_n_chars", 6).alias("avg_n_chars"),
    )


def q_salted_join(spark, sf_dir):
    """Skew: salt-replicated broadcast equi-join on a genuinely HOT key —
    ~80% of docs collapse onto one 'hot' join key (content-hash derived;
    documents.source itself is UNIFORM across src0..src19, so a
    source-keyed demo would never make the salt do any work), the rest
    keep their source. Must equal a plain join exactly; the salt spreads
    the hot key over n_salts reducers, and with broadcast it is
    shuffle-free (operators/skew.py)."""
    from audiopro_essentia_spark.functions.sampling import hash_bucket
    from audiopro_essentia_spark.operators.skew import salted_broadcast_join

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(hash_bucket(F.col("doc_id")) < 800, F.lit("hot"))
        .otherwise(F.col("source"))
        .alias("skew_key"),
    )
    dim = d.groupBy("skew_key").agg(
        F.count(F.lit(1)).cast("long").alias("key_docs")
    )
    out = salted_broadcast_join(d, dim, ("skew_key",), n_salts=8, how="inner")
    return out.select("doc_id", "skew_key", "key_docs")


def q_corpus_rollup(spark, sf_dir):
    """Multi-granularity corpus report: GROUP BY ROLLUP(source, len_class)
    — detail, per-source subtotal, grand total in ONE Expand+agg pass
    (vs 3 separate scans); grouping_id disambiguates levels."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.when(F.col("n_chars") < 1000, F.lit("short"))
        .otherwise(F.lit("long"))
        .alias("len_class"),
    )
    # exact integer sum/count (NOT avg()): both engines divide the SAME
    # two exact integers, so round-6 can never straddle an ulp boundary
    return d.rollup("source", "len_class").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("n_chars").cast("long") / F.count("n_chars").cast("long"), 6
        ).alias("avg_chars"),
    )


def q_topk_per_group(spark, sf_dir):
    """Ranking: top-3 docs by n_chars per lang (deterministic tie-break)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "doc_id", "n_chars", F.col("rank").cast("int").alias("rank"))
    )


def q_tpch_q1(spark, sf_dir):
    """Partial-agg shape (TPC-H Q1-like) with exact integer arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("qty_i", F.round("l_quantity").cast("long"))
        .withColumn("price_c", F.round(F.col("l_extendedprice") * 100).cast("long"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_i").cast("long").alias("sum_qty"),
            F.sum("price_c").cast("long").alias("sum_price_cents"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_dedup_exact(spark, sf_dir):
    """Dedup: exact (md5 hash-groupBy), deterministic representative."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_dups").cast("long").alias("n_dups"),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Dedup: exact word-3-gram Jaccard pairs >= 0.5 via inverted index
    with hot-shingle df cap (candidates stay linear under boilerplate;
    still hash-matches the UNCAPPED exact oracle — near-dups share
    specific shingles)."""
    d = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, threshold=0.5, max_df=50).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def q_dedup_clusters(spark, sf_dir):
    """Dedup: MinHash-LSH pairs -> connected components -> canonical
    cluster id (min doc in component). Iterative min-label propagation;
    hash-checked against a DuckDB recursive-CTE transitive closure."""
    d = _t(spark, sf_dir, "documents")
    return D.dedup_clusters(d, k=16, bands=4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def q_minhash_lsh(spark, sf_dir):
    """Dedup: MinHash(16) + LSH(4 bands) candidate pairs (portable hashes)."""
    d = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(d, k=16, bands=4).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )


def q_simhash(spark, sf_dir):
    """Dedup: SimHash near-dup pairs (Hamming <= 3) via 16-bit-chunk
    pigeonhole candidates + popcount verify — hash-checked against a
    generated bit-exact DuckDB twin (duck_twins.simhash_pairs_sql)."""
    d = _t(spark, sf_dir, "documents")
    out = D.simhash_neardup_pairs(d, max_hamming=3, ngram=2)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: train docs (doc_id %% 97 != 0) sharing
    >= 1 word 5-gram with the synthetic benchmark set (doc_id %% 97 == 0)
    — broadcast benchmark shingles, no corpus shuffle."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return D.contamination_flags(train, bench, ngram=5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_normalized_dedup(spark, sf_dir):
    """Canonical-form dedup: C4-style normalization (ASCII case fold /
    strip punct / collapse whitespace) before the exact md5 hash-agg, so
    case and punctuation variants collapse. The corpus is unioned with an
    upper-cased twin of every doc (id + 1e6) — raw exact dedup would keep
    both, normalized dedup collapses each pair to its min-id canonical.
    The twin construction uses the same portable ASCII translate as
    normalize_text (upper() itself diverges cross-engine on unicode —
    see normalize_text's docstring)."""
    # spread: the normalize_text translate/regex projection ran twice on
    # the single-row-group scan partition (both union branches; r6)
    d = D._spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    up = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.translate(F.col("text"), T.ASCII_LOWER, T.ASCII_UPPER).alias("text"),
    )
    u = d.select("doc_id", "text").unionByName(up)
    n = u.select("doc_id", T.normalize_text(F.col("text")).alias("ntext"))
    return D.exact_dedup(n, text_col="ntext").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_dups").cast("long").alias("n_dups"),
    )


def q_incremental_dedup(spark, sf_dir):
    """Production incremental dedup: flag each doc of a NEW batch
    (doc_id %% 5 == 0) as exact-dup / near-dup of the CORPUS (the rest)
    via md5 semi-join + MinHash signature-index semi-join — increments
    never re-pair the whole corpus."""
    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return D.incremental_dedup_flags(new, corpus, k=16, bands=4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dup_exact").cast("int").alias("dup_exact"),
        F.col("dup_near").cast("int").alias("dup_near"),
    )


def q_embed_neardup(spark, sf_dir):
    """Dedup: embedding-cosine near-dup pairs >= 0.95 via banded sign-LSH
    candidates + exact verify (no cartesian product — plan-asserted in
    tests). The corpus is unioned with a deterministically perturbed twin
    of every vector (id + 1e6, first component += 0.05 -> cosine ~0.9988)
    so real near-dups exist; 64 planes in 8-bit bands keep buckets small
    (max 83 here, candidate ratio ~4%) while the 8-band OR gives full
    recall at theta ~ 2.9 degrees — verified exact vs the all-pairs DuckDB
    oracle at sf0.01 AND sf0.1. (The old threshold-0.4 form targeted
    background-tail pairs at 66 degrees, where ANY sign-LSH degenerates to
    near-all-pairs buckets — the wrong tool below ~0.7 cosine.)"""
    e = _t(spark, sf_dir, "embeddings")
    orig = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    pert = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x.cast("double") + 0.05).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    return D.embedding_neardup_pairs(
        orig.unionByName(pert), threshold=0.95, n_planes=64, band_bits=8
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )


def q_ann_topk(spark, sf_dir):
    """Similarity: brute-force cosine top-5 for query vectors vec_id < 5."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.brute_force_topk(e, q, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )


def q_ivf_ann(spark, sf_dir):
    """Similarity: IVF search (assign + probe + exact re-rank). With
    nprobe == n_centroids the probe covers every cell, so the result is
    EXACT and hash-checked against the brute-force SQL oracle; partial
    nprobe recall is pytest-covered."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.ivf_topk(e, q, k=5, n_centroids=8, nprobe=8)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )


def q_lsh_ann(spark, sf_dir):
    """Similarity: LSH-bucketed approximate top-5 (the scale path). Recall
    differs from brute force by design, but the seeded hyperplanes are
    deterministic literals, so even the approximate answer hash-checks
    against a DuckDB twin that replicates the bucketing exactly."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.lsh_topk(e, q, k=5, n_planes=6)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )


def q_ann_recall(spark, sf_dir):
    """Similarity evaluation: per-query recall of the LSH top-5 vs the
    exact brute-force top-5 (same seeded hyperplanes as lsh_ann, so even
    the recall REPORT is exactly oracle-checkable)."""
    from audiopro_essentia_spark.operators.similarity import ann_recall

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_recall(e, q, k=5, n_planes=6)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_hit").cast("long").alias("n_hit"),
        "recall",
    )


def q_chunk_documents(spark, sf_dir):
    """RAG-prep chunking: 32-word windows, 8-word overlap — narrow
    explode+slice plan (the text form of token framing); chunk text
    digested to the portable 32-bit hash for the canonicalizer."""
    d = _t(spark, sf_dir, "documents")
    out = T.chunk_documents(d, chunk_words=32, overlap=8)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        T.portable_hash32(F.col("chunk_text")).alias("chunk_h32"),
        F.col("n_chunk_words").cast("int").alias("n_chunk_words"),
    )


def q_hashed_embedding(spark, sf_dir):
    """Featurization: hashing-trick bag-of-words doc embeddings (dim 64,
    L2-normalized, portable hash) — fully relational, no ML lib; digested
    to (nnz, component sum) scalars for the canonicalizer."""
    from audiopro_essentia_spark.operators.featurize import hashed_doc_embedding

    d = _t(spark, sf_dir, "documents")
    out = hashed_doc_embedding(d, dim=64)
    emb = F.col("embedding")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("nnz"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("e_sum"),
    )


def q_text_quality(spark, sf_dir):
    """Text: quality metrics + composite score per doc."""
    # spread: pure projection query on the single-row-group scan (r6)
    d = D._spread(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    )
    m = T.quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        m["n_words"].cast("long").alias("n_words"),
        F.round(m["avg_word_len"], 6).alias("avg_word_len"),
        F.round(m["stopword_ratio"], 6).alias("stopword_ratio"),
        T.quality_score(F.col("text")).alias("quality_score"),
    )


def q_repetition(spark, sf_dir):
    """Text: Gopher-style intra-doc repetition signals (dup-word /
    dup-bigram fractions + top-bigram character coverage) — the quality
    gate corpora run before dedup. Linear explode->count->max-struct plan,
    never a per-doc O(w^2) expression scan."""
    from audiopro_essentia_spark.operators.repetition import repetition_profile

    d = _t(spark, sf_dir, "documents")
    return repetition_profile(d, ngram=2)


def q_corpus_profile(spark, sf_dir):
    """Per-source corpus distribution profile: doc count + exact p50/p90/
    p99 of doc length (sort-based percentile == DuckDB quantile_cont; the
    operator's approx_percentile form is the bounded-memory scale path)."""
    from audiopro_essentia_spark.operators.aggregates import corpus_percentiles

    d = _t(spark, sf_dir, "documents")
    return corpus_percentiles(d, "source", "n_chars")


def q_pack_shards(spark, sf_dir):
    """Sequence packing: docs -> fixed-capacity training shards by
    cumulative token count (distributed two-phase prefix sum — never a
    single-partition global window). Capacity 4096 tokens/shard."""
    from audiopro_essentia_spark.operators.packing import pack_shards

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.bpe_ish_token_count(F.col("text")).alias("n_tok")
    )
    return pack_shards(d, "n_tok", shard_tokens=4096)


def q_shard_manifest(spark, sf_dir):
    """Packing: per-shard training manifest (docs started, straddlers
    whose attention mask crosses the boundary, ordered offset:doc
    boundary string) on pack_shards' distributed prefix sum — ONE extra
    bounded groupBy(shard_id) (operators/packing.py shard_manifest)."""
    from audiopro_essentia_spark.operators.packing import shard_manifest

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.bpe_ish_token_count(F.col("text")).alias("n_tok")
    )
    return shard_manifest(d, "n_tok", shard_tokens=4096)


def q_pack_nosplit(spark, sf_dir):
    """Packing: greedy NO-SPLIT packing (docs never straddle a shard —
    the cross-doc-attention-safe discipline). Bucket-aligned so every
    bucket folds independently in one applyInPandas; oversize docs get
    their own flagged shard (operators/packing.py pack_nosplit)."""
    from audiopro_essentia_spark.operators.packing import pack_nosplit

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.bpe_ish_token_count(F.col("text")).alias("n_tok")
    )
    return pack_nosplit(d, "n_tok", shard_tokens=96)


def q_surprisal(spark, sf_dir):
    """Quality: self-trained unigram LM surprisal per doc (no external
    model — the corpus scores itself; perplexity-filter analog)."""
    from audiopro_essentia_spark.operators.tfidf import unigram_surprisal

    d = _t(spark, sf_dir, "documents")
    return unigram_surprisal(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_words").cast("long").alias("n_words"),
        "avg_logloss",
    )


def q_bigram_surprisal(spark, sf_dir):
    """Quality: self-trained add-alpha BIGRAM LM surprisal — the next
    rung toward KenLM perplexity filtering, all linear shuffles
    (operators/tfidf.py bigram_surprisal)."""
    from audiopro_essentia_spark.operators.tfidf import bigram_surprisal

    d = _t(spark, sf_dir, "documents")
    return bigram_surprisal(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_bigrams",
        "avg_logloss",
    )


def q_quality_classifier(spark, sf_dir):
    """Quality: fasttext-SHAPED hashed-bag-of-words linear classifier ->
    sigmoid, one narrow JVM expression (functions/text.py
    quality_classifier_score; seeded stand-in weights, swap real ones at
    deploy)."""
    from audiopro_essentia_spark.functions.text import quality_classifier_score

    # spread: the hashed-BoW scoring projection is the whole query and
    # ran on the single-row-group scan partition (r6; no-op at scale)
    d = D._spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        quality_classifier_score(F.col("text")).alias("clf_score"),
    )


def q_semantic_dedup(spark, sf_dir):
    """Dedup: SemDeDup-shaped semantic deduplication — one-iteration
    spherical k-means clustering, then min-id near-dup collapse WITHIN
    clusters only (similarity.semantic_dedup). Perturbed-twin union (as
    in embed_neardup) makes real >=0.95 pairs exist; originals are all
    kept and ~98%% of twins flagged at sf0.01 — the misses are twins
    whose perturbation crossed a cluster boundary, the inherent recall
    trade of cluster-scoped dedup (the SemDeDup paper's own caveat;
    exact closure is dedup_clusters / embed_neardup)."""
    from audiopro_essentia_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    orig = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    pert = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x.cast("double") + 0.05).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    out = semantic_dedup(orig.unionByName(pert), k=8, threshold=0.95)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("int").alias("cluster_id"),
        "is_dup",
    )


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training: 6 distributed BPE merges learned over the
    corpus word-frequency table (operators/bpe.py train_bpe) —
    deterministic (count desc, pair asc) argmax per merge, merge applied
    as a pure-JVM fold; the DuckDB twin replays the loop with
    materialized CTE layers and a list_reduce fold (duck_twins.bpe_sql).
    The merge table is O(n_merges) driver state by nature, the kmeans
    centroid contract."""
    from audiopro_essentia_spark.operators.bpe import train_bpe

    d = _t(spark, sf_dir, "documents")
    return train_bpe(spark, d, n_merges=6)


def q_bpe_encode(spark, sf_dir):
    """Tokenizer ENCODE side: the 6 learned merges applied in training
    order to the corpus word table (operators/bpe.py segment_words —
    each merge a pure-JVM leftmost-non-overlapping fold, zero Python),
    output (word, freq, pieces, n_pieces). The DuckDB twin extends the
    training chain through the final apply
    (duck_twins.bpe_encode_sql)."""
    from audiopro_essentia_spark.operators.bpe import (
        segment_words,
        train_bpe,
    )

    d = _t(spark, sf_dir, "documents")
    merges = sorted(
        train_bpe(spark, d, n_merges=6).collect(),
        key=lambda r: r.merge_rank,
    )
    seg = segment_words(d, [(r.left_sym, r.right_sym) for r in merges])
    return seg.select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.array_join("sym", " ").alias("pieces"),
        F.size("sym").cast("int").alias("n_pieces"),
    )


def q_snapshot_diff(spark, sf_dir):
    """Epoch-over-epoch corpus diff (operators/snapshot.py): old =
    documents; new = deterministic mutation (per-mille hash bucket <50
    removed, [50,150) text-revised, removed docs re-added under doc_id+1M)
    — every status class non-vacuous. Digests are computed in the scan
    projection; only (id, digest) crosses the ONE full-outer join
    shuffle."""
    from audiopro_essentia_spark.functions.sampling import hash_bucket
    from audiopro_essentia_spark.operators.snapshot import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    old = d.select("doc_id", "text")
    new = (
        d.where(b >= 50)
        .select(
            "doc_id",
            F.when(
                b < 150, F.concat(F.col("text"), F.lit(" [rev2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.where(b < 50).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    out = snapshot_diff(old, new)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "status"
    )


def q_drift_psi(spark, sf_dir):
    """Monitoring: per-source n_chars distribution drift vs the rest of
    the corpus as a Population Stability Index (aggregates.py
    source_drift_psi) — the data-side sibling of the reference's
    host-performance monitor. ONE (source, bucket) count shuffle; the
    spine join, rest-of-corpus subtraction and PSI fold all run on the
    20x10 aggregate."""
    from audiopro_essentia_spark.operators.aggregates import (
        source_drift_psi,
    )

    d = _t(spark, sf_dir, "documents")
    return source_drift_psi(d, value_col="n_chars", group_col="source")


def q_hll_distinct(spark, sf_dir):
    """Sketching: per-source HyperLogLog estimate of DISTINCT WORD
    BIGRAMS (lexical-diversity cardinality; ~700 true distincts per
    source exercises the raw harmonic branch at p=7/m=128). Portable
    md5 hash, exact dyadic harmonic sum (operators/sketch.py) — the
    mergeable-cardinality monitor exact COUNT(DISTINCT) can't provide
    at 100 TB; registers union across shards/epochs by max."""
    from audiopro_essentia_spark.operators.sketch import hll_distinct

    d = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    # spread first: the bigram explode + register build is the corpus
    # pass and ran on the single-row-group scan partition (r6; no-op at
    # scale)
    base = D._spread(d.select("source", ws.alias("_ws")))
    n1 = F.greatest(F.size("_ws") - 1, F.lit(0))
    bg = base.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice(F.col("_ws"), 1, n1),
                F.slice(F.col("_ws"), 2, n1),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        ).alias("bigram"),
    )
    return hll_distinct(bg, F.col("bigram"), group_col="source", p=7)


CMS_D, CMS_W = 3, 256
CMS_QUERY_WORDS = (
    # audit terms spanning the corpus frequency range, plus two absent
    # tokens (their exact count is 0; any nonzero estimate is pure
    # collision overcount — the one-sided error made visible)
    "join", "hash", "vector", "window", "spark", "merge", "filter",
    "stream", "batch", "group", "table", "key", "zzqx", "notaword9",
)


def q_cms_freq(spark, sf_dir):
    """Sketching: per-source Count-Min frequency estimates for a fixed
    audit-term list vs their exact counts (operators/sketch.py
    cms_registers/cms_estimate) — the mergeable FREQUENCY monitor next
    to hll_distinct's cardinality sketch. The register build is the only
    corpus-scale pass (ONE map-side-combinable groupBy, <= sources*d*w
    rows out); the exact-count companion runs on the broadcast-filtered
    audit terms only, never the full vocabulary. d=3/w=256 is sized so
    the demo shows real collisions (overcount > 0 on some terms) while
    the min-over-rows bound stays obviously tight; estimates are exact
    BIGINTs end-to-end, so the twin is hash-identical by construction."""
    from audiopro_essentia_spark.operators.sketch import (
        cms_estimate,
        cms_registers,
    )

    d = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    # spread first: the token explode feeds BOTH the register build and
    # the exact-count branch, and ran on the single-row-group scan
    # partition (~10 s of the 12.5 s sf1.0 run on one task; r6, no-op at
    # scale)
    tok = D._spread(d.select("source", "text")).select(
        F.coalesce(F.col("source").cast("string"), F.lit("__null__")).alias(
            "source"
        ),
        F.explode(ws).alias("word"),
    )
    regs = cms_registers(
        tok, F.col("word"), group_col="source", d=CMS_D, w=CMS_W
    )
    qdf = spark.createDataFrame([(w,) for w in CMS_QUERY_WORDS], "word string")
    est = cms_estimate(regs, qdf, query_col="word", d=CMS_D, w=CMS_W)
    exact = (
        tok.where(F.col("word").isin(*CMS_QUERY_WORDS))
        .groupBy(F.col("source").alias("grp"), "word")
        .agg(F.count(F.lit(1)).alias("_exact"))
    )
    return est.join(exact, ["grp", "word"], "left").select(
        F.col("grp").alias("source"),
        "word",
        F.col("cms_count").cast("long").alias("cms_count"),
        F.coalesce(F.col("_exact"), F.lit(0)).cast("long").alias("exact_count"),
        (F.col("cms_count") - F.coalesce(F.col("_exact"), F.lit(0)))
        .cast("long")
        .alias("overcount"),
    )


def q_kl_drift(spark, sf_dir):
    """Monitoring: per-source lexical KL divergence vs the rest of the
    corpus over the global top-500 words, each term rounded once to
    integer micro-nats and summed exactly (aggregates.py
    source_kl_divergence) — the distribution-level companion of
    drift_psi's scalar-bucket PSI."""
    from audiopro_essentia_spark.operators.aggregates import (
        source_kl_divergence,
    )

    return source_kl_divergence(_t(spark, sf_dir, "documents"), top_n=500)


def q_zipf_slope(spark, sf_dir):
    """Profiling: per-source Zipf exponent — least-squares slope of
    ln(freq) on ln(rank) over the source's top-200 words, regression on
    exact BIGINT micro-nat sums (aggregates.py zipf_slope)."""
    from audiopro_essentia_spark.operators.aggregates import zipf_slope

    return zipf_slope(_t(spark, sf_dir, "documents"), top_n=200)


def q_source_overlap(spark, sf_dir):
    """Curation: cross-source 3-gram overlap / Jaccard matrix (the
    source-contamination map; dedup.source_ngram_overlap) — distinct
    shingle projection, bounded collect_set pair generation, exact
    integer counts, one round-6 division."""
    from audiopro_essentia_spark.operators.dedup import source_ngram_overlap

    return source_ngram_overlap(_t(spark, sf_dir, "documents"), ngram=3)


def q_temperature_sample(spark, sf_dir):
    """Sampling: temperature-scaled mixture (tau=0.5) — per-source
    keep-rates derived from corpus shares via the sqrt path (IEEE
    correctly rounded both engines), smallest source kept whole
    (functions/sampling.py temperature_sample)."""
    from audiopro_essentia_spark.functions.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents")
    out = temperature_sample(d, tau=0.5)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source",
        F.col("rate_pm").cast("long").alias("rate_pm"),
    )


def q_cap_per_group(spark, sf_dir):
    """Capping: top-5 docs per source by (n_chars desc, doc_id asc) via
    the two-phase hierarchical salted window (operators/skew.py
    capped_top_n) — exactly equal to the single-window answer, but a hot
    group spreads over n_salts reducers; twin is the plain one-window
    QUALIFY."""
    from audiopro_essentia_spark.operators.skew import capped_top_n

    d = _t(spark, sf_dir, "documents")
    out = capped_top_n(d, n=5, group_col="source", order_col="n_chars")
    return out.select(
        "source", "doc_id", "n_chars", F.col("rank").cast("int").alias("rank")
    )


def q_silence_segments(spark, sf_dir):
    """Segmentation: contiguous active-frame runs (frame energy >= 175,
    the fixture median) with token-offset spans and exact-integer segment
    RMS (operators/segmentation.py silence_segments; reference
    metadata.py:75 silence_ratio made operational)."""
    from audiopro_essentia_spark.operators.segmentation import silence_segments

    return silence_segments(
        _framed(spark, sf_dir), min_energy=175, frame_length=DF_, hop=DH_
    )


# DSIR target domain: four fixed sources play the in-domain exemplar set
DSIR_TARGET = ("src0", "src1", "src2", "src3")
# BM25 audit probes over the fixture's SQL-word vocabulary
BM25_QUERIES = (
    (0, "table scan filter"),
    (1, "window agg spark"),
    (2, "customer query join"),
    (3, "hash merge sort"),
    (4, "stream batch order"),
)
BM25_K = 5


def q_dsir_select(spark, sf_dir):
    """Selection: DSIR importance resampling (Xie et al. 2023) — hashed
    unigram+bigram bucket distributions fit on target (src0-3) vs raw
    (rest), per-doc log importance weight in exact integer micro-nats,
    keep = weight > 0 (operators/selection.py dsir_importance)."""
    from audiopro_essentia_spark.operators.selection import dsir_importance

    d = _t(spark, sf_dir, "documents")
    return dsir_importance(
        d, is_target=F.col("source").isin(*DSIR_TARGET)
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_feats",
        "dsir_weight_micro",
        F.col("keep").cast("int").alias("keep"),
    )


def q_bm25(spark, sf_dir):
    """Retrieval: Okapi BM25 top-5 docs per audit query (k1=1.2, b=0.75),
    integer-micro scores, two-phase salted per-query top-k
    (operators/selection.py bm25_topk)."""
    from audiopro_essentia_spark.operators.selection import bm25_topk

    d = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        list(BM25_QUERIES), "query_id int, query string"
    )
    return bm25_topk(d, qs, k=BM25_K).select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_hit_terms",
        "score_micro",
        "rank",
    )


def q_c4_clean(spark, sf_dir):
    """Cleaning: C4-style line filtering (Raffel et al. 2020 rules: >=5
    words/line, terminal punctuation, no 'javascript' lines; doc gates on
    lorem ipsum / '{' / <3 surviving lines) over a deterministically lined
    corpus — 10-word chunks whose terminal '.' depends on the portable
    hash, plus doc_id-keyed lorem/brace contamination (the perturbed-twin
    demo pattern; functions/cleaning.py c4_clean)."""
    from audiopro_essentia_spark.functions.cleaning import (
        c4_clean,
        synthesize_lines,
    )

    # spread BEFORE the line synthesis (md5-per-sentence) — it ran on
    # the single-row-group scan partition (r6; no-op at scale)
    d = D._spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    lined = synthesize_lines(F.col("text"))
    text2 = (
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(lined, F.lit("\nlorem ipsum dolor sit amet consectetur.")),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(lined, F.lit("\nvar cfg = { javascript: 1 };")),
        )
        .otherwise(lined)
    )
    return c4_clean(d.select("doc_id", text2.alias("text")))


def q_pca_power(spark, sf_dir):
    """Decomposition: top principal component of the embeddings by
    EXACT-INTEGER power iteration (2 steps from w0 = ones, quantize x100,
    renormalize to 16 bits; operators/decomp.py) + per-row projection.
    Every op after quantization is exact BIGINT in both engines, so the
    DuckDB twin (which replays both steps in chained materialized CTEs)
    is hash-identical by construction — no float-sum order hazard."""
    from audiopro_essentia_spark.operators.decomp import (
        power_iteration,
        project_component,
    )

    e = _t(spark, sf_dir, "embeddings")
    w = power_iteration(e, vec_col="embedding", dim=64, n_iter=2)
    return project_component(
        e, w, vec_col="embedding", id_cols=("vec_id", "label")
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("int").alias("label"),
        "pc1_proj",
    )


def q_epoch_shuffle(spark, sf_dir):
    """Ordering: deterministic global corpus shuffle — portable-hash
    (seed, id) epoch permutation ranked with the distributed two-phase
    prefix rank over order-preserving hash-range buckets, never a global
    single-partition window (operators/shuffle.py epoch_shuffle)."""
    from audiopro_essentia_spark.operators.shuffle import epoch_shuffle

    d = _t(spark, sf_dir, "documents")
    return epoch_shuffle(d, id_col="doc_id", seed="epoch0", n_buckets=64)


def q_padding_waste(spark, sf_dir):
    """Profiling: per-source padding-waste / batch-shape planner at
    context length 256 (n_chars as the token-count column — native to
    the table, so the scan stays 2-column) — exact integer pad counts
    for naive per-example padding vs concat-and-chunk packing
    (operators/aggregates.py padding_waste)."""
    from audiopro_essentia_spark.operators.aggregates import padding_waste

    d = _t(spark, sf_dir, "documents")
    return padding_waste(d, count_col="n_chars", context_len=256)


def q_span_scrub(spark, sf_dir):
    """Dedup: exact duplicate-span REMOVAL (word-granular Lee et al. 2022
    re-spec) — every 8-word span occurring >1x in the corpus is removed
    from all but its lexicographic-first occurrence; one span-hash
    shuffle + sparse mask join-back (operators/dedup.py span_scrub)."""
    d = _t(spark, sf_dir, "documents")
    return D.span_scrub(d, n=8)


def q_leak_split(spark, sf_dir):
    """Splitting: leakage-safe train/val/test — near-dup clusters
    (MinHash-LSH -> connected components) are split ATOMICALLY by hashing
    the cluster id, so no near-duplicate pair straddles train/eval
    (functions/sampling.py cluster_safe_split over dedup.dedup_clusters)."""
    from audiopro_essentia_spark.functions.sampling import cluster_safe_split

    d = _t(spark, sf_dir, "documents")
    cl = D.dedup_clusters(d, k=16, bands=4)
    return cluster_safe_split(
        d, cl, {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "split",
    )


def q_fertility(spark, sf_dir):
    """Profiling: per-source tokenizer fertility / compression dashboard
    (pieces per word, chars per piece, words per doc) from exact integer
    sums (operators/aggregates.py tokenizer_fertility)."""
    from audiopro_essentia_spark.operators.aggregates import tokenizer_fertility

    return tokenizer_fertility(_t(spark, sf_dir, "documents"))


def q_tfidf(spark, sf_dir):
    """Text: top-5 TF-IDF terms per doc (smooth-idf; rank ties broken on
    the round-6 score then term so Spark and DuckDB agree bit-for-bit)."""
    from audiopro_essentia_spark.operators.tfidf import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=5)


def q_lang_id(spark, sf_dir):
    """Text: stopword-hit-rate language ID, counts per language."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_token_count(spark, sf_dir):
    """Text: whitespace + BPE-ish token counting."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(T.words(F.col("text"))).cast("long").alias("n_words"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


def q_fingerprint(spark, sf_dir):
    """Text: order-sensitive rolling-hash document fingerprint."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


def q_pii_redact(spark, sf_dir):
    """Text: PII scrub — redact emails / IPv4s / phone numbers (typed
    placeholders) + per-category counts. The fixture corpus contains no
    PII, so a deterministic per-doc PII suffix is appended first
    (doc_id %% 4 branches) — otherwise every count is 0 and the oracle
    check is vacuous. Narrow JVM regexp map, zero shuffle."""
    from audiopro_essentia_spark.functions import pii as P

    # spread: the regex redaction projection is the whole query and ran
    # on the single-row-group scan partition (r6; no-op at scale)
    d = D._spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 up"),
            ),
        )
        .when(F.col("doc_id") % 4 == 2, F.lit(" call +1 555-123-4567"))
        .otherwise(F.lit("")),
    )
    t = d.select("doc_id", injected.alias("t2"))
    c = P.pii_counts(F.col("t2"))
    return t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        c["n_email"].cast("long").alias("n_email"),
        c["n_ipv4"].cast("long").alias("n_ipv4"),
        c["n_phone"].cast("long").alias("n_phone"),
        T.portable_hash32(P.redact_pii(F.col("t2"))).alias("red_h32"),
    )


def q_span_dedup(spark, sf_dir):
    """Dedup: span-level duplicate profiling (substring-dedup curation
    signal, Lee et al.) — fraction of each doc's consecutive 3-word spans
    that also occur in OTHER docs. The fixture's small vocabulary makes
    cross-doc span collisions naturally non-vacuous."""
    d = _t(spark, sf_dir, "documents")
    return D.duplicate_span_stats(d, span_words=3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_spans",
        "n_dup_spans",
        "dup_ratio",
    )


def q_vocab(spark, sf_dir):
    """Tokenizer stage 1: frequency-ranked vocabulary (top 100; id 1..V by
    count desc, word asc — deterministic tie-break). The ranking window
    runs on the AGGREGATED vocab table, never on corpus rows."""
    from audiopro_essentia_spark.operators.vocab import build_vocab

    d = _t(spark, sf_dir, "documents")
    return build_vocab(d, max_vocab=100).select(
        "word", F.col("id").cast("int").alias("id"), F.col("cnt").cast("long").alias("cnt")
    )


def q_encode_tokens(spark, sf_dir):
    """Tokenizer stage 2: encode every doc to its id array with a SMALL
    vocab cap (20) so OOV->UNK is exercised; digest = hash of the
    comma-joined id sequence (order-sensitive)."""
    from audiopro_essentia_spark.operators.vocab import UNK_ID, build_vocab, encode_documents

    d = _t(spark, sf_dir, "documents")
    v = build_vocab(d, max_vocab=20)
    enc = encode_documents(d, v)
    return enc.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("ids").cast("long").alias("n_ids"),
        F.size(F.filter("ids", lambda x: x == UNK_ID)).cast("long").alias("n_unk"),
        T.portable_hash32(
            F.concat_ws(",", F.transform("ids", lambda x: x.cast("string")))
        ).alias("ids_h32"),
    )


def q_quantize_embed(spark, sf_dir):
    """Storage path: symmetric int8 quantization of the embeddings table
    (scale = max|v|/127, q = floor(v/scale + 0.5) — floor(x+0.5) because
    Spark round (HALF_UP) and DuckDB round agree on it bit-for-bit).
    Digest = hash of the comma-joined int codes."""
    from audiopro_essentia_spark.operators.featurize import quantize_embeddings

    e = _t(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e)
    return q.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round("scale", 6).alias("scale"),
        T.portable_hash32(
            F.concat_ws(",", F.transform("qvec", lambda x: x.cast("string")))
        ).alias("q_h32"),
    )


def q_vocab_by_source(spark, sf_dir):
    """Monitoring: per-source vocabulary cardinality (exact oracle form;
    the approx_count_distinct HLL++ sketch is the corpus-scale form,
    pytest-pinned within a few %% of exact)."""
    from audiopro_essentia_spark.operators.aggregates import distinct_profile

    d = _t(spark, sf_dir, "documents")
    return distinct_profile(d, exact=True)


def q_kmeans(spark, sf_dir):
    """Embedding clustering: distributed spherical k-means (Lloyd's over
    broadcast centroids + O(k*d) per-iteration aggregates). ONE iteration
    here so the query is fully oracle-checkable (md5-ordered init +
    assignment + mean update + final assignment are all SQL-expressible —
    duck_twins.kmeans_sql); the multi-iteration path is the same loop and
    is pinned by pytest (test_curation_extras: blob recovery,
    deterministic init, duplicate-vector init). Output: cluster sizes."""
    from audiopro_essentia_spark.operators.similarity import kmeans_lite

    e = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lite(e, k=8, iters=1)
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("cluster_id").cast("int").alias("cluster_id"), "n")
    )


def q_kernel_features(spark, sf_dir):
    """A1-A11: the fused Arrow kernel over derived tokens (F=16, H=4) —
    the FULL FFT feature surface (rms/volume/zcr, centroid, bandwidth,
    flatness, rolloff, mfcc_0..12, fb_*) hash-checked against a generated
    DuckDB DFT twin (duck_twins.kernel_sql — same Hann/twiddle/mel/DCT
    literals as the kernel)."""
    from audiopro_essentia_spark.constants import N_MFCC

    toks = _docs_tokens(spark, sf_dir)
    framed = frame_tokens(
        toks, frame_length=KF_, hop=KH_, sample_rate=KSR_, tokens_col="toks",
        id_cols=("doc_id",), carry_cols=(), base_ts_col=None,
    )
    out = with_frame_features(
        framed, frame_length=KF_, sample_rate=KSR_, token_scale=KSCALE_,
        features=KERNEL_FEATURES, chroma_band=(0.0, KSR_ / 2.0),
    )
    return _project_kernel_scalars(out, KERNEL_FEATURES, N_MFCC)


def q_kernel_full_geometry(spark, sf_dir):
    """W1+A1-A3 at the PRODUCTION frame geometry (F=2048, H=512,
    SR=44100 — reference constants.py:23-24): each doc's token array is
    replicated x64 (deterministic) so 10-100-word fixture docs produce
    real 2048-token frames, then the SAME frame_tokens + with_frame_features
    path as q_kernel_features runs with time-domain features only (the
    DFT twins' literal-twiddle trick is infeasible at F=2048).
    Hash-checked against the list-based DuckDB twin
    (duck_twins.kernel_time_sql)."""
    toks = _docs_tokens(spark, sf_dir).select(
        "doc_id", F.flatten(F.array_repeat(F.col("toks"), GEO_REP_)).alias("toks")
    )
    framed = frame_tokens(
        toks, frame_length=2048, hop=512, sample_rate=44100,
        tokens_col="toks", id_cols=("doc_id",), carry_cols=(),
        base_ts_col=None,
    )
    out = with_frame_features(
        framed, frame_length=2048, sample_rate=44100, token_scale=KSCALE_,
        features=("rms", "volume", "zero_crossing_rate"),
    )
    return out.select(
        "doc_id",
        "frame_idx",
        F.round("time_ms", 6).alias("time_ms"),
        F.round("rms", 6).alias("rms"),
        F.round("volume", 6).alias("volume"),
        F.round("zero_crossing_rate", 6).alias("zero_crossing_rate"),
    )


N_DELTA_COEF = 4  # mfcc_0..3 — bounds the generated twin's width


def q_mfcc_delta(spark, sf_dir):
    """A9 + post-kernel transforms: kernel mfcc (F=16, H=4) -> HTK delta
    regression (width 2, edge-replicated — operators/deltas.py) + per-doc
    cepstral mean subtraction (CMN). One Exchange on doc_id serves the
    delta lags/leads, the edge first/last values, AND the doc moments;
    hash-checked against the generated unrounded-input DuckDB window twin
    (duck_twins.kernel_delta_sql)."""
    from audiopro_essentia_spark.operators.deltas import (
        with_cmvn,
        with_frame_deltas,
    )

    toks = _docs_tokens(spark, sf_dir)
    framed = frame_tokens(
        toks, frame_length=KF_, hop=KH_, sample_rate=KSR_, tokens_col="toks",
        id_cols=("doc_id",), carry_cols=(), base_ts_col=None,
    )
    out = with_frame_features(
        framed, frame_length=KF_, sample_rate=KSR_, token_scale=KSCALE_,
        features=("mfcc",),
    )
    sel = out.select(
        "doc_id",
        "frame_idx",
        *[
            F.element_at("mfcc", i + 1).alias(f"m{i}")
            for i in range(N_DELTA_COEF)
        ],
    )
    cols = tuple(f"m{i}" for i in range(N_DELTA_COEF))
    d = with_cmvn(with_frame_deltas(sel, cols), cols)
    proj = [F.col("doc_id"), F.col("frame_idx")]
    for i in range(N_DELTA_COEF):
        proj.extend(
            [
                F.round(f"m{i}", 6).alias(f"mfcc_{i}"),
                F.round(f"m{i}_d1", 6).alias(f"mfcc_{i}_d1"),
                F.round(f"m{i}_cmn", 6).alias(f"mfcc_{i}_cmn"),
            ]
        )
    return d.select(*proj)


def q_seq_metadata(spark, sf_dir):
    """S1 file-metadata analogs of the reference loader's return tuple
    (audio_loader.py:61-63: md5, bit_rate, codec): content md5,
    duration, dictionary-size/dynamic-range analogs, effective bit rate
    (sources/sequences.py:with_sequence_metadata). Pure narrow JVM
    projection — zero shuffle, zero Python."""
    from audiopro_essentia_spark.sources.sequences import (
        with_sequence_metadata,
    )

    toks = _docs_tokens(spark, sf_dir)
    return with_sequence_metadata(toks, tokens_col="toks")


def q_spectral_flux(spark, sf_dir):
    """Onset strength: per-frame spectral flux + sigma-threshold onset
    flags over derived tokens (F=16, H=4) — stateless Arrow spectrum UDF,
    cross-frame diff as a declarative window lag; hash-checked against a
    generated DuckDB DFT twin (duck_twins.flux_sql)."""
    from audiopro_essentia_spark.operators.flux import spectral_flux

    toks = _docs_tokens(spark, sf_dir)
    framed = frame_tokens(
        toks, frame_length=KF_, hop=KH_, sample_rate=KSR_, tokens_col="toks",
        id_cols=("doc_id",), carry_cols=(), base_ts_col=None,
    )
    return spectral_flux(framed, frame_length=KF_, token_scale=KSCALE_)


def q_spectral_contrast(spark, sf_dir):
    """Per-frame spectral contrast (3 bands, ln peak/valley of sorted bin
    magnitudes) — spectrum UDF + pure JVM array expressions; twin
    generated from the same DFT literals (duck_twins.contrast_sql)."""
    from audiopro_essentia_spark.operators.flux import spectral_contrast

    toks = _docs_tokens(spark, sf_dir)
    framed = frame_tokens(
        toks, frame_length=KF_, hop=KH_, sample_rate=KSR_, tokens_col="toks",
        id_cols=("doc_id",), carry_cols=(), base_ts_col=None,
    )
    return spectral_contrast(framed, frame_length=KF_, token_scale=KSCALE_)


def q_rhythm(spark, sf_dir):
    """A16: beat/tempo extraction over derived tokens — autocorrelation
    tempo induction + tempo-constrained peak keep + median re-estimation
    — digested to (tempo, tempo_acf, n_beats, beats_sum) and hash-checked
    against a generated DuckDB twin of detect_beats
    (duck_twins.rhythm_sql; the acf argmax is exact, see rhythm.py)."""
    from audiopro_essentia_spark.operators.rhythm import extract_rhythm

    toks = _docs_tokens(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("toks").alias("tokens"),
    )
    out = extract_rhythm(
        toks, frame_length=KF_, hop=KH_, token_scale=KSCALE_, sample_rate=KSR_
    )
    beats_sum = F.aggregate("beats", F.lit(0.0), lambda a, v: a + v)
    return out.select(
        "doc_id",
        F.round("tempo", 6).alias("tempo"),
        F.round("tempo_acf", 6).alias("tempo_acf"),
        F.col("n_beats").cast("int").alias("n_beats"),
        F.round(beats_sum, 6).alias("beats_sum"),
    )


def q_fused_pipeline(spark, sf_dir):
    """W1+A1-A11 fused mapInPandas path (framing inside the kernel) over
    derived tokens — hash-checked against the same generated DuckDB DFT
    twin as q_kernel_features (both paths are semantically identical)."""
    from audiopro_essentia_spark.constants import N_MFCC
    from audiopro_essentia_spark.operators.fused import fused_frame_features

    toks = _docs_tokens(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("toks").alias("tokens"),
    )
    out = fused_frame_features(
        toks,
        features=FUSED_FEATURES,
        frame_length=KF_,
        hop=KH_,
        sample_rate=KSR_,
        token_scale=KSCALE_,
        chroma_band=(0.0, KSR_ / 2.0),
    )
    return _project_kernel_scalars(out, FUSED_FEATURES, N_MFCC)


def q_multimodal(spark, sf_dir):
    """Multimodal: binary payload -> mapInPandas feature extraction
    (decode stubbed; plumbing real). Histogram digested to h0..h15 scalar
    columns and hash-checked against duck_twins.multimodal_sql."""
    from audiopro_essentia_spark.operators.multimodal import (
        attach_binary_payload,
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents")
    out = extract_media_features(attach_binary_payload(d))
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        *[
            F.round(F.element_at("byte_histogram", b + 1), 6).alias(f"h{b}")
            for b in range(16)
        ],
    )


def q_hash_split(spark, sf_dir):
    """Sampling: deterministic content-hash train/val/test split (80/10/10)
    — reproducible across engines/reruns, exact DuckDB twin."""
    from audiopro_essentia_spark.functions.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    out = hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.select("doc_id", "split")


def q_mixture_sample(spark, sf_dir):
    """Pretraining mixture weights: keep 100%% of src0, 30%% of src1,
    50%% of everything else (src0..src19 are the documents fixture's
    actual sources, so every branch of the per-source threshold chain is
    oracle-exercised) — deterministic content-hash thresholds, one
    narrow filter."""
    from audiopro_essentia_spark.functions.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        d, {"src0": 1.0, "src1": 0.3}, default_rate=0.5
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def q_token_budget(spark, sf_dir):
    """Mixture epoch-weighting by TOKEN budget, not doc rate: cap src0 at
    2k chars and src1 at 4k, keep the rest whole (both caps BIND
    at every SF tier — per-source totals are ~8k at sf0.01 — so the
    downsample branches are oracle-exercised, not vacuous) — two-pass
    total-then-hash-filter (functions/sampling.py token_budget_sample)."""
    from audiopro_essentia_spark.functions.sampling import token_budget_sample

    d = _t(spark, sf_dir, "documents")
    out = token_budget_sample(d, {"src0": 2000, "src1": 4000})
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("rate_pm").cast("long").alias("rate_pm"),
    )


def q_curate(spark, sf_dir):
    """End-to-end corpus curation plan (quality gate -> lang filter ->
    exact-dup collapse -> near-dup cluster collapse -> hash split) —
    value-checked against a composed DuckDB twin."""
    from audiopro_essentia_spark.plans.curate import curate_corpus

    d = _t(spark, sf_dir, "documents")
    out = curate_corpus(d, min_quality=0.3, langs=("en",), persist_intermediate=True)
    return out.select(
        "doc_id", F.round("quality_score", 6).alias("quality_score"),
        "lang_pred", "split",
    )


def q_media_frames(spark, sf_dir):
    """Multimodal: frame sampling over binary payloads — n evenly-strided
    byte windows per payload, md5-fingerprinted. Pure JVM expressions (no
    Python); hash-checked against a byte-true DuckDB twin."""
    from audiopro_essentia_spark.operators.multimodal import (
        attach_binary_payload,
        sample_media_frames,
    )

    d = _t(spark, sf_dir, "documents")
    return sample_media_frames(attach_binary_payload(d), n_frames=4, frame_bytes=64)


def q_streaming_session(spark, sf_dir):
    """Structured Streaming: session_window sessionization driven to
    completion on a bounded file stream (rows-only)."""
    from audiopro_essentia_spark.streaming.stream_ops import (
        run_to_memory,
        streaming_sessionize,
    )

    import tempfile

    ev_schema = _t(spark, sf_dir, "events").schema
    # the streaming file source wants a directory — expose the single
    # parquet file through a symlink in a DETERMINISTIC per-sf_dir temp
    # dir (mkdtemp-per-invocation leaked one dir per driver/bench run on
    # the long-lived shared VM, and made the existence guard dead code)
    import hashlib

    d = os.path.join(
        tempfile.gettempdir(),
        "stream_events_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    stream = spark.readStream.schema(ev_schema).parquet(d)
    # complete mode: a bounded verification stream must emit ALL sessions
    # (append withholds those not yet past the watermark at stream end);
    # the production path is append + foreachBatch (stream_ops).
    out = run_to_memory(
        streaming_sessionize(stream, gap="1800 seconds"),
        "stream_sessions",
        mode="complete",
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "session_start",
        "session_end",
    )


# ---------------------------------------------------------------------------
# round-5 window candidates (NOT in queries() yet): the 50-query driver
# window is fully allocated to never-/single-checked rows (see CLAUDE.md),
# so these three ship now with the full driver contract — query fn +
# DuckDB oracle — exercised by tests/test_gopher_edit.py through the same
# compare_one() harness, and r5 wiring moves them into queries()/
# oracle_sql() verbatim while demoting then-double-green rows.
# ---------------------------------------------------------------------------


def q_staged_gopher(spark, sf_dir):
    """Cleaning: Gopher A1.1 quality rules (Rae et al. 2021) over a
    doc_id-keyed rule-exercising corpus: the c4_clean lined demo plus a
    stop-word tail line, with %29 docs rewritten to all-bullet lines,
    %13 docs to all-ellipsis-ended lines, %11 docs given a '########'
    hash word; min/max word bounds chosen so BOTH word-count bounds
    fire on the 10-99-word fixtures (functions/cleaning.py
    gopher_quality)."""
    from audiopro_essentia_spark.functions.cleaning import (
        gopher_quality,
        synthesize_lines,
    )

    # spread BEFORE the rule-exercising text synthesis: the md5-based
    # line/bullet rewrite is the expensive projection and ran on the
    # single-row-group scan partition (r6; no-op at scale)
    d = D._spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    lined = F.concat(
        synthesize_lines(F.col("text")), F.lit("\nthe and that have with")
    )
    lines = F.split(lined, "\n")
    bullets = F.array_join(
        F.transform(lines, lambda l: F.concat(F.lit("- "), l)), "\n"
    )
    ellip = F.array_join(
        F.transform(lines, lambda l: F.concat(l, F.lit("..."))), "\n"
    )
    txt = (
        F.when(F.col("doc_id") % 29 == 0, bullets)
        .when(F.col("doc_id") % 13 == 0, ellip)
        .when(F.col("doc_id") % 11 == 0, F.concat(lined, F.lit(" ########")))
        .otherwise(lined)
    )
    return gopher_quality(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), txt.alias("text")),
        min_words=20,
        max_words=90,
    )


def q_staged_edit_neardup(spark, sf_dir):
    """Dedup: edit-distance-verified near-dup pairs over the corpus plus
    perturbed twins (doc_id %% 41 docs re-issued as id+1e6 with the last
    character flipped — a 1-edit near-dup whose shingle set differs in
    one 2-gram; operators/dedup.py edit_neardup_pairs). length >= 1
    guard mirrors the twin: left(text, length-1) has DIVERGENT
    negative-length semantics across engines (DuckDB trims from the
    right, Spark returns '')."""
    from audiopro_essentia_spark.operators.dedup import edit_neardup_pairs

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    pert = d.filter(
        (F.col("doc_id") % 41 == 0)
        & F.col("text").isNotNull()
        & (F.length("text") >= 1)
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.expr("left(text, length(text) - 1)"), F.lit("X")
        ).alias("text"),
    )
    return edit_neardup_pairs(d.unionByName(pert), max_dist=3).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
        F.col("edit_dist").cast("int").alias("edit_dist"),
    )


def q_staged_lq_quantiles(spark, sf_dir):
    """Monitoring: per-source tokens-per-doc quantiles (p50/p90/p99) from
    the mergeable log-histogram sketch — exact log2 buckets, interpolated
    estimates, n_bad visibility (operators/sketch.py lq_registers +
    lq_quantiles)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.sketch import (
        lq_quantiles,
        lq_registers,
    )

    d = _t(spark, sf_dir, "documents")
    v = F.size(nonempty_words(F.col("text"), null_as_empty=True))
    return lq_quantiles(lq_registers(d.withColumn("v", v), "v"))


BLOOM_M, BLOOM_K = 131072, 3


def q_staged_bloom(spark, sf_dir):
    """Sketching: Bloom-filter seen-set membership — the MEMBERSHIP
    member of the mergeable sketch family (HLL cardinality / CMS
    frequency / LQ quantiles / Bloom membership) and the
    incremental-dedup prefilter shape: the filter over the OLD corpus's
    distinct 3-gram shingles (even-numbered sources) is ~16 KB of
    registers that probe ALL distinct corpus shingles without ever
    shuffling the key universe; hits alone would proceed to the exact
    semi-join. Output (shingle, in_build, bloom_hit): no false negatives
    by construction (in_build=1 -> bloom_hit=1, pytest-pinned), ~1%
    visible false positives at m=128Ki/k=3. All exact integer bit ops —
    the twin is hash-identical with no rounding anywhere
    (operators/sketch.py bloom_registers / bloom_probe)."""
    from audiopro_essentia_spark.functions.text import word_ngrams
    from audiopro_essentia_spark.operators.sketch import (
        bloom_probe,
        bloom_registers,
    )

    d = _t(spark, sf_dir, "documents")
    # try_cast, not cast: ANSI mode (the Spark 4 default, on in
    # session.py) THROWS on a non-numeric source suffix — the twin's
    # TRY_CAST already assumed silent-NULL parity (fixture sources are
    # all srcN, which masked this until an adversarial re-check)
    parity = F.substring(F.col("source").cast("string"), 4, 8).try_cast(
        "int"
    )
    flags = (
        # spread first: the shingle explode + map-side flag aggregate is
        # the corpus pass and ran on the single-row-group scan partition
        # (16.5 s of the 17.3 s sf1.0 run on one task; r6, no-op at scale)
        D._spread(d.select("source", "text"))
        .select(
            F.when(parity % 2 == 0, 1).otherwise(0).alias("is_build"),
            F.explode(word_ngrams(F.col("text"), n=3)).alias("shingle"),
        )
        .groupBy("shingle")
        .agg(F.max("is_build").cast("int").alias("in_build"))
        # three plan branches consume the shingle-flag table (register
        # build, probe set, final join-back) — truncate lineage once so
        # the corpus shingle pass runs once (CLAUDE.md multi-consumer
        # rule); the table is bounded by the distinct-shingle count
        .localCheckpoint(eager=False)
    )
    build = flags.where(F.col("in_build") == 1).select(
        F.lit("corpus").alias("grp_const"), "shingle"
    )
    regs = bloom_registers(
        build, F.col("shingle"), group_col="grp_const", m_bits=BLOOM_M, k=BLOOM_K
    )
    probed = bloom_probe(
        regs,
        flags.select("shingle"),
        query_col="shingle",
        m_bits=BLOOM_M,
        k=BLOOM_K,
    )
    return probed.join(flags, "shingle").select(
        "shingle", "in_build", "bloom_hit"
    )


def q_staged_interval_join(spark, sf_dir):
    """Joins: point-in-interval containment join (temporal.interval_join)
    — every event joined to its enclosing 30-min-gap session via the
    bucket-equi-join shape (intervals exploded onto hour buckets, ONE
    hash shuffle per side, residual BETWEEN inside the join) instead of
    the BroadcastNestedLoop Spark plans for a bare theta-join. Sessions
    come from session_stats over the same stream, so every event matches
    exactly its own session (rows == events — the self-consistency the
    oracle pins); NULL-ts rows are filtered BEFORE sessionization on
    both engines (Spark windows sort NULLS FIRST, DuckDB NULLS LAST —
    an unfiltered NULL would silently shift every lag chain)."""
    from audiopro_essentia_spark.operators.temporal import (
        interval_join,
        session_stats,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
    )
    ses = session_stats(ev, ("user_id",), "ts", gap_seconds=1800.0)
    out = interval_join(
        ev,
        ses,
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        key_cols=("user_id",),
        bucket_seconds=3600.0,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("duration_us").cast("long").alias("duration_us"),
    )


def q_staged_time_rolling(spark, sf_dir):
    """Windows: trailing TIME-range rolling features as-of each event
    (temporal.with_time_rolling) — events-per-user count and exact-cents
    value sum over the last 10 min and 1 h, the feature-store primitive
    row-based rolling cannot express on irregular event spacing. Zero
    leakage (frame upper bound = current ts; same-ts peers are included
    in BOTH engines — the SQL RANGE CURRENT ROW peer rule matches the
    asof <=-availability convention). Value summed as round(value*100)
    BIGINT cents (the money-sum rule: double SUM order is
    engine-dependent; integer cents are exact). ONE shuffle + ONE sort
    serves all four feature columns."""
    from audiopro_essentia_spark.operators.temporal import with_time_rolling

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = with_time_rolling(
        ev,
        "cents",
        ("user_id",),
        "ts",
        horizons_seconds=(600.0, 3600.0),
        aggs=("count", "sum"),
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("cents_count_600s").cast("long").alias("n_600s"),
        F.col("cents_sum_600s").cast("long").alias("sum_cents_600s"),
        F.col("cents_count_3600s").cast("long").alias("n_3600s"),
        F.col("cents_sum_3600s").cast("long").alias("sum_cents_3600s"),
    )


def _staged_time_rolling_sql() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
SELECT event_id, user_id,
       CAST(COUNT(cents) OVER w6 AS BIGINT) AS n_600s,
       CAST(SUM(cents) OVER w6 AS BIGINT) AS sum_cents_600s,
       CAST(COUNT(cents) OVER w36 AS BIGINT) AS n_3600s,
       CAST(SUM(cents) OVER w36 AS BIGINT) AS sum_cents_3600s
FROM e
WINDOW
  w6 AS (PARTITION BY user_id ORDER BY us
         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
  w36 AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def _staged_interval_join_sql() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
s0 AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
s1 AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM s0),
ses AS (
  SELECT user_id, session_id,
         MIN(us) AS su, MAX(us) AS eu,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s1 GROUP BY 1, 2)
SELECT e.event_id, e.user_id,
       CAST(ses.session_id AS BIGINT) AS session_id,
       ses.n_events,
       CAST(ses.eu - ses.su AS BIGINT) AS duration_us
FROM e JOIN ses
  ON e.user_id = ses.user_id AND e.us BETWEEN ses.su AND ses.eu
"""


def _staged_gopher_sql() -> str:
    from audiopro_essentia_spark.duck_twins import gopher_sql, synth_lines_sql

    demo = f"""
WITH w AS (SELECT doc_id,
        list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
      FROM documents),
ln AS (SELECT doc_id,
    {synth_lines_sql()} || chr(10) || 'the and that have with' AS lined
  FROM w)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CASE
    WHEN doc_id % 29 = 0 THEN array_to_string(
      list_transform(string_split(lined, chr(10)), l -> '- ' || l), chr(10))
    WHEN doc_id % 13 = 0 THEN array_to_string(
      list_transform(string_split(lined, chr(10)), l -> l || '...'), chr(10))
    WHEN doc_id % 11 = 0 THEN lined || ' ########'
    ELSE lined END AS text
  FROM ln"""
    return gopher_sql(min_words=20, max_words=90, table=f"({demo}) AS t2")


def _staged_edit_neardup_sql() -> str:
    from audiopro_essentia_spark.duck_twins import simhash_pairs_sql

    cand = simhash_pairs_sql(ngram=2, max_hamming=3, table="docs_p")
    return f"""
WITH docs_p AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) + 1000000, left(text, length(text) - 1) || 'X'
  FROM documents
  WHERE doc_id % 41 = 0 AND text IS NOT NULL AND length(text) >= 1),
cand AS ({cand})
SELECT c.id_a, c.id_b, c.hamming,
  CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
FROM cand c
JOIN docs_p a ON a.doc_id = c.id_a
JOIN docs_p b ON b.doc_id = c.id_b
WHERE levenshtein(a.text, b.text) <= 3
"""


def q_staged_pq_ann(spark, sf_dir):
    """Similarity: product-quantization ADC top-k (operators/pq) — the
    memory-scale member of the ANN family (brute / sign-LSH / IVF / PQ):
    vectors live as m_sub small integer codes (8 bytes vs 256 at dim-64
    f32), query distance is m_sub table lookups. Codebook = md5-ordered
    distinct init + ONE Lloyd refinement with exact round(v*1e9) BIGINT
    sums (partition-order-free), so the trained codebook — and therefore
    codes, ADC distances, and ranks — is bit-identical to the DuckDB
    twin (duck_twins.pq_ann_sql), which replays the whole chain."""
    from audiopro_essentia_spark.operators.pq import pq_codebook, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    codebook = pq_codebook(emb, m_sub=8, k=16, iters=1)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(emb, q, codebook, k_top=10)


def q_staged_priority_sample(spark, sf_dir):
    """Sampling: Duffield-Lund-Thorup priority sampling — weighted
    sampling WITHOUT replacement, k=20 per source, with unbiased
    Horvitz-Thompson adj_weight (sum(adj_weight) estimates the
    stratum's total weight; exact when the stratum has <= k rows).
    The content-hash uniform makes the sample reproducible across
    engines and corpus growth, and the whole priority chain is
    exact-integer md5 bits through one add + two IEEE divisions, so
    the twin is BIT-identical (no pow/ln transcendentals — the
    temperature_sample hazard designed out). Scale: rank <= k+1 hits
    WindowGroupLimit (each map task forwards <= k+1 rows per stratum);
    tau rides the SAME exchange (functions/sampling.py
    priority_sample; reference analog: the per-source cap in
    extractor.py's batch scheduler is a uniform truncation — this is
    its statistically honest replacement)."""
    from audiopro_essentia_spark.functions.sampling import priority_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return priority_sample(d, k=20)


def q_staged_line_scrub(spark, sf_dir):
    """Cleaning/dedup: CCNet/C4 corpus-frequency line scrubbing — every
    non-empty line appearing in >= 5 distinct docs is boilerplate and is
    removed from ALL docs (no canonical keeper; a line that common is
    template, not content). Demo corpus: the synthesize_lines lined text
    plus two per-source footer lines ('subscribe' / copyright), so every
    source's footers hit doc-freq ~ docs-per-source >> 5 and get
    scrubbed while organic lines survive. ONE corpus-scale shuffle on
    the 64-bit line key serves both the per-(doc,line) collapse and the
    doc-frequency window (operators/dedup.py line_scrub; reference
    analog: the validator's template rejection in validator.py is
    per-file — corpus-frequency needs the join)."""
    from audiopro_essentia_spark.functions.cleaning import synthesize_lines
    from audiopro_essentia_spark.operators.dedup import line_scrub

    # spread BEFORE the line synthesis (md5-per-sentence) — it ran on
    # the single-row-group scan partition (r6; no-op at scale)
    d = D._spread(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    lined = F.concat(
        synthesize_lines(F.col("text")),
        F.lit("\n=== subscribe to "),
        F.col("source"),
        F.lit(" weekly ===\n(c) 2026 "),
        F.col("source"),
    )
    return line_scrub(
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"), lined.alias("text")
        ),
        min_doc_freq=5,
    )


def _staged_line_scrub_sql() -> str:
    from audiopro_essentia_spark.duck_twins import (
        line_scrub_sql,
        synth_lines_sql,
    )

    demo = f"""
WITH w AS (SELECT doc_id, source,
        list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
      FROM documents),
ln AS (SELECT doc_id, {synth_lines_sql()} || chr(10) || '=== subscribe to '
    || source || ' weekly ===' || chr(10) || '(c) 2026 ' || source AS text
  FROM w)
SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM ln"""
    return line_scrub_sql(min_doc_freq=5, table=f"({demo}) AS t2")


def q_staged_funnel(spark, sf_dir):
    """Temporal analytics: per-user ordered funnel over the events
    table — signup -> view -> click -> purchase, each step the
    earliest matching event STRICTLY AFTER the previous step, within
    an anchored 7-day conversion window. Exact BIGINT epoch-micros
    chains + depth, so the oracle hash is exact (no rounding). ONE
    hash shuffle on user_id, zero Python, type filter pushed to the
    parquet scan (operators/temporal.py funnel_steps; the ordered
    complement of sessionize's gap-islands on the same table)."""
    from audiopro_essentia_spark.operators.temporal import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev,
        ("signup", "view", "click", "purchase"),
        max_span_seconds=7 * 86400,
    )


def q_staged_cohort(spark, sf_dir):
    """Temporal analytics: daily cohort-retention grid over events —
    users cohorted by the epoch-anchored day of their first event,
    n_active = EXACT distinct users of that cohort active at each
    day offset, retention round-6 on exact ints. One corpus-scale
    shuffle (window-min cohorting on user; the distinct reuses it via
    the subset rule), one FileScan, zero Python
    (operators/temporal.py cohort_retention)."""
    from audiopro_essentia_spark.operators.temporal import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), period_seconds=86400)


def q_staged_cdc(spark, sf_dir):
    """Dedup: content-defined chunking shift-robustness demo — chunk
    every doc AND a perturbed twin with one word inserted after word 5,
    then count per doc the multiset intersection of chunk fingerprints
    (sum of min counts). CDC's whole point: the insertion shifts every
    later word's POSITION but not its content, so boundaries realign
    and most fingerprints survive — where a whole-doc digest survives
    zero. Exact integers end-to-end (operators/dedup.py cdc_chunks;
    Muthitacharoen et al. SOSP 2001)."""
    from audiopro_essentia_spark.operators.dedup import cdc_chunks

    # spread once at the top: BOTH cdc passes and the perturbed-twin
    # text build hang off this frame (the twin build otherwise ran on
    # the single-row-group scan partition; r6, no-op at scale)
    d = D._spread(
        _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )
    pw = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    pert = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.slice(pw, 1, 5),
            F.lit("INSERTED"),
            F.when(F.size(pw) > 5, F.slice(pw, 6, 1_000_000_000))
            .otherwise(F.array().cast("array<string>")),
        ).alias("text"),
    )
    ga = (
        cdc_chunks(d, divisor=8, window_words=3)
        .groupBy("doc_id", "chunk_md5")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    gb = (
        cdc_chunks(pert, divisor=8, window_words=3)
        .groupBy("doc_id", "chunk_md5")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    j = ga.join(gb, ["doc_id", "chunk_md5"], "full_outer")
    return j.groupBy("doc_id").agg(
        F.sum(F.coalesce("ca", F.lit(0))).cast("long").alias("n_chunks"),
        F.sum(F.coalesce("cb", F.lit(0))).cast("long").alias("n_chunks_pert"),
        F.sum(
            F.least(F.coalesce("ca", F.lit(0)), F.coalesce("cb", F.lit(0)))
        )
        .cast("long")
        .alias("n_shared"),
    )


def _staged_cdc_sql() -> str:
    from audiopro_essentia_spark.duck_twins import cdc_chunks_sql

    pert = """(
SELECT doc_id, array_to_string(
    list_slice(pw, 1, 5) || ['INSERTED'] ||
    CASE WHEN len(pw) > 5 THEN list_slice(pw, 6, len(pw)) ELSE [] END,
    ' ') AS text
FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             list_filter(string_split(coalesce(text, ''), ' '),
                         x -> x <> '') AS pw
      FROM documents)) AS pt"""
    orig = cdc_chunks_sql(
        divisor=8, window_words=3,
        table="(SELECT CAST(doc_id AS BIGINT) AS doc_id, text "
              "FROM documents) AS ot",
    )
    perturbed = cdc_chunks_sql(divisor=8, window_words=3, table=pert)
    return f"""
WITH ca AS MATERIALIZED (
  SELECT doc_id, chunk_md5, count(*) AS ca FROM ({orig}) GROUP BY ALL),
cb AS MATERIALIZED (
  SELECT doc_id, chunk_md5, count(*) AS cb FROM ({perturbed}) GROUP BY ALL),
j AS (
  SELECT coalesce(ca.doc_id, cb.doc_id) AS doc_id,
         coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb
    ON ca.doc_id = cb.doc_id AND ca.chunk_md5 = cb.chunk_md5)
SELECT doc_id, CAST(sum(ca) AS BIGINT) AS n_chunks,
       CAST(sum(cb) AS BIGINT) AS n_chunks_pert,
       CAST(sum(least(ca, cb)) AS BIGINT) AS n_shared
FROM j GROUP BY doc_id
"""


def q_staged_npmi(spark, sf_dir):
    """Text analysis: NPMI collocation mining over the documents table
    (Church-Hanks PMI, Bouma-normalized) — top-200 adjacent word pairs
    by npmi at min pair count 5, every ln taken once on an exact BIGINT
    and rounded to integer micro-nats (the DSIR/BM25/drift discipline),
    global top-k via TakeOrderedAndProject with a (npmi DESC, w1, w2)
    total order so the cut is deterministic cross-engine
    (operators/tfidf.py npmi_collocations)."""
    from audiopro_essentia_spark.operators.tfidf import npmi_collocations

    return npmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, top_k=200
    )


def q_staged_allpairs(spark, sf_dir):
    """Dedup: LOSSLESS prefix-filtered all-pairs Jaccard join (Bayardo
    et al. WWW'07 AllPairs; operators/dedup.py allpairs_jaccard_pairs)
    over the corpus plus perturbed twins — doc_id % 37 docs re-issued
    as id+1e6 with ONE word appended, a near-dup at J = m/(m+1) over m
    original shingles, so every twin with >= 9 shingles (>= 11 words)
    qualifies at the 0.9 threshold. Pure BIGINT threshold math (micro-
    units), exact integer inter/union, one round-6 division."""
    from audiopro_essentia_spark.operators.dedup import allpairs_jaccard_pairs

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    pert = d.filter(
        (F.col("doc_id") % 37 == 0) & F.col("text").isNotNull()
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zqxneardup")).alias("text"),
    )
    return allpairs_jaccard_pairs(
        d.unionByName(pert), threshold=0.9
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        "jaccard",
    )


def _staged_allpairs_sql() -> str:
    prelude = """docs_p AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) + 1000000, text || ' zqxneardup'
  FROM documents WHERE doc_id % 37 = 0 AND text IS NOT NULL)"""
    return DT.allpairs_jaccard_sql(
        threshold=0.9, table="docs_p", prelude_cte=prelude
    )


def q_staged_containment(spark, sf_dir):
    """Dedup: LOSSLESS asymmetric containment join (C(A, B) =
    |A inter B| / |A| >= t; operators/dedup.py containment_pairs) over
    the corpus plus SUPERSET twins — doc_id % 41 docs re-issued as
    id+2e6 with a lead-in prepended and a footer appended, so every
    original's shingles sit contiguously intact inside its twin:
    C(orig, twin) is EXACTLY 1.0 while Jaccard ~ m/(m+6) never clears
    a symmetric 0.9 bar — the quote/subset/re-crawl-with-footer regime
    allpairs_jaccard structurally cannot surface. Pure BIGINT prefix +
    acceptance math, one round-6 division."""
    from audiopro_essentia_spark.operators.dedup import containment_pairs

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )
    pert = d.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.lit("zqc lead in words "),
            F.col("text"),
            F.lit(" zqc trailing footer"),
        ).alias("text"),
    )
    return containment_pairs(d.unionByName(pert), threshold=0.9).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "n_inter",
        "n_a",
        "n_b",
        "containment",
    )


def _staged_containment_sql() -> str:
    prelude = """docs_c AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id IS NOT NULL
  UNION ALL
  SELECT CAST(doc_id AS BIGINT) + 2000000,
         'zqc lead in words ' || text || ' zqc trailing footer'
  FROM documents
  WHERE doc_id % 41 = 0 AND text IS NOT NULL AND doc_id IS NOT NULL)"""
    return DT.containment_pairs_sql(
        threshold=0.9, table="docs_c", prelude_cte=prelude
    )


_DQ_CHECKS = [
    {"name": "text_present", "column": "text", "kind": "completeness",
     "threshold": 0.99},
    {"name": "lang_present", "column": "lang", "kind": "completeness",
     "threshold": 0.99},
    {"name": "id_unique", "column": "doc_id", "kind": "uniqueness",
     "threshold": 1.0},
    {"name": "lang_cardinality", "column": "lang", "kind": "distinctness",
     "threshold": 0.000001},
    {"name": "chars_min", "column": "n_chars", "kind": "min_ge",
     "bound": 1.0},
    {"name": "chars_max", "column": "n_chars", "kind": "max_le",
     "bound": 1000000.0},
    {"name": "chars_mean", "column": "n_chars", "kind": "mean_ge",
     "bound": 100.0},
    {"name": "lang_shape", "column": "lang", "kind": "pattern",
     "threshold": 0.9, "pattern": "[a-z]{2}"},
    {"name": "lang_known", "column": "lang", "kind": "in_set",
     "threshold": 0.9, "values": ["en", "de", "fr", "es", "zh"]},
]


def q_staged_dq(spark, sf_dir):
    """Governance: declarative Deequ-style data-quality constraint
    suite (operators/checks.py quality_checks) verified per source —
    completeness / key-uniqueness / distinctness / numeric bounds /
    exact-integer mean bound / full-match pattern / closed-set
    membership, one verdict row per (source, check). Every PASS/FAIL
    is an exact integer comparison (micro-unit thresholds); fraction
    metrics are one correctly-rounded BIGINT division + round-6. ONE
    shared map-side-combinable corpus pass + one value-frequency pass
    per uniqueness/distinctness column, zero Python."""
    from audiopro_essentia_spark.operators.checks import quality_checks

    d = _t(spark, sf_dir, "documents").where(F.col("source").isNotNull())
    return quality_checks(d, _DQ_CHECKS, ["source"])


def _staged_dq_sql() -> str:
    return DT.quality_checks_sql(
        "SELECT source, doc_id, text, lang, n_chars FROM documents "
        "WHERE source IS NOT NULL",
        _DQ_CHECKS,
        ("source",),
    )


def q_staged_boot_ci(spark, sf_dir):
    """Uncertainty: deterministic hash-Poisson bootstrap CI (Chamandy
    et al. 2012 — the map-reduce bootstrap; operators/bootstrap.py
    bootstrap_ci) for the per-source mean token count — the error bars
    every per-source monitor (drift, robust_stats, corpus_rollup)
    reports point values without. Replicate weights are portable-hash
    Poisson(1) inverse-CDF draws (exact integer threshold compares,
    never an RNG), replicate means correctly-rounded micro integers,
    CI bounds type-1 order statistics of ACTUAL replicate means. One
    corpus pass + one explode(B)-widened map-side-combinable pass;
    everything downstream bounded by sources x B."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.bootstrap import bootstrap_ci

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("source").alias("grp"),
            F.col("doc_id").cast("string").alias("rid"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return bootstrap_ci(d, "v", "rid", ["grp"], b_reps=40, alpha=0.05)


def _staged_boot_ci_sql() -> str:
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return DT.bootstrap_ci_sql(
        f"SELECT source AS grp, CAST(doc_id AS VARCHAR) AS id, "
        f"CAST({nw} AS DOUBLE) AS v FROM documents "
        "WHERE source IS NOT NULL AND doc_id IS NOT NULL",
        ("grp",),
        b_reps=40,
        alpha=0.05,
    )


def q_staged_cusum(spark, sf_dir):
    """Monitoring: Page's two-sided CUSUM changepoint monitor
    (operators/temporal.py cusum_changepoints) over per-type DAILY
    event counts vs each type's own mean daily count — the sequential
    drift detector that alarms on a sustained shift where per-point
    snapshots (drift_psi / ks_drift) stay quiet. Closed form
    S = P - min(0, running-min P) over ONE named sort key (one Sort,
    CollapseWindow merges all three windows); exact HUGEINT prefix
    sums, exact integer alarms; input is the bounded (type, day)
    monitor series, never the corpus."""
    from audiopro_essentia_spark.operators.temporal import (
        cusum_changepoints,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("_d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    base = daily.groupBy("event_type").agg(
        F.round(
            F.sum("_cnt").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("_mu")
    )
    joined = daily.join(F.broadcast(base), "event_type")
    return cusum_changepoints(
        joined, "_cnt", "_d", "_mu", ["event_type"], k=2.0, h=20.0
    )


def _staged_cusum_sql() -> str:
    daily = (
        "SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS dd,"
        " CAST(count(*) AS BIGINT) AS cnt FROM events "
        "WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2"
    )
    src = (
        f"WITH daily AS ({daily}), "
        "b AS (SELECT event_type, round(CAST(sum(cnt) AS DOUBLE) / "
        "CAST(count(*) AS DOUBLE), 6) AS mu FROM daily GROUP BY 1) "
        "SELECT d.event_type, epoch_us(d.dd) AS t, "
        "CAST(d.cnt AS DOUBLE) AS x, b.mu AS mu "
        "FROM daily d JOIN b USING (event_type)"
    )
    return DT.cusum_sql(src, ("event_type",), k=2.0, h=20.0)


def q_staged_ab_welch(spark, sf_dir):
    """Experimentation: Welch's unequal-variance two-sample test
    (operators/evalmetrics.py ab_welch_test) of event value between
    the 'view' (control) and 'purchase' (treatment) cohorts per
    user-id decile — the experiment-analysis tier: the monitors say a
    metric MOVED, this says whether two named cohorts differ by more
    than noise. Exact HUGEINT sufficient statistics in ONE map-side-
    combinable aggregate; the v/se/t/df double chain in one fixed
    expression order; significance = rounded |t| vs the driver-side
    normal critical literal; se=0 and n<2 degenerate contracts NULL
    instead of raising on ANSI /0."""
    from audiopro_essentia_spark.operators.evalmetrics import ab_welch_test

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = ev.select(
        (F.col("user_id") % 10).cast("long").alias("cohort"),
        F.col("event_type").alias("variant"),
        F.col("value").alias("v"),
    )
    return ab_welch_test(
        d, "v", "variant", "view", "purchase", ["cohort"], alpha=0.05
    )


def _staged_ab_welch_sql() -> str:
    return DT.ab_welch_test_sql(
        "SELECT user_id % 10 AS cohort, event_type AS v, value AS x "
        "FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL "
        "AND user_id IS NOT NULL",
        "view",
        "purchase",
        ("cohort",),
        alpha=0.05,
    )


_BT_ORIGINS = [1_704_844_800_000_000, 1_705_276_800_000_000,
               1_705_708_800_000_000]  # 2024-01-10 / -15 / -20 UTC
_BT_HORIZON = 5 * 86_400_000_000
_BT_EMBARGO = 86_400_000_000


def q_staged_backtest(spark, sf_dir):
    """Splits: rolling-origin backtest folds with embargo (functions/
    sampling.py backtest_folds — the time-series counterpart of
    leak_split's cluster-atomic guard; Lopez de Prado purging/embargo,
    Tashman rolling origin) over events at three explicit origins,
    5-day test horizon, 1-day embargo: every boundary an exact BIGINT
    micros comparison, each row exploding only its qualifying (fold,
    role) pairs from an in-row literal fold array — ZERO shuffles
    (plan-pinned: no Exchange)."""
    from audiopro_essentia_spark.functions.sampling import backtest_folds

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select("event_id", "ts")
    )
    return backtest_folds(
        ev, "ts", _BT_ORIGINS, _BT_HORIZON, _BT_EMBARGO
    ).select("fold", "role", "t_us", "event_id")


def _staged_backtest_sql() -> str:
    return DT.backtest_folds_sql(
        "SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id "
        "FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL",
        _BT_ORIGINS,
        _BT_HORIZON,
        _BT_EMBARGO,
        passthrough=("event_id",),
    )


def q_staged_hill(spark, sf_dir):
    """Tail statistics: Hill heavy-tail exponent (Hill 1975;
    operators/aggregates.py hill_tail_index) of per-doc token counts
    per source — the TAIL companion of zipf_slope's head fit and
    robust_stats' outlier gate: alpha < 2 means the length tail is
    heavy enough that means/variances are sample-size-unstable (the
    truncation-budget question). Multiset order statistics off the
    shared histogram-prefix engine, micro-nat rln terms summed
    exactly, one division; zero-token docs pre-filtered (ln needs
    x > 0 — the operator fails LOUD otherwise)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import (
        hill_tail_index,
    )

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(w).cast("double").alias("v"),
        )
        .where(F.col("v") > 0)
    )
    return hill_tail_index(d, "v", ["src"], k=20)


def _staged_hill_sql() -> str:
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return DT.hill_tail_index_sql(
        f"SELECT src, v FROM (SELECT source AS src, CAST({nw} AS DOUBLE)"
        " AS v FROM documents WHERE source IS NOT NULL) t WHERE v > 0",
        ("src",),
        k=20,
    )


def q_staged_winsorize(spark, sf_dir):
    """Repair: per-source winsorization of doc token counts at the
    exact type-1 p5/p95 quantiles (operators/aggregates.py winsorize)
    — the row-level REPAIR companion of robust_stats' outlier monitor:
    giants clamp down to an ACTUAL data value (idempotent,
    pytest-pinned), clamping is an exact integer compare in micro
    space. One histogram corpus pass + the shared prefix engine; the
    only corpus join is the broadcast group-bounds join-back."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import winsorize

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").cast("string").alias("rid"),
            F.size(w).cast("double").alias("v"),
        )
    )
    return winsorize(d, "v", "rid", ["src"], q_lo=0.05, q_hi=0.95)


def _staged_winsorize_sql() -> str:
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return DT.winsorize_sql(
        f"SELECT source AS src, CAST(doc_id AS VARCHAR) AS id, "
        f"CAST({nw} AS DOUBLE) AS v FROM documents "
        "WHERE source IS NOT NULL AND doc_id IS NOT NULL",
        ("src",),
        q_lo=0.05,
        q_hi=0.95,
    )


def q_staged_neg(spark, sf_dir):
    """Contrastive data prep: k=2 deterministic corpus-uniform
    negative pairs per document (functions/sampling.py
    negative_samples) — the corpus-negative regime in-batch sampling
    approximates, reproducible as a pure function of (seed, id, draw)
    so shard regeneration / resume / re-runs rebuild identical pairs.
    epoch_shuffle's two-phase dense rank supplies positions (no
    global window in the operator path); draws land by ONE position
    equi-join; self-pairs filtered (collision steps to the next
    position)."""
    from audiopro_essentia_spark.functions.sampling import (
        negative_samples,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )
    return negative_samples(d, "doc_id", k=2, seed="r4neg")


def _staged_neg_sql() -> str:
    return DT.negative_samples_sql(
        "SELECT CAST(doc_id AS BIGINT) AS id FROM documents "
        "WHERE doc_id IS NOT NULL",
        k=2,
        seed="r4neg",
    )


def q_staged_qbin(spark, sf_dir):
    """Feature binning: per-source EQUAL-FREQUENCY quintile bins of
    doc word counts at exact type-1 quantiles
    (operators/aggregates.py quantile_bin) — the categorical-feature
    companion of winsorize's clamp: downstream target encoders /
    contingency tests consume the bin id, not the raw heavy-tailed
    count. Boundaries are ACTUAL data values, assignment is an exact
    integer compare in micro space, heavy ties empty bins rather than
    split a tie run. One histogram corpus pass + the shared prefix
    engine; the only corpus join is the broadcast group-bounds
    join-back."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import quantile_bin

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").cast("string").alias("rid"),
            F.size(w).cast("double").alias("v"),
        )
    )
    return quantile_bin(d, "v", "rid", ["src"], n_bins=5)


def _staged_qbin_sql() -> str:
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return DT.quantile_bin_sql(
        f"SELECT source AS src, CAST(doc_id AS VARCHAR) AS id, "
        f"CAST({nw} AS DOUBLE) AS v FROM documents "
        "WHERE source IS NOT NULL AND doc_id IS NOT NULL",
        ("src",),
        n_bins=5,
    )


_CF_T1 = 1_705_363_200_000_000  # 2024-01-16 UTC
_CF_T2 = 1_705_968_000_000_000  # 2024-01-23 UTC


def q_staged_conformal(spark, sf_dir):
    """Uncertainty: split conformal prediction intervals (Vovk;
    Lei et al. 2018; operators/bootstrap.py conformal_intervals) —
    the distribution-free per-prediction wrapper: predictor = per-type
    exact-integer mean value over Jan 1-15, calibration residuals from
    Jan 16-22, intervals attached to every Jan 23+ event; coverage
    >= 90% guaranteed under exchangeability no matter how crude the
    predictor. q_hat is an ACTUAL calibration residual selected by the
    exact (n+1)-ceil-rank rule off the shared histogram-prefix
    engine."""
    from audiopro_essentia_spark.operators.bootstrap import (
        conformal_intervals,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_t"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("_vm"),
            F.col("value"),
        )
    )
    train = (
        ev.where(F.col("_t") < _CF_T1)
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("_vm").cast("double")
                / (F.count(F.lit(1)) * F.lit(1_000_000)).cast("double"),
                6,
            ).alias("pred")
        )
    )
    calib = (
        ev.where((F.col("_t") >= _CF_T1) & (F.col("_t") < _CF_T2))
        .join(F.broadcast(train), "event_type")
        .select("event_type", "pred", F.col("value").alias("label"))
    )
    new = (
        ev.where(F.col("_t") >= _CF_T2)
        .join(F.broadcast(train), "event_type")
        .select(
            "event_type",
            F.col("event_id").cast("string").alias("rid"),
            "pred",
        )
    )
    return conformal_intervals(
        calib, new, "pred", "label", "rid", ["event_type"], alpha=0.1
    )


def _staged_conformal_sql() -> str:
    ev = (
        "SELECT event_type, event_id, "
        "epoch_us(CAST(ts AS TIMESTAMP)) AS t, "
        "CAST(round(value * 1000000) AS BIGINT) AS vm, value "
        "FROM events WHERE value IS NOT NULL AND ts IS NOT NULL "
        "AND event_type IS NOT NULL AND event_id IS NOT NULL"
    )
    train = (
        f"SELECT event_type, round(CAST(sum(vm) AS DOUBLE) / "
        f"CAST(count(*) * 1000000 AS DOUBLE), 6) AS pred "
        f"FROM ({ev}) e WHERE t < {_CF_T1} GROUP BY event_type"
    )
    cal = (
        f"WITH tr AS ({train}) "
        f"SELECT e.event_type, tr.pred, e.value AS label "
        f"FROM ({ev}) e JOIN tr USING (event_type) "
        f"WHERE e.t >= {_CF_T1} AND e.t < {_CF_T2}"
    )
    new = (
        f"WITH tr AS ({train}) "
        f"SELECT e.event_type, CAST(e.event_id AS VARCHAR) AS id, tr.pred "
        f"FROM ({ev}) e JOIN tr USING (event_type) WHERE e.t >= {_CF_T2}"
    )
    return DT.conformal_intervals_sql(cal, new, ("event_type",), alpha=0.1)


_KM_DAY = 86_400_000_000


def q_staged_km(spark, sf_dir):
    """Survival: Kaplan-Meier censoring-correct time-to-first-purchase
    curves (operators/temporal.py kaplan_meier) per user cohort —
    duration = whole days from a user's first event to their first
    purchase, ADMINISTRATIVELY CENSORED at day 3 (users who purchase
    later, or never, are censored at 3: still purchase-free when the
    observation window closed — a naive conversion rate would misread
    them as never-converting, the distinction KM exists for). Exact
    integer durations/flags, micro-nat ln factors summed exactly,
    exp + round-6; curve rows live on the bounded distinct-duration
    table."""
    from audiopro_essentia_spark.operators.temporal import kaplan_meier

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per = ev.groupBy("user_id").agg(
        F.min(us).alias("_f"),
        F.max(us).alias("_l"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("_fp"),
    )
    d0 = F.expr(
        f"CAST((coalesce(_fp, _l) - _f) div {_KM_DAY} AS BIGINT)"
    )
    ev0 = F.col("_fp").isNotNull()
    d = per.select(
        (F.col("user_id") % 3).cast("long").alias("cohort"),
        F.least(d0, F.lit(3).cast("long")).alias("dur"),
        (ev0 & (d0 <= 3)).cast("long").alias("converted"),
    )
    return kaplan_meier(d, "dur", "converted", ["cohort"])


def _staged_km_sql() -> str:
    src = (
        "SELECT user_id % 3 AS cohort, "
        "least(d0, 3) AS dur, "
        "CAST(fp IS NOT NULL AND d0 <= 3 AS BIGINT) AS ev FROM ("
        "SELECT user_id, (coalesce(fp, l) - f) // {d} AS d0, fp FROM ("
        "SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS f, "
        "max(epoch_us(CAST(ts AS TIMESTAMP))) AS l, "
        "min(CASE WHEN event_type = 'purchase' THEN "
        "epoch_us(CAST(ts AS TIMESTAMP)) END) AS fp FROM events "
        "WHERE ts IS NOT NULL AND user_id IS NOT NULL "
        "GROUP BY user_id) u) v"
    ).format(d=_KM_DAY)
    return DT.kaplan_meier_sql(src, ("cohort",))


_FS_FIELDS = [
    {"name": "lang", "col_a": "lang_a", "col_b": "lang_b",
     "m": 0.95, "u": 0.2},
    {"name": "src", "col_a": "src_a", "col_b": "src_b",
     "m": 0.9, "u": 0.05},
    {"name": "band", "col_a": "band_a", "col_b": "band_b",
     "m": 0.8, "u": 0.1},
]


def q_staged_fs(spark, sf_dir):
    """Entity resolution: Fellegi-Sunter probabilistic linkage scoring
    (Fellegi & Sunter 1969; operators/linkage.py fs_link_scores) over
    consecutive-id candidate pairs compared on lang / source /
    length-band — the decision model that turns ANY blocking stage's
    candidates (minhash/simhash/allpairs/containment) into
    link / possible / non_link verdicts. Both weights per field are
    driver-side integer micro-nat LITERALS (no engine-side ln); the
    score is an exact BIGINT sum and every decision an exact integer
    compare; missing fields contribute zero (no evidence). Scoring is
    ZERO-shuffle (one codegen projection; the only exchange belongs to
    the demo's pair join)."""
    from audiopro_essentia_spark.operators.linkage import fs_link_scores

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            F.col("doc_id").cast("long").alias("id"),
            "lang",
            "source",
            F.expr("CAST(n_chars div 200 AS BIGINT)").alias("band"),
        )
    )
    a = d.select(
        (F.col("id") + 1).alias("_k"),
        F.col("id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("src_a"),
        F.col("band").alias("band_a"),
    )
    b = d.select(
        F.col("id").alias("_k"),
        F.col("id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("src_b"),
        F.col("band").alias("band_b"),
    )
    pairs = a.join(b, "_k").drop("_k")
    return fs_link_scores(pairs, _FS_FIELDS, lower=0.0, upper=4.0)


def _staged_fs_sql() -> str:
    src = (
        "WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id, lang, source, "
        "CAST(n_chars // 200 AS BIGINT) AS band FROM documents "
        "WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL) "
        "SELECT a.id AS id_a, b.id AS id_b, a.lang AS lang_a, "
        "b.lang AS lang_b, a.source AS src_a, b.source AS src_b, "
        "a.band AS band_a, b.band AS band_b "
        "FROM d a JOIN d b ON a.id + 1 = b.id"
    )
    return DT.fs_link_scores_sql(src, _FS_FIELDS, lower=0.0, upper=4.0)


def q_staged_snb(spark, sf_dir):
    """Entity resolution: sorted-neighborhood blocking (Hernández &
    Stolfo merge/purge; operators/linkage.py sorted_neighborhood) —
    per-source candidate pairs between documents ADJACENT in
    word-count order (window 2): the blocking stage for keys that are
    CLOSE but not equal, where equi-join blocking can't put
    near-misses in one bucket; its pairs feed fs_link_scores exactly
    like the hash-blocking families. Total order is (key, id) so key
    ties are deterministic; all lead() columns share ONE window spec
    over named sort columns — one Exchange + one Sort, zero joins,
    zero Python."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.linkage import (
        sorted_neighborhood,
    )

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").cast("long").alias("rid"),
            F.size(w).cast("long").alias("k"),
        )
    )
    return sorted_neighborhood(d, "rid", "k", ["src"], window=2)


def _staged_snb_sql() -> str:
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return DT.sorted_neighborhood_sql(
        f"SELECT source AS src, CAST(doc_id AS BIGINT) AS id, "
        f"CAST({nw} AS BIGINT) AS k FROM documents "
        "WHERE source IS NOT NULL AND doc_id IS NOT NULL",
        ("src",),
        window=2,
    )


def q_staged_golden(spark, sf_dir):
    """Entity resolution: survivorship / golden-record merge
    (linkage.golden_records) — synthetic duplicate clusters
    (doc_id % 97) collapse to one canonical row each: majority-wins
    election per field (lang / source / length band) with the
    deterministic (count DESC, value ASC) tie-break and per-field
    support counts, representative = the longest member (rank =
    n_chars, ties by id). One melted pass -> map-side-combinable
    value counts -> bounded election windows -> conditional-agg
    pivot; zero Python, zero corpus-partition windows. The stage
    after blocking (sorted_block/minhash) -> scoring (fs_linkage) ->
    clustering (dedup_clusters)."""
    from audiopro_essentia_spark.operators.linkage import golden_records

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("doc_id").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
            & F.col("n_chars").isNotNull()
        )
        .select(
            (F.col("doc_id") % 97).alias("cl"),
            F.col("doc_id").alias("rid"),
            F.col("n_chars").cast("double").alias("rk"),
            "lang",
            "source",
            F.expr("CAST(n_chars div 500 AS BIGINT)").alias("band"),
        )
    )
    return golden_records(
        d, "cl", "rid", ["lang", "source", "band"], rank_col="rk"
    )


def _staged_golden_sql() -> str:
    return DT.golden_records_sql(
        "SELECT CAST(doc_id % 97 AS VARCHAR) AS cluster, "
        "CAST(doc_id AS VARCHAR) AS id, "
        "CAST(n_chars AS DOUBLE) AS rk, lang, source, "
        "CAST(n_chars // 500 AS VARCHAR) AS band FROM documents "
        "WHERE doc_id IS NOT NULL AND lang IS NOT NULL "
        "AND source IS NOT NULL AND n_chars IS NOT NULL",
        ("lang", "source", "band"),
    )


def q_staged_refint(spark, sf_dir):
    """Cross-table governance: referential-integrity audit of the
    orders -> customer star edge (checks.ref_integrity), with a
    deterministic perturbed-twin demo so every branch is live: orders
    whose o_orderkey % 53 == 0 get their custkey shifted out of range
    (orphans), and customers whose c_custkey % 37 == 0 are re-issued
    once (duplicate parent keys). One key-histogram per side + ONE
    full-outer histogram join (never a row-level join), exact counts,
    micro-rounded rates."""
    from audiopro_essentia_spark.operators.checks import ref_integrity

    child = _t(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 53 == 0,
            F.col("o_custkey") + F.lit(1_000_000),
        )
        .otherwise(F.col("o_custkey"))
        .alias("k0")
    )
    cust = _t(spark, sf_dir, "customer")
    parent = cust.select(F.col("c_custkey").alias("k0")).unionAll(
        cust.where(F.col("c_custkey") % 37 == 0).select(
            F.col("c_custkey").alias("k0")
        )
    )
    return ref_integrity(child, parent, ["k0"], ["k0"])


def _staged_refint_sql() -> str:
    return DT.ref_integrity_sql(
        "SELECT CASE WHEN o_orderkey % 53 = 0 THEN o_custkey + 1000000 "
        "ELSE o_custkey END AS k0 FROM orders",
        "SELECT c_custkey AS k0 FROM customer UNION ALL "
        "SELECT c_custkey AS k0 FROM customer WHERE c_custkey % 37 = 0",
        n_keys=1,
    )


def q_staged_dp(spark, sf_dir):
    """Governance: differentially-private corpus composition release —
    per-(source, lang) document counts with two-sided-geometric noise
    at epsilon=1 (checks.dp_counts; Ghosh-Roughgarden-Sundararajan's
    universally optimal sensitivity-1 count mechanism). The noise draw
    is the portable hash of salt ':' group under driver-side
    inverse-CDF threshold literals: one salt is ONE reproducible
    release, noise depends only on (salt, group) — never the data —
    and a fresh salt is a fresh epsilon spend. The committed demo salt
    makes this a reproducibility demo of the mechanism, NOT a private
    release (a real release needs a SECRET high-entropy salt — see
    dp_counts's keyed-PRF caveat). One map-side-combinable
    count shuffle + a codegen literal fold; zero joins, zero
    windows, zero Python."""
    from audiopro_essentia_spark.operators.checks import dp_counts

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("lang").isNotNull())
        .select(F.col("source").alias("src"), F.col("lang").alias("lng"))
    )
    return dp_counts(d, ["src", "lng"], epsilon=1.0, salt="r4release")


def _staged_dp_sql() -> str:
    return DT.dp_counts_sql(
        "SELECT source AS src, lang AS lng FROM documents "
        "WHERE source IS NOT NULL AND lang IS NOT NULL",
        ("src", "lng"),
        epsilon=1.0,
        salt="r4release",
    )


def q_staged_benford(spark, sf_dir):
    """Forensics: Benford first-significant-digit conformity
    (operators/checks.py benford_test) of event values per type — the
    fabricated/unit-mixed/truncated-numbers screen (organically-grown
    magnitudes follow log10(1+1/d); invented or clipped ones don't),
    with Pearson chi2 and Nigrini MAD conformity bands. Digit
    extraction is the STRING rendering of the micro BIGINT (no log10
    floor flicker at powers of ten); expected probabilities are
    driver-side literals; one map-side-combinable (type, digit) corpus
    pass onto a bounded 9-cell table."""
    from audiopro_essentia_spark.operators.checks import benford_test

    d = (
        _t(spark, sf_dir, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & (F.col("value") >= 1e-6)
        )
        .select("event_type", F.col("value").alias("v"))
    )
    return benford_test(d, "v", ["event_type"])


def _staged_benford_sql() -> str:
    return DT.benford_test_sql(
        "SELECT event_type, value AS v FROM events "
        "WHERE value IS NOT NULL AND event_type IS NOT NULL "
        "AND value >= 0.000001",
        ("event_type",),
    )


_ATE_E = {
    "purchase": 0.8, "click": 0.6, "view": 0.4, "signup": 0.3,
    "error": 0.2,
}


def q_staged_ate(spark, sf_dir):
    """Causal: Hajek IPW average treatment effect (operators/causal.py
    ate_ipw) per user cohort on a deterministically hash-assigned
    CONFOUNDED treatment — assignment probability depends on
    event_type (the portable-hash recipe, so both engines draw the
    same treatment), outcome = value + 2*t, so the naive as-assigned
    difference is biased by the type mix while IPW with the true
    design propensities reweights it out. Per-row weight = ONE
    correctly-rounded division; HUGEINT weighted sums; trimming is
    exclusion-with-count, never a silent clamp; Kish ESS per arm."""
    from audiopro_essentia_spark.functions.text import portable_hash32
    from audiopro_essentia_spark.operators.causal import ate_ipw

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    e = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in _ATE_E.items()
        ],
        F.lit(0.5),
    )
    h = portable_hash32(
        F.concat(F.lit("ate|"), F.col("event_id").cast("string"))
    )
    t = (
        (h % 1_000_000) < F.round(e * 1_000_000).cast("long")
    ).cast("long")
    d = ev.select(
        (F.col("user_id") % 5).cast("long").alias("cohort"),
        (F.col("value") + F.lit(2.0) * t).alias("y"),
        t.alias("t"),
        e.alias("e"),
    )
    return ate_ipw(d, "y", "t", "e", ["cohort"], trim=0.0)


def _staged_ate_sql() -> str:
    case = "CASE " + " ".join(
        f"WHEN event_type = '{k}' THEN {v}" for k, v in _ATE_E.items()
    ) + " ELSE 0.5 END"
    h = "(('0x' || substr(md5('ate|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT)"
    t = (
        f"CAST({h} % 1000000 < "
        f"CAST(round(({case}) * 1000000) AS BIGINT) AS BIGINT)"
    )
    src = (
        f"SELECT user_id % 5 AS cohort, value + 2.0 * ({t}) AS y, "
        f"{t} AS t, {case} AS e FROM events "
        "WHERE value IS NOT NULL AND event_type IS NOT NULL "
        "AND user_id IS NOT NULL AND event_id IS NOT NULL"
    )
    return DT.ate_ipw_sql(src, ("cohort",), trim=0.0)


def q_staged_readability(spark, sf_dir):
    """Text: exact-integer readability features per doc (functions/
    text.py readability_metrics) — ARI (Senter & Smith 1967), chosen
    over Flesch because every input is an exact integer count (no
    syllable heuristic): chars via space-and-ASCII-punctuation-
    stripped length (ARI counts letters+digits; never an
    aggregate() over the built words array — the re-inline hazard),
    maximal-[.!?]-run sentence count floored at 1 (never a /0 under
    ANSI), two correctly-rounded divisions in one fixed order +
    round-6. One codegen projection, zero shuffle."""
    from audiopro_essentia_spark.functions.text import readability_metrics

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    m = readability_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["n_letter_chars"].alias("n_letter_chars"),
        m["n_sentences"].alias("n_sentences"),
        m["ari"].alias("ari"),
    )


def _staged_readability_sql() -> str:
    return DT.readability_sql("documents")


def q_staged_zorder(spark, sf_dir):
    """Layout: Morton / Z-order clustering key over events on
    (user_id, event time) — the multi-column scan-pruning lever
    (operators/layout.py; the technique behind Delta/Iceberg OPTIMIZE
    ZORDER). Bounds are a 1-row broadcast min/max aggregate; bucketing
    is exact fixed-width BIGINT math; the key is an unrolled shift/mask
    interleave over the projected bucket columns — zero Python, and the
    only float op is the pmod-exact floor division."""
    from audiopro_essentia_spark.operators.layout import (
        with_zorder_key,
        zorder_bucket,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            F.col("user_id").cast("long").alias("u"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
    )
    bounds = ev.agg(
        F.min("u").alias("ulo"),
        F.max("u").alias("uhi"),
        F.min("t").alias("tlo"),
        F.max("t").alias("thi"),
    )
    b = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        zorder_bucket(F.col("u"), F.col("ulo"), F.col("uhi"), 16).alias(
            "u_bucket"
        ),
        zorder_bucket(F.col("t"), F.col("tlo"), F.col("thi"), 16).alias(
            "t_bucket"
        ),
    )
    return with_zorder_key(b, ["u_bucket", "t_bucket"], bits=16).select(
        "event_id", "u_bucket", "t_bucket", "z_key"
    )


def q_staged_rrf(spark, sf_dir):
    """Retrieval: Reciprocal Rank Fusion hybrid search (Cormack-Clarke-
    Buettcher SIGIR'09, k=60) — BM25 lexical top-20 fused with
    brute-force round-6-cosine top-20 over the SAME doc-id space
    (documents.doc_id == embeddings.vec_id in the fixtures), final
    top-10 per query. Rank-only fusion needs no score calibration;
    contributions are exact integer micro-units (one IEEE division of
    two exact doubles per rank, round half-away in both engines), so
    the fused ranking is bit-stable cross-engine. Demo queries: hybrid
    query i = BM25_QUERIES[i] text + embedding of vec i (i < 3).
    Fusion input is bounded (|q| x 20 x 2 rows): one tiny groupBy +
    the salted two-phase top-k (operators/selection.py rrf_fuse)."""
    from audiopro_essentia_spark.operators.selection import bm25_topk, rrf_fuse

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    qs = spark.createDataFrame(
        [q for q in BM25_QUERIES if q[0] < 3], "query_id int, query string"
    )
    lex = bm25_topk(d, qs, k=20).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "rank",
    )
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("long").alias("query_id"), "embedding"
    )
    dense = SIM.brute_force_topk(e, qv, k=20).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([lex, dense], k_const=60, topk=10)


def q_staged_byte_entropy(spark, sf_dir):
    """Quality: UTF-8 byte-histogram Shannon entropy + printable ratio
    (functions/cleaning.byte_entropy) over the corpus UNION a
    deterministic low-entropy junk twin (repeat('z', 300), keyed
    doc_id % 7 == 0 at id offset 9e6) so the keep verdict is exercised
    on both sides of the low gate. Micro-nat exact-integer entropy, one
    round-6 division; ~4.2 nats for the word-soup fixtures, 0.0 for the
    junk rows."""
    from audiopro_essentia_spark.functions.cleaning import byte_entropy

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    junk = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(9_000_000)).alias("doc_id"),
        F.repeat(F.lit("z"), 300).alias("text"),
    )
    return byte_entropy(d.unionByName(junk))


def _staged_byte_entropy_sql() -> str:
    from audiopro_essentia_spark.duck_twins import byte_entropy_sql

    u = (
        "(SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents "
        "UNION ALL "
        "SELECT CAST(doc_id AS BIGINT) + 9000000 AS doc_id, "
        "repeat('z', 300) AS text FROM documents "
        "WHERE CAST(doc_id AS BIGINT) % 7 = 0) AS u"
    )
    return byte_entropy_sql(table=u)


def q_staged_pr_curve(spark, sf_dir):
    """Eval: exact precision/recall at EVERY distinct score threshold
    (predict purchase iff value >= v) — the operating-point view of
    auc_eval's histogram, sharing the identical two-phase prefix
    machinery so the extra metric costs zero new corpus passes. tp/fp
    are exact BIGINTs; two IEEE divisions + round-6 per row
    (operators/evalmetrics.py pr_curve)."""
    from audiopro_essentia_spark.operators.evalmetrics import pr_curve

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = ev.select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )
    return pr_curve(d, "score", "label")


def q_staged_calibration(spark, sf_dir):
    """Eval: reliability diagram + exact Brier/ECE per user cohort —
    is the rational probability score value/(value+100) (IEEE-
    division-identical cross-engine, in [0,1)) CALIBRATED at
    predicting purchase? Scores quantized ONCE to integer micro-units
    (round ties away from zero — the sample-key recipe); every bin
    count/gap and both summaries are exact integers until the final
    round-6 divisions. ONE map-side-combinable groupBy(cohort, bin)
    corpus pass, zero windows, zero Python
    (operators/evalmetrics.py calibration_report)."""
    from audiopro_essentia_spark.operators.evalmetrics import (
        calibration_report,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = ev.select(
        (F.col("user_id") % 10).cast("long").alias("cohort"),
        (F.col("value") / (F.col("value") + F.lit(100.0))).alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )
    return calibration_report(d, "score", "label", ["cohort"], n_bins=10)


def q_staged_isotonic(spark, sf_dir):
    """Eval: isotonic (PAV) calibration of the same rational
    probability score the calibration entry measures — the monotone
    step function closest (weighted L2) to the per-bin purchase rates
    per user cohort: calibration_report measures the miscalibration,
    this REPAIRS it. Evaluated through the exact minimax identity
    iso(b) = max_{i<=b} min_{j>=b} rate(i..j) with every windowed rate
    truncated to integer micro-units before the min/max (== floor(1e6
    * the true PAV fit) by monotonicity of floor-scaling; pinned
    against a Fraction-exact PAV stack mirror in pytest). ONE
    map-side-combinable groupBy(cohort, bin) corpus pass; everything
    downstream on the bounded <= n_bins^2 pair table, zero Python
    (operators/evalmetrics.py isotonic_calibrate)."""
    from audiopro_essentia_spark.operators.evalmetrics import (
        isotonic_calibrate,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = ev.select(
        (F.col("user_id") % 10).cast("long").alias("cohort"),
        (F.col("value") / (F.col("value") + F.lit(100.0))).alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )
    return isotonic_calibrate(d, "score", "label", ["cohort"], n_bins=20)


def q_staged_ks_drift(spark, sf_dir):
    """Drift: exact two-sample Kolmogorov-Smirnov distance of every
    source's document-length distribution against baseline src0 — the
    binning-free shape-drift monitor PSI can't express (drift_psi
    needs bins fixed up front). Inclusive CDF counts are exact
    BIGINTs; each CDF is one correctly-rounded IEEE division, so max
    + round-6 is bit-stable cross-engine. ONE map-side-combinable
    (source, length) histogram is the only corpus-scale pass; the
    baseline histogram replicates at HISTOGRAM granularity; prefixes
    run the epoch_shuffle two-phase bucketed form. NULL sources are
    pre-filtered EXPLICITLY (unfiltered NULLs fail loud inside the
    operator) (operators/evalmetrics.py ks_drift)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.evalmetrics import ks_drift

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return ks_drift(d, "v", "src", "src0")


def q_staged_unimax(spark, sf_dir):
    """Sampling: UniMax budget allocation (Chung et al. ICLR'23) —
    split a 26k-token training budget across the 20 sources as
    uniformly as possible, capped at 1 epoch per source: the fairness
    fix for temperature sampling. The paper's sequential waterfall is
    computed as a window-function closed form (capacity-ascending
    total order, monotone capped prefix, exact-BIGINT share +
    deterministic remainder). ONE corpus-scale pass (per-source token
    sum); everything else is G-row-tiny (functions/sampling.py
    unimax_allocation)."""
    from audiopro_essentia_spark.functions.sampling import unimax_allocation
    from audiopro_essentia_spark.functions.text import nonempty_words

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.size(nonempty_words(F.col("text"), null_as_empty=True)).alias(
            "n_tokens"
        ),
    )
    return unimax_allocation(d, budget_tokens=26_000, max_epochs=1)


def q_staged_auc(spark, sf_dir):
    """Eval: exact tie-corrected Mann-Whitney ROC AUC of `value` at
    predicting purchase events, per user-cohort (user_id % 10) — the
    classifier-calibration primitive (which quality-score cut keeps
    30%?). 2U is an exact BIGINT accumulated over the distinct-score
    histogram (ties contribute the 1/2 term via doubled units), one
    IEEE division + round-6 at the end. NULLs are pre-filtered
    EXPLICITLY here — unfiltered NULL score/label fails loud inside
    the operator (silently dropping rows skews the metric). Scale
    shape: one map-side-combinable histogram aggregate, then the
    epoch_shuffle two-phase bucketed prefix — never a corpus-scale
    single-partition window (operators/evalmetrics.py)."""
    from audiopro_essentia_spark.operators.evalmetrics import (
        auc_mann_whitney,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = ev.select(
        (F.col("user_id") % 10).cast("long").alias("cohort"),
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("label"),
    )
    return auc_mann_whitney(d, "score", "label", ["cohort"])


def q_staged_textrank(spark, sf_dir):
    """Text analysis: TextRank keyword extraction (Mihalcea-Tarau
    EMNLP'04) — PageRank power iteration over the adjacent-word
    co-occurrence graph (undirected, self-loops excluded, min edge
    weight 2), 10 iterations, top-100 by score. The iterative-family
    member whose state stays DISTRIBUTED (vocab-sized score table,
    never collected — unlike kmeans/PCA driver state). Exact integer
    micro-units end-to-end: per-edge (w*s) div W truncation before the
    exact BIGINT sum makes every iteration bit-stable across engines
    and partitionings; the twin unrolls one MATERIALIZED CTE layer per
    iteration (operators/graphrank.py; duck_twins.textrank_keywords_sql)."""
    from audiopro_essentia_spark.operators.graphrank import textrank_keywords

    return textrank_keywords(
        _t(spark, sf_dir, "documents"),
        n_iter=10,
        top_k=100,
        min_count=2,
    )


def q_staged_winnow(spark, sf_dir):
    """Dedup: winnowing document fingerprints (Schleimer-Wilkerson-
    Aiken SIGMOD'03 — the MOSS algorithm): k=3 word-shingle hashes,
    window w=4, rightmost-minimum selection. The density guarantee
    CDC chunking cannot give: any shared run of >= w+k-1 = 6 words
    between two documents shares at least one fingerprint, with
    expected 2/(w+1) of positions selected. Exact integers
    end-to-end; computed position-parallel via a lag/lead run-length
    reformulation — one exchange, one sort, ONE Window node, zero
    Python (operators/dedup.py winnow_fingerprints; the DuckDB twin
    is the independent direct per-window enumeration)."""
    from audiopro_essentia_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return winnow_fingerprints(d, k_gram=3, window=4)


def _kmv_words(spark, sf_dir):
    from audiopro_essentia_spark.functions.text import nonempty_words

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "source",
        F.explode(nonempty_words(F.col("text"), null_as_empty=True)).alias("w"),
    )


def q_staged_kmv_distinct(spark, sf_dir):
    """Sketch: per-source distinct-word-count ESTIMATE from the KMV
    synopsis (operators/sketch.kmv_distinct, k=128) — the set-capable
    sibling of hll_distinct: same mergeability, but the retained hash
    values also support the pairwise overlap estimate below. Exact
    BIGINT sketch, one IEEE division."""
    from audiopro_essentia_spark.operators.sketch import kmv_distinct

    return kmv_distinct(_kmv_words(spark, sf_dir), "w", "source", k=128)


def q_staged_kmv_jaccard(spark, sf_dir):
    """Sketch: pairwise source-vocabulary Jaccard ESTIMATE from the
    same KMV synopses (k=128) — answers source_overlap's question at
    O(G^2 k) synopsis cost instead of a corpus-scale shingle shuffle
    (the monitoring tier of the same measurement)."""
    from audiopro_essentia_spark.operators.sketch import kmv_jaccard

    return kmv_jaccard(_kmv_words(spark, sf_dir), "w", "source", k=128)


def q_staged_gini(spark, sf_dir):
    """Corpus stats: exact Gini coefficient of per-document token
    counts per source — the one-number concentration monitor (is a
    source's token mass spread across its documents or piled on a few
    boilerplate giants?), the whole-distribution companion of
    zipf_slope's head fit. Micro-unit quantization, the pairwise
    |diff| identity folded over the distinct-value histogram with
    exact DECIMAL/HUGEINT products, below-prefix via the shared
    two-phase bucketed engine, ONE correctly-rounded division +
    round-6. ONE corpus-scale histogram pass, zero Python
    (operators/aggregates.py gini_concentration)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import (
        gini_concentration,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return gini_concentration(d, "v", ["src"])


def q_staged_weight_ess(spark, sf_dir):
    """Corpus stats: exact Kish effective-sample-size diagnostics of
    `value` as an importance weight per event type — ess_frac near 1
    means the weights are benign, near 1/n means one row dominates
    (the variance health check for every weighted stage: DSIR,
    temperature/unimax shares, priority sampling). Micro-unit
    quantization, HUGEINT/DECIMAL square carry, one correctly-rounded
    division + round-6 per output. ONE map-side-combinable aggregate,
    zero windows, zero Python (operators/aggregates.py
    weight_diagnostics). NULLs pre-filtered EXPLICITLY."""
    from audiopro_essentia_spark.operators.aggregates import (
        weight_diagnostics,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    return weight_diagnostics(ev, "value", ["event_type"])


def q_staged_chao1(spark, sf_dir):
    """Corpus stats: Chao1 species-richness estimate of each source's
    word vocabulary — how many distinct words the source's TRUE
    vocabulary has, including unseen ones (does doubling the crawl buy
    new words?). The statistical companion of the sketch tier:
    hll/kmv estimate the SEEN distinct count cheaply, Chao1 estimates
    the UNSEEN tail from singleton/doubleton counts, all exact BIGINTs
    + one correctly-rounded division (bias-corrected form, no zero
    guard needed). ONE map-side-combinable groupBy(source, word)
    corpus pass, zero windows, zero Python (operators/aggregates.py
    chao1_richness)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import chao1_richness

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.explode(
                nonempty_words(F.col("text"), null_as_empty=True)
            ).alias("w"),
        )
    )
    return chao1_richness(d, "w", ["src"])


def q_staged_robust(spark, sf_dir):
    """Corpus stats: exact median / MAD / Iglewicz-Hoaglin fences of
    per-document token counts per source, plus the +-3*MAD outlier
    rate — the robust feature-QC gate that mean/stddev z-scores get
    wrong on heavy-tailed corpus columns (one boilerplate giant moves
    the mean and inflates the stddev, hiding itself; median/MAD have
    50% breakdown). Micro-unit quantization, rank selection off the
    distinct-value histogram prefix with doubled/quadrupled-micro
    integer carries (even-n medians exact, no float average), exact
    integer outlier comparison, round-6 divisions at the end. ONE
    map-side-combinable corpus histogram pass; the MAD histogram
    derives from the VALUE histogram (equal values have equal
    deviations), zero extra corpus passes, zero Python
    (operators/aggregates.py robust_stats)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import robust_stats

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return robust_stats(d, "v", ["src"], k=3.0)


def q_staged_qnorm(spark, sf_dir):
    """Corpus stats: each document's tie-averaged within-source token-
    count quantile q = midrank/n — the CDF / rank normalization that
    makes ONE global threshold mean the same corpus fraction in every
    source (the per-row companion of spearman_rho's rank statistics;
    what calibration_report measures, this repairs). Exact BIGINT
    midranks off the distinct-value histogram prefix, ONE correctly-
    rounded division + round-6 per row; the only corpus-scale join is
    the assignment join back onto the rows on the same (group, value)
    key the histogram aggregated on, zero Python
    (operators/aggregates.py quantile_normalize)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import (
        quantile_normalize,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("doc_id").alias("id"),
            F.col("source").alias("src"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return quantile_normalize(d, "v", ["src"], ["id"])


def q_staged_target_enc(spark, sf_dir):
    """Feature engineering: smoothed mean target encoding of the
    `source` categorical against the is-long-document label per
    language — each (lang, source) cell maps to a shrunken estimate of
    its long-doc rate (m = 20 pseudo-counts toward the language's
    prior), the standard way to turn a million-level categorical into
    ONE numeric feature without memorizing noise. Labels micro-
    quantized, ONE exact-integer division per cell (DECIMAL(38,0) /
    HUGEINT carry), round-6. ONE map-side-combinable groupBy(lang,
    source) corpus pass — group totals aggregate the category table
    itself — zero windows, zero Python (operators/encoding.py
    target_encode)."""
    from audiopro_essentia_spark.operators.encoding import target_encode

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("source").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("n_chars").isNotNull()
        )
        .select(
            "lang",
            "source",
            (F.col("n_chars") >= 500).cast("double").alias("y"),
        )
    )
    return target_encode(d, "source", "y", ["lang"], m=20.0)


def q_staged_target_enc_loo(spark, sf_dir):
    """Feature engineering: the leave-one-out variant for TRAINING
    rows — each document's own label is excluded from its source's
    statistics before encoding, which is what prevents the feature
    from leaking the row's own label (the classic target-leakage bug;
    pytest pins the two-row category [1, 0] at m=0 where each row's
    estimate is exactly the OTHER row's label). Same exact-integer
    division; ONE corpus pass + ONE equi-join of the rows back onto
    the category table on the key the aggregate shuffled on
    (operators/encoding.py target_encode_loo)."""
    from audiopro_essentia_spark.operators.encoding import (
        target_encode_loo,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("source").isNotNull()
            & F.col("doc_id").isNotNull()
            & F.col("n_chars").isNotNull()
        )
        .select(
            F.col("doc_id").alias("id"),
            "source",
            (F.col("n_chars") >= 500).cast("double").alias("y"),
        )
    )
    return target_encode_loo(d, "source", "y", None, ["id"], m=20.0)


def q_staged_mi(spark, sf_dir):
    """Feature QC: normalized mutual information between a banded
    document-length feature (n_chars div 250, capped at 8) and the
    is-long-document label (n_chars >= 500) — the model-free LABEL-
    LEAKAGE detector: both columns derive from the same underlying
    quantity, so nmi comes out high, which is exactly the alarm this
    monitor exists to raise before such a feature reaches training
    (plus per-lang grouping so the drift across languages is visible).
    Exact BIGINT joint histogram from ONE map-side-combinable corpus
    pass; each cell/entropy term rounded ONCE to integer micro-nats
    and summed exactly (the kl_drift discipline); nmi = mi /
    sqrt(hx*hy) with two correctly-rounded IEEE sqrt
    (operators/evalmetrics.py mutual_information)."""
    from audiopro_essentia_spark.operators.evalmetrics import (
        mutual_information,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull() & F.col("lang").isNotNull())
        .select(
            "lang",
            F.least(F.lit(8).cast("long"), F.expr("n_chars div 250"))
            .alias("x"),
            (F.col("n_chars") >= 500).cast("long").alias("y"),
        )
    )
    return mutual_information(d, "x", "y", ["lang"])


def q_staged_bleu(spark, sf_dir):
    """Generation eval: corpus BLEU per source
    (evalmetrics.bleu_eval) of a deterministic lossy rewrite — each
    doc's candidate is its first 80% of words scored against the full
    text as reference, so clipped precisions run high while the
    brevity penalty bites (exactly the regime BLEU's BP exists for).
    Exact BIGINT clipped-overlap/total counts; the ln/exp chain runs
    on identical doubles in fixed order both engines; micro-rounded
    outputs. Row-level totals need no explode; only the overlap path
    shuffles (id, n, gram) counts — the tfidf class."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.evalmetrics import bleu_eval

    ws = nonempty_words(F.col("text"), null_as_empty=True)
    # spread the raw rows BEFORE the 80%-prefix candidate build: the
    # slice/concat_ws projection is token-heavy and would otherwise run
    # on the single-row-group scan partition (r6; no-op at scale)
    d = (
        D._spread(
            _t(spark, sf_dir, "documents").where(
                F.col("source").isNotNull() & F.col("doc_id").isNotNull()
            )
        )
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").cast("string").alias("rid"),
            # 80% prefix: floor((4*size)/5) — the double division of
            # small exact ints floors identically to DuckDB's //
            F.concat_ws(
                " ",
                F.slice(
                    ws,
                    F.lit(1),
                    F.floor(
                        (F.size(ws) * F.lit(4)).cast("double") / F.lit(5.0)
                    ).cast("int"),
                ),
            ).alias("cand"),
            F.concat_ws(" ", ws).alias("ref"),
        )
    )
    return bleu_eval(d, "rid", "cand", "ref", ["src"], max_n=4)


def _staged_bleu_sql() -> str:
    nw = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"
    return DT.bleu_eval_sql(
        f"SELECT source AS src, CAST(doc_id AS VARCHAR) AS id, "
        f"array_to_string(list_slice({nw}, 1, len({nw}) * 4 // 5), ' ')"
        f" AS cand, "
        f"array_to_string({nw}, ' ') AS ref "
        "FROM documents WHERE source IS NOT NULL "
        "AND doc_id IS NOT NULL",
        ("src",),
        max_n=4,
    )


def q_staged_skewp(spark, sf_dir):
    """Scale engineering: join-key skew profile of events.user_id
    (operators/skew.py skew_profile) — the DIAGNOSIS stage for the
    engine's salting remedies (salted_join / salted_agg /
    cap_per_group): top-20 keys with shares and cumulative head
    share, plus hot_ratio = top-1 count over the fair-reducer average
    — the lower bound on the salt factor that would level the
    hottest key. NULL keys profile as a real '__null__' level (the
    classic skew accident must never vanish from a skew report). One
    key-count shuffle; top-k via TakeOrderedAndProject; the only
    windows run over the 20 returned rows."""
    from audiopro_essentia_spark.operators.skew import skew_profile

    return skew_profile(
        _t(spark, sf_dir, "events"), ["user_id"], top_k=20
    )


def _staged_skewp_sql() -> str:
    return DT.skew_profile_sql(
        "SELECT user_id AS k0 FROM events", n_keys=1, top_k=20
    )


def q_staged_jsd(spark, sf_dir):
    """Monitoring: per-source lexical Jensen-Shannon divergence vs the
    rest of the corpus over the global top-500 words
    (aggregates.source_js_divergence) — the SYMMETRIC BOUNDED member
    of the drift family: KL (kl_drift) is unbounded and
    direction-dependent, JSD <= ln 2 always, so one threshold
    transfers across sources and releases; jsd_norm lands on [0, 1].
    Identical spine/shares construction to kl_drift; each JSD term
    micro-rounded once and summed exactly; one pruned count shuffle."""
    from audiopro_essentia_spark.operators.aggregates import (
        source_js_divergence,
    )

    return source_js_divergence(
        _t(spark, sf_dir, "documents"), top_n=500
    )


def q_staged_kripp(spark, sf_dir):
    """Annotation QC: Krippendorff's alpha per source
    (evalmetrics.kripp_alpha) over a deterministic UNEQUAL-panel
    labeling queue — each doc gets 3 + doc_id % 3 raters (the regime
    fleiss_kappa refuses by design: real annotation queues have
    missing/uneven coverage), each rater reporting the doc's language
    except hash-selected ~20% corrupted draws. Pairable-values
    nominal form; per-item rational terms micro-rounded once and
    summed exactly; single-rating items excluded with a visible
    count."""
    from audiopro_essentia_spark.functions.text import portable_hash32
    from audiopro_essentia_spark.operators.evalmetrics import (
        kripp_alpha,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("doc_id").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").alias("item"),
            "lang",
            F.explode(
                F.sequence(F.lit(0), (F.lit(2) + F.col("doc_id") % 3))
            ).alias("r"),
        )
        .select(
            "src",
            "item",
            F.when(
                portable_hash32(
                    F.concat(
                        F.lit("ka:"),
                        F.col("item").cast("string"),
                        F.lit("|"),
                        F.col("r").cast("string"),
                    )
                )
                % 5
                == 0,
                F.concat(F.col("lang"), F.lit("_x")),
            )
            .otherwise(F.col("lang"))
            .alias("label"),
        )
    )
    return kripp_alpha(d, "item", "label", ["src"])


def _staged_kripp_sql() -> str:
    h = DT.H32.format(
        x="('ka:' || CAST(item AS VARCHAR) || '|' || CAST(r AS VARCHAR))"
    )
    return DT.kripp_alpha_sql(
        "SELECT src, item, "
        f"CASE WHEN {h} % 5 = 0 THEN lang || '_x' ELSE lang END AS label "
        "FROM (SELECT source AS src, doc_id AS item, lang, "
        "unnest(generate_series(0, 2 + doc_id % 3)) AS r "
        "FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL "
        "AND source IS NOT NULL) q",
        ("src",),
    )


def q_staged_clusterq(spark, sf_dir):
    """Clustering QC: Calinski-Harabasz variance-ratio + scatter
    decomposition T = W + B (similarity.cluster_quality) over the
    embeddings table split on the SIGN of component 0 — a genuine
    one-axis structure, so B captures dim-0 spread and CH lands well
    above the random-assignment baseline of ~1. No centroid table is
    ever built (the scatter identities need only exact component
    sums); one posexplode corpus pass onto the bounded (cluster, dim)
    table; pico-unit per-term rounding keeps the engine-order-
    dependent folds exact. The missing QC for kmeans_lite /
    semantic_dedup assignments."""
    from audiopro_essentia_spark.operators.similarity import (
        cluster_quality,
    )

    d = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select(
            F.when(F.col("embedding")[0] >= 0, F.lit("pos"))
            .otherwise(F.lit("neg"))
            .alias("cl"),
            "embedding",
        )
    )
    return cluster_quality(d, "cl", "embedding")


def _staged_clusterq_sql() -> str:
    return DT.cluster_quality_sql(
        "SELECT CASE WHEN embedding[1] >= 0 THEN 'pos' ELSE 'neg' END"
        " AS cluster, embedding AS vec FROM embeddings "
        "WHERE embedding IS NOT NULL"
    )


def q_staged_fleiss(spark, sf_dir):
    """Annotation QC: Fleiss' kappa per source
    (evalmetrics.fleiss_kappa) over a deterministic 5-rater labeling
    panel — each rater reports the doc's language except on
    hash-selected ~20% of (doc, rater) draws where they emit a
    corrupted label, so agreement is high but imperfect and kappa
    lands mid-band with the Landis-Koch verdict attached. The
    multi-rater generalization of the engine's two-rater cohen_kappa
    (lang_kappa): raw percent agreement flatters skewed label sets.
    Exact cell/marginal counts; order-free pico-unit P_e fold;
    unequal panels fail LOUD by design."""
    from audiopro_essentia_spark.functions.text import portable_hash32
    from audiopro_essentia_spark.operators.evalmetrics import (
        fleiss_kappa,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("doc_id").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").alias("item"),
            "lang",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"),
        )
        .select(
            "src",
            "item",
            F.when(
                portable_hash32(
                    F.concat(
                        F.lit("fk:"),
                        F.col("item").cast("string"),
                        F.lit("|"),
                        F.col("r").cast("string"),
                    )
                )
                % 5
                == 0,
                F.concat(F.col("lang"), F.lit("_x")),
            )
            .otherwise(F.col("lang"))
            .alias("label"),
        )
    )
    return fleiss_kappa(d, "item", "label", ["src"])


def _staged_fleiss_sql() -> str:
    h = DT.H32.format(
        x="('fk:' || CAST(doc_id AS VARCHAR) || '|' || CAST(r AS VARCHAR))"
    )
    return DT.fleiss_kappa_sql(
        "SELECT source AS src, doc_id AS item, "
        f"CASE WHEN {h} % 5 = 0 THEN lang || '_x' ELSE lang END AS label "
        "FROM documents CROSS JOIN "
        "(SELECT unnest(generate_series(0, 4)) AS r) rr "
        "WHERE doc_id IS NOT NULL AND lang IS NOT NULL "
        "AND source IS NOT NULL",
        ("src",),
    )


def q_staged_pref(spark, sf_dir):
    """Preference-data QC: pairwise win rates with Wilson score
    intervals (evalmetrics.pref_winrate) over deterministic
    hash-assigned judge comparisons between four models — the RLHF /
    LLM-judge eval tier: a pair whose interval contains 0.5 is NOT
    settled, and ties are reported (a judge tying 10% of the time is
    its own finding). Exact counts from ONE map-side-combinable pass
    onto the bounded pair table; the Wilson chain runs on identical
    doubles both engines; micro-rounded outputs."""
    from audiopro_essentia_spark.functions.text import portable_hash32
    from audiopro_essentia_spark.operators.evalmetrics import (
        pref_winrate,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select(
            F.concat(F.lit("m"), (F.col("doc_id") % 4).cast("string"))
            .alias("a"),
            F.concat(
                F.lit("m"),
                (F.expr("doc_id div 4") % 4).cast("string"),
            ).alias("b"),
            portable_hash32(
                F.concat(F.lit("pref:"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
        .where(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.when(F.col("h") % 10 < 5, F.col("a"))
            .when(F.col("h") % 10 < 9, F.col("b"))
            .alias("w"),
        )
    )
    return pref_winrate(d, "a", "b", "w", None, z=1.96)


def _staged_pref_sql() -> str:
    h = DT.H32.format(x="('pref:' || CAST(doc_id AS VARCHAR))")
    return DT.pref_winrate_sql(
        "SELECT a, b, CASE WHEN h % 10 < 5 THEN a "
        "WHEN h % 10 < 9 THEN b END AS w FROM ("
        "SELECT 'm' || CAST(doc_id % 4 AS VARCHAR) AS a, "
        "'m' || CAST((doc_id // 4) % 4 AS VARCHAR) AS b, "
        f"{h} AS h FROM documents WHERE doc_id IS NOT NULL) q "
        "WHERE a <> b",
        (),
        z=1.96,
    )


def q_staged_rouge(spark, sf_dir):
    """Generation eval: micro-averaged corpus ROUGE-2 per source
    (evalmetrics.rouge_n) of a deterministic half-document rewrite —
    each doc's candidate is its SECOND half scored against the full
    text, so precision runs near 1 while recall sits near 0.5:
    exactly the dropped-content regime BLEU's precision cannot see
    (bleu's staged entry is the complementary shortened-but-faithful
    case). Exact BIGINT clipped overlaps and row-level gram totals;
    fixed-order f1 chain; micro-rounded outputs."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.evalmetrics import rouge_n

    ws = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.col("doc_id").cast("string").alias("rid"),
            ws.alias("ws"),
        )
        .select(
            "src",
            "rid",
            F.expr(
                "concat_ws(' ', slice(ws, CAST(size(ws) div 2 AS INT)"
                " + 1, size(ws) - size(ws) div 2))"
            ).alias("cand"),
            F.concat_ws(" ", F.col("ws")).alias("ref"),
        )
    )
    return rouge_n(d, "rid", "cand", "ref", ["src"], n=2)


def _staged_rouge_sql() -> str:
    nw = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"
    return DT.rouge_n_sql(
        f"SELECT source AS src, CAST(doc_id AS VARCHAR) AS id, "
        f"array_to_string(list_slice({nw}, len({nw}) // 2 + 1, "
        f"len({nw})), ' ') AS cand, "
        f"array_to_string({nw}, ' ') AS ref "
        "FROM documents WHERE source IS NOT NULL "
        "AND doc_id IS NOT NULL",
        ("src",),
        n=2,
    )


def q_staged_chi2(spark, sf_dir):
    """Feature QC: Pearson chi-square independence + Cramér's V
    between corpus source and language, per document-length band —
    the bounded-scale categorical-association screen (V in [0, 1] is
    comparable across differently-sized tables, unlike raw chi2 or
    nats): a high V here means language is largely determined by
    source, so per-source and per-lang quotas double-count the same
    stratification. Exact BIGINT contingency cells from ONE map-side-
    combinable corpus pass; the zero-cell identity chi2 = n +
    sum_obs[(o-e)^2/e - e] folds observed cells only; each term
    micro-rounded once and summed exactly; V via floor-at-zero sqrt
    with scale-0 micro rounding (operators/evalmetrics.py
    chi2_assoc)."""
    from audiopro_essentia_spark.operators.evalmetrics import chi2_assoc

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("n_chars").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select(
            F.when(F.col("n_chars") >= 500, F.lit("long"))
            .otherwise(F.lit("short"))
            .alias("band"),
            F.col("source").alias("x"),
            F.col("lang").alias("y"),
        )
    )
    return chi2_assoc(d, "x", "y", ["band"])


def _staged_chi2_sql() -> str:
    return DT.chi2_assoc_sql(
        "SELECT CASE WHEN n_chars >= 500 THEN 'long' ELSE 'short' END"
        " AS band, source AS x, lang AS y FROM documents "
        "WHERE n_chars IS NOT NULL AND lang IS NOT NULL "
        "AND source IS NOT NULL",
        ("band",),
    )


def q_staged_linreg(spark, sf_dir):
    """Model training: per-source multiple regression of a document's
    DISTINCT-word count on its word count and character count (d=2,
    ridge 0.5 — collinear-ish covariates are exactly where the ridge
    path matters), the vocabulary-growth curve per source
    (aggregates.ols_multi). Intercept rides as feature x0 == 1e6
    micros so all normal-equation entries are uniform HUGEINT sums
    from ONE aggregate; the Cramer solve evaluates the VERBATIM
    expression strings the DuckDB twin also renders
    (_ols_multi_exprs); every output micro-rounded. Zero joins,
    windows, Python."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import ols_multi

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(w).cast("double").alias("x1"),
            (F.col("n_chars").cast("double") / F.lit(100.0)).alias("x2"),
            F.size(F.array_distinct(w)).cast("double").alias("y"),
        )
    )
    return ols_multi(d, "y", ["x1", "x2"], ["src"], ridge=0.5)


def _staged_linreg_sql() -> str:
    nw = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"
    return DT.ols_multi_sql(
        f"SELECT source AS src, CAST(len({nw}) AS DOUBLE) AS x1, "
        "CAST(n_chars AS DOUBLE) / CAST(100.0 AS DOUBLE) AS x2, "
        f"CAST(len(list_distinct({nw})) AS DOUBLE) AS y "
        "FROM documents WHERE source IS NOT NULL "
        "AND n_chars IS NOT NULL",
        2,
        ("src",),
        ridge=0.5,
    )


def q_staged_ols(spark, sf_dir):
    """Corpus stats: per-source OLS fit of distinct-word count against
    token count (the Heaps'-law slope on raw values — the trend
    companion of spearman's rank-only monotone agreement over the SAME
    pair): slope, intercept and Pearson r from five exact DECIMAL(38)/
    HUGEINT sufficient statistics in ONE map-side-combinable corpus
    pass, closed forms that keep slope OUT of the intercept, two IEEE
    sqrt + one division + round-6 per output — zero windows, zero
    joins, zero Python (operators/aggregates.py ols_fit)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import ols_fit

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(w).cast("double").alias("x"),
            F.size(F.array_distinct(w)).cast("double").alias("y"),
        )
    )
    return ols_fit(d, "x", "y", ["src"])


def q_staged_decay(spark, sf_dir):
    """Feature engineering: exponentially time-decayed per-user
    activity AS OF 2024-02-01 (explicit epoch-micros literal — never
    wall clock) at 1-day and 7-day half-lives, counts plus value-
    weighted sums — the feature-store recency signal (a burst
    yesterday and a trickle all month become distinguishable numbers).
    Ages exact BIGINT micros, each weight ONE pow(2, -age/H) in the
    same expression order both engines, per-row terms rounded once to
    integer micro-units and summed EXACTLY (mergeable across shards at
    fixed now — pytest pins shard-sum == whole); an event after `now`
    fails LOUD (future leakage). ONE map-side-combinable groupBy —
    zero windows, zero joins, zero Python (operators/temporal.py
    time_decayed_features)."""
    from audiopro_essentia_spark.operators.temporal import (
        time_decayed_features,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return time_decayed_features(
        ev,
        ["user_id"],
        "ts",
        now_us=1_706_745_600_000_000,  # 2024-02-01T00:00:00Z
        half_lives_s=(86400, 604800),
        value_col="value",
    )


def q_staged_bh(spark, sf_dir):
    """Monitoring: Benjamini-Hochberg FDR control over one simulated
    drift-monitor p-value per (source, lang) cell — with hundreds of
    per-source/per-day monitors, thresholding each at 0.05 guarantees
    a wall of false alarms; BH rejects the largest prefix with
    p_(k) <= k*alpha/m and bounds the expected false-discovery
    fraction by alpha. The demo p-values are deterministic portable-
    hash uniforms (the conv(md5) recipe both engines render
    identically), with the en-language cells planted ~1000x smaller so
    the procedure has true signals to find. Exact integer BH criterion
    per tie run, floor q candidates with the suffix-min == floor of
    the true q (operators/evalmetrics.py bh_fdr)."""
    from audiopro_essentia_spark.operators.evalmetrics import bh_fdr

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("lang").isNotNull())
        .select("source", "lang")
        .distinct()
        .select(
            F.col("source").alias("src"),
            F.col("lang").alias("lng"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", "source", "lang")), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("_h"),
        )
        .select(
            "src",
            "lng",
            F.when(
                F.col("lng") == "en",
                (F.col("_h") % 1001).cast("double") / F.lit(1e6),
            )
            .otherwise(
                (F.col("_h") % 1000001).cast("double") / F.lit(1e6)
            )
            .alias("p"),
        )
    )
    return bh_fdr(d, "p", 0.05, None, ["src", "lng"])


def q_staged_exact_quantiles(spark, sf_dir):
    """Corpus stats: EXACT distributed p50/p90/p99 of per-document
    token counts per source — the exact answer to the question
    lq_quantiles answers with a sketch (and that corpus_percentiles'
    exact mode can only answer by buffering whole groups): ONE
    map-side-combinable (source, count) histogram pass + the shared
    two-phase bucketed below-prefix + exact integer ceil-rank type-1
    selection (an actual data value, never an interpolation), no
    per-group buffering, no sketch error, zero Python
    (operators/aggregates.py exact_quantiles)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.aggregates import (
        exact_quantiles,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(nonempty_words(F.col("text"), null_as_empty=True))
            .cast("double")
            .alias("v"),
        )
    )
    return exact_quantiles(d, "v", (0.5, 0.9, 0.99), ["src"])


def q_staged_transitions(spark, sf_dir):
    """Event analytics: the first-order Markov transition matrix of
    per-user event-type journeys — exact counts + row-normalized
    P(curr | prev), with each user's first event transitioning from
    the reserved __START__ state (so the matrix carries P(first event)
    too). The whole-journey companion of sessionize/funnel: funnel
    checks ONE prescribed path, this measures EVERY observed step.
    Events order by (epoch-micros, type) — a total order on values, so
    the chain is engine- and partitioning-independent. ONE user-key
    exchange + in-partition sort, one map-side-combinable groupBy onto
    the bounded |types|^2 pair table, broadcast row totals, zero
    Python. NULL user/ts/type pre-filtered EXPLICITLY (unfiltered
    NULLs fail loud inside the operator — a dropped event would splice
    its neighbours into a transition that never happened)
    (operators/temporal.py transition_matrix)."""
    from audiopro_essentia_spark.operators.temporal import transition_matrix

    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return transition_matrix(ev, "user_id", "ts", "event_type")


def q_staged_lang_kappa(spark, sf_dir):
    """Eval: exact Cohen's kappa per source between the lang_id
    heuristic's prediction and the fixture's ground-truth lang column
    — chance-corrected agreement, the honest version of 'accuracy'
    when the label distribution is skewed (a majority-class guesser
    scores high po; kappa discounts exactly that). Multi-class
    confusion (en/de/fr/und predictions vs en/de/fr/es/zh truth) via
    ONE map-side-combinable groupBy(src, a, b) corpus pass; marginal
    chance products exact HUGEINT/DECIMAL; one correctly-rounded
    division + round-6 per output column. NULL text/lang/source
    pre-filtered EXPLICITLY (unfiltered NULL labels fail loud inside
    the operator) (operators/evalmetrics.py cohen_kappa;
    functions/text.py lang_id)."""
    from audiopro_essentia_spark.operators.evalmetrics import cohen_kappa

    d = (
        _t(spark, sf_dir, "documents")
        .where(
            F.col("text").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select(
            F.col("source").alias("src"),
            T.lang_id(F.col("text")).alias("a"),
            F.col("lang").alias("b"),
        )
    )
    return cohen_kappa(d, "a", "b", ["src"])


def q_staged_spearman(spark, sf_dir):
    """Eval: exact tie-averaged Spearman rank correlation per source
    between each document's token count and its DISTINCT-token count —
    do length and lexical variety order the corpus the same way, and
    does that monotone agreement drift by source? Rank-only, so any
    monotone recalibration of either signal leaves it unchanged
    (Pearson on raw values would not be). Doubled integer average
    ranks come straight off the distinct-value histogram prefix
    (exact BIGINTs), products carried exactly (DECIMAL / HUGEINT), one
    double conversion + two IEEE sqrt + one divide + round-6. Two
    map-side-combinable histograms + two-phase bucketed prefixes +
    two hash join-backs + one final aggregate; zero Python
    (operators/evalmetrics.py spearman_rho)."""
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.evalmetrics import spearman_rho

    w = nonempty_words(F.col("text"), null_as_empty=True)
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.size(w).cast("double").alias("x"),
            F.size(F.array_distinct(w)).cast("double").alias("y"),
        )
    )
    return spearman_rho(d, "x", "y", ["src"])


def q_staged_ranking(spark, sf_dir):
    """Eval: exact graded ranking quality (NDCG@20 / MRR@20 / MAP@20)
    of `value` as a relevance ranker per user cohort — does sorting a
    cohort's events by value surface the purchases (rel 2) and clicks
    (rel 1) first? The ranking tier of the eval family (auc grades the
    score as a classifier; this grades the ordered LIST). Rank =
    (value DESC, event_id ASC) — a unique sort key, so the ranking is
    engine- and partitioning-independent; DCG discounts are exact
    micro-unit literals computed ONCE driver-side (never log2 in SQL);
    DCG/IDCG/AP numerators are exact BIGINTs with div == DuckDB // on
    the non-negative operands. ONE hash exchange on the cohort key,
    two in-partition sorts, one map-side-combinable groupBy, zero
    Python (operators/evalmetrics.py ranking_report)."""
    from audiopro_essentia_spark.operators.evalmetrics import ranking_report

    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    d = ev.select(
        (F.col("user_id") % 10).cast("long").alias("cohort"),
        F.col("value").alias("score"),
        F.col("event_id").cast("long").alias("tie"),
        F.when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
        .cast("long")
        .alias("rel"),
    )
    return ranking_report(d, "score", "rel", "tie", ["cohort"], k=20)


# --------------------------------------------------------------------------
# Round-5 window rotation (FINAL — the 50-slot choice is permanent).
#
# The driver's correctness gate covers exactly the FIRST 50 queries()
# entries. All 73 staged-roster entries are compare-green at sf0.001 and
# sf0.01 with full pytest/twin/sweep evidence, but none has ever had an
# independent driver check. R5_WINDOW promotes the 50 whose twins are the
# most intricate (risk-ranked per VERDICT r4 item #2: the all-pairs /
# edit-distance / full-tuple-ANN joins, the layered generated SQL, the
# multi-phase exact-integer stats) so the driver's independent run lands
# where a silent twin bug would hide best. Total driver-checked coverage
# after r5: 141/164 queries.
R5_WINDOW = [
    # similarity / dedup joins — the most failure-prone twin class
    # (prefix-filtered lossless joins, Levenshtein verify, full-tuple
    # ANN equality, streaming inverted-index containment)
    "pq_ann", "edit_neardup", "allpairs_jaccard", "containment",
    "winnow_fp", "cdc_chunks", "line_scrub", "gopher_quality",
    # token-scale shuffles / layered generated SQL
    "bleu", "rouge2", "textrank", "npmi", "rrf_hybrid", "jsd_drift",
    # sketches with register-level twins
    "lq_quantiles", "bloom_membership",
    # eval/stats tier — multi-phase exact-integer arithmetic
    "auc_eval", "ranking_eval", "isotonic", "boot_ci", "ab_welch",
    "fleiss", "kripp", "pref_winrate", "cluster_quality", "chi2_assoc",
    "mi_leakage", "fdr_monitors", "hill_tail", "cusum_drift",
    # _hist_prefix consumers (shared engine — window checks here cover
    # the ceil-rank selection path for all eleven consumers)
    "robust_tokens", "qnorm_tokens", "winsor_tokens", "qbin_tokens",
    "conformal", "survival",
    # encoding / linkage / causal / governance (+ funnel: the op whose
    # HOF-lambda re-inline hazard cost a live measurement — its k-step
    # chained-window twin earns the driver check over single-shape ops)
    "target_enc", "target_enc_loo", "fs_linkage", "funnel",
    "golden", "ref_integrity", "dq_checks", "dp_release", "ate_effect",
    # behavior changed this round (ADVICE fixes) — driver-check them
    "readability", "skew_profile",
    # remaining multi-stage ops
    "linreg", "neg_pairs", "transitions",
]
# The 23 permanent compare-only holdouts — chosen because each is a
# SINGLE-SHAPE op (one aggregate / one projection / one window) whose
# exact pytest mirror derives from an outside definition, so the twin
# has the least room for a silent shared-derivation bug. Per-entry:
#   time_rolling    one named-sort-key window, inline twin, plan-pinned
#   interval_join   one bucket-equi join shape, inline twin
#   weight_ess      one weight aggregate, closed-form mirror
#   unimax          driver-side waterfall closed form, exact integers
#   zorder_key      bit-interleave projection, fixed-width hand cases
#   gini_tokens     one sorted-prefix aggregate, Fraction-exact mirror
#   chao1_vocab     one (f1,f2) richness fold, textbook closed form
#   ols_trend       ONE aggregate of five HUGEINT sufficient stats
#   decay_features  zero-shuffle per-row pow + exact sums
#   byte_entropy    one byte-histogram fold, hand-computable
#   kmv_distinct    k-minimum-values register merge, order statistics
#   kmv_jaccard     same register engine as kmv_distinct
#   spearman        midrank rho off the shared _hist_prefix engine
#                   (six other consumers sit IN-window)
#   lang_kappa      2x2 agreement counts, Cohen closed form
#   pr_curve        shares the in-window auc_eval histogram+prefix
#   calibration     ONE map-side-combinable binned aggregate
#   ks_drift        exact two-sample KS, max-over-prefix shape
#   benford         9-cell digit histogram vs literal probabilities
#   priority_sample bit-identical hash order statistics, 1 Exchange
#   cohort_retention exact BIGINT micros bucketing, zero Python
#   backtest        zero-shuffle literal fold array (new guard is
#                   input-validation only — outputs unchanged)
#   sorted_block    1 Sort/1 Window/0 joins, plan-pinned
#   exact_pcts      type-1 quantile rule shared verbatim with the
#                   in-window winsor/qbin/conformal consumers
R5_HOLDOUTS = [
    "time_rolling", "interval_join", "weight_ess", "unimax",
    "zorder_key", "gini_tokens", "chao1_vocab", "ols_trend",
    "decay_features", "byte_entropy", "kmv_distinct", "kmv_jaccard",
    "spearman", "lang_kappa", "pr_curve", "calibration", "ks_drift",
    "benford", "priority_sample", "cohort_retention", "backtest",
    "sorted_block", "exact_pcts",
]


def _staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "gini_tokens": q_staged_gini,
        "weight_ess": q_staged_weight_ess,
        "chao1_vocab": q_staged_chao1,
        "robust_tokens": q_staged_robust,
        "qnorm_tokens": q_staged_qnorm,
        "target_enc": q_staged_target_enc,
        "target_enc_loo": q_staged_target_enc_loo,
        "mi_leakage": q_staged_mi,
        "chi2_assoc": q_staged_chi2,
        "bleu": q_staged_bleu,
        "rouge2": q_staged_rouge,
        "pref_winrate": q_staged_pref,
        "fleiss": q_staged_fleiss,
        "cluster_quality": q_staged_clusterq,
        "kripp": q_staged_kripp,
        "jsd_drift": q_staged_jsd,
        "skew_profile": q_staged_skewp,
        "ols_trend": q_staged_ols,
        "linreg": q_staged_linreg,
        "decay_features": q_staged_decay,
        "fdr_monitors": q_staged_bh,
        "exact_pcts": q_staged_exact_quantiles,
        "transitions": q_staged_transitions,
        "lang_kappa": q_staged_lang_kappa,
        "spearman": q_staged_spearman,
        "ranking_eval": q_staged_ranking,
        "pr_curve": q_staged_pr_curve,
        "calibration": q_staged_calibration,
        "isotonic": q_staged_isotonic,
        "ks_drift": q_staged_ks_drift,
        "unimax": q_staged_unimax,
        "auc_eval": q_staged_auc,
        "textrank": q_staged_textrank,
        "winnow_fp": q_staged_winnow,
        "byte_entropy": q_staged_byte_entropy,
        "kmv_distinct": q_staged_kmv_distinct,
        "kmv_jaccard": q_staged_kmv_jaccard,
        "rrf_hybrid": q_staged_rrf,
        "allpairs_jaccard": q_staged_allpairs,
        "containment": q_staged_containment,
        "dq_checks": q_staged_dq,
        "boot_ci": q_staged_boot_ci,
        "cusum_drift": q_staged_cusum,
        "ab_welch": q_staged_ab_welch,
        "backtest": q_staged_backtest,
        "hill_tail": q_staged_hill,
        "winsor_tokens": q_staged_winsorize,
        "qbin_tokens": q_staged_qbin,
        "neg_pairs": q_staged_neg,
        "conformal": q_staged_conformal,
        "survival": q_staged_km,
        "fs_linkage": q_staged_fs,
        "sorted_block": q_staged_snb,
        "dp_release": q_staged_dp,
        "ref_integrity": q_staged_refint,
        "golden": q_staged_golden,
        "benford": q_staged_benford,
        "ate_effect": q_staged_ate,
        "readability": q_staged_readability,
        "zorder_key": q_staged_zorder,
        "priority_sample": q_staged_priority_sample,
        "line_scrub": q_staged_line_scrub,
        "funnel": q_staged_funnel,
        "cohort_retention": q_staged_cohort,
        "cdc_chunks": q_staged_cdc,
        "npmi": q_staged_npmi,
        "gopher_quality": q_staged_gopher,
        "edit_neardup": q_staged_edit_neardup,
        "lq_quantiles": q_staged_lq_quantiles,
        "bloom_membership": q_staged_bloom,
        "interval_join": q_staged_interval_join,
        "time_rolling": q_staged_time_rolling,
        "pq_ann": q_staged_pq_ann,
    }


def _staged_oracle_sql() -> dict[str, str]:
    from audiopro_essentia_spark.duck_twins import lq_quantiles_sql

    lp = DT.lang_pred_sql(
        cols="src, b",
        table=(
            "(SELECT source AS src, lang AS b, text FROM documents "
            "WHERE text IS NOT NULL AND lang IS NOT NULL "
            "AND source IS NOT NULL) AS dd"
        ),
    )
    nw = (
        "len(list_filter(string_split(coalesce(text, ''), ' '), "
        "x -> x <> ''))"
    )
    return {
        "gini_tokens": DT.gini_concentration_sql(
            f"SELECT source AS src, CAST({nw} AS DOUBLE) AS v "
            "FROM documents WHERE source IS NOT NULL",
            ("src",),
        ),
        "weight_ess": DT.weight_diagnostics_sql(
            "SELECT event_type, value AS w FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL",
            ("event_type",),
        ),
        "chao1_vocab": DT.chao1_richness_sql(
            "SELECT source AS src, unnest(list_filter(string_split("
            "coalesce(text, ''), ' '), x -> x <> '')) AS t "
            "FROM documents WHERE source IS NOT NULL",
            ("src",),
        ),
        "target_enc": DT.target_encode_sql(
            "SELECT lang, source AS c, "
            "CAST(n_chars >= 500 AS BIGINT) + CAST(0 AS DOUBLE) AS y "
            "FROM documents WHERE source IS NOT NULL "
            "AND lang IS NOT NULL AND n_chars IS NOT NULL",
            ("lang",),
            m=20.0,
            cat_name="source",
        ),
        "target_enc_loo": DT.target_encode_loo_sql(
            "SELECT doc_id AS id, source AS c, "
            "CAST(n_chars >= 500 AS BIGINT) + CAST(0 AS DOUBLE) AS y "
            "FROM documents WHERE source IS NOT NULL "
            "AND doc_id IS NOT NULL AND n_chars IS NOT NULL",
            (),
            ("id",),
            m=20.0,
            cat_name="source",
        ),
        "exact_pcts": DT.exact_quantiles_sql(
            f"SELECT source AS src, CAST({nw} AS DOUBLE) AS v "
            "FROM documents WHERE source IS NOT NULL",
            (0.5, 0.9, 0.99),
            ("src",),
        ),
        "fdr_monitors": DT.bh_fdr_sql(
            "SELECT src, lng, CASE WHEN lng = 'en' THEN "
            "CAST(h % 1001 AS DOUBLE) / 1e6 ELSE "
            "CAST(h % 1000001 AS DOUBLE) / 1e6 END AS p FROM ("
            "SELECT source AS src, lang AS lng, "
            "('0x' || substr(md5(source || '|' || lang), 1, 8))::BIGINT"
            " AS h FROM (SELECT DISTINCT source, lang FROM documents "
            "WHERE source IS NOT NULL AND lang IS NOT NULL) dd) hh",
            (),
            ("src", "lng"),
            alpha=0.05,
        ),
        "ols_trend": DT.ols_fit_sql(
            "SELECT source AS src, "
            "CAST(len(list_filter(string_split(coalesce(text, ''), ' '), "
            "x -> x <> '')) AS DOUBLE) AS x, "
            "CAST(len(list_distinct(list_filter(string_split("
            "coalesce(text, ''), ' '), x -> x <> ''))) AS DOUBLE) AS y "
            "FROM documents WHERE source IS NOT NULL",
            ("src",),
        ),
        "linreg": _staged_linreg_sql(),
        "decay_features": DT.time_decayed_features_sql(
            "SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tm, "
            "value AS v FROM events WHERE user_id IS NOT NULL "
            "AND ts IS NOT NULL AND value IS NOT NULL",
            ("user_id",),
            now_us=1_706_745_600_000_000,
            half_lives_s=(86400, 604800),
            with_value=True,
        ),
        "mi_leakage": DT.mutual_information_sql(
            "SELECT lang, least(8, n_chars // 250) AS x, "
            "CAST(n_chars >= 500 AS BIGINT) AS y "
            "FROM documents WHERE n_chars IS NOT NULL "
            "AND lang IS NOT NULL",
            ("lang",),
        ),
        "chi2_assoc": _staged_chi2_sql(),
        "bleu": _staged_bleu_sql(),
        "rouge2": _staged_rouge_sql(),
        "pref_winrate": _staged_pref_sql(),
        "fleiss": _staged_fleiss_sql(),
        "cluster_quality": _staged_clusterq_sql(),
        "kripp": _staged_kripp_sql(),
        "jsd_drift": DT.js_sql(top_n=500),
        "skew_profile": _staged_skewp_sql(),
        "robust_tokens": DT.robust_stats_sql(
            f"SELECT source AS src, CAST({nw} AS DOUBLE) AS v "
            "FROM documents WHERE source IS NOT NULL",
            ("src",),
            k=3.0,
        ),
        "qnorm_tokens": DT.quantile_normalize_sql(
            f"SELECT doc_id AS id, source AS src, CAST({nw} AS DOUBLE) AS v "
            "FROM documents WHERE source IS NOT NULL "
            "AND doc_id IS NOT NULL",
            ("src",),
            ("id",),
        ),
        "transitions": DT.transition_matrix_sql(
            "SELECT CAST(user_id AS VARCHAR) AS k, "
            "epoch_us(CAST(ts AS TIMESTAMP)) AS tm, "
            "event_type AS t FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "AND event_type IS NOT NULL"
        ),
        "lang_kappa": DT.cohen_kappa_sql(
            f"SELECT src, lang_pred AS a, b FROM ({lp})",
            ("src",),
        ),
        "spearman": DT.spearman_rho_sql(
            "SELECT source AS src, "
            "CAST(len(list_filter(string_split(coalesce(text, ''), ' '), "
            "x -> x <> '')) AS DOUBLE) AS x, "
            "CAST(len(list_distinct(list_filter(string_split("
            "coalesce(text, ''), ' '), x -> x <> ''))) AS DOUBLE) AS y "
            "FROM documents WHERE source IS NOT NULL",
            ("src",),
        ),
        "ranking_eval": DT.ranking_report_sql(
            "SELECT CAST(user_id % 10 AS BIGINT) AS cohort, "
            "value AS s, CAST(event_id AS BIGINT) AS tie, "
            "CAST(CASE event_type WHEN 'purchase' THEN 2 "
            "WHEN 'click' THEN 1 ELSE 0 END AS BIGINT) AS rel "
            "FROM events WHERE value IS NOT NULL "
            "AND event_type IS NOT NULL AND user_id IS NOT NULL "
            "AND event_id IS NOT NULL",
            ("cohort",),
            k=20,
        ),
        "pr_curve": DT.pr_curve_sql(
            "SELECT value AS score, "
            "CAST(event_type = 'purchase' AS BIGINT) AS label "
            "FROM events WHERE value IS NOT NULL "
            "AND event_type IS NOT NULL"
        ),
        "calibration": DT.calibration_report_sql(
            "SELECT CAST(user_id % 10 AS BIGINT) AS cohort, "
            "value / (value + CAST(100 AS DOUBLE)) AS score, "
            "CAST(event_type = 'purchase' AS BIGINT) AS label "
            "FROM events WHERE value IS NOT NULL "
            "AND event_type IS NOT NULL AND user_id IS NOT NULL",
            ("cohort",),
            n_bins=10,
        ),
        "isotonic": DT.isotonic_calibrate_sql(
            "SELECT CAST(user_id % 10 AS BIGINT) AS cohort, "
            "value / (value + CAST(100 AS DOUBLE)) AS s, "
            "CAST(event_type = 'purchase' AS BIGINT) AS y "
            "FROM events WHERE value IS NOT NULL "
            "AND event_type IS NOT NULL AND user_id IS NOT NULL",
            ("cohort",),
            n_bins=20,
        ),
        "ks_drift": DT.ks_drift_sql(
            "SELECT source AS src, "
            "CAST(len(list_filter(string_split(coalesce(text, ''), ' '), "
            "x -> x <> '')) AS DOUBLE) AS v "
            "FROM documents WHERE source IS NOT NULL",
            "src0",
            group_col="src",
        ),
        "unimax": DT.unimax_allocation_sql(budget_tokens=26_000, max_epochs=1),
        "auc_eval": DT.auc_mann_whitney_sql(
            "SELECT CAST(user_id % 10 AS BIGINT) AS cohort, "
            "value AS score, "
            "CAST(event_type = 'purchase' AS BIGINT) AS label "
            "FROM events WHERE value IS NOT NULL "
            "AND event_type IS NOT NULL AND user_id IS NOT NULL",
            ("cohort",),
        ),
        "textrank": DT.textrank_keywords_sql(
            n_iter=10, top_k=100, min_count=2
        ),
        "winnow_fp": DT.winnow_fingerprints_sql(
            k_gram=3,
            window=4,
            table="(SELECT CAST(doc_id AS BIGINT) AS doc_id, text "
            "FROM documents) AS d",
        ),
        "byte_entropy": _staged_byte_entropy_sql(),
        "kmv_distinct": DT.kmv_distinct_sql(k=128),
        "kmv_jaccard": DT.kmv_jaccard_sql(k=128),
        "rrf_hybrid": DT.rrf_hybrid_sql(
            ", ".join(f"({i}, '{s}')" for i, s in BM25_QUERIES if i < 3),
            n_dense_q=3,
            k_lex=20,
            k_dense=20,
            k_const=60,
            topk=10,
        ),
        "allpairs_jaccard": _staged_allpairs_sql(),
        "containment": _staged_containment_sql(),
        "dq_checks": _staged_dq_sql(),
        "boot_ci": _staged_boot_ci_sql(),
        "cusum_drift": _staged_cusum_sql(),
        "ab_welch": _staged_ab_welch_sql(),
        "backtest": _staged_backtest_sql(),
        "hill_tail": _staged_hill_sql(),
        "winsor_tokens": _staged_winsorize_sql(),
        "qbin_tokens": _staged_qbin_sql(),
        "neg_pairs": _staged_neg_sql(),
        "conformal": _staged_conformal_sql(),
        "survival": _staged_km_sql(),
        "fs_linkage": _staged_fs_sql(),
        "sorted_block": _staged_snb_sql(),
        "dp_release": _staged_dp_sql(),
        "ref_integrity": _staged_refint_sql(),
        "golden": _staged_golden_sql(),
        "benford": _staged_benford_sql(),
        "ate_effect": _staged_ate_sql(),
        "readability": _staged_readability_sql(),
        "zorder_key": DT.zorder_key_sql(bits=16),
        "priority_sample": DT.priority_sample_sql(k=20),
        "line_scrub": _staged_line_scrub_sql(),
        "funnel": DT.funnel_steps_sql(
            ("signup", "view", "click", "purchase"),
            max_span_seconds=7 * 86400,
        ),
        "cohort_retention": DT.cohort_retention_sql(period_seconds=86400),
        "cdc_chunks": _staged_cdc_sql(),
        "npmi": DT.npmi_collocations_sql(min_count=5, top_k=200),
        "gopher_quality": _staged_gopher_sql(),
        "edit_neardup": _staged_edit_neardup_sql(),
        "lq_quantiles": lq_quantiles_sql(),
        "bloom_membership": DT.bloom_membership_sql(
            ngram=3, m_bits=BLOOM_M, k=BLOOM_K
        ),
        "interval_join": _staged_interval_join_sql(),
        "time_rolling": _staged_time_rolling_sql(),
        "pq_ann": DT.pq_ann_sql(m_sub=8, k=16, dim=64, n_queries=4, k_top=10),
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: derived tokens -> framing -> per-frame rms/volume
    -> doc-stat broadcast enrichment."""
    sf_dir = "/root/testdata/sf0.001"
    rms = q_frame_rms(spark, sf_dir)
    stats = q_doc_stats(spark, sf_dir).select(
        "doc_id",
        F.col("peak").alias("doc_peak"),
        F.col("rms").alias("doc_rms"),
        F.col("dc_offset").alias("doc_dc_offset"),
        F.col("energy").alias("doc_energy"),
    )
    return rms.join(F.broadcast(stats), "doc_id", "left").orderBy(
        "doc_id", "frame_idx"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered so the driver's correctness check (which covers exactly
    the FIRST 50 entries) always lands on the least-verified queries.

    ROUND-5 (final) rotation per VERDICT.md r4 items #1/#2: positions
    1-50 are R5_WINDOW — fifty staged-roster entries that have NEVER
    had a driver check, risk-ranked so the most intricate twins (the
    all-pairs/edit/containment/PQ joins, layered generated SQL,
    multi-phase exact-integer stats) get the independent run.
    Positions 51+ are the 91 veteran queries (every one driver-green
    in >= 1 prior round, most in >= 2, ALL re-verified locally by
    tests/driver_compare.py each round) followed by the 23 permanent
    compare-only holdouts (R5_HOLDOUTS — single-shape ops with
    outside-definition mirrors; per-entry justification at the
    constant's definition). Total driver-checked coverage after r5:
    141/164 queries; the driver_compare ALL-OK logs cover all 164.

    The r1-r4 rotation history lives in git (this docstring described
    each round's promotions/demotions as they happened)."""
    staged = _staged_queries()
    out = {k: staged[k] for k in R5_WINDOW}
    base = {
        # -- core framing / temporal / join surface -------------------
        "pit_assembly": q_pit_assembly,
        # -- kernel / spectral surface (f32 path touched in r4) --------
        "kernel_full_geometry": q_kernel_full_geometry,
        "mfcc_delta": q_mfcc_delta,
        "seq_metadata": q_seq_metadata,
        "spectral_flux": q_spectral_flux,
        "spectral_contrast": q_spectral_contrast,
        "fused_pipeline": q_fused_pipeline,
        "media_frames": q_media_frames,
        "hash_split": q_hash_split,
        "mixture_sample": q_mixture_sample,
        "token_budget": q_token_budget,
        "curate": q_curate,
        # -- dedup / similarity / featurize ---------------------------
        "semantic_dedup": q_semantic_dedup,
        # -- r4 window (all 50 below driver-checked green in CORRECTNESS_r04) --
        "hll_distinct": q_hll_distinct,
        "kl_drift": q_kl_drift,
        "zipf_slope": q_zipf_slope,
        "source_overlap": q_source_overlap,
        # late-r4: cms_freq's slot came from kernel_features (r1+r3
        # double-green; the r4 kernel memory path stays driver-checked
        # in-window via fused_pipeline / kernel_full_geometry /
        # mfcc_delta / spectral_flux / spectral_contrast)
        "cms_freq": q_cms_freq,
        # -- r4 promotions (r2 + r4 driver-green) ---------------------
        "tfidf": q_tfidf,
        "repetition": q_repetition,
        "hashed_embedding": q_hashed_embedding,
        "chunk_documents": q_chunk_documents,
        "normalized_dedup": q_normalized_dedup,
        "ann_recall": q_ann_recall,
        "surprisal": q_surprisal,
        "encode_tokens": q_encode_tokens,
        "quantize_embed": q_quantize_embed,
        "vocab_by_source": q_vocab_by_source,
        "monitor_stats": q_monitor_stats,
        "corpus_rollup": q_corpus_rollup,
        # -- r3 additions (r3 + r4 driver-green) -----------------------
        "bigram_surprisal": q_bigram_surprisal,
        "quality_classifier": q_quality_classifier,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "drift_psi": q_drift_psi,
        "snapshot_diff": q_snapshot_diff,
        "temperature_sample": q_temperature_sample,
        "cap_per_group": q_cap_per_group,
        "silence_segments": q_silence_segments,
        "dsir_select": q_dsir_select,
        "bm25": q_bm25,
        "fertility": q_fertility,
        "c4_clean": q_c4_clean,
        "pca_power": q_pca_power,
        "epoch_shuffle": q_epoch_shuffle,
        "leak_split": q_leak_split,
        "span_scrub": q_span_scrub,
        "padding_waste": q_padding_waste,
        "shard_manifest": q_shard_manifest,
        "pack_nosplit": q_pack_nosplit,
        # ---- every entry below has >=2 driver-green
        # checks (or is a redundant variant of an in-window query, e.g.
        # frame_zcr ⊂ kernel_features zcr); re-verified locally by
        # tests/driver_compare.py each round ----
        # r4 demotions: incremental_dedup (r2+r3 green, bench drift
        # resolved as environment in BENCH/BASELINE.md), kmeans /
        # pack_shards (r2 rows-green + r3 hash-green), rhythm (r1+r3
        # double-green; its flux/onset path is untouched by the r4
        # kernel-batch changes — slot yielded to source_overlap),
        # kernel_features (r1+r3 double-green — slot yielded to
        # cms_freq; the r4 kernel rewrite keeps five in-window rows)
        "kernel_features": q_kernel_features,
        "rhythm": q_rhythm,
        "incremental_dedup": q_incremental_dedup,
        "kmeans": q_kmeans,
        "pack_shards": q_pack_shards,
        "salted_join": q_salted_join,
        "multimodal": q_multimodal,
        "streaming_session": q_streaming_session,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "decontaminate": q_decontaminate,
        "ivf_ann": q_ivf_ann,
        "lsh_ann": q_lsh_ann,
        "corpus_profile": q_corpus_profile,
        "pii_redact": q_pii_redact,
        "span_dedup": q_span_dedup,
        "vocab": q_vocab,
        "ann_topk": q_ann_topk,
        "asof_join": q_asof_join,
        "quarantine": q_quarantine,
        "minhash_lsh": q_minhash_lsh,
        "embed_neardup": q_embed_neardup,
        "ngram_jaccard": q_ngram_jaccard,
        "text_quality": q_text_quality,
        "dedup_exact": q_dedup_exact,
        "session_tempo": q_session_tempo,
        "sessionize": q_sessionize,
        "doc_stats": q_doc_stats,
        "framing_counts": q_framing_counts,
        "frame_rms": q_frame_rms,
        "lag_lead": q_lag_lead,
        "rolling": q_rolling,
        "ffill": q_ffill,
        "enrich_broadcast": q_enrich_broadcast,
        "salted_agg": q_salted_agg,
        "topk_per_group": q_topk_per_group,
        "tpch_q1": q_tpch_q1,
        "frame_zcr": q_frame_zcr,
        "lang_id": q_lang_id,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
    }
    # positions 51-141: the 91 veterans above; tail 142-164: the 23
    # permanent compare-only holdouts (justifications at R5_HOLDOUTS)
    out.update(base)
    out.update({k: staged[k] for k in R5_HOLDOUTS})
    return out


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB twins)
# ---------------------------------------------------------------------------

H32 = DT.H32  # single source of truth for the portable hash recipe


def _pii_redact_sql() -> str:
    """DuckDB twin of q_pii_redact: identical deterministic PII injection,
    then the SAME ordered regex pipeline (functions/pii.py is the single
    source of truth for patterns on both sides)."""
    from audiopro_essentia_spark.functions import pii as P

    counts = P.pii_count_sql("t2")
    red = P.pii_sql_steps("t2")
    return f"""
WITH t AS (SELECT doc_id, text ||
  CASE doc_id % 4
    WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
    WHEN 1 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 up'
    WHEN 2 THEN ' call +1 555-123-4567'
    ELSE '' END AS t2 FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST({counts['n_email']} AS BIGINT) AS n_email,
  CAST({counts['n_ipv4']} AS BIGINT) AS n_ipv4,
  CAST({counts['n_phone']} AS BIGINT) AS n_phone,
  {H32.format(x=red)} AS red_h32
FROM t
"""


def oracle_sql() -> dict[str, str]:
    h32w = H32.format(x="w")
    # rendered from the ONE Spark source (functions.text.STOPWORDS) —
    # hand-copied literals here desync silently when the list changes
    from audiopro_essentia_spark.duck_twins import stopword_sql_list

    sw_en = stopword_sql_list("en")
    # the ONE shingle-projection owner (duck_twins._shingle_select_sql,
    # twin of word_ngrams) — textual copies of the convention drift
    shingle_cte = "sh AS (" + DT._shingle_select_sql(3, "documents") + ")"
    cos = (
        "round(list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 6)"
    )
    base = {
        "framing_counts": f"""
WITH {FRAMES_CTE}
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames FROM f GROUP BY doc_id
""",
        "frame_rms": f"""
WITH {FRAMES_CTE}
SELECT doc_id, frame_idx,
  round(sqrt(list_sum(list_transform(w, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))/{DF_}.0), 6) AS rms,
  round(20.0 * log10(sqrt(list_sum(list_transform(w, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))/{DF_}.0) + 2.220446049250313e-16), 6) AS volume
FROM f
""",
        "frame_zcr": f"""
WITH {FRAMES_CTE},
m AS (SELECT doc_id, frame_idx, w,
      list_sum(list_transform(w, x -> CAST(x AS DOUBLE)))/{DF_}.0 AS mu FROM f)
SELECT doc_id, frame_idx,
  round(CAST(list_sum(list_transform(generate_series(1, {DF_ - 1}),
    i -> CASE WHEN (CAST(w[i] AS DOUBLE) > mu) <> (CAST(w[i+1] AS DOUBLE) > mu)
         THEN 1 ELSE 0 END)) AS DOUBLE) / {DF_ - 1}.0, 6) AS mcr
FROM m
""",
        "doc_stats": f"""
WITH {TOKS_CTE}
SELECT doc_id,
  round(CAST(list_max(toks) AS DOUBLE), 6) AS peak,
  round(sqrt(list_sum(list_transform(toks, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))/len(toks)), 6) AS rms,
  round(list_sum(list_transform(toks, x -> CAST(x AS DOUBLE)))/len(toks), 6) AS dc_offset,
  round(list_sum(list_transform(toks, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), 6) AS energy
FROM t WHERE len(toks) > 0
""",
        "quarantine": f"""
WITH {TOKS_CTE}
SELECT CASE
    WHEN toks IS NULL OR len(toks) = 0 THEN 'empty'
    WHEN list_sum(list_transform(toks, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) <= 1e-6 THEN 'low_energy'
    WHEN (len(toks) - (len(toks) % 2)) < {DF_} THEN 'too_short'
    ELSE NULL END AS reject_reason,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM t GROUP BY 1
""",
        "lag_lead": """
SELECT user_id, event_id, value,
  lag(value) OVER w AS value_lag1,
  lead(value) OVER w AS value_lead1
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        "monitor_stats": """
WITH s AS MATERIALIZED (
  SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd,
         count(*) AS n
  FROM events GROUP BY event_type),
k AS (
  SELECT e.event_type, e.value, s.n
  FROM events e JOIN s USING (event_type)
  WHERE s.sd = 0 OR abs(e.value - s.m) <= 2 * s.sd)
SELECT event_type,
  CAST(max(n) AS BIGINT) AS n_samples,
  CAST(count(*) AS BIGINT) AS n_kept,
  round(avg(value), 6) AS avg_value,
  round(max(value), 6) AS peak_value
FROM k GROUP BY event_type
""",
        "rolling": """
SELECT user_id, event_id,
  round(avg(value) OVER w, 6) AS roll_avg,
  round(sum(value) OVER w, 6) AS roll_sum,
  round(min(value) OVER w, 6) AS roll_min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
        "ffill": """
SELECT user_id, event_id,
  round(last_value(v IGNORE NULLS) OVER w, 6) AS v_ffill,
  round(first_value(v IGNORE NULLS) OVER w2, 6) AS v_bfill
FROM (SELECT *, CASE WHEN event_type = 'purchase' THEN value END AS v FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
""",
        "sessionize": """
SELECT user_id, event_id,
  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
    THEN 1 ELSE 0 END AS is_new
  FROM events)
""",
        "session_tempo": """
WITH s AS (
  SELECT user_id, ts,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (SELECT user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
          THEN 1 ELSE 0 END AS is_new FROM events)
),
b AS (SELECT user_id, session_id,
        CAST(epoch_us(min(ts)) AS DOUBLE)/1e6 AS boundary
      FROM s GROUP BY user_id, session_id),
d AS (SELECT user_id, boundary - lag(boundary) OVER
        (PARTITION BY user_id ORDER BY boundary) AS diff
      FROM b),
nb AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions FROM b GROUP BY user_id),
md AS (SELECT user_id, median(CAST(diff AS DOUBLE)) AS med FROM d
       WHERE diff IS NOT NULL GROUP BY user_id)
SELECT nb.user_id, nb.n_sessions,
  round(CASE WHEN nb.n_sessions > 1 AND md.med > 0 THEN 60.0 / md.med ELSE 0.0 END, 6) AS tempo_analog
FROM nb LEFT JOIN md ON nb.user_id = md.user_id
""",
        "asof_join": """
WITH clicks AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
purch AS (SELECT user_id, ts, max(value) AS pvalue FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.user_id, c.event_id, round(c.value, 6) AS value,
       p.ts AS matched_ts, round(p.pvalue, 6) AS pvalue
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND p.ts <= c.ts
""",
        "pit_assembly": """
WITH clicks AS (SELECT user_id, event_id, ts, value FROM events
                WHERE event_type = 'click'),
purch AS (SELECT user_id, ts, max(value) AS pvalue FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts),
views AS (SELECT user_id, ts, max(value) AS vvalue FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts),
err AS (SELECT user_id, ts, CAST(count(*) AS BIGINT) AS n FROM events
        WHERE event_type = 'error' GROUP BY user_id, ts),
errc AS (SELECT user_id, ts,
  CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS cum_err
  FROM err)
SELECT c.user_id, c.event_id, round(c.value, 6) AS value,
  round(p.pvalue, 6) AS pvalue,
  CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS purchase_age_us,
  round(v.vvalue, 6) AS vvalue,
  CAST(coalesce(e.cum_err, 0) AS BIGINT) AS n_err
FROM clicks c
ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND p.ts <= c.ts
ASOF LEFT JOIN views v ON c.user_id = v.user_id AND v.ts <= c.ts
ASOF LEFT JOIN errc e ON c.user_id = e.user_id AND e.ts <= c.ts
""",
        "enrich_broadcast": """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "salted_agg": """
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
  round(CAST(sum(n_chars) AS BIGINT) / CAST(count(n_chars) AS BIGINT), 6)
    AS avg_n_chars
FROM documents GROUP BY source
""",
        "salted_join": """
WITH k AS (SELECT doc_id,
  CASE WHEN ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)
             % 1000) < 800
       THEN 'hot' ELSE source END AS skew_key
  FROM documents)
SELECT k.doc_id, k.skew_key, s.key_docs
FROM k JOIN (SELECT skew_key, CAST(count(*) AS BIGINT) AS key_docs
             FROM k GROUP BY skew_key) s USING (skew_key)
""",
        "corpus_rollup": """
WITH t AS (SELECT source, n_chars,
  CASE WHEN n_chars < 1000 THEN 'short' ELSE 'long' END AS len_class
  FROM documents)
SELECT source, len_class,
  CAST(GROUPING(source, len_class) AS BIGINT) AS gid,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(CAST(sum(n_chars) AS BIGINT) / CAST(count(n_chars) AS BIGINT), 6)
    AS avg_chars
FROM t GROUP BY ROLLUP (source, len_class)
""",
        "topk_per_group": """
SELECT lang, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
  SELECT lang, doc_id, n_chars,
    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents) WHERE rank <= 3
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "dedup_exact": """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
""",
        "ngram_jaccard": f"""
WITH {shingle_cte},
nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM nz),
cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE), 6) AS jaccard
FROM cand JOIN nz a ON cand.id_a = a.doc_id JOIN nz b ON cand.id_b = b.doc_id
WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE), 6) >= 0.5
""",
        "minhash_lsh": DT.minhash_sql(k=16, bands=4, ngram=3),
        "dedup_clusters": DT.clusters_sql(DT.minhash_sql(k=16, bands=4, ngram=3)),
        # chroma_band full-range at the F=16 miniature: the production
        # 40-5000 Hz HPCP gate would leave a 2756-Hz-resolution toy
        # spectrum 1 usable bin (near-vacuous check) AND put interpolated
        # peaks within fp noise of the 5000 Hz cut; full range keeps all
        # 7 interior bins folding and every gate comparison far from its
        # boundary. The production gate is pinned by numpy goldens.
        "kernel_features": DT.kernel_sql(
            KF_, KH_, KSR_, KSCALE_, KERNEL_FEATURES, KMELS_,
            chroma_band=(0.0, KSR_ / 2.0),
        ),
        "fused_pipeline": DT.kernel_sql(
            KF_, KH_, KSR_, KSCALE_, FUSED_FEATURES, KMELS_,
            doc_id_varchar=True, chroma_band=(0.0, KSR_ / 2.0),
        ),
        "kernel_full_geometry": DT.kernel_time_sql(
            2048, 512, 44100, KSCALE_, repeat=GEO_REP_
        ),
        "mfcc_delta": DT.kernel_delta_sql(
            KF_, KH_, KSR_, KSCALE_, KMELS_,
            coeffs=tuple(range(N_DELTA_COEF)), width=2,
        ),
        "seq_metadata": """
WITH t AS (SELECT doc_id, list_transform(string_split(text, ' '),
  w -> length(w)) AS toks FROM documents),
m AS (SELECT doc_id, toks, len(list_distinct(toks)) AS vocab FROM t)
SELECT doc_id,
  md5(array_to_string(list_transform(toks,
      x -> coalesce(CAST(x AS VARCHAR), 'null')), ','))
    AS content_md5,
  sha256(array_to_string(list_transform(toks,
      x -> coalesce(CAST(x AS VARCHAR), 'null')), ','))
    AS content_sha256,
  CAST(len(toks) AS BIGINT) AS n_tok,
  round(CAST(len(toks) AS DOUBLE) / 44100.0, 6) AS duration_sec,
  CAST(44100 AS INT) AS sample_rate,
  CAST(1 AS INT) AS channels,
  'tokens-v1' AS codec,
  CAST(vocab AS BIGINT) AS vocab_size,
  CAST(list_min(toks) AS BIGINT) AS tok_min,
  CAST(list_max(toks) AS BIGINT) AS tok_max,
  CAST(CASE WHEN vocab <= 1 THEN 1
       ELSE CAST(ceil(log2(CAST(vocab AS DOUBLE))) AS INT) END AS BIGINT)
    * 44100 AS bit_rate
FROM m
""",
        "spectral_flux": DT.flux_sql(KF_, KH_, KSR_, KSCALE_),
        "spectral_contrast": DT.contrast_sql(KF_, KH_, KSR_, KSCALE_),
        "rhythm": DT.rhythm_sql(KF_, KH_, KSR_, KSCALE_),
        "multimodal": DT.multimodal_sql(hist_bins=16),
        "media_frames": DT.media_frames_sql(n_frames=4, frame_bytes=64),
        "curate": DT.curate_sql(min_quality=0.3, langs=("en",), k=16, bands=4),
        "hash_split": """
SELECT doc_id,
  CASE WHEN ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)) % 1000 < 800 THEN 'train'
       WHEN ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)) % 1000 < 900 THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
        "mixture_sample": """
SELECT doc_id, source FROM documents
WHERE ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)) % 1000
  < CASE WHEN source = 'src0' THEN 1000
         WHEN source = 'src1' THEN 300
         ELSE 500 END
""",
        "token_budget": """
WITH t AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS total
           FROM documents GROUP BY source),
r AS (SELECT source, CASE
    WHEN source = 'src0' THEN LEAST(1000,
      CAST(floor(CAST(2000 AS DOUBLE) * 1000.0 / total + 0.5) AS BIGINT))
    WHEN source = 'src1' THEN LEAST(1000,
      CAST(floor(CAST(4000 AS DOUBLE) * 1000.0 / total + 0.5) AS BIGINT))
    ELSE 1000 END AS rate_pm FROM t)
SELECT d.doc_id, d.source, r.rate_pm
FROM documents d JOIN r USING (source)
WHERE ((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)) % 1000
  < r.rate_pm
""",
        "simhash": DT.simhash_pairs_sql(ngram=2, max_hamming=3),
        "incremental_dedup": DT.incremental_sql(k=16, bands=4),
        "chunk_documents": f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
n AS (SELECT doc_id, ws,
  CASE WHEN len(ws) <= 32 THEN 1
       ELSE CAST((len(ws) - 32) // 24 + 1 AS INT) END AS n_chunks FROM w),
e AS (SELECT doc_id, ws, CAST(i AS INT) AS chunk_idx
      FROM n, LATERAL UNNEST(generate_series(0, n_chunks - 1)) AS g(i)),
c AS (SELECT doc_id, chunk_idx,
      array_to_string(list_slice(ws, chunk_idx*24 + 1, chunk_idx*24 + 32), ' ') AS t,
      len(list_slice(ws, chunk_idx*24 + 1, chunk_idx*24 + 32)) AS nw
      FROM e)
SELECT doc_id, chunk_idx, {H32.format(x='t')} AS chunk_h32,
       CAST(nw AS INT) AS n_chunk_words
FROM c
""",
        "hashed_embedding": f"""
WITH tok AS (SELECT doc_id, w
      FROM (SELECT doc_id,
              unnest(string_split(coalesce(text, ''), ' ')) AS w
            FROM documents)
      WHERE w <> ''),
slot AS (SELECT doc_id, (({h32w}) % 64 + 64) % 64 AS i FROM tok),
cnt AS (SELECT doc_id, i, COUNT(*) AS c FROM slot GROUP BY doc_id, i),
m AS (SELECT doc_id, list(i ORDER BY i) AS idxs, list(c ORDER BY i) AS cs
      FROM cnt GROUP BY doc_id),
arr AS (SELECT doc_id, list_transform(generate_series(0, 63),
    j -> CASE WHEN coalesce(list_position(idxs, j), 0) > 0
         THEN CAST(cs[list_position(idxs, j)] AS DOUBLE) ELSE 0.0 END) AS a
  FROM m),
nrm AS (SELECT doc_id, a,
    sqrt(list_sum(list_transform(a, x -> x * x))) AS norm FROM arr)
SELECT d.doc_id,
  CAST(coalesce(len(list_filter(n.a, x -> x > 0)), 0) AS INT) AS nnz,
  coalesce(round(list_sum(list_transform(n.a, x -> x / n.norm)), 6), 0.0)
    AS e_sum
FROM documents d LEFT JOIN nrm n USING (doc_id)
""",
        "decontaminate": f"""
WITH sh AS (
  {DT._shingle_select_sql(5, "documents")}),
bset AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 97 = 0),
tsh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE doc_id % 97 <> 0),
shared AS (SELECT t.doc_id, COUNT(*) AS n_shared
           FROM tsh t JOIN bset USING (shingle) GROUP BY t.doc_id)
SELECT d.doc_id,
  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
  CAST(CASE WHEN coalesce(s.n_shared, 0) >= 1 THEN 1 ELSE 0 END AS INT) AS contaminated
FROM documents d LEFT JOIN shared s USING (doc_id)
WHERE d.doc_id % 97 <> 0
""",
        "normalized_dedup": r"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         translate(text, 'abcdefghijklmnopqrstuvwxyz',
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ') FROM documents),
n AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(
         translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz'),
         '[.,;:!?''"()\[\]{}]', '', 'g'), '\s+', ' ', 'g')) AS ntext
  FROM u)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM n GROUP BY md5(ntext)
""",
        "streaming_session": DT.streaming_session_sql(gap_seconds=1800),
        "embed_neardup": f"""
WITH u AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
    list_transform(generate_series(1, len(embedding)),
      i -> CASE WHEN i = 1 THEN CAST(embedding[1] AS DOUBLE) + 0.05
           ELSE CAST(embedding[i] AS DOUBLE) END)
  FROM embeddings)
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b, {cos} AS cosine
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE {cos} >= 0.95
""",
        "ann_topk": f"""
SELECT * FROM (
  SELECT CAST(a.vec_id AS BIGINT) AS query_id, CAST(b.vec_id AS BIGINT) AS vec_id,
    {cos} AS cosine,
    CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, b.vec_id ASC) AS INT) AS rank
  FROM embeddings a JOIN embeddings b ON true
  WHERE a.vec_id < 5
) WHERE rank <= 5
""",
        "lsh_ann": DT.lsh_ann_sql(dim=64, n_planes=6, seed=42, k=5),
        "kmeans": DT.kmeans_sql(k=8, dim=64),
        "semantic_dedup": DT.semantic_dedup_sql(k=8, dim=64, threshold=0.95),
        "hll_distinct": DT.hll_sql(p=7),
        "cms_freq": DT.cms_sql(words=CMS_QUERY_WORDS, d=CMS_D, w=CMS_W),
        "source_overlap": DT.source_overlap_sql(ngram=3),
        "kl_drift": DT.kl_sql(top_n=500),
        "zipf_slope": DT.zipf_sql(top_n=200),
        "bigram_surprisal": """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
       FROM w, LATERAL UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
       WHERE len(ws) >= 2),
bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
uc AS (SELECT w1, COUNT(*) AS c1
       FROM (SELECT unnest(ws) AS w1 FROM w) GROUP BY w1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uc),
s AS (SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        -- scale-0 micro recipe (NOT round(x, 6)): -sm/(1e6 n) lands on
        -- an exact 6-decimal half whenever n | 2*sm (hit live at sf0.1,
        -- n=10) and the engines' round-6 tie rules split; round() at
        -- scale 0 ties away from zero in BOTH engines
        CAST(CAST(round(-(CAST(CAST(SUM(CAST(round(
                  ln((bc.cb + 0.5) / (uc.c1 + 0.5 * v.v)) * 1e6)
                AS BIGINT)) AS BIGINT) AS DOUBLE))
              / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1e6
          AS avg_logloss
      FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
      GROUP BY bg.doc_id)
SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.avg_logloss
FROM documents d LEFT JOIN s USING (doc_id)
""",
        "quality_classifier": f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
a AS (SELECT doc_id, len(ws) AS nw,
        list_sum(list_transform(ws, x ->
          ({DT_CLF_WEIGHTS})[((('0x' || substr(md5(x), 1, 8))::BIGINT) % {CLF_DIM}) + 1])) AS acc
      FROM w)
SELECT doc_id,
  round(1.0 / (1.0 + exp(-(CASE WHEN nw > 0 THEN acc / CAST(nw AS DOUBLE)
                           ELSE 0.0 END))), 6) AS clf_score
FROM a
""",
        "ann_recall": f"""
WITH ex AS (
SELECT * FROM (
  SELECT CAST(a.vec_id AS BIGINT) AS query_id, CAST(b.vec_id AS BIGINT) AS vec_id,
    {cos} AS cosine,
    CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, b.vec_id ASC) AS INT) AS rank
  FROM embeddings a JOIN embeddings b ON true
  WHERE a.vec_id < 5
) WHERE rank <= 5),
ap AS ({DT.lsh_ann_sql(dim=64, n_planes=6, seed=42, k=5)}),
hit AS (SELECT ex.query_id, COUNT(*) AS n_hit
        FROM ex JOIN ap ON ex.query_id = ap.query_id AND ex.vec_id = ap.vec_id
        GROUP BY ex.query_id)
SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
  CAST(coalesce(any_value(hit.n_hit), 0) AS BIGINT) AS n_hit,
  round(CAST(coalesce(any_value(hit.n_hit), 0) AS DOUBLE) / COUNT(*), 6) AS recall
FROM ex LEFT JOIN hit USING (query_id) GROUP BY ex.query_id
""",
        # nprobe == n_centroids covers every cell -> exact == brute force
        "ivf_ann": f"""
SELECT * FROM (
  SELECT CAST(a.vec_id AS BIGINT) AS query_id, CAST(b.vec_id AS BIGINT) AS vec_id,
    {cos} AS cosine,
    CAST(row_number() OVER (PARTITION BY a.vec_id ORDER BY {cos} DESC, b.vec_id ASC) AS INT) AS rank
  FROM embeddings a JOIN embeddings b ON true
  WHERE a.vec_id < 5
) WHERE rank <= 5
""",
        "text_quality": f"""
WITH q AS (
  SELECT doc_id, n_chars, text,
    string_split(text, ' ') AS ws,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
    CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digit
  FROM documents
), m AS (
  SELECT doc_id, n_chars, n_words,
    list_sum(list_transform(ws, w -> CAST(length(w) AS DOUBLE))) / n_words AS avg_word_len,
    CAST(len(list_filter(ws, w -> list_contains({sw_en}, w))) AS DOUBLE) / n_words AS stopword_ratio,
    n_punct / CAST(length(text) AS DOUBLE) AS punct_ratio,
    n_digit / CAST(length(text) AS DOUBLE) AS digit_ratio
  FROM q
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_words AS BIGINT) AS n_words,
  round(avg_word_len, 6) AS avg_word_len,
  round(stopword_ratio, 6) AS stopword_ratio,
  round(0.4 * least(stopword_ratio * 4.0, 1.0)
      + 0.3 * (1.0 - least(abs(avg_word_len - 5.0) / 10.0, 1.0))
      + 0.15 * (1.0 - least(punct_ratio * 5.0, 1.0))
      + 0.15 * (1.0 - least(digit_ratio * 5.0, 1.0)), 6) AS quality_score
FROM m
""",
        "repetition": """
WITH g AS (
  SELECT doc_id, text,
    CASE WHEN len(string_split(text,' ')) - 1 < 1 THEN CAST([] AS VARCHAR[])
    ELSE list_transform(generate_series(1, greatest(len(string_split(text,' ')) - 1, 1)),
         i -> array_to_string(list_slice(string_split(text,' '), i, i+1), ' ')) END AS grams
  FROM documents),
base AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS nc,
    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
    CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) AS ndw,
    CAST(len(grams) AS DOUBLE) AS ng,
    CAST(len(list_distinct(grams)) AS DOUBLE) AS ndg
  FROM g),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM ex GROUP BY doc_id, gram),
top AS (SELECT doc_id, c AS topc, CAST(length(gram) AS DOUBLE) AS topl FROM
        (SELECT doc_id, gram, c,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) AS rn
         FROM cnt) WHERE rn = 1)
SELECT b.doc_id, b.n_words,
  round(coalesce((CAST(b.n_words AS DOUBLE) - b.ndw) / nullif(CAST(b.n_words AS DOUBLE), 0), 0.0), 6) AS dup_word_frac,
  round(coalesce((b.ng - b.ndg) / nullif(b.ng, 0), 0.0), 6) AS dup_ngram_frac,
  round(coalesce(CAST(t.topc AS DOUBLE) * t.topl / nullif(b.nc, 0), 0.0), 6) AS top_ngram_char_frac
FROM base b LEFT JOIN top t USING (doc_id)
""",
        "corpus_profile": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50,
  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90,
  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 6) AS p99
FROM documents GROUP BY source
""",
        "pack_shards": """
WITH c AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(string_split(text, ' '),
         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens,
    doc_id % 64 AS b
  FROM documents),
g AS (
  SELECT doc_id, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (ORDER BY b, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS global_offset
  FROM c)
SELECT doc_id, n_tokens, global_offset,
  CAST(global_offset // 4096 AS BIGINT) AS shard_id,
  CAST(global_offset % 4096 AS BIGINT) AS shard_offset
FROM g
""",
        "surprisal": """
WITH tok AS (SELECT doc_id, w FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''),
wc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
total AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM wc)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
  -- scale-0 micro recipe, NOT round(x, 6) — the bigram tie fix
  CAST(CAST(round((-CAST(SUM(CAST(round(ln(wc.c / total.n) * 1e6)
                             AS BIGINT)) AS DOUBLE))
                  / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1e6
    AS avg_logloss
FROM tok t JOIN wc USING (w) CROSS JOIN total
GROUP BY t.doc_id
""",
        "tfidf": """
WITH tok AS (SELECT doc_id, term FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         round(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), 6) AS score
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, term, CAST(rank AS INT) AS rank, score FROM ranked WHERE rank <= 5
""",
        "lang_id": f"""
SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM ({DT.lang_pred_sql()}) GROUP BY 1
""",
        "token_count": """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(list_sum(list_transform(string_split(text, ' '),
       w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_ish
FROM documents
""",
        "fingerprint": f"""
SELECT doc_id,
  CASE WHEN len(string_split(text, ' ')) = 0 THEN 0
  ELSE list_reduce(list_transform(string_split(text, ' '), w -> {h32w}),
       (a, b) -> (a * 31 + b) % {MERSENNE}) % {MERSENNE}
  END AS fp
FROM documents
""",
        "pii_redact": _pii_redact_sql(),
        "vocab": """
WITH c AS (
  SELECT w AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
r AS (SELECT word, cnt,
      row_number() OVER (ORDER BY cnt DESC, word ASC) AS id FROM c)
SELECT word, CAST(id AS INT) AS id, CAST(cnt AS BIGINT) AS cnt
FROM r WHERE id <= 100
""",
        "quantize_embed": f"""
WITH v AS (SELECT vec_id,
  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
m AS (SELECT vec_id, v,
  list_max(list_transform(v, x -> abs(x))) AS mx FROM v),
q AS (SELECT vec_id, mx / 127.0 AS scale,
  CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
  ELSE list_transform(v, x -> CAST(floor(x / (mx / 127.0) + 0.5) AS INT))
  END AS qv FROM m)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(scale, 6) AS scale,
  {H32.format(x="array_to_string(qv, ',')")} AS q_h32
FROM q
""",
        "vocab_by_source": """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
d AS (SELECT source, COUNT(DISTINCT w) AS n_distinct_words
      FROM w WHERE w <> '' GROUP BY source),
n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT n.source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(coalesce(n_distinct_words, 0) AS BIGINT) AS n_distinct_words
FROM n LEFT JOIN d USING (source)
""",
        "encode_tokens": f"""
WITH c AS (
  SELECT w AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
v AS (SELECT word, id FROM (
  SELECT word, row_number() OVER (ORDER BY cnt DESC, word ASC) AS id FROM c)
  WHERE id <= 20),
w AS (SELECT doc_id, CAST(i AS INT) AS pos, ws[i] AS word
      FROM (SELECT doc_id,
              string_split(coalesce(text, ''), ' ') AS ws FROM documents),
      LATERAL UNNEST(generate_series(1, len(ws))) AS g(i)
      WHERE ws[i] <> ''),
j AS (SELECT w.doc_id, w.pos, coalesce(v.id, 0) AS id
      FROM w LEFT JOIN v USING (word)),
e AS (SELECT doc_id,
        string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_s,
        COUNT(*) AS n_ids,
        SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS n_unk
      FROM j GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(coalesce(e.n_ids, 0) AS BIGINT) AS n_ids,
  CAST(coalesce(e.n_unk, 0) AS BIGINT) AS n_unk,
  {H32.format(x="coalesce(e.ids_s, '')")} AS ids_h32
FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
""",
        "bpe_merges": DT.bpe_sql(6),
        "bpe_encode": DT.bpe_encode_sql(6),
        "snapshot_diff": """
WITH b AS MATERIALIZED (SELECT doc_id, text,
  ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT)
   % 1000) AS bk
  FROM documents),
old AS MATERIALIZED (
  SELECT doc_id, md5(coalesce(CAST(text AS VARCHAR), '')) AS d FROM b),
new AS MATERIALIZED (
  SELECT doc_id,
    md5(coalesce(CASE WHEN bk < 150 THEN text || ' [rev2]'
                 ELSE text END, '')) AS d
  FROM b WHERE bk >= 50
  UNION ALL
  SELECT doc_id + 1000000, md5(coalesce(CAST(text AS VARCHAR), ''))
  FROM b WHERE bk < 50)
SELECT CAST(coalesce(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.d = n.d THEN 'same' ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
""",
        "drift_psi": """
WITH c AS MATERIALIZED (
  SELECT coalesce(CAST(source AS VARCHAR), '__null__') AS grp,
         CAST(least(floor(CAST(n_chars AS DOUBLE) / 100.0), 9) AS INT)
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
sp AS MATERIALIZED (
  SELECT g.grp, CAST(r.range AS INT) AS bucket
  FROM (SELECT DISTINCT grp FROM c) g, range(10) r),
f AS MATERIALIZED (
  SELECT sp.grp, sp.bucket, coalesce(c.c, 0) AS c
  FROM sp LEFT JOIN c ON sp.grp = c.grp AND sp.bucket = c.bucket),
tg AS (SELECT grp, SUM(c) AS n_g FROM f GROUP BY grp),
tb AS (SELECT bucket, SUM(c) AS c_all FROM f GROUP BY bucket),
nt AS (SELECT SUM(c) AS n_all FROM f),
pq AS (
  SELECT f.grp,
    greatest(CAST(f.c AS DOUBLE) / n_g, 1e-06) AS p,
    CASE WHEN n_all - n_g = 0 THEN 1e-06
         ELSE greatest(CAST(c_all - f.c AS DOUBLE) / (n_all - n_g), 1e-06)
         END AS q
  FROM f JOIN tg USING (grp) JOIN tb USING (bucket) CROSS JOIN nt)
SELECT grp AS source,
  round(CAST(SUM(CAST(round((p - q) * ln(p / q) * 1e6) AS BIGINT))
        AS DOUBLE) / 1e6, 6) AS psi
FROM pq GROUP BY grp
""",
        "temperature_sample": f"""
WITH t AS MATERIALIZED (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total
  FROM documents GROUP BY source),
m AS (SELECT MIN(total) AS mn FROM t WHERE total > 0),
r AS (SELECT source,
        CAST(floor(sqrt(CAST(mn AS DOUBLE) / CAST(total AS DOUBLE))
                   * 1000.0 + 0.5) AS BIGINT) AS rate_pm
      FROM t, m)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source, r.rate_pm
FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
WHERE ({H32.format(x="CAST(d.doc_id AS VARCHAR) || ''")}) % 1000 < r.rate_pm
""",
        "cap_per_group": """
SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
  SELECT source, doc_id, n_chars,
    row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents) WHERE rank <= 5
""",
        "silence_segments": f"""
WITH {FRAMES_CTE},
e AS (SELECT doc_id, frame_idx,
        list_sum(list_transform(w,
          x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS energy
      FROM f),
fl AS (SELECT doc_id, frame_idx, energy, (energy >= 175) AS active FROM e),
ch AS (SELECT *, CASE WHEN lag(active) OVER wd IS NULL
                        OR lag(active) OVER wd <> active
                      THEN 1 ELSE 0 END AS chg
       FROM fl WINDOW wd AS (PARTITION BY doc_id ORDER BY frame_idx)),
isl AS (SELECT *, SUM(chg) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                 ROWS UNBOUNDED PRECEDING) AS seg
        FROM ch)
SELECT doc_id,
  CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
  CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
  CAST(COUNT(*) AS BIGINT) AS n_frames,
  CAST(MIN(frame_idx) * {DH_} AS BIGINT) AS start_token,
  CAST(MAX(frame_idx) * {DH_} + {DF_} AS BIGINT) AS end_token,
  round(sqrt(CAST(SUM(energy) AS DOUBLE)
             / CAST(COUNT(*) * {DF_} AS DOUBLE)), 6) AS seg_rms
FROM isl WHERE active GROUP BY doc_id, seg
""",
        "span_dedup": f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (SELECT doc_id,
        array_to_string(list_slice(ws, i*3 + 1, i*3 + 3), ' ') AS sp
      FROM w, LATERAL UNNEST(generate_series(0,
           CAST(len(ws) // 3 AS INT) - 1)) AS g(i)
      WHERE len(ws) >= 3),
h AS (SELECT doc_id, {H32.format(x='sp')} AS h,
             {DT.H32HI.format(x='sp')} AS h2 FROM s),
d AS (SELECT h, h2, COUNT(*) AS docfreq
      FROM (SELECT DISTINCT doc_id, h, h2 FROM h) GROUP BY h, h2)
SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(SUM(CASE WHEN d.docfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_spans,
  round(CAST(SUM(CASE WHEN d.docfreq >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS dup_ratio
FROM h JOIN d USING (h, h2) GROUP BY h.doc_id
""",
        "dsir_select": f"""
WITH w AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents),
uni AS (SELECT doc_id, unnest(ws) AS feat FROM w),
bi AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS feat
       FROM w, LATERAL UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
       WHERE len(ws) >= 2),
feats AS MATERIALIZED (
  SELECT doc_id, {H32.format(x='feat')} % 512 AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
tagged AS (SELECT doc_id,
        source IN ('src0','src1','src2','src3') AS is_tgt FROM documents),
fb AS MATERIALIZED (
  SELECT f.b, t.is_tgt FROM feats f JOIN tagged t USING (doc_id)),
counts AS (SELECT b, SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS np,
                  SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS nq
           FROM fb GROUP BY b),
tot AS (SELECT SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS tq FROM fb),
lr AS (SELECT b, CAST(round((ln((np + 0.5) / (tp + 256.0))
                             - ln((nq + 0.5) / (tq + 256.0))) * 1e6)
                 AS BIGINT) AS lrm
       FROM counts CROSS JOIN tot),
docw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                CAST(SUM(lrm) AS BIGINT) AS wm
         FROM feats JOIN lr USING (b) GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  CAST(coalesce(docw.n_feats, 0) AS BIGINT) AS n_feats,
  CAST(coalesce(docw.wm, 0) AS BIGINT) AS dsir_weight_micro,
  CAST(coalesce(docw.wm, 0) > 0 AS INT) AS keep
FROM documents d LEFT JOIN docw USING (doc_id)
""",
        "bm25": f"""
WITH {DT.bm25_ctes(', '.join(f"({i}, '{s}')" for i, s in BM25_QUERIES))},
rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         ORDER BY score_micro DESC, doc_id ASC) AS rank FROM agg)
SELECT CAST(query_id AS INT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
  n_hit_terms, score_micro, CAST(rank AS INT) AS rank
FROM rk WHERE rank <= {BM25_K}
""",
        "fertility": """
WITH w AS (SELECT coalesce(source, '__none__') AS source, text,
        list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents),
p AS (SELECT source, CAST(len(ws) AS BIGINT) AS nw,
        CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
             x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT)
          AS npc,
        CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
          AS BIGINT) AS nch
      FROM w),
g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(nw) AS BIGINT) AS n_words,
        CAST(SUM(npc) AS BIGINT) AS n_pieces,
        CAST(SUM(nch) AS BIGINT) AS n_chars
      FROM p GROUP BY source)
SELECT source, n_docs, n_words, n_pieces, n_chars,
  CASE WHEN n_words > 0
    THEN round(CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
  END AS fertility,
  CASE WHEN n_pieces > 0
    THEN round(CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE), 6)
  END AS chars_per_piece,
  CASE WHEN n_docs > 0
    THEN round(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
  END AS words_per_doc
FROM g
""",
        "c4_clean": f"""
WITH w AS (SELECT doc_id,
        list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
      FROM documents),
ln AS (SELECT doc_id, {DT.synth_lines_sql()} AS lined
  FROM w),
t2 AS (SELECT doc_id,
    CASE WHEN doc_id % 17 = 0
           THEN lined || chr(10) || 'lorem ipsum dolor sit amet consectetur.'
         WHEN doc_id % 13 = 0
           THEN lined || chr(10) || 'var cfg = {{ javascript: 1 }};'
         ELSE lined END AS text
  FROM ln),
k AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines,
        list_filter(string_split(text, chr(10)), l ->
          len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
          AND l[-1] IN ('.', '!', '?', '"')
          AND NOT contains(lower(l), 'javascript')) AS kept
      FROM t2)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept_lines,
  CAST((len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS INT) AS keep,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM k
""",
        "pack_nosplit": """
WITH RECURSIVE
c AS MATERIALIZED (
  SELECT doc_id,
    CAST(list_sum(list_transform(string_split(text, ' '),
         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n,
    CAST(doc_id % 64 AS INT) AS b,
    row_number() OVER (PARTITION BY doc_id % 64 ORDER BY doc_id) AS rn
  FROM documents),
rec(b, rn, doc_id, n, shard_seq, shard_offset, fill) AS (
  SELECT b, rn, doc_id, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT), n
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.b, c.rn, c.doc_id, c.n,
    CASE WHEN r.fill + c.n <= 96 THEN r.shard_seq ELSE r.shard_seq + 1 END,
    CASE WHEN r.fill + c.n <= 96 THEN r.fill ELSE CAST(0 AS BIGINT) END,
    CASE WHEN r.fill + c.n <= 96 THEN r.fill + c.n ELSE c.n END
  FROM rec r JOIN c ON c.b = r.b AND c.rn = r.rn + 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(n AS BIGINT) AS n_tokens,
  CAST(b AS INT) AS bucket,
  CAST(shard_seq AS BIGINT) AS shard_seq,
  CAST(shard_offset AS BIGINT) AS shard_offset,
  CAST(n > 96 AS INT) AS oversize
FROM rec
""",
        "shard_manifest": """
WITH c AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(string_split(text, ' '),
         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens,
    doc_id % 64 AS b
  FROM documents),
g AS (
  SELECT doc_id, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (ORDER BY b, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS global_offset
  FROM c),
p AS (
  SELECT doc_id, n_tokens,
    CAST(global_offset // 4096 AS BIGINT) AS shard_id,
    CAST(global_offset % 4096 AS BIGINT) AS shard_offset
  FROM g)
SELECT shard_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN shard_offset + n_tokens > 4096 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_straddlers,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_started,
  string_agg(CAST(shard_offset AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR),
             ',' ORDER BY shard_offset, doc_id) AS boundaries
FROM p GROUP BY shard_id
""",
        "pca_power": """
WITH v AS MATERIALIZED (
  SELECT vec_id, label,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
  FROM embeddings),
bt AS MATERIALIZED (
  SELECT i, CAST(SUM(v[i]) AS BIGINT) AS b
  FROM v, LATERAL UNNEST(generate_series(1, 64)) AS g(i) GROUP BY i),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
s1 AS MATERIALIZED (
  SELECT vec_id, label, v, CAST(list_sum(v) AS BIGINT) AS s FROM v),
t1 AS (SELECT CAST(SUM(s) AS BIGINT) AS st FROM s1),
a1 AS (SELECT i, CAST(SUM(v[i] * s) AS BIGINT) AS a
       FROM s1, LATERAL UNNEST(generate_series(1, 64)) AS g(i) GROUP BY i),
r1 AS (SELECT i, a - b * (st // n) AS raw
       FROM a1 JOIN bt USING (i) CROSS JOIN t1 CROSS JOIN nt),
d1 AS (SELECT GREATEST(1, MAX(abs(raw)) // 65536) AS dd FROM r1),
w1 AS MATERIALIZED (
  SELECT list(CAST(raw // dd AS BIGINT) ORDER BY i) AS wv
  FROM r1 CROSS JOIN d1),
s2 AS MATERIALIZED (
  SELECT vec_id, label, v,
    CAST(list_sum(list_transform(generate_series(1, 64),
      i -> v[i] * wv[i])) AS BIGINT) AS s
  FROM s1 CROSS JOIN w1),
t2p AS (SELECT CAST(SUM(s) AS BIGINT) AS st FROM s2),
a2 AS (SELECT i, CAST(SUM(v[i] * s) AS BIGINT) AS a
       FROM s2, LATERAL UNNEST(generate_series(1, 64)) AS g(i) GROUP BY i),
r2 AS (SELECT i, a - b * (st // n) AS raw
       FROM a2 JOIN bt USING (i) CROSS JOIN t2p CROSS JOIN nt),
d2 AS (SELECT GREATEST(1, MAX(abs(raw)) // 65536) AS dd FROM r2),
w2 AS MATERIALIZED (
  SELECT list(CAST(raw // dd AS BIGINT) ORDER BY i) AS wv
  FROM r2 CROSS JOIN d2)
SELECT CAST(s2.vec_id AS BIGINT) AS vec_id, CAST(s2.label AS INT) AS label,
  CAST(list_sum(list_transform(generate_series(1, 64),
    i -> v[i] * wv[i])) AS BIGINT) AS pc1_proj
FROM s2 CROSS JOIN w2
""",
        "leak_split": DT.cluster_split_sql(k=16, bands=4, ngram=3),
        "padding_waste": """
WITH p AS (SELECT coalesce(source, '__none__') AS source,
             CAST(n_chars AS BIGINT) AS n,
             (n_chars IS NOT NULL AND n_chars >= 0) AS ok
           FROM documents),
g AS (SELECT source,
        CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_bad,
        CAST(coalesce(SUM(CASE WHEN ok THEN n END), 0) AS BIGINT)
          AS n_tokens,
        CAST(coalesce(SUM(CASE WHEN ok
               THEN (n + 255) - ((n + 255) % 256) END), 0) AS BIGINT)
          AS naive_total
      FROM p GROUP BY source)
SELECT source, n_docs, n_bad, n_tokens,
  CAST(naive_total - n_tokens AS BIGINT) AS pad_naive,
  CAST(CASE WHEN n_tokens > 0
    THEN ((n_tokens + 255) - ((n_tokens + 255) % 256)) - n_tokens
    ELSE 0 END AS BIGINT) AS pad_packed,
  CASE WHEN naive_total > 0
    THEN round(CAST(n_tokens AS DOUBLE) / naive_total, 6) END
    AS efficiency_naive,
  CASE WHEN n_tokens > 0
    THEN round(CAST(n_tokens AS DOUBLE)
               / ((n_tokens + 255) - ((n_tokens + 255) % 256)), 6) END
    AS efficiency_packed
FROM g
""",
        "span_scrub": f"""
WITH w AS MATERIALIZED (
  SELECT doc_id,
    list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
  FROM documents),
occ AS MATERIALIZED (
  SELECT doc_id, i AS pos,
    {H32.format(x="array_to_string(list_slice(ws, i, i+7), ' ')")} AS h,
    {DT.H32HI.format(x="array_to_string(list_slice(ws, i, i+7), ' ')")} AS h2
  FROM w, LATERAL UNNEST(generate_series(1, len(ws) - 7)) AS g(i)
  WHERE len(ws) >= 8),
st AS MATERIALIZED (
  SELECT h, h2, COUNT(*) AS cnt, MIN(doc_id) AS cdoc
  FROM occ GROUP BY h, h2),
st2 AS MATERIALIZED (
  SELECT o.h, o.h2, MIN(o.pos) AS cpos
  FROM occ o JOIN st ON o.h = st.h AND o.h2 = st.h2 AND o.doc_id = st.cdoc
  GROUP BY o.h, o.h2),
dup AS (
  SELECT o.doc_id, o.pos
  FROM occ o JOIN st USING (h, h2) JOIN st2 USING (h, h2)
  WHERE st.cnt >= 2 AND NOT (o.doc_id = st.cdoc AND o.pos = st2.cpos)),
m AS (SELECT doc_id, list_sort(list(pos)) AS starts FROM dup GROUP BY doc_id),
j AS (SELECT w.doc_id, w.ws,
        coalesce(m.starts, CAST([] AS BIGINT[])) AS starts
      FROM w LEFT JOIN m USING (doc_id)),
k AS (SELECT doc_id, ws, starts,
        list_filter(generate_series(1, len(ws)),
          i -> len(list_filter(starts, s -> s <= i AND i < s + 8)) = 0)
          AS keep_idx
      FROM j)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(len(ws) - len(keep_idx) AS BIGINT) AS n_masked,
  coalesce(array_to_string(list_transform(keep_idx, i -> ws[i]), ' '), '')
    AS scrub_text
FROM k
""",
        "epoch_shuffle": f"""
WITH k AS (SELECT doc_id,
    {H32.format(x="('epoch0:' || CAST(doc_id AS VARCHAR))")} AS shuffle_key
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, shuffle_key,
  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
    AS epoch_pos
FROM k
""",
    }
    # staged-roster twins (keys mirror the staged block in queries())
    base.update(_staged_oracle_sql())
    return base
