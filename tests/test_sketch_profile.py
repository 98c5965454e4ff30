"""Unit tests for the round-4 monitoring operators: HLL cardinality
sketch (operators/sketch.py), lexical KL drift and Zipf slope
(operators/aggregates.py). Each is checked against an exact driver-side
Python mirror that replicates the operator's arithmetic op-for-op."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.operators.aggregates import (
    source_kl_divergence,
    zipf_slope,
)
from audiopro_essentia_spark.operators.sketch import hll_distinct, hll_registers


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _mirror_hll(values, p):
    width = 32 - p
    regs: dict[int, int] = {}
    for v in values:
        h = _h32(v)
        idx = h >> width
        rem = h & ((1 << width) - 1)
        rho = width + 1 if rem == 0 else width + 1 - rem.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = (alpha * m) * float(m) / s
    vz = float(m - len(regs))
    est = float(m) * math.log(float(m) / vz) if (raw <= 2.5 * m and vz > 0) else raw
    return regs, round(est, 6)


def test_hll_registers_and_estimate_match_mirror(spark):
    vals = [f"item{i}" for i in range(2000)] * 3  # duplicates collapse
    df = spark.createDataFrame(
        [(v, "g") for v in vals], "v string, source string"
    )
    regs = {
        r.reg_idx: r.reg
        for r in hll_registers(df, F.col("v"), p=10).collect()
    }
    est = hll_distinct(df, F.col("v"), p=10).collect()[0]
    m_regs, m_est = _mirror_hll(set(vals), 10)
    assert regs == m_regs
    assert est.estimate == m_est
    assert est.n_reg_nonzero == len(m_regs)
    # estimator sanity: HLL standard error at m=1024 is ~3.3%; allow 4 sigma
    assert abs(est.estimate - 2000) / 2000 < 0.13


def test_hll_registers_merge_across_shards(spark):
    a = [f"x{i}" for i in range(500)]
    b = [f"x{i}" for i in range(300, 900)]  # overlapping shard
    df_a = spark.createDataFrame([(v, "g") for v in a], "v string, source string")
    df_b = spark.createDataFrame([(v, "g") for v in b], "v string, source string")
    df_u = spark.createDataFrame(
        [(v, "g") for v in a + b], "v string, source string"
    )
    merged = (
        hll_registers(df_a, F.col("v"), p=8)
        .unionByName(hll_registers(df_b, F.col("v"), p=8))
        .groupBy("grp", "reg_idx")
        .agg(F.max("reg").alias("reg"))
    )
    whole = hll_registers(df_u, F.col("v"), p=8)
    got = {(r.reg_idx): r.reg for r in merged.collect()}
    want = {(r.reg_idx): r.reg for r in whole.collect()}
    assert got == want  # register-wise max IS the union sketch


def _mirror_kl(docs, top_n, eps=1e-9):
    """docs: list of (source, text). Mirrors source_kl_divergence."""
    from collections import Counter

    tok = [(s, w) for s, t in docs for w in t.split(" ") if w != ""]
    c_all = Counter(w for _, w in tok)
    head = sorted(c_all.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    groups = sorted({s for s, _ in tok})
    c_gw = Counter(tok)
    out = {}
    n_all = sum(
        c_gw.get((g, w), 0) for g in groups for w, _ in head
    )
    for g in groups:
        n_g = sum(c_gw.get((g, w), 0) for w, _ in head)
        total = 0
        for w, cw_all in head:
            c = c_gw.get((g, w), 0)
            p = eps if n_g == 0 else max(c / n_g, eps)
            q = (
                eps
                if n_all - n_g == 0
                else max((cw_all - c) / (n_all - n_g), eps)
            )
            term = p * math.log(p / q)
            # Python round() is half-even; Spark/DuckDB round() is
            # half-away — implement half-away explicitly
            x = term * 1e6
            total += int(math.floor(x + 0.5)) if x >= 0 else int(
                math.ceil(x - 0.5)
            )
        out[g] = (total, len(head), n_g)
    return out


def test_kl_divergence_matches_mirror_and_sign(spark):
    docs = [
        ("a", "cat dog cat bird cat dog"),
        ("a", "cat dog fish"),
        ("b", "fish fish fish shark fish shark"),
        ("b", "shark fish"),
        ("c", "cat dog bird fish shark"),  # near the corpus mix
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        r.source: (r.kl_micronats, r.n_terms, r.n_head_toks)
        for r in source_kl_divergence(df, top_n=5).collect()
    }
    want = _mirror_kl(docs, 5)
    assert got == want
    # skewed sources diverge strongly; the mixed source much less
    assert got["a"][0] > got["c"][0] and got["b"][0] > got["c"][0]
    assert got["c"][0] >= 0  # KL >= 0 up to micro-nat rounding


def test_kl_divergence_zero_overlap_source_still_emits(spark):
    """A source sharing NONE of the global top-N words must not vanish
    from the monitor (the spine is built from tok, not counts): it
    emits an all-eps row with n_head_toks = 0, matching the mirror."""
    docs = [
        ("a", "cat dog cat bird cat dog cat dog cat"),
        ("b", "cat dog fish cat dog fish cat dog"),
        ("z", "qqq zzz qqq"),  # off-spine at top_n=3
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        r.source: (r.kl_micronats, r.n_terms, r.n_head_toks)
        for r in source_kl_divergence(df, top_n=3).collect()
    }
    want = _mirror_kl(docs, 3)
    assert got == want
    assert "z" in got and got["z"][2] == 0
    # all-eps p against a sizable q: a few NEGATIVE micro-nats, never
    # a large positive KL — the n_head_toks=0 column is the flag
    assert got["z"][0] <= 0


def _mirror_zipf(counts, top_n):
    """counts: list of (word, count) for ONE source."""
    ranked = sorted(counts, key=lambda kv: (-kv[1], kv[0]))[:top_n]
    xs, ys = [], []
    for rank, (_, c) in enumerate(ranked, start=1):
        xs.append(int(math.floor(math.log(float(rank)) * 1e6 + 0.5)))
        ys.append(int(math.floor(math.log(float(c)) * 1e6 + 0.5)))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    return None if den == 0 else round((n * sxy - sx * sy) / den, 6)


def test_zipf_slope_exact_power_law(spark):
    # counts c_i = floor(4000 / i): an exact-ish Zipf corpus -> slope ~ -1
    counts = [(f"w{i:03d}", 4000 // i) for i in range(1, 41)]
    rows = [("s", " ".join([w] * c)) for w, c in counts]
    df = spark.createDataFrame(rows, "source string, text string")
    got = zipf_slope(df, top_n=40).collect()[0]
    assert got.n_ranks == 40
    assert got.slope == _mirror_zipf(counts, 40)
    assert -1.05 < got.slope < -0.95


def test_zipf_slope_degenerate_single_rank(spark):
    df = spark.createDataFrame(
        [("s", "same same same")], "source string, text string"
    )
    got = zipf_slope(df).collect()[0]
    assert got.n_ranks == 1 and got.slope is None


def test_hll_p_bounds(spark):
    df = spark.createDataFrame([("x", "g")], "v string, source string")
    with pytest.raises(ValueError):
        hll_registers(df, F.col("v"), p=6)  # m < 128 alpha is wrong
    with pytest.raises(ValueError):
        hll_registers(df, F.col("v"), p=17)


def test_source_ngram_overlap_matches_mirror(spark):
    from audiopro_essentia_spark.operators.dedup import source_ngram_overlap

    docs = [
        ("a", "x y z w"),          # shingles: {x y z, y z w}
        ("b", "x y z q"),          # {x y z, y z q}
        ("b", "y z w extra pad"),  # adds {y z w, z w extra, w extra pad}
        ("c", "p q r"),            # {p q r} — no overlap with a or b
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r.src_a, r.src_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in source_ngram_overlap(df, ngram=3).collect()
    }
    # mirror by hand: S_a = {xyz, yzw} (2); S_b = {xyz, yzq, yzw, zwe, wep}
    # (5); S_c = {pqr} (1). a∩b = {xyz, yzw} = 2 -> j = 2/(2+5-2) = 0.4
    assert got == {("a", "b"): (2, 2, 5, 0.4)}  # zero-overlap pairs omitted


def test_null_source_sentinel_in_monitoring_ops(spark):
    """NULL group keys must aggregate under '__null__', not vanish into
    a NULL group (the null-equi-join trap the PSI operator documents)."""
    docs = [
        (None, "a b c a b"),
        ("s1", "a b c d e"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    kl = {r.source for r in source_kl_divergence(df, top_n=5).collect()}
    zs = {r.source for r in zipf_slope(df, top_n=5).collect()}
    hl = {
        r.source
        for r in hll_distinct(
            df.select("source", F.explode(F.split("text", " ")).alias("w")),
            F.col("w"),
            p=7,
        ).collect()
    }
    assert kl == zs == hl == {"__null__", "s1"}


# ---------------------------------------------------------------- CMS ----


def _mirror_cms(pairs, d, w):
    """pairs: list of (grp, value). Mirrors cms_registers op-for-op."""
    regs: dict[tuple, int] = {}
    for g, v in pairs:
        for j in range(d):
            col = _h32(f"{j}:{v}") % w
            regs[(g, j, col)] = regs.get((g, j, col), 0) + 1
    return regs


def test_cms_registers_match_python_mirror(spark):
    from audiopro_essentia_spark.operators.sketch import cms_registers

    pairs = [(f"g{i % 3}", f"word{i % 40}") for i in range(400)]
    df = spark.createDataFrame(pairs, "source string, v string")
    got = {
        (r.grp, r.row_j, r.col): r.cnt
        for r in cms_registers(df, F.col("v"), d=3, w=64).collect()
    }
    assert got == _mirror_cms(pairs, 3, 64)


def test_cms_estimate_one_sided_and_tight(spark):
    """CMS guarantee: estimate >= exact for every queried item, and with
    w comfortably above the distinct count the min-over-d-rows estimate
    is exact unless the mirror shows a collision in ALL d rows."""
    from audiopro_essentia_spark.operators.sketch import (
        cms_estimate,
        cms_registers,
    )

    d_rows, w = 4, 512
    pairs = [("g", f"w{i % 25}") for i in range(250)]  # 10 each
    exact = {f"w{i}": 10 for i in range(25)}
    exact["absent"] = 0
    df = spark.createDataFrame(pairs, "source string, v string")
    regs = cms_registers(df, F.col("v"), d=d_rows, w=w)
    qdf = spark.createDataFrame(
        [(q,) for q in exact], "word string"
    )
    got = {
        r.word: r.cms_count
        for r in cms_estimate(regs, qdf, d=d_rows, w=w).collect()
    }
    mirror = _mirror_cms(pairs, d_rows, w)
    for q, true_c in exact.items():
        est = got[q]
        assert est >= true_c  # one-sided, always
        mirror_est = min(
            mirror.get(("g", j, _h32(f"{j}:{q}") % w), 0)
            for j in range(d_rows)
        )
        assert est == mirror_est  # and exactly the sketch's answer


def test_cms_registers_merge_by_sum(spark):
    """Counts are linear: per-shard sketches union by register-wise SUM
    (the CMS analog of HLL's register-wise max)."""
    from audiopro_essentia_spark.operators.sketch import cms_registers

    a = [("g", f"t{i % 7}") for i in range(70)]
    b = [("g", f"t{i % 11}") for i in range(110)]
    df_a = spark.createDataFrame(a, "source string, v string")
    df_b = spark.createDataFrame(b, "source string, v string")
    df_u = spark.createDataFrame(a + b, "source string, v string")
    merged = (
        cms_registers(df_a, F.col("v"), d=2, w=32)
        .unionByName(cms_registers(df_b, F.col("v"), d=2, w=32))
        .groupBy("grp", "row_j", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_registers(df_u, F.col("v"), d=2, w=32)
    got = {(r.row_j, r.col): r.cnt for r in merged.collect()}
    want = {(r.row_j, r.col): r.cnt for r in whole.collect()}
    assert got == want


def test_cms_null_values_ignored_and_param_guards(spark):
    from audiopro_essentia_spark.operators.sketch import (
        cms_estimate,
        cms_registers,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "a")], "source string, v string"
    )
    regs = cms_registers(df, F.col("v"), d=2, w=16)
    total = sum(r.cnt for r in regs.collect())
    assert total == 2 * 2  # two non-NULL occurrences x d rows
    with pytest.raises(ValueError, match="d >= 1"):
        cms_registers(df, F.col("v"), d=0, w=16)
    with pytest.raises(ValueError, match="d >= 1"):
        cms_estimate(regs, df.select(F.col("v").alias("word")), d=2, w=1)


def test_sketch_registers_merge_across_streaming_epochs(spark, tmp_path):
    """Integration pin of the sketches' mergeability claims on the REAL
    streaming path: per-micro-batch HLL registers merged by max and CMS
    registers merged by sum must equal the batch sketch over the whole
    stream — the per-shard/epoch union contract both operators document,
    exercised through foreachBatch instead of a hand-split DataFrame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from audiopro_essentia_spark.operators.sketch import cms_registers

    rows = [(f"s{i % 3}", f"w{i % 50}") for i in range(600)]
    tbl = pa.table(
        {
            "source": [r[0] for r in rows],
            "v": [r[1] for r in rows],
            "n": [(i * 13) % 2000 + 1 for i in range(600)],
        }
    )
    src = tmp_path / "stream"
    src.mkdir()
    pq.write_table(tbl.slice(0, 300), str(src / "p0.parquet"))
    pq.write_table(tbl.slice(300), str(src / "p1.parquet"))
    batch = spark.read.parquet(str(src))

    from audiopro_essentia_spark.operators.sketch import (
        bloom_registers,
        lq_registers,
    )

    got_hll, got_cms, got_lq, got_bloom, epochs = [], [], [], [], []

    def sink(bdf, eid):
        epochs.append(eid)
        got_hll.extend(hll_registers(bdf, F.col("v"), p=8).collect())
        got_cms.extend(
            cms_registers(bdf, F.col("v"), d=2, w=64).collect()
        )
        got_lq.extend(lq_registers(bdf, "n").collect())
        got_bloom.extend(
            bloom_registers(bdf, F.col("v"), m_bits=512, k=3).collect()
        )

    q = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert len(epochs) == 2  # the merge below must span real epochs

    from collections import defaultdict

    mh: dict = defaultdict(int)
    for r in got_hll:
        k = (r.grp, r.reg_idx)
        mh[k] = max(mh[k], r.reg)
    mc: dict = defaultdict(int)
    for r in got_cms:
        mc[(r.grp, r.row_j, r.col)] += r.cnt
    want_h = {
        (r.grp, r.reg_idx): r.reg
        for r in hll_registers(batch, F.col("v"), p=8).collect()
    }
    want_c = {
        (r.grp, r.row_j, r.col): r.cnt
        for r in cms_registers(batch, F.col("v"), d=2, w=64).collect()
    }
    assert dict(mh) == want_h
    assert dict(mc) == want_c
    # LQ merges by (SUM cnt, MIN vmin, MAX vmax) on (grp, bucket)
    ml: dict = defaultdict(lambda: [0, None, None])
    for r in got_lq:
        m = ml[(r.grp, r.bucket)]
        m[0] += r.cnt
        m[1] = r.vmin if m[1] is None else min(m[1], r.vmin)
        m[2] = r.vmax if m[2] is None else max(m[2], r.vmax)
    want_l = {
        (r.grp, r.bucket): (r.cnt, r.vmin, r.vmax)
        for r in lq_registers(batch, "n").collect()
    }
    assert {k: tuple(v) for k, v in ml.items()} == want_l
    # Bloom merges by register-wise BIT_OR (set union is bit union)
    mb: dict = defaultdict(int)
    for r in got_bloom:
        mb[(r.grp, r.word_idx)] |= r.bits
    want_b = {
        (r.grp, r.word_idx): r.bits
        for r in bloom_registers(batch, F.col("v"), m_bits=512, k=3).collect()
    }
    assert dict(mb) == want_b


# ---------------------------------------------------------------------------
# Bloom filter (membership)
# ---------------------------------------------------------------------------


def _mirror_bloom_regs(values, m_bits, k):
    """python mirror of bloom_registers (single group)."""
    words: dict[int, int] = {}
    for v in values:
        for j in range(k):
            pos = _h32(f"{j}:{v}") % m_bits
            words[pos >> 5] = words.get(pos >> 5, 0) | (1 << (pos & 31))
    return words


def _mirror_bloom_hit(words, q, m_bits, k):
    for j in range(k):
        pos = _h32(f"{j}:{q}") % m_bits
        if not (words.get(pos >> 5, 0) >> (pos & 31)) & 1:
            return 0
    return 1


def test_bloom_registers_and_probe_match_mirror(spark):
    from audiopro_essentia_spark.operators.sketch import (
        bloom_probe,
        bloom_registers,
    )

    build = [f"key{i}" for i in range(500)]
    df = spark.createDataFrame(
        [(v, "g") for v in build * 2],  # duplicates are idempotent (OR)
        "v string, source string",
    )
    m_bits, k = 8192, 3
    regs = bloom_registers(df, F.col("v"), m_bits=m_bits, k=k)
    got = {r.word_idx: r.bits for r in regs.collect()}
    want = _mirror_bloom_regs(build, m_bits, k)
    assert got == want
    # with 1500 uniform bit draws over 8192 positions, bit 31 of some
    # word is set with overwhelming probability — the sign-safe masking
    # claim is exercised, not just asserted
    assert any(b >> 31 for b in got.values())
    assert all(0 < b < (1 << 32) for b in got.values())
    probes = build[:100] + [f"absent{i}" for i in range(2000)]
    qdf = spark.createDataFrame([(q,) for q in probes], "word string")
    hits = {
        r.word: r.bloom_hit
        for r in bloom_probe(regs, qdf, m_bits=m_bits, k=k).collect()
    }
    assert hits == {
        q: _mirror_bloom_hit(want, q, m_bits, k) for q in probes
    }
    # no false negatives, and the false-positive rate is in the
    # theoretical band: fill = 1-exp(-kn/m) = 0.168 -> fpp ~ 0.47%
    assert all(hits[q] == 1 for q in build[:100])
    n_fp = sum(hits[q] for q in probes[100:])
    assert n_fp / 2000 < 0.03


def test_bloom_registers_merge_by_bit_or(spark):
    from audiopro_essentia_spark.operators.sketch import bloom_registers

    a = [f"x{i}" for i in range(400)]
    b = [f"x{i}" for i in range(250, 700)]  # overlapping shard
    mk = lambda vs: spark.createDataFrame(  # noqa: E731
        [(v, "g") for v in vs], "v string, source string"
    )
    merged = (
        bloom_registers(mk(a), F.col("v"), m_bits=4096, k=2)
        .unionByName(bloom_registers(mk(b), F.col("v"), m_bits=4096, k=2))
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_registers(mk(a + b), F.col("v"), m_bits=4096, k=2)
    got = {r.word_idx: r.bits for r in merged.collect()}
    want = {r.word_idx: r.bits for r in whole.collect()}
    assert got == want  # register-wise OR IS the union filter


def test_bloom_stats_match_mirror(spark):
    from audiopro_essentia_spark.operators.sketch import (
        bloom_registers,
        bloom_stats,
    )

    build = [f"v{i}" for i in range(300)]
    df = spark.createDataFrame(
        [(v, "g") for v in build], "v string, source string"
    )
    m_bits, k = 4096, 3
    st = bloom_stats(
        bloom_registers(df, F.col("v"), m_bits=m_bits, k=k), m_bits, k
    ).collect()[0]
    words = _mirror_bloom_regs(build, m_bits, k)
    n_set = sum(bin(b).count("1") for b in words.values())
    fill = n_set / float(m_bits)
    assert st.n_bits_set == n_set
    assert st.fill_ratio == round(fill, 6)
    assert st.fpp_est == round(fill * fill * fill, 6)


def test_bloom_param_guards_and_null(spark):
    from audiopro_essentia_spark.operators.sketch import (
        bloom_probe,
        bloom_registers,
        bloom_stats,
    )

    df = spark.createDataFrame(
        [("a", "g"), (None, "g")], "v string, source string"
    )
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_registers(df, F.col("v"), m_bits=100, k=2)
    with pytest.raises(ValueError, match="k >= 1"):
        bloom_registers(df, F.col("v"), m_bits=64, k=0)
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_stats(df, m_bits=0, k=1)
    regs = bloom_registers(df, F.col("v"), m_bits=64, k=2)
    # NULL build values are ignored: exactly the 'a' bits are set
    assert sum(bin(r.bits).count("1") for r in regs.collect()) == 2
    with pytest.raises(ValueError, match="k >= 1"):
        bloom_probe(regs, df.select(F.col("v").alias("word")), m_bits=48, k=1)
    # NULL probe values are dropped, not emitted as phantom rows
    hits = bloom_probe(
        regs, df.select(F.col("v").alias("word")), m_bits=64, k=2
    ).collect()
    assert [(r.word, r.bloom_hit) for r in hits] == [("a", 1)]


# ---------------------------------------------------------------------------
# log-histogram quantile sketch (LQ)
# ---------------------------------------------------------------------------


def _lq_mirror_registers(rows):
    """python mirror of lq_registers over (grp, v) rows."""
    from collections import defaultdict

    reg = defaultdict(lambda: [0, None, None])
    for g, v in rows:
        b = v.bit_length() - 1 if (v is not None and v >= 1) else -1
        r = reg[(g, b)]
        r[0] += 1
        if v is not None:
            r[1] = v if r[1] is None else min(r[1], v)
            r[2] = v if r[2] is None else max(r[2], v)
    return {k: tuple(v) for k, v in reg.items()}


LQ_ROWS = [
    ("a", 1), ("a", 2), ("a", 3), ("a", 7), ("a", 8), ("a", 1000),
    ("b", 5), ("b", 5), ("b", 5),
    ("c", 0), ("c", -3), ("c", None),   # all excluded -> n_good 0
    ("a", None), ("a", 0),
]


def test_lq_registers_match_mirror(spark):
    from audiopro_essentia_spark.operators.sketch import lq_registers

    df = spark.createDataFrame(LQ_ROWS, "source string, v long")
    got = {
        (r.grp, r.bucket): (r.cnt, r.vmin, r.vmax)
        for r in lq_registers(df, "v").collect()
    }
    assert got == _lq_mirror_registers(LQ_ROWS)
    # exact log2 boundaries: 7 -> bucket 2, 8 -> bucket 3
    assert ("a", 2) in got and ("a", 3) in got


def test_lq_shard_merge_equals_whole(spark):
    """The streaming/shard accumulation contract: per-shard register
    tables merged by (SUM cnt, MIN vmin, MAX vmax) equal the whole-input
    sketch — same contract HLL (max) and CMS (sum) pin."""
    from collections import defaultdict

    from audiopro_essentia_spark.operators.sketch import lq_registers

    df = spark.createDataFrame(
        [(f"s{i % 3}", (i * 37) % 2000 + 1) for i in range(500)],
        "source string, v long",
    )
    whole = {
        (r.grp, r.bucket): (r.cnt, r.vmin, r.vmax)
        for r in lq_registers(df, "v").collect()
    }
    merged = defaultdict(lambda: [0, None, None])
    for k in range(4):
        shard = lq_registers(df.filter(F.col("v") % 4 == k), "v")
        for r in shard.collect():
            m = merged[(r.grp, r.bucket)]
            m[0] += r.cnt
            m[1] = r.vmin if m[1] is None else min(m[1], r.vmin)
            m[2] = r.vmax if m[2] is None else max(m[2], r.vmax)
    assert {k: tuple(v) for k, v in merged.items()} == whole


def test_lq_quantiles_exact_cases(spark):
    from audiopro_essentia_spark.operators.sketch import (
        lq_quantiles,
        lq_registers,
    )

    df = spark.createDataFrame(LQ_ROWS, "source string, v long")
    out = {
        (r.grp, r.q): (r.rank, r.n_good, r.n_bad, r.est)
        for r in lq_quantiles(lq_registers(df, "v")).collect()
    }
    # constant group: every quantile is exactly 5 (vmin == vmax bucket)
    assert out[("b", 0.5)] == (2, 3, 0, 5.0)
    assert out[("b", 0.99)] == (3, 3, 0, 5.0)
    # all-bad group: rank clamps to 1, no owning bucket -> est NULL
    assert out[("c", 0.5)] == (1, 0, 3, None)
    # group a: n_good 6, n_bad 2; p50 -> rank 3 -> bucket 1 ([2,3], second
    # of 2 values) -> est 3.0 exactly
    assert out[("a", 0.5)] == (3, 6, 2, 3.0)
    # p99 -> rank 6 -> singleton bucket 9 -> exact 1000
    assert out[("a", 0.99)] == (6, 6, 2, 1000.0)


def test_lq_twin_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from audiopro_essentia_spark import duck_twins as DT
    from audiopro_essentia_spark.functions.text import nonempty_words
    from audiopro_essentia_spark.operators.sketch import (
        lq_quantiles,
        lq_registers,
    )

    docs = [
        (0, "src1", "a b c d e"),
        (1, "src1", "a b"),
        (2, "src1", " ".join(f"w{i}" for i in range(37))),
        (3, "src2", "x"),
        (4, "src2", ""),
        (5, "src2", None),
        (6, None, "y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    v = F.size(nonempty_words(F.col("text"), null_as_empty=True))
    got = sorted(
        map(
            tuple,
            lq_quantiles(
                lq_registers(df.withColumn("v", v), "v")
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "source", "text"]),
    )
    want = sorted(map(tuple, con.sql(DT.lq_quantiles_sql()).fetchall()))
    assert got == want


def test_lq_quantiles_q_bounds(spark):
    from audiopro_essentia_spark.operators.sketch import (
        lq_quantiles,
        lq_registers,
    )

    df = spark.createDataFrame([("a", 5)], "source string, v long")
    reg = lq_registers(df, "v")
    for bad in ((), (0.0,), (1.5,), (-0.1,)):
        with pytest.raises(ValueError):
            lq_quantiles(reg, qs=bad)
