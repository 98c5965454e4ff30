"""cdc_chunks — content-defined chunking: exact hashlib mirror of the
boundary rule and chunk fingerprints, the shift-robustness property the
operator exists for (an insertion re-fingerprints ONE chunk and leaves
the rest untouched), edge contracts, plan pin (zero shuffle, zero
Python), and direct DuckDB-twin equality."""

import hashlib

import duckdb
import pandas as pd
import pytest

from audiopro_essentia_spark.duck_twins import cdc_chunks_sql
from audiopro_essentia_spark.operators.dedup import cdc_chunks


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _mirror(text, divisor, w):
    ws = [x for x in (text or "").split(" ") if x != ""]
    n = len(ws)
    if n == 0:
        return []
    bs = [
        i
        for i in range(w, n)  # 1-based candidates w .. n-1
        if _h32(" ".join(ws[i - w:i])) % divisor == 0
    ]
    starts = [1] + [b + 1 for b in bs]
    out = []
    for j, s in enumerate(starts):
        e = starts[j + 1] - 1 if j + 1 < len(starts) else n
        chunk = " ".join(ws[s - 1:e])
        out.append(
            (j + 1, s, e - s + 1, hashlib.md5(chunk.encode()).hexdigest())
        )
    return out


# a deterministic wordy corpus with repeats so boundaries actually fire
WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
DOCS = [
    (i, " ".join(WORDS[(i * 7 + k * 3) % 8] + str(k % 11) for k in range(60)))
    for i in range(12)
] + [(100, None), (101, ""), (102, "   "), (103, "one"), (104, "a b")]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_hashlib_mirror(spark):
    got = {}
    for r in cdc_chunks(_df(spark), divisor=4, window_words=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_pos, r.n_words, r.chunk_md5)
        )
    exp = {
        i: _mirror(t, 4, 3) for i, t in DOCS if _mirror(t, 4, 3)
    }
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in exp.items()
    }
    # zero-word docs emit nothing; one-word docs emit one whole chunk
    assert 100 not in got and 101 not in got and 102 not in got
    assert got[103] == [(1, 1, 1, hashlib.md5(b"one").hexdigest())]


def test_chunks_tile_the_doc(spark):
    """Chunks partition the word sequence exactly: contiguous, 1-based,
    covering [1, n] with no gaps or overlaps."""
    rows = [r for r in cdc_chunks(_df(spark), divisor=4, window_words=3)
            .orderBy("doc_id", "chunk_idx").collect()]
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, ch in by_doc.items():
        assert ch[0].start_pos == 1
        for a, b in zip(ch, ch[1:]):
            assert b.start_pos == a.start_pos + a.n_words
        n_words = len([w for w in (dict(DOCS)[doc] or "").split(" ") if w])
        assert ch[-1].start_pos + ch[-1].n_words - 1 == n_words


def test_shift_robustness_insertion(spark):
    """THE property CDC exists for: inserting one word changes only the
    chunk containing the insertion point (plus, at worst, its
    immediate neighbor while the boundary window re-aligns) — every
    downstream chunk fingerprint is bit-identical, where a whole-doc
    digest loses everything."""
    base = " ".join(
        WORDS[(k * 5) % 8] + str(k % 13) for k in range(200)
    )
    words = base.split(" ")
    pert = " ".join(words[:90] + ["INSERTED"] + words[90:])
    a = _mirror(base, 4, 3)
    b = _mirror(pert, 4, 3)
    fa = [c[3] for c in a]
    fb = [c[3] for c in b]
    # sequence alignment, not set intersection (a periodic doc repeats
    # fingerprints): the two chunk SEQUENCES must share a common prefix
    # and suffix covering all but the chunk the insertion landed in
    # (plus at worst its neighbor while the boundary window re-aligns)
    p = 0
    while p < min(len(fa), len(fb)) and fa[p] == fb[p]:
        p += 1
    s = 0
    while (
        s < min(len(fa), len(fb)) - p and fa[-1 - s] == fb[-1 - s]
    ):
        s += 1
    assert len(fa) - p - s <= 2, (p, s, len(fa), len(fb))
    # and the Spark operator agrees with the mirror on both docs
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_md5
        for r in cdc_chunks(
            _df(spark, [(1, base), (2, pert)]), divisor=4, window_words=3
        ).collect()
    }
    assert [got[(1, i + 1)] for i in range(len(a))] == fa
    assert [got[(2, i + 1)] for i in range(len(b))] == fb


def test_guards(spark):
    with pytest.raises(ValueError, match="divisor"):
        cdc_chunks(_df(spark), divisor=1)
    with pytest.raises(ValueError, match="window_words"):
        cdc_chunks(_df(spark), window_words=0)


def test_plan_zero_shuffle_zero_python(spark):
    plan = (
        cdc_chunks(_df(spark), divisor=4, window_words=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_twin_matches_duckdb(spark):
    sp = (
        cdc_chunks(_df(spark), divisor=4, window_words=3)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    dd = con.execute(
        cdc_chunks_sql(divisor=4, window_words=3)
        + " ORDER BY doc_id, chunk_idx"
    ).fetchdf()
    dd = dd.astype(sp.dtypes.to_dict())
    assert sp.reset_index(drop=True).equals(dd.reset_index(drop=True))


def test_streaming_cdc_seen_chunks_across_epochs(spark, tmp_path):
    """Incremental dedup-on-ingest with the CDC fingerprint set as
    EPOCH STATE, through a REAL foreachBatch stream: each micro-batch
    chunks its docs, counts per doc how many chunks the persisted set
    has already seen, then appends its own fingerprints forward. Pins
    (a) the streamed epoch-1 seen-counts equal the batch join over the
    same split, (b) a SHIFTED near-copy (one word inserted mid-doc)
    arriving in epoch 1 reads mostly-seen — the CDC property exercised
    through ingest, where a whole-doc digest would read 0 — while a
    fresh doc reads zero-seen, and (c) the carried set after both
    epochs equals the one-shot distinct chunk set over everything."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    base = " ".join(WORDS[(k * 5) % 8] + str(k % 13) for k in range(120))
    words = base.split(" ")
    shifted = " ".join(words[:60] + ["INSERTED"] + words[60:])
    fresh = " ".join(WORDS[(k * 3 + 1) % 8] + "x" + str(k % 7)
                     for k in range(120))
    epoch0 = [(i, " ".join(WORDS[(i + k) % 8] + str(k) for k in range(50)))
              for i in range(10)] + [(99, base)]
    epoch1 = [(200, shifted), (201, fresh)]

    src = tmp_path / "docs"
    src.mkdir()
    for i, (name, rows) in enumerate((("e0", epoch0), ("e1", epoch1))):
        p = src / f"{name}.parquet"
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows],
                      "text": [r[1] for r in rows]}),
            str(p),
        )
        # pin strictly increasing mtimes (FileStreamSource epoch order)
        os.utime(p, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))

    seen_dir = str(tmp_path / "chunk_state")
    stats: dict[int, dict] = {}

    def handler(bdf, eid):
        ch = cdc_chunks(bdf, divisor=4, window_words=3)
        if os.path.isdir(seen_dir):
            seen = spark.read.parquet(seen_dir)
            seen_flag = ch.join(
                seen.withColumn("_seen", F.lit(1)), "chunk_md5", "left"
            )
        else:
            seen_flag = ch.withColumn("_seen", F.lit(None).cast("int"))
        rows = (
            seen_flag.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("_seen", F.lit(0))).alias("n_seen"),
            )
            .collect()
        )
        stats[int(eid)] = {r.doc_id: (r.n, r.n_seen) for r in rows}
        mine = ch.select("chunk_md5").distinct()
        merged = (
            spark.read.parquet(seen_dir).unionByName(mine).distinct()
            if os.path.isdir(seen_dir)
            else mine
        )
        merged.localCheckpoint().write.mode("overwrite").parquet(
            seen_dir + "_next"
        )
        spark.read.parquet(seen_dir + "_next").write.mode(
            "overwrite"
        ).parquet(seen_dir)

    ev = spark.read.parquet(str(src))
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert len(stats) == 2

    # (a) streamed epoch-1 counts == the batch join over the same split
    e0 = spark.createDataFrame(epoch0, "doc_id long, text string")
    e1 = spark.createDataFrame(epoch1, "doc_id long, text string")
    seen0 = cdc_chunks(e0, divisor=4, window_words=3).select(
        "chunk_md5"
    ).distinct()
    batch = {
        r.doc_id: (r.n, r.n_seen)
        for r in cdc_chunks(e1, divisor=4, window_words=3)
        .join(seen0.withColumn("_seen", F.lit(1)), "chunk_md5", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("_seen", F.lit(0))).alias("n_seen"),
        )
        .collect()
    }
    assert stats[1] == batch

    # (b) the shifted near-copy is mostly seen; the fresh doc is not
    n200, s200 = stats[1][200]
    assert s200 >= n200 - 2, stats[1]
    assert stats[1][201][1] == 0
    # epoch 0 ran against empty state
    assert all(s == 0 for _, s in stats[0].values())

    # (c) carried set == one-shot distinct chunk set over everything
    carried = {
        r.chunk_md5 for r in spark.read.parquet(seen_dir).collect()
    }
    want = {
        r.chunk_md5
        for r in cdc_chunks(
            e0.unionByName(e1), divisor=4, window_words=3
        ).collect()
    }
    assert carried == want
