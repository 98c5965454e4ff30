"""End-to-end resume drill at PRODUCTION geometry (VERDICT r3 item #7).

S7 resume was previously pinned only at miniature scale (test_writer_skew /
the verify drive recipe); this drill runs the FULL flagship path —
analyze_sequences at its default production geometry (F=2048, H=512, the
same constants the sf0.1 bench uses) over a bench-profile corpus — through
CheckpointedWriter, then simulates a worker/driver death that landed
between bucket commits and asserts the reference's resume contract
(reference extractor.py:184-207 error budget, controller.py resume):

- only the uncommitted buckets are rewritten; committed buckets' data
  files are untouched on disk (path+size+mtime identity),
- the resumed dataset is exactly-once on (doc_id, frame_idx) and
  value-identical to the pre-crash baseline,
- per-bucket lineage is complete again (8/8 markers, row counts summing
  to the total, snapshot ids, error category maps), and _SUCCESS returns,
- a further resume is a no-op.

The simulated crash covers the three distinct half-states a real kill
leaves behind: data written but marker missing (died before the atomic
marker rename), data dir half-written (task flush died mid-file), and
data dir absent (died before any flush).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.parquet as pq

from audiopro_essentia_spark.fixtures import make_sequences
from audiopro_essentia_spark.plans.pipeline import analyze_sequences
from audiopro_essentia_spark.sources.sinks import CheckpointedWriter

N_BUCKETS = 8


def _data_snapshot(out_dir: str, buckets) -> dict:
    snap = {}
    for b in buckets:
        d = os.path.join(out_dir, "data", f"bucket={b}")
        snap[b] = sorted(
            (p, os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(d, "*.parquet"))
        )
    return snap


def _collect_baseline(df):
    from pyspark.sql import functions as F

    rows = (
        df.select(
            "doc_id",
            "frame_idx",
            F.round("rms", 9).alias("r"),
            F.round("spectral_centroid", 9).alias("c"),
        )
        .collect()
    )
    return sorted((r.doc_id, r.frame_idx, r.r, r.c) for r in rows)


def test_resume_drill_production_geometry(spark, tmp_path):
    seq = str(tmp_path / "seqs.parquet")
    pq.write_table(
        make_sequences(n_docs=128, profile="bench", avg_n_tok=32768),
        seq,
        row_group_size=32,
    )
    out = str(tmp_path / "out")

    # ---- full run at production geometry (defaults F=2048, H=512) ----
    res = analyze_sequences(spark, seq, out_dir=out, n_buckets=N_BUCKETS)
    st = res["write_stats"]
    assert st["committed"] == list(range(N_BUCKETS))
    assert st["completion_ratio"] == 1.0
    total = st["total_rows"]
    assert total > 1000  # real production-geometry volume, not a toy

    w = CheckpointedWriter(out, n_buckets=N_BUCKETS)
    full = w.read(spark)
    assert full.count() == total
    assert (
        full.select("doc_id", "frame_idx").distinct().count() == total
    ), "baseline not exactly-once"
    baseline = _collect_baseline(full)
    survivors = range(0, N_BUCKETS - 3)
    pre = _data_snapshot(out, survivors)

    # ---- simulate a death between bucket commits ----
    # bucket 5: data fully written, marker missing (died pre-rename)
    os.remove(os.path.join(out, "_lineage", "commit_5.json"))
    # bucket 6: marker missing AND data dir half-written
    os.remove(os.path.join(out, "_lineage", "commit_6.json"))
    b6 = glob.glob(os.path.join(out, "data", "bucket=6", "*.parquet"))
    assert b6, "drill needs bucket 6 populated"
    os.remove(b6[0])
    # bucket 7: marker missing AND no data at all
    os.remove(os.path.join(out, "_lineage", "commit_7.json"))
    shutil.rmtree(os.path.join(out, "data", "bucket=7"))
    # a crashed run would never have reached the _SUCCESS stamp
    os.remove(os.path.join(out, "_SUCCESS.json"))

    # ---- resume ----
    res2 = analyze_sequences(spark, seq, out_dir=out, n_buckets=N_BUCKETS)
    st2 = res2["write_stats"]
    assert st2["committed"] == [5, 6, 7]
    assert st2["skipped"] == [0, 1, 2, 3, 4]

    # committed buckets untouched on disk
    assert _data_snapshot(out, survivors) == pre

    # exactly-once + value-identical to the pre-crash baseline
    full2 = w.read(spark)
    assert full2.count() == total
    assert full2.select("doc_id", "frame_idx").distinct().count() == total
    assert _collect_baseline(full2) == baseline

    # lineage completeness: every bucket has a marker whose row counts
    # sum to the total, with snapshot id and error-category map present
    rows_by_bucket = {}
    for b in range(N_BUCKETS):
        with open(os.path.join(out, "_lineage", f"commit_{b}.json")) as fh:
            lin = json.load(fh)
        assert lin["bucket"] == b and lin["snapshot_id"]
        assert isinstance(lin["error_categories"], dict)
        assert lin["error_count"] == sum(lin["error_categories"].values())
        rows_by_bucket[b] = lin["row_count"]
    assert sum(rows_by_bucket.values()) == total
    assert os.path.exists(os.path.join(out, "_SUCCESS.json"))

    # ---- and a further resume is a no-op ----
    res3 = analyze_sequences(spark, seq, out_dir=out, n_buckets=N_BUCKETS)
    assert res3["write_stats"]["committed"] == []
    assert res3["write_stats"]["skipped"] == list(range(N_BUCKETS))
