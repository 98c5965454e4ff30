"""Corrupted-input robustness sweep over the full driver query surface.

The oracle twins (tests/driver_compare.py) verify VALUES but cannot catch
crashes that hit both engines' *inputs* — a NULL text row or a ragged
embedding that kills the Spark job kills the sweep before any comparison
happens.  This tool builds a deterministic corrupted copy of an sf tier
(NULL/empty/whitespace text, NULL source, NULL/ragged/zero embedding
vectors appended to the real tables) and drives every `queries()` entry
against it through a noop write (count() would let Catalyst prune a broken
UDF subtree — the vacuous-green trap).

Contract being checked:
  - every query either SUCCEEDS on the corrupted tables, or
  - is listed in EXPECTED_LOUD and fails with its documented fail-loud
    NULL-count guard (the packing family: a NULL token count would
    otherwise silently corrupt every later offset in its bucket, so the
    operators raise by design — packing.py:47,204).
Any other crash, or an EXPECTED_LOUD query that stops raising (dead
guard), exits nonzero.

Usage: python tools_corrupt_sweep.py [src_sf_dir] [--dst DIR]
(defaults: /root/testdata/sf0.001 -> /tmp/corrupt_sf; ~6 min on local[8]).
Touches /tmp/spark_busy for the duration so the probe-gated scaling
watcher never samples bandwidth during the sweep (CLAUDE.md marker rule).
"""

import argparse
import os
import shutil
import sys
import traceback

# Fail-loud-by-design on NULL counts: the guard message must appear in the
# error chain, otherwise the guard is dead and the run fails.
EXPECTED_LOUD = {
    "pack_shards": "NULL or negative",
    "shard_manifest": "NULL or negative",  # builds on pack_shards' guard
    "pack_nosplit": "NULL count",
    # a ragged embedding would silently skew every scatter sum, so the
    # operator raises by design (similarity.py cluster_quality); the
    # staged alias is the SAME callable under the pre-rotation key
    "cluster_quality": "ragged vector dims",
    "staged:cluster_quality": "ragged vector dims",
}


def build_corrupt_dir(src, dst):
    """Copy one sf tier and append deterministic corrupt rows to the two
    content tables (documents, embeddings). Other tables are copied
    verbatim — their queries must simply survive the altered siblings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))

    # documents: NULL text, empty text, NULL source, whitespace-only text
    d = pq.read_table(os.path.join(dst, "documents.parquet"))
    cols = {c: d.column(c).to_pylist() for c in d.column_names}
    base = {c: cols[c][0] for c in cols}

    def add_doc(doc_id, text, source):
        for c in cols:
            if c == "doc_id":
                cols[c].append(doc_id)
            elif c == "text":
                cols[c].append(text)
            elif c == "source":
                cols[c].append(source)
            elif c == "n_chars":
                cols[c].append(len(text) if text else 0)
            else:
                cols[c].append(base[c])

    mx = max(cols["doc_id"])
    add_doc(mx + 1, None, "src0")
    add_doc(mx + 2, "", "src1")
    add_doc(mx + 3, "a  b   c", None)
    add_doc(mx + 4, "   ", "src2")
    pq.write_table(
        pa.table(
            {c: pa.array(v, d.schema.field(c).type) for c, v in cols.items()}
        ),
        os.path.join(dst, "documents.parquet"),
    )

    # embeddings: NULL vector, ragged (wrong-dim) vector, zero vector
    e = pq.read_table(os.path.join(dst, "embeddings.parquet"))
    ec = {c: e.column(c).to_pylist() for c in e.column_names}
    dim = len(ec["embedding"][0])
    emx = max(ec["vec_id"])
    eb = {c: ec[c][0] for c in ec}

    def add_vec(vid, vec):
        for c in ec:
            if c == "vec_id":
                ec[c].append(vid)
            elif c == "embedding":
                ec[c].append(vec)
            else:
                ec[c].append(eb[c])

    add_vec(emx + 1, None)
    add_vec(emx + 2, [1.0, 2.0])
    add_vec(emx + 3, [0.0] * dim)
    pq.write_table(
        pa.table(
            {c: pa.array(v, e.schema.field(c).type) for c, v in ec.items()}
        ),
        os.path.join(dst, "embeddings.parquet"),
    )

    # events: NULL ts, NULL user_id, NULL value, NULL event_type — the
    # temporal family (sessionize/asof/rolling/interval/time_rolling)
    # was never swept until the ANSI try_cast find showed fixture-shaped
    # inputs mask real crash paths
    ev = pq.read_table(os.path.join(dst, "events.parquet"))
    vc = {c: ev.column(c).to_pylist() for c in ev.column_names}
    vb = {c: vc[c][0] for c in vc}
    vmx = max(vc["event_id"])

    def add_event(eid, **over):
        for c in vc:
            if c == "event_id":
                vc[c].append(eid)
            elif c in over:
                vc[c].append(over[c])
            else:
                vc[c].append(vb[c])

    add_event(vmx + 1, ts=None)
    add_event(vmx + 2, user_id=None)
    add_event(vmx + 3, value=None)
    add_event(vmx + 4, event_type=None)
    pq.write_table(
        pa.table(
            {c: pa.array(v, ev.schema.field(c).type) for c, v in vc.items()}
        ),
        os.path.join(dst, "events.parquet"),
    )
    return len(cols["doc_id"]), len(ec["vec_id"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/corrupt_sf")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E
    from audiopro_essentia_spark.session import get_spark

    n_docs, n_vecs = build_corrupt_dir(args.src, args.dst)
    print(f"built {args.dst} docs={n_docs} vecs={n_vecs}", flush=True)

    busy = "/tmp/spark_busy"
    owned_marker = not os.path.exists(busy)
    if owned_marker:
        open(busy, "w").close()
    violations, ok, loud = [], [], []
    try:
        spark = get_spark(master="local[8]", app_name="corrupt-sweep")
        # staged (pre-window) driver entries sweep too — they carry the
        # same contract and enter queries() at the next rotation
        all_queries = dict(E.queries())
        all_queries.update(
            {f"staged:{k}": v
             for k, v in getattr(E, "_staged_queries", dict)().items()}
        )
        for name, qfn in all_queries.items():
            try:
                df = qfn(spark, args.dst)
                df.write.format("noop").mode("overwrite").save()
                if name in EXPECTED_LOUD:
                    violations.append(
                        (name, "guard DEAD: expected fail-loud, got success")
                    )
                else:
                    ok.append(name)
            except Exception as exc:  # noqa: BLE001 — classifying every failure
                tb = traceback.format_exc()
                want = EXPECTED_LOUD.get(name)
                if want is not None and want in tb:
                    loud.append(name)
                else:
                    first = str(exc).split("\n")[0][:200]
                    violations.append((name, f"{type(exc).__name__}: {first}"))
    finally:
        if owned_marker and os.path.exists(busy):
            os.remove(busy)

    print(f"OK: {len(ok)}  fail-loud-as-documented: {sorted(loud)}")
    for name, msg in violations:
        print(f"VIOLATION {name}: {msg}")
    if violations:
        sys.exit(1)
    print("SWEEP CLEAN")


if __name__ == "__main__":
    main()
