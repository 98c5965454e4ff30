"""Deterministic local scale-up of a driver testdata tier — MEASUREMENT
INFRASTRUCTURE ONLY (guide §1: measure at the scale the driver measures).

The round-5 driver escalated its bench to sf1.0 (6M-row lineitem, 50k
docs, 20k embeddings) and left that tier on disk during the previous
session; it has since been cleaned up. This tool rebuilds an
sf1.0-SHAPED tier by replicating the committed sf0.1 tier K times with
deterministic perturbations, preserving the properties that matter for
performance work:

- ONE row group per table (the driver's layout — the single-partition
  scan pathology the r6 spreads address must stay reproducible);
- identical schemas and distributions (text lengths, sources, langs,
  TPC-H FK structure, event/user densities);
- replicas CANNOT near-dup across each other: every word of a replica
  doc gets a replica suffix (so shingles/simhash/minhash never collide
  across replicas) and replica embeddings are fresh unit-norm gaussian
  draws (cross cosines ~ N(0, 1/sqrt(64)) — far below every threshold),
  so pair workloads scale like a real 10x corpus instead of
  quadratically exploding;
- keys offset per replica so FK joins and twin-offset entries
  (+1e6/+2e6 doc_id twins) stay collision-free.

This data is NOT used by bench.py (the driver supplies its own
$SPARK_GRAFT_SF_DIR), nor by any test or oracle — it exists so
bench_extra.py can time queries at the driver's escalated scale.

Usage: python tools_make_sf.py [--src /root/testdata/sf0.1]
                               [--out /root/testdata_local/sf1.0] [--k 10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _one_group_write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=max(table.num_rows, 1))


def _replicate_keyed(src: pa.Table, key_offsets: dict[str, int], k: int) -> pa.Table:
    parts = [src]
    for r in range(1, k):
        cols = []
        for name in src.column_names:
            col = src[name]
            if name in key_offsets:
                col = pc.add(col, pa.scalar(key_offsets[name] * r, type=pa.int64()))
                col = col.cast(src.schema.field(name).type)
            cols.append(col)
        parts.append(pa.Table.from_arrays(cols, schema=src.schema))
    return pa.concat_tables(parts).combine_chunks()


def main() -> None:
    args = sys.argv[1:]
    src_dir = "/root/testdata/sf0.1"
    out_dir = "/root/testdata_local/sf1.0"
    k = 10
    i = 0
    while i < len(args):
        if args[i] == "--src":
            i += 1
            src_dir = args[i]
        elif args[i] == "--out":
            i += 1
            out_dir = args[i]
        elif args[i] == "--k":
            i += 1
            k = int(args[i])
        i += 1
    os.makedirs(out_dir, exist_ok=True)

    # documents: doc_id += 5000*r; every word suffixed with the replica
    # tag (word counts identical, no cross-replica shingle collisions);
    # n_chars recomputed for consistency.
    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    n_docs = docs.num_rows
    parts = [docs]
    texts0 = docs["text"].to_pylist()
    for r in range(1, k):
        tag = str(r)
        texts = [
            None
            if t is None
            else " ".join(w + tag for w in t.split(" "))
            for t in texts0
        ]
        t_arr = pa.array(texts, type=pa.string())
        parts.append(
            pa.Table.from_arrays(
                [
                    pc.add(docs["doc_id"], pa.scalar(n_docs * r)).cast(
                        docs.schema.field("doc_id").type
                    ),
                    t_arr,
                    docs["lang"],
                    docs["source"],
                    pc.utf8_length(t_arr).cast(
                        docs.schema.field("n_chars").type
                    ),
                ],
                schema=docs.schema,
            )
        )
    _one_group_write(
        os.path.join(out_dir, "documents.parquet"),
        pa.concat_tables(parts).combine_chunks(),
    )

    # embeddings: fresh unit-norm gaussian draws per replica (labels
    # copied), vec_id += n*r.
    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    n_emb = emb.num_rows
    dim = len(emb["embedding"][0])
    parts = [emb]
    for r in range(1, k):
        rng = np.random.RandomState(77_000 + r)
        v = rng.normal(size=(n_emb, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        parts.append(
            pa.Table.from_arrays(
                [
                    pc.add(emb["vec_id"], pa.scalar(n_emb * r)).cast(
                        emb.schema.field("vec_id").type
                    ),
                    pa.array(
                        [row.tolist() for row in v],
                        type=emb.schema.field("embedding").type,
                    ),
                    emb["label"],
                ],
                schema=emb.schema,
            )
        )
    _one_group_write(
        os.path.join(out_dir, "embeddings.parquet"),
        pa.concat_tables(parts).combine_chunks(),
    )

    # events: ids and users offset (10x users at the same per-user
    # density); ts/value/type/props copied.
    ev = pq.read_table(os.path.join(src_dir, "events.parquet"))
    max_user = pc.max(ev["user_id"]).as_py() + 1
    _one_group_write(
        os.path.join(out_dir, "events.parquet"),
        _replicate_keyed(
            ev, {"event_id": ev.num_rows, "user_id": max_user}, k
        ),
    )

    # TPC-H: key offsets preserve FK structure across replicas.
    li = pq.read_table(os.path.join(src_dir, "lineitem.parquet"))
    orders = pq.read_table(os.path.join(src_dir, "orders.parquet"))
    cust = pq.read_table(os.path.join(src_dir, "customer.parquet"))
    part = pq.read_table(os.path.join(src_dir, "part.parquet"))
    supp = pq.read_table(os.path.join(src_dir, "supplier.parquet"))
    max_order = pc.max(orders["o_orderkey"]).as_py() + 1
    max_cust = pc.max(cust["c_custkey"]).as_py() + 1
    max_part = pc.max(part["p_partkey"]).as_py() + 1
    max_supp = pc.max(supp["s_suppkey"]).as_py() + 1
    _one_group_write(
        os.path.join(out_dir, "lineitem.parquet"),
        _replicate_keyed(
            li,
            {
                "l_orderkey": max_order,
                "l_partkey": max_part,
                "l_suppkey": max_supp,
            },
            k,
        ),
    )
    _one_group_write(
        os.path.join(out_dir, "orders.parquet"),
        _replicate_keyed(
            orders, {"o_orderkey": max_order, "o_custkey": max_cust}, k
        ),
    )
    _one_group_write(
        os.path.join(out_dir, "customer.parquet"),
        _replicate_keyed(cust, {"c_custkey": max_cust}, k),
    )
    _one_group_write(
        os.path.join(out_dir, "part.parquet"),
        _replicate_keyed(part, {"p_partkey": max_part}, k),
    )
    _one_group_write(
        os.path.join(out_dir, "supplier.parquet"),
        _replicate_keyed(supp, {"s_suppkey": max_supp}, k),
    )
    # nation/region: fixed dimension tables, copied verbatim.
    for name in ("nation", "region"):
        _one_group_write(
            os.path.join(out_dir, f"{name}.parquet"),
            pq.read_table(os.path.join(src_dir, f"{name}.parquet")),
        )
    with open(os.path.join(out_dir, "_DONE"), "w") as fh:
        fh.write("local scale-up of sf0.1 x%d (tools_make_sf.py)\n" % k)
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
