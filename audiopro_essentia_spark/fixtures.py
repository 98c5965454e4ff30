"""Deterministic synthetic `sequences` fixture table (FIXTURES.md §1).

One row per pre-tokenized training sequence — the distributed analog of the
reference's loaded signal (/root/reference/src/audiopro/audio/audio_loader.py:61-63).
Schema per BASELINE.json input_hint:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string, base_ts:timestamp

Seeded (42); no external data. Edge docs exercise the reference's framing /
validation edges (extractor.py:122-125,149; audio_loader.py:84-86,106-113;
metadata.py:76-77).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)

# n_tok values hitting framing edges: <F (0 frames), F-1, exactly F (1 frame),
# F+1 (odd-trim), mid, many frames.
EDGE_N_TOK = (100, 511, 2047, 2048, 2049, 3000, 10240, 100000)

SOURCES = ("common_crawl", "wiki", "code")
SOURCE_P = (0.80, 0.15, 0.05)  # heavy skew on common_crawl


def _doc_tokens(i: int, n_tok: int) -> np.ndarray:
    rng = np.random.default_rng(SEED + i)
    return rng.integers(-32768, 32767, size=n_tok, dtype=np.int32)


def make_sequences(
    n_docs: int = 8,
    profile: str = "tiny",
    avg_n_tok: int = 8192,
) -> pa.Table:
    """Build the sequences table as a pyarrow Table.

    profile='tiny': the 8 deterministic edge docs (unit tests) PLUS the
    4 special edge rows (all-zero, clipping, empty, hot-key long doc) —
    the edge rows exist in the TINY profile only.
    profile='small'/'bench': n_docs random docs,
    n_tok ~ U[2048, 2*avg_n_tok-2048], NO edge rows — deliberately: the
    bench corpus is the recorded-throughput input (seed 42,
    267,216,271 tokens at the headline geometry) and must stay
    byte-stable across rounds; quarantine/ferror/skew paths are
    exercised by the tiny profile and the unit suite, not at bench
    scale.

    Generated token domain is [-32768, 32766] (rng.integers' exclusive
    upper bound — kept as-is for the same byte-stability reason); the
    maximum value 32767 appears via the tiny profile's clipping edge
    doc.
    """
    rng = np.random.default_rng(SEED)
    doc_ids: list[str] = []
    tokens: list[np.ndarray] = []
    sources: list[str] = []
    base_ts: list[_dt.datetime] = []

    def add(i: int, toks: np.ndarray, source: str | None = None) -> None:
        doc_ids.append(f"doc{i:06d}")
        tokens.append(toks)
        sources.append(source or str(rng.choice(SOURCES, p=SOURCE_P)))
        base_ts.append(BASE_TS + _dt.timedelta(seconds=i))

    if profile == "tiny":
        for i, n in enumerate(EDGE_N_TOK):
            add(i, _doc_tokens(i, n))
        # deterministic edge rows
        add(100, np.zeros(4096, dtype=np.int32), "wiki")          # silence
        add(101, np.full(4096, 32767, dtype=np.int32), "wiki")    # clipping
        add(102, np.empty(0, dtype=np.int32), "code")             # empty
        add(103, _doc_tokens(103, 300000), "common_crawl")        # hot key
    else:
        lo, hi = 2048, max(2049, 2 * avg_n_tok - 2048)
        lens = rng.integers(lo, hi, size=n_docs)
        for i in range(n_docs):
            add(i, _doc_tokens(i, int(lens[i])))

    # ListArray.from_arrays: zero-copy-ish token column build (tolist() on
    # hundreds of millions of ints took minutes)
    lengths = np.array([len(t) for t in tokens], dtype=np.int64)
    offsets64 = np.concatenate([[0], np.cumsum(lengths, dtype=np.int64)])
    if offsets64[-1] > np.iinfo(np.int32).max:
        # pa.ListArray offsets are int32; silent wrap would corrupt tokens
        raise ValueError(
            f"fixture too large for int32 list offsets "
            f"({offsets64[-1]} total tokens > 2^31-1); build in chunks"
        )
    offsets = offsets64.astype(np.int32)
    values = (
        np.concatenate(tokens) if len(tokens) else np.empty(0, dtype=np.int32)
    )
    tok_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": tok_arr,
            "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
            "source": pa.array(sources, pa.string()),
            "base_ts": pa.array(base_ts, pa.timestamp("us")),
        }
    )


def write_sequences(path: str, row_group_docs: int = 32, **kwargs) -> str:
    """Small row groups keep the file SPLITTABLE: a single-row-group parquet
    scans as one Spark task no matter how many cores (the 100 TB corpus is
    many files/row groups; the fixture must behave the same)."""
    pq.write_table(make_sequences(**kwargs), path, row_group_size=row_group_docs)
    return path


def make_labels(doc_ids: list[str], per_doc: int = 5) -> pa.Table:
    """Sparse labels for as-of join fixtures (FIXTURES.md §6): irregular
    timestamps before/between/after frame times."""
    rng = np.random.default_rng(SEED + 777)
    rows_doc, rows_ts, rows_label = [], [], []
    for d_i, d in enumerate(doc_ids):
        doc_base = BASE_TS + _dt.timedelta(seconds=d_i)
        # one label before the first frame, the rest scattered over ~3 s
        offs = np.concatenate(
            [[-1.5], np.sort(rng.uniform(0.0, 3.0, size=per_doc - 1))]
        )
        for off in offs:
            rows_doc.append(d)
            rows_ts.append(doc_base + _dt.timedelta(seconds=float(off)))
            rows_label.append(float(rng.normal()))
    return pa.table(
        {
            "doc_id": pa.array(rows_doc, pa.string()),
            "label_ts": pa.array(rows_ts, pa.timestamp("us")),
            "label": pa.array(rows_label, pa.float64()),
        }
    )
