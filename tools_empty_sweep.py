"""Empty-input sweep: drive every `queries()` (and staged) driver entry
against schema-identical ZERO-ROW copies of the test tables.

Why a separate tier from tools_corrupt_sweep: corrupt rows ride along
with 500+ healthy fixture rows, so code paths that only break when an
entire input (or an entire intermediate, e.g. a trained vocabulary or a
register table) is EMPTY never execute — `collect()[0]` on an empty
aggregate, NULL spines from sum() over zero rows, div-by-zero corpus
totals, `max()` of nothing feeding a literal. At 100 TB an empty input
is not hypothetical: a partition-pruned read, a quarantine that rejects
a whole shard, or a first-epoch incremental run all produce zero-row
DataFrames through the same plans.

Contract: a query must either return an EMPTY (or constant-row) result
or fail LOUD with a documented, named error — never a low-level
IndexError/ArithmeticException from an undefended internal step.
EXPECTED_LOUD maps query name -> substring that must appear in the
traceback (same discipline as tools_corrupt_sweep.EXPECTED_LOUD).
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

# queries whose documented contract is to fail loud on empty input:
#   value is a substring that must appear in the traceback.
EXPECTED_LOUD: dict[str, str] = {
    # power_iteration raises by contract ("power_iteration on an empty
    # DataFrame") — the sums are NULL on zero rows and a silent zero
    # direction would be a wrong answer, not a degenerate one.
    "pca_power": "power_iteration on an empty DataFrame",
    # model-training operators cannot produce a model from nothing, and a
    # silently-empty model would make every downstream assignment wrong:
    "kmeans": "kmeans_lite needs >= 8 distinct vectors, found 0",
    "semantic_dedup": "kmeans_lite needs >= 8 distinct vectors, found 0",
    "pq_ann": "pq_codebook needs >= 16 distinct vectors, found 0",
    "ivf_ann": "ivf_assign needs >= 1 non-NULL corpus vector",
}


def build_empty_dir(src: str, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        s = os.path.join(src, fn)
        d = os.path.join(dst, fn)
        duckdb.sql(
            f"COPY (SELECT * FROM '{s}' LIMIT 0) TO '{d}' (FORMAT PARQUET)"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/empty_sf")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E
    from audiopro_essentia_spark.session import get_spark

    build_empty_dir(args.src, args.dst)
    print(f"built {args.dst} (all tables zero-row)", flush=True)

    busy = "/tmp/spark_busy"
    owned_marker = not os.path.exists(busy)
    if owned_marker:
        open(busy, "w").close()
    violations, ok, loud = [], [], []
    try:
        spark = get_spark(master="local[8]", app_name="empty-sweep")
        all_queries = dict(E.queries())
        all_queries.update(
            {f"staged:{k}": v
             for k, v in getattr(E, "_staged_queries", dict)().items()}
        )
        only = set(args.queries or [])
        for name, qfn in all_queries.items():
            if only and name not in only and name.removeprefix("staged:") not in only:
                continue
            base = name.removeprefix("staged:")
            try:
                df = qfn(spark, args.dst)
                df.write.format("noop").mode("overwrite").save()
                if base in EXPECTED_LOUD:
                    violations.append(
                        (name, "guard DEAD: expected fail-loud, got success")
                    )
                else:
                    ok.append(name)
            except Exception as exc:  # noqa: BLE001 — classifying every failure
                tb = traceback.format_exc()
                want = EXPECTED_LOUD.get(base)
                if want is not None and want in tb:
                    loud.append(name)
                else:
                    first = str(exc).split("\n")[0][:200]
                    violations.append((name, f"{type(exc).__name__}: {first}"))
            print(".", end="", flush=True)
        print()
    finally:
        if owned_marker and os.path.exists(busy):
            os.remove(busy)

    print(f"OK: {len(ok)}  fail-loud-as-documented: {sorted(loud)}")
    for name, msg in violations:
        print(f"VIOLATION {name}: {msg}")
    if violations:
        sys.exit(1)
    print("EMPTY SWEEP CLEAN")


if __name__ == "__main__":
    main()
