"""CLI entry point — `python -m audiopro_essentia_spark`.

Mirrors the reference's entry point 1 + argument contract
(/root/reference/src/audiopro/main.py:28-40,
/root/reference/src/audiopro/arg_parser.py:15-114: positional input/output,
feature selection, time range, output format), re-expressed for the Spark
engine: input is a sequences parquet table, output a resumable
CheckpointedWriter directory. Exit code 0 on success, 2 on argument /
validation errors (argparse convention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .constants import ALL_FRAME_FEATURES, DEFAULT_ERROR_BUDGET_PCT, FRAME_LENGTH, HOP_LENGTH


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m audiopro_essentia_spark",
        description="Windowed feature engineering over a tokenized-sequence "
        "table (framing -> Arrow kernel -> doc aggregates -> resumable "
        "checkpointed output).",
    )
    p.add_argument("input", help="sequences parquet path (doc_id, tokens, ...)")
    p.add_argument(
        "output",
        help="output DIRECTORY (no extension — the writer owns the format)",
    )
    p.add_argument(
        "--features",
        default=None,
        help="comma-separated subset of: " + ",".join(ALL_FRAME_FEATURES)
        + " (default: all) — unselected features are never computed "
        "(feature-selection pushdown, reference arg_parser.py:60-88)",
    )
    p.add_argument("--start", type=float, default=None, help="start second")
    p.add_argument("--end", type=float, default=None, help="end second")
    p.add_argument(
        "--format", choices=("parquet", "json", "msgpack"), default="parquet",
        help="output format (reference output_handler dispatch): parquet/"
        "json write the frame table in that format; msgpack writes frames "
        "as parquet plus doc metadata as gzipped MessagePack blobs "
        "(self-implemented codec, functions/msgpack.py)",
    )
    p.add_argument("--frame-length", type=int, default=FRAME_LENGTH)
    p.add_argument("--hop", type=int, default=HOP_LENGTH)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument(
        "--error-budget-pct", type=float, default=DEFAULT_ERROR_BUDGET_PCT
    )
    p.add_argument(
        "--skip-monitoring", action="store_true",
        help="disable the performance monitor (reference arg_parser.py "
        "--skip-monitoring; A17)",
    )
    p.add_argument(
        "--codec", choices=("snappy", "zstd", "gzip"), default="snappy",
        help="parquet compression codec (the reference's --gzip analog)",
    )
    p.add_argument("--master", default=None, help="spark master override")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    features: tuple[str, ...] | None = None
    if args.features:
        features = tuple(f.strip() for f in args.features.split(",") if f.strip())
        unknown = set(features) - set(ALL_FRAME_FEATURES)
        if unknown:
            print(
                f"error: unknown features {sorted(unknown)}; "
                f"valid: {','.join(ALL_FRAME_FEATURES)}",
                file=sys.stderr,
            )
            return 2
    if args.start is not None and args.end is not None and args.end <= args.start:
        print("error: --end must be > --start", file=sys.stderr)
        return 2
    for name, v, lo in (
        ("--frame-length", args.frame_length, 1),
        ("--hop", args.hop, 1),
        ("--n-buckets", args.n_buckets, 1),
    ):
        if v < lo:
            print(f"error: {name} must be >= {lo} (got {v})", file=sys.stderr)
            return 2
    if not 0.0 <= args.error_budget_pct <= 1.0:
        print(
            f"error: --error-budget-pct must be in [0,1] "
            f"(got {args.error_budget_pct})",
            file=sys.stderr,
        )
        return 2

    from .plans.pipeline import analyze_sequences
    from .process import graceful_shutdown
    from .session import get_spark
    from .sources.sinks import CheckpointedWriter, validate_output_path

    try:
        out_dir = validate_output_path(args.output, args.format)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="audiopro-cli",
        master=args.master,
        extra_conf={"spark.sql.parquet.compression.codec": args.codec},
    )
    mon = None
    if not args.skip_monitoring:
        from .monitor import PerformanceMonitor

        mon = PerformanceMonitor().start()
    # one call drives the whole pipeline INCLUDING the writer (fmt is
    # plumbed through), so the CLI inherits concrete per-file lineage and
    # the completion check instead of re-implementing the write block
    frame_fmt = "parquet" if args.format == "msgpack" else args.format
    # SIGTERM/SIGINT stop the run at the writer's next atomic-commit
    # boundary (reference utils/process.py graceful_shutdown): committed
    # buckets stay durable, re-running the same CLI line resumes the rest
    with graceful_shutdown() as stop_event:
        res = analyze_sequences(
            spark,
            args.input,
            features=features,
            frame_length=args.frame_length,
            hop=args.hop,
            start_sec=args.start,
            end_sec=args.end,
            out_dir=out_dir,
            n_buckets=args.n_buckets,
            fmt=frame_fmt,
            error_budget_pct=args.error_budget_pct,
            stop_event=stop_event,
        )
    stats = res["write_stats"]
    writer = CheckpointedWriter.from_meta(out_dir)
    if args.format == "msgpack":
        from audiopro_essentia_spark.sources.sinks import write_msgpack_dir

        write_msgpack_dir(
            res["doc_metadata"], os.path.join(out_dir, "doc_meta_msgpack")
        )
    summary = {
        "output": out_dir,
        "format": args.format,
        "stopped": stats.get("stopped", False),
        "committed": stats["committed"],
        "skipped": stats["skipped"],
        "total_rows": stats["total_rows"],
        "total_errors": stats["total_errors"],
        "error_stats": writer.error_stats(),
        # counted inside the pipeline's completion aggregate — a
        # .count() here would re-run the whole profile pass as a second
        # full Spark job just for one integer
        "quarantined": stats["quarantined_docs"],
        "expected_frames": stats["expected_frames"],
        "completion_ratio": stats["completion_ratio"],
        "completion_warning": stats["completion_warning"],
    }
    if mon is not None:
        mon.stop()
        summary["monitor"] = mon.summary()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
