"""Dump `.explain("formatted")` for declared queries to plans/r06/
as <query>_<suffix>.txt — the r6 optimization round's before/after plan
evidence. Plan-only (no execution beyond the driver-side collects some
entries perform at plan-construction time).

Usage: python tools_dump_r06_plans.py --suffix after [--sf DIR]
                                      [--out plans/r06] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    suffix = "after"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r06"
    )
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            i += 1
            sf_dir = args[i]
        elif args[i] == "--suffix":
            i += 1
            suffix = args[i]
        elif args[i] == "--out":
            i += 1
            out = args[i]
        else:
            names.append(args[i])
        i += 1

    from audiopro_essentia_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(
        app_name="dump_r06_plans", master="local[8]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    if not names:
        names = list(qs)
    os.makedirs(out, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure
            txt = f"PLAN DUMP FAILED: {e}\n"
        with open(os.path.join(out, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, flush=True)


if __name__ == "__main__":
    main()
