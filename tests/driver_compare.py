"""Local mimic of the driver's queries()-vs-oracle_sql() compare:
row count + column names + order-insensitive value comparison.

Used by tests/test_entry.py and runnable standalone:
    python tests/driver_compare.py [sf_dir] [query ...]
    python tests/driver_compare.py --staged [sf_dir] [query ...]

--staged runs the pre-window roster (__spark_entry__._staged_queries()
vs _staged_oracle_sql()) through the identical compare, so entries
queued for the next driver-window rotation are one-command verifiable.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon(v):
    """Canonical sortable cell: (is_null, type_tag, value). Mixed None /
    value (and str-"NaN" / float) cells in tie-broken rows would otherwise
    raise TypeError inside sorted()."""
    if v is None:
        return (1, "", "")
    if isinstance(v, float):
        if math.isnan(v):
            return (0, "nan", "NaN")
        return (0, "num", round(v, 9))
    if isinstance(v, bool):
        return (0, "bool", v)
    if isinstance(v, int):
        return (0, "num", v)
    if hasattr(v, "isoformat"):
        return (0, "ts", v.isoformat())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return (0, "num", round(float(v), 9))
    except ImportError:
        pass
    if isinstance(v, dict):
        # DuckDB structs fetch as dicts; Spark Rows are tuple subclasses
        # and hit the list branch — canonicalize BOTH to the sorted
        # (key, value) form so struct columns compare by content instead
        # of always mismatching (or TypeError-ing inside sorted())
        return (
            0,
            "struct",
            tuple((k, canon(x)) for k, x in sorted(v.items())),
        )
    if hasattr(v, "asDict"):  # pyspark Row (incl. nested struct values)
        return (
            0,
            "struct",
            tuple((k, canon(x)) for k, x in sorted(v.asDict().items())),
        )
    if isinstance(v, (list, tuple)):
        return (0, "list", tuple(canon(x) for x in v))
    return (0, type(v).__name__, v)


def rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(canon(r[i]) for i in idx) for r in rows
    )


_SAFE_DUCK_TYPES = {
    # types whose Arrow/pandas rendering is bit-identical to the Spark twin
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
}


def type_problems(res):
    """Catch oracle columns whose DuckDB type (HUGEINT, DECIMAL, ...) the
    driver's Arrow/pandas serialization would render differently from the
    Spark side even when fetchall() values are identical — the pack_shards
    r2 hash-fail class. fetchall() hides these (HUGEINT -> Python int)."""
    bad = []
    for col, typ in zip(res.columns, res.types):
        t = str(typ).upper()
        # DuckDB renders list types as 'DOUBLE[]', structs as
        # 'STRUCT(...)' — element values are compared recursively by
        # canon(), so these are not dtype hazards themselves (their
        # ELEMENT types would be, but fetchall already normalizes them)
        if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("LIST"):
            continue
        if t not in _SAFE_DUCK_TYPES:
            bad.append(f"{col}:{t}")  # HUGEINT, DECIMAL(...), UHUGEINT, ...
    return bad


def compare_one(spark, con, name, qfn, sql, sf_dir):
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    dcols = res.columns
    tp = type_problems(res)  # inspect types BEFORE fetch (no re-execution)
    drows = res.fetchall()
    problems = []
    if tp:
        problems.append(f"oracle-dtype (driver-hash hazard): {tp}")
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
    if not problems:
        a = rows_to_set([c.lower() for c in scols], srows)
        b = rows_to_set([c.lower() for c in dcols], drows)
        if a != b:
            sb, sa = set(b), set(a)  # hoisted: per-row set() was O(n^2)
            diff_a = [r for r in a if r not in sb][:3]
            diff_b = [r for r in b if r not in sa][:3]
            problems.append(f"values: spark-only={diff_a} duck-only={diff_b}")
    return problems, len(srows)


def main():
    from audiopro_essentia_spark.session import get_spark
    import __spark_entry__ as E

    argv = [a for a in sys.argv[1:] if a != "--staged"]
    staged = "--staged" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark(master="local[8]", app_name="driver-compare")
    con = duck_con(sf_dir)
    qs = E._staged_queries() if staged else E.queries()
    oracles = E._staged_oracle_sql() if staged else E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd query name must not produce a silent 'ALL OK []'
        print(f"UNKNOWN query names (not in queries()): {sorted(unknown)}")
        return 2
    failed = []
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                df = qfn(spark, sf_dir)
                # noop write forces EVERY column: count() would let
                # Catalyst prune a broken Python-UDF subtree and print a
                # vacuous green (the CLAUDE.md count() trap)
                df.write.format("noop").mode("overwrite").save()
                n = df.count()
                print(f"  {name:<20} rows-only: {n} rows")
            except Exception as e:
                print(f"  {name:<20} ERROR {type(e).__name__}: {str(e)[:200]}")
                failed.append(name)
            continue
        try:
            problems, n = compare_one(spark, con, name, qfn, oracles[name], sf_dir)
        except Exception as e:
            print(f"  {name:<20} ERROR {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if problems:
            print(f"  {name:<20} MISMATCH ({n} rows): " + " | ".join(problems))
            failed.append(name)
        else:
            print(f"  {name:<20} OK ({n} rows)")
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
