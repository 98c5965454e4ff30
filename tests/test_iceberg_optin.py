"""Opt-in Iceberg-runtime integration test (VERDICT r2 item 7).

The sandbox image ships no Iceberg jar and (normally) no network, so this
test SKIPS cleanly offline — it exists so that any environment with Maven
access exercises the REAL `writeTo(table)` path of CheckpointedWriter:
create/append commits, snapshot-id lineage, bucket-granular resume — the
same contract the parquet facade honors (test_writer_skew.py pins that
side).

Runs in a SUBPROCESS: `spark.jars.packages` only takes effect at JVM
launch, and the pytest session already holds a jar-less JVM via the shared
`spark` fixture — a second SparkContext per process is not possible.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# iceberg-spark-runtime for the newest Spark line the Iceberg project
# publishes; override via env when a 4.x runtime lands on Maven Central
ICEBERG_PKG = os.environ.get(
    "SPARK_GRAFT_ICEBERG_PKG",
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
)

DRIVER = """
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from audiopro_essentia_spark.sources.sinks import CheckpointedWriter, _iceberg_available

wh = {wh!r}
spark = (
    SparkSession.builder.master("local[2]")
    .appName("iceberg-optin")
    .config("spark.jars.packages", {pkg!r})
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ice.type", "hadoop")
    .config("spark.sql.catalog.ice.warehouse", wh)
    .getOrCreate()
)
if not _iceberg_available(spark):
    print(json.dumps({{"skip": "runtime jar did not load"}}))
    sys.exit(0)

out_dir = os.path.join(wh, "ckpt")
df = spark.range(400).select(
    F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
    (F.col("id") % 7).alias("v"),
)
w = CheckpointedWriter(out_dir, n_buckets=4, fmt="iceberg", spark=spark,
                       table="ice.db.frames")
st1 = w.write(df)
assert sorted(st1["committed"]) == [0, 1, 2, 3], st1
assert st1["total_rows"] == 400, st1
# snapshot-id lineage parity: every commit carries the REAL snapshot id
snaps = [r[0] for r in spark.sql(
    "SELECT snapshot_id FROM ice.db.frames.snapshots").collect()]
for b in range(4):
    rec = json.load(open(os.path.join(out_dir, "_lineage", f"commit_{{b}}.json")))
    assert int(rec["snapshot_id"]) in snaps, (b, rec, snaps)
# resume: everything committed -> second write touches nothing
st2 = w.write(df)
assert st2["committed"] == [] and sorted(st2["skipped"]) == [0, 1, 2, 3], st2
# bucket-granular resume: drop one commit marker, rewrite ONLY that bucket
os.remove(os.path.join(out_dir, "_lineage", "commit_2.json"))
st3 = w.write(df)
assert st3["committed"] == [2], st3
back = w.read(spark)
assert back.count() == 400
assert back.select("doc_id").distinct().count() == 400  # exactly-once
print(json.dumps({{"ok": True}}))
"""


def _online() -> bool:
    try:
        socket.getaddrinfo("repo1.maven.org", 443)
        return True
    except OSError:
        return False


@pytest.mark.skipif(
    not _online(),
    reason="offline: cannot fetch iceberg-spark-runtime from Maven Central",
)
def test_iceberg_writer_end_to_end():
    with tempfile.TemporaryDirectory() as wh:
        script = DRIVER.format(repo=REPO, wh=wh, pkg=ICEBERG_PKG)
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=900,
        )
        tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0:
            # a missing 4.x runtime artifact is an environment gap, not an
            # engine bug — skip with the resolver error for the record
            if "unresolved dependency" in (proc.stderr + proc.stdout).lower():
                pytest.skip(f"iceberg runtime unresolvable: {ICEBERG_PKG}")
            raise AssertionError(
                f"iceberg driver failed\nstdout:\n{proc.stdout[-4000:]}\n"
                f"stderr:\n{proc.stderr[-4000:]}"
            )
        msg = json.loads(tail)
        if "skip" in msg:
            pytest.skip(msg["skip"])
        assert msg == {"ok": True}
