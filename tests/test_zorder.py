"""Z-order layout (operators/layout.py) — exact python mirror of
bucket + Morton interleave, hand-derived interleave values, fail-loud
bounds, guards, zero-shuffle/zero-Python plan pin, the layout
effectiveness proof (per-file bounding boxes prune a second-dimension
predicate that a single-column sort cannot), and twin equality on the
events fixture."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from audiopro_essentia_spark.duck_twins import zorder_key_sql
from audiopro_essentia_spark.operators.layout import (
    with_zorder_key,
    zorder_bucket,
    zorder_key,
    zorder_layout,
)


def _bucket(v, lo, hi, bits):
    m = 1 << bits
    width = ((hi - lo + 1) + m - 1) // m
    return (v - lo) // width


def _morton(vals, bits):
    out = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            out += ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_interleave_hand_values(spark):
    df = spark.createDataFrame([(5, 3), (0, 0), (7, 7)], "x long, y long")
    got = [
        r.z
        for r in df.select(
            zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    ]
    # x=101 y=011 -> bits at j*2+i: 1+2+8+16 = 27; max = 63
    assert got == [27, 0, 63]
    assert got == [_morton((x, y), 3) for x, y in [(5, 3), (0, 0), (7, 7)]]


def test_bucket_mirror_and_range(spark):
    rows = [(v,) for v in (0, 1, 499, 500, 996)]
    df = spark.createDataFrame(rows, "v long")
    got = [
        r.b
        for r in df.select(
            zorder_bucket(F.col("v"), F.lit(0), F.lit(996), 8).alias("b")
        ).collect()
    ]
    assert got == [_bucket(v, 0, 996, 8) for (v,) in rows]
    assert all(0 <= b < 256 for b in got)
    # hi itself lands in the top bucket only when span divides evenly;
    # always strictly below 2^bits
    assert max(got) >= 240


def test_bucket_fails_loud_out_of_bounds(spark):
    df = spark.createDataFrame([(1_000,)], "v long")
    with pytest.raises(Exception, match="zorder_bucket"):
        df.select(
            zorder_bucket(F.col("v"), F.lit(0), F.lit(996), 8).alias("b")
        ).collect()


def test_guards(spark):
    with pytest.raises(ValueError, match="bits"):
        zorder_bucket(F.lit(1), F.lit(0), F.lit(9), 0)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key([F.col("x")], bits=8)
    with pytest.raises(ValueError, match="bits"):
        zorder_key([F.col("x"), F.col("y")], bits=32)  # 64 > 62
    df = None
    with pytest.raises(ValueError, match="n_files"):
        zorder_layout(df, n_files=0)


def test_plan_narrow_zero_python(spark):
    """The key is one whole-stage-codegen projection: zero Exchange,
    zero Python."""
    df = spark.createDataFrame([(i, i % 7, i % 11) for i in range(50)],
                               "id long, xb long, yb long")
    plan = (
        with_zorder_key(df, ["xb", "yb"], bits=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def _per_file_y_ranges(spark, path):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min("y").alias("lo"), F.max("y").alias("hi")
        ).collect()[0]
        out.append((r.lo, r.hi))
    return out


def test_layout_prunes_second_dimension(spark, tmp_path):
    """THE point of z-order: after clustering on the interleaved key,
    every file has a small min/max box in BOTH dimensions, so a
    selective predicate on the SECOND column prunes most files — while
    an x-sorted layout leaves y stats useless (every file spans the
    whole y range and nothing prunes)."""
    n = 4096
    rows = [
        (i, (i * 2654435761) % 997, (i * 40503) % 991) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    b = df.select(
        "id",
        "y",
        zorder_bucket(F.col("x"), F.lit(0), F.lit(996), 8).alias("xb"),
        zorder_bucket(F.col("y"), F.lit(0), F.lit(990), 8).alias("yb"),
    )
    zdir = str(tmp_path / "zorder")
    xdir = str(tmp_path / "xsort")
    zorder_layout(
        with_zorder_key(b, ["xb", "yb"], bits=8), "z_key", 16
    ).write.parquet(zdir)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        xdir
    )
    # the pruning predicate a stats-aware reader applies for y <= 60
    zr = _per_file_y_ranges(spark, zdir)
    xr = _per_file_y_ranges(spark, xdir)
    z_hit = sum(1 for lo, hi in zr if lo <= 60)
    x_hit = sum(1 for lo, hi in xr if lo <= 60)
    assert len(zr) == 16 and len(xr) == 16
    assert x_hit == 16          # x-sort: y stats prune NOTHING
    assert z_hit <= 8, zr       # z-order: most files pruned
    # and the z layout loses no rows
    assert spark.read.parquet(zdir).count() == n


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_twin_matches_duckdb_on_fixture(spark, sf_dir):
    import __spark_entry__ as e

    sp = (
        e.q_staged_zorder(spark, sf_dir)
        .orderBy("event_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    dd = con.execute(
        zorder_key_sql(bits=16) + " ORDER BY event_id"
    ).fetchdf()
    dd = dd.astype(sp.dtypes.to_dict())
    assert sp.reset_index(drop=True).equals(dd.reset_index(drop=True))
