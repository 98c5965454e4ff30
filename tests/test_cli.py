"""CLI entry (`python -m audiopro_essentia_spark`) end-to-end on the tiny
fixture — the analog of the reference's main.py/arg_parser contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from audiopro_essentia_spark.fixtures import make_sequences

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def seq_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "seqs.parquet"
    pq.write_table(make_sequences(profile="tiny"), str(p))
    return str(p)


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "audiopro_essentia_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=400,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_cli_end_to_end(seq_path, tmp_path):
    out = str(tmp_path / "out")
    r = _run([seq_path, out, "--features", "rms,volume,mfcc",
              "--n-buckets", "4", "--master", "local[4]", "--codec", "zstd"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["committed"] == [0, 1, 2, 3]
    assert summary["monitor"]["samples"] >= 1  # A17 on by default
    assert summary["total_rows"] > 100
    assert summary["quarantined"] >= 1
    assert os.path.exists(os.path.join(out, "_SUCCESS.json"))
    # resume: second run skips everything
    r2 = _run([seq_path, out, "--features", "rms,volume,mfcc",
               "--n-buckets", "4", "--master", "local[4]",
               "--skip-monitoring"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["committed"] == [] and s2["skipped"] == [0, 1, 2, 3]
    assert "monitor" not in s2


def test_cli_rejects_bad_args(seq_path, tmp_path):
    r = _run([seq_path, str(tmp_path / "o2"), "--features", "nope"])
    assert r.returncode == 2 and "unknown features" in r.stderr
    r = _run([seq_path, str(tmp_path / "out.json")])
    assert r.returncode == 2 and "extension" in r.stderr
    r = _run([seq_path, str(tmp_path / "o3"), "--start", "5", "--end", "2"])
    assert r.returncode == 2 and "--end" in r.stderr


def test_msgpack_codec_roundtrip_spec():
    from audiopro_essentia_spark.functions.msgpack import packb, unpackb

    cases = [None, True, 127, -33, 2**40, 1.5, "héllo", b"\x00\xff",
             list(range(20)), {"nested": {"a": [1, None, "s"]}}]
    for c in cases:
        assert unpackb(packb(c)) == c
    # spec-pinned encodings (msgpack.org format spec)
    assert packb(None) == b"\xc0"
    assert packb("abc") == b"\xa3abc"
    assert packb([1, 2]) == b"\x92\x01\x02"
    assert packb({"a": 1}) == b"\x81\xa1a\x01"


def test_msgpack_sink_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from audiopro_essentia_spark.sources.sinks import (
        read_msgpack_dir,
        write_msgpack_dir,
    )

    df = spark.range(0, 50).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.col("id") * 0.5).alias("score"),
        F.array(F.col("id"), F.col("id") + 1).alias("pair"),
    )
    out = tmp_path / "mp"
    write_msgpack_dir(df, str(out))
    rows = read_msgpack_dir(str(out))
    assert len(rows) == 50
    byid = {r["doc_id"]: r for r in rows}
    assert byid["doc7"]["score"] == 3.5 and byid["doc7"]["pair"] == [7, 8]


def test_cli_msgpack_format(seq_path, tmp_path):
    from audiopro_essentia_spark.sources.sinks import read_msgpack_dir

    out = str(tmp_path / "outmp")
    r = _run([seq_path, out, "--features", "rms", "--n-buckets", "2",
              "--master", "local[4]", "--format", "msgpack",
              "--skip-monitoring"])
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["format"] == "msgpack" and summary["committed"] == [0, 1]
    rows = read_msgpack_dir(os.path.join(out, "doc_meta_msgpack"))
    assert rows and all("doc_id" in d and "rms_amplitude" in d for d in rows)


def test_msgpack_rejects_deep_nesting_and_bad_map_keys():
    import pytest

    from audiopro_essentia_spark.functions.msgpack import unpackb

    # ~2000 nested 1-element arrays: must be ValueError, not RecursionError
    with pytest.raises(ValueError, match="nesting"):
        unpackb(b"\x91" * 2000 + b"\xc0")
    # spec-legal map with an (unhashable) array key -> contract ValueError
    with pytest.raises(ValueError, match="map key"):
        unpackb(b"\x81\x90\xc0")


def test_msgpack_property_roundtrip_and_fuzz():
    """Property layer over the spec-pinned cases: (a) packb/unpackb is the
    identity on arbitrary nested values built from every supported type;
    (b) unpackb on arbitrary byte strings either decodes or raises the
    documented ValueError — never IndexError/struct.error/RecursionError
    (the quarantine contract callers rely on)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from audiopro_essentia_spark.functions.msgpack import packb, unpackb

    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
        st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
        st.text(max_size=80),
        st.binary(max_size=80),
    )
    nested = st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=6),
            st.dictionaries(st.text(max_size=10), kids, max_size=6),
        ),
        max_leaves=25,
    )

    @settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow])
    @given(nested)
    def roundtrip(v):
        assert unpackb(packb(v)) == v

    @settings(max_examples=300)
    @given(st.binary(min_size=1, max_size=60))
    def fuzz(raw):
        try:
            unpackb(raw)
        except ValueError:
            pass  # the one documented failure mode

    roundtrip()
    fuzz()
