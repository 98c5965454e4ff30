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
