from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiopro_essentia_spark.session import get_spark  # noqa: E402
from audiopro_essentia_spark.fixtures import make_sequences  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_seqs(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    p = tmp_path_factory.mktemp("seqs") / "tiny.parquet"
    pq.write_table(make_sequences(profile="tiny"), str(p))
    return spark.read.parquet(str(p))


@pytest.fixture(scope="session")
def tiny_table():
    return make_sequences(profile="tiny")
