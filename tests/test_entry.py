"""Driver-contract smoke + oracle parity for a representative subset
(the full 29-query compare runs via tests/driver_compare.py and the
driver's own CORRECTNESS gate)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tests.driver_compare import compare_one, duck_con  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = (
    "framing_counts",
    "frame_rms",
    "doc_stats",
    "sessionize",
    "asof_join",
    "minhash_lsh",
    "ann_topk",
    "fingerprint",
)


def test_contract_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles).issubset(set(qs))
    # >=20 SQL-oracle-checked operators
    assert len(oracles) >= 20


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "rms" in df.columns and "doc_id" in df.columns


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, name):
    con = duck_con(SF)
    problems, n = compare_one(
        spark, con, name, E.queries()[name], E.oracle_sql()[name], SF
    )
    assert not problems, (name, problems)
    assert n > 0


def test_contract_invariants_locked():
    """Lock the driver-contract invariants that reorders keep breaking:
    every query has an oracle, the bench list only names real queries,
    and every never-driver-checked entry (vs the union of recorded
    CORRECTNESS artifacts) sits inside the driver's 50-query window."""
    import json

    import bench

    qs = list(E.queries())
    oracles = E.oracle_sql()
    assert set(oracles) == set(qs), "oracle keys must exactly match queries"
    assert set(bench.BENCH_QUERIES).issubset(set(qs)), "bench names a ghost"

    checked: set = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fn in os.listdir(root):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            checked |= set(json.load(open(os.path.join(root, fn))))
    never = [q for q in qs if q not in checked]
    # R5 (final) rotation lock: the window is EXACTLY R5_WINDOW in its
    # committed order (the driver checks positions 1-50 — an accidental
    # reorder silently wastes the final round's checks), R5_WINDOW and
    # R5_HOLDOUTS partition the staged roster, and the ONLY
    # never-driver-checked entries outside the window are the 23
    # justified holdouts.
    assert qs[:50] == list(E.R5_WINDOW), "window != R5_WINDOW order"
    staged = set(E._staged_queries())
    assert set(E.R5_WINDOW) | set(E.R5_HOLDOUTS) == staged
    assert not set(E.R5_WINDOW) & set(E.R5_HOLDOUTS)
    assert len(E.R5_WINDOW) == 50 and len(E.R5_HOLDOUTS) == 23
    outside = [
        q
        for q in never
        if q not in set(qs[:50]) and q not in set(E.R5_HOLDOUTS)
    ]
    assert not outside, f"never-driver-checked entries past position 50: {outside}"
