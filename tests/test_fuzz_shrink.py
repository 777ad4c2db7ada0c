"""End-to-end exercise of the fuzz-failure shrinker (round-10, VERDICT
item 7): a deliberately buggy query/oracle pair (Spark counts non-null
event values, the oracle counts rows — they diverge exactly when the
variant nulled a value) is handed to shrink_failure on a real seeded
variant, and the minimizer must localize the failure to the single
mutated column that matters (events.value) with a drastically reduced
row footprint — the work the round-9 45-query triage did by hand."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

spec = importlib.util.spec_from_file_location(
    "fuzz_oracle", os.path.join(REPO, "tools", "fuzz_oracle.py")
)
fuzz_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fuzz_oracle)

BASE = "/root/testdata/sf0.001"


def _buggy_query(spark, sf_dir):
    # BUG under test: ignores NULL values where the oracle counts rows
    return spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.count("value").alias("n")
    )


BUGGY_ORACLE = "SELECT COUNT(*) AS n FROM events"


@pytest.mark.skipif(not os.path.exists(BASE), reason="driver testdata absent")
def test_shrink_localizes_single_column_and_rows(spark, tmp_path):
    variant_dir = str(tmp_path / "seed_1")
    fuzz_oracle.make_variant(BASE, variant_dir, "1")

    queries = {"buggy_count": _buggy_query}
    oracles = {"buggy_count": BUGGY_ORACLE}
    repro = fuzz_oracle.shrink_failure(
        spark,
        BASE,
        variant_dir,
        str(tmp_path / "shrink"),
        "buggy_count",
        queries,
        oracles,
    )
    # the one mutation that matters, and nothing else
    assert repro["mutated_columns_kept"] == {"events": ["value"]}
    # every irrelevant table dropped to zero rows by the fast path;
    # events bisected down to a handful of rows containing a NULL
    assert repro["row_counts"]["events"] <= 4
    for t, n in repro["row_counts"].items():
        if t != "events":
            assert n == 0, (t, n)
    # the minimal dir still reproduces (same signature)
    assert repro["final_problems"] is not None
    assert fuzz_oracle._failure_signature(
        repro["final_problems"]
    ) == tuple(sorted(repro["signature"]))

    # and the minimal parquet is a genuine witness: <=4 event rows,
    # at least one with a NULL value
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(repro["minimal_dir"], "events.parquet"))
    assert ev.num_rows <= 4
    assert any(v is None for v in ev.column("value").to_pylist())


def test_signature_is_stable_under_counts():
    s1 = fuzz_oracle._failure_signature(
        ["col n: value diff at sorted row 0: 593 vs 600"]
    )
    s2 = fuzz_oracle._failure_signature(
        ["col n: value diff at sorted row 0: 1 vs 2"]
    )
    s3 = fuzz_oracle._failure_signature(["rows: 5 vs 6"])
    assert s1 == s2 != s3
