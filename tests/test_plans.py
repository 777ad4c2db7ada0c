"""Physical-plan regression tests: the scale-critical plan shapes must
survive refactors — filter pushdown into the parquet scan, column
pruning, broadcast dimension joins (never sort-merge for dims), and
true top-k (TakeOrderedAndProject, no global sort)."""

from __future__ import annotations

import contextlib
import io

import pytest

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    queries, _ = registry.load_all()
    df = queries[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    p = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # 6 of 11 lineitem columns read — projection reached the scan
    schema_line = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in schema_line and "l_quantity" in schema_line
    # partial + final hash aggregation (map-side combine)
    assert p.count("HashAggregate") >= 2


def test_dimension_joins_broadcast(spark):
    p = _plan(spark, "region_rollup")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered(spark):
    for name in ("top_contributors", "top_parts_by_revenue", "knn_bruteforce"):
        p = _plan(spark, name)
        assert "TakeOrderedAndProject" in p, name


def test_whole_stage_codegen_covers_cleaning(spark):
    # The phone canonicalizer must stay JVM-side: no Python eval nodes
    # anywhere in the plan (AQE's formatted explain hides codegen
    # annotations pre-execution, so assert via the codegen explain).
    p = _plan(spark, "phone_canonicalization")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    queries, _ = registry.load_all()
    df = queries["phone_canonicalization"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen subtrees" in buf.getvalue()
