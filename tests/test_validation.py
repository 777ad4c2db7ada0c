"""Constraint validation over the ETL outputs: the clean sample must
produce a zero-violation report, and injected dirt must be caught."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import pipeline, validation
from tests.conftest import OSM_SAMPLE, PSI_SAMPLE


@pytest.fixture(scope="module")
def tables(spark):
    return pipeline.build_tables(spark, OSM_SAMPLE, PSI_SAMPLE)


def test_sample_is_fully_valid(tables):
    report = validation.validate_osm_tables(tables)
    assert report.count() == 11  # every rule reports exactly once
    assert report.filter(F.col("n_violations") > 0).count() == 0
    validation.assert_valid(tables)  # must not raise


def test_injected_violations_caught(spark, tables):
    dirty = dict(tables)
    bad_rows = spark.createDataFrame(
        [(999, "relation", "color")],
        ["id", "element_type", "field_updated"],
    )
    dirty["update_history"] = tables["update_history"].unionByName(bad_rows)
    report = {
        (r.table, r.rule): r.n_violations
        for r in validation.validate_osm_tables(dirty).collect()
    }
    assert report[("update_history", "field_domain")] == 1
    assert report[("update_history", "element_domain")] == 1
    with pytest.raises(ValueError, match="field_domain"):
        validation.assert_valid(dirty)


def test_fk_orphans_detected(spark, tables):
    dirty = dict(tables)
    orphan = spark.createDataFrame([(123456789, 1, 0)], ["id", "node_id", "position"])
    dirty["ways_nodes"] = tables["ways_nodes"].unionByName(orphan)
    report = {
        (r.table, r.rule): r.n_violations
        for r in validation.validate_osm_tables(dirty).collect()
    }
    assert report[("ways_nodes", "fk_way_exists")] == 1
