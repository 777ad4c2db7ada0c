"""The §2.9 exploration SQL over the OSM views, checked against facts
measured on the shatin.osm goldens."""

from __future__ import annotations

import pytest

from udacity_data_wrangling_osm_case_study_spark.operators import pipeline
from udacity_data_wrangling_osm_case_study_spark.plans import osm_exploration
from tests.conftest import OSM_SAMPLE, PSI_SAMPLE


@pytest.fixture(scope="module")
def views(spark):
    tables = pipeline.build_tables(spark, OSM_SAMPLE, PSI_SAMPLE)
    pipeline.register_views(tables)
    return spark


def test_row_counts(views):
    rows = dict(
        (r.tbl, r.n)
        for r in views.sql(osm_exploration.EXPLORATION_SQL["row_counts"]).collect()
    )
    assert rows == {
        "nodes": 13676,
        "ways": 1958,
        "nodes_tags": 1841,
        "ways_tags": 7040,
        "ways_nodes": 16547,
        "update_history": 8,
    }


def test_cleaning_summary(views):
    rows = {
        (r.element_type, r.field_updated): r.n
        for r in views.sql(
            osm_exploration.EXPLORATION_SQL["cleaning_summary"]
        ).collect()
    }
    assert rows == {("node", "phone"): 1, ("way", "phone"): 5, ("way", "name"): 2}


def test_all_queries_run(views):
    for name, sql in osm_exploration.EXPLORATION_SQL.items():
        result = views.sql(sql)
        assert result.columns, name
        result.collect()


def test_top_amenities_shape(views):
    rows = views.sql(osm_exploration.EXPLORATION_SQL["top_amenities"]).collect()
    assert rows[0].value == "parking" and rows[0].n == 12
