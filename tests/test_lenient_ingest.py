"""Dirty-input ingestion: a typed scan dies on one malformed attribute;
the lenient path degrades it to NULL and validation reports it."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import shape, validation
from udacity_data_wrangling_osm_case_study_spark.sources import osm_xml

DIRTY = """<?xml version="1.0" encoding="UTF-8"?>
<osm>
<node id="1" lat="22.1" lon="114.1" user="u" uid="5" version="1" changeset="9" timestamp="2017-07-01T14:31:00Z"/>
<node id="2" lat="NOT_A_NUMBER" lon="114.2" user="u" uid="6" version="1" changeset="9" timestamp="2017-07-01T14:31:00Z"/>
<node id="3" lat="22.3" lon="999.9" user="u" uid="7" version="1" changeset="9" timestamp="bad-timestamp"/>
</osm>
"""


@pytest.fixture(scope="module")
def dirty_path():
    d = tempfile.mkdtemp(prefix="dirty_")
    with open(f"{d}/dirty.osm", "w") as fh:
        fh.write(DIRTY)
    return f"{d}/dirty.osm"


def test_typed_scan_fails_on_dirty(spark, dirty_path):
    with pytest.raises(Exception, match="FAILED_READ_FILE|Unparseable"):
        osm_xml.read_nodes_raw(spark, dirty_path).collect()


def test_lenient_scan_degrades_and_validation_flags(spark, dirty_path):
    raw = osm_xml.read_nodes_raw(spark, dirty_path, lenient=True)
    nodes = shape.shape_nodes(raw)
    rows = {r.id: r for r in nodes.collect()}
    assert len(rows) == 3
    assert rows[2].lat is None          # malformed number → NULL
    assert rows[1].lat == 22.1          # clean rows untouched

    empty = nodes.limit(0)
    report = {
        (r.table, r.rule): r.n_violations
        for r in validation.validate_osm_tables(
            {
                "nodes": nodes,
                "ways": empty.select("id", "user", "uid", "version", "changeset", "timestamp"),
                "nodes_tags": spark.createDataFrame([], "id long, key string, value string, type string"),
                "ways_tags": spark.createDataFrame([], "id long, key string, value string, type string"),
                "ways_nodes": spark.createDataFrame([], "id long, node_id long, position int"),
                "update_history": spark.createDataFrame([], "id long, element_type string, field_updated string"),
            }
        ).collect()
    }
    assert report[("nodes", "lat_range")] == 1       # NULL lat flagged
    assert report[("nodes", "lon_range")] == 1       # 999.9 out of range
    assert report[("nodes", "timestamp_iso8601")] == 1
