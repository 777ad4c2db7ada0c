"""Streaming OSM ETL: the batch cleaning DAG over ARRIVING XML shards.

The reference processes one finished file; at scale, exports arrive
continuously (diff dumps, tile drops). This module runs the SAME
shape→clean→repair operators over a file-source stream of element-
aligned shards (sources/osm_split.py makes them):

- nodes/ways stream from the shard directory (Spark's XML source works
  as a streaming file format; schema pinned).
- Phone cleaning is stateless → identical column expression.
- Street-name repair is per-way (every <way> carries its whole tag
  array in one element), so it is micro-batch-local by construction —
  ``foreachBatch`` reuses the exact batch operators with the static
  broadcast dimension table (stream-static join pattern). No cross-
  batch state, no watermark needed for correctness.

Each micro-batch appends to the same parquet tables the batch ETL
writes — the outputs converge to the batch result once the source
drains (asserted in tests/test_osm_etl_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from udacity_data_wrangling_osm_case_study_spark import schemas
from udacity_data_wrangling_osm_case_study_spark.operators import (
    cleaning,
    official_streets,
    shape,
    street_repair,
)
from udacity_data_wrangling_osm_case_study_spark.sources import osm_xml


def _read_stream(spark: SparkSession, shard_dir: str, row_tag: str, schema) -> DataFrame:
    return (
        spark.readStream.format("xml")
        .option("rowTag", row_tag)
        .option("attributePrefix", "_")
        .schema(schema)
        .load(shard_dir)
    )


def run_streaming_etl(
    spark: SparkSession,
    shard_dir: str,
    psi_path: str,
    out_dir: str,
    available_now: bool = True,
) -> None:
    """Stream shards → the 5-table model + CDC, appending parquet.

    ``available_now=True`` drains whatever shards exist and stops
    (test/backfill mode); False runs continuously.
    """
    official = official_streets.clean_official_streets(
        osm_xml.read_official_streets_raw(spark, psi_path)
    ).cache()
    official.count()  # materialize once; broadcast into every batch
    lookup = official_streets.name_lookup_table(official)

    nodes_stream = _read_stream(spark, shard_dir, "node", schemas.OSM_NODE_SCHEMA)
    ways_stream = _read_stream(spark, shard_dir, "way", schemas.OSM_WAY_SCHEMA)

    def process_nodes(batch: DataFrame, _batch_id: int) -> None:
        shape.shape_nodes(batch).write.mode("append").parquet(f"{out_dir}/nodes")
        tags, phone_ids = cleaning.fix_phones_in_tags(shape.shape_tags(batch))
        tags.select("id", "key", "value", "type").write.mode("append").parquet(
            f"{out_dir}/nodes_tags"
        )
        cleaning.update_history(
            phone_ids, phone_ids.limit(0), phone_ids.limit(0)
        ).write.mode("append").parquet(f"{out_dir}/update_history")

    def process_ways(batch: DataFrame, _batch_id: int) -> None:
        shape.shape_ways(batch).write.mode("append").parquet(f"{out_dir}/ways")
        shape.shape_way_nodes(batch).write.mode("append").parquet(
            f"{out_dir}/ways_nodes"
        )
        tags_pos, phone_ids = cleaning.fix_phones_in_tags(
            shape.shape_tags(batch, with_pos=True)
        )
        repaired, name_ids = street_repair.repair_street_names(
            tags_pos, lookup, official
        )
        repaired.write.mode("append").parquet(f"{out_dir}/ways_tags")
        empty = phone_ids.limit(0)
        cleaning.update_history(empty, phone_ids, name_ids).write.mode(
            "append"
        ).parquet(f"{out_dir}/update_history")

    trigger = {"availableNow": True} if available_now else {}
    queries = [
        nodes_stream.writeStream.foreachBatch(process_nodes)
        .option("checkpointLocation", f"{out_dir}/_ckpt_nodes")
        .trigger(**trigger)
        .start(),
        ways_stream.writeStream.foreachBatch(process_ways)
        .option("checkpointLocation", f"{out_dir}/_ckpt_ways")
        .trigger(**trigger)
        .start(),
    ]
    for q in queries:
        q.awaitTermination()
