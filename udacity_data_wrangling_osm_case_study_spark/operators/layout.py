"""Physical data-layout utilities: partitioned and bucketed storage.

At 100 TB the table layout IS the query plan:

- **Partitioning** (directory-level): queries filtering on the
  partition column scan only matching directories — partition pruning
  shows as ``PartitionFilters`` in explain, and the pruned files are
  never opened.
- **Bucketing** (file-level hash layout): two tables bucketed by the
  same key into the same bucket count join WITHOUT a shuffle — the
  exchange disappears from the plan. This is how the orders⋈lineitem
  class of fact-fact joins survives scale: pay the shuffle once at
  write time, never again per query.

Bucketed tables go through the session catalog (``saveAsTable``) —
bucket metadata lives in the metastore, which is what lets the planner
trust the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: one directory per distinct
    partition-column tuple; readers prune by directory."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) catalog table. Joins and
    aggregations on ``bucket_col`` between tables sharing the layout
    run shuffle-free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
