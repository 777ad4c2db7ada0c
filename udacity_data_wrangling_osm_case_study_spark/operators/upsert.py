"""MERGE/upsert: apply a change set to a snapshot — the consumer side
of the CDC story (the ETL's update_history table is the producer side).

Relational MERGE without a table format: full outer join on the key,
prefer the update side, honor tombstones. At scale this is one shuffle
on the key (or zero with co-bucketed layouts — operators/layout.py);
with Delta/Iceberg the same logic rides their native MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` by ``key``.

    - key present in both → the WHOLE update row wins (standard MERGE
      ``UPDATE SET *``: an update carrying NULL in a column nulls that
      column out — gated on the update row's existence, NOT per-column
      coalesce, which would silently keep the target's old value).
    - key only in updates → insert.
    - key only in target → kept.
    - ``tombstone_col`` (boolean, on updates) marks deletes.
    """
    value_cols = [c for c in target.columns if c != key]
    u = updates
    if tombstone_col is None:
        tombstone = F.lit(False)
    else:
        tombstone = F.coalesce(F.col(f"u.{tombstone_col}"), F.lit(False))
        value_cols = [c for c in value_cols if c != tombstone_col]

    t = target.alias("t")
    u = u.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    upd_exists = F.col(f"u.{key}").isNotNull()
    merged = joined.select(
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        tombstone.alias("_dead"),
        *[
            F.when(upd_exists, F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged.filter(~F.col("_dead")).drop("_dead")
