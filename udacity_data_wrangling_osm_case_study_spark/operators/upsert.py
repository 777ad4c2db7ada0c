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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Diff two table snapshots into a change feed: one row per changed
    key with ``op`` ∈ {'I' (insert), 'U' (update), 'D' (delete)} — the
    inverse of :func:`merge_upsert` (diff generates exactly the feed
    merge re-applies; together with the SCD2 builder this closes the
    CDC triangle: diff → merge → history).

    Comparison is null-safe per column tuple (a value flipping to/from
    NULL is an update, matching MERGE semantics). Plan shape: one
    full-outer shuffle join on the key, row-local struct compare — the
    same single-shuffle cost as the merge itself; at 100 TB both sides
    pre-bucketed on the key make it shuffle-free (operators.layout).

    Output: (op, ``key``) for every changed key.
    """
    o = old.select(F.col(key), F.struct(*compare_cols).alias("_o"))
    n = new.select(F.col(key), F.struct(*compare_cols).alias("_n"))
    j = o.alias("o").join(
        n.alias("n"), F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer"
    )
    present_o = F.col(f"o.{key}").isNotNull()
    present_n = F.col(f"n.{key}").isNotNull()
    op = (
        F.when(~present_o, "I")
        .when(~present_n, "D")
        .when(~F.col("_o").eqNullSafe(F.col("_n")), "U")
    )
    return (
        j.select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            op.alias("op"),
        )
        .filter(F.col("op").isNotNull())
    )
