"""Skyline (Pareto frontier) queries: the points no other point beats
on every dimension.

Operator class absent from the reference (SURVEY.md §2.3) and from
Spark itself. For the two-dimensional (minimize x, maximize y) skyline
with strict-in-both dominance, the frontier is computable without any
pairwise join: a point p is dominated iff the maximum y among points
with STRICTLY smaller x exceeds p.y. That running maximum over x-order
is the whole algorithm — O(n log n) instead of the O(n^2) dominance
join the naive formulation (and the test oracle) uses.

Scale shape: x-levels are first reduced by groupBy(x) (map-side
combinable), then the strict-prefix max runs as the two-phase
distributed pattern (range-partition by x, per-partition running max,
per-partition totals — one row each, driver-scale — cumulated and
broadcast back as each partition's base). No single-partition window,
no cross join; the final dominance test is one equi-join on x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def strict_prefix_max(
    levels: DataFrame, order_col: str, val_col: str, out_col: str
) -> DataFrame:
    """Add ``out_col``: the max of ``val_col`` over rows with strictly
    smaller ``order_col`` (NULL for the minimum), computed with the
    two-phase distributed prefix pattern. Requires ``order_col`` values
    to be distinct (reduce to levels first)."""
    part = levels.repartitionByRange(order_col).withColumn(
        "_part", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_part")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = part.withColumn("_max_in", F.max(val_col).over(w_in))
    # one row per physical partition: cumulate the bases on the driver-
    # scale frame and broadcast back
    totals = (
        part.groupBy("_part")
        .agg(F.max(val_col).alias("_tot"))
        .withColumn(
            "_base",
            F.max("_tot").over(
                Window.orderBy("_part").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_part", "_base")
    )
    return (
        within.join(F.broadcast(totals), "_part")
        # greatest() skips NULLs: NULL only when both sides are (the
        # global minimum level)
        .withColumn(out_col, F.greatest("_base", "_max_in"))
        .drop("_part", "_max_in", "_base")
    )


def pareto_frontier_2d(
    df: DataFrame, min_col: str, max_col: str
) -> DataFrame:
    """Rows not strictly dominated: no other row has smaller
    ``min_col`` AND larger ``max_col`` (strict in both, so ties never
    dominate). Returns the input rows that lie on the frontier."""
    levels = df.groupBy(min_col).agg(F.max(max_col).alias("_lvl_max"))
    bounds = strict_prefix_max(levels, min_col, "_lvl_max", "_strict_max")
    return (
        df.join(bounds.select(min_col, "_strict_max"), min_col)
        .filter(
            F.col("_strict_max").isNull()
            | (F.col("_strict_max") <= F.col(max_col))
        )
        .drop("_lvl_max", "_strict_max")
    )
