"""Distributed order statistics without full sorts.

The ranked-window median in ``event_value_mad_outliers`` concentrates
each group on one reducer — fine when groups are small, documented as
the thing to replace at 100 TB. This module is the replacement for
bounded-cardinality value domains (prices in cents, durations in ms,
quantized scores — most operational metrics): reduce to a per-(group,
value) histogram first (map-side combinable, one shuffle of DISTINCT
values), then select the rank from the reduced frame. No node ever
sorts raw rows; the window runs over histogram rows, whose count is
bounded by the value domain, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_median(
    df: DataFrame, key: str, value: str, weight: str | None = None
) -> DataFrame:
    """Exact lower median per key via histogram selection: the value at
    raw-row rank ``(n+1) div 2`` in value order — identical to a fully
    tie-broken ranked-window median, because ties share one histogram
    bucket. With ``weight``, the WEIGHTED lower median: the smallest
    value whose cumulative weight reaches ``(W+1) div 2`` (integer
    weights). Returns (key, n, median) where n is the total count or
    weight.

    Shape: groupBy (key, value) with map-side combine reduces raw rows
    to histogram rows; the cumulative count + rank pick run per key
    over histogram rows only.

    NULL values (and NULL weights) are ignored, the SQL ``median()``
    convention — a NULL histogram bucket would otherwise sort at
    engine-dependent ends of the cumulative scan.
    """
    df = df.filter(F.col(value).isNotNull())
    if weight:
        df = df.filter(F.col(weight).isNotNull())
    agg = F.sum(weight) if weight else F.count("*")
    hist = df.groupBy(F.col(key).alias("k"), F.col(value).alias("v")).agg(
        agg.alias("c")
    )
    w_cum = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("k")
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    target = F.expr("(n + 1) div 2")
    return (
        cum.filter((F.col("cum") >= target) & (F.col("cum") - F.col("c") < target))
        .select(
            F.col("k").alias(key),
            F.col("n").cast("bigint").alias("n"),
            F.col("v").alias("median"),
        )
    )
