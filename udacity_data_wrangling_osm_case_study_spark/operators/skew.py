"""Skew-mitigation utilities: salted joins for pathological hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Manual salting still
matters when (a) a single join key exceeds one executor's memory even
after splitting, or (b) the skewed side feeds a stateful/streaming
operator AQE can't re-plan. The classic OSM example: the ``highway``
tag key is Zipfian (1,312 of 10,130 tags in the sample — SURVEY.md §4).

``salted_join`` replicates the small side N ways and scatters the big
side across the N replicas, turning one hot partition into N even ones
at the cost of N× the (broadcast-sized) small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with an N-way salt.

    The salt on the big side is derived from ``spark_partition_id`` +
    a per-row monotonic id — uniform, no data column needed, and the
    join RESULT is independent of the salt values (they only route
    rows), so nondeterminism in the id assignment is harmless.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_salted, on + ["_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT value) per hot key in two stages: distinct within
    (key, salt-of-value) partitions first, then combine — the single
    hot key never lands on one reducer. Exact (salting by the VALUE
    hash keeps each distinct value in exactly one salt bucket)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.countDistinct(value).alias("_n")
    )
    return partial.groupBy(key).agg(F.sum("_n").cast("bigint").alias("n_distinct"))
