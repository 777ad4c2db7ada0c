"""Salted operators must produce exactly the plain operators' results —
salting only changes routing, never semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share one key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("missing", 3)], ["k", "w"]
    )
    plain = big.join(small, ["k"]).groupBy("k", "w").agg(F.sum("v").alias("s"))
    salted = (
        skew.salted_join(big, small, ["k"], n_salts=8)
        .groupBy("k", "w")
        .agg(F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_distinct_exact(spark):
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 700).alias("v"),
    )
    plain = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r.k: r.n_distinct
        for r in skew.salted_count_distinct(df, "k", "v", n_salts=8).collect()
    }
    assert plain == salted
