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


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling must actually fire: a sort-merge join with
    one hot key (99% of the fact) gets its oversized partition SPLIT by
    AQE — visible as skew=true in the final executed plan — with join
    results identical to the unskewed semantics. This is the engine's
    no-manual-salting answer for skewed joins at scale (manual salting
    in operators/skew.py covers aggregations, where AQE can't help)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # sf-scale thresholds so the test corpus counts as skewed
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        fact = spark.range(200_000).select(
            F.when((F.col("id") % 1000) < 990, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pay"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("dpay")
        )
        joined = fact.join(dim, "k")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert len(rows) == 200_000  # every fact row matched exactly once
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
