"""fan_out_scan (round 13): the scale-adaptive round-robin fan-out.

The helper must (a) add exactly one round-robin exchange when the frame
carries fewer partitions than half the session's default parallelism —
the driver-testdata case, where every parquet file is a single row
group — and (b) be a provable no-op when the frame already supplies
enough splits, so at production scale the exchange never exists.
"""

from __future__ import annotations

from udacity_data_wrangling_osm_case_study_spark.plans.registry import fan_out_scan


def test_fans_out_single_split_frame(spark):
    df = spark.range(0, 1000, 1, numPartitions=1)
    par = spark.sparkContext.defaultParallelism
    out = fan_out_scan(df, spark)
    assert out.rdd.getNumPartitions() == par
    # Round-robin, not hash: every input row survives exactly once.
    assert out.count() == 1000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan


def test_noop_when_frame_already_parallel(spark):
    par = spark.sparkContext.defaultParallelism
    n = max(par // 2, 2)  # exactly at the threshold -> no-op
    df = spark.range(0, 1000, 1, numPartitions=n)
    out = fan_out_scan(df, spark)
    assert out is df  # identical object: no exchange node added at all
