"""Skyline / stratified-sampling operator tests: the distributed
formulations must match brute force on randomized inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import sampling, skyline


def test_pareto_frontier_matches_bruteforce_random(spark):
    rng = random.Random(7)
    pts = [(i, rng.randint(0, 50) / 4.0, rng.randint(0, 40)) for i in range(300)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {r.id for r in skyline.pareto_frontier_2d(df, "x", "y").collect()}
    brute = {
        i
        for (i, x, y) in pts
        if not any(qx < x and qy > y for (_, qx, qy) in pts)
    }
    assert got == brute
    assert got  # non-degenerate


def test_pareto_frontier_keeps_ties(spark):
    # equal points never dominate each other (strict-in-both)
    df = spark.createDataFrame(
        [(1, 1.0, 10), (2, 1.0, 10), (3, 1.0, 5), (4, 2.0, 10), (5, 0.5, 1)],
        ["id", "x", "y"],
    )
    got = {r.id for r in skyline.pareto_frontier_2d(df, "x", "y").collect()}
    # 3: same x as the max-y point → not strictly dominated
    # 4: x=2 > 1 with equal y → dominated? needs q.x<2 and q.y>10 → none → kept
    # 5: smallest x → kept
    assert got == {1, 2, 3, 4, 5}  # all kept under strict dominance
    # now make a genuinely dominated point
    df2 = df.union(spark.createDataFrame([(6, 3.0, 4)], ["id", "x", "y"]))
    got2 = {r.id for r in skyline.pareto_frontier_2d(df2, "x", "y").collect()}
    assert 6 not in got2  # (1.0, 10) strictly dominates (3.0, 4)


def test_strict_prefix_max_matches_single_window(spark):
    rng = random.Random(11)
    lv = [(rng.random(), rng.randint(0, 100)) for _ in range(200)]
    lv = [(round(x, 6), v) for x, v in {x: v for x, v in lv}.items()]  # distinct
    df = spark.createDataFrame(lv, ["x", "v"]).repartition(8)
    out = {
        r.x: r.m
        for r in skyline.strict_prefix_max(df, "x", "v", "m").collect()
    }
    srt = sorted(lv)
    running = None
    for x, v in srt:
        assert out[x] == running, x
        running = v if running is None else max(running, v)


def test_stratified_sample_rate_counts_and_stability(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "src"])
    kept = sampling.stratified_sample_rate(df, ["src"], "id", rate_pct=10)
    by_stratum = {
        r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # floor(n * 10 / 100) per stratum: 67, 67, 66 docs → 6, 6, 6
    sizes = {"s0": 67, "s1": 67, "s2": 66}
    assert by_stratum == {s: n * 10 // 100 for s, n in sizes.items()}
    # stable under repartitioning (content-hash draw, not RNG)
    kept2 = sampling.stratified_sample_rate(
        df.repartition(13), ["src"], "id", rate_pct=10
    )
    assert {r.id for r in kept.collect()} == {r.id for r in kept2.collect()}


def test_new_operators_tolerate_empty_inputs(spark):
    """Degenerate-input sweep for this round's operators: empty frames
    in, empty frames (not exceptions) out."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from udacity_data_wrangling_osm_case_study_spark.operators import temporal

    empty_pts = spark.createDataFrame(
        [], StructType([
            StructField("id", LongType()),
            StructField("x", LongType()),
            StructField("y", IntegerType()),
        ])
    )
    assert skyline.pareto_frontier_2d(empty_pts, "x", "y").count() == 0
    assert skyline.strict_prefix_max(empty_pts, "x", "y", "m").count() == 0

    empty_iv = spark.createDataFrame(
        [], StructType([
            StructField("st", TimestampType()),
            StructField("en", TimestampType()),
        ])
    )
    assert temporal.interval_concurrency(empty_iv, "st", "en").count() == 0

    empty_obs = spark.createDataFrame(
        [], StructType([
            StructField("k", LongType()),
            StructField("ts", TimestampType()),
        ])
    )
    assert temporal.resample_locf(empty_obs, "k", "ts", 60).count() == 0

    empty_strat = spark.createDataFrame(
        [], StructType([
            StructField("id", LongType()),
            StructField("src", StringType()),
        ])
    )
    assert sampling.stratified_sample_rate(
        empty_strat, ["src"], "id", 10
    ).count() == 0


def test_session_operators_tolerate_empty_inputs(spark):
    """Degenerate sweep for this session's operators: EWMA, CUSUM,
    k-hop BFS — empty in, empty out, no exceptions."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from udacity_data_wrangling_osm_case_study_spark.operators import graph, temporal

    empty_ev = spark.createDataFrame(
        [], StructType([
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
            StructField("cents", LongType()),
            StructField("target_c", LongType()),
        ])
    )
    assert temporal.ewma_halving(
        empty_ev, "user_id", ["ts", "event_id"], "cents"
    ).count() == 0
    assert temporal.cusum(
        empty_ev, "user_id", ["ts", "event_id"], "cents", "target_c"
    ).count() == 0

    empty_e = spark.createDataFrame(
        [], StructType([
            StructField("src", LongType()),
            StructField("dst", LongType()),
        ])
    )
    seeds = spark.createDataFrame([(1,)], ["seed"])
    # seeds with no edges reach nothing: empty result, not an error
    assert graph.khop_reach(empty_e, seeds, k=2).count() == 0


def test_late_session_operators_tolerate_empty_inputs(spark):
    """Degenerate sweep for the late-session operators."""
    import pytest as _pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from udacity_data_wrangling_osm_case_study_spark.operators import (
        dedup,
        skew,
        stats,
        temporal,
    )

    empty_sh = spark.createDataFrame(
        [], StructType([
            StructField("id", LongType()),
            StructField("shingle", StringType()),
        ])
    )
    assert dedup.prefix_filter_pairs(empty_sh).count() == 0

    empty_kv = spark.createDataFrame(
        [], StructType([
            StructField("k", StringType()),
            StructField("v", LongType()),
            StructField("w", LongType()),
        ])
    )
    assert stats.histogram_median(empty_kv, "k", "v").count() == 0
    assert stats.histogram_median(empty_kv, "k", "v", weight="w").count() == 0
    # skew report over empty input: no key rows -> empty report
    assert skew.key_skew_report(empty_kv, "k").count() in (0, 1)

    with _pytest.raises(ValueError):
        temporal.ewma_halving(empty_kv, "k", ["v"], "w", lookback=63)
