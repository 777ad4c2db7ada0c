"""Unit tests for the temporal join operators on hand-built frames."""

from __future__ import annotations

from datetime import datetime

from udacity_data_wrangling_osm_case_study_spark.operators import temporal


def _ts(minute: int):
    return datetime(2024, 1, 1, 0, minute)


def test_asof_join_latest_strictly_earlier(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 200)],
        ["user_id", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 900), (1, _ts(10 + 5), 901), (1, _ts(29), 902), (3, _ts(1), 999)],
        ["user_id", "ts", "event_id"],
    )
    got = {
        r.event_id: r.asof_event_id
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "event_id", "event_id"
        ).collect()
    }
    # 100 @10 → latest earlier click is 900 @9
    # 101 @30 → 902 @29; user 2 has no prior right row → NULL
    assert got == {100: 900, 101: 902, 200: None}


def test_range_join_banded(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 10)], ["user_id", "ts", "error_id"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0), 20),   # same instant → excluded (strictly after)
            (1, _ts(3), 21),   # within 5 min
            (1, _ts(5), 22),   # exactly at the bound → included (<=)
            (1, _ts(6), 23),   # beyond → excluded
            (2, _ts(3), 24),   # other key → excluded
        ],
        ["user_id", "ts", "event_id"],
    )
    rows = temporal.range_join(
        left, right, key="user_id", time_col="ts", max_gap_seconds=300
    ).collect()
    got = {(r.l_error_id, r.r_event_id): r.gap_seconds for r in rows}
    assert got == {(10, 21): 180, (10, 22): 300}


def test_resample_locf_fills_gaps(spark):
    from pyspark.sql import functions as F

    # key 1 observed in minute-buckets 0 and 3 (gap at 1, 2)
    df = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(3), 30), (2, _ts(5), 50)],
        ["k", "ts", "v"],
    ).withColumn("agg_v", F.col("v").cast("decimal(18,2)"))
    out = temporal.resample_locf(
        df, key="k", time_col="ts", bucket_seconds=60
    )
    rows = {
        (r.k, r.b): (r.n_obs, None if r.filled_agg_v is None else int(r.filled_agg_v))
        for r in out.collect()
    }
    base = _ts(0).timestamp() // 60
    # dense grid per key, zero-count gap buckets carry the last value
    assert rows[(1, base + 0)] == (1, 10)
    assert rows[(1, base + 1)] == (0, 10)
    assert rows[(1, base + 2)] == (0, 10)
    assert rows[(1, base + 3)] == (1, 30)
    assert rows[(2, base + 5)] == (1, 50)
    assert len(rows) == 5  # key 2's grid spans only its own range


def test_interval_concurrency_sweep(spark):
    # overlapping, touching, and zero-length intervals
    iv = spark.createDataFrame(
        [
            (_ts(0), _ts(10)),   # A
            (_ts(5), _ts(15)),   # B overlaps A
            (_ts(15), _ts(20)),  # C touches B's end → concurrent at 15
            (_ts(30), _ts(30)),  # D zero-length
        ],
        ["st", "en"],
    )
    out = temporal.interval_concurrency(iv, "st", "en")
    by_key = {(r.ep_us, r.is_start): r.concurrency for r in out.collect()}
    us = lambda m: int(_ts(m).timestamp() * 1_000_000)
    assert by_key[(us(0), True)] == 1
    assert by_key[(us(5), True)] == 2     # A and B open
    assert by_key[(us(10), False)] == 1   # A closed
    assert by_key[(us(15), True)] == 2    # C opens BEFORE B's end processes
    assert by_key[(us(15), False)] == 1
    assert by_key[(us(30), True)] == 1    # zero-length opens...
    assert by_key[(us(30), False)] == 0   # ...then closes, never negative


def test_ewma_halving_exact_weights(spark):
    # user 1: values 100, 200, 400 → ewma folds with weights 2^i
    df = spark.createDataFrame(
        [(1, _ts(0), 1, 100), (1, _ts(1), 2, 200), (1, _ts(2), 3, 400)],
        ["user_id", "ts", "event_id", "cents"],
    )
    out = temporal.ewma_halving(
        df, key="user_id", order_cols=["ts", "event_id"],
        value_col="cents", lookback=16,
    )
    got = {r.event_id: (r.n_window, r.ewma_num, r.ewma_den) for r in out.collect()}
    # row 1: [100] → num 100·1, den 1
    # row 2: [100, 200] → 100·1 + 200·2 = 500, den 3
    # row 3: [100, 200, 400] → 100 + 400 + 1600 = 2100, den 7
    assert got == {1: (1, 100, 1), 2: (2, 500, 3), 3: (3, 2100, 7)}


def test_ewma_halving_truncates_lookback(spark):
    rows = [(1, _ts(i), i, 10) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "cents"])
    out = temporal.ewma_halving(
        df, key="user_id", order_cols=["ts", "event_id"],
        value_col="cents", lookback=3,
    )
    last = {r.event_id: (r.n_window, r.ewma_num, r.ewma_den) for r in out.collect()}[5]
    # constant input: trailing window [10,10,10] → num 10·(1+2+4)=70, den 7
    assert last == (3, 70, 7)


def test_cusum_matches_recursive_definition(spark):
    # hand-computed: target 5, values 9, 1, 9, 9, 1
    # dev: 4, -4, 4, 4, -4 → S: 4, 0, 4, 8, 4
    rows = [(1, _ts(i), i, v, 5) for i, v in enumerate([9, 1, 9, 9, 1])]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "cents", "target_c"]
    )
    out = temporal.cusum(
        df, key="user_id", order_cols=["ts", "event_id"],
        value_col="cents", target_col="target_c",
    )
    got = [r.cusum_stat for r in out.orderBy("event_id").collect()]
    assert got == [4, 0, 4, 8, 4]


def test_cusum_never_negative_and_resets(spark):
    # long negative run pins S at 0; positive burst climbs from 0
    vals = [1, 1, 1, 9, 9]
    rows = [(1, _ts(i), i, v, 5) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "cents", "target_c"]
    )
    out = temporal.cusum(
        df, key="user_id", order_cols=["ts", "event_id"],
        value_col="cents", target_col="target_c",
    )
    got = [r.cusum_stat for r in out.orderBy("event_id").collect()]
    assert got == [0, 0, 0, 4, 8]


def test_resample_interp_exact_rational(spark):
    # user 1: observed buckets 0 (sum 100) and 3 (sum 400) → gap at
    # buckets 1, 2 interpolates the line 100→400 as exact rationals
    df = spark.createDataFrame(
        [
            (1, _ts(10), 100),
            (1, datetime(2024, 1, 1, 3, 5), 400),
        ],
        ["user_id", "ts", "cents"],
    )
    out = temporal.resample_interp(
        df, key="user_id", time_col="ts", value_col="cents",
        bucket_seconds=3600,
    )
    rows = {r.b: (r.n_obs, r.interp_num, r.interp_den) for r in out.collect()}
    base = rows[min(rows)]
    assert base == (1, 100, 1)
    b0 = min(rows)
    # gap bucket b0+1: 100*(3-1) + 400*(1-0) = 600 over den 3 → 200
    assert rows[b0 + 1] == (0, 600, 3)
    assert rows[b0 + 2] == (0, 900, 3)
    assert rows[b0 + 3] == (1, 400, 1)


def test_resample_interp_multiple_obs_per_bucket(spark):
    # two observations land in one bucket → n_obs 2, summed value, den 1
    df = spark.createDataFrame(
        [(7, _ts(1), 10), (7, _ts(2), 15)], ["user_id", "ts", "cents"]
    )
    out = temporal.resample_interp(
        df, key="user_id", time_col="ts", value_col="cents",
        bucket_seconds=3600,
    ).collect()
    assert len(out) == 1
    assert (out[0].n_obs, out[0].interp_num, out[0].interp_den) == (2, 25, 1)


def test_value_band_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i % 3, i, rng.randrange(0, 1000)) for i in range(80)],
        ["g", "lid", "v"],
    )
    right = spark.createDataFrame(
        [(i % 3, i, rng.randrange(0, 1000)) for i in range(60)],
        ["g", "rid", "w"],
    )
    got = {
        (r.l_lid, r.r_rid)
        for r in temporal.value_band_join(
            left, right, keys=["g"], left_val="v", right_val="w", max_diff=37
        ).collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    want = {
        (a.lid, b.rid)
        for a in lrows
        for b in rrows
        if a.g == b.g and abs(a.v - b.w) <= 37
    }
    assert got == want and len(want) > 0


def test_value_band_join_negative_values(spark):
    # floor-division bucketing must stay consistent below zero
    left = spark.createDataFrame([(0, 1, -5), (0, 2, -100)], ["g", "lid", "v"])
    right = spark.createDataFrame([(0, 9, 4), (0, 8, -94)], ["g", "rid", "w"])
    got = {
        (r.l_lid, r.r_rid)
        for r in temporal.value_band_join(
            left, right, keys=["g"], left_val="v", right_val="w", max_diff=10
        ).collect()
    }
    assert got == {(1, 9), (2, 8)}


def test_user_activity_gaps_span_cap(spark, tmp_path):
    """The opt-in max_span_days cap bounds the per-user calendar spine
    (gap metrics over the first N span days only) and reports the cut
    via truncated_days; default (None) output is unchanged in schema
    and values."""
    from udacity_data_wrangling_osm_case_study_spark.plans.temporal_queries import (
        user_activity_gaps,
    )

    sf = str(tmp_path)
    # user 1: events on day 0 and day 9 (10-day span, 8 gap days);
    # user 2: single day (no gaps, cap is a no-op)
    spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 12)),
            (1, datetime(2024, 1, 10, 12)),
            (2, datetime(2024, 1, 5, 0)),
        ],
        ["user_id", "ts"],
    ).write.parquet(f"{sf}/events.parquet")

    base = {r.user_id: r for r in user_activity_gaps(spark, sf).collect()}
    assert "truncated_days" not in base[1].asDict()
    assert (base[1].n_active_days, base[1].n_gap_days, base[1].max_gap_len) == (
        2, 8, 8
    )

    capped = {
        r.user_id: r
        for r in user_activity_gaps(spark, sf, max_span_days=4).collect()
    }
    # window = days 1-4: day 1 active, days 2-4 missing; 6 span days cut
    r1 = capped[1]
    assert (r1.n_gap_days, r1.max_gap_len, r1.truncated_days) == (3, 3, 6)
    assert (capped[2].n_gap_days, capped[2].truncated_days) == (0, 0)


class TestExactFloorDivWitnesses:
    """Round-11 timestamp-fuzz fixes (the 1t campaign's first finds).

    Two defect classes in ``floor(unix_micros(ts) / bucket_us)``:

    1. Engine split on negative epochs — the LIVE one (caught as a
       grid-length-off-by-one by fuzz variant 1t's ±100-year shifts):
       the DuckDB oracles bucketed with ``epoch_us // d``, which
       truncates toward zero and splits the hour straddling epoch 0,
       while Spark's floor() floors.
    2. DOUBLE division past 2^53 µs (epochs beyond ~year 2255): the
       LONG→DOUBLE cast rounds the epoch itself, so an instant 1 µs
       below an hour boundary lands ON the boundary and misbuckets
       into the next hour. Unreachable by the ±100-year fuzz shifts
       today, closed defensively by the same fix.

    Both sides now use exact integer FLOOR division
    (operators.temporal.exact_floor_div / the positive-mod SQL form).
    """

    def test_double_floor_defect_is_real_past_2_53(self):
        # the arithmetic fact the defensive half of the fix rests on:
        # past 2^53 µs the LONG->DOUBLE cast itself rounds k*d-1 up to
        # exactly k*d, so cast-then-floor-divide misbuckets
        import math

        d = 3_600_000_000                     # 1 hour in microseconds
        k = 2_600_000                         # ~year 2266 in epoch hours
        ep = k * d - 1                        # 1 µs before the boundary
        assert float(ep) == float(k * d)      # the cast rounds UP
        assert math.floor(float(ep) / d) == k  # the double-path defect
        assert ep // d == k - 1               # exact integer truth

    def test_boundary_instant_buckets_into_earlier_hour(self, spark):
        import pyspark.sql.functions as F

        from udacity_data_wrangling_osm_case_study_spark.operators.temporal import (
            exact_floor_div,
        )

        d = 3_600_000_000
        k = 473_364
        long_min, long_max = -(2**63), 2**63 - 1
        eps = [k * d - 1, k * d, k * d + 1, -1, 0, 1, -d, -d - 1, -d + 1,
               # ADVICE r11: col - pmod(col, d) in BIGINT overflows for
               # col within d of LONG_MIN (the floor multiple lies
               # below LONG_MIN) — the cast must widen BEFORE the
               # subtraction. LONG_MAX pins the other extreme.
               long_min, long_min + 1, long_min + d - 1, long_max]
        df = spark.createDataFrame([(e,) for e in eps], ["ep"])
        got = {
            r.ep: r.b
            for r in df.select("ep", exact_floor_div(F.col("ep"), d).alias("b"))
            .collect()
        }
        assert got == {e: e // d for e in eps}  # Python // is exact floor

    def test_resample_grid_exact_on_pre_1970_instants(self, spark):
        """A key spanning 23:30 Dec 31 1969 -> 00:30 Jan 1 1970 has
        exactly TWO hourly buckets (-1 and 0); truncating division
        collapses both instants into bucket 0 and emits a 1-bucket
        grid — the off-by-one row count fuzz variant 1t caught."""
        from datetime import datetime

        import pyspark.sql.functions as F

        from udacity_data_wrangling_osm_case_study_spark.operators import temporal

        df = spark.createDataFrame(
            [
                (7, datetime(1969, 12, 31, 23, 30), 100),
                (7, datetime(1970, 1, 1, 0, 30), 200),
            ],
            ["user_id", "ts", "cents"],
        )
        out = temporal.resample_interp(
            df, key="user_id", time_col="ts", value_col="cents",
            bucket_seconds=3600,
        ).orderBy("b").collect()
        assert [(r.b, r.n_obs) for r in out] == [(-1, 1), (0, 1)]

    def test_wide_span_resample_completes_linear(self, spark):
        """The quadratic-frame witness: pre-fix, the forward carry used
        a [currentRow, unboundedFollowing] frame that Spark re-evaluates
        from scratch per row — O(grid²) per key. A 20-year span (175k
        hourly buckets from one ±100-year-shifted outlier instant, the
        1t mutation) needed ~3e10 aggregate updates and ran for HOURS
        (the campaign stall this fix came from); the reversed growing
        frame is incremental and finishes in seconds. The 120 s ceiling
        is ~50x the post-fix cost and ~100x below the pre-fix cost."""
        import time
        from datetime import datetime

        from udacity_data_wrangling_osm_case_study_spark.operators import temporal

        rows = [(1, datetime(2004, 1, 1, 0, 0, 30), 100)] + [
            (1, datetime(2024, 1, 1, h, 0, 30), 100 + h) for h in range(8)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "cents"])
        t0 = time.time()
        out = temporal.resample_interp(
            df, key="user_id", time_col="ts", value_col="cents",
            bucket_seconds=3600,
        )
        n = out.count()
        took = time.time() - t0
        assert n == 175_328, n  # 20 years incl. 5 leap days, +7h, +1
        assert took < 120, f"quadratic window frame is back: {took:.0f}s"
