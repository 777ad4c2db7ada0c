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
