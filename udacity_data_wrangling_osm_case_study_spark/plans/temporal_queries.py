"""Temporal-join queries: as-of attribution and banded range joins —
operator classes the reference lacks entirely (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import temporal
from udacity_data_wrangling_osm_case_study_spark.plans.registry import register, table


@register(
    "purchase_click_attribution",
    """
    WITH purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, event_id AS click_id FROM events
        WHERE event_type = 'click'
    )
    SELECT p.event_id, c.click_id AS attributed_click
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts < p.ts
    ORDER BY p.event_id
    """,
)
def purchase_click_attribution(spark, sf_dir):
    """AS-OF join: each purchase attributed to the user's latest
    strictly-earlier click. Implemented via union + ordered window
    (one shuffle on the user key — sort-merge-join cost); the oracle is
    DuckDB's native ASOF JOIN, so the match also validates the pattern
    against a first-class implementation."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = temporal.asof_join(
        purchases, clicks, key="user_id", time_col="ts",
        left_val="event_id", right_val="event_id",
    )
    return out.select(
        "event_id", F.col("asof_event_id").alias("attributed_click")
    ).orderBy("event_id")


@register(
    "error_followup_pairs",
    """
    WITH errors AS (
        SELECT user_id, ts, event_id AS error_id FROM events
        WHERE event_type = 'error'
    ),
    followups AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type <> 'error'
    )
    SELECT e.error_id, f.event_id AS followup_id, f.event_type AS followup_type,
           CAST((epoch_us(f.ts) - epoch_us(e.ts)) // 1000000 AS BIGINT)
               AS gap_seconds
    FROM errors e
    JOIN followups f
      ON e.user_id = f.user_id
     AND f.ts > e.ts
     AND epoch_us(f.ts) <= epoch_us(e.ts) + 300 * 1000000
    ORDER BY error_id, followup_id
    """,
)
def error_followup_pairs(spark, sf_dir):
    """Range (interval) join: every non-error event within 5 minutes
    AFTER an error by the same user. Banded by 5-minute time buckets so
    candidates never exceed per-bucket products; the oracle uses the
    naive inequality join — same rows."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    )
    followups = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id", "event_type"
    )
    joined = temporal.range_join(
        errors, followups, key="user_id", time_col="ts", max_gap_seconds=300
    )
    return joined.select(
        F.col("l_error_id").alias("error_id"),
        F.col("r_event_id").alias("followup_id"),
        F.col("r_event_type").alias("followup_type"),
        "gap_seconds",
    ).orderBy("error_id", "followup_id")
