"""Incremental-arrival attestation: files land WHILE the query runs,
across >=3 micro-batch rounds, including an out-of-order (late but
within-watermark) batch and a beyond-watermark batch for the
watermarked operators; results must exactly equal the batch twin's
one-shot answer (minus provably-dropped too-late rows).

test_streaming.py drives finite pre-staged sources (availableNow /
maxFilesPerTrigger) — every file is visible before the query starts,
so watermark advancement between arrivals, cross-batch state carry,
and late-row admission/drop are never individually exercised. Here
arrival order is controlled per batch:

- batch boundaries are real (``processAllAvailable`` between atomic
  file drops, so each drop is >=1 micro-batch against the PREVIOUS
  drop's watermark);
- one batch delivers rows out of order but above the watermark (must
  be admitted and merged into their still-open windows);
- one batch delivers a row provably below the watermark (must be
  dropped — asserted by showing the batch twin WITH that row differs);
- a two-sentinel flush pushes the watermark past every real window so
  append mode emits them all (the second sentinel exists because a
  watermark computed from batch N's data only takes effect in batch
  N+1).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.plans.registry import table
from udacity_data_wrangling_osm_case_study_spark.streaming import events_stream
from tests.conftest import SF_DIR


def _land(df, src_dir: str, tag: str) -> None:
    """Atomically drop one batch's parquet files into the source dir
    (write to a staging dir, then rename — the file stream source must
    never list a half-written file)."""
    tmp = tempfile.mkdtemp(prefix="land_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        i = 0
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                os.rename(
                    os.path.join(tmp, f),
                    os.path.join(src_dir, f"{tag}-{i}.parquet"),
                )
                i += 1
        assert i > 0, "batch produced no files"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _drive(spark, stream, name: str, mode: str, src_dir: str, batches):
    """Start the query on an (initially empty) source dir, land each
    batch while it runs, draining between drops; return the sink."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        for i, b in enumerate(batches):
            _land(b, src_dir, f"b{i}")
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _events_with_rank(spark):
    ev = table(spark, SF_DIR, "events")
    w = Window.orderBy("ts", "event_id")
    return ev.withColumn("_rn", F.row_number().over(w)).cache()


def _sentinel(spark, ev, offset: str, event_id: int):
    """One row at max(ts) + offset under a user id no real row has,
    so it advances the (global) watermark without touching any real
    key's state or merging into a real session."""
    return (
        ev.agg(F.max("ts").alias("ts"))
        .select(
            F.lit(event_id).cast("bigint").alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {offset}")).alias("ts"),
            F.lit(-1).cast("bigint").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )


COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_windowed_counts_incremental_late_and_droppped(spark, tmp_path):
    """Watermarked tumbling windows under controlled arrival: in-order
    prefix, an out-of-order-but-admissible batch, a beyond-watermark
    row (dropped), then the sentinel flush. The sink must equal the
    batch twin over exactly the admissible rows — and must DIFFER from
    the twin that includes the dropped row."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = _events_with_rank(spark)
    n = ev.count()
    n1, n2 = int(n * 0.4), int(n * 0.7)
    s1 = ev.filter(F.col("_rn") <= n1)
    # Hold back S1's last day (except the max row, which anchors the
    # watermark) — they arrive one batch late, above the watermark.
    s1_max = s1.agg(F.max("ts")).collect()[0][0]
    late_ok = s1.filter(
        (F.col("ts") > F.expr(f"TIMESTAMP '{s1_max}' - INTERVAL 1 DAY"))
        & (F.col("ts") < F.lit(s1_max))
    )
    held_ids = {r.event_id for r in late_ok.select("event_id").collect()}
    assert len(held_ids) >= 3, "need real out-of-order volume"
    b1 = s1.filter(~F.col("event_id").isin(held_ids)).select(COLS)
    b2 = (
        ev.filter((F.col("_rn") > n1) & (F.col("_rn") <= n2))
        .select(COLS)
        .unionByName(late_ok.select(COLS))
    )
    # A row at the global minimum ts lands in batch 3, when the
    # watermark (max(b2) - 2 days) is weeks past it: must be dropped.
    too_late = ev.orderBy("_rn").limit(1).select(
        F.lit(10**9).cast("bigint").alias("event_id"),
        "ts",
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    b3 = ev.filter(F.col("_rn") > n2).select(COLS).unionByName(too_late)
    b4 = _sentinel(spark, ev, "3 DAYS", 10**9 + 1)
    b5 = _sentinel(spark, ev, "3 DAYS + 1 HOUR", 10**9 + 2)

    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, src),
        window="6 hours",
        watermark="2 days",
    )
    got = _drive(
        spark, stream, "v_inc_win", "append", src, [b1, b2, b3, b4, b5]
    )

    want = events_stream.windowed_event_counts(
        ev.select(COLS), window="6 hours", watermark="2 days"
    )
    key = ["window_start", "event_type", "n", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    want_rows = sorted(map(tuple, want.select(key).collect()))
    assert len(got_rows) > 50
    assert got_rows == want_rows
    # Teeth: had the too-late row been admitted, the result would differ.
    with_late = events_stream.windowed_event_counts(
        ev.select(COLS).unionByName(too_late),
        window="6 hours",
        watermark="2 days",
    )
    assert got_rows != sorted(map(tuple, with_late.select(key).collect()))


def test_session_windows_incremental_out_of_order(spark, tmp_path):
    """Session windows under 3-batch arrival with an out-of-order
    admissible batch; sentinel flush closes every real session."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = _events_with_rank(spark)
    n = ev.count()
    n1, n2 = int(n * 0.4), int(n * 0.7)
    s1 = ev.filter(F.col("_rn") <= n1)
    s1_max = s1.agg(F.max("ts")).collect()[0][0]
    late_ok = s1.filter(
        (F.col("ts") > F.expr(f"TIMESTAMP '{s1_max}' - INTERVAL 1 DAY"))
        & (F.col("ts") < F.lit(s1_max))
    )
    held_ids = {r.event_id for r in late_ok.select("event_id").collect()}
    b1 = s1.filter(~F.col("event_id").isin(held_ids)).select(COLS)
    b2 = (
        ev.filter((F.col("_rn") > n1) & (F.col("_rn") <= n2))
        .select(COLS)
        .unionByName(late_ok.select(COLS))
    )
    b3 = ev.filter(F.col("_rn") > n2).select(COLS)
    b4 = _sentinel(spark, ev, "3 DAYS", 10**9 + 1)
    b5 = _sentinel(spark, ev, "3 DAYS + 1 HOUR", 10**9 + 2)

    stream = events_stream.session_window_stats(
        events_stream.read_events_stream(spark, src),
        gap="6 hours",
        watermark="2 days",
    )
    got = _drive(
        spark, stream, "v_inc_sess", "append", src, [b1, b2, b3, b4, b5]
    )
    want = events_stream.session_window_stats(
        ev.select(COLS), gap="6 hours", watermark="2 days"
    )
    key = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    want_rows = sorted(map(tuple, want.select(key).collect()))
    assert len(got_rows) > 10
    assert got_rows == want_rows


def test_running_counts_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState across 3 real micro-batches: the final
    per-user count equals the batch total, and users seen in multiple
    batches emitted MULTIPLE strictly-increasing snapshots (proof the
    state carried, not recomputed one-shot)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = _events_with_rank(spark)
    n = ev.count()
    thirds = [
        ev.filter(
            (F.col("_rn") > i * n // 3) & (F.col("_rn") <= (i + 1) * n // 3)
        ).select(COLS)
        for i in range(3)
    ]
    stream = events_stream.running_user_counts(
        events_stream.read_events_stream(spark, src)
    )
    got = _drive(spark, stream, "v_inc_run", "update", src, thirds)

    final = got.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # Every user appears in all three thirds at this density — so each
    # must have 3 distinct emitted snapshots, strictly increasing.
    snaps = got.groupBy("user_id").agg(
        F.count("*").alias("n_snaps"),
        (F.count("*") == F.count_distinct("n_events")).alias("increasing"),
    )
    assert snaps.filter(F.col("n_snaps") < 2).count() == 0
    assert snaps.filter(~F.col("increasing")).count() == 0


def test_stream_dedup_drops_cross_batch_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark across batches: batch 2 redelivers
    50 of batch 1's rows (ids still inside the state horizon) — all
    must be dropped; every original row survives exactly once."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = _events_with_rank(spark)
    n = ev.count()
    n1 = int(n * 0.6)
    b1 = ev.filter(F.col("_rn") <= n1).select(COLS)
    # Redeliver the 50 NEWEST rows of b1: their ts is within the 5-day
    # horizon of b1's max, so their keys are provably still in state.
    redelivered = (
        ev.filter(F.col("_rn") <= n1)
        .orderBy(F.desc("_rn"))
        .limit(50)
        .select(COLS)
    )
    b2 = (
        ev.filter((F.col("_rn") > n1) & (F.col("_rn") <= int(n * 0.8)))
        .select(COLS)
        .unionByName(redelivered)
    )
    b3 = ev.filter(F.col("_rn") > int(n * 0.8)).select(COLS)

    stream = events_stream.dedup_events_stream(
        events_stream.read_events_stream(spark, src), watermark="5 days"
    )
    got = _drive(spark, stream, "v_inc_dedup", "append", src, [b1, b2, b3])
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_stream_stream_join_matches_across_batches(spark, tmp_path):
    """Interval join where every click arrives one batch BEFORE its
    purchase: matches must come from the buffered click state, and the
    pair set must equal the batch twin exactly."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = table(spark, SF_DIR, "events")
    b1 = ev.filter(F.col("event_type") == "click")
    b2 = ev.filter(F.col("event_type") == "purchase")
    b3 = ev.filter(~F.col("event_type").isin("click", "purchase"))

    stream = events_stream.click_purchase_pairs(
        events_stream.read_events_stream(spark, src)
    )
    got = _drive(spark, stream, "v_inc_ssj", "append", src, [b1, b2, b3])
    got_rows = sorted(
        map(tuple, got.select("purchase_id", "click_id").collect())
    )
    want = events_stream.click_purchase_pairs(ev)
    want_rows = sorted(
        map(tuple, want.select("purchase_id", "click_id").collect())
    )
    assert len(want_rows) > 0
    assert got_rows == want_rows


def test_windowed_counts_survive_query_restart(spark, tmp_path):
    """Exactly-once across restart: a watermarked windowed aggregation
    writes through the transactional parquet file sink with a
    checkpoint; the query is STOPPED mid-stream and a new query object
    resumes from the same checkpoint. Open windows straddling the stop
    must merge correctly from recovered state, already-committed
    batches must not replay into the sink, and the final files must
    equal the batch twin exactly."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = _events_with_rank(spark)
    n = ev.count()
    n1, n2 = int(n * 0.4), int(n * 0.7)
    b1 = ev.filter(F.col("_rn") <= n1).select(COLS)
    b2 = ev.filter((F.col("_rn") > n1) & (F.col("_rn") <= n2)).select(COLS)
    b3 = ev.filter(F.col("_rn") > n2).select(COLS)
    b4 = _sentinel(spark, ev, "3 DAYS", 10**9 + 1)
    b5 = _sentinel(spark, ev, "3 DAYS + 1 HOUR", 10**9 + 2)

    def start():
        stream = events_stream.windowed_event_counts(
            events_stream.read_events_stream(spark, src),
            window="6 hours",
            watermark="2 days",
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q1 = start()
    try:
        _land(b1, src, "b0")
        q1.processAllAvailable()
        _land(b2, src, "b1")
        q1.processAllAvailable()
    finally:
        q1.stop()

    q2 = start()  # fresh query object, same checkpoint
    try:
        for i, b in enumerate((b3, b4, b5), start=2):
            _land(b, src, f"b{i}")
            q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(out)
    want = events_stream.windowed_event_counts(
        ev.select(COLS), window="6 hours", watermark="2 days"
    )
    key = ["window_start", "event_type", "n", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    want_rows = sorted(map(tuple, want.select(key).collect()))
    assert len(got_rows) > 50
    assert got_rows == want_rows


def test_custom_state_survives_query_restart(spark, tmp_path):
    """GroupState (applyInPandasWithState) recovery — a different
    checkpoint codepath than built-in window state: per-user running
    counts accumulate across TWO query incarnations sharing one
    checkpoint. If state were lost at restart, the post-restart
    snapshots would equal the final batch's own counts; they must
    instead equal the full-stream totals."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(out)
    ev = _events_with_rank(spark)
    n = ev.count()
    thirds = [
        ev.filter(
            (F.col("_rn") > i * n // 3) & (F.col("_rn") <= (i + 1) * n // 3)
        ).select(COLS)
        for i in range(3)
    ]

    def sink(batch_df, batch_id):
        batch_df.withColumn("_b", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    def start():
        stream = events_stream.running_user_counts(
            events_stream.read_events_stream(spark, src)
        )
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .start()
        )

    q1 = start()
    try:
        _land(thirds[0], src, "b0")
        q1.processAllAvailable()
        _land(thirds[1], src, "b1")
        q1.processAllAvailable()
    finally:
        q1.stop()

    q2 = start()  # same checkpoint, fresh query + state store handles
    try:
        _land(thirds[2], src, "b2")
        q2.processAllAvailable()
    finally:
        q2.stop()

    snaps = spark.read.parquet(out)
    final = snaps.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # Teeth: state genuinely crossed the restart — the post-restart
    # snapshot exceeds what batch 3 alone could produce for every user.
    last = snaps.filter(F.col("_b") == snaps.agg(F.max("_b")).collect()[0][0])
    b3_only = thirds[2].groupBy("user_id").agg(F.count("*").alias("n3"))
    joined = last.join(b3_only, "user_id")
    assert joined.filter(F.col("n_events") <= F.col("n3")).count() == 0
