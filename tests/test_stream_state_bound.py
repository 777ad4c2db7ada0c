"""State-size attestation: the scale claim for the watermarked
streaming operators is "constant-size state" — eviction keeps the
state store proportional to the watermark HORIZON, not to total input.
Until now that was asserted from the operators' construction (the
watermark clause exists) but never MEASURED. These tests stream many
micro-batches of steadily-advancing event time through each operator
and read the state-store metrics (``stateOperators[].numRowsTotal`` /
``numRowsRemoved``) from the query progress after every batch:

- cumulative input grows linearly (every batch adds rows — and for the
  dedup operator every key is globally unique, the worst case for any
  distinct-like state);
- state-store rows PLATEAU after the warm-up horizon instead of
  tracking cumulative input — the late-stream state must stay within a
  small factor of the early-steady-state level and well under the
  total number of keys ever inserted;
- eviction is observed directly (``numRowsRemoved`` > 0), not inferred.

On a 100 TB / weeks-long stream this is the difference between a
state store that holds a bounded horizon and one that holds the whole
history and OOMs the cluster; a regression that drops the watermark
(or stops wiring it into the stateful operator) trips these tests
immediately.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.streaming import events_stream

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
TYPES = ["click", "view", "purchase", "error"]
ROWS = 200
USERS = 25
BATCHES = 10
BATCH_SPAN_MIN = 10  # each batch advances event time by 10 minutes


def _mk_batch(spark, i: int, span_sec: int = 600):
    """Batch i: ROWS rows inside the first ``span_sec`` seconds of
    minutes [10*i, 10*i+10), globally unique event_ids, a fixed small
    user/type population. Deterministic — no wall clock anywhere. The
    default span fills the whole slot; a short span leaves an event-time
    silence before the next batch (needed to let session windows CLOSE:
    back-to-back batches otherwise merge into one endless session per
    user and nothing ever emits)."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (
            i * ROWS + j,
            base
            + dt.timedelta(
                minutes=BATCH_SPAN_MIN * i, seconds=(3 * j) % span_sec
            ),
            j % USERS,
            TYPES[j % len(TYPES)],
            float(j % 7),
            None,
        )
        for j in range(ROWS)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _land(df, src_dir: str, tag: str) -> None:
    tmp = tempfile.mkdtemp(prefix="land_state_")
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
        assert i > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _soak(spark, build_stream, name: str, mode: str, tmp_path,
          span_sec=600, provider: str | None = None):
    """Land BATCHES batches while the query runs; return per-batch
    (state_rows_total, rows_removed) plus the sink and the final
    progress's state-operator entries (for provider metrics). When
    ``provider`` is given the state-store provider conf is set for the
    query and restored afterwards (session-shared fixture — a leaked
    conf would silently flip every later streaming test's store)."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    prior = spark.conf.get(_PROVIDER_CONF, None)
    state_rows, removed, last_ops = [], [], []
    q = None
    # Everything from the conf set onward sits inside the try: if
    # build_stream() or start() raises, the finally still restores the
    # provider conf (session-shared fixture — a leaked RocksDB conf
    # would silently flip every later streaming test's state store).
    try:
        if provider:
            spark.conf.set(_PROVIDER_CONF, provider)
        stream = build_stream(spark.readStream.schema(SCHEMA).parquet(src))
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        for i in range(BATCHES):
            _land(_mk_batch(spark, i, span_sec), src, f"b{i}")
            q.processAllAvailable()
            p = q.lastProgress
            last_ops = p["stateOperators"]
            assert last_ops, f"{name}: no stateful operator in progress"
            state_rows.append(sum(op["numRowsTotal"] for op in last_ops))
            removed.append(
                sum(op.get("numRowsRemoved", 0) for op in last_ops)
            )
    finally:
        if q is not None:
            q.stop()
        if provider:
            if prior is None:
                spark.conf.unset(_PROVIDER_CONF)
            else:
                spark.conf.set(_PROVIDER_CONF, prior)
    return state_rows, removed, spark.table(name), last_ops


def _assert_bounded(name: str, state_rows, removed, expect_removed=True):
    """The shared bound: state plateaus after warm-up while input keeps
    growing, and eviction is directly observed. ``expect_removed=False``
    for sessionWindowStateStoreSaveExec, which rewrites each key's
    session list in place and reports 0 in ``numRowsRemoved`` even as
    closed sessions leave the store — there the plateau itself (25
    sessions retained out of 250 inserted) is the eviction proof."""
    # warm-up = the first ~2 horizons; steady state = everything after
    steady = state_rows[4:]
    assert max(steady) <= 2 * min(steady), (
        f"{name}: state not plateaued: {state_rows}"
    )
    # the final state must not track cumulative insertions
    assert state_rows[-1] <= state_rows[3] * 2, (
        f"{name}: late state exceeds early steady level: {state_rows}"
    )
    if expect_removed:
        assert sum(removed) > 0, (
            f"{name}: watermark never evicted a state row: removed={removed}"
        )


def test_dedup_state_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark under the WORST input for any
    distinct-like operator: every event_id globally unique, so a naive
    distinct would hold all 2000 keys. The horizon-bounded store must
    settle near the keys of ~2 batches and must have evicted most of
    the inserted keys by the end — while the sink still emits every
    (unique) row exactly once."""
    state_rows, removed, sink, _ = _soak(
        spark,
        lambda src: events_stream.dedup_events_stream(src, watermark="10 minutes"),
        "state_bound_dedup",
        "append",
        tmp_path,
    )
    _assert_bounded("dedup", state_rows, removed)
    total_keys = BATCHES * ROWS
    assert state_rows[-1] <= total_keys // 2, (state_rows, total_keys)
    # exactly-once emission is preserved while state is evicted
    assert sink.count() == total_keys
    assert sink.select("event_id").distinct().count() == total_keys


def test_windowed_counts_state_bounded(spark, tmp_path):
    """Watermarked tumbling windows: state is (open window x type); as
    the watermark passes each 5-minute window it must be emitted and
    evicted, so state stays at a few horizons' worth of windows while
    10 batches x 2 windows/batch x 4 types accumulate in the sink."""
    state_rows, removed, sink, _ = _soak(
        spark,
        lambda src: events_stream.windowed_event_counts(
            src, window="5 minutes", watermark="10 minutes"
        ),
        "state_bound_windows",
        "append",
        tmp_path,
    )
    _assert_bounded("windowed_counts", state_rows, removed)
    # emitted (closed) windows keep accumulating in the sink even
    # though state stays flat — growth lives in the SINK, not the store
    emitted = sink.count()
    assert emitted >= (BATCHES - 3) * (BATCH_SPAN_MIN // 5) * len(TYPES)
    # every emitted window count is a full window's worth of rows
    per_window = ROWS // (BATCH_SPAN_MIN // 5)
    assert (
        sink.groupBy("window_start").agg(F.sum("n").alias("n")).where(
            F.col("n") != per_window
        ).count()
        == 0
    )


def test_session_window_state_bounded(spark, tmp_path):
    """Native session windows: with a 2-minute gap inside 10-minute
    batches every user's session closes within the batch, so the store
    must hold only the sessions still inside the watermark horizon —
    not one open session per user forever, and never the full session
    history that accumulates in the sink."""
    state_rows, removed, sink, _ = _soak(
        spark,
        lambda src: events_stream.session_window_stats(
            src, gap="2 minutes", watermark="10 minutes"
        ),
        "state_bound_sessions",
        "append",
        tmp_path,
        # events fill only the first 2 minutes of each 10-minute slot —
        # the 8-minute event-time silence exceeds the gap, so every
        # user's session closes each batch instead of merging forever
        span_sec=120,
    )
    _assert_bounded("session_windows", state_rows, removed, expect_removed=False)
    # the store retains only OPEN sessions (~one per user), not the
    # 25-per-batch session history, which accumulates in the sink
    assert state_rows[-1] <= USERS * 2, state_rows
    assert sink.count() >= (BATCHES - 2) * USERS
    assert sink.count() > state_rows[-1]
    assert sink.where(F.col("n_events") <= 0).count() == 0


def test_dedup_state_bounded_rocksdb(spark, tmp_path):
    """The same worst-case dedup soak on the RocksDB state-store
    provider — the cluster posture at scale, where the default
    HDFS-backed store's in-executor-memory maps are the OOM risk the
    bound exists to prevent. The provider must actually engage (RocksDB
    custom metrics present in the progress), the horizon bound must
    hold identically, and emission must stay exactly-once."""
    state_rows, removed, sink, last_ops = _soak(
        spark,
        lambda src: events_stream.dedup_events_stream(src, watermark="10 minutes"),
        "state_bound_dedup_rocks",
        "append",
        tmp_path,
        provider=ROCKSDB_PROVIDER,
    )
    assert any(
        "rocksdb" in k.lower()
        for op in last_ops
        for k in op.get("customMetrics", {})
    ), "RocksDB provider did not engage"
    _assert_bounded("dedup_rocksdb", state_rows, removed)
    total_keys = BATCHES * ROWS
    assert state_rows[-1] <= total_keys // 2, (state_rows, total_keys)
    assert sink.count() == total_keys
    assert sink.select("event_id").distinct().count() == total_keys
    # the conf restore held — later streaming tests get the default store
    assert (
        spark.conf.get(_PROVIDER_CONF, None) in (None, "")
        or "RocksDB" not in spark.conf.get(_PROVIDER_CONF)
    )
