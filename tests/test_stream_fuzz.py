"""Adversarial-data fuzzing of the streaming operators (round-10,
VERDICT item 3).

tools/fuzz_oracle.py hardened the 253 BATCH queries against seeded
hostile data; the streaming twins (watermarked windows, session
windows, dropDuplicatesWithinWatermark, the stream-stream interval
join) had only ever seen the clean events table. This drives the
test_stream_incremental arrival harness (real micro-batches landed
while the query runs, an out-of-order-but-admissible batch, sentinel
watermark flushes) over seeded fuzz variants:

- ``null_heavy``: value/props/event_type NULLed at high rates (NULL
  grouping keys, NULL measures inside streaming aggregation state);
- ``hostile_strings``: event_type/props drawn from the batch fuzzer's
  hostile pool (CJK, delimiters, metacharacters, newlines, 500-char
  blobs) — state-store keys and filters under hostile bytes;
- ``dup_flood``: 50% of rows re-delivered 2 extra times (same
  event_id, same ts), scattered into the same AND the following batch
  — the replayed-source ingest storm;
- ``ts_attack`` (round-11, VERDICT item 4): the batch fuzzer's
  timestamp dimension driven through the streaming state machinery —
  whole-second snaps, exact 6-hour window-BOUNDARY instants (the
  window size the tests use, so rows sit exactly on open/close
  edges), duplicate event-time instants (which the arrival program's
  ts-ordered split scatters across micro-batch boundaries — ordering
  ties inside the state store), and ±hours jitter with microsecond
  residue. Event times stay non-null per the contract. The r10
  sessionization bug was exactly this class in batch.

Assertions per test: after EVERY micro-batch the sink is a subset of
the batch twin (append mode must never emit a row the one-shot batch
answer doesn't contain), and after the sentinel flush the sink EQUALS
the batch twin. Parametrized over two independent seeds.

The mutation contract mirrors the batch fuzzer: event_id and user_id
stay intact (identity is a declared precondition); ``ts_attack``
relaxes exactly the timestamp dimension the way the batch fuzzer's
``Nt`` variants do — instants mutate but stay NON-NULL; everything
else is prey.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.plans.registry import table
from udacity_data_wrangling_osm_case_study_spark.streaming import events_stream
from tests.conftest import SF_DIR
from tests.test_stream_incremental import COLS, _land, _sentinel

HOSTILE = [
    "",
    "   ",
    "沙田正街",
    "a|b|c|d",
    "line\nbreak\ttab",
    "O'Brien \"quoted\" %_\\like",
    "x" * 500,
]


def _fuzz_events(spark, seed: int, variant: str):
    """Seeded adversarial copy of the sf0.001 events table (1000 rows,
    30 days). Returns a batch DataFrame with the events schema."""
    pdf = table(spark, SF_DIR, "events").toPandas()
    rng = np.random.RandomState(seed)
    n = len(pdf)
    if variant == "null_heavy":
        pdf.loc[rng.rand(n) < 0.5, "value"] = None
        pdf.loc[rng.rand(n) < 0.5, "props"] = None
        pdf.loc[rng.rand(n) < 0.25, "event_type"] = None
    elif variant == "hostile_strings":
        hot = rng.rand(n) < 0.35
        pdf.loc[hot, "event_type"] = [
            HOSTILE[i] for i in rng.randint(len(HOSTILE), size=int(hot.sum()))
        ]
        hot2 = rng.rand(n) < 0.35
        pdf.loc[hot2, "props"] = [
            HOSTILE[i] for i in rng.randint(len(HOSTILE), size=int(hot2.sum()))
        ]
    elif variant == "dup_flood":
        dups = pdf[rng.rand(n) < 0.5]
        pdf = (
            __import__("pandas")
            .concat([pdf, dups, dups], ignore_index=True)
            .sort_values(["ts", "event_id"], kind="stable")
            .reset_index(drop=True)
        )
    elif variant == "ts_attack":
        pd = __import__("pandas")
        r = rng.rand(n)
        ts = pdf["ts"].copy()
        snap = r < 0.15
        ts[snap] = ts[snap].dt.floor("s")
        # exact window-boundary instants for the 6-hour windows below
        bound = (r >= 0.15) & (r < 0.30)
        ts[bound] = ts[bound].dt.floor("6h")
        # duplicate instants: adopt the previous row's event time
        dup = (r >= 0.30) & (r < 0.45)
        dup[0] = False
        ts[dup] = ts.shift(1)[dup]
        jit = (r >= 0.45) & (r < 0.60)
        nj = int(jit.sum())
        ts[jit] = ts[jit] + pd.to_timedelta(
            rng.randint(-6 * 3600, 6 * 3600, nj), unit="s"
        ) + pd.to_timedelta(rng.randint(0, 1_000_000, nj), unit="us")
        pdf["ts"] = ts
    else:
        raise ValueError(variant)
    return spark.createDataFrame(
        pdf,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )


def _nsorted(rows):
    """Sort tuples that may contain None (Python tuples with None
    don't order; rows with NULL keys are exactly what this fuzz
    produces)."""
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _arrival_program(spark, ev):
    """The incremental harness's canonical program: time-ordered 40/30/30
    split with one day of batch 1 held back into batch 2 (out of order
    but above the watermark), then two watermark-flush sentinels."""
    w = Window.orderBy("ts", "event_id")
    ev = ev.withColumn("_rn", F.row_number().over(w)).cache()
    n = ev.count()
    n1, n2 = int(n * 0.4), int(n * 0.7)
    s1 = ev.filter(F.col("_rn") <= n1)
    s1_max = s1.agg(F.max("ts")).collect()[0][0]
    late_ok = s1.filter(
        (F.col("ts") > F.expr(f"TIMESTAMP '{s1_max}' - INTERVAL 1 DAY"))
        & (F.col("ts") < F.lit(s1_max))
    )
    held = {r.event_id for r in late_ok.select("event_id").collect()}
    b1 = s1.filter(~F.col("event_id").isin(held)).select(COLS)
    b2 = (
        ev.filter((F.col("_rn") > n1) & (F.col("_rn") <= n2))
        .select(COLS)
        .unionByName(late_ok.select(COLS))
    )
    b3 = ev.filter(F.col("_rn") > n2).select(COLS)
    b4 = _sentinel(spark, ev, "3 DAYS", 10**9 + 1)
    b5 = _sentinel(spark, ev, "3 DAYS + 1 HOUR", 10**9 + 2)
    return ev, [b1, b2, b3, b4, b5]


def _drive_checked(
    spark, stream, name, mode, src_dir, batches, twin_rows, keep=None
):
    """Start the query, land each batch, and after EVERY drain assert
    the sink ⊆ batch twin; return the final sink rows. ``keep`` drops
    harness-internal rows (the watermark-flush sentinels) from the
    sink before comparing — operators that emit per-row (dedup) show
    them; windowed operators never close their windows."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    keep = keep or (lambda r: True)
    try:
        twin = set(twin_rows)
        for i, b in enumerate(batches):
            _land(b, src_dir, f"b{i}")
            q.processAllAvailable()
            got = {
                t
                for t in map(tuple, spark.table(name).collect())
                if keep(t)
            }
            extra = got - twin
            assert not extra, f"batch {i} emitted non-twin rows: {list(extra)[:3]}"
    finally:
        q.stop()
    return _nsorted(
        t for t in map(tuple, spark.table(name).collect()) if keep(t)
    )


CASES = [
    ("null_heavy", 101),
    ("null_heavy", 202),
    ("hostile_strings", 101),
    ("hostile_strings", 202),
    ("dup_flood", 101),
    ("dup_flood", 202),
    ("ts_attack", 101),
    ("ts_attack", 202),
]


@pytest.mark.parametrize("variant,seed", CASES)
def test_windowed_counts_fuzz(spark, tmp_path, variant, seed):
    src = str(tmp_path / "src")
    os.makedirs(src)
    fuzzed = _fuzz_events(spark, seed, variant)
    ev, batches = _arrival_program(spark, fuzzed)
    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, src),
        window="6 hours",
        watermark="2 days",
    )
    want = events_stream.windowed_event_counts(
        ev.select(COLS), window="6 hours", watermark="2 days"
    )
    key = ["window_start", "event_type", "n", "total_value"]
    want_rows = _nsorted(map(tuple, want.select(key).collect()))
    got_rows = _drive_checked(
        spark,
        stream.select(key),
        f"v_fz_win_{variant}_{seed}",
        "append",
        src,
        batches,
        want_rows,
    )
    assert len(got_rows) > 30
    assert got_rows == want_rows
    ev.unpersist()


@pytest.mark.parametrize(
    "variant,seed",
    [("null_heavy", 101), ("null_heavy", 202),
     ("ts_attack", 101), ("ts_attack", 202)],
)
def test_session_windows_fuzz(spark, tmp_path, variant, seed):
    src = str(tmp_path / "src")
    os.makedirs(src)
    fuzzed = _fuzz_events(spark, seed, variant)
    ev, batches = _arrival_program(spark, fuzzed)
    stream = events_stream.session_window_stats(
        events_stream.read_events_stream(spark, src),
        gap="6 hours",
        watermark="2 days",
    )
    want = events_stream.session_window_stats(
        ev.select(COLS), gap="6 hours", watermark="2 days"
    )
    key = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    want_rows = _nsorted(map(tuple, want.select(key).collect()))
    got_rows = _drive_checked(
        spark,
        stream.select(key),
        f"v_fz_sess_{seed}",
        "append",
        src,
        batches,
        want_rows,
    )
    assert len(got_rows) > 10
    assert got_rows == want_rows
    ev.unpersist()


@pytest.mark.parametrize(
    "variant,seed",
    [("dup_flood", 101), ("dup_flood", 202), ("null_heavy", 101),
     ("ts_attack", 101)],
)
def test_dedup_stream_fuzz(spark, tmp_path, variant, seed):
    """dropDuplicatesWithinWatermark under the replay storm: a generous
    horizon makes every duplicate in-state, so the stream must equal
    batch dropDuplicates(event_id) exactly — per batch, never emitting
    an id twice."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    fuzzed = _fuzz_events(spark, seed, variant)
    ev, batches = _arrival_program(spark, fuzzed)
    stream = events_stream.dedup_events_stream(
        events_stream.read_events_stream(spark, src), watermark="90 days"
    )
    # batch twin: one row per event_id (fuzzed dups are full-row
    # identical, so any-row-per-id == the stream's first-seen row)
    want = ev.select(COLS).dropDuplicates(["event_id"])
    key = ["event_id", "user_id", "event_type", "value"]
    want_rows = _nsorted(map(tuple, want.select(key).collect()))
    got_rows = _drive_checked(
        spark,
        stream.select(key),
        f"v_fz_dedup_{variant}_{seed}",
        "append",
        src,
        batches,
        want_rows,
        # sentinels are first-seen ids too — dedup emits them; the twin
        # program never lands them, so they are harness rows, not data
        keep=lambda r: r[0] < 10**9,
    )
    assert got_rows == want_rows
    assert len(got_rows) == ev.select("event_id").distinct().count()
    ev.unpersist()


@pytest.mark.parametrize(
    "variant,seed",
    [("hostile_strings", 101), ("hostile_strings", 202), ("ts_attack", 101)],
)
def test_interval_join_fuzz(spark, tmp_path, variant, seed):
    """Stream-stream interval join under hostile event_type bytes: the
    click/purchase filters must select exactly the batch twin's rows
    and the buffered-state matching must produce the identical pair
    set."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    fuzzed = _fuzz_events(spark, seed, variant)
    ev, batches = _arrival_program(spark, fuzzed)
    stream = events_stream.click_purchase_pairs(
        events_stream.read_events_stream(spark, src),
        lookback="12 hours",
        watermark="30 days",
    )
    want = events_stream.click_purchase_pairs(
        ev.select(COLS), lookback="12 hours", watermark="30 days"
    )
    key = ["user_id", "purchase_id", "click_id"]
    want_rows = _nsorted(map(tuple, want.select(key).collect()))
    assert len(want_rows) > 5, "fuzz variant must leave real pairs"
    got_rows = _drive_checked(
        spark,
        stream.select(key),
        f"v_fz_join_{seed}",
        "append",
        src,
        batches,
        want_rows,
    )
    assert got_rows == want_rows
    ev.unpersist()


def _event_row(spark, event_id, ts_str, user_id=7, etype="click", value=1.0):
    return spark.createDataFrame(
        [(event_id, ts_str, user_id, etype, value, None)],
        "event_id bigint, _ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("_ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )


def test_exact_watermark_boundary_row_admitted(spark, tmp_path):
    """The watermark's sharpest edge (VERDICT r10 item 4): a row that
    arrives late by EXACTLY the watermark delay. Its event time equals
    the watermark instant, so its 6-hour window END is strictly above
    the watermark — the window is still open and the row MUST be
    admitted into the aggregate. 2-day watermark, batch 1 advances max
    event time to T, batch 2 carries a row at exactly T - 2 days."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = _event_row(spark, 1, "2024-03-10 12:00:00").unionByName(
        _event_row(spark, 2, "2024-03-08 13:30:00")
    )
    # exactly watermark-late: event time == max_seen - 2 days
    b2 = _event_row(spark, 3, "2024-03-08 12:00:00")
    b3 = _sentinel(spark, b1, "10 DAYS", 10**9 + 1)
    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, src),
        window="6 hours",
        watermark="2 days",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("v_wm_edge")
        .outputMode("append")
        .start()
    )
    try:
        for i, b in enumerate([b1, b2, b3]):
            _land(b, src, f"b{i}")
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.window_start.isoformat(), r.n)
        for r in spark.table("v_wm_edge").collect()
        if r.event_type == "click"
    }
    # the 12:00-18:00 window of 2024-03-08 must hold BOTH the on-time
    # 13:30 row and the exactly-watermark-late 12:00 row
    assert ("2024-03-08T12:00:00", 2) in got, got


def test_row_into_closed_window_never_double_emits(spark, tmp_path):
    """The dual edge: a row later than the watermark whose window the
    watermark has already CLOSED (window end <= watermark). Append mode
    has already emitted that window's final row; the guarantee that
    matters downstream is exactly-once finality — the sink must never
    grow a SECOND row for the same (window, event_type), and the
    emitted count must stay the pre-late value."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = _event_row(spark, 1, "2024-03-01 01:00:00")
    # advance watermark far past b1's window end (2024-03-01 06:00)
    b2 = _event_row(spark, 2, "2024-03-20 00:00:00")
    q0 = None
    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, src),
        window="6 hours",
        watermark="2 days",
    )
    q0 = (
        stream.writeStream.format("memory")
        .queryName("v_wm_closed")
        .outputMode("append")
        .start()
    )
    try:
        _land(b1, src, "b1")
        q0.processAllAvailable()
        _land(b2, src, "b2")
        q0.processAllAvailable()
        emitted = [
            (r.window_start.isoformat(), r.n)
            for r in spark.table("v_wm_closed").collect()
        ]
        assert ("2024-03-01T00:00:00", 1) in emitted, emitted
        # a straggler INTO the closed-and-emitted window
        _land(_event_row(spark, 3, "2024-03-01 01:30:00"), src, "b3")
        q0.processAllAvailable()
        # flush everything that could still emit
        _land(_event_row(spark, 4, "2024-04-15 00:00:00"), src, "b4")
        q0.processAllAvailable()
    finally:
        q0.stop()
    rows = [
        (r.window_start.isoformat(), r.event_type, r.n)
        for r in spark.table("v_wm_closed").collect()
    ]
    per_key = {}
    for w, t, n in rows:
        per_key[(w, t)] = per_key.get((w, t), 0) + 1
    assert all(c == 1 for c in per_key.values()), rows
    assert ("2024-03-01T00:00:00", "click", 1) in rows, rows
