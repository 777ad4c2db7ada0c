"""Structured Streaming variants: the stream results must equal their
batch twins on the same finite input (functional parity between the two
runtimes is the whole point of sharing the column expressions)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.plans.registry import table
from udacity_data_wrangling_osm_case_study_spark.streaming import events_stream
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark):
    """Stage the events table as a stream-source directory with
    micro-batch-sized files (ts re-materialized as a real timestamp —
    the raw file stores TIMESTAMP(NANOS) which file streams can't
    read with a pinned micros schema)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(stream, "win_counts", output_mode="append")
    got = spark.table("win_counts")

    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    # Append mode only emits windows the final watermark has passed
    # (end-of-stream watermark = max(ts) - 10 min); the open tail
    # windows are correctly withheld. Compare the closed ones.
    max_ts = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("window_start") + F.expr("INTERVAL 5 MINUTES")
        <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    )
    key = ["window_start", "event_type", "n", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    closed_rows = sorted(map(tuple, closed.select(key).collect()))
    assert len(got_rows) > 0
    assert got_rows == closed_rows


def test_running_user_counts_stateful(spark, events_dir):
    stream = events_stream.running_user_counts(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(stream, "run_counts", output_mode="update")
    got = spark.table("run_counts")
    # Per user, the LAST emitted running count equals the batch total.
    final = got.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = (
        table(spark, SF_DIR, "events").groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_clean_phones_stream_matches_batch(spark, events_dir):
    """The streaming cleaner is the same Column expression as batch."""
    from udacity_data_wrangling_osm_case_study_spark.functions import phones as P

    src = events_stream.read_events_stream(spark, events_dir).select(
        F.col("event_id").alias("id"),
        F.lit("phone").alias("key"),
        F.concat(F.lit("852-"), F.lpad((F.col("event_id") % 10000).cast("string"), 8, "9")).alias("value"),
        F.lit("regular").alias("type"),
    )
    cleaned = events_stream.clean_phones_stream(src)
    events_stream.run_to_memory_sink(cleaned, "phones_stream", output_mode="append")
    got = spark.table("phones_stream")
    assert got.count() > 0
    # every synthesized value matches the HK shape → all canonical + changed
    assert got.filter(~F.col("value").rlike("^\\+852 \\d{8}$")).count() == 0
    assert got.filter(~F.col("changed")).count() == 0


def test_session_window_stream_matches_batch(spark, events_dir):
    """Native session windows: closed sessions emitted by the stream
    must equal the batch session_window result; the per-user session
    COUNT must also agree with the lag-based sessionization query."""
    stream = events_stream.session_window_stats(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(stream, "v_sess", output_mode="append")
    got = spark.table("v_sess")

    batch = events_stream.session_window_stats(table(spark, SF_DIR, "events"))
    max_ts = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("session_end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    )
    key = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    assert len(got_rows) > 0
    assert got_rows == sorted(map(tuple, closed.select(key).collect()))

    # cross-check: batch session COUNT per user == lag-based q
    from udacity_data_wrangling_osm_case_study_spark.plans import registry
    queries, _ = registry.load_all()
    lag_based = {
        r.user_id: r.n_sessions
        for r in queries["user_sessions"](spark, SF_DIR).collect()
    }
    native = {
        r.user_id: r.n
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert native == lag_based


def test_stream_dedup_within_watermark(spark, events_dir):
    """Feeding the same source twice (a replay) must yield each
    event_id once."""
    doubled = events_stream.read_events_stream(spark, events_dir).unionByName(
        events_stream.read_events_stream(spark, events_dir)
    )
    deduped = events_stream.dedup_events_stream(doubled)
    events_stream.run_to_memory_sink(deduped, "v_dedup", output_mode="append")
    got = spark.table("v_dedup")
    n_src = table(spark, SF_DIR, "events").count()
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """The watermarked stream-stream interval join must emit exactly
    the pairs the identical batch join produces — every (purchase,
    click-within-30-min-before) pair, once."""
    joined = events_stream.click_purchase_pairs(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(joined, "v_ssj", output_mode="append")
    got = sorted(
        map(tuple, spark.table("v_ssj").select("purchase_id", "click_id").collect())
    )
    batch = events_stream.click_purchase_pairs(table(spark, SF_DIR, "events"))
    want = sorted(
        map(tuple, batch.select("purchase_id", "click_id").collect())
    )
    assert len(want) > 0
    assert got == want


def test_cdc_apply_stream_converges_and_is_idempotent(spark):
    """A change stream (upserts + a tombstone per key group) applied
    through the versioned foreachBatch sink must equal the batch MERGE
    of the same changes in sequence order; re-applying the final batch
    (a foreachBatch retry) must leave the snapshot unchanged."""
    from udacity_data_wrangling_osm_case_study_spark.operators import upsert
    from udacity_data_wrangling_osm_case_study_spark.streaming import cdc_apply

    base = table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    # Synthetic change feed: two files → two micro-batches. seq orders
    # changes within a key; key % 7 == 0 rows end in a delete.
    changes = base.select(
        "c_custkey",
        F.concat(F.lit("v2-"), "c_name").alias("c_name"),
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        (F.col("c_custkey") % 2).cast("bigint").alias("seq"),
        (F.col("c_custkey") % 7 == 0).alias("deleted"),
    )
    src = tempfile.mkdtemp(prefix="cdc_src_")
    tgt = tempfile.mkdtemp(prefix="cdc_tgt_")
    try:
        changes.repartition(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", "1").parquet(src)
        cdc_apply.apply_cdc_stream(
            stream, tgt, key="c_custkey", tombstone_col="deleted"
        )
        got = cdc_apply.read_snapshot(spark, tgt)

        # Batch twin: all changes at once (same per-key collapse).
        w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
        latest = (
            spark.read.parquet(src)
            .withColumn(
                "_rn",
                F.row_number().over(
                    w.partitionBy("c_custkey").orderBy(F.desc("seq"))
                ),
            )
            .filter("_rn = 1")
            .drop("_rn", "seq")
        )
        want = upsert.merge_upsert(
            base.limit(0), latest, "c_custkey", tombstone_col="deleted"
        )
        key = ["c_custkey", "c_name", "c_acctbal"]
        assert sorted(map(tuple, got.select(key).collect())) == sorted(
            map(tuple, want.select(key).collect())
        )
        # tombstoned keys are gone
        assert got.filter(F.col("c_custkey") % 7 == 0).count() == 0

        # Idempotence: re-apply the final version's own changes.
        ver = cdc_apply.snapshot_version(tgt)
        before = sorted(map(tuple, got.select(key).collect()))
        cdc_apply.apply_cdc_batch(
            spark,
            spark.read.parquet(src),
            ver,
            tgt,
            key="c_custkey",
            tombstone_col="deleted",
        )
        after = sorted(
            map(
                tuple,
                cdc_apply.read_snapshot(spark, tgt).select(key).collect(),
            )
        )
        assert before == after

        # Intra-batch collapse: an upsert then a tombstone for the SAME
        # key inside one batch must net out to the delete (seq order,
        # not row order, decides).
        mini = spark.createDataFrame(
            [
                (999991, "newbie", 1.0, 0, False),
                (999991, "newbie-2", 2.0, 1, True),
                (999992, "kept-v1", 1.0, 1, False),
                (999992, "kept-v0", 0.0, 0, False),
            ],
            ["c_custkey", "c_name", "c_acctbal", "seq", "deleted"],
        )
        cdc_apply.apply_cdc_batch(
            spark, mini, ver + 1, tgt, key="c_custkey", tombstone_col="deleted"
        )
        snap = cdc_apply.read_snapshot(spark, tgt)
        assert snap.filter(F.col("c_custkey") == 999991).count() == 0
        got_row = snap.filter(F.col("c_custkey") == 999992).collect()
        assert [(r.c_name, r.c_acctbal) for r in got_row] == [("kept-v1", 1.0)]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(tgt, ignore_errors=True)


def test_cms_user_counts_bounds(spark, events_dir):
    """The streamed count-min sketch must respect its guarantees vs the
    exact batch aggregate: never undercount, and overcount by at most
    e/W of the per-type total (the standard CMS bound; depth 4 makes
    exceeding it on EVERY row astronomically unlikely — assert the 99th
    percentile instead of the max to keep the test deterministic-ish
    while still catching any systematic error)."""
    stream = events_stream.cms_user_event_counts(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(stream, "v_cms", output_mode="update")
    # est only grows across micro-batches: the final estimate per key
    # is the max emitted.
    got = {
        (r.event_type, r.user_id): r.est_n
        for r in spark.table("v_cms")
        .groupBy("event_type", "user_id")
        .agg(F.max("est_n").alias("est_n"))
        .collect()
    }
    exact = {
        (r.event_type, r.user_id): r.n
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {
        r.event_type: r.n
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    overs = []
    for (etype, uid), est in got.items():
        assert est >= exact[(etype, uid)], f"CMS undercounted {(etype, uid)}"
        bound = 2.7183 / events_stream.CMS_WIDTH * totals[etype]
        overs.append((est - exact[(etype, uid)]) <= bound)
    assert sum(overs) / len(overs) >= 0.99


def test_sliding_window_counts_match_batch(spark, events_dir):
    stream = events_stream.windowed_event_counts(
        events_stream.read_events_stream(spark, events_dir),
        window="10 minutes",
        slide="5 minutes",
    )
    events_stream.run_to_memory_sink(stream, "slide_counts", output_mode="append")
    got = spark.table("slide_counts")

    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    max_ts = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("window_start") + F.expr("INTERVAL 10 MINUTES")
        <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    )
    key = ["window_start", "event_type", "n", "total_value"]
    got_rows = sorted(map(tuple, got.select(key).collect()))
    closed_rows = sorted(map(tuple, closed.select(key).collect()))
    assert len(got_rows) > 0
    assert got_rows == closed_rows


def test_corpus_intake_stream(spark, tmp_path):
    """Streaming corpus intake: (1) later batches dedup against
    everything accepted earlier (no cross-batch near-dup pair survives
    in the accepted corpus); (2) a doc rejected as a near-dup of the
    seed corpus never lands; (3) replaying a batch with the same
    batch_id is byte-idempotent (dynamic partition overwrite)."""
    from pyspark.sql import functions as F

    from udacity_data_wrangling_osm_case_study_spark.operators import dedup
    from udacity_data_wrangling_osm_case_study_spark.streaming import corpus_intake

    src = tmp_path / "src"
    accepted_dir = str(tmp_path / "accepted")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    seed = [(i, f"seed doc number {i} with unique words w{i}a w{i}b w{i}c w{i}d") for i in range(10)]
    seed_df = spark.createDataFrame(seed, ["doc_id", "text"])
    dedup.build_dedup_index(seed_df, index_dir)

    # drop 1: a near-copy of seed doc 3, an exact in-batch dup pair, a fresh doc
    drop1 = [
        (100, "seed doc number 3 with unique words w3a w3b w3c w3x"),  # ~seed dup
        (101, "totally fresh alpha beta gamma delta epsilon zeta"),
        (102, "totally fresh alpha beta gamma delta epsilon zeta"),    # exact dup of 101
        (103, "short"),                                                # quality-gated
    ]
    # drop 2: a near-copy of drop 1's survivor, plus a fresh doc
    drop2 = [
        (200, "totally fresh alpha beta gamma delta epsilon eta"),     # ~101 dup
        (201, "another genuinely new document about spark engines and scale"),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    for i, rows in enumerate([drop1, drop2]):
        (
            spark.createDataFrame(
                [(d, t, "en", "s", len(t)) for d, t in rows], cols
            ).coalesce(1).write.mode("overwrite").parquet(str(src / f"drop{i}"))
        )

    q = corpus_intake.start_corpus_intake(
        spark, str(src) + "/*", accepted_dir, index_dir, ckpt
    )
    q.awaitTermination(180)

    acc = spark.read.parquet(accepted_dir)
    got = {r.doc_id for r in acc.select("doc_id").collect()}
    assert 100 not in got          # near-dup of the seed corpus
    assert 103 not in got          # under the token floor
    assert len({101, 102} & got) == 1   # exact in-batch dup collapsed
    assert 200 not in got          # near-dup of an earlier ACCEPTED batch
    assert 201 in got

    # no cross-batch near-dup pair survives in the accepted corpus
    sh = dedup.word_shingles(acc.select("doc_id", "text"))
    pairs = dedup.jaccard_pairs(sh, min_jaccard=0.5)
    batches = acc.select(F.col("doc_id").alias("id"), "batch_id")
    cross = (
        pairs.join(batches.withColumnRenamed("id", "id_a").withColumnRenamed("batch_id", "ba"), "id_a")
        .join(batches.withColumnRenamed("id", "id_b").withColumnRenamed("batch_id", "bb"), "id_b")
        .filter("ba <> bb")
    )
    assert cross.count() == 0

    # idempotence: re-running a batch with its original id changes nothing
    before_acc = sorted(map(tuple, spark.read.parquet(accepted_dir).collect()))
    before_sz = spark.read.parquet(f"{index_dir}/sizes").count()
    drop2_df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in drop2], cols
    )
    corpus_intake.intake_batch(drop2_df, 1, accepted_dir, index_dir)
    assert sorted(map(tuple, spark.read.parquet(accepted_dir).collect())) == before_acc
    assert spark.read.parquet(f"{index_dir}/sizes").count() == before_sz


def test_spike_alerts_stream_matches_batch(spark, events_dir, tmp_path):
    """The streaming alert sink must flag exactly the windows the batch
    trailing_spikes logic flags over the same (watermark-closed) window
    set; replaying the stream into the same store (fresh checkpoint =
    full retry) must leave the alert table unchanged."""
    from udacity_data_wrangling_osm_case_study_spark.operators import temporal
    from udacity_data_wrangling_osm_case_study_spark.streaming import spike_alerts

    state = str(tmp_path / "spike_state")
    spike_alerts.spike_alerts_stream(
        events_stream.read_events_stream(spark, events_dir),
        state,
        checkpoint_dir=str(tmp_path / "ckpt1"),
        num=2,  # 2x trailing mean: the tiny sf0.001 stream has no 3x spikes
    )
    got = {
        (r.event_type, r.window_start, r.n, r.trailing)
        for r in spike_alerts.read_alerts(spark, state).collect()
    }

    batch_windows = (
        table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    max_ts = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    closed = batch_windows.filter(
        F.col("window_start") + F.expr("INTERVAL 5 MINUTES")
        <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    )
    want = {
        (r.event_type, r.window_start, r.n, r.trailing)
        for r in temporal.trailing_spikes(closed, order_col="window_start", num=2).collect()
    }
    assert got == want
    assert got, "the sf0.001 events stream must produce at least one alert"

    # full-retry idempotence: fresh checkpoint, same store
    spike_alerts.spike_alerts_stream(
        events_stream.read_events_stream(spark, events_dir),
        state,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        num=2,
    )
    again = {
        (r.event_type, r.window_start, r.n, r.trailing)
        for r in spike_alerts.read_alerts(spark, state).collect()
    }
    assert again == got


def test_cusum_stream_matches_batch(spark, events_dir):
    """The streaming CUSUM's final per-user state must equal the batch
    event_value_cusum statistics — across MULTIPLE micro-batches: the
    source is staged as two time-split files consumed one per trigger,
    so the carried (S, max, n) state is genuinely exercised."""
    import shutil
    import tempfile

    from udacity_data_wrangling_osm_case_study_spark.operators import temporal

    ev = table(spark, SF_DIR, "events")
    cents = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    targets = cents.groupBy("user_id").agg(
        F.expr("sum(cents) div count(*)").alias("target_c")
    )

    # stage two files split at the median ts; lexicographic names keep
    # the early half in the first micro-batch
    d = tempfile.mkdtemp(prefix="cusum_stream_")
    try:
        mid = ev.agg(
            F.expr("percentile_approx(unix_micros(ts), 0.5)")
        ).collect()[0][0]
        early = ev.filter(F.unix_micros("ts") <= mid).coalesce(1)
        late = ev.filter(F.unix_micros("ts") > mid).coalesce(1)
        early.write.mode("overwrite").parquet(f"{d}/b0")
        late.write.mode("overwrite").parquet(f"{d}/b1")

        src = (
            spark.readStream.schema(events_stream.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        prepped = src.select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ).join(targets, "user_id")  # stream-static join
        stream = events_stream.cusum_user_drift(prepped)
        events_stream.run_to_memory_sink(stream, "v_cusum", output_mode="update")
        got = spark.table("v_cusum")
        # last emitted row per user = final state
        final = {
            r.user_id: (r.n_obs, r.max_cusum)
            for r in got.groupBy("user_id")
            .agg(
                F.max("n_obs").alias("n_obs"),
                F.max("max_cusum").alias("max_cusum"),
            )
            .collect()
        }

        batch = temporal.cusum(
            cents.join(F.broadcast(targets), "user_id"),
            key="user_id", order_cols=["ts", "event_id"],
            value_col="cents", target_col="target_c",
        )
        want = {
            r.user_id: (r.n, r.mx)
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("cusum_stat").alias("mx"))
            .collect()
        }
        assert final == want
        assert len(final) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ewma_stream_matches_batch(spark, events_dir):
    """The streaming EWMA's final per-user value must equal the batch
    event_value_ewma on the last event of each user — across two
    time-split micro-batches (real state carry, like the CUSUM test)."""
    import shutil
    import tempfile

    from udacity_data_wrangling_osm_case_study_spark.operators import temporal

    ev = table(spark, SF_DIR, "events").filter(F.col("user_id") < 5)
    d = tempfile.mkdtemp(prefix="ewma_stream_")
    try:
        mid = ev.agg(
            F.expr("percentile_approx(unix_micros(ts), 0.5)")
        ).collect()[0][0]
        ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b0")
        ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b1")
        src = (
            spark.readStream.schema(events_stream.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        prepped = src.select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        stream = events_stream.ewma_user_value(prepped)
        events_stream.run_to_memory_sink(stream, "v_ewma", output_mode="update")
        got_tbl = spark.table("v_ewma")
        # row with the max n_obs per user = final state
        final = {
            (r.user_id, r.n_obs): r.ewma_micro for r in got_tbl.collect()
        }
        finals = {}
        for (u, n), e in final.items():
            if u not in finals or n > finals[u][0]:
                finals[u] = (n, e)

        batch = temporal.ewma_halving(
            ev.select(
                "user_id", "ts", "event_id",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            ),
            key="user_id", order_cols=["ts", "event_id"],
            value_col="cents", lookback=16,
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        last = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select(
                "user_id",
                F.expr("ewma_num * 10000 div ewma_den").alias("ewma_micro"),
            )
        )
        want_n = {
            r.user_id: r.n
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        want = {
            r.user_id: (want_n[r.user_id], r.ewma_micro) for r in last.collect()
        }
        assert finals == want
        assert len(finals) == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_debounce_stream_matches_batch(spark, events_dir):
    """The streaming debounce's final per-(user, type) report must
    equal the batch burst semantics on the same events — across two
    time-split micro-batches, so a burst straddling the batch boundary
    exercises the carried anchor timestamp. Timestamps are compressed
    256x so real double-fires exist at test scale."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    ev = table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "event_id",
        F.timestamp_micros(F.expr("unix_micros(ts) div 256")).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="debounce_stream_")
    try:
        mid = ev.agg(
            F.expr("percentile_approx(unix_micros(ts), 0.5)")
        ).collect()[0][0]
        ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b0")
        ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/b1")

        src = (
            spark.readStream.schema(
                "user_id bigint, event_type string, event_id bigint, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        stream = events_stream.debounce_user_events(src)
        events_stream.run_to_memory_sink(stream, "v_debounce", output_mode="update")
        got = spark.table("v_debounce")
        final = {
            (r.user_id, r.event_type): (r.n_raw, r.n_kept, r.kept_id_checksum)
            for r in got.groupBy("user_id", "event_type")
            .agg(
                F.max("n_raw").alias("n_raw"),
                F.max("n_kept").alias("n_kept"),
                F.max("kept_id_checksum").alias("kept_id_checksum"),
            )
            .collect()
        }

        # batch expectation: same burst rule via one lag window
        w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        flagged = ev.withColumn(
            "gap", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).withColumn(
            "keep",
            F.when(F.col("gap").isNull() | (F.col("gap") > 5_000_000), 1)
            .otherwise(0),
        )
        want = {
            (r.user_id, r.event_type): (r.n_raw, r.n_kept, r.cks)
            for r in flagged.groupBy("user_id", "event_type")
            .agg(
                F.count("*").alias("n_raw"),
                F.sum("keep").alias("n_kept"),
                F.sum(
                    F.when(F.col("keep") == 1, F.col("event_id")).otherwise(0)
                ).alias("cks"),
            )
            .collect()
        }
        assert final == want
        # the compression must have produced real debouncing somewhere
        assert any(v[0] > v[1] for v in want.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kmv_stream_matches_batch_sketch_exactly(spark, events_dir):
    """KMV is order-insensitive and deterministic, so the streamed
    sketch's FINAL estimate per event type must equal the batch
    kmv_distinct_sketch query on the same rows bit-for-bit. The final
    state per key is selected by (n_sk desc, hk asc): n_sk is monotone
    NONdecreasing across updates and any rows tied on n_sk carry
    identical state, so the ordering always lands on the final row —
    note hk only shrinks once the sketch has saturated at k (below k it
    GROWS as hashes are absorbed), which is why hk alone would not
    identify the final update."""
    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    stream = events_stream.kmv_user_distinct(
        events_stream.read_events_stream(spark, events_dir)
    )
    events_stream.run_to_memory_sink(stream, "v_kmv", output_mode="update")
    # final state per key = the row with max n_sk, then min hk
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_sk"), F.asc("hk")
    )
    got = {
        r.event_type: (r.n_sk, r.hk, r.kmv_est)
        for r in spark.table("v_kmv")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    registry.load_all()
    batch = {
        r.event_type: r.kmv_est
        for r in registry.QUERIES["kmv_distinct_sketch"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(batch)
    for etype, (n_sk, hk, est) in got.items():
        assert est == batch[etype], (etype, est, batch[etype])
        assert n_sk <= events_stream.KMV_K


def test_docs_stream_jsonl_matches_batch_read(spark, tmp_path):
    """JSONL document stream: shards stream one-per-micro-batch under
    the SAME pinned schema as the batch JSONL source (imported — the
    paths cannot drift), and the streamed union equals the batch
    read of the same folder."""
    import json

    from udacity_data_wrangling_osm_case_study_spark.sources import jsonl
    from udacity_data_wrangling_osm_case_study_spark.streaming import corpus_intake

    src = tmp_path / "jsonl_src"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"doc {i}", "lang": "en",
         "source": f"src{i % 3}", "n_chars": 5 + (i % 4)}
        for i in range(12)
    ]
    for shard in range(3):
        with open(src / f"shard-{shard}.jsonl", "w") as fh:
            for r in rows[shard * 4:(shard + 1) * 4]:
                fh.write(json.dumps(r) + "\n")

    stream = corpus_intake.read_docs_stream_jsonl(spark, str(src) + "/*")
    assert stream.schema == jsonl.DOCUMENTS_SCHEMA
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream_docs")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_jsonl")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.sql(
        "SELECT doc_id, text, lang, source, n_chars FROM jsonl_stream_docs"
    )
    batch = jsonl.read_documents_jsonl(spark, str(src))
    assert streamed.count() == 12
    assert (
        streamed.exceptAll(batch).count() == 0
        and batch.exceptAll(streamed).count() == 0
    )
