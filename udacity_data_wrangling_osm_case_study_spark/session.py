"""SparkSession factory tuned for the engine.

Scale posture (100 TB north star): AQE on (runtime re-plan, skew-join
splitting, shuffle-partition coalescing), broadcast threshold raised so
dimension tables (official street list, nation/region) always hash-join
broadcast-side, Arrow enabled for the few pandas boundaries, UTC session
timezone for deterministic timestamp semantics across engines.

On the test rig this runs ``local[32]``; on a real cluster the same
declarative plans scale out — nothing here hand-schedules execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "osm-case-study-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the driver's
    bench harness and pytest share one configuration path.

    One call per process: ``getOrCreate`` applies this call's RUNTIME
    confs (shuffle partitions etc.) onto an already-existing session,
    so a second call with different arguments silently reconfigures
    the first caller's session (it flipped the pytest fixture to 32
    shuffle partitions once — round-9 notes). In-process callers that
    need the session should receive it, not re-create it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(
        shuffle_partitions
        or os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: driver JVM hosts the executors — size it for the
        # rig (default 1g OOMs once several frames are cached).
        .config("spark.driver.memory", driver_mem)
        # --- Catalyst / AQE: let the optimizer do the physical planning ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # Dimension tables here are ≤ a few MB; always broadcast them.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Python boundary: Arrow-vectorized when we must cross it ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- Scan sizing: 128 MB splits keep partitions executor-sized ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata's events.ts is TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as raw int64 nanos and
        # convert at the source (registry.table) — lossless, the data
        # carries no sub-microsecond residue.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Progress bars interleave with stdout when piped and can
        # visually swallow result lines — keep output clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        # Reliable-checkpoint mode (operators/iterative.py) writes one
        # file snapshot per superstep; without this a weeks-long
        # session accumulates every dead iteration's files until the
        # checkpoint volume fills. With it the ContextCleaner reclaims
        # a checkpoint's files once no live plan references its RDD —
        # safe for the superstep chain because each step's lineage is
        # truncated AT its own file (step N+1 re-reads step N's file,
        # never step N-1's). Context-level conf: applies to sessions
        # built here; foreign sessions keep their own policy.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


# Session-wide contract: every session running this engine's plans MUST
# have these two runtime confs. ``get_spark`` bakes them in at build
# time; foreign sessions (the driver's harness hands us vanilla ones)
# are brought into contract by ``ensure_session_contract`` exactly once
# per differing key. No other code in the package writes session confs.
_SESSION_CONTRACT = {
    # UTC makes NTZ→LTZ casts a wall-clock identity and matches the
    # DuckDB oracle's naive reading of the same parquet files.
    "spark.sql.session.timeZone": "UTC",
    # Some driver-testdata generations write events.ts as
    # TIMESTAMP(NANOS), which the vectorized parquet reader rejects;
    # reading as raw int64 nanos (converted losslessly at the source)
    # is safe for the MICROS generation too, where it is a no-op.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_contract(spark: SparkSession) -> None:
    """Idempotently bring a session into the engine's conf contract.

    Sessions built by :func:`get_spark` already satisfy it (the writes
    below are skipped); only foreign sessions are mutated, and only for
    keys whose current value differs.
    """
    for key, want in _SESSION_CONTRACT.items():
        if spark.conf.get(key, None) != want:
            spark.conf.set(key, want)
