"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (plus the scale
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an
equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py``
exposes this registry to the driver.

Determinism rules (the driver hash-compares values order-insensitively):

- Every computed column is aliased identically in Spark and SQL.
- Monetary aggregates sum exact DECIMALs and only then cast to DOUBLE —
  float addition order can differ between engines, decimal addition
  cannot.
- Remaining DOUBLE outputs are rounded (4-6 dp) far below both
  engines' error bounds.
- Top-k queries always carry a unique tie-break column in the ORDER BY.
- No raw arrays/maps/timestamps in outputs: arrays are joined to
  strings, instants are exposed as year/month ints or formatted text.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Multi-superstep (loop-carried) queries declare a parquet-scan-node
# budget at registration; tests/test_plans.py derives its scan-budget
# sweep from this map, so a new iterative operator is enrolled in the
# loop-recompute guard by construction (it cannot be forgotten the way
# a hand-maintained test list can).
SCAN_BUDGETS: dict[str, int] = {}

_QUERY_MODULES = (
    "udacity_data_wrangling_osm_case_study_spark.plans.exploration",
    "udacity_data_wrangling_osm_case_study_spark.plans.join_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.window_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.temporal_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.cleaning_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.dedup_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.fingerprint_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.similarity_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.text_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.packing_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.curation_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.udtf_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.substring_queries",
    "udacity_data_wrangling_osm_case_study_spark.plans.tpch_shapes",
)

_loaded = False

# Names surfaced first to the driver's correctness harness — ONLY the
# current round's schema/semantics-changed queries (the driver must
# re-attest those before anything else). Everything after the hoist is
# ordered LEAST-RECENTLY-ATTESTED first from the committed
# ATTESTATION.json (regenerated each round by tools/attestation.py from
# the driver's CORRECTNESS_r*.json archives), so the driver's bounded
# ~50-name budget rotates through the registry tail by construction —
# the r5-r10 hand-maintained hoist kept re-attesting the same names
# while 84 of 253 aged back to rounds 1-2 (VERDICT r10 item 3).
_VERIFY_FIRST: tuple[str, ...] = (
    # ADVICE r12 (registry.py:88): the round-12 exact_floor_div
    # widening (DECIMAL(38,0) before the pmod subtraction) also flows
    # through range_join (operators/temporal.py), whose registered
    # consumers were NOT hoisted in r12 — error_followup_pairs never
    # landed in CORRECTNESS_r12 at all. Hoist both range_join-backed
    # queries now so every consumer of the changed expression has a
    # post-change driver attestation.
    "error_followup_pairs",
    "multitouch_attribution",
    # Round-13 plan change: label_propagation / clustering_coefficient
    # superstep tails now repartition on the vertex key at the
    # operator's own edge_partitions instead of inheriting the session
    # shuffle count (VERDICT r12 item 2). Same rows, different
    # exchange placement; the driver should confirm.
    "part_communities",
    "part_clustering_coeff",
    # Round-13 s-fuzz fixes (seed 1s), value-identical on clean driver
    # data but the driver should confirm: the centroid cosine now
    # guards its zero-norm denominator (try_divide + coalesce, the
    # oracle's declared COALESCE/NULLIF semantics), and the trend sign
    # is an exact DECIMAL when-chain matching the oracle CASE (an
    # all-NULL-value group reports 0, not NULL).
    "source_centroid_cosine",
    "event_value_trend",
    # Representatives of the round-13 ORACLE-side whitespace mirror
    # (trim(x, ' ') + explicit [ \t\n\x0b\f\r] class across the _NORM
    # consumers — Spark plans untouched): one dedup-family and one
    # token-stats attestation.
    "minhash_lsh_dupes",
    "corpus_token_stats",
    # Round-13 OPTIMIZATION plan changes (results oracle-proven
    # identical at sf0.01 + sf0.001 before shipping; the driver should
    # re-attest): the per-key Arrow cogroup retired for the built-in
    # aggregate plan; the post-symmetrize distinct removed; four
    # fan_out_scan sites (one added round-robin exchange above heavy
    # row-local scan stages).
    "cogrouped_entity_profile",
    "entity_profile_native",
    "part_random_walk_pairs",
    "bootstrap_mean_ci",
    "pricing_summary",
    "salted_priority_revenue",
    "customer_geo_pairs",
    # …and the funnel's single-normalize rewrite (norm reused by the
    # shingle stage via pre_normalized=True; raw text dropped from the
    # stage caches).
    "corpus_curation_funnel",
    # Round-13 OPTIMIZATION, second pass: pagerank's edge build folded
    # into a single-exchange collect_set adjacency (pair distinct +
    # src repartition → one co-partitioned aggregation; supersteps now
    # join the vertex-sized adjacency and explode row-locally), and
    # random_walks' adjacency build repartitions BEFORE its groupBy
    # (plus the caller's now-redundant pair distinct removed — the
    # collect_set dedups). Results oracle-proven identical at
    # sf0.001/0.01/0.1 before shipping; part_random_walk_pairs is
    # already hoisted above.
    "part_pagerank",
)

# The hoist list is an honest record of verification priority; a name
# listed twice means a later block silently shadows an earlier intent
# (harmless to load_all's dict rebuild, misleading to a reader). Keep
# it duplicate-free by construction — and NOT via assert, which
# ``python -O`` strips (ADVICE r12 on the same pattern in the fuzzer).
if len(_VERIFY_FIRST) != len(set(_VERIFY_FIRST)):
    raise ValueError(
        "duplicate names in _VERIFY_FIRST: "
        + ", ".join(sorted(
            n for n in set(_VERIFY_FIRST) if _VERIFY_FIRST.count(n) > 1
        ))
    )


def register(
    name: str, oracle: str | None = None, scan_budget: int | None = None
):
    """Decorator: add a query (and optionally its DuckDB oracle SQL).

    ``scan_budget`` marks a multi-superstep operator: the maximum number
    of parquet-scan NODES its final physical plan may retain after the
    loop's checkpoint lineage cuts (see SCAN_BUDGETS above). Every query
    whose implementation loops over a frame it rebuilds per step MUST
    pass one — the plan test sweeps the map.
    """

    def deco(fn):
        if name in QUERIES:
            # A silent overwrite would shadow an attested query with a
            # different-semantics newcomer (nearly shipped in round 7:
            # a second "duplicated_span_share") — fail loudly instead.
            raise ValueError(
                f"query name {name!r} is already registered"
                f" (by {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if scan_budget is not None:
            SCAN_BUDGETS[name] = scan_budget
        return fn

    return deco


def fan_out_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition for a frame whose source cannot supply
    enough input splits to fill the cluster — single-row-group parquet
    (the driver testdata's physical layout), unsplittable codecs, tiny
    files (guide §2.5: "repartition immediately after the read").

    Scale-adaptive by construction: a no-op whenever the frame already
    carries at least half the session's default parallelism in
    partitions, so at production scale — where a fact scan yields
    thousands of row-group splits — the exchange never exists. Apply it
    ONLY above heavy row-local compute (per-row hashing, wide decimal
    aggregates, pair expansion): for cheap-per-row aggregate-first
    plans the extra round-robin exchange of raw rows costs more than
    the single-core scan stage it parallelizes (measured on the graph
    edge build and five aggregate queries, round 13)."""
    par = spark.conf.get("spark.default.parallelism", None)
    if par is None:
        try:
            par = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect sessions have no sparkContext
            par = 8
    par = int(par)
    try:
        n_splits = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no df.rdd — skip the fan-out
        return df
    if n_splits < max(par // 2, 2):
        return df.repartition(par)
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-testdata parquet table.

    ``events.ts`` has shipped in two physical shapes across driver
    testdata generations — TIMESTAMP(NANOS) (scan as int64 nanos via
    ``spark.sql.legacy.parquet.nanosAsLong``) and timezone-naive
    TIMESTAMP(MICROS) (scans as TIMESTAMP_NTZ). Both are normalized to
    TIMESTAMP_LTZ under a UTC session zone so every downstream plan
    sees one type and the wall clock matches DuckDB's naive read of the
    same file.
    """
    if name == "events":
        # The harness may hand us a vanilla session; bring it into the
        # engine's documented conf contract (no-op for get_spark
        # sessions — see session._SESSION_CONTRACT).
        from udacity_data_wrangling_osm_case_study_spark.session import ensure_session_contract

        ensure_session_contract(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        # These tables ship as ONE small parquet file (one row group →
        # one input split), so every row-local heavy stage downstream
        # (shingle explode, per-token md5, vector math) would run on a
        # single core until the first shuffle. Fan the scan out when it
        # yields fewer splits than cores — the exact repartition a
        # cluster job does after a skinny-file scan. At real scale the
        # scan produces thousands of splits and this is a no-op.
        df = fan_out_scan(df, spark)
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as raw nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # naive micros
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _last_attested() -> dict[str, int]:
    """Per-name last-driver-attested round from the committed
    ATTESTATION.json (repo root; regenerated by tools/attestation.py).
    Missing file or missing name -> round 0, which sorts FIRST — a
    brand-new query is by definition the least recently attested."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "ATTESTATION.json",
    )
    try:
        with open(path) as f:
            return json.load(f)["last_attested_round"]
    except (OSError, ValueError, KeyError):
        return {}


def load_all() -> tuple[dict, dict]:
    """Import every query module once; return (QUERIES, ORACLES).

    Order — which IS the driver's attestation priority, since its
    correctness harness hash-checks the first ~50 names each round:
    the ``_VERIFY_FIRST`` hoist (this round's semantics-changed names),
    then every other query least-recently-attested first (stable on
    registration order within a round), per ATTESTATION.json. Each
    round's driver sample thus covers the stalest tail, and the
    regenerated ATTESTATION.json rotates it to the back.
    """
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            import_module(mod)
        last = _last_attested()
        front = [n for n in _VERIFY_FIRST if n in QUERIES]
        reg_idx = {n: i for i, n in enumerate(QUERIES)}
        rest = sorted(
            (n for n in QUERIES if n not in _VERIFY_FIRST),
            key=lambda n: (last.get(n, 0), reg_idx[n]),
        )
        reordered = {n: QUERIES[n] for n in (*front, *rest)}
        QUERIES.clear()
        QUERIES.update(reordered)
        _loaded = True
    return QUERIES, ORACLES
