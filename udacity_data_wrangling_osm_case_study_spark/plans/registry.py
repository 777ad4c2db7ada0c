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

# Names surfaced first to the driver's correctness harness. The harness
# walks ``queries()`` in insertion order with a bounded budget
# (~50 names/round; rounds 1-4 attested 196 distinct names, all green).
# Round-5 priority: the 10 names never driver-attested through round 4
# (registry ∖ (r01 ∪ … ∪ r04)), then round-5 additions; already-attested
# names follow in registration order.
_VERIFY_FIRST = (
    # Round-10 schema/semantics-changed queries (composed-magnitude
    # fuzz fixes: decay_num widened BIGINT -> DECIMAL(38,0) on both
    # engines; sessionization gaps now microsecond-exact like their
    # oracles — the driver should re-attest these first; all green
    # under check_oracle and the re-run 12m/13m/mag6 variants).
    "recency_weighted_user_value",
    "user_sessions",
    "session_peak_concurrency",
    "top_session_paths",
    # Round-9 semantics-changed queries (fuzz hardening: NULL/zero/
    # magnitude conventions now explicit on BOTH engines — the output
    # hash of several changed, so the driver should re-attest these
    # first; every one is already green under tools/check_oracle.py
    # and 17 fuzz variants).
    "pricing_summary",
    "nation_revenue_share",
    "event_value_time_weighted_avg",
    "customer_spend_gini",
    "mannwhitney_click_view",
    "event_value_ks_test",
    "event_value_ewma",
    "event_value_mad_outliers",
    "event_value_median_histogram",
    "quantity_weighted_median_price",
    "theilsen_user_trend",
    "approx_event_value_p95",
    "trending_event_types",
    "next_event_training_pairs",
    "order_value_deciles",
    "balance_distribution",
    "customer_rfm_segments",
    "late_shipment_priority_split",
    "table_counts",
    "revenue_rollup",
    "order_status_cube",
    "orders_status_priority_cube",
    "nation_segment_grouping_sets",
    "t_closeness_report",
    "negative_sampling_pairs",
    "part_pareto_frontier",
    "benford_first_digit_audit",
    "corpus_token_stats",
    "event_type_hour_chisq",
    "bootstrap_mean_ci",
    "classifier_auc",
    "classifier_calibration",
    "source_quality_calibration",
    "source_quantile_normalize",
    "quality_classifier",
    "repetition_quality",
    "doc_profiles",
    "pii_term_scrub",
    "fuzzy_typo_repair",
    "capwords_nation_styles",
    "props_key_histogram",
    "json_props_udtf",
    "embedding_standardize",
    "embedding_near_dupes",
    "embedding_near_dupes_arrow",
    "semantic_dedup",
    "knn_bruteforce",
    "knn_ivf",
    "knn_srp_lsh",
    "kmeans_step",
    "hard_negative_mining",
    "hybrid_search_rrf",
    "ann_recall_report",
    "ann_rank_overlap_rbo",
    "media_metadata",
    "media_features",
    "media_frame_sample",
    "media_shared_frames",
    "media_near_dupes",
    "substring_dedup_removal",
    "nation_profit_rollup",
    # round-8 additions (never attested, newest work first)
    "incremental_substring_coverage_bucketed",
    "min_cost_supplier",
    "important_stock_parts",
    "promotable_part_suppliers",
    # round-7 additions (attested green in r7, kept near the front)
    "substring_span_coverage",
    "top_boilerplate_grams",
    "incremental_substring_coverage",
    "customer_order_counts_dist",
    "small_qty_part_revenue",
    "large_quantity_orders",
    "idle_rich_customers",
    "late_order_priority_check",
    "top_quarter_supplier",
    "disjunctive_promo_revenue",
    "conversion_funnel_ordered",
    "weekly_retention_cohorts",
    "discount_revenue_forecast",
    "bilateral_shipping_volume",
    "returned_item_customers",
    "promo_revenue_share_monthly",
    "supplier_count_by_part_attr",
    "substring_threshold_profile",
    "boilerplate_share_by_source",
    # round-6 additions (never attested, newest work first)
    "source_centroid_cosine",
    "daily_count_autocorr",
    "event_markov_stationary",
    "event_bigram_entropy",
    "nation_market_share",
    "part_price_smoothing",
    "part_cheapest_path",
    "sole_late_suppliers",
    "dp_event_type_counts",
    "part_bfs_hops",
    "part_kcore",
    "part_communities",
    "part_clustering_coeff",
    "kmv_distinct_sketch",
    # never driver-attested through round 4 (10 names)
    "weighted_doc_sample",
    "cms_user_event_counts",
    "salted_priority_revenue",
    "cogrouped_entity_profile",
    "user_activity_gaps",
    "feature_hash_crosses",
    "l_diversity_report",
    "part_random_walk_pairs",
    "weighted_doc_sample_aes",
    # round-5 additions (never attested, newest work first)
    "entity_profile_native",
)

# The hoist list is an honest record of verification priority; a name
# listed twice means a later block silently shadows an earlier intent
# (harmless to load_all's dict rebuild, misleading to a reader). Keep
# it duplicate-free by construction.
assert len(_VERIFY_FIRST) == len(set(_VERIFY_FIRST)), sorted(
    n for n in set(_VERIFY_FIRST) if _VERIFY_FIRST.count(n) > 1
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
        # scan produces thousands of splits and this branch is a no-op.
        # conf lookup first: Spark Connect sessions have no
        # sparkContext (same compatibility contract as
        # operators.graph.random_walks / label_propagation)
        par = spark.conf.get("spark.default.parallelism", None)
        if par is None:
            try:
                par = spark.sparkContext.defaultParallelism
            except Exception:  # Spark Connect
                par = 8
        par = int(par)
        try:
            n_splits = df.rdd.getNumPartitions()
        except Exception:  # Spark Connect: no df.rdd — skip the fan-out
            n_splits = par
        if n_splits < max(par // 2, 2):
            df = df.repartition(par)
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as raw nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # naive micros
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all() -> tuple[dict, dict]:
    """Import every query module once; return (QUERIES, ORACLES).

    Queries are returned with the ``_VERIFY_FIRST`` block hoisted to the
    front (see comment above); registration order is preserved otherwise.
    """
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            import_module(mod)
        front = [n for n in _VERIFY_FIRST if n in QUERIES]
        rest = [n for n in QUERIES if n not in _VERIFY_FIRST]
        reordered = {n: QUERIES[n] for n in (*front, *rest)}
        QUERIES.clear()
        QUERIES.update(reordered)
        _loaded = True
    return QUERIES, ORACLES
