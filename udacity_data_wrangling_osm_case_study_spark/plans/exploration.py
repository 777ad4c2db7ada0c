"""SQL exploration surface (SURVEY.md §2.9) + core relational operators
(A1/A2/A6, J1/J3/J4, O1/O3, T2) mapped onto the driver testdata.

These are the reference's "import into SQL and explore" queries
(README.md:5; canonical Udacity rubric set) re-pointed at the TPC-H-ish
tables: events.user_id plays the contributor column, event_type plays
the amenity-style EAV value, nation/region play the broadcast dimension
tables.

Scale notes: every dimension join is broadcast (nation/region/part are
dimensions); top-k queries end in orderBy+limit which Spark plans as
TakeOrderedAndProject (no global sort); aggregates are partial+final
hash aggregates with map-side combine — all verified via .explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.plans.registry import (
    fan_out_scan,
    register,
    table,
)

_DEC = "decimal(18,4)"


@register(
    "table_counts",
    """
    SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'orders' AS tbl, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'events' AS tbl, COUNT(*) AS n FROM events
    ORDER BY tbl
    """,
)
def table_counts(spark, sf_dir):
    """§2.9(1): table row counts (nodes/ways analog). Per-table SCALAR
    aggregates union'd — a global agg yields its one row even for an
    empty table (n=0), exactly like SQL COUNT(*); the earlier
    union-then-groupBy rewrite silently dropped empty tables."""
    parts = [
        table(spark, sf_dir, name)
        .agg(F.count("*").alias("n"))
        .select(F.lit(name).alias("tbl"), "n")
        for name in ("customer", "orders", "lineitem", "events")
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.orderBy("tbl")


@register(
    "distinct_contributors",
    """
    SELECT COUNT(DISTINCT uid) AS n_contributors FROM (
        SELECT user_id AS uid FROM events
        UNION ALL
        SELECT o_custkey AS uid FROM orders
    )
    """,
)
def distinct_contributors(spark, sf_dir):
    """§2.9(2): COUNT(DISTINCT uid) over a UNION ALL of two tables (T2)."""
    ev = table(spark, sf_dir, "events").select(F.col("user_id").alias("uid"))
    od = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("uid"))
    return ev.unionByName(od).agg(
        F.countDistinct("uid").alias("n_contributors")
    )


@register(
    "top_contributors",
    """
    SELECT user_id, COUNT(*) AS n_events FROM events
    GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10
    """,
)
def top_contributors(spark, sf_dir):
    """§2.9(3): top-10 contributors — TakeOrderedAndProject top-k (O3)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )


@register(
    "single_appearance_users",
    """
    SELECT COUNT(*) AS n_single FROM (
        SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) = 1
    )
    """,
)
def single_appearance_users(spark, sf_dir):
    """§2.9(4): nested aggregation — users appearing exactly once."""
    once = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 1)
    )
    return once.agg(F.count("*").alias("n_single"))


@register(
    "top_event_types",
    """
    SELECT event_type, COUNT(*) AS n FROM events
    GROUP BY event_type ORDER BY n DESC, event_type
    """,
)
def top_event_types(spark, sf_dir):
    """§2.9(5) top amenities analog: hash count-by-key + sort desc (A1/O1)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


@register(
    "region_rollup",
    """
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def region_rollup(spark, sf_dir):
    """J1/J3 analog: two broadcast hash joins into small dimensions."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,4))), 2) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (1 - CAST(l_discount AS DECIMAL(30,4)))), 2) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) * 1000000
                AS HUGEINT) // COUNT(*) AS VARCHAR) AS DOUBLE) / 1000000 AS avg_qty,
           CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) * 1000000
                AS HUGEINT) // COUNT(*) AS VARCHAR) AS DOUBLE) / 1000000 AS avg_price,
           CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,4))) * 1000000
                AS HUGEINT) // COUNT(*) AS VARCHAR) AS DOUBLE) / 1000000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped pricing summary (A6 aggregate surface).

    Decimal-exact sums (addition order independent). Averages are
    floor-to-micro integer divisions of the exact decimal sums, then
    ONE division by 1e6 — the same IEEE op on the same exact integer
    in both engines, deterministic at ANY magnitude (a ROUND(double,6)
    here diverged in the last ulp once the composed magnitude+mutation
    fuzz seed pushed values to 1e10, where 6 decimal places exceed
    double precision).
    """
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)

    def avg_micro(col):
        return (
            F.expr(
                f"cast(sum(cast({col} as decimal(30,4))) * 1000000"
                " as decimal(38,0)) div count(*)"
            ).cast("double")
            / 1_000_000
        )

    # fan_out_scan (round 13): eight exact-decimal aggregates per row
    # are heavy map-side work, and the fact scan is a single split —
    # measured 1.15 s → 0.77 s at sf0.1 with the filtered frame fanned
    # before the partial aggregation (guide §2.5; no-op at real scale).
    return (
        fan_out_scan(
            li.filter(
                F.col("l_shipdate")
                <= F.lit("1998-09-02 00:00:00").cast("timestamp")
            ),
            spark,
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("sum_disc_price"),
            avg_micro("l_quantity").alias("avg_qty"),
            avg_micro("l_extendedprice").alias("avg_price"),
            avg_micro("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "orders_by_month",
    """
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
           CAST(date_part('month', o_orderdate) AS INT) AS mo,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders GROUP BY yr, mo ORDER BY yr, mo
    """,
)
def orders_by_month(spark, sf_dir):
    """F7 date scalar surface: contributions-by-date analog."""
    od = table(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
        )
        .orderBy("yr", "mo")
    )


@register(
    "top_parts_by_revenue",
    """
    SELECT p_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (1 - CAST(l_discount AS DECIMAL(30,4)))), 2) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_name ORDER BY revenue DESC, p_name LIMIT 10
    """,
)
def top_parts_by_revenue(spark, sf_dir):
    """J4: fact⋈dimension broadcast join + top-k by aggregate."""
    li = table(spark, sf_dir, "lineitem")
    part = F.broadcast(table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "p_name")
        .limit(10)
    )


@register(
    "returned_orders_by_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def returned_orders_by_priority(spark, sf_dir):
    """P5-shaped EXISTS gate as a LEFT SEMI join."""
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "customers_without_urgent_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def customers_without_urgent_orders(spark, sf_dir):
    """Anti-join (NOT EXISTS) surface."""
    cust = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(od, cust.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "distinct_flag_status_pairs",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_flag_status_pairs(spark, sf_dir):
    """A2: dropDuplicates on a pair of columns."""
    return (
        table(spark, sf_dir, "lineitem")
        .dropDuplicates(["l_returnflag", "l_linestatus"])
        .select("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "users_never_big_purchase",
    """
    SELECT uid FROM (
      SELECT DISTINCT user_id AS uid FROM events
      EXCEPT
      SELECT DISTINCT user_id AS uid FROM events
      WHERE event_type = 'purchase' AND value > 150
    ) ORDER BY uid
    """,
)
def users_never_big_purchase(spark, sf_dir):
    """Set-op surface (EXCEPT): users with no purchase event over 150."""
    ev = table(spark, sf_dir, "events")
    all_users = ev.select(F.col("user_id").alias("uid")).distinct()
    buyers = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select(F.col("user_id").alias("uid"))
        .distinct()
    )
    return all_users.exceptAll(buyers).orderBy("uid")


@register(
    "eav_pivot_user_spend",
    """
    SELECT user_id,
           ROUND(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS max_purchase,
           ROUND(COALESCE(MAX(CASE WHEN event_type = 'click' THEN value END), 0), 4) AS max_click,
           ROUND(COALESCE(MAX(CASE WHEN event_type = 'view' THEN value END), 0), 4) AS max_view,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def eav_pivot_user_spend(spark, sf_dir):
    """A5: manual pivot via conditional aggregates (the variant-pivot
    shape of get_street_names)."""
    ev = table(spark, sf_dir, "events")

    def mx(etype, alias):
        return F.round(
            F.coalesce(
                F.max(F.when(F.col("event_type") == etype, F.col("value"))), F.lit(0)
            ),
            4,
        ).alias(alias)

    return (
        ev.groupBy("user_id")
        .agg(
            mx("purchase", "max_purchase"),
            mx("click", "max_click"),
            mx("view", "max_view"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "event_value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_value_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group — both engines
    implement the same (1-d)*lo + d*hi rule over the sorted values, so
    results agree to rounding."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("event_type")
    )


@register(
    "lineitem_metric_unpivot",
    """
    WITH u AS (
        SELECT l_returnflag, 'quantity' AS metric,
               CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice',
               CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount',
               CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax',
               CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT l_returnflag, metric, CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS total
    FROM u GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
    """,
)
def lineitem_metric_unpivot(spark, sf_dir):
    """UNPIVOT (melt): wide lineitem measures to long (metric, value)
    rows, then a per-flag total — the native ``unpivot`` relational
    operator, which rewrites to a generate/expand node, NOT four
    self-unions (one scan of the fact table instead of four). The
    oracle states the same result as the UNION ALL it replaces."""
    li = table(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    wide = li.select(
        "l_returnflag",
        *[F.col(c).cast("decimal(18,2)").alias(c) for c in measures],
    )
    long = wide.unpivot(
        ids=["l_returnflag"],
        values=measures,
        variableColumnName="metric",
        valueColumnName="v",
    ).withColumn(
        "metric", F.expr("substring(metric, 3)")  # l_quantity → quantity
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(F.sum("v").cast("double").alias("total"))
        .orderBy("l_returnflag", "metric")
    )


@register(
    "salted_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def salted_distinct_users(spark, sf_dir):
    """Two-phase salted COUNT(DISTINCT) (operators.skew): distinct
    within (key, salt-of-value) buckets first, then sum — a Zipfian
    hot key never lands its whole distinct set on one reducer. Exact
    by construction (each distinct value hashes to exactly one salt
    bucket), which the plain-GROUP-BY oracle attests."""
    from udacity_data_wrangling_osm_case_study_spark.operators import skew

    return skew.salted_count_distinct(
        table(spark, sf_dir, "events"), key="event_type", value="user_id"
    ).orderBy("event_type")


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_2pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) beside the exact count —
    the constant-memory cardinality path for 100 TB groupBys. HLL
    sketch values differ across engines by construction, so the hashed
    output carries the exact count plus a deterministic ``within_2pct``
    verdict on the estimate; the oracle asserts the verdict must be
    TRUE. rsd=0.01 keeps the estimator's standard error at HALF the
    asserted band — rsd=0.02 was ~2.3× faster but its 1-sigma error
    EQUALS the band, so a regenerated testdata set could land outside
    it and fail the attestation (error is deterministic per dataset
    but varies across datasets)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.02 * F.col("exact_users")
            ).alias("within_2pct"),
        )
        .orderBy("event_type")
    )


# Benford expected first-digit shares, integer milli (log10(1+1/d)).
# One shared table feeds BOTH the Spark expression and the oracle SQL,
# so the two cannot drift.
_BENFORD_MILLI = (301, 176, 125, 97, 79, 67, 58, 51, 46)

_BENFORD_VALUES = ", ".join(
    f"({d}, {m})" for d, m in enumerate(_BENFORD_MILLI, start=1)
)


@register(
    "benford_first_digit_audit",
    f"""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders WHERE o_totalprice > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents
    ),
    obs AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT COUNT(*) AS n FROM d),
    expd AS (SELECT * FROM (VALUES {_BENFORD_VALUES})
             AS t(digit, benford_milli))
    SELECT CAST(e.digit AS BIGINT) AS digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(COALESCE(o.n_obs, 0) * 1000
                // NULLIF((SELECT n FROM tot), 0) AS BIGINT) AS obs_milli,
           CAST(e.benford_milli AS BIGINT) AS benford_milli,
           CAST(ABS(COALESCE(o.n_obs, 0) * 1000
                    // NULLIF((SELECT n FROM tot), 0)
                    - e.benford_milli) AS BIGINT) AS dev_milli
    FROM expd e LEFT JOIN obs o ON o.digit = e.digit
    ORDER BY e.digit
    """,
)
def benford_first_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / pipeline-corruption screen (Benford 1938; used in
    fraud detection and data-quality monitoring): naturally-occurring
    multiplicative amounts put digit d first with probability
    log10(1+1/d); a synthetic or truncated column deviates visibly.
    The first digit is extracted INTEGER-exactly (exact decimal cents →
    decimal string → first char), never via float log10, so boundary
    amounts (9.99 vs 10.00) classify identically in both engines;
    shares are integer milli against the shared constants table.

    Scale shape: one scan, one 9-bucket map-side-combinable groupBy —
    the digit dimension (9 rows) and the total ride a broadcast join
    and a dimension-sized window. The deviation column is the
    dashboard signal (dev_milli spikes = investigate the source)."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    digits = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("c")
        )
        .select(
            F.substring(F.col("c").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    dim = spark.range(1, 10).select(F.col("id").alias("digit"))
    benford = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_MILLI]),
        F.col("digit").cast("int"),
    )
    joined = dim.join(F.broadcast(obs), "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    w = Window.partitionBy()  # 9-row digit frame — dimension-sized
    return (
        joined.withColumn("n", F.sum("n_obs").over(w))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n_obs").cast("long").alias("n_obs"),
            # NULL share on an empty population, not a zero-division
            F.expr("n_obs * 1000 DIV nullif(n, 0)").cast("long").alias(
                "obs_milli"
            ),
            benford.cast("long").alias("benford_milli"),
        )
        .withColumn(
            "dev_milli",
            F.abs(F.col("obs_milli") - F.col("benford_milli")).cast("long"),
        )
        .orderBy("digit")
    )


@register(
    "kmv_distinct_sketch",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                                    1, 12)) AS BIGINT) AS h
        FROM du
    ),
    rk AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
    ),
    sk AS (
        SELECT event_type, COUNT(*) AS n_sk, MAX(h) AS hk
        FROM rk WHERE rn <= 64 GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    ),
    est AS (
        SELECT ex.event_type, exact_users,
               CASE WHEN n_sk < 64 THEN n_sk
                    ELSE (63 * 281474976710656) // hk END AS kmv_est
        FROM ex JOIN sk ON sk.event_type = ex.event_type
    )
    SELECT event_type,
           CAST(exact_users AS BIGINT) AS exact_users,
           CAST(kmv_est AS BIGINT) AS kmv_est,
           CAST(ABS(kmv_est - exact_users) * 1000
                // exact_users AS BIGINT) AS err_pm
    FROM est ORDER BY event_type
    """,
)
def kmv_distinct_sketch(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch per event type
    (Bar-Yossef et al. 2002) — the DETERMINISTIC sketch counterpart to
    ``approx_distinct_users``'s HLL: because the sketch is just the 64
    smallest md5 values of the member set, the estimate
    (k−1)·2⁴⁸ ÷ h_k is bit-identical across engines, partitionings and
    reruns, so the oracle attests the estimate itself, not a tolerance
    verdict. KMV sketches are also mergeable (union = k smallest of
    the concatenation) and support intersection estimates — the
    fixed-size exchange format for cross-source audience overlap where
    the exact bitmap (``audience_overlap_bitmap``) no longer fits.

    Scale shape: the k-smallest selection runs TWO-PHASE — per
    (type, input partition) prune to k via a partition-local window,
    then a final per-type window over ≤ k·P survivors — so no task
    ever sorts a full audience; the same pattern as a distributed
    top-k. Exact counts ride beside for the error column (at 100 TB
    you drop them and keep only the sketch)."""
    from pyspark.sql import Window

    k = 64
    ev = table(spark, sf_dir, "events")
    # md5 is computed BEFORE any distinct: deduping on (type, h) alone
    # is sufficient (equal users hash equally), so the sketch pays ONE
    # shuffle of (type, hash) pairs instead of a (type, user) distinct
    # followed by a second distinct on the hashes.
    hashes = (
        ev.select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    w_local = Window.partitionBy("event_type", F.spark_partition_id()).orderBy(
        "h"
    )
    pruned = (
        hashes.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    w_type = Window.partitionBy("event_type").orderBy("h")
    sk = (
        pruned.withColumn("rn", F.row_number().over(w_type))
        .filter(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sk"), F.max("h").alias("hk"))
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    est = ex.join(sk, "event_type").select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        F.when(F.col("n_sk") < k, F.col("n_sk"))
        .otherwise(F.expr(f"{k - 1} * 281474976710656 DIV hk"))
        .cast("long")
        .alias("kmv_est"),
    )
    return est.select(
        "event_type",
        "exact_users",
        "kmv_est",
        F.expr("abs(kmv_est - exact_users) * 1000 DIV exact_users")
        .cast("long")
        .alias("err_pm"),
    ).orderBy("event_type")


@register(
    "orders_column_profile",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS priority_distinct,
           COUNT(*) - COUNT(o_totalprice) AS totalprice_nulls,
           CAST(MIN(o_orderkey) AS BIGINT) AS orderkey_min,
           CAST(MAX(o_orderkey) AS BIGINT) AS orderkey_max,
           CAST(strftime(MIN(o_orderdate), '%Y-%m-%d') AS VARCHAR) AS orderdate_min,
           CAST(strftime(MAX(o_orderdate), '%Y-%m-%d') AS VARCHAR) AS orderdate_max
    FROM orders
    """,
)
def orders_column_profile(spark, sf_dir):
    """Dataset profiling in ONE aggregation pass: row count, per-column
    exact distinct counts, null counts, min/max ranges — the schema-
    discovery / data-contract check that precedes any pipeline onboarding.
    Multiple COUNT(DISTINCT) columns in one agg: Catalyst rewrites them
    into a single Expand + two-stage aggregate (one shuffle per distinct
    set, partial aggregation map-side) — no per-column scans."""
    orders = table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        (F.count("*") - F.count("o_totalprice")).alias("totalprice_nulls"),
        F.min("o_orderkey").alias("orderkey_min"),
        F.max("o_orderkey").alias("orderkey_max"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("orderdate_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("orderdate_max"),
    )


@register(
    "cms_heavy_hitters",
    """
    WITH h AS (
        SELECT user_id, t.d,
               CAST(('0x' || substr(md5('cms' || CAST(t.d AS VARCHAR) || ':'
                                        || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 32 AS bucket
        FROM events, range(0, 4) t(d)
    ),
    counters AS (SELECT d, bucket, COUNT(*) AS c FROM h GROUP BY d, bucket),
    exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
    probes AS (SELECT DISTINCT user_id, d, bucket FROM h),
    est AS (
        SELECT p.user_id, MIN(c.c) AS est_n
        FROM probes p JOIN counters c USING (d, bucket)
        GROUP BY p.user_id
    )
    SELECT e.user_id AS user_id, exact_n, est_n, est_n - exact_n AS overcount
    FROM exact e JOIN est USING (user_id)
    ORDER BY est_n DESC, user_id LIMIT 10
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over the event stream's user
    dimension — the bounded-memory frequency sketch (Cormode &
    Muthukrishnan 2005) with d=4 deterministic md5 hash rows x w=32
    counters. Unlike the HLL/percentile sketches, CMS is exactly
    reproducible from its hash functions, so the oracle recomputes the
    identical sketch and the estimate value-matches bit-for-bit —
    including the collision overestimates the output exposes
    (``overcount``; est >= exact always).

    Scale shape: the counter build is one groupBy over (d, bucket)
    with map-side combine — shuffle is d*w*partitions rows no matter
    the corpus size; the probe side joins the tiny broadcast counter
    table. At 100 TB the sketch replaces an exact groupBy whose
    distinct-key state would not fit."""
    ev = table(spark, sf_dir, "events").select("user_id")
    D, W = 4, 32

    def bucket(d_col, key):
        h = F.md5(
            F.concat(
                F.lit("cms"), d_col.cast("string"), F.lit(":"), key.cast("string")
            )
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % W

    rows = F.explode(F.array(*[F.lit(i) for i in range(D)])).alias("d")
    hashed = ev.select("user_id", rows).select(
        "user_id", "d", bucket(F.col("d"), F.col("user_id")).alias("bucket")
    )
    counters = hashed.groupBy("d", "bucket").agg(F.count("*").alias("c"))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    probes = hashed.select("user_id", "d", "bucket").distinct()
    est = (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("est_n"), "user_id")
        .limit(10)
    )


@register(
    "cms_user_event_counts",
    """
    WITH params AS (
        SELECT * FROM (VALUES (0, 823117, 105943), (1, 544231, 700417),
                              (2, 921023, 331777), (3, 687101, 964981))
               p(d, a, b)
    ),
    h AS (
        SELECT event_type, user_id, d,
               ((a * (user_id % 2147483647) + b) % 2147483647) % 256 AS bucket
        FROM events, params
    ),
    counters AS (
        SELECT event_type, d, bucket, COUNT(*) AS c FROM h GROUP BY ALL
    ),
    exact AS (
        SELECT event_type, user_id, COUNT(*) AS exact_n
        FROM events GROUP BY ALL
    ),
    probes AS (SELECT DISTINCT event_type, user_id, d, bucket FROM h),
    est AS (
        SELECT p.event_type, p.user_id, MIN(c.c) AS est_n
        FROM probes p
        JOIN counters c USING (event_type, d, bucket)
        GROUP BY ALL
    )
    SELECT e.event_type AS event_type, e.user_id AS user_id, exact_n, est_n,
           est_n - exact_n AS overcount
    FROM exact e JOIN est USING (event_type, user_id)
    ORDER BY est_n DESC, event_type, user_id LIMIT 20
    """,
)
def cms_user_event_counts_batch(spark, sf_dir):
    """Batch twin of the custom stateful streaming operator
    ``streaming.events_stream.cms_user_event_counts`` — one count-min
    grid per event_type over the user dimension, with the streaming
    module's EXACT pairwise-independent hash family (constants imported
    from it, so the two can never drift apart). The stream's terminal
    state after absorbing the whole table equals this batch sketch;
    this registry entry gives the family the oracle attestation the
    per-batch parity tests can't (DuckDB recomputes the identical
    integer sketch bit-for-bit).

    Scale shape: counter build = one groupBy (event_type, d, bucket)
    with map-side combine — state is types x d x w counters regardless
    of corpus size; probes join the broadcast counter table."""
    from udacity_data_wrangling_osm_case_study_spark.streaming.events_stream import (
        CMS_WIDTH,
        _CMS_A,
        _CMS_B,
        _CMS_P,
    )

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    params = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.lit(a).alias("a"),
                    F.lit(b).alias("b"),
                )
                for d, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
            ]
        )
    ).alias("p")
    hashed = ev.select("event_type", "user_id", params).select(
        "event_type",
        "user_id",
        F.col("p.d").alias("d"),
        (
            (F.col("p.a") * (F.col("user_id") % _CMS_P) + F.col("p.b"))
            % _CMS_P
            % CMS_WIDTH
        ).alias("bucket"),
    )
    counters = hashed.groupBy("event_type", "d", "bucket").agg(
        F.count("*").alias("c")
    )
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("exact_n")
    )
    probes = hashed.distinct()
    est = (
        probes.join(F.broadcast(counters), ["event_type", "d", "bucket"])
        .groupBy("event_type", "user_id")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        exact.join(est, ["event_type", "user_id"])
        .select(
            "event_type",
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("est_n"), "event_type", "user_id")
        .limit(20)
    )


@register(
    "incremental_agg_maintenance",
    """
    SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY yr, mo ORDER BY yr, mo
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Incremental view maintenance: the monthly-revenue aggregate is
    NOT recomputed from the full fact table — a pre-existing partial
    aggregate (the "yesterday" 6/7 of orders) is merged with the
    partial aggregate of the new delta batch (the remaining 1/7) by
    re-aggregating the union of partials: counts add, decimal sums
    add. The oracle computes the same aggregate from the full table in
    one pass, so the green row attests the merge algebra — the
    cross-ALGORITHM check that makes incremental rollup maintenance
    trustworthy. At 100 TB this is the difference between scanning a
    day and scanning a decade; the merge cost scales with |groups|,
    not |facts|."""
    od = table(spark, sf_dir, "orders")
    _dec = "decimal(18,2)"

    def partial(df):
        return df.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        ).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_dec)).alias("rev"),
        )

    base = partial(od.filter(F.col("o_orderkey") % 7 != 0))   # maintained view
    delta = partial(od.filter(F.col("o_orderkey") % 7 == 0))  # new batch
    return (
        base.unionByName(delta)
        .groupBy("yr", "mo")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("yr", "mo")
    )


@register(
    "orders_status_priority_cube",
    """
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- Spark cube emits no grand-total row on
                         -- empty input; no-op otherwise
    ORDER BY gid, status, priority
    """,
)
def orders_status_priority_cube(spark, sf_dir):
    """Multi-dimensional rollup in ONE pass: the full CUBE over
    (status, priority) — every grouping set (detail, two marginals,
    grand total) computed by a single Expand + aggregate, instead of
    four scans UNIONed together. ``grouping()`` distinguishes a real
    NULL group from a cube subtotal (here surfaced as the 'ALL'
    sentinel plus an explicit grouping id, so the output carries no
    NULLs). Exact integer cents; at scale the Expand multiplies rows
    by the number of grouping sets BEFORE the shuffle, but map-side
    partial aggregation collapses them to |groups| per partition —
    one shuffle regardless of cube width."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g1"),
            F.grouping("o_orderpriority").alias("g2"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("revenue_c"),
        )
        .select(
            F.when(F.col("g1") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("g2") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            (F.col("g1") * 2 + F.col("g2")).cast("long").alias("gid"),
            "n_orders",
            "revenue_c",
        )
        .orderBy("gid", "status", "priority")
    )


def _gini_projection(agg):
    """Final Gini projection over a one-row (n, sx, i2x) frame (sx/i2x
    may be BIGINT or DECIMAL(38,0)).

    The naive permille ``(i2x - (n+1)*sx) * 1000 div (n*sx)`` overflows
    BIGINT at sf0.1 already (n=14,999, sx≈3.75e12 cents → the ×1000
    numerator ≈1.7×10¹⁹ > 2⁶³−1; round-6 bench crash). Every term is
    therefore cleared through DECIMAL(38,0) BEFORE multiplying; ``div``
    on decimals is Spark's exact integral divide (LongType result,
    truncation toward zero — identical to floor for the non-negative
    numerator). Headroom: n·sx·1000 fits DECIMAL(38,0) up to ~10³⁵.

    The round-7 version also SURFACED the intermediate rational
    (gini_num, gini_den) as BIGINT output columns — which themselves
    pass 2⁶³ near 100× the bench SF (≈2.8×10²⁰; caught by the round-8
    100× sweep as an ANSI long-overflow crash), so the projection now
    reports only the representable quantities: n, total_cents (a real
    monetary amount — if THAT exceeds int64 cents the domain itself
    has outgrown the schema and the ANSI cast fails loudly), and the
    permille (≤ 1000 by construction). Witnessed at past-int64
    magnitudes in tests/test_overflow_margins.py."""
    num_d = (
        "cast(i2x as decimal(38,0))"
        " - (cast(n as decimal(38,0)) + 1) * cast(sx as decimal(38,0))"
    )
    den_d = "cast(n as decimal(38,0)) * cast(sx as decimal(38,0))"
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("total_cents"),
        F.expr(f"({num_d}) * 1000 div ({den_d})")
        .cast("long")
        .alias("gini_permille"),
    )


@register(
    "customer_spend_gini",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS c
        FROM orders GROUP BY o_custkey
    ),
    per_v AS (SELECT c AS v, COUNT(*) AS cnt FROM spend
              WHERE c IS NOT NULL GROUP BY c),
    ranked AS (
        SELECT v, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS off
        FROM per_v
    ),
    agg AS (
        SELECT SUM(cnt) AS n, SUM(v * cnt) AS sx,
               SUM(v * (2 * cnt * off + cnt * cnt + cnt)) AS i2x
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS total_cents,
           CAST(CAST(i2x - (n + 1) * sx AS HUGEINT) * 1000
                // CAST(n * sx AS HUGEINT) AS BIGINT)
               AS gini_permille
    FROM agg
    """,
)
def customer_spend_gini(spark, sf_dir):
    """Exact Gini coefficient of customer lifetime spend — the
    concentration metric a curation pipeline runs on source/author
    contribution balance ("how unequal is this corpus?"), here over
    per-customer order totals. All arithmetic is integer-exact: spend
    reduces to exact decimal cents, values group to distinct amounts,
    and the sorted-rank identity G = (2·Σ iₓ·xᵢ − (n+1)·Σx)/(n·Σx)
    folds per distinct value — a tied block of ``cnt`` copies of v
    occupying ranks off+1..off+cnt contributes v·(2·cnt·off + cnt² +
    cnt) to the DOUBLED rank-weighted sum, independent of intra-tie
    order. Rank offsets come from the two-phase distributed prefix sum
    (operators.packing.global_token_offsets) — no single-partition
    window. Overflow posture (fixed after the round-6 sf0.1 crash): the
    per-term sums n, sx, i2x each stay inside BIGINT through warehouse
    scale, but the derived permille numerator (gini_num × 1000) does
    NOT — it is ≈1.7×10¹⁹ at sf0.1 — so the final projection
    (``_gini_projection``) clears every derived term through
    DECIMAL(38,0); the DuckDB oracle mirrors this via explicit HUGEINT
    casts (DuckDB SUM(BIGINT) is HUGEINT-valued anyway, so the casts
    document rather than change its semantics)."""
    from udacity_data_wrangling_osm_case_study_spark.operators.packing import (
        global_token_offsets,
    )

    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("c")
    )
    # A customer whose every order total is NULL has no measurable
    # spend (SUM over all-NULL is NULL, not 0) — excluded both sides;
    # a NULL rank bucket would sort at engine-dependent ends anyway.
    per_v = (
        spend.filter(F.col("c").isNotNull())
        .groupBy(F.col("c").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    ranked = global_token_offsets(per_v, order_col="v", ntok_col="cnt")
    # The rank-weighted sum's PER-ROW terms fit BIGINT, but their SUM
    # does not at ~100x the bench SF (i2x grows as ~n·sx ≈ 5.6x10^20
    # there — caught by the round-8 100x sweep), so sx and i2x
    # accumulate as DECIMAL(38,0); the DuckDB oracle's SUM(BIGINT) is
    # HUGEINT-valued already.
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("v").cast(dec) * F.col("cnt")).alias("sx"),
        F.sum(
            F.col("v").cast(dec)
            * (
                2 * F.col("cnt").cast(dec) * F.col("start").cast(dec)
                + F.col("cnt").cast(dec) * F.col("cnt")
                + F.col("cnt")
            )
        ).alias("i2x"),
    )
    return _gini_projection(agg)
