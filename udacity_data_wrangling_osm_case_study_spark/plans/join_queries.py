"""Join-heavy analytical queries (J4 surface widened): multi-way
dimension joins, selective fact-fact joins, and rollup aggregations —
the query shapes a 100 TB warehouse actually runs.

Plan expectations (pinned by explain review): dimension sides broadcast;
the orders⋈lineitem fact join shuffles on the join key once; rollup is
a single pass with grouping sets (no union of re-scans).
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
    "shipping_priority",
    """
    SELECT l_orderkey,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                    * (1 - CAST(l_discount AS DECIMAL(30,4)))), 2) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(date_part('year', o_orderdate) AS INT) AS order_year,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, order_year, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped: selective dimension filter, two joins, top-k by
    aggregated revenue."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.year("o_orderdate").alias("order_year"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_year", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "supplier_nation_volume",
    """
    SELECT n_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                    * (1 - CAST(l_discount AS DECIMAL(30,4)))), 2) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def supplier_nation_volume(spark, sf_dir):
    """TPC-H Q5-shaped: fact → three broadcast dimension hops with a
    region filter pruning at the far end."""
    li = table(spark, sf_dir, "lineitem")
    supp = F.broadcast(table(spark, sf_dir, "supplier"))
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "revenue_rollup",
    """
    SELECT COALESCE(r_name, '<all>') AS r_name,
           COALESCE(n_name, '<all>') AS n_name,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    HAVING COUNT(*) > 0  -- Spark rollup emits NO grand-total row on
                         -- empty input; SQL emits one with n=0. No-op
                         -- on non-empty data.
    ORDER BY r_name, n_name
    """,
)
def revenue_rollup(spark, sf_dir):
    """ROLLUP grouping sets: per-nation, per-region subtotal, and grand
    total in ONE aggregation pass (Expand + single shuffle — not a
    union of re-scans)."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey).join(
        region, nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("r_name"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("n_name"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "order_lineitem_balance",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(n_items) AS BIGINT) AS total_items,
           CAST(SUM(CASE WHEN ABS(item_total - o_totalprice) < 1e-6
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_balanced
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               COUNT(l_orderkey) AS n_items,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE)
                   AS item_total
        FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderstatus, o_totalprice
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def order_lineitem_balance(spark, sf_dir):
    """Fact-fact outer join + two-level aggregation: per-order item
    totals reconciled against the order header (a data-quality check,
    the warehouse cousin of the reference's audits).

    Aggregate-below-join: lineitem pre-reduces per orderkey BEFORE the
    join (map-side partial aggregation does most of the work), so the
    join shuffles one row per order instead of one per lineitem — at
    100 TB that is the difference between shuffling the fact table and
    shuffling something order-cardinality (measured 1.3x at sf0.1,
    grows with items-per-order)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("item_total"),
    )
    per_order = orders.join(items, F.col("l_orderkey") == F.col("o_orderkey"), "left")
    return (
        per_order.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.coalesce(F.col("n_items"), F.lit(0)))
            .cast("bigint")
            .alias("total_items"),
            F.sum(
                F.when(
                    F.abs(F.col("item_total") - F.col("o_totalprice")) < 1e-6, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_balanced"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "fk_integrity",
    """
    SELECT 'lineitem->orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
               (SELECT o_orderkey FROM orders)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN
               (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
               (SELECT n_nationkey FROM nation))
    ORDER BY relationship
    """,
)
def fk_integrity(spark, sf_dir):
    """Referential-integrity report via anti-joins — the warehouse twin
    of the ETL's fk_way_exists validation rule (operators/validation.py).
    Anti-joins against broadcastable key sets: no shuffle of the fact."""
    def orphans(child, child_key, parent, parent_key, name):
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(parent_key)
        return (
            c.join(p, c[child_key] == p[parent_key], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    rels = [
        orphans("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
        orphans("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
        orphans("orders", "o_custkey", "customer", "c_custkey", "orders->customer"),
        orphans("customer", "c_nationkey", "nation", "n_nationkey", "customer->nation"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionByName(r)
    return out.orderBy("relationship")


@register(
    "merge_upsert_customers",
    """
    WITH updates AS (
        SELECT c_custkey, c_name, CAST(0.0 AS DOUBLE) AS c_acctbal,
               c_nationkey, c_mktsegment,
               (c_custkey % 500 = 0) AS deleted
        FROM customer WHERE c_custkey % 100 = 0
        UNION ALL
        SELECT 9000000 + r AS c_custkey,
               'NewCustomer#' || CAST(r AS VARCHAR) AS c_name,
               CAST(100.0 AS DOUBLE) AS c_acctbal,
               CAST(r % 25 AS INT) AS c_nationkey,
               'MACHINERY' AS c_mktsegment,
               FALSE AS deleted
        FROM range(1, 21) t(r)
    ),
    merged AS (
        -- row-existence gating (MERGE UPDATE SET *), not per-column
        -- coalesce: an update row carrying NULL nulls the column out
        SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
               COALESCE(u.deleted, FALSE) AS _dead,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
                    ELSE t.c_name END AS c_name,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                    ELSE t.c_acctbal END AS c_acctbal,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey
                    ELSE t.c_nationkey END AS c_nationkey,
               CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
                    ELSE t.c_mktsegment END AS c_mktsegment
        FROM customer t FULL OUTER JOIN updates u
          ON t.c_custkey = u.c_custkey
    )
    SELECT COUNT(*) AS n_rows,
           CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,4))), 2) AS VARCHAR) AS DOUBLE)
               AS total_acctbal,
           CAST(SUM(CASE WHEN c_custkey >= 9000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inserted,
           CAST(SUM(CASE WHEN c_acctbal = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zeroed
    FROM merged WHERE NOT _dead
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """MERGE/upsert applied to the customer snapshot: zero the balance
    of every 100th customer, tombstone every 500th, insert 20 new rows
    — then checksum the merged relation. One full-outer join on the key
    (operators/upsert.py)."""
    from udacity_data_wrangling_osm_case_study_spark.operators import upsert

    cust = table(spark, sf_dir, "customer")
    mod_updates = cust.filter(F.col("c_custkey") % 100 == 0).select(
        "c_custkey",
        "c_name",
        F.lit(0.0).alias("c_acctbal"),
        "c_nationkey",
        "c_mktsegment",
        (F.col("c_custkey") % 500 == 0).alias("deleted"),
    )
    new_rows = (
        spark.range(1, 21)
        .select(
            (F.col("id") + 9000000).alias("c_custkey"),
            F.concat(F.lit("NewCustomer#"), F.col("id").cast("string")).alias("c_name"),
            F.lit(100.0).alias("c_acctbal"),
            (F.col("id") % 25).cast("int").alias("c_nationkey"),
            F.lit("MACHINERY").alias("c_mktsegment"),
            F.lit(False).alias("deleted"),
        )
    )
    merged = upsert.merge_upsert(
        cust, mod_updates.unionByName(new_rows), "c_custkey", tombstone_col="deleted"
    )
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_acctbal"),
        F.sum(F.when(F.col("c_custkey") >= 9000000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.sum(F.when(F.col("c_acctbal") == 0.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zeroed"),
    )


@register(
    "order_value_deciles",
    """
    WITH t AS (
        SELECT o_orderpriority, o_totalprice,
               NTILE(10) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice NULLS FIRST, o_orderkey)
                   AS decile
        FROM orders
    )
    SELECT o_orderpriority, decile, COUNT(*) AS n,
           CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,4))), 2) AS VARCHAR) AS DOUBLE)
               AS total_value
    FROM t GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
)
def order_value_deciles(spark, sf_dir):
    """NTILE distribution window: per-priority order-value deciles with
    a unique tie-break so bucket assignment is engine-stable."""
    from pyspark.sql import Window

    od = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        od.withColumn("decile", F.ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("o_orderpriority", "decile")
    )


@register(
    "order_status_cube",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- Spark cube emits no grand-total row on
                         -- empty input; no-op otherwise
    ORDER BY status, priority
    """,
)
def order_status_cube(spark, sf_dir):
    """CUBE grouping sets: all four roll-up combinations of
    (status, priority) in ONE aggregation pass — Catalyst plans a
    single Expand + HashAggregate, not four re-scans of orders.
    Complements the ROLLUP in ``revenue_rollup``."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "parts_returned_and_kept",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    ORDER BY l_partkey
    """,
)
def parts_returned_and_kept(spark, sf_dir):
    """INTERSECT set-op: parts that appear both returned ('R') and kept
    ('N'). Spark plans a left-semi hash join over deduplicated sides —
    shuffle on the single join key, combinable map-side."""
    li = table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    kept = li.filter(F.col("l_returnflag") == "N").select("l_partkey")
    return returned.intersect(kept).orderBy("l_partkey")


@register(
    "parts_only_returned",
    """
    SELECT l_partkey FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 45
    EXCEPT
    SELECT l_partkey FROM lineitem
    WHERE l_returnflag = 'N' AND l_quantity >= 45
    ORDER BY l_partkey
    """,
)
def parts_only_returned(spark, sf_dir):
    """EXCEPT set-op: parts with a large returned line but no large kept
    line — planned as a left-anti hash join over distinct keys. The
    quantity gate keeps the result non-empty at small scale (without it
    every part carries every flag and the difference is trivially
    empty)."""
    li = table(spark, sf_dir, "lineitem")
    returned = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)
    ).select("l_partkey")
    kept = li.filter(
        (F.col("l_returnflag") == "N") & (F.col("l_quantity") >= 45)
    ).select("l_partkey")
    return returned.subtract(kept).orderBy("l_partkey")


@register(
    "nation_segment_grouping_sets",
    """
    SELECT COALESCE(n_name, '<all>') AS n_name,
           COALESCE(c_mktsegment, '<all>') AS seg,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE)
               AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    HAVING COUNT(*) > 0  -- Spark emits no ()-set row on empty input
    ORDER BY n_name, seg
    """,
)
def nation_segment_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (two independent breakdowns + grand total)
    via the native ``groupingSets`` API — one Expand + one aggregation
    pass, not three scans unioned. Completes the grouping-analytics
    trio next to ROLLUP (``revenue_rollup``) and CUBE
    (``order_status_cube``)."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    return (
        joined.groupingSets([["n_name"], ["c_mktsegment"], []],
                            "n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("n_name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("<all>")).alias("seg"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("n_name", "seg")
    )


# Deterministic synthetic coordinates: spread customers over a ~2x2 km
# box (the testdata carries no geo columns; deriving them from the key
# gives BOTH engines identical points, so the oracle can brute-force
# O(n²) what the Spark side answers with the grid-bucketed join — two
# different algorithms agreeing on the exact pair set).
_GEO_LAT = "22.3 + (c_custkey * 37 % 997) / 997.0 * 0.018"
_GEO_LON = "114.1 + (c_custkey * 61 % 991) / 991.0 * 0.018"


@register(
    "customer_geo_pairs",
    f"""
    WITH p AS (
        SELECT c_custkey AS id,
               {_GEO_LAT} AS lat,
               {_GEO_LON} AS lon
        FROM customer
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               2 * 6371000.0 * asin(sqrt(
                   sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
                   + cos(radians(a.lat)) * cos(radians(b.lat))
                     * sin(radians(b.lon - a.lon) / 2)
                     * sin(radians(b.lon - a.lon) / 2)
               )) AS d
        FROM p a JOIN p b ON a.id < b.id
    )
    SELECT id_a, id_b FROM pairs WHERE d <= 40.0
    ORDER BY id_a, id_b
    """,
)
def customer_geo_pairs(spark, sf_dir):
    """Spatial proximity join, oracle-attested: customers mapped to
    deterministic synthetic coordinates, all pairs within 40 m. Spark
    runs the grid-bucketed join (9-cell candidates + haversine verify,
    cost ∝ per-cell density²); the oracle brute-forces O(n²) — the
    exact pair-set match is an algorithm-level equivalence check, not
    a reimplementation. The output is the PAIR SET alone: the lattice
    coordinates repeat exact distances hundreds of times, and one of
    those values lands ON a half-centimeter, so any quantized distance
    column flips per engine's last trig ulp — while the 40 m filter
    boundary is ulp-safe (no lattice distance lies within 1e-9 m of
    it; verified: both engines produce the identical 2,095 pairs)."""
    from udacity_data_wrangling_osm_case_study_spark.operators import geo

    # fan_out_scan (round 13): the synthetic-coordinate derivation and
    # the 9-cell grid explode are row-local work on a single-split
    # scan — fanning the 3-column frame measured 1.55 s → 1.28 s at
    # sf0.1 (guide §2.5; no-op at real scale).
    pts = fan_out_scan(
        table(spark, sf_dir, "customer").selectExpr(
            "c_custkey AS id",
            f"{_GEO_LAT} AS lat",
            f"{_GEO_LON} AS lon",
        ),
        spark,
    )
    # round_dp=9 keeps the operator's distance effectively raw: the
    # centimeter quantization below must round the RAW value once —
    # rounding to 2dp first and again to cm double-rounds through an
    # inexact binary representation and flips boundary centimeters.
    pairs = geo.points_within_radius(pts, 40.0, ref_lat_deg=22.4, round_dp=9)
    return pairs.select("id_a", "id_b").orderBy("id_a", "id_b")


@register(
    "part_copurchase_triangles",
    """
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def part_copurchase_triangles(spark, sf_dir):
    """Graph analytics: triangles in the part co-purchase graph (parts
    appearing in the same order are adjacent). The Spark side runs the
    degree-ordered wedge algorithm (operators.graph — hub-safe,
    out-degree bounded by sqrt(m)); the oracle counts the same
    triangles with the naive id-ordered 3-way self-join — another
    cross-algorithm equivalence attestation."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.copurchase_pairs(li, "l_orderkey", "l_partkey").select(
        "src", "dst"
    )
    return graph.triangle_count(edges)


@register(
    "part_clustering_coeff",
    """
    WITH pairs AS (
        SELECT l1.l_orderkey AS ok, l1.l_partkey AS a, l2.l_partkey AS b
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    e AS (SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ),
    tcnt AS (SELECT v, COUNT(*) AS n_tri FROM corners GROUP BY v),
    deg AS (
        SELECT v, COUNT(*) AS deg FROM (
            SELECT a AS v FROM e UNION ALL SELECT b FROM e
        ) GROUP BY v
    )
    SELECT d.v AS part,
           CAST(d.deg AS BIGINT) AS deg,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(2 * COALESCE(t.n_tri, 0) * 1000
                // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_pm
    FROM deg d LEFT JOIN tcnt t ON t.v = d.v
    WHERE d.deg >= 2
    ORDER BY cc_pm DESC, part LIMIT 20
    """,
)
def part_clustering_coeff(spark, sf_dir):
    """Per-part local clustering coefficient over the support-≥2
    co-purchase graph — the neighborhood-density signal behind
    community detection and co-buy anomaly screens (a part whose
    neighbors all co-occur with each other is inside a coherent basket
    community; cc near 0 marks a hub bridging unrelated baskets).

    Spark runs the degree-ordered wedge enumeration with row-local
    corner explode (operators.graph.clustering_coefficient — hub-safe,
    wedge fan-out bounded by the orientation); the oracle counts the
    same triangles with the naive id-ordered 3-way self-join and rolls
    corners up with UNION ALL — a cross-algorithm equivalence
    attestation like ``part_copurchase_triangles``. Integer-permille
    output keeps the comparison bit-exact."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    # assume_canonical: this edge frame IS structurally canonical —
    # copurchase_pairs emits src < dst only (so no self-loops and no
    # reversed duplicates) and the support groupBy(src, dst) output is
    # unique by key — so the operator's normalize + distinct would
    # re-shuffle the edge frame to remove nothing (round 14; measured
    # 2.6-10.2 s → 1.9-5.1 s at sf0.1, every interleaved pair ordered;
    # oracle green — per-site proof per the r13 sweep lesson).
    return (
        graph.clustering_coefficient(edges, assume_canonical=True)
        .select(F.col("v").alias("part"), "deg", "n_tri", "cc_pm")
        .orderBy(F.desc("cc_pm"), "part")
        .limit(20)
    )


@register(
    "part_communities",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    e2 AS (SELECT a, b FROM p GROUP BY a, b HAVING COUNT(*) >= 2),
    e AS (SELECT a AS src, b AS dst FROM e2
          UNION ALL SELECT b, a FROM e2),
    l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM e),
    n1 AS (SELECT e.src AS v, l0.lbl, COUNT(*) AS c
           FROM e JOIN l0 ON l0.v = e.dst GROUP BY e.src, l0.lbl),
    l1 AS (SELECT v, lbl FROM (
               SELECT v, lbl,
                      ROW_NUMBER() OVER (PARTITION BY v
                                         ORDER BY c DESC, lbl) AS rn
               FROM n1) WHERE rn = 1),
    n2 AS (SELECT e.src AS v, l1.lbl, COUNT(*) AS c
           FROM e JOIN l1 ON l1.v = e.dst GROUP BY e.src, l1.lbl),
    l2 AS (SELECT v, lbl FROM (
               SELECT v, lbl,
                      ROW_NUMBER() OVER (PARTITION BY v
                                         ORDER BY c DESC, lbl) AS rn
               FROM n2) WHERE rn = 1),
    n3 AS (SELECT e.src AS v, l2.lbl, COUNT(*) AS c
           FROM e JOIN l2 ON l2.v = e.dst GROUP BY e.src, l2.lbl),
    l3 AS (SELECT v, lbl FROM (
               SELECT v, lbl,
                      ROW_NUMBER() OVER (PARTITION BY v
                                         ORDER BY c DESC, lbl) AS rn
               FROM n3) WHERE rn = 1)
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(v) AS BIGINT) AS min_member
    FROM l3 GROUP BY lbl ORDER BY n_members DESC, community LIMIT 20
    """,
    scan_budget=2,  # LPA supersteps (label frames checkpointed)
)
def part_communities(spark, sf_dir):
    """Community detection over the support-≥2 co-purchase graph via
    deterministic label propagation (operators.graph.label_propagation
    — mode-of-neighbor-labels, ties toward the smallest label, fixed 3
    supersteps): which basket communities the catalog decomposes into,
    reported as the 20 largest communities with their size and lowest
    member id. The oracle replays all 3 supersteps as unrolled CTEs
    (neighbor-label counts + per-vertex mode window) — the same
    cross-engine lockstep pattern as ``part_pagerank`` and
    ``part_random_walk_pairs``. Registered with a scan budget: the
    checkpointed superstep loop must keep the plan at ≤2 fact scans."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e2 = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    sym = graph.symmetrize(e2)
    labels = graph.label_propagation(sym, n_iter=3)
    return (
        labels.groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("v").cast("long").alias("min_member"),
        )
        .select(
            F.col("lbl").cast("long").alias("community"),
            "n_members",
            "min_member",
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


@register(
    "part_kcore",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    eu AS (SELECT a, b FROM p GROUP BY a, b HAVING COUNT(*) >= 2),
    e0 AS (SELECT a AS src, b AS dst FROM eu
           UNION ALL SELECT b, a FROM eu),
    k1 AS (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= 3),
    e1 AS (SELECT e.src, e.dst FROM e0 e
           JOIN k1 x ON x.src = e.src JOIN k1 y ON y.src = e.dst),
    k2 AS (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 3),
    e2 AS (SELECT e.src, e.dst FROM e1 e
           JOIN k2 x ON x.src = e.src JOIN k2 y ON y.src = e.dst),
    k3 AS (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 3),
    e3 AS (SELECT e.src, e.dst FROM e2 e
           JOIN k3 x ON x.src = e.src JOIN k3 y ON y.src = e.dst),
    k4 AS (SELECT src FROM e3 GROUP BY src HAVING COUNT(*) >= 3),
    e4 AS (SELECT e.src, e.dst FROM e3 e
           JOIN k4 x ON x.src = e.src JOIN k4 y ON y.src = e.dst)
    SELECT CAST(src AS BIGINT) AS part,
           CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM e4 GROUP BY src
    ORDER BY core_deg DESC, part LIMIT 20
    """,
    scan_budget=2,  # peeling supersteps (edge frames checkpointed)
)
def part_kcore(spark, sf_dir):
    """Dense-core extraction: 4 rounds of 3-core peeling over the
    support-≥2 co-purchase graph (operators.graph.kcore_peel — delete
    every vertex with current degree < 3 each round), reporting the 20
    highest-degree core members. At sf0.01 this keeps 983 of 1,880
    parts — the coherent-basket core, with hubs and one-off pairings
    peeled away; the classic precursor to community/influence analysis
    and the cheapest dense-subgraph screen at catalog scale. The
    oracle replays all 4 peeling rounds as unrolled CTEs (degree
    HAVING + two endpoint joins per round) — the same cross-engine
    superstep lockstep as ``part_pagerank``/``part_communities``.
    Registered with a scan budget: the checkpointed peel loop must
    keep the plan at ≤2 fact scans."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e2 = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    sym = graph.symmetrize(e2)
    return (
        graph.kcore_peel(sym, k=3, n_rounds=4)
        .select(F.col("v").cast("long").alias("part"), "core_deg")
        .orderBy(F.desc("core_deg"), "part")
        .limit(20)
    )


@register(
    "part_bfs_hops",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    eu AS (SELECT a, b FROM p GROUP BY a, b HAVING COUNT(*) >= 2),
    e AS (SELECT a AS src, b AS dst FROM eu UNION ALL SELECT b, a FROM eu),
    seeds AS (SELECT DISTINCT src AS seed FROM e ORDER BY seed LIMIT 3),
    v0 AS (SELECT seed, seed AS v, 0 AS hop FROM seeds),
    f1 AS (SELECT DISTINCT s.seed, e.dst AS v
           FROM seeds s JOIN e ON e.src = s.seed),
    n1 AS (SELECT f1.seed, f1.v FROM f1
           WHERE NOT EXISTS (SELECT 1 FROM v0
                             WHERE v0.seed = f1.seed AND v0.v = f1.v)),
    v1 AS (SELECT * FROM v0 UNION ALL SELECT seed, v, 1 FROM n1),
    f2 AS (SELECT DISTINCT n1.seed, e.dst AS v
           FROM n1 JOIN e ON e.src = n1.v),
    n2 AS (SELECT f2.seed, f2.v FROM f2
           WHERE NOT EXISTS (SELECT 1 FROM v1
                             WHERE v1.seed = f2.seed AND v1.v = f2.v)),
    v2 AS (SELECT * FROM v1 UNION ALL SELECT seed, v, 2 FROM n2),
    f3 AS (SELECT DISTINCT n2.seed, e.dst AS v
           FROM n2 JOIN e ON e.src = n2.v),
    n3 AS (SELECT f3.seed, f3.v FROM f3
           WHERE NOT EXISTS (SELECT 1 FROM v2
                             WHERE v2.seed = f3.seed AND v2.v = f3.v)),
    v3 AS (SELECT * FROM v2 UNION ALL SELECT seed, v, 3 FROM n3)
    SELECT CAST(seed AS BIGINT) AS seed, CAST(hop AS INT) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(v) AS BIGINT) AS sum_v
    FROM v3 WHERE hop > 0
    GROUP BY seed, hop ORDER BY seed, hop
    """,
    scan_budget=2,  # BFS supersteps (frontier/visited checkpointed)
)
def part_bfs_hops(spark, sf_dir):
    """Multi-source BFS hop distances (operators.graph.bfs_hops) over
    the support-≥2 co-purchase graph: from the 3 lowest-id connected
    parts, how many parts sit exactly 1, 2, 3 hops away (with an id
    checksum per ring, a far stronger cross-engine check than counts
    alone). Unlike ``part_2hop_reach`` this labels MINIMUM distances —
    the frontier/visited anti-join construction, not a union of hop
    closures — so the operator under test is the real distributed SSSP
    superstep. The oracle replays all 3 supersteps as unrolled CTEs
    (frontier join + NOT EXISTS visited check per hop) — the same
    lockstep pattern as ``part_pagerank``/``part_kcore``. Registered
    with a scan budget: the checkpointed frontier loop must keep the
    plan at ≤2 fact scans."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e2 = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    from udacity_data_wrangling_osm_case_study_spark.operators.iterative import (
        snap_lazy,
    )

    # ONE lazy snapshot of the symmetric edge frame shared by the seeds
    # derivation AND the BFS operator (round 14, guide §2.4/§5): both
    # consumers previously re-derived the whole co-purchase edge build
    # — and because the operator checkpoints its copy, the two subtrees
    # ran in SEPARATE query executions where AQE exchange reuse cannot
    # fire, so the ~2.4 s build executed twice. Interleaved A/B at
    # sf0.1: 4.7-6.0 s → 3.1-4.1 s, every pair ordered.
    sym = snap_lazy(graph.symmetrize(e2))
    seeds = (
        sym.select("src")
        .distinct()
        .orderBy("src")
        .limit(3)
        .select(F.col("src").alias("seed"))
    )
    reached = graph.bfs_hops(sym, seeds, n_hops=3)
    return (
        reached.filter(F.col("hop") > 0)
        .groupBy("seed", "hop")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum("v").cast("long").alias("sum_v"),
        )
        .select(
            F.col("seed").cast("long").alias("seed"),
            F.col("hop").cast("int").alias("hop"),
            "n_vertices",
            "sum_v",
        )
        .orderBy("seed", "hop")
    )


@register(
    "orders_above_customer_avg",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2))
          * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
)
def orders_above_customer_avg(spark, sf_dir):
    """Correlated scalar subqueries: orders strictly above their own
    customer's average order value — written as TWO correlated
    subqueries (count and sum) that Catalyst decorrelates into
    aggregate+join (no per-row re-execution; the optimized plan has no
    subquery nodes). The predicate is ``price × count > sum`` on exact
    decimals, so the comparison is integer-exact in both engines —
    dividing to a float average would put boundary rows at the mercy
    of rounding."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_corr_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders_corr_v o
        WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM orders_corr_v i
                 WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FROM orders_corr_v i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


@register(
    "part_pagerank",
    """
    WITH und AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    e AS (SELECT a AS src, b AS dst FROM und
          UNION ALL SELECT b, a FROM und),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM deg),
    r1 AS (SELECT e.dst AS v, 150000 + 85 * SUM(r0.r // deg.outdeg) // 100 AS r
           FROM e JOIN deg USING (src) JOIN r0 ON r0.v = e.src GROUP BY e.dst),
    r2 AS (SELECT e.dst AS v, 150000 + 85 * SUM(r1.r // deg.outdeg) // 100 AS r
           FROM e JOIN deg USING (src) JOIN r1 ON r1.v = e.src GROUP BY e.dst),
    r3 AS (SELECT e.dst AS v, 150000 + 85 * SUM(r2.r // deg.outdeg) // 100 AS r
           FROM e JOIN deg USING (src) JOIN r2 ON r2.v = e.src GROUP BY e.dst)
    SELECT v AS part, CAST(r AS BIGINT) AS rank_micro
    FROM r3 ORDER BY rank_micro DESC, part LIMIT 20
    """,
    scan_budget=2,  # pagerank supersteps
)
def part_pagerank(spark, sf_dir):
    """Iterative graph centrality: 3 integer-exact PageRank supersteps
    over the part co-purchase graph (operators.graph.pagerank — each
    superstep is one edge→rank join + one map-side-combinable groupBy;
    micro-unit integer arithmetic makes the iteration engine-portable,
    which float PageRank is not). Top-20 hub parts with id
    tie-break."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Edge build via per-order array expansion (one shuffle + row-local
    # k² in codegen) instead of the fact-fact self-join; no fan-out cap
    # needed (TPC-H orders carry ≤ 7 lineitems) — see
    # graph.copurchase_pairs for the opt-in dense-group bound.
    edges = graph.copurchase_pairs(li, "l_orderkey", "l_partkey").select(
        "src", "dst"
    )
    return (
        graph.pagerank(edges, n_iter=3)
        .select(F.col("v").alias("part"), "rank_micro")
        .orderBy(F.desc("rank_micro"), "part")
        .limit(20)
    )


@register(
    "part_2hop_reach",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    w AS (
        SELECT o1.l_partkey AS a, o2.l_partkey AS b, COUNT(*) AS shared
        FROM op o1 JOIN op o2
          ON o1.l_orderkey = o2.l_orderkey AND o1.l_partkey < o2.l_partkey
        GROUP BY o1.l_partkey, o2.l_partkey
        HAVING COUNT(*) >= 2
    ),
    e AS (SELECT a AS src, b AS dst FROM w UNION ALL SELECT b, a FROM w),
    seeds AS (SELECT DISTINCT l_partkey AS seed FROM lineitem
              ORDER BY seed LIMIT 5),
    h1 AS (SELECT DISTINCT s.seed, e.dst AS v
           FROM seeds s JOIN e ON e.src = s.seed),
    h2 AS (SELECT DISTINCT h1.seed, e.dst AS v
           FROM h1 JOIN e ON e.src = h1.v),
    vis AS (
        SELECT seed, seed AS v FROM seeds
        UNION SELECT seed, v FROM h1
        UNION SELECT seed, v FROM h2
    )
    SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_reach
    FROM vis WHERE v <> seed GROUP BY seed ORDER BY seed
    """,
)
def part_2hop_reach(spark, sf_dir):
    """Bounded-depth BFS (k-hop reachability): how many parts lie
    within 2 hops of each of the 5 lowest-keyed parts in the
    co-purchase graph, thresholded to edges backed by ≥2 shared orders
    (the support cut that keeps a co-occurrence graph sparse enough to
    traverse at scale). Multi-source: all seeds ride ONE frontier
    frame, so each hop is one edge join + distinct regardless of seed
    count (operators.graph.khop_reach); the oracle unrolls the same
    two hops as SQL joins."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Per-order pair expansion emits each (src, dst) once per sharing
    # order (collect_set dedupes within the order), so the support
    # count is a plain groupBy over the pair stream.
    edges = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    seeds = (
        op.select(F.col("l_partkey").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(5)
    )
    return graph.khop_reach(edges, seeds, k=2).orderBy("seed")


@register(
    "customer_snapshot_diff",
    """
    WITH v1 AS (SELECT c_custkey AS k, c_name,
                       CAST(c_acctbal AS DECIMAL(18,2)) AS bal
                FROM customer),
    v2 AS (
        SELECT k, c_name,
               CASE WHEN k % 10 = 0 THEN bal + 100 ELSE bal END AS bal
        FROM v1 WHERE k % 13 <> 0
        UNION ALL
        SELECT k + 10000000, c_name, bal FROM v1 WHERE k % 17 = 0
    ),
    d AS (
        SELECT COALESCE(v2.k, v1.k) AS k,
               CASE WHEN v1.k IS NULL THEN 'I'
                    WHEN v2.k IS NULL THEN 'D'
                    WHEN v1.c_name IS DISTINCT FROM v2.c_name
                         OR v1.bal IS DISTINCT FROM v2.bal THEN 'U'
               END AS op
        FROM v1 FULL JOIN v2 ON v1.k = v2.k
    )
    SELECT op, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
    FROM d WHERE op IS NOT NULL GROUP BY op ORDER BY op
    """,
)
def customer_snapshot_diff(spark, sf_dir):
    """Snapshot diffing — the change-feed GENERATOR closing the CDC
    triangle (operators.upsert.snapshot_diff → merge_upsert → SCD2
    history): v2 is a derived snapshot with deterministic updates
    (k%10), deletes (k%13) and inserts (k%17, shifted keys); the diff
    classifies every key as I/U/D via one null-safe full-outer join.
    Output: per-op row count + key checksum."""
    from udacity_data_wrangling_osm_case_study_spark.operators import upsert

    cust = table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("k"),
        "c_name",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    v2 = v1.filter(F.col("k") % 13 != 0).select(
        "k",
        "c_name",
        F.when(F.col("k") % 10 == 0, F.col("bal") + 100)
        .otherwise(F.col("bal"))
        .cast("decimal(18,2)")
        .alias("bal"),
    ).unionAll(
        v1.filter(F.col("k") % 17 == 0).select(
            (F.col("k") + 10_000_000).alias("k"), "c_name", "bal"
        )
    )
    diff = upsert.snapshot_diff(v1, v2, "k", ["c_name", "bal"])
    return (
        diff.groupBy("op")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("key_sum"),
        )
        .orderBy("op")
    )


@register(
    "part_association_rules",
    """
    WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                     FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM baskets),
    item AS (SELECT p, COUNT(*) AS c FROM baskets GROUP BY p),
    pair AS (
        SELECT a.p AS p_a, b.p AS p_b, COUNT(*) AS c_ab
        FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 3
    )
    SELECT p_a, p_b, c_ab,
           CAST(c_ab * 10000 // ia.c AS BIGINT) AS confidence_bp,
           CAST(c_ab * n.n_orders * 1000 // (ia.c * ib.c) AS BIGINT)
               AS lift_milli
    FROM pair
    JOIN item ia ON ia.p = p_a
    JOIN item ib ON ib.p = p_b, n
    ORDER BY lift_milli DESC, c_ab DESC, p_a, p_b LIMIT 20
    """,
)
def part_association_rules(spark, sf_dir):
    """Market-basket association rules over order baskets: pair
    support (co-occurrence count, min 3), confidence P(b|a) in basis
    points, lift P(a,b)/(P(a)P(b)) in milli-units — all integer
    cross-multiplied, so the ranking is engine-exact (float lift is
    not). Top-20 by lift. The frequent-itemset support counts reduce
    per item/pair BEFORE any join (the a-priori shape); the basket
    self-join is order-key-blocked, never corpus².

    At 100 TB the pair explosion is bounded by per-basket size (same
    blocking as the co-purchase graph); a hot mega-basket is the skew
    to cap first (basket-size ceiling before the self-join)."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = baskets.select("o").distinct().agg(
        F.count("*").alias("n_orders")
    )
    item = baskets.groupBy("p").agg(F.count("*").alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p_a"), F.col("b.p").alias("p_b"))
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = item.select(F.col("p").alias("p_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("p").alias("p_b"), F.col("c").alias("c_b"))
    return (
        pair.join(ia, "p_a")
        .join(ib, "p_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p_a",
            "p_b",
            "c_ab",
            F.expr("c_ab * 10000 DIV c_a").alias("confidence_bp"),
            F.expr("c_ab * n_orders * 1000 DIV (c_a * c_b)").alias("lift_milli"),
        )
        .orderBy(F.desc("lift_milli"), F.desc("c_ab"), "p_a", "p_b")
        .limit(20)
    )


@register(
    "part_pareto_frontier",
    """
    WITH pts AS (
        SELECT p_partkey, p_name, p_retailprice, p_size FROM part
        WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p_partkey, p_name,
           ROUND(p_retailprice, 2) AS price, p_size AS size
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.p_retailprice < p.p_retailprice AND q.p_size > p.p_size
    )
    ORDER BY price, p_partkey
    """,
)
def part_pareto_frontier(spark, sf_dir):
    """Skyline: the parts no other part beats on BOTH price (lower)
    and size (bigger) — the classic multi-criteria shortlist. The
    engine computes it join-free via a distributed strict-prefix max
    over price levels (operators.skyline — O(n log n), two-phase, no
    single-partition window); the oracle is the O(n^2) NOT EXISTS
    dominance join, so the green row attests cross-ALGORITHM
    equivalence, not just reimplementation agreement."""
    from udacity_data_wrangling_osm_case_study_spark.operators import skyline

    # A point missing either criterion is not comparable — dominance
    # over NULL is three-valued garbage; excluded both sides.
    part = table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    ).select("p_partkey", "p_name", "p_retailprice", "p_size")
    frontier = skyline.pareto_frontier_2d(part, "p_retailprice", "p_size")
    return frontier.select(
        "p_partkey", "p_name",
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").alias("size"),
    ).orderBy("price", "p_partkey")


@register(
    "partkey_skew_report",
    """
    WITH c AS (
        SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
    ),
    r AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n, k) AS i FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) AS BIGINT) AS max_n,
           CAST(MAX(n) * 10000 // SUM(n) AS BIGINT) AS max_share_bp,
           CAST((2 * SUM(i * n) - (COUNT(*) + 1) * SUM(n)) * 10000
                // (COUNT(*) * SUM(n)) AS BIGINT) AS gini_bp
    FROM r
    """,
)
def partkey_skew_report(spark, sf_dir):
    """Join-key skew diagnosis for lineitem.l_partkey: cardinality,
    heaviest-key share, and the Gini coefficient of the per-key row
    distribution, integer-exact (operators.skew.key_skew_report). The
    operational pre-check before choosing shuffle vs salted vs
    AQE-split join strategies at scale; the oracle recomputes the rank
    formulation with a plain SQL window."""
    from udacity_data_wrangling_osm_case_study_spark.operators import skew

    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    return skew.key_skew_report(li, "l_partkey")


@register(
    "part_similarity_topk",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT l_partkey AS p, COUNT(*) AS c FROM op GROUP BY l_partkey),
    co AS (
        SELECT o1.l_partkey AS a, o2.l_partkey AS b, COUNT(*) AS cab
        FROM op o1 JOIN op o2
          ON o1.l_orderkey = o2.l_orderkey AND o1.l_partkey < o2.l_partkey
        GROUP BY o1.l_partkey, o2.l_partkey
    ),
    sym AS (
        SELECT a, b, cab FROM co UNION ALL SELECT b, a, cab FROM co
    ),
    scored AS (
        SELECT s.a AS part, s.b AS neighbor,
               s.cab * s.cab * 100000000 // (ta.c * tb.c) AS sim2_e8
        FROM sym s
        JOIN tot ta ON ta.p = s.a
        JOIN tot tb ON tb.p = s.b
        WHERE s.a < 100
    ),
    ranked AS (
        SELECT part, neighbor, sim2_e8,
               ROW_NUMBER() OVER (PARTITION BY part
                                  ORDER BY sim2_e8 DESC, neighbor) AS rk
        FROM scored
    )
    SELECT part, neighbor, CAST(sim2_e8 AS BIGINT) AS sim2_e8,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY part, rk
    """,
)
def part_similarity_topk(spark, sf_dir):
    """Item-item collaborative filtering: for each low-keyed part, the
    3 most similar parts by co-purchase cosine — ranked on the SQUARED
    cosine in integer 1e-8 units (``c_ab²·1e8 div (c_a·c_b)``), a
    monotone transform that keeps the ranking exact without sqrt/float.
    Shape: distinct (order, part) → pair counts (the same bounded
    self-join as the triangle/2-hop edge builds), per-part totals
    broadcast back, one per-part top-k window over pair rows. The
    recsys companion to part_association_rules (which ranks by
    lift/confidence instead)."""
    from pyspark.sql import Window

    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # The .distinct() is REQUIRED here, unlike the copurchase_pairs
    # edge builds: this query's co-occurrence is a raw SELF-JOIN of
    # the (order, part) stream plus a raw per-part COUNT, and neither
    # is duplicate-agnostic — a part listed twice in one order would
    # inflate both tot and cab (the oracle's op CTE is SELECT
    # DISTINCT). The round-13 distinct-removal sweep over-reached to
    # this site and was caught by the full-registry oracle gate;
    # restored with this warning.
    op = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    tot = op.groupBy(F.col("l_partkey").alias("p")).agg(F.count("*").alias("c"))
    o1, o2 = op.alias("o1"), op.alias("o2")
    co = (
        o1.join(
            o2,
            (F.col("o1.l_orderkey") == F.col("o2.l_orderkey"))
            & (F.col("o1.l_partkey") < F.col("o2.l_partkey")),
        )
        .groupBy(
            F.col("o1.l_partkey").alias("a"), F.col("o2.l_partkey").alias("b")
        )
        .agg(F.count("*").alias("cab"))
    )
    sym = graph.symmetrize(co, "a", "b")
    scored = (
        sym.filter(F.col("a") < 100)
        .join(F.broadcast(tot.withColumnRenamed("p", "a").withColumnRenamed("c", "ca")), "a")
        .join(F.broadcast(tot.withColumnRenamed("p", "b").withColumnRenamed("c", "cb")), "b")
        .select(
            F.col("a").alias("part"),
            F.col("b").alias("neighbor"),
            F.expr("cab * cab * 100000000 div (ca * cb)").alias("sim2_e8"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.desc("sim2_e8"), "neighbor")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("part", "neighbor", "sim2_e8", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("part", "rk")
    )


@register(
    "order_price_tiers",
    """
    WITH tiers AS (
        SELECT * FROM (VALUES
            ('T1_budget',      0,  50000),
            ('T2_standard',  50000, 150000),
            ('T3_premium',  150000, 300000),
            ('T4_luxury',   300000, 1000000000)
        ) AS t(tier, lo_c, hi_c)
    ),
    o AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
    )
    SELECT t.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.price_c) AS BIGINT) AS total_c
    FROM o JOIN tiers t
      ON o.price_c >= t.lo_c AND o.price_c < t.hi_c
    GROUP BY t.tier ORDER BY t.tier
    """,
)
def order_price_tiers(spark, sf_dir):
    """Non-equi (banded range) dimension join: every order matched to
    its price tier by a [lo, hi) interval predicate against a tiny
    broadcast tier dimension — the theta-join shape a rate card /
    tax bracket / SLA band lookup has. The dimension broadcasts, so
    the interval probe is map-side (BroadcastNestedLoopJoin over k=4
    rows — bounded fan-out, no shuffle); at larger tier counts the
    same query becomes a sorted interval lookup. Integer cents
    boundaries: no float edge ambiguity at tier borders."""
    tiers = spark.createDataFrame(
        [
            ("T1_budget", 0, 50_000),
            ("T2_standard", 50_000, 150_000),
            ("T3_premium", 150_000, 300_000),
            ("T4_luxury", 300_000, 1_000_000_000),
        ],
        ["tier", "lo_c", "hi_c"],
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    joined = o.join(
        F.broadcast(tiers),
        (o.price_c >= tiers.lo_c) & (o.price_c < tiers.hi_c),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("price_c").cast("bigint").alias("total_c"),
        )
        .orderBy("tier")
    )


@register(
    "balance_band_pairs",
    """
    SELECT c_custkey, s_suppkey,
           CAST(ROUND(c_acctbal * 100) - ROUND(s_acctbal * 100) AS BIGINT)
               AS diff_cents
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND ABS(ROUND(c.c_acctbal * 100) - ROUND(s.s_acctbal * 100)) <= 5000
    ORDER BY c_custkey, s_suppkey
    """,
)
def balance_band_pairs(spark, sf_dir):
    """Big-big band join: customer/supplier pairs in the same nation
    whose account balances lie within $50 of each other. A band
    predicate between two large tables is the classic nested-loop trap;
    ``operators.temporal.value_band_join`` buckets both sides by
    floor(cents / band) and expands one side to its three adjacent
    buckets, so the plan is a plain equi-join on (nation, bucket) with
    the exact band as a post-filter — candidates bounded by per-bucket
    products at any scale. The oracle runs the naive non-equi join.
    All-integer cents, so bucket edges agree across engines."""
    from udacity_data_wrangling_osm_case_study_spark.operators import temporal

    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        "c_custkey",
        cents("c_acctbal").alias("bal_c"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        "s_suppkey",
        cents("s_acctbal").alias("bal_c"),
    )
    pairs = temporal.value_band_join(
        cust, supp, keys=["nationkey"], left_val="bal_c", right_val="bal_c",
        max_diff=5000,
    )
    return pairs.select(
        F.col("l_c_custkey").alias("c_custkey"),
        F.col("r_s_suppkey").alias("s_suppkey"),
        (F.col("l_bal_c") - F.col("r_bal_c")).cast("long").alias("diff_cents"),
    ).orderBy("c_custkey", "s_suppkey")


@register(
    "nation_revenue_share",
    """
    WITH rev AS (
        SELECT r_name, n_name,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(rev_c AS BIGINT) AS rev_c,
           CAST(rev_c * 10000 // SUM(rev_c) OVER (PARTITION BY r_name)
                AS BIGINT) AS share_of_region_bp,
           CAST(SUM(rev_c) OVER (PARTITION BY r_name) * 10000
                // SUM(rev_c) OVER () AS BIGINT) AS region_share_bp
    FROM rev ORDER BY r_name, n_name
    """,
)
def nation_revenue_share(spark, sf_dir):
    """Percent-of-parent rollup: each nation's share of its region's
    revenue and each region's share of the grand total — the ratio-to-
    parent report every BI layer asks of a warehouse. The fact table
    reduces to one ~|nations|-row aggregate FIRST (exact integer
    cents); both parent sums are then windows over that tiny frame, so
    the shares cost nothing beyond the single fact shuffle. Integer
    basis points via floor division — no float ratios in the output."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
        )
    )
    from pyspark.sql import Window

    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    # Derived x10000 numerators clear through DECIMAL(38,0): rev_c is
    # bounded by BIGINT, but rev_c*10000 is not (the gini overflow
    # pattern — caught by the mag6 fuzz variant at ~1e16-cent revenue;
    # DuckDB's SUM is HUGEINT-backed so the oracle was already exact).
    dec = "decimal(38,0)"
    return rev.select(
        "r_name",
        "n_name",
        "rev_c",
        (F.col("rev_c").cast(dec) * 10000).alias("_num_r"),
        F.sum(F.col("rev_c").cast(dec)).over(w_region).alias("_den_r"),
        (F.sum(F.col("rev_c").cast(dec)).over(w_region) * 10000).alias(
            "_num_t"
        ),
        F.sum(F.col("rev_c").cast(dec)).over(w_all).alias("_den_t"),
    ).select(
        "r_name",
        "n_name",
        "rev_c",
        # same zero-denominator convention as nation_market_share:
        # a region (or grand total) cancelling to exactly 0 cents makes
        # the share NULL on both engines instead of an ANSI throw
        F.when(F.col("_den_r") != 0, F.expr("_num_r div _den_r"))
        .cast("long").alias("share_of_region_bp"),
        F.when(F.col("_den_t") != 0, F.expr("_num_t div _den_t"))
        .cast("long").alias("region_share_bp"),
    ).orderBy("r_name", "n_name")


@register(
    "audience_overlap_bitmap",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS co_users
    FROM tu a JOIN tu b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
)
def audience_overlap_bitmap(spark, sf_dir):
    """Audience-overlap matrix via BITMAP indexes: each event type's
    user audience packs into 64-bit blocks (block = user div 64, one
    bit_or aggregate), and every pairwise intersection is then
    AND + popcount over aligned blocks — the co-audience of all type
    pairs costs |types|²·|blocks| word operations instead of a
    user-level self-join, and the bitmap is reusable for OR/ANDNOT
    (union / exclusion audiences) at the same price. The oracle is the
    NAIVE distinct-user self-join — a cross-algorithm match attesting
    the bitmap arithmetic, not just implementation agreement."""
    ev = table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    blocks = (
        tu.select(
            "event_type",
            F.expr("user_id div 64").alias("b"),
            F.expr("cast(user_id % 64 as int)").alias("bit"),
        )
        .groupBy("event_type", "b")
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), bit))"
            ).alias("mask")
        )
    )
    a = blocks.select(
        F.col("event_type").alias("type_a"), "b", F.col("mask").alias("ma")
    )
    bb = blocks.select(
        F.col("event_type").alias("type_b"), "b", F.col("mask").alias("mb")
    )
    return (
        a.join(bb, "b")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))))
            .cast("long")
            .alias("co_users")
        )
        # Two types can share a user_id div-64 block with no common user;
        # the naive self-join oracle has no row for such pairs, so drop the
        # popcount-zero rows to match its pair set exactly.
        .filter(F.col("co_users") > 0)
        .orderBy("type_a", "type_b")
    )


@register(
    "customer_rfm_segments",
    """
    WITH ref_t AS (SELECT MAX(o_orderdate) AS t FROM orders),
    rfm AS (
        SELECT o_custkey AS custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         CAST((SELECT t FROM ref_t) AS DATE)) AS recency_d,
               COUNT(*) AS frequency,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_c
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT custkey, recency_d, frequency, monetary_c,
               NTILE(4) OVER (ORDER BY recency_d DESC, custkey) AS r_score,
               NTILE(4) OVER (ORDER BY frequency, custkey) AS f_score,
               NTILE(4) OVER (ORDER BY monetary_c NULLS FIRST, custkey)
                   AS m_score
        FROM rfm
    )
    SELECT r_score * 100 + f_score * 10 + m_score AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) AS segment_monetary_c,
           CAST(SUM(custkey) AS BIGINT) AS custkey_checksum
    FROM scored GROUP BY segment ORDER BY segment
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation — the classic customer-value cube: per-customer
    recency (days since last order, against the corpus as-of instant),
    frequency, and integer-cent monetary value, each quartiled with a
    custkey tie-break so NTILE boundaries are deterministic across
    engines, then rolled up per (R,F,M) segment with a customer-set
    checksum. The per-customer reduction happens before any window, so
    the quartile sort runs over customers, not orders; higher-scale
    variants swap NTILE for the distributed prefix-sum rank already in
    the repo."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    asof = o.agg(F.max("o_orderdate").alias("t"))
    rfm = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_od"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_c"
            ),
        )
        .crossJoin(F.broadcast(asof))
        .select(
            "custkey",
            F.datediff(F.to_date("t"), F.to_date("last_od")).cast("long").alias(
                "recency_d"
            ),
            "frequency",
            "monetary_c",
        )
    )
    scored = rfm.select(
        "custkey",
        "monetary_c",
        F.ntile(4).over(Window.orderBy(F.desc("recency_d"), "custkey")).alias(
            "r_score"
        ),
        F.ntile(4).over(Window.orderBy("frequency", "custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary_c", "custkey")).alias("m_score"),
    )
    return (
        scored.groupBy(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).alias("segment")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary_c").cast("long").alias("segment_monetary_c"),
            F.sum("custkey").cast("long").alias("custkey_checksum"),
        )
        .orderBy("segment")
    )


@register(
    "salted_priority_revenue",
    """
    SELECT o_orderpriority,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                    * (1 - CAST(l_discount AS DECIMAL(30,4)))), 2) AS VARCHAR) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def salted_priority_revenue(spark, sf_dir):
    """Fact-fact join under MANUAL skew salting (operators.skew.
    salted_join): the medium side is replicated n_salts ways and the
    big side scattered across the replicas, so one pathological hot
    orderkey becomes n_salts even partitions. The green oracle row
    proves the salt is routing-only — the result is bit-identical to
    the plain join. This is the fallback for the two skew cases AQE's
    runtime splitting can't fix (a single key exceeding executor
    memory, or a skewed side feeding a stateful operator); everywhere
    else the session's AQE skew-join handles it with zero replication
    cost. Decimal-exact revenue per the registry's determinism rules."""
    from udacity_data_wrangling_osm_case_study_spark.operators import skew

    # fan_out_scan (round 13): the salted join's big side pays the
    # monotonic-id salt derivation, 8-way hash routing and the partial
    # decimal-revenue aggregation in its scan stage, which is a single
    # split — fanning the 3-column projection first measured
    # 2.34 s → 1.85 s at sf0.1 (guide §2.5; no-op at real scale).
    li = fan_out_scan(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        spark,
    )
    ords = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    return (
        skew.salted_join(li, ords, ["l_orderkey"], n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "cogrouped_entity_profile",
    """
    WITH e AS (
        SELECT user_id AS id, COUNT(*) AS n_events,
               MIN(event_id) AS first_event_id
        FROM events GROUP BY user_id
    ),
    o AS (
        SELECT o_custkey AS id, COUNT(*) AS n_orders,
               MAX(o_orderkey) AS last_orderkey
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(e.id, o.id) AS id,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(first_event_id, -1) AS BIGINT) AS first_event_id,
           CAST(COALESCE(last_orderkey, -1) AS BIGINT) AS last_orderkey
    FROM e FULL OUTER JOIN o ON e.id = o.id
    ORDER BY id
    """,
)
def cogrouped_entity_profile(spark, sf_dir):
    """Per-entity two-table profile, same result as its original
    ``cogroup().applyInArrow`` formulation but computed with built-in
    aggregates (round-13 optimization; guide §4.1: always prefer
    built-ins when they can express the logic).

    History: through round 12 this query was the deliberate
    Arrow-cogroup exhibit — each key's events and orders arrived as
    two Arrow tables in one Python callback. Measured per-key dispatch
    cost ~0.16 ms even with trivial per-key work (15k keys at sf0.1:
    applyInArrow 2.95 s vs native 0.49 s, and the cogroup query's
    isolated noop time was 12.3 s vs 0.5 s native — the callback count
    scales linearly with entity count, so at 100 TB key cardinality
    the Python boundary IS the query). The per-key logic here (counts,
    order-independent min/max) is exactly expressible in built-in
    aggregates, so by the exhibit's own guidance it should never have
    stayed Python; the optimization round retires the dispatch. The
    two registered names are kept (both are attested), now sharing one
    plan: two map-side-combinable group-bys full-outer-joined — zero
    Python, zero per-key dispatch, partial aggregation before either
    shuffle."""
    return _entity_profile_plan(spark, sf_dir)


@register(
    "part_random_walk_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey <> b.l_partkey
    ),
    adj AS (
        SELECT src, list(dst ORDER BY dst) AS nb, COUNT(*) AS deg
        FROM e GROUP BY src
    ),
    w0 AS (SELECT src AS anchor, src AS cur FROM adj),
    w1 AS (
        SELECT anchor,
               nb[CAST(CAST(('0x' || substr(md5('walk:1:'
                       || CAST(anchor AS VARCHAR) || ':'
                       || CAST(cur AS VARCHAR)), 1, 8)) AS BIGINT)
                   % deg AS INT) + 1] AS cur
        FROM w0 JOIN adj ON adj.src = w0.cur
    ),
    w2 AS (
        SELECT anchor,
               nb[CAST(CAST(('0x' || substr(md5('walk:2:'
                       || CAST(anchor AS VARCHAR) || ':'
                       || CAST(cur AS VARCHAR)), 1, 8)) AS BIGINT)
                   % deg AS INT) + 1] AS cur
        FROM w1 JOIN adj ON adj.src = w1.cur
    ),
    w3 AS (
        SELECT anchor,
               nb[CAST(CAST(('0x' || substr(md5('walk:3:'
                       || CAST(anchor AS VARCHAR) || ':'
                       || CAST(cur AS VARCHAR)), 1, 8)) AS BIGINT)
                   % deg AS INT) + 1] AS cur
        FROM w2 JOIN adj ON adj.src = w2.cur
    )
    SELECT anchor, step, context FROM (
        SELECT anchor, 1 AS step, cur AS context FROM w1
        UNION ALL SELECT anchor, 2, cur FROM w2
        UNION ALL SELECT anchor, 3, cur FROM w3
    ) ORDER BY anchor, step
    """,
    scan_budget=2,  # DeepWalk step loop
)
def part_random_walk_pairs(spark, sf_dir):
    """DeepWalk-style skip-gram corpus over the part co-purchase graph
    (operators.graph.random_walks): one 3-step deterministic walk per
    part, each (anchor, step, visited) row a positive training pair
    for graph embeddings. The md5-salted step choice makes the corpus
    bit-identical across engines — the oracle replays all three steps
    as unrolled CTE hops over the same sorted adjacency lists, so the
    green row attests the walk itself, not just counts."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    und = graph.copurchase_pairs(li, "l_orderkey", "l_partkey").select(
        "src", "dst"
    )
    # No pair-level .distinct() anywhere (round 13, guide §2.4, two
    # steps): first the post-symmetrize distinct went (``und`` was
    # distinct with src < dst and symmetrize emits each direction
    # exactly once row-locally — 3 Exchange → 2,
    # plans/r13/randomwalk_sym_edges_{before,after}.txt); then the
    # PRE-symmetrize distinct too, because random_walks' adjacency
    # build ends in collect_set, which dedups — unlike
    # part_similarity_topk, no raw-count consumer touches the pair
    # stream, so dedup-by-collect_set is exact (oracle re-proven at
    # sf0.001/0.01/0.1). With the operator's repartition-before-groupBy
    # fold the whole edge path now pays ONE edge-sized exchange
    # (plans/r13/randomwalk_sym_edges_after2.txt).
    sym = graph.symmetrize(und)
    return graph.random_walks(sym, n_steps=3, salt="walk").orderBy(
        "anchor", "step"
    )


@register(
    "entity_profile_native",
    """
    WITH e AS (
        SELECT user_id AS id, COUNT(*) AS n_events,
               MIN(event_id) AS first_event_id
        FROM events GROUP BY user_id
    ),
    o AS (
        SELECT o_custkey AS id, COUNT(*) AS n_orders,
               MAX(o_orderkey) AS last_orderkey
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(e.id, o.id) AS id,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(first_event_id, -1) AS BIGINT) AS first_event_id,
           CAST(COALESCE(last_orderkey, -1) AS BIGINT) AS last_orderkey
    FROM e FULL OUTER JOIN o ON e.id = o.id
    ORDER BY id
    """,
)
def entity_profile_native(spark, sf_dir):
    """Pure-JVM entity profile — two map-side-combinable group-bys,
    full-outer-joined, zero Python dispatch. Originally registered as
    the fast twin of the Arrow-cogroup formulation so the crossover
    economics of the cogroup surface were MEASURED, not asserted:
    at sf0.1 (32 cores, 14,999 keys, best-of-2) native 0.49 s vs
    applyInArrow 2.95 s — per-key Python/Arrow callback dispatch costs
    ~0.16 ms/key even with trivial per-key work, and the gap widens
    linearly with key count. Since round 13 ``cogrouped_entity_profile``
    shares this plan (the dispatch was retired per guide §4.1); the
    guidance stands: reach for cogroup().applyInArrow only when the
    per-key logic is genuinely inexpressible in built-in aggregates
    (sequence alignment, model scoring)."""
    return _entity_profile_plan(spark, sf_dir)


def _entity_profile_plan(spark, sf_dir):
    ev = table(spark, sf_dir, "events").groupBy(
        F.col("user_id").alias("id")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    )
    ords = table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("id")
    ).agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderkey").alias("last_orderkey"),
    )
    return (
        ev.join(ords, "id", "full_outer")
        .select(
            "id",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("first_event_id", F.lit(-1)).cast("long").alias(
                "first_event_id"
            ),
            F.coalesce("last_orderkey", F.lit(-1)).cast("long").alias(
                "last_orderkey"
            ),
        )
        .orderBy("id")
    )


@register(
    "nation_market_share",
    """
    WITH base AS (
        SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
               sn.n_name AS supp_nation,
               CAST(l_extendedprice AS DECIMAL(30,4))
                   * (1 - CAST(l_discount AS DECIMAL(30,4))) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ),
    yr AS (
        SELECT o_year,
               CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_2'
                                   THEN rev ELSE 0 END) * 100)
                    AS BIGINT) AS nation_rev_c,
               CAST(ROUND(SUM(rev) * 100) AS BIGINT) AS market_rev_c
        FROM base GROUP BY o_year
    )
    SELECT o_year, nation_rev_c, market_rev_c,
           CAST(CAST(nation_rev_c AS HUGEINT) * 10000 // market_rev_c
                AS BIGINT) AS share_bp
    FROM yr ORDER BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8-shaped national market share: the 7-table star/snowflake
    join (fact → orders → customer → nation → region on the demand side,
    fact → supplier → nation on the supply side, plus the part filter)
    that exercises Catalyst's join reordering and broadcast planning at
    full width — the constant-size dimensions (nation, region, filtered
    part) are broadcast-hinted; customer and supplier grow linearly
    with scale factor (150k×SF / 10k×SF rows), so their join strategy
    is left to AQE rather than force-broadcast (a hint there would blow
    the driver past a few hundred SF — round-6 advice). Revenue folds
    as exact decimal cents and the share is integer basis points
    (nation numerator clears the market denominator — no float division
    on the aggregation path), so the result hashes identically across
    engines. Overflow posture: nation_rev_c·10⁴ overflows BIGINT once
    the per-year nation revenue passes ~9.2×10¹⁴ cents (≈SF 1000), so
    the basis-point projection clears through DECIMAL(38,0)
    (``_share_bp_projection``), HUGEINT in the oracle; unit-tested at
    adversarial magnitudes in tests/test_overflow_margins.py."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).alias("rev"),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .select("o_year", "supp_nation", "rev")
    )
    yr = base.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("supp_nation") == "NATION_2", F.col("rev")
                ).otherwise(F.lit(0).cast(_DEC))
            )
            * 100
        )
        .cast("long")
        .alias("nation_rev_c"),
        F.round(F.sum("rev") * 100).cast("long").alias("market_rev_c"),
    )
    return _share_bp_projection(yr).orderBy("o_year")


def _share_bp_projection(yr):
    """Basis-point share projection over a (o_year, nation_rev_c,
    market_rev_c) BIGINT frame; the ×10⁴ numerator clears through
    DECIMAL(38,0) (overflows BIGINT past ~9.2×10¹⁴ cents/year —
    ≈SF 1000). Unit-tested at adversarial magnitudes in
    tests/test_overflow_margins.py."""
    return yr.select(
        "o_year",
        "nation_rev_c",
        "market_rev_c",
        # Zero market revenue (negative-price rows can cancel a year to
        # exactly 0 cents) leaves the share UNDEFINED: NULL on both
        # engines — DuckDB's // already yields NULL on a zero divisor,
        # Spark's ANSI div throws without the guard (caught by fuzz
        # variant 4t at sf0.01).
        F.when(
            F.col("market_rev_c") != 0,
            F.expr(
                "cast(nation_rev_c as decimal(38,0)) * 10000"
                " div cast(market_rev_c as decimal(38,0))"
            ),
        )
        .cast("long")
        .alias("share_bp"),
    )


@register(
    "part_price_smoothing",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pp AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    eu AS (SELECT a, b FROM pp GROUP BY a, b HAVING COUNT(*) >= 2),
    e AS (SELECT a AS src, b AS dst FROM eu UNION ALL SELECT b, a FROM eu),
    deg AS (SELECT dst, COUNT(*) AS deg FROM e GROUP BY dst),
    h0 AS (
        SELECT pt.p_partkey AS v,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS h
        FROM part pt JOIN (SELECT DISTINCT dst FROM e) vv
          ON vv.dst = pt.p_partkey
    ),
    s1 AS (SELECT e.dst AS v, SUM(h0.h) AS s
           FROM e JOIN h0 ON h0.v = e.src GROUP BY e.dst),
    h1 AS (SELECT h0.v,
                  CASE WHEN s1.s IS NOT NULL
                       THEN (h0.h + s1.s // deg.deg) // 2
                       ELSE h0.h END AS h
           FROM h0 LEFT JOIN s1 ON s1.v = h0.v
                   LEFT JOIN deg ON deg.dst = h0.v),
    s2 AS (SELECT e.dst AS v, SUM(h1.h) AS s
           FROM e JOIN h1 ON h1.v = e.src GROUP BY e.dst),
    h2 AS (SELECT h1.v,
                  CASE WHEN s2.s IS NOT NULL
                       THEN (h1.h + s2.s // deg.deg) // 2
                       ELSE h1.h END AS h
           FROM h1 LEFT JOIN s2 ON s2.v = h1.v
                   LEFT JOIN deg ON deg.dst = h1.v)
    SELECT CAST(h0.v AS BIGINT) AS part,
           CAST(h0.h AS BIGINT) AS price_c,
           CAST(h2.h AS BIGINT) AS smoothed_c,
           CAST(ABS(h2.h - h0.h) AS BIGINT) AS shift_c
    FROM h2 JOIN h0 ON h0.v = h2.v
    ORDER BY shift_c DESC, part LIMIT 20
    """,
    scan_budget=2,  # propagation supersteps (feature frames checkpointed)
)
def part_price_smoothing(spark, sf_dir):
    """GNN-style neighbor-mean feature smoothing
    (operators.graph.feature_propagation): propagate part retail prices
    (exact cents) along the support-≥2 co-purchase graph for 2
    integer-exact supersteps, then report the 20 parts whose smoothed
    price moved furthest from their list price — outliers relative to
    their basket neighborhood, the graph-native mispricing/anomaly
    screen and the aggregation primitive under message-passing GNNs.
    Oracle replays both supersteps as unrolled CTEs (neighbor-sum join
    + integer mean per round). Registered with a scan budget: the
    checkpointed propagation loop must keep the plan at ≤2 fact
    scans."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e2 = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst")
    )
    from udacity_data_wrangling_osm_case_study_spark.operators.iterative import (
        snap_lazy,
    )

    # ONE lazy snapshot of the symmetric edge frame shared by the
    # vertex derivation (inside h0's checkpoint) AND the propagation
    # operator (round 14, guide §2.4/§5): h0 and the operator's edge
    # frame checkpoint separately, so each used to re-run the whole
    # co-purchase edge build in its own query execution (no AQE
    # exchange reuse across executions). Interleaved A/B at sf0.1:
    # 4.3-7.6 s → 3.0-4.5 s, every pair ordered.
    sym = snap_lazy(graph.symmetrize(e2))
    verts = sym.select("dst").distinct()
    # h0 feeds BOTH the propagation loop and the final shift join — one
    # lazy checkpoint so the second consumer reads the same blocks
    # instead of re-deriving the part⋈vertex join (and its lineitem
    # scan) from scratch; keeps the plan inside the scan budget.
    h0 = (
        table(spark, sf_dir, "part")
        .join(verts, F.col("p_partkey") == F.col("dst"))
        .select(
            F.col("p_partkey").alias("v"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    h2 = graph.feature_propagation(sym, h0, n_iter=2)
    return (
        h2.withColumnRenamed("h", "smoothed")
        .join(h0.withColumnRenamed("h", "price"), "v")
        .select(
            F.col("v").cast("long").alias("part"),
            F.col("price").cast("long").alias("price_c"),
            F.col("smoothed").cast("long").alias("smoothed_c"),
            F.abs(F.col("smoothed") - F.col("price"))
            .cast("long")
            .alias("shift_c"),
        )
        .orderBy(F.desc("shift_c"), "part")
        .limit(20)
    )


@register(
    "part_cheapest_path",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pp AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b, COUNT(*) AS shared
        FROM li l1 JOIN li l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        GROUP BY a, b HAVING COUNT(*) >= 2
    ),
    e AS (SELECT a AS src, b AS dst, 1000 // shared AS w FROM pp
          UNION ALL SELECT b, a, 1000 // shared FROM pp),
    seeds AS (SELECT DISTINCT src AS seed FROM e ORDER BY seed LIMIT 3),
    d0 AS (SELECT seed, seed AS v, CAST(0 AS BIGINT) AS d FROM seeds),
    d1 AS (SELECT seed, v, MIN(d) AS d FROM (
               SELECT seed, v, d FROM d0
               UNION ALL
               SELECT d0.seed, e.dst AS v, d0.d + e.w AS d
               FROM d0 JOIN e ON e.src = d0.v
           ) GROUP BY seed, v),
    d2 AS (SELECT seed, v, MIN(d) AS d FROM (
               SELECT seed, v, d FROM d1
               UNION ALL
               SELECT d1.seed, e.dst AS v, d1.d + e.w AS d
               FROM d1 JOIN e ON e.src = d1.v
           ) GROUP BY seed, v),
    d3 AS (SELECT seed, v, MIN(d) AS d FROM (
               SELECT seed, v, d FROM d2
               UNION ALL
               SELECT d2.seed, e.dst AS v, d2.d + e.w AS d
               FROM d2 JOIN e ON e.src = d2.v
           ) GROUP BY seed, v)
    SELECT CAST(seed AS BIGINT) AS seed,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(d) AS BIGINT) AS sum_d,
           CAST(MAX(d) AS BIGINT) AS max_d
    FROM d3 GROUP BY seed ORDER BY seed
    """,
    scan_budget=2,  # relaxation supersteps (distance frames checkpointed)
)
def part_cheapest_path(spark, sf_dir):
    """Weighted shortest paths (operators.graph.bellman_ford) over the
    co-purchase graph with affinity costs w = 1000 div shared-orders —
    strongly co-purchased parts are "close", so the 3-round min-plus
    relaxation finds each seed's cheapest multi-hop affinity routes,
    the weighted complement to ``part_bfs_hops`` (a 2-edge path
    through strong ties can and does beat a weak direct edge — the
    case hop-BFS cannot express). Per-seed reach count, distance sum,
    and max distance are exact-integer checksums over the full
    distance table. Oracle replays all 3 relaxations as unrolled
    union+min CTEs. Registered with a scan budget: the checkpointed
    relaxation loop must keep the plan at ≤2 fact scans."""
    from udacity_data_wrangling_osm_case_study_spark.operators import graph

    # No .distinct() before the pair expansion: copurchase_pairs
    # aggregates each order's items with collect_set, which dedups, so
    # the distinct was redundant (round 13). Plan-neutral: Catalyst's
    # RemoveRedundantAggregates already eliminated it below the
    # duplicate-agnostic collect_set (identical physical plans,
    # plans/r13/copurchase_edge_build_{before,after}.txt) — removed at
    # the source so the intent is visible without optimizer knowledge.
    op = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pp = (
        graph.copurchase_pairs(op, "l_orderkey", "l_partkey")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("src", "dst", F.expr("1000 DIV shared").alias("w"))
    )
    from udacity_data_wrangling_osm_case_study_spark.operators.iterative import (
        snap_lazy,
    )

    # ONE lazy snapshot of the symmetric weighted edge frame shared by
    # the seeds derivation AND the Bellman-Ford operator (round 14,
    # guide §2.4/§5): the operator checkpoints its copy, so without the
    # shared snapshot the two subtrees run in separate query executions
    # (no AQE exchange reuse) and the co-purchase edge build executes
    # twice. Interleaved A/B at sf0.1: 4.8-10.5 s → 2.6-4.2 s, every
    # pair ordered.
    sym = snap_lazy(graph.symmetrize(pp))
    seeds = (
        sym.select("src")
        .distinct()
        .orderBy("src")
        .limit(3)
        .select(F.col("src").alias("seed"))
    )
    dist = graph.bellman_ford(sym, seeds, n_rounds=3)
    return (
        dist.groupBy("seed")
        .agg(
            (F.count("*") - 1).cast("long").alias("n_reached"),
            F.sum("d").cast("long").alias("sum_d"),
            F.max("d").cast("long").alias("max_d"),
        )
        .select(F.col("seed").cast("long").alias("seed"), "n_reached", "sum_d", "max_d")
        .orderBy("seed")
    )


_SOLE_LATE_SQL = """
    WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS late
        FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    os AS (SELECT l_orderkey, l_suppkey, MAX(late) AS late
           FROM flagged GROUP BY l_orderkey, l_suppkey)
    SELECT s.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM os s
    WHERE s.late = 1
      AND EXISTS (SELECT 1 FROM os o2
                  WHERE o2.l_orderkey = s.l_orderkey
                    AND o2.l_suppkey <> s.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM os o3
                      WHERE o3.l_orderkey = s.l_orderkey
                        AND o3.l_suppkey <> s.l_suppkey
                        AND o3.late = 1)
    GROUP BY s.l_suppkey
    ORDER BY numwait DESC, suppkey LIMIT 10
"""


@register(
    "sole_late_suppliers",
    _SOLE_LATE_SQL.format(lineitem="lineitem", orders="orders"),
)
def sole_late_suppliers(spark, sf_dir):
    """TPC-H Q21-shaped blame attribution: suppliers who were the SOLE
    late shipper (>60 days after order date — this schema carries no
    commit/receipt dates) on finished multi-supplier orders, counted
    and ranked. The optimizer workout is the pair of correlated
    quantified subqueries — EXISTS (another supplier on the order) and
    NOT EXISTS (another LATE supplier) — which Catalyst must
    decorrelate into one semi- and one anti-join with a non-equi
    (suppkey <>) conjunct each; the fact side reduces to DISTINCT
    (order, supplier, any-late) BEFORE the quantifiers, so the
    subquery joins run on the collapsed frame, never raw lineitems.
    Same Spark-SQL-vs-DuckDB lockstep as ``orders_above_customer_avg``
    (identical SQL text modulo view names)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_sole_late_v"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ord_sole_late_v"
    )
    return spark.sql(
        _SOLE_LATE_SQL.format(
            lineitem="li_sole_late_v", orders="ord_sole_late_v"
        )
    )
