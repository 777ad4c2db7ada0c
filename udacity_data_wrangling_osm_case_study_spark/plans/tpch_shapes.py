"""Classic OLAP decision-support shapes (TPC-H analogs), adapted to
the driver testdata's column surface.

Round 7 completed the optimizer-workout family started by the
Q1/Q3/Q5/Q8/Q21 shapes (plans/exploration.py, plans/join_queries.py);
round 8 closes the remaining four via a deterministic synthetic
partsupp (see the _PARTSUPP_CTE comment below). Coverage map — all 22
classic shapes implemented:

  Q1  pricing_summary            Q12 late_shipment_priority_split
  Q2  min_cost_supplier          Q13 customer_order_counts_dist
  Q3  shipping_priority          Q14 promo_revenue_share_monthly
  Q4  late_order_priority_check  Q15 top_quarter_supplier
  Q5  supplier_nation_volume     Q16 supplier_count_by_part_attr
  Q6  discount_revenue_forecast  Q17 small_qty_part_revenue
  Q7  bilateral_shipping_volume  Q18 large_quantity_orders
  Q8  nation_market_share        Q19 disjunctive_promo_revenue
  Q9  nation_profit_rollup       Q20 promotable_part_suppliers
  Q10 returned_item_customers    Q21 sole_late_suppliers
  Q11 important_stock_parts      Q22 idle_rich_customers

The driver testdata carries no partsupp table (no supplycost/availqty
observables), so Q2/Q9/Q11/Q20 read the derived relation: key set =
observed DISTINCT (l_partkey, l_suppkey) pairs (the same stand-in Q16
uses), attributes = pure modular functions of the keys, identical in
the Spark plan and the DuckDB oracle.

Each shape exercises a DIFFERENT Catalyst capability — outer-join
ON-conditions (Q13), decorrelated scalar aggregates (Q17), HAVING-
driven semi-joins + top-k (Q18), scalar-subquery broadcasts (Q15/Q22),
mixed equi/non-equi EXISTS (Q4/Q12), cross-side disjunctions (Q19/Q7),
NOT IN anti-joins (Q16/Q22), pure-scan pushdown (Q6). All money/
quantity arithmetic folds as exact integer cents (doubles →
ROUND(x·100) → BIGINT) so both engines hash identically; derived
ratios clear through the round-7 DECIMAL(38,0) discipline where a
product could pass 2⁶³.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.plans.registry import register, table

_DEC = "decimal(18,2)"


@register(
    "customer_order_counts_dist",
    """
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_counts_dist(spark, sf_dir):
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly k (non-urgent) orders, INCLUDING k=0. The priority
    exclusion must live in the JOIN CONDITION — as a WHERE it would
    delete the zero-order customers the query exists to count (the
    classic outer-join-filter trap Q13 tests). COUNT(o_orderkey) counts
    only matched rows (nulls skipped), giving the exact 0 bucket."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "small_qty_part_revenue",
    """
    WITH pq AS (
        SELECT l_partkey, COUNT(*) AS n,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq
        FROM lineitem GROUP BY l_partkey
    ),
    sel AS (
        SELECT l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
        JOIN pq ON pq.l_partkey = l.l_partkey
        WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * pq.n < pq.sq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0)
                * 100) AS BIGINT) AS total_cents,
           CAST(CAST(ROUND(COALESCE(SUM(CAST(l_extendedprice
                AS DECIMAL(18,2))), 0) * 100) AS HUGEINT) // 7 AS BIGINT)
               AS avg_weekly_cents
    FROM sel
    """,
)
def small_qty_part_revenue(spark, sf_dir):
    """TPC-H Q17-shaped lost-revenue probe: lineitems of one brand's
    parts whose quantity is below 20% of that part's average quantity.
    The correlated avg decorrelates to one per-part aggregate joined
    back to the fact; the 0.2·avg comparison clears its denominator —
    qty·5·n < Σqty, all integer cents — instead of comparing floats.
    Headroom: qty_c·5·n overflows only past ~3.7×10¹⁴ lineitems per
    part, far beyond any real part. Brand filter is a broadcast; the
    per-part aggregate joins on the fact's own key (AQE decides the
    strategy at SF)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    pq = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"), F.sum("qc").alias("sq")
    )
    sel = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pq, "l_partkey")
        .filter(F.col("qc") * 5 * F.col("n") < F.col("sq"))
    )
    total = F.round(
        F.coalesce(
            F.sum(F.col("l_extendedprice").cast(_DEC)), F.lit(0).cast(_DEC)
        )
        * 100
    ).cast("long")
    return sel.agg(
        F.count("*").alias("n_lines"),
        total.alias("total_cents"),
        F.expr(
            "cast(cast(round(coalesce(sum(cast(l_extendedprice as"
            " decimal(18,2))), 0) * 100) as decimal(38,0)) div 7 as bigint)"
        ).alias("avg_weekly_cents"),
    )


@register(
    "large_quantity_orders",
    """
    WITH big AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS total_qty_c
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 20000
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
           CAST(big.total_qty_c AS BIGINT) AS total_qty_c
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice_c DESC, o_orderkey
    LIMIT 100
    """,
)
def large_quantity_orders(spark, sf_dir):
    """TPC-H Q18-shaped large-volume orders: orders whose total line
    quantity exceeds 200 units, joined out to their customers and
    ranked by order value (top 100). The fact-side HAVING aggregate
    drives the join — Catalyst evaluates the groupBy BEFORE the
    3-table join, so only qualifying orderkeys (a tiny fraction) reach
    the join; the final global top-k is a TakeOrderedAndProject, never
    a full sort."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qc").alias("total_qty_c"))
        .filter(F.col("total_qty_c") > 20000)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias(
            "o_totalprice_c"
        ),
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice_c", "total_qty_c")
        .orderBy(F.desc("o_totalprice_c"), "o_orderkey")
        .limit(100)
    )


@register(
    "late_order_priority_check",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def late_order_priority_check(spark, sf_dir):
    """TPC-H Q4-shaped priority check: per priority, how many of one
    quarter's orders had at least one lineitem shipped more than 60
    days after the order date (this schema carries no commit/receipt
    dates, so lateness is ship-vs-order — the ``sole_late_suppliers``
    convention). The EXISTS is a LEFT SEMI join whose condition mixes
    the equi orderkey with a non-equi date comparison — the semi join
    dedups multi-late-lineitem orders for free (a plain join would
    need a post-distinct)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "top_quarter_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                    * (1 - CAST(l_discount AS DECIMAL(30,4)))) * 100)
                    AS BIGINT) AS total_rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_rev_c
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def top_quarter_supplier(spark, sf_dir):
    """TPC-H Q15-shaped top supplier: the supplier(s) whose one-quarter
    revenue equals the quarter's maximum — Q15's revenue view + scalar
    MAX subquery. The max arrives as a 1-row aggregate broadcast and
    the equality is a KEYED broadcast hash join on the revenue value
    itself (not a keyless nested loop) — ties all surface, matching the
    view semantics. Revenue folds as exact decimal before one cents
    rounding per group (the Q8 discipline)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            * 100
        )
        .cast("long")
        .alias("total_rev_c")
    )
    mx = rev.agg(F.max("total_rev_c").alias("total_rev_c"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), "total_rev_c")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_c")
        .orderBy("s_suppkey")
    )


@register(
    "disjunctive_promo_revenue",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                * (1 - CAST(l_discount AS DECIMAL(30,4)))) * 100)
                AS BIGINT) AS revenue_c
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_promo_revenue(spark, sf_dir):
    """TPC-H Q19-shaped disjunctive revenue: three OR-ed
    brand/size/quantity conjunctions spanning BOTH join sides — the
    classic test of disjunction handling. Catalyst cannot push the
    mixed OR below the join whole, but it CAN (and the plan audit
    confirms it does) push the INFERRED per-side disjunctions —
    ``p_brand IN (…) AND p_size ≥ 1`` to the part scan and the
    quantity-range union to the lineitem scan — so both scans prune
    before the join and the full OR re-evaluates only on survivors.
    Expressed as one declarative filter; no manual three-branch
    union-all rewrite."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).alias("rev"),
    )
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).filter(
        branch("Brand#12", 5, 1, 11)
        | branch("Brand#23", 10, 10, 20)
        | branch("Brand#34", 15, 20, 30)
    )
    return joined.agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("rev") * 100).cast("long").alias("revenue_c"),
    )


@register(
    "idle_rich_customers",
    """
    WITH pos AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
    ),
    avg_pos AS (
        SELECT SUM(bal_c) AS s, COUNT(*) AS n FROM pos WHERE bal_c > 0
    ),
    sel AS (
        SELECT p.c_nationkey, p.bal_c
        FROM pos p, avg_pos a
        WHERE CAST(p.bal_c AS HUGEINT) * a.n > a.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = p.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
    FROM sel GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-shaped dormant-capital report: customers with an
    above-average (among positive) balance and no order since
    2000-01-01 (the testdata spans 1995..2001-08, so "lapsed for the
    last ~20 months" — Q22's no-orders-in-7-years analog; a bare
    never-ordered predicate is vacuous here because every custkey has
    historical orders), bucketed by nation. Exercises the scalar-subquery broadcast (the
    global average arrives as a 1-row broadcast nested-loop join, not a
    cartesian) and the NOT EXISTS anti-join. The above-average test
    clears its denominator (bal·n > Σbal, int cents — cleared through
    DECIMAL(38,0): bal_c·n passes 2⁶³ once ~9×10⁹ customers hold
    ~10⁴-dollar balances, inside SF-100k territory)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    avg_pos = cust.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("s"), F.count("*").alias("n")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    sel = (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(
            F.expr(
                "cast(bal_c as decimal(38,0)) * cast(n as decimal(38,0))"
                " > cast(s as decimal(38,0))"
            )
        )
        .join(
            orders, cust.c_custkey == orders.o_custkey, "left_anti"
        )
    )
    return (
        sel.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_c").cast("long").alias("totacctbal_c"),
        )
        .orderBy("c_nationkey")
    )


_REV_C_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))"
    " * (1 - CAST(l_discount AS DECIMAL(30,4)))) * 100) AS BIGINT)"
)


def _rev_c():
    return (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            * 100
        )
        .cast("long")
        .alias("revenue_c")
    )


@register(
    "discount_revenue_forecast",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                * CAST(l_discount AS DECIMAL(30,4))) * 100) AS BIGINT)
               AS discount_revenue_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def discount_revenue_forecast(spark, sf_dir):
    """TPC-H Q6-shaped what-if: revenue that would vanish if small-
    quantity 5-7% discounts were dropped for a year. Deliberately the
    SIMPLEST shape in the family — one scan, no join — so the plan
    audit checks the basics at their purest: every predicate reaches
    PushedFilters, the scan reads 4 columns, and the whole aggregate
    runs in one WholeStageCodegen span. The discount band compares on
    exact cents (ROUND(d·100) BETWEEN 5 AND 7), not raw doubles —
    0.05/0.07 are not exactly representable and a float BETWEEN is an
    engine-dependent edge."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.round(F.col("l_discount") * 100).cast("long").between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_discount").cast(_DEC)
            )
            * 100
        )
        .cast("long")
        .alias("discount_revenue_c"),
    )


@register(
    "bilateral_shipping_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
           {_REV_C_SQL} AS revenue_c
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def bilateral_shipping_volume(spark, sf_dir):
    """TPC-H Q7-shaped bilateral trade volume: two-year revenue between
    one nation PAIR in both directions. The symmetric OR over the two
    nation dimensions cannot be split per side (each branch constrains
    BOTH sides), so the interesting plan property is that the nation
    IN-(two-names) supersets still push into each broadcast nation
    scan while the exact pairing re-evaluates post-join. Constant-size
    dims broadcast; customer/supplier left to AQE (the Q8
    discipline)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    cn = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        base.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_c())
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("long").alias("l_year"),
            "revenue_c",
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "returned_item_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name, {_REV_C_SQL} AS revenue_c
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer c ON o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_c DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10-shaped returned-item report: the 20 customers who
    returned the most revenue in one quarter — the "who should support
    call first" list. Group keys include the customer attributes (no
    post-aggregation re-join), revenue is exact cents, and the top-20
    is a TakeOrderedAndProject over the aggregated frame."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev_c())
        .orderBy(F.desc("revenue_c"), "c_custkey")
        .limit(20)
    )


@register(
    "late_shipment_priority_split",
    """
    SELECT CASE WHEN l_quantity > 25 THEN 'heavy' ELSE 'light' END
               AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_class ORDER BY ship_class
    """,
)
def late_shipment_priority_split(spark, sf_dir):
    """TPC-H Q12-shaped priority split of late shipments (this schema
    has no shipmode column, so lines class by quantity weight instead):
    for every line shipped more than 60 days after its order in one
    year, count high- vs low-priority orders per class — Q12's
    conditional-aggregation pivot over a join whose predicate compares
    columns from BOTH sides (cannot push below the join; evaluates as
    the join's post-condition)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_quantity", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(
            F.when(F.col("l_quantity") > 25, "heavy")
            .otherwise("light")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            # NOT IN semantics: a NULL priority is neither high nor
            # low (SQL's CASE yields 0 for NULL on both branches); the
            # naive otherwise(1) would silently count NULLs as low.
            F.sum(
                F.when(F.col("o_orderpriority").isNotNull() & ~hi, 1)
                .otherwise(0)
            ).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "promo_revenue_share_monthly",
    """
    WITH m AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(30,4))
                             * (1 - CAST(l_discount AS DECIMAL(30,4)))
                        ELSE 0 END) * 100) AS BIGINT) AS promo_c,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))
                        * (1 - CAST(l_discount AS DECIMAL(30,4)))) * 100)
                    AS BIGINT) AS total_c
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-07-01'
        GROUP BY ship_month
    )
    SELECT ship_month, promo_c, total_c,
           CAST(CAST(promo_c AS HUGEINT) * 10000 // total_c AS BIGINT)
               AS promo_share_bp
    FROM m ORDER BY ship_month
    """,
)
def promo_revenue_share_monthly(spark, sf_dir):
    """TPC-H Q14-shaped promo share by month: promotional revenue as
    integer basis points of total, per ship month — Q14's
    CASE-inside-aggregate ratio, with the ratio's ×10⁴ numerator
    cleared through DECIMAL(38,0) (the round-7 overflow discipline) and
    month buckets as dates (identical truncation both engines)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"),
        "l_partkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).alias("rev"),
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    m = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("ship_month")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                        F.lit(0).cast(_DEC)
                    )
                )
                * 100
            )
            .cast("long")
            .alias("promo_c"),
            F.round(F.sum("rev") * 100).cast("long").alias("total_c"),
        )
    )
    return m.select(
        "ship_month",
        "promo_c",
        "total_c",
        F.expr(
            "cast(promo_c as decimal(38,0)) * 10000"
            " div cast(total_c as decimal(38,0))"
        )
        .cast("long")
        .alias("promo_share_bp"),
    ).orderBy("ship_month")


@register(
    "supplier_count_by_part_attr",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def supplier_count_by_part_attr(spark, sf_dir):
    """TPC-H Q16-shaped supplier census per part attribute (this schema
    has no partsupp table, so the observed DISTINCT (partkey, suppkey)
    pairs from lineitem stand in — the same relation Q16 reads, derived
    instead of stored; negative-balance suppliers play the
    complaint-denylist role). Exercises the NOT IN anti-join against a
    broadcast subquery plus COUNT(DISTINCT) over a pre-deduplicated
    pair frame (the distinct collapses the fact table BEFORE the part
    join, so the census join is pair-sized, not lineitem-sized)."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        ps.join(bad, "l_suppkey", "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Synthetic partsupp (round 8): Q2/Q9/Q11/Q20 are ABOUT the partsupp
# relation, which the driver testdata does not carry. The relation is
# derived deterministically: its KEY SET is the observed DISTINCT
# (l_partkey, l_suppkey) pairs (the same stand-in Q16 uses above), and
# supplycost/availqty are pure modular functions of the keys — so the
# Spark plan and the DuckDB oracle compute byte-identical relations
# from the parquet alone, with no side files and no RNG:
#
#   ps_supplycost_c = (ps_partkey*7 + ps_suppkey*11) % 90000 + 10000
#                     (cents; 100.00 .. 999.99)
#   ps_availqty     = (ps_partkey*13 + ps_suppkey*17) % 9999 + 1
#
# Both are BIGINT-exact in both engines (positive operands, so % is
# identical). At 100 TB the pair census is ONE map-side-combinable
# shuffle over two pushed columns, and the derived relation is ~1000x
# smaller than lineitem (TPC-H carries ~7 lineitems per pair).
# ---------------------------------------------------------------------------

_PARTSUPP_CTE = """
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               (ps_partkey * 7 + ps_suppkey * 11) % 90000 + 10000
                   AS ps_supplycost_c,
               (ps_partkey * 13 + ps_suppkey * 17) % 9999 + 1
                   AS ps_availqty
        FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                              l_suppkey AS ps_suppkey
              FROM lineitem)
    )
"""


def _partsupp(spark, sf_dir):
    """The synthetic partsupp relation (see module comment above)."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 90000
            + 10000
        ).alias("ps_supplycost_c"),
        (
            (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17) % 9999 + 1
        ).alias("ps_availqty"),
    )


@register(
    "min_cost_supplier",
    f"""
    WITH {_PARTSUPP_CTE},
    euro AS (
        SELECT ps.ps_partkey, ps.ps_supplycost_c, s.s_name,
               CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
               n.n_name
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal_c, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           e.ps_supplycost_c
    FROM euro e
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
      AND e.ps_supplycost_c = (SELECT MIN(e2.ps_supplycost_c) FROM euro e2
                               WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY e.s_acctbal_c DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped minimum-cost supplier: for mid-size STANDARD
    parts, the EUROPE supplier(s) quoting each part's regional minimum
    supply cost. The classic correlated-MIN subquery decorrelates to a
    WINDOW min over the region-restricted partsupp (one shuffle on
    ps_partkey, no join-back — the window and the equality filter share
    the pass); supplier->nation->region collapses to one broadcast dim,
    the part filter broadcasts, and the ORDER BY ... LIMIT lowers to
    TakeOrderedAndProject (the sort never materializes globally). The
    tie-break chain (acctbal, n_name, s_name, p_partkey) is a total
    order — one row per (supplier, part) pair — so the LIMIT is
    deterministic for the hash compare."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf_dir)
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        supp.join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("s_acctbal_c"),
            "n_name",
        )
    )
    euro = ps.join(F.broadcast(dim), ps.ps_suppkey == dim.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(10, 20)
        )
        .select("p_partkey", "p_brand")
    )
    return (
        euro.withColumn("min_cost", F.min("ps_supplycost_c").over(w))
        .filter(F.col("ps_supplycost_c") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal_c", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost_c",
        )
        .orderBy(F.desc("s_acctbal_c"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "nation_profit_rollup",
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(30,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(30,4)))) * 100)
                    AS HUGEINT)
                - SUM(CAST(ps.ps_supplycost_c
                    * CAST(ROUND(l.l_quantity) AS BIGINT) AS HUGEINT))
                AS BIGINT) AS profit_c
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def nation_profit_rollup(spark, sf_dir):
    """TPC-H Q9-shaped product-line profit: per supplier nation and
    order year, revenue minus supply cost over one part family — the
    heaviest classic join tree (lineitem x part x partsupp x orders x
    supplier x nation). Join strategy: part filter and the
    supplier->nation dim broadcast; partsupp joins on the fact's own
    composite key (and, being the fact's pair census, is ~1000x smaller
    than lineitem at scale); orders is the one genuine big-big shuffle,
    on l_orderkey. Revenue folds as exact DECIMAL then rounds to cents
    once per group (the Q8/Q15 discipline); the cost side clears
    through DECIMAL(38,0)/HUGEINT per the round-7 overflow rule — a
    per-row cost reaches 5x10^6 cents, so a bigint group sum would
    overflow near 1.8x10^12 rows per (nation, year), inside 100 TB
    range."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    rev_c = F.round(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        )
        * 100
    ).cast("decimal(38,0)")
    cost_c = F.sum(
        (F.col("ps_supplycost_c") * F.col("qty")).cast("decimal(38,0)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "o_year")
        .agg((rev_c - cost_c).cast("long").alias("profit_c"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "important_stock_parts",
    f"""
    WITH {_PARTSUPP_CTE},
    natps AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_supplycost_c * ps.ps_availqty AS HUGEINT) AS v
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_c
    FROM natps
    GROUP BY ps_partkey
    HAVING SUM(v) * (SELECT COUNT(DISTINCT ps_partkey) FROM natps)
           > 2 * (SELECT SUM(v) FROM natps)
    ORDER BY value_c DESC, ps_partkey
    """,
)
def important_stock_parts(spark, sf_dir):
    """TPC-H Q11-shaped important stock: parts whose EUROPE-held
    inventory value exceeds 2x the regional per-part MEAN — the
    group-HAVING-over-a-global-scalar shape. The classic query's fixed
    fraction is divided by SF precisely because a constant threshold
    degenerates as parts multiply (this query's first cut returned 0
    rows at 10x the correctness SF); comparing against the mean keeps
    the predicate scale-free, and cross-multiplying (sum*n > 2*total)
    keeps it integer-exact. Both scalars ride ONE 1-row aggregate
    broadcast (crossJoin of a broadcast singleton, not a recompute of
    the base); the region-restricted supplier dim broadcasts into the
    partsupp scan, so the only data-sized shuffle is the per-part sum.
    Inventory value reaches ~10^9 cents per pair, so the sums and the
    cross-multiplied comparison clear through DECIMAL(38,0) (HUGEINT
    in the oracle)."""
    ps = _partsupp(spark, sf_dir)
    dim = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    natps = ps.join(F.broadcast(dim), ps.ps_suppkey == dim.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost_c") * F.col("ps_availqty"))
        .cast("decimal(38,0)")
        .alias("v"),
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("v").alias("value_dec"))
    total = natps.agg(
        F.sum("v").alias("total_dec"),
        F.countDistinct("ps_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.col("n_parts") > F.col("total_dec") * 2
        )
        .select(
            "ps_partkey", F.col("value_dec").cast("long").alias("value_c")
        )
        .orderBy(F.desc("value_c"), "ps_partkey")
    )


@register(
    "promotable_part_suppliers",
    f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_6'
    WHERE s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        JOIN part p ON p.p_partkey = ps.ps_partkey
                   AND p.p_name LIKE 'small%'
        WHERE ps.ps_availqty > sh.qty * 200
    )
    ORDER BY s.s_suppkey
    """,
)
def promotable_part_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped surplus-stock suppliers: NATION_6 suppliers
    holding excess inventory (availqty above 200x the 1996 shipped
    quantity — the multiplier is adapted to the synthetic availqty
    domain so the predicate discriminates, ~half the pairs) of a
    'small%' part. The classic nested IN-chain decorrelates to: one
    filtered year-slice aggregate on the fact's composite key, an
    equi-join against partsupp ON THAT SAME KEY (no extra shuffle —
    both sides partition by the pair), a broadcast part filter, then a
    LEFT SEMI join into the supplier dim (each supplier once, however
    many parts qualify). A pair with no 1996 shipments drops at the
    inner join, matching the classic NULL-comparison exclusion."""
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    ps = _partsupp(spark, sf_dir)
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualifying = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("qty") * 200)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_6"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return supp.join(qualifying, "s_suppkey", "left_semi").orderBy("s_suppkey")
