"""Classic OLAP decision-support shapes (TPC-H Q13/Q17/Q18/Q22
analogs), adapted to the driver testdata's column surface.

Round 7 widens the optimizer-workout family started by the Q1/Q3/Q5/
Q8/Q21 shapes (plans/exploration.py, plans/join_queries.py): each of
these four exercises a DIFFERENT Catalyst capability —

- Q13: predicate ON an outer join (not a post-filter — pushing it to
  WHERE would wrongly drop zero-order customers), then an aggregate of
  an aggregate.
- Q17: correlated scalar-aggregate subquery (per-part average),
  decorrelated to aggregate-then-join; the 0.2·avg comparison clears
  denominators to stay integer-exact.
- Q18: HAVING on a fact-side aggregate used as a semi-join driver into
  a 3-table join, then global top-k (TakeOrderedAndProject).
- Q22: scalar subquery broadcast (global average balance) + NOT EXISTS
  anti-join.

All money/quantity arithmetic folds as exact integer cents (doubles →
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
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100)
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
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100)
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
