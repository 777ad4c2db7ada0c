"""Adversarial-magnitude audit of the integer-exact reduction family.

Round-6 lesson: ``customer_spend_gini`` shipped a docstring CLAIM of
BIGINT headroom and crashed at sf0.1 (its ×1000 permille numerator is
≈1.7×10¹⁹ > 2⁶³−1).  This sweep turns every such claim into a TEST:
each integer-exact reduction is evaluated on a tiny synthetic frame at
magnitudes far past sf0.1 — chosen so the PRE-FIX expression provably
overflows int64 (each test asserts that, in Python, as its adversarial
witness) — and the result is compared against exact Python big-int
arithmetic.  Reductions whose OUTPUT domain is inherently int64-bounded
(tie_cubed, acf sums) document the bound in their docstrings instead;
the tests here pin the intermediate arithmetic.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators.sampling import (
    _LN2_MICRO,
    _LN_TABLE,
)
from udacity_data_wrangling_osm_case_study_spark.plans.exploration import (
    _gini_projection,
)
from udacity_data_wrangling_osm_case_study_spark.plans.join_queries import (
    _share_bp_projection,
)
from udacity_data_wrangling_osm_case_study_spark.plans.window_queries import (
    _acf_cross_term,
    _bigram_entropy_report,
    _mannwhitney_projection,
)

I64_MAX = 2**63 - 1


def test_gini_projection_past_bigint(spark):
    # sf0.1 reality was n=14,999, sx≈3.75e12; go harder: the ×1000
    # numerator here is 2×10¹⁹, past int64 — the round-6 crash witness.
    n, sx, i2x = 15_000, 4_000_000_000_000, 80_000_000_000_000_000
    num = i2x - (n + 1) * sx
    den = n * sx
    assert num * 1000 > I64_MAX  # pre-fix expression overflows
    row = _gini_projection(
        spark.createDataFrame([(n, sx, i2x)], "n long, sx long, i2x long")
    ).first()
    assert row.n == n and row.total_cents == sx
    assert row.gini_permille == num * 1000 // den


def test_gini_aggregation_past_bigint(spark):
    """Round-8 100x-sweep crash witness: the rank-weighted sum i2x
    itself (not just the derived rational) passes int64 near 100x the
    bench SF, and the round-7 output columns gini_num/gini_den were
    BIGINT-unrepresentable there. The full query pipeline must now
    complete at such magnitudes and match the exact Python-int Gini."""
    from udacity_data_wrangling_osm_case_study_spark.plans.exploration import (
        customer_spend_gini,
    )
    import os
    import shutil
    import tempfile

    # Magnitudes tuned so sx (a REAL monetary total) still fits int64
    # (its overflow is a loud, correct failure) while the rank-weighted
    # i2x ~ n*sx does not: n=30k spenders of ~6e11 cents -> sx ~ 9e15,
    # i2x ~ 2.7e20.
    n, v_hi = 30_000, 6_000_000_000  # dollars per big spender
    assert sum(2 * i * v_hi * 100 for i in range(n // 2, n)) > I64_MAX
    d = tempfile.mkdtemp(prefix="gini_mag_")
    try:
        spark.range(n).select(
            F.col("id").alias("o_custkey"),
            # distinct spends, half small, half enormous
            F.when(F.col("id") % 2 == 0, (F.col("id") + 1) * 100)
            .otherwise(F.lit(v_hi) + F.col("id"))
            .cast("double")
            .alias("o_totalprice"),
        ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        row = customer_spend_gini(spark, d).collect()[0]
        spend = sorted(
            (i + 1) * 100 * 100 if i % 2 == 0 else (v_hi + i) * 100
            for i in range(n)
        )
        sx = sum(spend)
        i2x = sum(2 * (i + 1) * x for i, x in enumerate(spend))
        assert sx < I64_MAX  # the representable output stays representable
        assert i2x > I64_MAX  # the pre-fix long SUM provably overflows
        assert row.n == n and row.total_cents == sx
        assert row.gini_permille == (i2x - (n + 1) * sx) * 1000 // (n * sx)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_mannwhitney_projection_past_bigint(spark):
    na, nb = 200_000_000, 200_000_000
    u2a = 50_000_000_000_000_000  # ≤ 2·na·nb, realistic U
    r2a = na * (na + 1) + u2a
    tie3 = 123_456
    assert u2a * 500 > I64_MAX  # pre-fix expression overflows
    row = _mannwhitney_projection(
        spark.createDataFrame(
            [(na, nb, r2a, tie3)], "na long, nb long, r2a long, tie3 long"
        )
    ).first()
    assert row.n_a == na and row.n_b == nb and row.r2_a == r2a
    assert row.u2_a == u2a and row.tie_cubed == tie3
    assert row.u_permille == u2a * 500 // (na * nb)


def test_acf_cross_term_past_bigint(spark):
    # 10-year spine, ~10¹¹ events/day: each centered factor ≈ 1.6e14,
    # whose int64 product would be ~2.7e28.
    n, s = 3_650, 200_000_000_000_000
    x, xl = 100_000_000_000, 90_000_000_000
    fx, fy = n * x - s, n * xl - s
    assert abs(fx * fy) > I64_MAX  # pre-fix expression overflows
    df = spark.createDataFrame(
        [(n, s, x, xl)], "n long, s long, x long, xl long"
    )
    got = df.select(_acf_cross_term("x", "xl").alias("t")).first().t
    assert int(got) == fx * fy
    got_sq = df.select(_acf_cross_term("x", "x").alias("t")).first().t
    assert int(got_sq) == fx * fx


def _negln_py(h: int) -> int:
    # Exact Python twin of operators.sampling.negln_micro_48: every
    # float step there is IEEE-exact (h < 2^48, power-of-two scaling).
    h = max(h, 1)
    n = h.bit_length()
    f = math.floor(float(h) * 2.0 ** (9 - n)) - 256
    return 48 * _LN2_MICRO - ((n - 1) * _LN2_MICRO + _LN_TABLE[f])


def test_bigram_entropy_report_past_bigint(spark):
    # Per-pair transition counts in the 10¹²s: c·2²⁴ ≈ 1.7e19 > 2⁶³,
    # and Σ c·negln ≈ 4e12 × ~1.4e6 micro-nats ≈ 5.6e18·…, both past
    # or near int64 in the pre-fix fold.
    counts = {"b1": 1_000_000_000_000, "b2": 3_000_000_000_000}
    t = sum(counts.values())
    assert max(counts.values()) * 16_777_216 > I64_MAX  # pre-fix witness
    exp_nll = 0
    for c in counts.values():
        hv = max((c * 16_777_216 // t) * 16_777_216, 1)
        exp_nll += c * _negln_py(hv)
    pairs = spark.createDataFrame(
        [("a0", b, c) for b, c in counts.items()], "a string, b string, c long"
    )
    row = _bigram_entropy_report(pairs).first()
    assert row.event_type == "a0" and row.n_transitions == t
    assert row.nll_micro == exp_nll
    assert row.mean_nll_micro == exp_nll // t


def test_share_bp_projection_past_bigint(spark):
    nation_c, market_c = 2_000_000_000_000_000_000, 6_000_000_000_000_000_000
    assert nation_c * 10_000 > I64_MAX  # pre-fix expression overflows
    row = _share_bp_projection(
        spark.createDataFrame(
            [(1998, nation_c, market_c)],
            "o_year int, nation_rev_c long, market_rev_c long",
        )
    ).first()
    assert row.share_bp == nation_c * 10_000 // market_c == 3_333


def test_centroid_cosine_fold_engine_parity_at_scale(spark):
    # source_centroid_cosine folds dot/norms in DOUBLE; past ~1.2e7
    # milli-units per component the per-term products exceed 2⁵³ and the
    # fold is no longer exact.  The contract is therefore (a) both
    # engines walk the list left-to-right with identical IEEE adds →
    # bit-identical cos_bp, and (b) the fold error is absorbed by the
    # basis-point rounding vs exact rational math.  Pin both at
    # adversarial 1e15-scale components.
    ca = [float(10**15 + 7 * i * 10**9 + 3) for i in range(64)]
    cb = [float(10**15 - 5 * i * 10**9 + 1) for i in range(64)]
    assert ca[1] * cb[1] > 2.0**53

    dot = lambda x, y: F.aggregate(  # noqa: E731  (query's own fold)
        F.zip_with(x, y, lambda u, v: u * v),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    df = spark.createDataFrame(
        [(ca, cb)], "ca array<double>, cb array<double>"
    )
    spark_bp = (
        df.select(
            F.round(
                dot(F.col("ca"), F.col("cb"))
                / (
                    F.sqrt(dot(F.col("ca"), F.col("ca")))
                    * F.sqrt(dot(F.col("cb"), F.col("cb")))
                )
                * 10000
            )
            .cast("long")
            .alias("bp")
        )
        .first()
        .bp
    )
    duck_bp = duckdb.sql(
        "SELECT CAST(ROUND(list_dot_product(ca, cb) /"
        " (sqrt(list_dot_product(ca, ca))"
        "  * sqrt(list_dot_product(cb, cb))) * 10000) AS BIGINT) AS bp"
        " FROM (SELECT ?::DOUBLE[] AS ca, ?::DOUBLE[] AS cb)",
        params=[ca, cb],
    ).fetchone()[0]
    assert spark_bp == duck_bp  # (a) engine parity

    ia, ib = [int(v) for v in ca], [int(v) for v in cb]
    exact = Fraction(sum(a * b for a, b in zip(ia, ib)) ** 2) / (
        Fraction(sum(a * a for a in ia)) * sum(b * b for b in ib)
    )
    exact_bp = round(math.sqrt(float(exact)) * 10000)
    assert abs(spark_bp - exact_bp) <= 1  # (b) rounding absorbs fold error


@pytest.mark.parametrize(
    "shape",
    [
        "gini:n*sx*1000",
        "mannwhitney:u2a*500",
        "acf:term*term",
        "bigram:c*2^24",
        "share:rev*10^4",
    ],
)
def test_adversarial_witnesses_are_real(shape):
    # Meta-guard: every fixture above chose magnitudes where the
    # PRE-FIX int64 expression provably overflows — keep the witnesses
    # honest if fixtures are ever retuned.
    witnesses = {
        "gini:n*sx*1000": (80_000_000_000_000_000 - 15_001 * 4 * 10**12)
        * 1000,
        "mannwhitney:u2a*500": 50_000_000_000_000_000 * 500,
        "acf:term*term": (3_650 * 10**11 - 2 * 10**14) ** 2,
        "bigram:c*2^24": 3_000_000_000_000 * 16_777_216,
        "share:rev*10^4": 2_000_000_000_000_000_000 * 10_000,
    }
    assert witnesses[shape] > I64_MAX


def test_nation_revenue_share_numerators_past_bigint(spark, tmp_path):
    """Round-9 mag6-variant crash witness: rev_c fits BIGINT but the
    x10000 share numerators do not once per-nation revenue passes
    ~9.2e14 cents. Drives the FULL registered query over a synthetic
    sf dir at provable-overflow magnitudes and checks exact big-int
    shares."""
    import pyspark.sql.functions as F

    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    rev_per_order = 10**13  # cents per order after rounding
    orders = spark.range(200).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 4).alias("o_custkey"),
        F.lit(rev_per_order / 100.0).alias("o_totalprice"),
        F.lit("O").alias("o_orderstatus"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    )
    cust = spark.range(4).select(
        F.col("id").alias("c_custkey"),
        F.lit("c").alias("c_name"),
        (F.col("id") % 2).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("SEG").alias("c_mktsegment"),
    )
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(0, "R0"), (1, "R1")], "r_regionkey int, r_name string"
    )
    d = tmp_path / "sf"
    for name, df in (
        ("orders", orders), ("customer", cust),
        ("nation", nation), ("region", region),
    ):
        df.write.parquet(str(d / f"{name}.parquet"))
    per_nation = 100 * rev_per_order
    assert per_nation * 10000 > I64_MAX  # pre-fix numerator overflows
    queries, _ = registry.load_all()
    rows = {r.n_name: r for r in
            queries["nation_revenue_share"](spark, str(d)).collect()}
    assert rows["N0"].rev_c == per_nation
    assert rows["N0"].share_of_region_bp == 10000  # sole nation of R0
    assert rows["N0"].region_share_bp == 5000


def test_time_weighted_avg_wsum_past_bigint(spark, tmp_path):
    """Round-9 mag6-variant crash witness: wsum x10000 passes 2^63 at
    ~1e11-cent values held over hour gaps; the accumulation now rides
    DECIMAL(38,0)."""
    import pyspark.sql.functions as F

    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    cents = 10**11          # value * 100
    gap_s = 3600
    n = 100
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id") * gap_s)).alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(cents / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = tmp_path / "sf"
    events.write.parquet(str(d / "events.parquet"))
    wsum = cents * gap_s * (n - 1)
    assert wsum * 10000 > I64_MAX  # pre-fix numerator overflows
    queries, _ = registry.load_all()
    row = queries["event_value_time_weighted_avg"](spark, str(d)).first()
    assert row.span_s == gap_s * (n - 1)
    assert row.twa_micro == wsum * 10000 // (gap_s * (n - 1))


def test_ewma_scale_past_bigint(spark, tmp_path):
    """Round-10 fresh-seed fuzz (variant 8m) crash witness: ewma_num is
    bounded by max_cents*2^16 (operator contract) but the x10000
    micro-unit scale is not — at ~1e12-cent values num*10000 ~ 6.6e20
    passes 2^63 and ANSI multiplication threw. The scale now rides
    DECIMAL(38,0); the result must equal exact Python big-int EWMA."""
    import pyspark.sql.functions as F

    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    cents = 10**12  # value = 1e10, exactly representable as double
    n = 20          # > lookback so both full and partial windows occur
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id") * 60)).alias("ts"),
        F.lit(3).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(cents / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = tmp_path / "sf"
    events.write.parquet(str(d / "events.parquet"))
    full_num = cents * (2**16 - 1)
    assert full_num < I64_MAX        # the accumulation itself stays long
    assert full_num * 10000 > I64_MAX  # the pre-fix scale provably overflows
    queries, _ = registry.load_all()
    rows = queries["event_value_ewma"](spark, str(d)).collect()
    assert len(rows) == n
    for t, row in enumerate(rows, start=1):  # ordered by event_id
        s = min(t, 16)
        num = cents * (2**s - 1)  # constant series: sum of 2^0..2^(s-1)
        assert row.n_window == s
        assert row.ewma_micro == num * 10000 // (2**s - 1) == cents * 10000


def test_recency_weight_term_past_bigint(spark, tmp_path):
    """Round-10 composed fuzz (variants 12m + 15m) crash witnesses:
    cents * 2^(31-age_h) passes 2^63 per TERM at ~1e12-cent values —
    the gini pattern one exponent up — so the numerator accumulates as
    DECIMAL(38,0); and a raw DECIMAL(38,0) OUTPUT degrades to lossy
    float64 in DuckDB's pandas path, so the report decomposes it into
    hi/lo BIGINTs (num = hi*2^31 + lo). The decomposition must equal
    exact Python big-int arithmetic at magnitudes past both limits."""
    import pyspark.sql.functions as F

    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    cents = 10**12  # value = 1e10, exactly representable as double
    n = 20
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id") * 60)).alias("ts"),
        F.lit(5).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(cents / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    d = tmp_path / "sf"
    events.write.parquet(str(d / "events.parquet"))
    # all rows are within the final hour: age_h = 0, weight 2^31
    assert cents * 2**31 > I64_MAX  # the pre-fix TERM provably overflows
    queries, _ = registry.load_all()
    row = queries["recency_weighted_user_value"](spark, str(d)).first()
    assert row.n_recent == n
    assert row.decay_den == 2**31
    num = n * cents * 2**31
    assert num > I64_MAX  # a single BIGINT column could not hold it
    assert row.decay_num_hi * 2**31 + row.decay_num_lo == num
    assert row.decay_num_hi == n * cents  # all weights 2^31 here
    assert row.decay_num_lo == 0


def test_share_bp_zero_market_is_null_like_duckdb(spark):
    """Round-11 fuzz fix (variant 4t at sf0.01): negative-price rows
    can cancel a year's market revenue to exactly 0 cents, where the
    share is undefined. DuckDB's // yields NULL on a zero divisor;
    Spark's ANSI div threw DIVIDE_BY_ZERO — the projection now guards
    to NULL so both engines agree. Same convention applied to
    nation_revenue_share's region/total denominators."""
    import duckdb

    rows = _share_bp_projection(
        spark.createDataFrame(
            [(1995, 0, 0), (1996, -500, 0), (1997, 30, 90)],
            "o_year int, nation_rev_c long, market_rev_c long",
        )
    ).orderBy("o_year").collect()
    assert [(r.o_year, r.share_bp) for r in rows] == [
        (1995, None), (1996, None), (1997, 3333),
    ]
    # the DuckDB behavior the convention mirrors (if an upgrade makes
    # // throw instead, the oracle needs the explicit CASE guard too)
    assert duckdb.connect().execute(
        "SELECT CAST(-500 AS HUGEINT) * 10000 // 0"
    ).fetchone()[0] is None


def test_time_weighted_avg_per_term_past_bigint(spark, tmp_path):
    """Round-11 composed 4mt-variant crash witness: the r10 fix widened
    the ACCUMULATED wsum, but the per-hold product cents*dt still rode
    BIGINT — magnitude-scaled cents (~1e13) held across a
    ±100-year-shifted gap (~6.3e9 s) pass 2^63 inside one term. The
    product now widens to DECIMAL(38,0) BEFORE multiplying (HUGEINT in
    the oracle). Two events 200 years apart at a magnitude where the
    single term provably overflows, while each factor fits BIGINT."""
    import pyspark.sql.functions as F

    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    cents = 2 * 10**13           # value * 100 after 1e6 magnitude scale
    gap_s = 200 * 365 * 24 * 3600  # ~200-year hold
    assert cents < I64_MAX and gap_s < I64_MAX
    assert cents * gap_s > I64_MAX  # the single term overflows pre-fix
    events = spark.createDataFrame(
        [(1, 7, "view", cents / 100.0), (2, 7, "view", 0.0)],
        "event_id long, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F.when(F.col("event_id") == 1,
               F.lit("1924-01-01 00:00:00").cast("timestamp"))
        .otherwise(
            F.lit("1924-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.lit(gap_s))
        ).alias("ts"),
        "user_id", "event_type", "value",
        F.lit(None).cast("string").alias("props"),
    )
    d = tmp_path / "sf"
    events.write.parquet(str(d / "events.parquet"))
    queries, _ = registry.load_all()
    row = queries["event_value_time_weighted_avg"](spark, str(d)).first()
    assert row.span_s == gap_s
    assert row.twa_micro == cents * gap_s * 10000 // gap_s == cents * 10000
