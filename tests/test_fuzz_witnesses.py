"""Witness tests for the round-9 fuzz-found fixes.

tools/fuzz_oracle.py runs the full registry against seeded adversarial
parquet variants; every class of divergence it exposed is pinned here
as a minimal deterministic case, so a regression trips a named test
instead of waiting for the next fuzz sweep. Each test names the fix it
guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestZeroVectorCosine:
    """similarity.cosine / dedup.normalized_vectors zero-norm guard:
    a zero embedding is a certainty at corpus scale and must score
    cosine 0, not raise ANSI DIVIDE_BY_ZERO."""

    def test_cosine_zero_operand_is_zero(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.similarity import cosine

        df = spark.createDataFrame(
            [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
            "u array<double>, v array<double>",
        )
        got = [r[0] for r in df.select(cosine(F.col("u"), F.col("v"))).collect()]
        assert got[0] == 0.0
        assert got[1] == pytest.approx(1.0)

    def test_normalized_vectors_zero_vector(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.dedup import normalized_vectors

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0], 0), (2, [3.0, 4.0, 0.0], 0)],
            "vec_id bigint, embedding array<double>, label int",
        )
        rows = {r.id: r.u for r in normalized_vectors(df).collect()}
        assert rows[1] == [0.0, 0.0, 0.0]
        assert rows[2] == pytest.approx([0.6, 0.8, 0.0])

    def test_arrow_pair_grid_zero_vector(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.dedup import (
            embedding_near_duplicates_arrow,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0], 7), (2, [1.0, 0.0], 7), (3, [1.0, 0.0], 7)],
            "vec_id bigint, embedding array<double>, label int",
        )
        pairs = {
            (r.id_a, r.id_b): r.cosine_bp
            for r in embedding_near_duplicates_arrow(df, threshold_bp=0).collect()
        }
        # the zero vector scores 0 against everything (not NaN — NaN
        # would poison the >= threshold filter silently)
        assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
        assert pairs[(2, 3)] == 10000


class TestNullMeasureConventions:
    """NULL measures are excluded from rank/median statistics on both
    engines — a NULL order key sorts at engine-DEPENDENT ends
    (Spark NULLS FIRST vs DuckDB NULLS LAST) and is not an
    observation."""

    def test_histogram_median_ignores_nulls(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.stats import histogram_median

        df = spark.createDataFrame(
            [("a", None), ("a", 1), ("a", 3), ("a", 5), ("b", None)],
            "k string, v int",
        )
        rows = {r.k: (r.n, r.median) for r in histogram_median(df, "k", "v").collect()}
        assert rows["a"] == (3, 3)  # lower median of {1,3,5}, NULL ignored
        assert "b" not in rows  # all-NULL group has no median

    def test_weighted_median_ignores_null_weight(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.stats import histogram_median

        df = spark.createDataFrame(
            [("a", 1, 1), ("a", 9, None), ("a", 2, 2)],
            "k string, v int, w int",
        )
        rows = {r.k: r.median for r in histogram_median(df, "k", "v", weight="w").collect()}
        assert rows["a"] == 2  # the NULL-weight 9 never enters


class TestNullTokenPaths:
    """Sequence/path builders token NULL event types explicitly:
    concat_ws/array_join/string_agg silently DROP null elements, and
    do so differently across engines."""

    def test_media_contract_drops_null_text(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.multimodal import (
            documents_as_media,
        )

        df = spark.createDataFrame(
            [(1, "abc"), (2, None)], "doc_id bigint, text string"
        )
        assert documents_as_media(df).count() == 1

    def test_text_scores_drop_null_text(self, spark):
        from udacity_data_wrangling_osm_case_study_spark.operators.textstats import (
            hashed_linear_score,
            repetition_profile,
        )

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, None)], "doc_id bigint, text string"
        )
        assert hashed_linear_score(df).count() == 1
        assert repetition_profile(df).count() == 1


class TestCharLevenshteinOracleIdentity:
    """The fuzzy-repair oracle verifies char-lev <= 1 via the
    prefix/suffix identity, because DuckDB's levenshtein counts BYTES
    (a CJK deletion costs 3). Pins the identity against Spark's
    char-based levenshtein on multi-byte and list_position's
    0-when-absent quirk."""

    CASES = [
        ("mall ring", "small ring", 1),     # head deletion (s = full suffix)
        ("abc", "abc", 0),                   # equal (no mismatch anywhere)
        ("沙田正街", "沙田街", 1),            # CJK deletion: bytes=3, chars=1
        ("Ωmega x", "Ωmega y", 1),           # multi-byte substitution
        ("ab", "ba", 2),                     # transposition is 2 edits
    ]

    def test_identity_matches_spark_levenshtein(self, spark):
        import duckdb

        con = duckdb.connect()
        for a, b, want in self.CASES:
            got_spark = spark.range(1).select(
                F.levenshtein(F.lit(a), F.lit(b))
            ).collect()[0][0]
            assert got_spark == want, (a, b)
            ok = con.execute(
                """
                WITH chars AS (SELECT regexp_extract_all(?, '(?s).') AS ca,
                                      regexp_extract_all(?, '(?s).') AS cb),
                lv AS (SELECT len(ca) la, len(cb) lb,
                    COALESCE(NULLIF(list_position(list_transform(
                        range(1, least(len(ca), len(cb)) + 1),
                        i -> ca[i] = cb[i]), false), 0) - 1,
                        least(len(ca), len(cb))) AS p,
                    COALESCE(NULLIF(list_position(list_transform(
                        range(1, least(len(ca), len(cb)) + 1),
                        i -> ca[len(ca) + 1 - i] = cb[len(cb) + 1 - i]),
                        false), 0) - 1,
                        least(len(ca), len(cb))) AS s
                    FROM chars)
                SELECT abs(la - lb) <= 1 AND la <= p + s + 1
                       AND lb <= p + s + 1 FROM lv
                """,
                [a, b],
            ).fetchone()[0]
            assert ok == (want <= 1), (a, b)


class TestDegenerateInputs:
    """Empty/single-row corpora: aggregates emit NULL (not a crash)
    where the statistic is undefined, and index read-backs carry
    pinned schemas (an empty build writes no part files)."""

    def test_gram_index_empty_corpus_probe(self, spark, tmp_path):
        from udacity_data_wrangling_osm_case_study_spark.operators import substrings

        empty = spark.createDataFrame([], "doc_id bigint, text string")
        probe = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id bigint, text string"
        )
        idx = str(tmp_path / "gidx")
        substrings.build_gram_index(empty, idx, l=3)
        out = substrings.incremental_span_coverage(probe, idx, min_count=2)
        assert out.count() == 1  # empty index = nothing duplicated

    def test_ivf_index_empty_corpus(self, spark, tmp_path):
        from udacity_data_wrangling_osm_case_study_spark.operators import similarity

        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>, label int"
        )
        idx = str(tmp_path / "ivf")
        similarity.build_ivf_index(empty, idx)
        got = similarity.ivf_topk_indexed(spark, idx, [1.0] * 64, k=5)
        assert got.count() == 0

    def test_table_counts_reports_empty_tables(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from udacity_data_wrangling_osm_case_study_spark.plans.registry import load_all

        # stage an empty events + customer/orders/lineitem
        import duckdb  # noqa: F401

        src = "/root/testdata/sf0.001"
        for t in ("customer", "orders", "lineitem", "events"):
            tbl = pq.read_table(f"{src}/{t}.parquet")
            pq.write_table(tbl.slice(0, 0), str(tmp_path / f"{t}.parquet"))
        queries, _ = load_all()
        rows = {
            r.tbl: r.n for r in queries["table_counts"](spark, str(tmp_path)).collect()
        }
        assert rows == {"customer": 0, "orders": 0, "lineitem": 0, "events": 0}


class TestOracleDecimalToDoubleHop:
    """Round-10 composed-magnitude fuzz fix: DuckDB's direct
    DECIMAL -> DOUBLE cast is NOT correctly rounded once the unscaled
    int128 passes 2^53 (it converts the integer to double FIRST, then
    divides by 10^scale — double rounding), while Spark's
    BigDecimal.doubleValue is exact-nearest. Every oracle that emits a
    decimal sum as DOUBLE therefore hops through VARCHAR (strtod is
    correctly rounded). These pin the defect and the hop so the
    'redundant' cast doesn't get simplified away."""

    def test_duckdb_direct_cast_is_lossy_and_varchar_hop_is_exact(self):
        import duckdb

        con = duckdb.connect()
        direct, via_str = con.execute(
            "SELECT CAST(CAST('544121888540000.0000' AS DECIMAL(38,4)) AS DOUBLE),"
            " CAST(CAST(CAST('544121888540000.0000' AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        exact = 544121888540000.0  # < 2^53: exactly representable
        assert via_str == exact
        # The canary, not a correctness assertion (ADVICE r10): the
        # engine under test stays correct whether or not DuckDB fixes
        # its cast, so a fix must flag cleanup work — retire the
        # VARCHAR hops per the NOTES_r11 procedure — without turning
        # the tree red.
        if direct == exact:
            pytest.skip(
                "HOP-NOW-REMOVABLE: DuckDB fixed its DECIMAL->DOUBLE "
                "double-rounding — the oracle VARCHAR hops can be "
                "retired; see NOTES_r11 'DuckDB hop retirement'"
            )

    def test_cube_total_price_exact_at_magnitude(self, spark, tmp_path):
        """End-to-end: order_status_cube over values whose exact sum
        has an unscaled decimal past 2^53 must hash-match the oracle
        (this exact shape diverged in the last ulp pre-fix)."""
        import duckdb
        import pyspark.sql.functions as F

        from udacity_data_wrangling_osm_case_study_spark.plans import registry

        n, price = 2581, 210818244.3
        orders = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            F.lit(77).cast("long").alias("o_custkey"),
            F.lit("F").alias("o_orderstatus"),
            F.lit(price).alias("o_totalprice"),
            F.lit("1995-01-01").cast("date").alias("o_orderdate"),
            F.lit("4-NOT SPECIFIED").alias("o_orderpriority"),
        )
        d = tmp_path / "sf"
        orders.write.parquet(str(d / "orders.parquet"))
        queries, oracles = registry.load_all()
        mine = {
            (r.status, r.priority): r.total_price
            for r in queries["order_status_cube"](spark, str(d)).collect()
        }
        con = duckdb.connect()
        con.execute(
            # Spark writes a directory; DuckDB needs the part glob
            f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
        )
        for s, p, _, tp in con.execute(oracles["order_status_cube"]).fetchall():
            assert mine[(s, p)] == tp, (s, p, mine[(s, p)], tp)


class TestSessionGapMicrosecondExact:
    """Round-10 composed-magnitude fuzz fix: the sessionization queries
    compared whole-second-truncated timestamps against the 30-minute
    gap while their oracles compare at microsecond precision — a gap of
    1800.9 s split sessions in one engine only. The Spark side now uses
    unix_micros; these pin both sides of the boundary."""

    def _events(self, spark, tmp_path, gap_seconds):
        import datetime as dt

        import pyspark.sql.functions as F  # noqa: F401

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 400000)
        rows = [
            (1, t0, 7, "click", 1.0, None),
            (2, t0 + dt.timedelta(seconds=gap_seconds), 7, "view", 1.0, None),
        ]
        d = tmp_path / "sf"
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ).write.mode("overwrite").parquet(str(d / "events.parquet"))
        return str(d)

    def test_fractional_gap_above_threshold_splits(self, spark, tmp_path):
        from udacity_data_wrangling_osm_case_study_spark.plans import registry

        queries, _ = registry.load_all()
        # 1800.9 s: whole-second truncation sees 1800 (same session) —
        # the pre-fix divergence; exact microseconds see > 30 min
        d = self._events(spark, tmp_path, 1800.9)
        row = queries["user_sessions"](spark, d).first()
        assert row.n_sessions == 2, "fractional over-threshold gap must split"

    def test_fractional_gap_below_threshold_merges(self, spark, tmp_path):
        from udacity_data_wrangling_osm_case_study_spark.plans import registry

        queries, _ = registry.load_all()
        d = self._events(spark, tmp_path, 1799.9)
        row = queries["user_sessions"](spark, d).first()
        assert row.n_sessions == 1
        # exactly 30:00.000000 is NOT a new session (strict >)
        d = self._events(spark, tmp_path, 1800.0)
        row = queries["user_sessions"](spark, d).first()
        assert row.n_sessions == 1


class TestDoubleToIntCastDivergence:
    """Round-12 ``d`` fuzz class, first find (3/3 seeds): Spark's
    double→BIGINT cast TRUNCATES toward zero while DuckDB's ROUNDS to
    nearest — invisible on the integer-valued base quantities, a
    guaranteed off-by-one per fractional row once the d-class injected
    x.99 boundary values into l_quantity. The fix (both engines ROUND
    before the cast in quantity_weighted_median_price) defines the
    weight semantics explicitly; these tests pin the underlying
    divergence so the 'redundant' ROUND doesn't get simplified away."""

    def test_engines_disagree_on_bare_fractional_cast(self, spark):
        import duckdb

        duck = duckdb.connect().execute(
            "SELECT CAST(CAST(2.99 AS DOUBLE) AS BIGINT),"
            " CAST(CAST(-2.99 AS DOUBLE) AS BIGINT)"
        ).fetchone()
        assert duck == (3, -3)  # DuckDB rounds
        got = spark.sql(
            "SELECT CAST(CAST(2.99 AS DOUBLE) AS BIGINT),"
            " CAST(CAST(-2.99 AS DOUBLE) AS BIGINT)"
        ).first()
        assert tuple(got) == (2, -2)  # Spark truncates

    def test_round_then_cast_is_engine_exact(self, spark):
        import duckdb
        import pyspark.sql.functions as F

        vals = [2.99, -2.99, 0.49, -0.49, 9_999_999_999.99,
                -9_999_999_999.99, 2.0, 0.0]
        duck = [
            duckdb.connect().execute(
                f"SELECT CAST(ROUND(CAST({v!r} AS DOUBLE)) AS BIGINT)"
            ).fetchone()[0]
            for v in vals
        ]
        df = spark.createDataFrame([(v,) for v in vals], ["x"])
        got = [
            r.w for r in df.select(
                F.round(F.col("x")).cast("long").alias("w")
            ).collect()
        ]
        assert got == duck, list(zip(vals, got, duck))


class TestZeroNormCentroid:
    """Round-13 s-fuzz find (seed 1s): ``source_centroid_cosine``
    inlined its cosine with a BARE division while the oracle declared
    COALESCE(x / NULLIF(den, 0), 0) — a source whose centroid sums to
    the zero vector (one mutated-unique source holding one zeroed
    embedding) raised ANSI DIVIDE_BY_ZERO instead of scoring 0. The
    fix routes through the try_divide + coalesce pattern the shared
    ``operators.similarity.cosine`` helper already used."""

    def test_zero_centroid_source_scores_zero(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from udacity_data_wrangling_osm_case_study_spark.plans.registry import load_all

        docs = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["a", "b"],
            "lang": ["en", "en"],
            "source": ["alive", "zeroed"],
            "n_chars": pa.array([1, 1], pa.int64()),
        })
        emb = pa.table({
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.0] * 64, [0.0] * 64], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0], pa.int32()),
        })
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        queries, _ = load_all()
        rows = queries["source_centroid_cosine"](spark, str(tmp_path)).collect()
        assert [(r.src_a, r.src_b, r.cos_bp) for r in rows] == [
            ("alive", "zeroed", 0)
        ]


class TestNullSumTrendSign:
    """Round-13 s-fuzz find (seed 1s): ``event_value_trend`` on a
    group whose values are ALL NULL has NULL sufficient statistics;
    ``signum`` propagated the NULL (rendered NaN driver-side) while
    the oracle's CASE fell through to ELSE 0. The when-chain now
    mirrors the CASE: undefined trend reports sign 0 beside its NULL
    rational (slope_num/slope_den stay NULL on both engines)."""

    def test_all_null_value_group_reports_sign_zero(self, spark, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from udacity_data_wrangling_osm_case_study_spark.plans.registry import load_all

        t0 = dt.datetime(2024, 1, 1)
        ev = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([t0, t0 + dt.timedelta(hours=1), t0],
                           pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": ["nullgrp", "nullgrp", "live"],
            "value": pa.array([None, None, 2.5], pa.float64()),
            "props": ["{}", "{}", "{}"],
        })
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        queries, _ = load_all()
        rows = {
            r.event_type: (r.trend_sign, r.slope_num)
            for r in queries["event_value_trend"](
                spark, str(tmp_path)
            ).collect()
        }
        assert rows["nullgrp"] == (0, None)
        assert rows["live"][0] == 0  # single x value: num == 0


class TestOracleWhitespaceMirror:
    """Round-13 s-fuzz root cause for 43 of 45 seed-1s failures: the
    oracle normalization used DuckDB's DEFAULT trim — which strips
    Zs-class Unicode spaces (U+00A0, U+3000, …) while Spark's F.trim
    strips only U+0020 — and RE2's '\\s', which unlike Java's excludes
    U+000B. Every oracle now mirrors the engine exactly via
    trim(x, ' ') and the explicit class [ \\t\\n\\x0b\\f\\r]. These
    pin the platform behaviors the mirror depends on."""

    def test_duckdb_default_trim_strips_unicode_spaces(self):
        import duckdb

        con = duckdb.connect()
        # platform behavior the mirror works around — if an upgrade
        # changes it, revisit the trim(x, ' ') sites
        assert con.execute("select trim(' x　')").fetchone()[0] == "x"
        assert con.execute("select trim(' x ', ' ')").fetchone()[0] == "x"
        assert (
            con.execute("select trim(' x　', ' ')").fetchone()[0]
            == " x　"
        )
        con.close()

    def test_explicit_class_equals_java_s(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        probe = " a\tb\nc\x0bd\x0ce\rf g​h "
        df = spark.createDataFrame([(probe,)], ["s"])
        spark_norm = df.select(
            F.regexp_replace(F.lower(F.trim("s")), "\\s+", " ").alias("n")
        ).collect()[0]["n"]
        con = duckdb.connect()
        duck_norm = con.execute(
            r"select regexp_replace(lower(trim(?, ' ')),"
            r" '[ \t\n\x0b\f\r]+', ' ', 'g')",
            [probe],
        ).fetchone()[0]
        con.close()
        assert spark_norm == duck_norm, (spark_norm, duck_norm)
        # and the un-mirrored RE2 \s really is the divergence: it
        # leaves U+000B behind
        con = duckdb.connect()
        bare = con.execute(
            r"select regexp_replace(?, '\s', '_', 'g')", ["a\x0bb"]
        ).fetchone()[0]
        con.close()
        assert bare == "a\x0bb"
