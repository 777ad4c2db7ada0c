"""Winnowing-fingerprint queries (rolling-hash document fingerprinting).

Oracle strategy: the fingerprint selection is pure string/list algebra
(md5-hex gram hashes, lexicographic window minima), so DuckDB computes
the byte-identical fingerprint sets from the same parquet — full
value-hash parity, no tolerance band needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import fingerprint, packing
from udacity_data_wrangling_osm_case_study_spark.plans.registry import register, table

_K = 8
_W = 4


# Rabin-Karp gram hash, unrolled to k ord() terms — mirrors
# operators.fingerprint (HASH_BASE/HASH_MOD); integer arithmetic is
# engine-exact, so the fingerprint sets match bit-for-bit.
def _poly_sql(var: str = "i") -> str:
    expr = f"CAST(ord(substr(t, {var}, 1)) AS BIGINT)"
    for j in range(1, _K):
        expr = f"(({expr}) * 257 + ord(substr(t, {var} + {j}, 1))) % 2147483647"
    return expr


# Shared CTE: winnowed fingerprint sets per document (DuckDB side) —
# mirrors operators.fingerprint.winnow_fingerprints(k=8, w=4).
_FPS_CTE = f"""
    norm AS (
        SELECT doc_id AS id,
               regexp_replace(lower(trim(text, ' ')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g') AS t
        FROM documents
    ),
    grams AS (
        SELECT id, greatest(length(t) - {_K - 1}, 0) AS ng, t FROM norm
    ),
    hashed AS (
        SELECT id, ng,
               CASE WHEN ng > 0 THEN list_transform(
                        range(1, ng + 1),
                        i -> {_poly_sql("i")})
                    ELSE [] END AS hs
        FROM grams
    ),
    winnowed AS (
        SELECT id,
               CASE WHEN ng >= {_W} THEN ng - {_W - 1}
                    WHEN ng >= 1 THEN 1
                    ELSE 0 END AS wc,
               hs
        FROM hashed
    ),
    fps AS (
        SELECT id,
               CASE WHEN wc > 0 THEN list_distinct(list_transform(
                        range(1, wc + 1),
                        j -> list_min(hs[j:j + {_W - 1}])))
                    ELSE [] END AS f
        FROM winnowed
    )
"""


@register(
    "doc_fingerprints",
    f"""
    WITH {_FPS_CTE}
    SELECT id, len(f) AS n_fps, list_min(f) AS min_fp, list_max(f) AS max_fp
    FROM fps ORDER BY id
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Winnowed fingerprint profile per document — set size plus the
    numeric extremes (a cheap stable digest of the set). Profiled via
    explode_outer + aggregate rather than three array expressions on
    the fps column: the column is an alias for the whole winnow
    computation, and CollapseProject would re-expand it once per
    referencing expression (measured 2.3x) — a generator evaluates it
    exactly once. The doc-keyed aggregation is a 1-row-per-doc
    shuffle, trivial beside the fingerprint work."""
    docs = table(spark, sf_dir, "documents")
    fps = fingerprint.winnow_fingerprints(docs, k=_K, w=_W)
    return (
        fps.select("id", F.explode_outer("fps").alias("fp"))
        .groupBy("id")
        .agg(
            F.count("fp").alias("n_fps"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("id")
    )


_MAX_FP_DF = 20
_MIN_SHARED = 5
_MIN_OVERLAP = 0.5


@register(
    "fingerprint_near_pairs",
    f"""
    WITH {_FPS_CTE},
    sets0 AS (SELECT id, unnest(f) AS fp FROM fps),
    hot AS (SELECT fp FROM sets0 GROUP BY fp HAVING COUNT(*) > {_MAX_FP_DF}),
    sets AS (SELECT * FROM sets0 WHERE fp NOT IN (SELECT fp FROM hot)),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sets GROUP BY id),
    shared AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared
        FROM sets a JOIN sets b ON a.fp = b.fp AND a.id < b.id
        GROUP BY a.id, b.id HAVING COUNT(*) >= {_MIN_SHARED}
    )
    SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b,
           ROUND(shared / least(sa.sz, sb.sz), 6) AS overlap
    FROM shared
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE ROUND(shared / least(sa.sz, sb.sz), 6) >= {_MIN_OVERLAP}
    ORDER BY id_a, id_b
    """,
)
def fingerprint_near_pairs(spark, sf_dir):
    """Clone-detection pairs: documents sharing >= 5 winnowed
    fingerprints at containment overlap >= 0.5. The ``max_fp_df`` cap
    is ON here — synthetic boilerplate gives some fingerprints df in
    the hundreds, and without the cap the inverted-index join does df²
    work on junk matches that the overlap filter would discard anyway
    (the exact skew the cap exists for)."""
    docs = table(spark, sf_dir, "documents")
    fps = fingerprint.winnow_fingerprints(docs, k=_K, w=_W)
    pairs = fingerprint.fingerprint_pairs(
        fps, min_shared=_MIN_SHARED, max_fp_df=_MAX_FP_DF
    )
    return pairs.filter(F.col("overlap") >= _MIN_OVERLAP).orderBy("id_a", "id_b")


@register(
    "sorted_neighborhood_pairs",
    """
    WITH d AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text, ' ')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g') AS norm
        FROM documents
    ),
    r AS (
        SELECT doc_id, norm,
               ROW_NUMBER() OVER (
                   ORDER BY substr(norm, 1, 40), doc_id) AS rk
        FROM d
    ),
    cand AS (
        SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
               a.norm AS a_norm, b.norm AS b_norm
        FROM r a JOIN r b
          ON b.rk - a.rk BETWEEN 1 AND 3
    ),
    j AS (
        SELECT a_doc, b_doc,
               len(list_intersect(list_distinct(string_split(a_norm, ' ')),
                                  list_distinct(string_split(b_norm, ' '))))
                   AS n_common,
               len(list_distinct(list_concat(
                   list_distinct(string_split(a_norm, ' ')),
                   list_distinct(string_split(b_norm, ' '))))) AS n_union
        FROM cand
    )
    SELECT LEAST(a_doc, b_doc) AS a_doc,
           GREATEST(a_doc, b_doc) AS b_doc,
           CAST(n_common * 10000 // n_union AS BIGINT) AS jaccard_bp
    FROM j
    WHERE n_common * 2 >= n_union
    ORDER BY a_doc, b_doc
    """,
)
def sorted_neighborhood_pairs(spark, sf_dir):
    """Sorted-neighborhood dedup (the classic record-linkage blocking
    method, complementing prefix/LSH/fingerprint blocking): sort the
    corpus by a normalized sort key (first 40 chars + id tie-break),
    take candidate pairs only within a rank window of 3, verify with
    exact word-set Jaccard ≥ 0.5 (integer basis points). Near-identical
    docs share prefixes, so they land adjacent in sort order — O(n·w)
    candidates instead of O(n²).

    Shape at scale: the global rank uses the two-phase distributed
    prefix sum over the string sort key (range partition — no
    single-partition window); the rank-window join is an equi-join on
    rank+offset (explode of 3 offsets); the Jaccard verify is row-local
    array math on candidate pairs only."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ").alias("norm"),
    )
    keyed = d.withColumn(
        "_skey",
        F.concat(
            F.rpad(F.substring("norm", 1, 40), 41, " "),
            F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        ),
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = packing.global_token_offsets(
        keyed, order_col="_skey", ntok_col="_one"
    ).select("doc_id", "norm", (F.col("start") + 1).alias("rk"))
    toks = ranked.withColumn("tset", F.array_distinct(F.split("norm", " ")))
    left = toks.select(
        F.col("doc_id").alias("a_doc"),
        F.col("tset").alias("a_set"),
        F.explode(F.array(*[F.col("rk") + i for i in (1, 2, 3)])).alias("rk"),
    )
    right = toks.select(
        F.col("doc_id").alias("b_doc"), F.col("tset").alias("b_set"), "rk"
    )
    cand = left.join(right, "rk")
    j = cand.select(
        "a_doc",
        "b_doc",
        F.size(F.array_intersect("a_set", "b_set")).alias("n_common"),
        F.size(F.array_union("a_set", "b_set")).alias("n_union"),
    )
    return (
        j.filter(F.col("n_common") * 2 >= F.col("n_union"))
        .select(
            F.least("a_doc", "b_doc").alias("a_doc"),
            F.greatest("a_doc", "b_doc").alias("b_doc"),
            F.expr("n_common * 10000 div n_union").alias("jaccard_bp"),
        )
        .orderBy("a_doc", "b_doc")
    )
