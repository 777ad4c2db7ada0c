"""Winnowing-fingerprint queries (rolling-hash document fingerprinting).

Oracle strategy: the fingerprint selection is pure string/list algebra
(md5-hex gram hashes, lexicographic window minima), so DuckDB computes
the byte-identical fingerprint sets from the same parquet — full
value-hash parity, no tolerance band needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import fingerprint
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
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
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
