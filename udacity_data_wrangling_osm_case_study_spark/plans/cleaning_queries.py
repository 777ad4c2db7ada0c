"""The reference's cleaning operators exercised on driver testdata.

The OSM tables aren't part of the driver testdata, so these queries
synthesize deterministic dirty values from event/doc ids and push them
through the SAME library functions the ETL uses
(``functions.phones`` / ``functions.keys`` / ``functions.names``); the
oracle SQL reimplements the semantics independently in DuckDB. Golden
row-level parity on real OSM data lives in tests/test_osm_golden.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.functions import keys as K
from udacity_data_wrangling_osm_case_study_spark.functions import names as N
from udacity_data_wrangling_osm_case_study_spark.functions import phones as P
from udacity_data_wrangling_osm_case_study_spark.plans.registry import QUERIES, register, table

# Deterministic synthetic phone-ish value per event (covers every
# canonicalizer branch: already-canonical, separator-ridden HK, PRC
# cell, SZ landline, pass-through, multi-number-with-junk).
_RAW_PHONE_SQL = """
    CASE CAST(event_id % 6 AS INT)
      WHEN 0 THEN '+852 ' || lpad(CAST(event_id % 100000000 AS VARCHAR), 8, '2')
      WHEN 1 THEN '(852) ' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '3')
                || '-' || lpad(CAST(user_id % 10000 AS VARCHAR), 4, '4')
      WHEN 2 THEN '13' || lpad(CAST(event_id % 1000000000 AS VARCHAR), 9, '5')
      WHEN 3 THEN '0755 ' || lpad(CAST(event_id % 10000000 AS VARCHAR), 7, '6')
      WHEN 4 THEN 'call the office'
      ELSE lpad(CAST(event_id % 100000000 AS VARCHAR), 8, '7') || '; ext 12'
    END
"""


def _raw_phone_col():
    eid = F.col("event_id")
    uid = F.col("user_id")

    def pad(c, n, ch):
        return F.lpad(c.cast("string"), n, ch)

    return (
        F.when(eid % 6 == 0, F.concat(F.lit("+852 "), pad(eid % 100000000, 8, "2")))
        .when(
            eid % 6 == 1,
            F.concat(
                F.lit("(852) "), pad(eid % 10000, 4, "3"), F.lit("-"), pad(uid % 10000, 4, "4")
            ),
        )
        .when(eid % 6 == 2, F.concat(F.lit("13"), pad(eid % 1000000000, 9, "5")))
        .when(eid % 6 == 3, F.concat(F.lit("0755 "), pad(eid % 10000000, 7, "6")))
        .when(eid % 6 == 4, F.lit("call the office"))
        .otherwise(F.concat(pad(eid % 100000000, 8, "7"), F.lit("; ext 12")))
    )


# DuckDB reimplementation of fix_phone_value. NB: DuckDB regexp_replace
# needs the 'g' flag to match Spark's replace-all semantics.
_FIX_PHONE_SQL = """
    (SELECT CASE WHEN len(m) > 0 THEN array_to_string(m, ';') ELSE raw END
     FROM (SELECT list_filter(list_transform(
         string_split_regex(raw, '[,;]'),
         s -> CASE
            WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(852)?(\\d{8})$')
              THEN '+852 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(852)?(\\d{8})$', 2)
            WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?(1[3-9]\\d{9})$')
              THEN '+86 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?(1[3-9]\\d{9})$', 2)
            WHEN regexp_matches(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?0?(755)(\\d{6,8})$')
              THEN '+86 755 ' || regexp_extract(regexp_replace(s, '[- +)(＋]+', '', 'g'), '^(86)?0?(755)(\\d{6,8})$', 3)
            ELSE NULL END),
         x -> x IS NOT NULL) AS m))
"""


@register(
    "phone_canonicalization",
    f"""
    WITH synth AS (
        SELECT event_id, {_RAW_PHONE_SQL} AS raw
        FROM events WHERE event_id < 3000
    )
    SELECT event_id, raw, {_FIX_PHONE_SQL} AS fixed
    FROM synth ORDER BY event_id
    """,
)
def phone_canonicalization(spark, sf_dir):
    """F4: the phone canonicalizer as a pure column expression."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    synth = ev.select("event_id", _raw_phone_col().alias("raw"))
    return synth.select(
        "event_id", "raw", P.fix_phone_value(F.col("raw")).alias("fixed")
    ).orderBy("event_id")


@register(
    "phone_update_history",
    f"""
    WITH synth AS (
        SELECT event_id, {_RAW_PHONE_SQL} AS raw
        FROM events WHERE event_id < 3000
    ),
    fixed AS (SELECT event_id, raw, {_FIX_PHONE_SQL} AS fixed FROM synth)
    SELECT event_id AS id, 'event' AS element_type, 'phone' AS field_updated
    FROM fixed WHERE fixed <> raw ORDER BY id
    """,
)
def phone_update_history(spark, sf_dir):
    """S4 CDC: raw-vs-clean diff projected to the update_history shape."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    synth = ev.select("event_id", _raw_phone_col().alias("raw"))
    fixed = synth.withColumn("fixed", P.fix_phone_value(F.col("raw")))
    return (
        fixed.filter(~F.col("fixed").eqNullSafe(F.col("raw")))
        .select(
            F.col("event_id").alias("id"),
            F.lit("event").alias("element_type"),
            F.lit("phone").alias("field_updated"),
        )
        .orderBy("id")
    )


@register(
    "key_split_census",
    """
    WITH synth AS (
        SELECT CASE CAST(event_id % 5 AS INT)
                 WHEN 0 THEN 'name:zh:yue'
                 WHEN 1 THEN 'addr:' || event_type
                 WHEN 2 THEN event_type
                 WHEN 3 THEN 'bad key ' || event_type
                 ELSE 'contact:phone'
               END AS k
        FROM events
    ),
    kept AS (
        SELECT k FROM synth
        WHERE NOT regexp_matches(k, '[=+/&<>;''"?%#$@,. \\t\\r\\n]')
    )
    SELECT CASE WHEN contains(k, ':')
                THEN regexp_extract(k, '^(.*?):(.*)$', 1)
                ELSE 'regular' END AS type,
           CASE WHEN contains(k, ':')
                THEN regexp_extract(k, '^(.*?):(.*)$', 2)
                ELSE k END AS key,
           COUNT(*) AS n
    FROM kept GROUP BY type, key ORDER BY type, key
    """,
)
def key_split_census(spark, sf_dir):
    """P2+P3: problem-key filter and non-greedy first-colon split
    (multi-colon keys keep their tail: name:zh:yue → (name, zh:yue))."""
    eid = F.col("event_id")
    k = (
        F.when(eid % 5 == 0, F.lit("name:zh:yue"))
        .when(eid % 5 == 1, F.concat(F.lit("addr:"), F.col("event_type")))
        .when(eid % 5 == 2, F.col("event_type"))
        .when(eid % 5 == 3, F.concat(F.lit("bad key "), F.col("event_type")))
        .otherwise(F.lit("contact:phone"))
    )
    synth = table(spark, sf_dir, "events").select(k.alias("k"))
    kept = synth.filter(~K.has_problem_chars(F.col("k")))
    return (
        kept.select(
            K.key_type(F.col("k")).alias("type"),
            K.key_remainder(F.col("k")).alias("key"),
        )
        .groupBy("type", "key")
        .agg(F.count("*").alias("n"))
        .orderBy("type", "key")
    )


@register(
    "capwords_nation_styles",
    """
    WITH styled AS (
        SELECT n_nationkey,
               array_to_string(list_transform(
                   string_split(regexp_replace(trim(
                       lower(n_name || ' trading region ' || r_name), ' '),
                       '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' '),
                   w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS styled_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT n_nationkey,
           CASE styled_name
             WHEN 'China Trading Region Asia' THEN 'China Trading Region ASIA'
             WHEN 'France Trading Region Europe' THEN 'France Trading Region EUROPE'
             ELSE styled_name
           END AS styled_name
    FROM styled
    WHERE styled_name NOT LIKE 'Japan%'
    ORDER BY n_nationkey
    """,
)
def capwords_nation_styles(spark, sf_dir):
    """F1+F2+P9: capwords normalization, dictionary value remap, and
    blacklist filter — the official-street dimension pipeline's scalar
    stack on testdata."""
    nation = table(spark, sf_dir, "nation")
    region = F.broadcast(table(spark, sf_dir, "region"))
    joined = nation.join(region, nation.n_regionkey == region.r_regionkey)
    styled = joined.select(
        "n_nationkey",
        N.capwords(
            F.concat(F.col("n_name"), F.lit(" trading region "), F.col("r_name"))
        ).alias("styled_name"),
    )
    remapped = styled.select(
        "n_nationkey",
        N.remap_values(
            F.col("styled_name"),
            {
                "China Trading Region Asia": "China Trading Region ASIA",
                "France Trading Region Europe": "France Trading Region EUROPE",
            },
        ).alias("styled_name"),
    )
    return remapped.filter(~F.col("styled_name").startswith("Japan")).orderBy(
        "n_nationkey"
    )


@register(
    "fuzzy_typo_repair",
    """
    WITH canon AS (
        SELECT MIN(p_partkey) AS cid, p_name AS cname
        FROM part GROUP BY p_name
    ),
    raw_typos AS (
        SELECT p_partkey,
               substr(p_name, 1, p_partkey % 12)
                   || substr(p_name, p_partkey % 12 + 2) AS tname
        FROM part WHERE p_partkey % 10 = 0
    ),
    typos AS (
        SELECT MIN(p_partkey) AS tid, tname FROM raw_typos GROUP BY tname
    ),
    cand AS (
        SELECT tid, tname, cid, cname
        FROM typos t JOIN canon c
          ON substr(t.tname, 1, 3) = substr(c.cname, 1, 3)
         AND abs(len(t.tname) - len(c.cname)) <= 1
        UNION
        SELECT tid, tname, cid, cname
        FROM typos t JOIN canon c
          ON substr(t.tname, -3, 3) = substr(c.cname, -3, 3)
         AND abs(len(t.tname) - len(c.cname)) <= 1
    ),
    -- DuckDB's levenshtein counts BYTES (a CJK deletion costs 3);
    -- the engine's semantics are CHARACTER edits, so the <=1 verify
    -- uses the exact identity: char-lev(a,b) <= 1 iff |la-lb| <= 1
    -- and both lengths <= common_prefix + common_suffix + 1.
    chars AS (
        SELECT tid, cid, tname, cname,
               regexp_extract_all(tname, '(?s).') AS ca,
               regexp_extract_all(cname, '(?s).') AS cb
        FROM cand
    ),
    lv AS (
        SELECT tid, cid, tname, cname,
               len(ca) AS la, len(cb) AS lb,
               -- list_position returns 0 (not NULL) when absent
               COALESCE(NULLIF(list_position(list_transform(
                   range(1, least(len(ca), len(cb)) + 1),
                   i -> ca[i] = cb[i]), false), 0) - 1,
                   least(len(ca), len(cb))) AS p,
               COALESCE(NULLIF(list_position(list_transform(
                   range(1, least(len(ca), len(cb)) + 1),
                   i -> ca[len(ca) + 1 - i] = cb[len(cb) + 1 - i]), false), 0) - 1,
                   least(len(ca), len(cb))) AS s
        FROM chars
    )
    SELECT tid, cid,
           CAST(CASE WHEN tname = cname THEN 0 ELSE 1 END AS BIGINT) AS lev
    FROM lv
    WHERE abs(la - lb) <= 1 AND la <= p + s + 1 AND lb <= p + s + 1
    ORDER BY tid, cid
    """,
)
def fuzzy_typo_repair(spark, sf_dir):
    """Blocked edit-distance repair at scale — the generalization of
    the reference's hand-curated street-typo dict
    (audit_bilingual_street_names.py typo map): the DISTINCT part-name
    vocabulary is corrupted by deterministic single-char deletions
    (every 10th part, position key % 12 + 1; variants deduped to their
    lowest key) and re-matched to the distinct canonical names via the
    two-block (prefix-3 ∪ suffix-3, ±1 length) candidate join and a
    Levenshtein ≤ 1 verify (operators.fuzzy; names are ≥ 7 chars ≥ the
    len ≥ 6 completeness bound for k=3). Every typo variant must
    recover at least its own original — the blocking is provably
    complete for deletions. Both sides dedupe before the join: name
    VOCABULARIES, not row multiplicities, drive fuzzy matching cost."""
    from udacity_data_wrangling_osm_case_study_spark.operators import fuzzy

    part = table(spark, sf_dir, "part")
    canon = part.groupBy(F.col("p_name").alias("cname")).agg(
        F.min("p_partkey").alias("cid")
    )
    typos = (
        part.filter(F.col("p_partkey") % 10 == 0)
        .select(
            "p_partkey",
            F.concat(
                F.expr("substring(p_name, 1, p_partkey % 12)"),
                F.expr("substring(p_name, p_partkey % 12 + 2)"),
            ).alias("tname"),
        )
        .groupBy("tname")
        .agg(F.min("p_partkey").alias("tid"))
    )
    return (
        fuzzy.fuzzy_match_pairs(typos, canon, max_distance=1, prefix_len=3)
        .select("tid", "cid", F.col("lev").cast("bigint").alias("lev"))
        .orderBy("tid", "cid")
    )


@register(
    "scd2_customer_history",
    """
    WITH versions AS (
        SELECT c_custkey, CAST(v AS BIGINT) AS version,
               ROUND(c_acctbal + 10 * v, 2) AS acctbal
        FROM customer, range(1, 4) t(v)
        WHERE v <= c_custkey % 3 + 1
    )
    SELECT c_custkey, version, acctbal,
           CAST(version AS BIGINT) AS valid_from,
           CAST(COALESCE(LEAD(version) OVER (PARTITION BY c_custkey
                                             ORDER BY version),
                         9999) AS BIGINT) AS valid_to,
           (LEAD(version) OVER (PARTITION BY c_custkey
                                ORDER BY version) IS NULL) AS is_current
    FROM versions
    ORDER BY c_custkey, version
    """,
)
def scd2_customer_history(spark, sf_dir):
    """Slowly-changing-dimension type 2: a change feed (1-3 synthetic
    versions per customer) becomes a validity-ranged history — each
    version valid from its own timestamp until the NEXT version's
    (lead window), open-ended on the current row. The other half of
    the CDC story beside MERGE (operators.upsert keeps only the latest
    state; SCD2 keeps all of them queryable as-of any point)."""
    from pyspark.sql import Window

    cust = table(spark, sf_dir, "customer")
    versions = cust.select(
        "c_custkey",
        F.explode(
            F.sequence(F.lit(1), (F.col("c_custkey") % 3 + 1).cast("int"))
        ).alias("version"),
        "c_acctbal",
    ).select(
        "c_custkey",
        F.col("version").cast("bigint").alias("version"),
        F.round(F.col("c_acctbal") + 10 * F.col("version"), 2).alias("acctbal"),
    )
    w = Window.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return versions.select(
        "c_custkey",
        "version",
        "acctbal",
        F.col("version").alias("valid_from"),
        F.coalesce(nxt, F.lit(9999)).cast("bigint").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("c_custkey", "version")


@register(
    "winsorized_event_values",
    """
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(b.p05, 4) AS p05,
           ROUND(b.p95, 4) AS p95,
           COUNT(*) FILTER (WHERE e.value < b.p05) AS n_low,
           COUNT(*) FILTER (WHERE e.value > b.p95) AS n_high,
           CAST(CAST(SUM(CAST(LEAST(GREATEST(e.value, b.p05), b.p95)
                         AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS clipped_sum
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    ORDER BY e.event_type
    """,
)
def winsorized_event_values(spark, sf_dir):
    """Winsorization (outlier clipping, the standard guard before a
    numeric feature feeds training): per-group exact p05/p95, values
    clamped into the band, clip counts and the clipped sum reported.
    The bounds frame is one row per group — broadcast back onto the
    fact scan, so the clip pass adds no shuffle beyond the aggregate's
    own; the clipped sum accumulates in DECIMAL (row order across
    engines cannot perturb it)."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.when(F.col("value") < F.col("p05"), 1)).alias("n_low"),
            F.count(F.when(F.col("value") > F.col("p95"), 1)).alias("n_high"),
            F.sum(clipped.cast("decimal(18,4)")).cast("double").alias("clipped_sum"),
        )
        .select(
            "event_type",
            F.round("p05", 4).alias("p05"),
            F.round("p95", 4).alias("p95"),
            "n_low",
            "n_high",
            "clipped_sum",
        )
        .orderBy("event_type")
    )


@register(
    "bilingual_name_split",
    """
    WITH synth AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN '沙田第' || CAST(doc_id AS VARCHAR) || '號 ' || text
                    ELSE text END AS combined
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           NULLIF(regexp_extract(combined, '[ ]*([A-Za-z0-9''\\-,. ]{4,})', 1), '') AS eng,
           NULLIF(regexp_extract(combined, '([^A-Za-z''\\-,. ]+[0-9]?[^A-Za-z''\\-,. ]+)', 1), '') AS chi
    FROM synth ORDER BY doc_id
    """,
)
def bilingual_name_split(spark, sf_dir):
    """F3: regex split of a combined bilingual value into the English
    and Chinese runs (CJK prefix synthesized on every third doc)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    combined = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("沙田第"), F.col("doc_id").cast("string"), F.lit("號 "), F.col("text")
        ),
    ).otherwise(F.col("text"))
    synth = docs.select("doc_id", combined.alias("combined"))
    return synth.select(
        "doc_id",
        N.extract_english_name(F.col("combined")).alias("eng"),
        N.extract_chinese_name(F.col("combined")).alias("chi"),
    ).orderBy("doc_id")


@register(
    "docs_mentioning_spark",
    """
    SELECT doc_id FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
    ORDER BY doc_id
    """,
)
def docs_mentioning_spark(spark, sf_dir):
    """P5/P7-shaped higher-order EXISTS over a split array."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.exists(F.split(F.col("text"), " "), lambda w: w == F.lit("spark")))
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "customers_asof_version",
    """
    WITH versions AS (
        SELECT c_custkey, CAST(v AS BIGINT) AS version,
               ROUND(c_acctbal + 10 * v, 2) AS acctbal
        FROM customer, range(1, 4) t(v)
        WHERE v <= c_custkey % 3 + 1
    ),
    hist AS (
        SELECT c_custkey, version, acctbal,
               version AS valid_from,
               COALESCE(LEAD(version) OVER (PARTITION BY c_custkey
                                            ORDER BY version), 9999)
                   AS valid_to
        FROM versions
    )
    SELECT c_custkey, CAST(version AS BIGINT) AS version, acctbal
    FROM hist
    WHERE valid_from <= 2 AND 2 < valid_to
    ORDER BY c_custkey
    """,
)
def customers_asof_version(spark, sf_dir):
    """Point-in-time (AS OF) read over the SCD2 history: reconstruct
    the customer dimension exactly as it stood at version 2 — one
    validity-range filter over the history built by
    `scd2_customer_history`, completing the CDC lifecycle
    (snapshot_diff → MERGE → SCD2 → time travel). Every customer
    appears exactly once (validity ranges partition time); customers
    whose history starts later would drop out, which the range
    predicate handles with no special casing. At scale the history is
    partitioned by valid_from buckets so the as-of filter prunes
    files, not rows."""
    hist = QUERIES["scd2_customer_history"](spark, sf_dir)
    v = 2
    return (
        hist.filter((F.col("valid_from") <= v) & (F.lit(v) < F.col("valid_to")))
        .select("c_custkey", F.col("version").cast("bigint").alias("version"), "acctbal")
        .orderBy("c_custkey")
    )


@register(
    "lineitem_bucket_checksums",
    """
    WITH rows_h AS (
        SELECT md5(
            COALESCE(CAST(l_orderkey AS VARCHAR), '\\N') || '|' ||
            COALESCE(CAST(l_partkey AS VARCHAR), '\\N') || '|' ||
            COALESCE(CAST(l_suppkey AS VARCHAR), '\\N') || '|' ||
            COALESCE(CAST(l_linenumber AS VARCHAR), '\\N') || '|' ||
            COALESCE(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS VARCHAR), '\\N')
            || '|' ||
            COALESCE(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR),
                     '\\N')
            || '|' || COALESCE(l_returnflag, '\\N')
            || '|' || COALESCE(l_linestatus, '\\N')
        ) AS h
        FROM lineitem
    ),
    vals AS (
        SELECT substr(h, 1, 2) AS bucket,
               CAST(('0x' || substr(h, 3, 12)) AS BIGINT) AS v
        FROM rows_h
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(v) AS BIGINT) AS xor48,
           CAST(SUM(v) AS VARCHAR) AS sum48
    FROM vals GROUP BY bucket ORDER BY bucket
    """,
)
def lineitem_bucket_checksums(spark, sf_dir):
    """Cross-engine reconciliation digest over the biggest fact table:
    canonical row serialization (integer-exact casts) → md5 → 256
    hash-prefix buckets → per-bucket (count, XOR-48, exact decimal
    sum). Order- and partitioning-insensitive by construction, so the
    same digest emerges from any cluster layout; comparing two engines
    or replicas is a 256-row diff instead of a row-by-row join. This
    oracle match IS the use case: DuckDB recomputes the digest from the
    same parquet and every bucket triple agrees. Map-side hash + one
    tiny-key groupBy — scan-bound at any scale."""
    from udacity_data_wrangling_osm_case_study_spark.operators import validation

    li = table(spark, sf_dir, "lineitem")
    digest = validation.bucket_digest(
        li,
        [
            F.col("l_orderkey"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_linenumber"),
            F.round("l_quantity").cast("long"),
            F.round(F.col("l_extendedprice") * 100).cast("long"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        ],
    )
    return digest.orderBy("bucket")


@register(
    "record_linkage_matches",
    """
    WITH a AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal,
               c_mktsegment AS seg
        FROM customer
    ),
    b AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey % 4 = 0
                    THEN substr(c_name, 1, CAST(c_custkey % 8 AS INT))
                         || substr(c_name, CAST(c_custkey % 8 AS INT) + 2)
                    ELSE c_name END AS name,
               CASE WHEN c_custkey % 7 = 0
                    THEN CAST((c_nationkey + 1) % 25 AS INT)
                    ELSE c_nationkey END AS nat,
               CAST(ROUND(c_acctbal * 100) AS BIGINT)
                   + CASE WHEN c_custkey % 11 = 0 THEN 500
                          ELSE (c_custkey % 3) * 7 END AS bal,
               CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN'
                    ELSE c_mktsegment END AS seg
        FROM customer
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b, a.name AS an, b.name AS bn,
               a.nat AS anat, b.nat AS bnat, a.bal AS abal, b.bal AS bbal,
               a.seg AS aseg, b.seg AS bseg
        FROM a JOIN b ON a.name = b.name
        UNION
        SELECT a.id, b.id, a.name, b.name, a.nat, b.nat, a.bal, b.bal,
               a.seg, b.seg
        FROM a JOIN b
          ON a.nat = b.nat
         AND CAST(floor(a.bal / 100.0) AS BIGINT)
             = CAST(floor(b.bal / 100.0) AS BIGINT)
    ),
    scored AS (
        SELECT id_a, id_b,
               (CASE WHEN an = bn THEN 40 ELSE -10 END
              + CASE WHEN bseg = 'UNKNOWN' THEN 0
                     WHEN aseg = bseg THEN 10 ELSE -5 END
              + CASE WHEN ABS(abal - bbal) <= 100 THEN 25 ELSE -15 END
              + CASE WHEN anat = bnat THEN 15 ELSE -10 END) AS score
        FROM cand
    )
    SELECT id_a, id_b, CAST(score AS BIGINT) AS score
    FROM scored WHERE score >= 35
    ORDER BY id_a, id_b
    """,
)
def record_linkage_matches(spark, sf_dir):
    """Fellegi–Sunter record linkage across two keyless sources: the
    customer table vs a deterministically-corrupted import of itself
    (dropped name chars, shifted nations, jittered balances, UNKNOWN
    segments — the classic dirty-feed corpus). Candidates come from TWO
    unioned blocking passes — exact name; (nation, dollar-band of
    balance) — each a SELECTIVE plain equi-join: a field corrupted out
    of one block is caught by the other, nothing ever goes all-pairs,
    and no single low-cardinality key (nation alone would put 1/25 of
    the table in one block) drives per-block products quadratic. Integer agreement
    weights per field (exact-name 40/−10, segment 10/0/−5 with UNKNOWN
    as missing, balance-within-$1 25/−15, nation 15/−10) sum row-
    locally; score ≥ 35 classifies a match (operators.linkage). The
    generalization of the reference's curated street-typo dict to
    whole-record resolution."""
    from udacity_data_wrangling_osm_case_study_spark.operators import linkage

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    a = cust.select(
        k.alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        bal_c.alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    b = cust.select(
        k.alias("id"),
        F.when(
            k % 4 == 0,
            F.concat(
                F.expr("substring(c_name, 1, cast(c_custkey % 8 as int))"),
                F.expr("substring(c_name, cast(c_custkey % 8 as int) + 2)"),
            ),
        ).otherwise(F.col("c_name")).alias("name"),
        F.when(k % 7 == 0, ((F.col("c_nationkey") + 1) % 25).cast("int"))
        .otherwise(F.col("c_nationkey")).alias("nat"),
        (bal_c + F.when(k % 11 == 0, F.lit(500)).otherwise((k % 3) * 7)).alias("bal"),
        F.when(k % 5 == 0, F.lit("UNKNOWN")).otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    band = lambda df: df.withColumn("band", F.floor(F.col("bal") / 100).cast("long"))  # noqa: E731
    cand = linkage.blocked_candidates(
        band(a), band(b), id_a="id", id_b="id",
        passes=[["name"], ["nat", "band"]],
    )
    scored = linkage.fs_score(
        cand,
        [
            F.when(F.col("a_name") == F.col("b_name"), 40).otherwise(-10),
            F.when(F.col("b_seg") == "UNKNOWN", 0)
            .when(F.col("a_seg") == F.col("b_seg"), 10)
            .otherwise(-5),
            F.when(F.abs(F.col("a_bal") - F.col("b_bal")) <= 100, 25).otherwise(-15),
            F.when(F.col("a_nat") == F.col("b_nat"), 15).otherwise(-10),
        ],
    )
    return (
        scored.filter(F.col("score") >= 35)
        .select("id_a", "id_b", "score")
        .orderBy("id_a", "id_b")
    )


@register(
    "events_quality_report",
    """
    SELECT 'events' AS tbl, 'event_id_not_null' AS rule,
           COUNT(*) FILTER (WHERE event_id IS NULL) AS n_violations
    FROM events
    UNION ALL
    SELECT 'events', 'event_id_unique',
           (SELECT COUNT(*) FROM
              (SELECT event_id FROM events GROUP BY event_id
               HAVING COUNT(*) > 1))
    FROM (SELECT 1)
    UNION ALL
    SELECT 'events', 'ts_in_range',
           COUNT(*) FILTER (WHERE ts IS NULL
               OR ts < TIMESTAMP '2000-01-01'
               OR ts > TIMESTAMP '2100-01-01')
    FROM events
    UNION ALL
    SELECT 'events', 'value_non_negative',
           COUNT(*) FILTER (WHERE value IS NULL OR value < 0)
    FROM events
    UNION ALL
    SELECT 'events', 'type_in_domain',
           COUNT(*) FILTER (WHERE event_type NOT IN
               ('click', 'view', 'purchase', 'login', 'error'))
    FROM events
    UNION ALL
    SELECT 'events', 'user_fk_resolves',
           (SELECT COUNT(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id % 1500000))
    FROM (SELECT 1)
    ORDER BY rule
    """,
)
def events_quality_report(spark, sf_dir):
    """Declarative data-contract validation over the driver's event
    feed — the engine's cerberus answer (operators/validation.py)
    applied to driver testdata: each rule is ONE aggregate predicate
    (null, uniqueness, range, enum domain, referential resolution),
    all unioned into a single queryable violations report. Zero rows
    would mean "don't ingest"; counts localize the break. Every rule is
    a scan-bound filter-count except uniqueness (one groupBy on the
    key) and the FK anti-join probe."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")

    def rule(name, cnt_df):
        return cnt_df.select(
            F.lit("events").alias("tbl"),
            F.lit(name).alias("rule"),
            F.col("n").cast("long").alias("n_violations"),
        )

    dup = (
        ev.groupBy("event_id").count().filter("count > 1")
        .agg(F.count("*").alias("n"))
    )
    fk = (
        ev.withColumn("k", F.col("user_id") % 1_500_000)
        .join(cust.select(F.col("c_custkey").alias("k")), "k", "left_anti")
        .agg(F.count("*").alias("n"))
    )
    checks = [
        rule(
            "event_id_not_null",
            ev.agg(F.count_if(F.col("event_id").isNull()).alias("n")),
        ),
        rule("event_id_unique", dup),
        rule(
            "ts_in_range",
            ev.agg(
                F.count_if(
                    F.col("ts").isNull()
                    | (F.col("ts") < F.lit("2000-01-01").cast("timestamp"))
                    | (F.col("ts") > F.lit("2100-01-01").cast("timestamp"))
                ).alias("n")
            ),
        ),
        rule(
            "value_non_negative",
            ev.agg(
                F.count_if(
                    F.col("value").isNull() | (F.col("value") < 0)
                ).alias("n")
            ),
        ),
        rule(
            "type_in_domain",
            ev.agg(
                F.count_if(
                    ~F.col("event_type").isin(
                        "click", "view", "purchase", "login", "error"
                    )
                ).alias("n")
            ),
        ),
        rule("user_fk_resolves", fk),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("rule")


@register(
    "telemetry_debounce",
    """
    WITH o AS (
        SELECT user_id, event_type, event_id, ts,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_type, event_id,
               CASE WHEN gap_us IS NULL OR gap_us > 5000000
                    THEN 1 ELSE 0 END AS is_first
        FROM o
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(is_first) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(is_first) AS BIGINT) AS n_debounced,
           CAST(SUM(CASE WHEN is_first = 1 THEN event_id ELSE 0 END)
                AS BIGINT) AS kept_id_checksum
    FROM flagged GROUP BY user_id, event_type
    HAVING COUNT(*) - SUM(is_first) > 0
    ORDER BY user_id, event_type
    """,
)
def telemetry_debounce(spark, sf_dir):
    """Telemetry double-fire cleanup (debounce): an event repeated by
    the same user with the same type within 5 s of its predecessor is
    a retry/double-click artifact, not a new signal — keep only the
    first event of each burst. One lag over a single (user, type, time)
    sort flags burst starts; the report counts kept vs debounced per
    key with an id checksum over the survivors, so the exact KEEP SET
    (not just counts) is value-attested. The tolerance-window variant
    of exact dedup: equality on the key, proximity on time."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = ev.withColumn(
        "gap_us", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    )
    flagged = o.select(
        "user_id",
        "event_type",
        "event_id",
        F.when(
            F.col("gap_us").isNull() | (F.col("gap_us") > 5_000_000), 1
        ).otherwise(0).alias("is_first"),
    )
    return (
        flagged.groupBy("user_id", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.sum("is_first").cast("long").alias("n_kept"),
            (F.count("*") - F.sum("is_first")).cast("long").alias("n_debounced"),
            F.sum(F.when(F.col("is_first") == 1, F.col("event_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_checksum"),
        )
        .filter(F.col("n_debounced") > 0)
        .orderBy("user_id", "event_type")
    )


@register(
    "k_anonymity_audit",
    """
    WITH qi AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(floor(ROUND(c_acctbal * 100) / 100000.0) AS BIGINT)
                   AS bal_band
        FROM customer
    ),
    groups AS (
        SELECT nat, seg, bal_band, COUNT(*) AS group_size
        FROM qi GROUP BY nat, seg, bal_band
    )
    SELECT nat, seg, bal_band, CAST(group_size AS BIGINT) AS group_size
    FROM groups WHERE group_size < 5
    ORDER BY nat, seg, bal_band
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """Privacy audit before data release: quasi-identifier combinations
    (nation, segment, $1000 balance band) whose group size falls below
    k = 5 — each flagged row is a re-identification risk the release
    pipeline must generalize or suppress. One groupBy over the
    quasi-identifier tuple; the violating groups are by definition the
    SMALL ones, so the report is tiny no matter the table size."""
    cust = table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.round(F.col("c_acctbal") * 100) / 100000).cast("long").alias(
            "bal_band"
        ),
    )
    return (
        qi.groupBy("nat", "seg", "bal_band")
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < 5)
        .orderBy("nat", "seg", "bal_band")
    )


@register(
    "monotonic_counter_repair",
    """
    WITH c AS (
        SELECT user_id, event_id, ts,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS raw_c
        FROM events
    ),
    corrupted AS (
        SELECT user_id, event_id,
               CASE WHEN event_id % 13 = 0 THEN raw_c - (raw_c // 3)
                    ELSE raw_c END AS obs_c
        FROM c
    ),
    repaired AS (
        SELECT user_id, event_id, obs_c,
               MAX(obs_c) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fix_c
        FROM corrupted
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(COUNT(*) FILTER (WHERE fix_c <> obs_c) AS BIGINT)
               AS n_repaired,
           CAST(SUM(fix_c) AS BIGINT) AS repaired_checksum
    FROM repaired GROUP BY user_id ORDER BY user_id
    """,
)
def monotonic_counter_repair(spark, sf_dir):
    """Monotonic-counter (odometer) repair: a per-user cumulative
    counter is deterministically corrupted with dips (every 13th
    reading drops a third — the reset/glitch telemetry exhibits), then
    repaired with the running-maximum rule — a reading can never
    legally fall, so ``fix = max(obs, running max)``. Both the
    corruption and the repair are windows over ONE (user, order) sort;
    the per-user report checksums the repaired series so the exact
    fixed values are attested, not just repair counts."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    wts = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = ev.select(
        "user_id",
        "event_id",
        F.sum(F.round(F.col("value") * 100).cast("long")).over(wts).alias("raw_c"),
    )
    corrupted = c.select(
        "user_id",
        "event_id",
        F.when(
            F.col("event_id") % 13 == 0,
            F.col("raw_c") - F.expr("raw_c div 3"),
        ).otherwise(F.col("raw_c")).alias("obs_c"),
    )
    wid = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    repaired = corrupted.withColumn("fix_c", F.max("obs_c").over(wid))
    return (
        repaired.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.count_if(F.col("fix_c") != F.col("obs_c"))
            .cast("long")
            .alias("n_repaired"),
            F.sum("fix_c").cast("long").alias("repaired_checksum"),
        )
        .orderBy("user_id")
    )


@register(
    "cdc_apply_snapshot",
    """
    WITH base AS (
        SELECT c_custkey AS custkey, c_name AS name,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
    )
    SELECT custkey, name, bal_c FROM (
        SELECT custkey, name,
               CASE WHEN custkey % 5 = 0 THEN bal_c - 2500
                    WHEN custkey % 7 = 0 THEN bal_c + 5000
                    ELSE bal_c END AS bal_c
        FROM base WHERE custkey % 13 <> 0
        UNION ALL
        SELECT custkey + 10000000, 'new_' || CAST(custkey AS VARCHAR),
               CAST(custkey AS BIGINT)
        FROM base WHERE custkey % 11 = 0
    ) ORDER BY custkey
    """,
)
def cdc_apply_snapshot(spark, sf_dir):
    """Batch twin of the streaming CDC consumer
    (streaming/cdc_apply.py): two deterministic change batches run
    through the SAME collapse + MERGE operators the foreachBatch sink
    uses — within-batch netting (highest seq per key wins, incl. a
    decoy early update and an update-then-delete key), whole-row
    UPDATE SET *, inserts, and tombstone deletes — and the final
    snapshot is returned. The oracle states the closed-form NET effect
    of both batches (batch-2 updates replace batch-1's, deletes beat
    same-batch updates), so any drift in collapse order, tombstone
    handling, or merge precedence breaks the value match. Each merge
    is one full-outer key shuffle; at scale the snapshot side stops
    shuffling with a bucketed layout (operators/layout.py)."""
    from udacity_data_wrangling_osm_case_study_spark.operators import upsert
    from udacity_data_wrangling_osm_case_study_spark.streaming import cdc_apply

    base = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    dead = F.lit(False).alias("dead")

    # Batch 1 (uncollapsed): a decoy seq-1 update that the seq-2 row
    # must shadow, plus inserts in a disjoint key range.
    b1 = (
        base.filter(F.col("custkey") % 7 == 0)
        .select(
            "custkey", "name",
            (F.col("bal_c") + 99999).alias("bal_c"),
            dead, F.lit(1).alias("seq"),
        )
        .unionByName(
            base.filter(F.col("custkey") % 7 == 0).select(
                "custkey", "name",
                (F.col("bal_c") + 5000).alias("bal_c"),
                dead, F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            base.filter(F.col("custkey") % 11 == 0).select(
                (F.col("custkey") + 10000000).alias("custkey"),
                F.concat(F.lit("new_"), F.col("custkey").cast("string")).alias(
                    "name"
                ),
                F.col("custkey").cast("long").alias("bal_c"),
                dead, F.lit(1).alias("seq"),
            )
        )
    )
    s1 = upsert.merge_upsert(
        base, cdc_apply.collapse_changes(b1, "custkey"), "custkey", "dead"
    )

    # Batch 2 (uncollapsed): updates (seq 1) and deletes (seq 2) —
    # keys divisible by both 5 and 13 must net to the delete.
    b2 = (
        base.filter(F.col("custkey") % 5 == 0)
        .select(
            "custkey", "name",
            (F.col("bal_c") - 2500).alias("bal_c"),
            dead, F.lit(1).alias("seq"),
        )
        .unionByName(
            base.filter(F.col("custkey") % 13 == 0).select(
                "custkey",
                F.lit(None).cast("string").alias("name"),
                F.lit(None).cast("long").alias("bal_c"),
                F.lit(True).alias("dead"),
                F.lit(2).alias("seq"),
            )
        )
    )
    s2 = upsert.merge_upsert(
        s1, cdc_apply.collapse_changes(b2, "custkey"), "custkey", "dead"
    )
    return s2.select("custkey", "name", "bal_c").orderBy("custkey")
