"""Text-analysis queries (scale extensions): language ID, quality
scoring, token stats, fingerprinting, character census, top words.

All drive ``operators.textstats`` pure column expressions; ratios are
single IEEE divisions (identical across engines) rounded to 4dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import textstats
from udacity_data_wrangling_osm_case_study_spark.plans.registry import register, table

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"
_STOPS = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "doc_profiles",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, {_NORM} AS norm FROM documents),
    m AS (
        SELECT doc_id, toks, norm,
               len(toks) AS n_tokens,
               len(list_filter(toks, w -> list_contains({_STOPS}, w)))
                   AS n_stop,
               list_reduce(list_transform(toks, w -> strlen(w)),
                           (a, b) -> a + b) AS total_len
        FROM t
    )
    SELECT doc_id,
           n_tokens,
           (n_stop * 10000) // n_tokens AS stop_ratio_bp,
           (total_len * 100) // n_tokens AS avg_token_len_c,
           ((10 * n_stop + 10 * n_tokens - abs(total_len - 5 * n_tokens))
            * 1000) // (20 * n_tokens) AS quality_pm,
           CASE WHEN list_contains(toks, 'the') THEN 'en'
                WHEN list_contains(toks, 'der') THEN 'de'
                WHEN list_contains(toks, 'le') THEN 'fr'
                WHEN list_contains(toks, 'el') THEN 'es'
                ELSE 'und' END AS lang_guess,
           md5(norm) AS fingerprint
    FROM m ORDER BY doc_id
    """,
)
def doc_profiles(spark, sf_dir):
    """Per-doc analysis: token count, stopword ratio (basis points),
    avg token length (centi-chars), composite quality (per-mille),
    marker-word language guess, content fingerprint — one codegen pass.
    Ratio metrics are integer-scaled: exact in every engine."""
    return textstats.doc_profile(table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "lang_id_confusion",
    f"""
    WITH g AS (
        SELECT lang,
               CASE WHEN list_contains({_TOKS}, 'the') THEN 'en'
                    WHEN list_contains({_TOKS}, 'der') THEN 'de'
                    WHEN list_contains({_TOKS}, 'le') THEN 'fr'
                    WHEN list_contains({_TOKS}, 'el') THEN 'es'
                    ELSE 'und' END AS lang_guess
        FROM documents
    )
    SELECT lang, lang_guess, COUNT(*) AS n
    FROM g GROUP BY lang, lang_guess ORDER BY lang, lang_guess
    """,
)
def lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix: labeled lang × marker-word guess."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", textstats.lang_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_guess")
    )


@register(
    "corpus_token_stats",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
    SELECT COUNT(*) AS total_tokens,
           COUNT(DISTINCT w) AS distinct_tokens,
           COUNT(DISTINCT doc_id) AS n_docs,
           ROUND(COUNT(*) / COUNT(DISTINCT doc_id), 4) AS avg_tokens_per_doc
    FROM tok
    """,
)
def corpus_token_stats(spark, sf_dir):
    """Corpus-level token counting (whitespace tokenizer)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(textstats.tokens(F.col("text"))).alias("w")
    )
    return tok.agg(
        F.count("*").alias("total_tokens"),
        F.countDistinct("w").alias("distinct_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.count("*") / F.countDistinct("doc_id"), 4).alias(
            "avg_tokens_per_doc"
        ),
    )


@register(
    "top_words",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS w FROM documents)
    SELECT w, COUNT(*) AS n FROM tok
    GROUP BY w ORDER BY n DESC, w LIMIT 10
    """,
)
def top_words(spark, sf_dir):
    """A1/O1 on text: top-10 tokens by frequency."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(textstats.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(10)
    )


@register(
    "char_census",
    """
    WITH ch AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        FROM documents
    )
    SELECT ch, MIN(doc_id) AS first_doc
    FROM ch GROUP BY ch ORDER BY ch
    """,
)
def char_census(spark, sf_dir):
    """A3: the phone-audit character census — distinct characters with
    the first document they appear in."""
    return textstats.char_census(table(spark, sf_dir, "documents")).select(
        "ch", "first_doc"
    ).orderBy("ch")


@register(
    "props_key_histogram",
    """
    SELECT CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY k ORDER BY k
    """,
)
def props_key_histogram(spark, sf_dir):
    """Semi-structured props column: regex field extraction + rollup."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.regexp_extract(F.col("props"), "(\\d+)", 1).cast("int").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("k")
    )


@register(
    "regex_token_count",
    f"""
    WITH t AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_symbol_tokens,
               len({_TOKS}) AS n_ws_tokens
        FROM documents
    )
    SELECT doc_id, n_word_tokens, n_symbol_tokens, n_ws_tokens,
           n_word_tokens + n_symbol_tokens AS n_bpe_ish_tokens
    FROM t ORDER BY doc_id
    """,
)
def regex_token_count(spark, sf_dir):
    """Token counting two ways: whitespace split and a BPE-ish regex
    tokenizer (alnum runs + individual symbols) — the pre-tokenization
    cost model for an LLM data pipeline, all in one scan."""
    docs = table(spark, sf_dir, "documents")
    word = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    sym = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-z0-9 ]"), 0))
    ws = F.size(textstats.tokens(F.col("text")))
    return docs.select(
        "doc_id",
        word.alias("n_word_tokens"),
        sym.alias("n_symbol_tokens"),
        ws.alias("n_ws_tokens"),
        (word + sym).alias("n_bpe_ish_tokens"),
    ).orderBy("doc_id")


@register(
    "train_val_test_split",
    """
    WITH b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 10 THEN 'test'
                WHEN bucket < 20 THEN 'val'
                ELSE 'train' END AS split,
           lang, COUNT(*) AS n
    FROM b GROUP BY split, lang ORDER BY split, lang
    """,
)
def train_val_test_split(spark, sf_dir):
    """Deterministic content-hash dataset split (10/10/80): the same
    doc always lands in the same split, across engines, runs, and
    repartitioning — RNG sampling can guarantee none of that. Output:
    split × lang counts (the stratification audit)."""
    from udacity_data_wrangling_osm_case_study_spark.operators import sampling

    docs = sampling.train_val_test_split(
        table(spark, sf_dir, "documents"), "doc_id"
    )
    return (
        docs.groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
        .orderBy("split", "lang")
    )
