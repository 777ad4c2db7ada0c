"""Adversarial-skew stress: the dedup/substring shuffles under
corpus-level hot keys (VERDICT r7, next-round item 5).

Two distinct skew regimes, because they stress different operators:

- A boilerplate SENTENCE in 50%+ of documents makes the gram census's
  groupBy key hot — the census must complete through map-side partial
  aggregation (the hot gram contributes at most one partial row per
  map partition to the shuffle, never one row per occurrence).
- IDENTICAL documents make LSH band buckets hot — the bucket
  self-join's b²/2 term explodes, and the right guard is the bucket
  cap + the linear exact pass, NOT band-key salting (identical docs
  collide under any correctness-preserving salt).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import dedup, substrings

BOILER = "alpha beta gamma delta epsilon"


def _corpus(spark, n: int, boiler_every: int = 2):
    """n docs of 10 unique filler tokens; every ``boiler_every``-th doc
    carries the shared 5-token boilerplate sentence appended."""
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(10)),
            lambda j: F.concat(F.lit("w"), (F.col("id") * 10 + j).cast("string")),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % boiler_every == 0,
            F.concat(filler, F.lit(" " + BOILER)),
        )
        .otherwise(filler)
        .alias("text"),
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_gram_census_hot_boilerplate_partial_agg(spark):
    """50% of 3,000 docs share one boilerplate sentence. The census
    must (a) plan with map-side partial aggregation — the hot gram's
    shuffle contribution is bounded by the map partition count, not its
    1,500 occurrences — and (b) count it exactly."""
    docs = _corpus(spark, 3000)
    base = substrings.tokenized(docs)
    census = substrings.gram_starts(base, 5).groupBy("g").agg(
        F.count("*").alias("n")
    )
    p = _plan(census)
    assert "partial_count" in p, "census lost map-side combine"

    boiler_key = (
        spark.range(1)
        .select(F.unhex(F.md5(F.lit(BOILER))).alias("g"))
        .collect()[0]["g"]
    )
    top = census.orderBy(F.desc("n")).limit(1).collect()[0]
    assert bytes(top["g"]) == bytes(boiler_key)
    assert top["n"] == 1500
    # every other 5-gram straddles unique filler: strictly colder
    second = census.orderBy(F.desc("n")).limit(2).collect()[1]
    assert second["n"] < 10


def test_coverage_completes_and_is_exact_under_boilerplate_skew(spark):
    """End-to-end span coverage on the skewed corpus: the 1,500
    boilerplate carriers each report exactly the 5 duplicated tokens;
    the clean half reports zero."""
    docs = _corpus(spark, 3000)
    cov = substrings.span_coverage(docs, l=5)
    agg = cov.groupBy("dup_tokens").count().collect()
    got = {r["dup_tokens"]: r["count"] for r in agg}
    assert got == {5: 1500, 0: 1500}, got


def test_lsh_band_join_survives_boilerplate_sentence(spark):
    """The boilerplate sentence must NOT create a hot band bucket: band
    keys hash whole signature slices, and each doc's other shingles
    differ, so candidate pairs stay near zero — no salting needed for
    the shared-sentence regime (the finding VERDICT item 5 asked the
    test to establish)."""
    n = 1000
    docs = _corpus(spark, n)
    sh = dedup.word_shingles(docs, n=3)
    bands = dedup.lsh_bands(dedup.minhash_signatures(sh, num_hashes=8))
    pairs = dedup.lsh_candidate_pairs(bands).count()
    # quadratic blow-up would be ~(n/2)^2/2 = 125,000 pairs
    assert pairs < n, pairs


def test_lsh_bucket_cap_bounds_identical_doc_blowup(spark):
    """400 identical docs + 400 unique: uncapped, the clone cluster
    forms 400*399/2 pairs; with the bucket cap the self-join drops the
    hot buckets and the linear exact pass reports the same cluster as
    ONE group — composition keeps the semantics at linear cost."""
    clones = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("the same document body repeated verbatim everywhere").alias(
            "text"
        ),
    )
    uniq = _corpus(spark, 400).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    docs = clones.unionAll(uniq)
    sh = dedup.word_shingles(docs, n=3)
    bands = dedup.lsh_bands(dedup.minhash_signatures(sh, num_hashes=8)).cache()

    uncapped = dedup.lsh_candidate_pairs(bands).count()
    assert uncapped >= 400 * 399 // 2  # the quadratic term is real

    capped = dedup.lsh_candidate_pairs(bands, max_bucket_size=10).count()
    assert capped < 400  # hot buckets dropped, cold pairs kept

    groups = dedup.exact_duplicate_groups(docs)
    clone_group = groups.filter(F.col("group_size") == 400)
    assert clone_group.count() == 1  # the exact pass owns the clones
    bands.unpersist()
