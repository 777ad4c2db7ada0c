"""Winnowing fingerprint operator: guarantee, edge cases, skew cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import fingerprint

K, W = 8, 4


def _fps(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["id"]: set(r["fps"])
        for r in fingerprint.winnow_fingerprints(df, k=K, w=W).collect()
    }


def test_winnowing_guarantee_shared_substring(spark):
    # Any match >= k + w - 1 chars must contribute a shared fingerprint
    # (Schleimer et al. 2003, theorem 1) — here a full shared sentence
    # embedded in different surroundings.
    core = "the quick brown fox jumps over the lazy dog"
    fps = _fps(
        spark,
        [
            (1, f"AAAA {core} BBBB"),
            (2, f"zzzz yyyy {core} qqqq"),
            (3, "completely unrelated content with no common substring"),
        ],
    )
    assert fps[1] & fps[2], "docs sharing a long substring must share a fingerprint"
    assert not (fps[1] & fps[3]) or len(fps[1] & fps[3]) < len(fps[1] & fps[2])


def test_short_doc_edges(spark):
    fps = _fps(
        spark,
        [
            (1, ""),  # no grams
            (2, "abc"),  # shorter than k
            (3, "abcdefgh"),  # exactly one gram (< w grams: one window)
            (4, "abcdefghij"),  # a few grams, still < w + k - 1 chars
        ],
    )
    assert fps[1] == set()
    assert fps[2] == set()
    assert len(fps[3]) == 1
    assert 1 <= len(fps[4]) <= 3


def test_fingerprints_deterministic_and_normalized(spark):
    # Whitespace/case normalization folds into identical fingerprints.
    fps = _fps(spark, [(1, "Hello   World Example"), (2, "hello world example")])
    assert fps[1] == fps[2]


def test_pair_search_and_df_cap(spark):
    boiler = "standard license header appears everywhere in this corpus"
    rows = [(i, f"{boiler} unique tail number {i} " + "x" * i) for i in range(10)]
    rows += [(100, "a wholly distinct document body with original phrasing here"),
             (101, "a wholly distinct document body with original phrasing here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = fingerprint.winnow_fingerprints(df, k=K, w=W)
    # Uncapped: the boilerplate block links all 10 docs pairwise.
    loose = fingerprint.fingerprint_pairs(fps, min_shared=2).count()
    # Capped at df<=2: boilerplate fingerprints (df=10) drop out; the
    # exact-duplicate pair (100, 101) survives on its unique content.
    capped = fingerprint.fingerprint_pairs(fps, min_shared=2, max_fp_df=2)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    assert loose > len(got)
    dup = [r for r in capped.collect() if (r["id_a"], r["id_b"]) == (100, 101)][0]
    assert dup["overlap"] == 1.0


def test_no_python_eval_in_plan(spark):
    df = spark.createDataFrame([(1, "some text for the plan shape probe")],
                               ["doc_id", "text"])
    plan = fingerprint.winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
