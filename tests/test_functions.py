"""Unit tests for the pure-Column scalar functions (F1-F4, P2-P3).

Edge cases taken from the reference's measured dirty-data
characteristics (FIXTURES.md §2; regexes parse_clean_and_csv.py:36-59).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.functions import keys as K
from udacity_data_wrangling_osm_case_study_spark.functions import names as N
from udacity_data_wrangling_osm_case_study_spark.functions import phones as P


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r[0] for r in df.select(fn(F.col("v"))).collect()]


PHONE_CASES = [
    # the weirdly-segmented real record from the audit
    ("+85 22 19 21222", "+852 21921222"),
    # plain HK 8-digit, with separators / parens
    ("2345 6789", "+852 23456789"),
    ("(852) 2345-6789", "+852 23456789"),
    # fullwidth plus U+FF0B
    ("＋852 2345 6789", "+852 23456789"),
    # multi-number values, both delimiters
    ("2345 6789; 9876 5432", "+852 23456789;+852 98765432"),
    ("23456789,98765432", "+852 23456789;+852 98765432"),
    # >=1 match → unmatched segments dropped
    ("23456789, not a phone", "+852 23456789"),
    # no match → pass through unchanged
    ("not a phone", "not a phone"),
    ("12345", "12345"),
    # PRC cell with and without 86 prefix
    ("8613812345678", "+86 13812345678"),
    ("138 1234 5678", "+86 13812345678"),
    # SZ landline with 0755 / 755 / 86 prefixes
    ("0755 1234567", "+86 755 1234567"),
    ("86 755 12345678", "+86 755 12345678"),
    # cascade order: 852-prefixed 11-digit hits the HK rule first
    ("85223456789", "+852 23456789"),
    # idempotence on already-canonical values
    ("+852 23456789", "+852 23456789"),
    ("+86 13812345678;+852 23456789", "+86 13812345678;+852 23456789"),
]


@pytest.mark.parametrize("raw,expected", PHONE_CASES)
def test_fix_phone_value(spark, raw, expected):
    assert _apply(spark, P.fix_phone_value, [raw]) == [expected]


def test_fix_phone_idempotent(spark):
    once = _apply(spark, P.fix_phone_value, [c[0] for c in PHONE_CASES])
    twice = _apply(spark, P.fix_phone_value, once)
    assert once == twice


def test_capwords_matches_python(spark):
    import string

    values = [
        "ABERDEEN MAIN ROAD",
        "d'aguilar STREET",
        "  spaced   out  NAME ",
        "McGregor street",
    ]
    expected = [string.capwords(v) for v in values]
    assert _apply(spark, N.capwords, values) == expected


def test_bilingual_split(spark):
    combined = "清水灣道 Clear Water Bay Road"
    assert _apply(spark, N.extract_english_name, [combined]) == [
        "Clear Water Bay Road"
    ]
    assert _apply(spark, N.extract_chinese_name, [combined]) == ["清水灣道"]
    # English-only value has no Chinese run
    assert _apply(spark, N.extract_chinese_name, ["Main Road"]) == [None]


def test_key_split_first_colon(spark):
    vals = ["name:zh:yue", "addr:street", "highway"]
    assert _apply(spark, K.key_type, vals) == ["name", "addr", "regular"]
    assert _apply(spark, K.key_remainder, vals) == ["zh:yue", "street", "highway"]


def test_problem_chars(spark):
    vals = ["good_key", "bad key", "semi;colon", "d.o.t"]
    assert _apply(spark, K.has_problem_chars, vals) == [False, True, True, True]
