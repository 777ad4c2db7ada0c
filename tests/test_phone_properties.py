"""Property-based tests for the phone canonicalizer (SURVEY.md §5.2(4)):
idempotence and output-shape invariants over generated inputs, checked
in one vectorized Spark pass per property."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.functions import phones as P

CANONICAL_RE = re.compile(
    r"^(\+852 \d{8}|\+86 1[3-9]\d{9}|\+86 755 \d{6,8})(;(\+852 \d{8}|\+86 1[3-9]\d{9}|\+86 755 \d{6,8}))*$"
)

segment = st.one_of(
    st.from_regex(r"^(852)?[0-9]{8}$", fullmatch=True),
    st.from_regex(r"^\+?852[- ][0-9]{4}[- ][0-9]{4}$", fullmatch=True),
    st.from_regex(r"^(86)?1[3-9][0-9]{9}$", fullmatch=True),
    st.from_regex(r"^0?755[0-9]{6,8}$", fullmatch=True),
    st.text(
        alphabet="0123456789 ()-+＋abcxyz", min_size=0, max_size=18
    ),
)
phone_value = st.lists(segment, min_size=1, max_size=3).map(";".join)


def _fix_all(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [
        r[0] for r in df.select(P.fix_phone_value(F.col("v"))).collect()
    ]


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_phone_canonicalizer_properties(spark, data):
    # Draw a batch and evaluate all examples in ONE Spark job — the
    # property loop stays vectorized instead of per-example jobs.
    values = [data.draw(phone_value) for _ in range(200)]
    fixed = _fix_all(spark, values)
    refixed = _fix_all(spark, fixed)
    for raw, out, out2 in zip(values, fixed, refixed):
        # idempotence
        assert out == out2, (raw, out, out2)
        # shape: canonical list or untouched input
        assert out == raw or CANONICAL_RE.match(out), (raw, out)
