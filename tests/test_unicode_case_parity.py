"""Platform Unicode case-mapping parity (round-13 ``s`` campaign).

The engine's case-mapping semantics target is the REFERENCE's
platform: CPython (``parse_clean_and_csv.py`` uses ``string.capwords``
and ``str.lower``). Java (Spark) and CPython both implement the FULL
Unicode case mappings — string-level expansions (ß → SS, ﬁ → FI),
the U+0130 special case (İ → i + U+0307), and the context-sensitive
Final_Sigma rule (Σ → ς at word end). DuckDB's utf8proc applies the
SIMPLE per-codepoint table, so the differential oracle CANNOT attest
these inputs — the divergence is a platform property, not an engine
bug. These tests pin both halves of that claim:

1. Spark == CPython on every divergent class (the engine is correct
   per reference semantics), and
2. the exact DuckDB deltas, recorded value-for-value — if a DuckDB
   upgrade ever changes its case tables, the recorded delta breaks
   loudly and the ``s``-class pool's case-stability constraint
   (tests/test_fuzz_sclass.py::test_pool_is_case_stable) can be
   revisited.

The ``s`` fuzz pool therefore stays CASE-STABLE (lowercase ß/ligature
forms only, no İ/Σ), and the case-divergent inputs are covered HERE
against CPython instead of being laundered through (or silently
skipped by) the DuckDB gate.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# Inputs where full (Java/CPython) and simple (utf8proc) case mappings
# disagree. Each row: (input, what diverges).
DIVERGENT = [
    "ß",          # full upper: SS; simple upper: ẞ
    "İ",          # full lower: i + U+0307; simple lower: i
    "ΑΣ",         # Final_Sigma: full lower ας; simple ασ
    "Σ ΑΣ.",      # Final_Sigma with trailing punctuation
    "ﬁ",          # ligature: full upper FI; simple keeps ﬁ
    "ﬀ case",     # ligature mid-phrase
    "STRASSE ß",  # expansion inside a longer value
]


def test_spark_lower_matches_cpython(spark):
    """F.lower must equal str.lower codepoint-for-codepoint on every
    divergent input — including the context-sensitive Final_Sigma."""
    df = spark.createDataFrame([(s,) for s in DIVERGENT], ["s"])
    got = {r["s"]: r["lo"] for r in df.select("s", F.lower("s").alias("lo")).collect()}
    for s in DIVERGENT:
        assert got[s] == s.lower(), (
            f"Spark lower({s!r}) = {got[s]!r} != CPython {s.lower()!r}"
        )


def test_spark_capwords_matches_cpython_wordwise(spark):
    """The engine's capwords (initcap∘lower) must match CPython's
    per-word capitalize on the case-expansion inputs. ``ß`` leads:
    CPython str.capitalize titlecases the first char with the FULL
    mapping ('ß'.capitalize() == 'Ss'); Java initcap must agree."""
    import string

    from udacity_data_wrangling_osm_case_study_spark.functions import names as N

    cases = ["ß weg", "STRASSE ß", "ﬁ ligature", "ǳungla dz"]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {
        r["s"]: r["cw"]
        for r in df.select("s", N.capwords(F.col("s")).alias("cw")).collect()
    }
    for s in cases:
        assert got[s] == string.capwords(s), (
            f"capwords({s!r}) = {got[s]!r} != CPython "
            f"{string.capwords(s)!r}"
        )


# The recorded platform delta: (input, duckdb lower, duckdb upper).
# CPython truth lives in the test body; these literals are what DuckDB
# 1.0.0's utf8proc actually returns (probed 2026-08, round 13).
DUCKDB_SIMPLE = [
    ("ß", "ß", "ẞ"),
    ("İ", "i", "İ"),
    ("ΑΣ", "ασ", "ΑΣ"),
    ("ﬁ", "ﬁ", "ﬁ"),
]


def test_duckdb_delta_recorded_exactly():
    """Pin the oracle engine's SIMPLE-mapping behavior. If this breaks,
    DuckDB's case tables changed — revisit the s-pool case-stability
    constraint and the capwords oracle mirror."""
    con = duckdb.connect()
    for s, lo, up in DUCKDB_SIMPLE:
        got_lo, got_up = con.execute(
            "select lower(?), upper(?)", [s, s]
        ).fetchone()
        assert got_lo == lo, f"DuckDB lower({s!r}) changed: {got_lo!r}"
        assert got_up == up, f"DuckDB upper({s!r}) changed: {got_up!r}"
        # and the delta is REAL: CPython disagrees on at least one side
        assert (lo, up) != (s.lower(), s.upper()), (
            f"{s!r} no longer divergent — drop it from DIVERGENT"
        )
    con.close()


def test_full_casemap_expansion_sweep_matches_cpython(spark):
    """Generative closure of the case axis (round-13, §8 candidate
    pulled forward): EVERY codepoint whose CPython full case mapping
    EXPANDS (len(c.lower()) > 1 or len(c.upper()) > 1 — the
    SpecialCasing.txt unconditional table, 103 codepoints through
    U+2FFFF: ß, İ, ŉ, ǰ, the Greek iota subscripts, the Armenian and
    Latin ligatures, …) must map identically in Spark. A Java/CPython
    Unicode-version skew that adds or changes an expansion pair breaks
    this loudly with the exact codepoint named."""
    from pyspark.sql import functions as F

    multi = []
    for c in range(0x20, 0x30000):
        if 0xD800 <= c <= 0xDFFF:
            continue
        ch = chr(c)
        if len(ch.lower()) > 1 or len(ch.upper()) > 1:
            multi.append(ch)
    assert len(multi) >= 100  # the table is stable; a collapse = bug
    df = spark.createDataFrame([(ch,) for ch in multi], ["s"])
    rows = df.select(
        "s", F.lower("s").alias("lo"), F.upper("s").alias("up")
    ).collect()
    bad = [
        (hex(ord(r["s"])), r["lo"], r["s"].lower(), r["up"], r["s"].upper())
        for r in rows
        if r["lo"] != r["s"].lower() or r["up"] != r["s"].upper()
    ]
    assert not bad, f"Spark != CPython on {len(bad)} expansion codepoints: {bad[:10]}"
