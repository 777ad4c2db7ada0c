"""Static oracle-mirror lint (round-13, codifying the s-campaign's
43-failure root cause as a commit-time gate).

The round-13 seed-1s sweep failed 43 of 253 queries from ONE repeated
pattern: oracle SQL that used DuckDB's DEFAULT ``trim`` — which strips
Zs-class Unicode spaces (U+00A0, U+3000, …) while Spark's ``F.trim``
strips only U+0020 — and RE2's ``\\s``, which unlike Java's excludes
U+000B. Both mirrors are now explicit (``trim(x, ' ')`` and
``[ \\t\\n\\x0b\\f\\r]``), and this lint makes the defect class
unrepresentable: a NEW oracle written with the default trim or a bare
``\\s`` fails here at ``tools/guard.sh`` time instead of at the next
fuzz campaign. No SparkSession — pure string analysis of the
registry's oracle SQL (the Spark-side expressions are intentionally
NOT scanned: Java ``\\s`` / ``F.trim`` ARE the engine's declared
semantics).
"""

from __future__ import annotations

import re

import pytest

from udacity_data_wrangling_osm_case_study_spark.plans import registry

pytestmark = pytest.mark.guard

# The one whitespace class that equals Java's \s (and Python 2's
# byte-level string.whitespace — the reference's split semantics).
MIRROR_CLASS = r"[ \t\n\x0b\f\r]"


def _oracles() -> dict[str, str]:
    _, oracles = registry.load_all()
    return oracles


def _trim_args(sql: str):
    """Yield the argument text of every ``trim(``/``ltrim(``/``rtrim(``
    call in ``sql`` (balanced-paren scan)."""
    for m in re.finditer(r"\b([lr]?trim)\(", sql):
        i = m.end()
        depth = 1
        while depth and i < len(sql):
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        yield m.group(1), sql[m.end(): i - 1]


def test_no_default_trim_in_oracles():
    """Every oracle trim must pin its character set: DuckDB's default
    set strips Unicode Zs spaces that Spark's never touches."""
    offenders = []
    for name, sql in _oracles().items():
        for fn, arg in _trim_args(sql):
            if not re.search(r",\s*'[^']*'\s*$", arg):
                offenders.append((name, fn, arg.strip()[:60]))
    assert not offenders, (
        "oracle trim() without an explicit character set (DuckDB's "
        "default strips Zs-class Unicode spaces; Spark strips only "
        f"U+0020) — use trim(x, ' '): {offenders[:10]}"
    )


def test_no_bare_backslash_s_in_oracles():
    """RE2's \\s excludes U+000B (Java's includes it): oracle regexes
    must spell the mirrored class out."""
    offenders = [
        name for name, sql in _oracles().items() if re.search(r"\\s", sql)
    ]
    assert not offenders, (
        "oracle regex uses RE2 \\s (no U+000B, unlike Java's) — spell "
        f"out {MIRROR_CLASS!r}: {offenders[:10]}"
    )


def test_mirror_class_sites_are_exact():
    """Where a WHITESPACE-ONLY class is used (every member is a
    whitespace escape or a space), it must be the exact Java-equal
    set — a hand-typo'd variant ([ \\t\\n\\f\\r], missing \\x0b)
    would silently reintroduce the divergence. Classes that merely
    CONTAIN whitespace among other members (e.g. the reference's
    problem-chars set in key_split_census) are a different function
    and are not mirrors — not flagged."""
    # ≥3 whitespace members = a collapse-class shape; the 1-member
    # ``[ ]`` in bilingual_name_split is the reference's own ENG_NAME
    # regex (identical in Java and RE2) and is not a mirror.
    ws_only = re.compile(r"\[(?: |\\t|\\n|\\r|\\f|\\v|\\x0b|\\x0c){3,}\]")
    wrong = []
    for name, sql in _oracles().items():
        for m in re.finditer(r"\[[^\]]+\]", sql):
            if ws_only.fullmatch(m.group(0)) and m.group(0) != MIRROR_CLASS:
                wrong.append((name, m.group(0)))
    assert not wrong, (
        f"whitespace-only class differs from the Java-\\s mirror "
        f"{MIRROR_CLASS!r}: {wrong[:10]}"
    )


def _plan_sources() -> dict[str, str]:
    import glob
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(
        here, "udacity_data_wrangling_osm_case_study_spark", "plans", "*.py"
    )
    return {os.path.basename(p): open(p).read() for p in glob.glob(pkg)}


def test_no_signum_in_plan_sources():
    """Source-level companion (the event_value_trend class): a plan's
    sign column paired with a SQL CASE oracle must use an explicit
    when-chain — ``F.signum`` propagates NULL where CASE falls through
    to ELSE, and silently casts DECIMAL through double."""
    offenders = [
        f for f, src in _plan_sources().items() if "F.signum(" in src
    ]
    assert not offenders, (
        f"F.signum in oracle-paired plan code (NULL/ELSE divergence, "
        f"decimal->double cast) — use a when-chain: {offenders}"
    )


def test_no_bare_division_by_sqrt_in_plan_sources():
    """Source-level companion (the source_centroid_cosine class): a
    norm-product denominator must route through F.try_divide (+
    coalesce) — a bare ``/ F.sqrt(...)`` raises ANSI DIVIDE_BY_ZERO
    on the zero vector the fuzzer is guaranteed to produce."""
    import re

    offenders = [
        f for f, src in _plan_sources().items()
        if re.search(r"/\s*\(?\s*F\.sqrt\(", src)
    ]
    assert not offenders, (
        f"bare division by F.sqrt in plan code — use F.try_divide "
        f"with F.coalesce (see operators.similarity.cosine): {offenders}"
    )
