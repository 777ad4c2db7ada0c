"""Phone-number canonicalization (F4) as pure Column expressions.

Semantics (behavioral parity with the reference's ``fix_phone_value``,
parse_clean_and_csv.py:490-522):

1. Split the value on ``,`` or ``;``.
2. Per segment, strip separator characters ``- space + ( )`` and the
   fullwidth plus ``＋`` (U+FF0B).
3. Classify in this exact order (the cascade order is a semantic
   contract — '852dddddddd' must hit the HK rule first):
   HK      ``^(852)?(\\d{8})$``        → ``+852 <8 digits>``
   PRC cell``^(86)?(1[3-9]\\d{9})$``   → ``+86 <11 digits>``
   SZ land ``^(86)?0?(755)(\\d{6,8})$``→ ``+86 755 <6-8 digits>``
4. Join matched segments with ``;``. Unmatched segments are DROPPED if
   at least one segment matched; if none matched, the original string
   passes through unchanged.

Everything stays inside whole-stage codegen (split → transform → filter
→ array_join): no Python boundary, so the canonicalizer runs at scan
speed on a 100 TB input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Keys whose values are phone-shaped candidates (reference :105-107).
PHONE_KEYS = ["phone", "fax", "whatsapp", "mobile", "telephone", "operator", "source"]

DELIMITERS_RE = "[,;]"
# hyphen, space, plus, parens, fullwidth plus U+FF0B
NON_DIGIT_CHAR_RE = "[-\\u0020+)(\\uFF0B]+"
HK_PHONE_RE = "^(852)?(\\d{8})$"
PRC_CELL_RE = "^(86)?(1[3-9]\\d{9})$"
SZ_LAND_RE = "^(86)?0?(755)(\\d{6,8})$"


def canonicalize_segment(segment: Column) -> Column:
    """One comma/semicolon-delimited segment → canonical form or NULL."""
    s = F.regexp_replace(segment, NON_DIGIT_CHAR_RE, "")
    return (
        F.when(s.rlike(HK_PHONE_RE), F.concat(F.lit("+852 "), F.regexp_extract(s, HK_PHONE_RE, 2)))
        .when(s.rlike(PRC_CELL_RE), F.concat(F.lit("+86 "), F.regexp_extract(s, PRC_CELL_RE, 2)))
        .when(s.rlike(SZ_LAND_RE), F.concat(F.lit("+86 755 "), F.regexp_extract(s, SZ_LAND_RE, 3)))
    )


def fix_phone_value(value: Column) -> Column:
    """Canonicalize a (possibly multi-number) phone value column."""
    fixed = F.filter(
        F.transform(F.split(value, DELIMITERS_RE), canonicalize_segment),
        lambda x: x.isNotNull(),
    )
    return F.when(F.size(fixed) > 0, F.array_join(fixed, ";")).otherwise(value)


def is_phone_key(key: Column) -> Column:
    """Predicate P6: tag key is one of the phone-bearing keys."""
    return key.isin(PHONE_KEYS)


# Predicate P7 (the tolerant phone-shape probe of
# audit_phone_numbers.py:129-162) lives in plans/audits.py: the audit
# uses TOLERANT pre-strip regexes that accept separators in place,
# which are deliberately different from this module's strict
# post-strip canonicalization shapes.
