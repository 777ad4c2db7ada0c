"""Tag-key hygiene functions (P2/P3) as pure Column expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters that make a tag key unusable as a column/key downstream
# (reference PROBLEMCHARS, parse_clean_and_csv.py:37).
PROBLEMCHARS_RE = "[=+/&<>;'\"?%#$@,. \\t\\r\\n]"

# Non-greedy first-colon split (reference FIRST_COLON_RE, :38):
# 'name:zh:yue' → type 'name', key 'zh:yue'.
FIRST_COLON_RE = "^(.*?):(.*)$"


def has_problem_chars(key: Column) -> Column:
    """P2 predicate: key contains any problematic character."""
    return key.rlike(PROBLEMCHARS_RE)


def key_type(key: Column) -> Column:
    """P3: the pre-first-colon prefix, or 'regular' when no colon."""
    return F.when(
        key.contains(":"), F.regexp_extract(key, FIRST_COLON_RE, 1)
    ).otherwise(F.lit("regular"))


def key_remainder(key: Column) -> Column:
    """P3: everything after the first colon, or the key itself."""
    return F.when(
        key.contains(":"), F.regexp_extract(key, FIRST_COLON_RE, 2)
    ).otherwise(key)
