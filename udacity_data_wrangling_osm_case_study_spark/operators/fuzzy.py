"""Fuzzy string matching: blocked edit-distance joins.

The reference repairs street-name typos with a hand-curated 14-entry
dict (``audit_bilingual_street_names.py`` typo map) — viable for one
town, not for a 100 TB corpus. The scalable generalization is a
*blocked* edit-distance join: cheap equality keys shrink the candidate
space, then the exact ``levenshtein`` (JVM codegen built-in) verifies
only candidates.

Blocking completeness (single-deletion typos, the dominant class): if
the dropped character is not the first, the first characters still
match; if it IS the first (and the word is longer than one char), the
last characters still match. So the union of a first-char block and a
last-char block — each with a ±1 length band — covers every deletion
typo, by the same pigeonhole argument as the SimHash Hamming bands.

At 100 TB the block key (first char × length) is low-cardinality and
can run hot; the guards are the usual ones — salt the block key or cap
block size (cap_shingle_df pattern) — and a production matcher widens
the key (first 2 chars + length band) once names are long enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion1_candidates(
    left: DataFrame,
    right: DataFrame,
    left_name: str = "tname",
    right_name: str = "cname",
) -> DataFrame:
    """Candidate pairs covering every single-deletion typo: the union
    of (first-char, ±1 length) and (last-char, ±1 length) blocked
    joins. Output: all columns of both inputs, distinct pairs."""
    lb = left.withColumn("_lf", F.substring(left_name, 1, 1)).withColumn(
        "_ll", F.substring(left_name, -1, 1)
    )
    rb = right.withColumn("_rf", F.substring(right_name, 1, 1)).withColumn(
        "_rl", F.substring(right_name, -1, 1)
    )
    band = (
        F.abs(F.length(left_name) - F.length(right_name)) <= 1
    )
    first_block = lb.join(rb, (F.col("_lf") == F.col("_rf")) & band)
    last_block = lb.join(rb, (F.col("_ll") == F.col("_rl")) & band)
    drop = ["_lf", "_ll", "_rf", "_rl"]
    return first_block.unionByName(last_block).drop(*drop).distinct()


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    left_name: str = "tname",
    right_name: str = "cname",
    max_distance: int = 1,
) -> DataFrame:
    """Blocked fuzzy join: candidates from :func:`deletion1_candidates`
    verified with exact Levenshtein ≤ ``max_distance``. Adds ``lev``."""
    cand = deletion1_candidates(left, right, left_name, right_name)
    lev = F.levenshtein(F.col(left_name), F.col(right_name))
    return cand.withColumn("lev", lev).filter(F.col("lev") <= max_distance)
