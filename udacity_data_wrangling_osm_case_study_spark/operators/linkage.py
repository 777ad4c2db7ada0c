"""Record linkage (entity resolution): multi-pass blocking + field-
agreement scoring in the Fellegi–Sunter style.

The reference hand-repairs one entity column with a curated dict
(audit_bilingual_street_names.py typo map); the general problem a
training-data pipeline faces is linking RECORDS across sources with no
shared key — user tables from two products, suppliers from two feeds.
The scalable shape is classical:

1. **Blocking**: candidate pairs come only from equality joins on
   cheap keys (several passes, unioned), never an all-pairs product.
   Each pass is a plain equi-join — shuffle bounded by per-block
   products, and a missed block in one pass is usually caught by
   another (that redundancy IS the recall knob).
2. **Scoring**: per-field agreement weights (integer log-likelihood
   surrogates, Fellegi–Sunter 1969) summed per candidate pair; a
   threshold classifies match / non-match. Row-local arithmetic —
   zero shuffle beyond the candidate dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_candidates(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    passes: list[list[str]],
) -> DataFrame:
    """Union-of-blocking-passes candidate generation.

    ``passes`` is a list of blocking keys; each entry is a list of
    column names present in BOTH frames. Every pass contributes the
    equi-join of ``a`` and ``b`` on its keys; passes are unioned and
    deduped by (id_a, id_b). All non-id columns come out prefixed
    ``a_``/``b_`` so callers can score agreements without a second
    attribute join (attributes are functions of the ids, so the
    pair-level dropDuplicates keeps exactly one identical row).
    """
    a_w = a.select(
        F.col(id_a).alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in a.columns if c != id_a],
    )
    b_w = b.select(
        F.col(id_b).alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in b.columns if c != id_b],
    )
    out = None
    for keys in passes:
        cond = F.col(f"a_{keys[0]}") == F.col(f"b_{keys[0]}")
        for k in keys[1:]:
            cond = cond & (F.col(f"a_{k}") == F.col(f"b_{k}"))
        joined = a_w.join(b_w, cond)
        out = joined if out is None else out.unionByName(joined)
    return out.dropDuplicates(["id_a", "id_b"])


def fs_score(pairs: DataFrame, weights: list) -> DataFrame:
    """Sum Fellegi–Sunter agreement weights over candidate pairs.

    ``weights`` is a list of integer Column expressions (one per
    compared field, already encoding its agree/disagree/missing
    weight); the result adds their row-local sum as ``score``. Integer
    weights keep the classifier engine-exact.
    """
    total = weights[0]
    for w in weights[1:]:
        total = total + w
    return pairs.withColumn("score", total.cast("long"))
