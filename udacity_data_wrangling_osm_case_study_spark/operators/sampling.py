"""Deterministic sampling & dataset splitting for training pipelines.

RNG-based sampling (``df.sample``) is engine- and partitioning-
dependent — a re-run or a different cluster layout yields a different
sample. Content-hash sampling is the reproducible alternative big
pipelines actually use: a row belongs to a sample/split purely as a
function of its key, stable across engines, runs, and repartitioning,
and trivially auditable (the same SQL reproduces it anywhere).

Bucket = first 8 hex digits of md5(salt || key) mod n_buckets —
uniform, portable (the same expression runs in any engine with md5),
and salt-able so different experiments draw independent samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from a key."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction_pct: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction_pct`` (of
    100) — a reproducible ~fraction sample keyed on ``key_col``."""
    return df.filter(hash_bucket(F.col(key_col), 100, salt) < fraction_pct)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Assign a stable split label per row: bucket < test → 'test',
    next ``val_pct`` → 'val', rest → 'train'. The same document always
    lands in the same split — the leakage guarantee training pipelines
    need."""
    b = hash_bucket(F.col(key_col), 100, salt)
    label = (
        F.when(b < test_pct, "test")
        .when(b < test_pct + val_pct, "val")
        .otherwise("train")
    )
    return df.withColumn("split", label)
