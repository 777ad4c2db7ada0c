"""Phone-tag cleaning over the EAV tables + CDC derivation (F4/P6/S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.functions import phones as P


def fix_phones_in_tags(tags: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Canonicalize phone-key tag values. Returns ``(cleaned, updated_ids)``.

    ``updated_ids`` has one ``id`` row per element where any phone-key
    value changed. The reference's per-tag flag overwrite
    (parse_clean_and_csv.py:531-533) can lose an earlier update when a
    later phone-key tag is unchanged; we use OR semantics — documented
    intentional divergence (SURVEY.md §4 risk 4; identical on the
    sample data).
    """
    extra = [c for c in tags.columns if c not in ("id", "key", "value", "type")]
    new_value = F.when(
        P.is_phone_key(F.col("key")), P.fix_phone_value(F.col("value"))
    ).otherwise(F.col("value"))
    cleaned = tags.select(
        "id",
        "key",
        new_value.alias("value"),
        "type",
        *extra,
        (~new_value.eqNullSafe(F.col("value"))).alias("_changed"),
    )
    updated_ids = (
        cleaned.filter(F.col("_changed")).select("id").distinct()
    )
    return cleaned.drop("_changed"), updated_ids


def update_history(
    node_phone_ids: DataFrame, way_phone_ids: DataFrame, way_name_ids: DataFrame
) -> DataFrame:
    """S4 CDC table ``update_history(id, element_type, field_updated)``."""

    def _rows(ids: DataFrame, element_type: str, field: str) -> DataFrame:
        return ids.select(
            "id",
            F.lit(element_type).alias("element_type"),
            F.lit(field).alias("field_updated"),
        )

    return (
        _rows(node_phone_ids, "node", "phone")
        .unionByName(_rows(way_phone_ids, "way", "phone"))
        .unionByName(_rows(way_name_ids, "way", "name"))
    )
