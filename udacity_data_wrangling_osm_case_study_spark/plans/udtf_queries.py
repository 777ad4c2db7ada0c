"""Python UDTF surface (PySpark 4 user-defined table functions).

One demo query: flatten the ``events.props`` JSON object into
(key, value) rows with a LATERAL table-function join, then aggregate.
This is the engine's UDTF policy exhibit: table-generating Python is
legal OUTSIDE the cleaning/query hot paths (which stay pure column
expressions — see COVERAGE.md §2.11), and when used it is
Arrow-batched. For fixed-shape JSON the codegen path is
``get_json_object`` (see ``props_key_histogram``); a UDTF earns its
Python cost only for OPEN schemas — unknown keys, per-row fan-out.
"""

from __future__ import annotations

from udacity_data_wrangling_osm_case_study_spark.plans.registry import register, table


@register(
    "json_props_udtf",
    """
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS key, props
        FROM events
        WHERE props IS NOT NULL AND json_valid(props)
          AND json_type(props) = 'OBJECT'
    )
    SELECT key, COUNT(*) AS n,
           CAST(SUM(CAST(TRUNC(TRY_CAST(json_extract_string(props, '$.' || key)
                AS DOUBLE)) AS BIGINT)) AS BIGINT) AS total
    FROM kv GROUP BY key ORDER BY key
    """,
)
def json_props_udtf(spark, sf_dir):
    """Open-schema JSON flattening via a Python UDTF + LATERAL join:
    every (key, value) pair of each props object becomes a row, then a
    per-key rollup. The UDTF crosses rows one Arrow batch at a time;
    the aggregation on top is ordinary codegen."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value string")
    class JsonFields:
        def eval(self, props: str):
            import json

            # Open-schema ingest contract: rows whose props is NULL,
            # malformed JSON, or a non-object contribute no fields
            # (the oracle's json_valid + json_type='OBJECT' guard).
            if props is None:
                return
            try:
                obj = json.loads(props)
            except ValueError:
                return
            if not isinstance(obj, dict):
                return
            for k, v in obj.items():
                yield (
                    k,
                    str(int(v))
                    if isinstance(v, (int, float)) and not isinstance(v, bool)
                    else str(v),
                )

    spark.udtf.register("json_fields", JsonFields)
    table(spark, sf_dir, "events").createOrReplaceTempView("_udtf_events")
    return spark.sql(
        """
        SELECT f.key AS key, COUNT(*) AS n,
               SUM(TRY_CAST(f.value AS BIGINT)) AS total
        FROM _udtf_events, LATERAL json_fields(props) f
        GROUP BY f.key ORDER BY key
        """
    )
