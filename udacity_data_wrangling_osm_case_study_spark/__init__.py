"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference OSM data-wrangling case study
(``alfrednfwong/Udacity_data_wrangling_OSM_case_study``), re-expressed
Spark-first: declarative DataFrame/SQL plans, Catalyst optimization,
broadcast dimension joins, zero row-at-a-time Python UDFs in the hot path.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, broadcast, Arrow).
- ``schemas``    : explicit StructTypes for every source (schema-on-read).
- ``sources``    : OSM XML / PSI XML readers, parquet helpers, CSV sinks.
- ``functions``  : pure Column-expression scalar logic (phone
  canonicalizer, bilingual name split, capwords) — JVM codegen, no UDFs.
- ``operators``  : relational operators & pipelines (official-street
  dimension build, element shaping, street repair, CDC, dedup,
  similarity, text stats, multimodal plumbing).
- ``plans``      : end-to-end query plans (SQL exploration surface,
  audit queries, the driver-facing query registry).
- ``streaming``  : Structured Streaming variants of the cleaning DAG.
"""

__version__ = "0.1.0"

from udacity_data_wrangling_osm_case_study_spark.session import get_spark  # noqa: F401
