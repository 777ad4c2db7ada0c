"""JSONL (newline-delimited JSON) corpus source.

JSONL is the de-facto interchange format for LLM training corpora
(one document per line); Spark's native JSON source reads it as a
partitionable line stream — a single multi-GB shard splits across
executors, and a directory of shards parallelizes for free. This
module pins the ingestion contract the rest of the engine assumes:

- **Strict by default** (FAILFAST): schema drift or a torn line dies
  loudly at the scan instead of silently nulling columns mid-corpus.
- **Lenient opt-in** (PERMISSIVE + ``_corrupt_record``): malformed
  lines degrade to NULL columns with the raw line captured for
  quarantine — the same degrade-then-flag posture as the lenient OSM
  XML scan (``osm_xml.read_nodes_raw(lenient=True)``).

Schema is REQUIRED: letting Spark infer runs a whole extra pass over
the corpus and silently widens types on dirty data — at 100 TB that is
both a 2× read and a correctness hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# The engine's document contract — mirrors the driver testdata's
# documents.parquet columns so a JSONL drop folder is a plug-in
# replacement for the parquet table.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    lenient: bool = False,
) -> DataFrame:
    """Typed JSONL scan with the strict/lenient contract above.

    In lenient mode the returned frame carries ``_corrupt_record``
    (NULL for clean rows, the raw line for casualties). NOTE Spark's
    documented caveat: a query that selects ONLY the corrupt column
    sees nothing (the parser skips work it can prove unused) — always
    project at least one data column alongside it, as
    ``corrupt_line_report`` does.
    """
    if lenient:
        # StructType.add mutates the receiver — build a fresh struct so
        # a shared module-level schema is never widened in place.
        full = T.StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, lenient: bool = False
) -> DataFrame:
    """Documents-table scan from a JSONL drop folder (one doc per
    line), under the engine's standard document schema."""
    return read_jsonl(spark, path, DOCUMENTS_SCHEMA, lenient=lenient)


def corrupt_line_report(df: DataFrame) -> DataFrame:
    """Quarantine summary for a lenient scan: one row
    ``(n_rows, n_first_parsed, n_corrupt, corrupt_pm)`` — corrupt share
    in permille, integer-exact; ``n_first_parsed`` counts non-NULL
    values of the schema's first data field, which doubles as the
    parsed-column reference Spark REQUIRES alongside the corrupt column
    (a corrupt-only projection raises
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"frame has no {CORRUPT_COL} column — was the scan lenient?"
        )
    first_field = next(c for c in df.columns if c != CORRUPT_COL)
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(first_field).cast("long").alias("n_first_parsed"),
        F.count(CORRUPT_COL).cast("long").alias("n_corrupt"),
        F.expr(f"count({CORRUPT_COL}) * 1000 DIV count(*)")
        .cast("long")
        .alias("corrupt_pm"),
    )
