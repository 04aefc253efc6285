"""VARIANT-type queries (Spark 4 semi-structured columnar JSON).

The reference stores semi-structured event properties as JSON text and
queries them with DuckDB's JSON operators (SURVEY.md §2 src/sink-json;
reference pipeline/load.py persists dict payloads). Spark 4's VARIANT
type is the engine-native answer at scale: `parse_json` once, then
typed `variant_get` path extraction that (unlike get_json_object string
re-parsing) is a binary-encoded, shreddable representation — on a 100 TB
corpus the parse cost is paid once per value, path access is O(path)
over the binary form, and future parquet variant shredding turns hot
paths into pruned columnar reads.

Oracle: DuckDB's JSON operators over the same strings — different
surface, same semantics, value-exact.

ANSI-safety: variant_get with a target type returns NULL on missing
paths (no throw); sums are DECIMAL-carried then cast to BIGINT on both
engines so HUGEINT/decimal representation drift can't leak into the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocean_data_pipeline_spark.catalog import register_views
from ocean_data_pipeline_spark.queries import register

# Aggregate profile over typed variant extraction: per event type, the
# count, missing-path count (variant_get on '$.q' is NULL — exercises
# null-on-absent semantics), exact sum/max of the '$.k' payload field,
# and the variant schema inferred from the binary form. min() makes the
# schema pick deterministic; every row here is OBJECT<k: BIGINT> and
# the oracle pins that inference as a literal.
_ORACLE_PROFILE = """
SELECT event_type,
       count(*) AS n,
       count(CAST(props->>'$.q' AS INT)) AS n_missing_path,
       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
       max(CAST(props->>'$.k' AS INT)) AS max_k,
       'OBJECT<k: BIGINT>' AS vschema
FROM events
GROUP BY event_type
ORDER BY event_type
"""

_SPARK_PROFILE = """
SELECT event_type,
       count(*) AS n,
       count(variant_get(parse_json(props), '$.q', 'int')) AS n_missing_path,
       CAST(sum(CAST(variant_get(parse_json(props), '$.k', 'int')
                     AS DECIMAL(18,0))) AS BIGINT) AS sum_k,
       max(variant_get(parse_json(props), '$.k', 'int')) AS max_k,
       min(schema_of_variant(parse_json(props))) AS vschema
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("variant_props_profile", oracle=_ORACLE_PROFILE)
def variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed variant_get aggregation over parse_json(props): the
    VARIANT fast path for the reference's JSON-properties access
    pattern, with missing-path null semantics and schema inference
    pinned against the DuckDB JSON oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_SPARK_PROFILE)


# Row-level shred: one typed value + per-row inferred schema per event
# on a deterministic 1/37 slice. Pins the scalar (non-aggregated)
# variant path — the shape parquet variant shredding accelerates.
_ORACLE_SHRED = """
SELECT event_id,
       CAST(props->>'$.k' AS INT) AS k_typed,
       CAST(props->>'$.k' AS DOUBLE) AS k_as_double,
       'OBJECT<k: BIGINT>' AS vschema
FROM events
WHERE event_id % 37 = 0
ORDER BY event_id
"""

_SPARK_SHRED = """
SELECT event_id,
       variant_get(parse_json(props), '$.k', 'int') AS k_typed,
       variant_get(parse_json(props), '$.k', 'double') AS k_as_double,
       schema_of_variant(parse_json(props)) AS vschema
FROM events
WHERE event_id % 37 = 0
ORDER BY event_id
"""


@register("variant_row_shred", oracle=_ORACLE_SHRED)
def variant_row_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row typed extraction from VARIANT (int and double target
    types from one binary value) on a deterministic event slice."""
    register_views(spark, sf_dir)
    return spark.sql(_SPARK_SHRED)
