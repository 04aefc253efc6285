"""ocean_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference `james-gillard-tko/ocean-data-pipeline`
(see SURVEY.md for the file:line capability inventory), rebuilt
idiomatically on Spark DataFrames / Spark SQL / Catalyst / Structured
Streaming and extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design rules (100 TB posture):
- DataFrame/SQL first; Catalyst owns physical strategy.
- No driver-side collect in operators (only in declared exports).
- Built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only
  where built-ins cannot express the semantics.
- Broadcast small dims, AQE on, explicit shuffle-partition sizing.
"""

__version__ = "0.1.0"

from ocean_data_pipeline_spark.session import get_spark, tune_for_oracle  # noqa: F401
