"""Format breadth beyond the reference's CSV/JSON/table surface: the
Spark-bundled columnar/row formats must round-trip the engine's tables
value-exactly (the interchange guarantee a user relies on when pointing
the engine at an existing lake in another format)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from tests.conftest import SF_SMOKE


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_value_exact(spark):
    """parquet → ORC → read-back is value-identical (schema included)."""
    src = table(spark, SF_SMOKE, "orders")
    out = os.path.join(tempfile.mkdtemp(), "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_orc_predicate_pushdown(spark):
    """Filters reach the ORC scan (PushedFilters in the plan) — format
    breadth must not silently lose the pushdown contract."""
    src = table(spark, SF_SMOKE, "orders")
    out = os.path.join(tempfile.mkdtemp(), "orders_orc_pd")
    src.write.mode("overwrite").orc(out)
    q = spark.read.orc(out).where(F.col("o_totalprice") > 300000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    assert q.count() == src.where("o_totalprice > 300000.0").count()


def test_json_lines_roundtrip_value_exact(spark):
    """JSON-lines round trip with explicit schema (the reference's cache
    payload transport, §2-A sink-json/src-json) on a full table."""
    src = table(spark, SF_SMOKE, "customer")
    out = os.path.join(tempfile.mkdtemp(), "customer_json")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    assert _canon(back) == _canon(src)
