"""Partition-layout posture: a date-partitioned write must produce a
directory layout that partition-prunes on read — the 100 TB contract
that a one-day query over years of events touches one directory, not
the table. (Testdata ships as single unpartitioned files, so this
proves the WRITE side of the posture on a staged copy.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from tests.conftest import SF_SMOKE


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_date_partitioned_write_prunes_on_read(spark, tmp_path):
    path = str(tmp_path / "events_by_date")
    ev = table(spark, SF_SMOKE, "events").withColumn("event_date", F.to_date("ts"))
    ev.write.partitionBy("event_date").parquet(path)

    day = "2024-01-05"
    pruned = spark.read.parquet(path).filter(F.col("event_date") == day)
    plan = _formatted_plan(spark, pruned)
    # the filter must land in PartitionFilters (directory pruning),
    # NOT PushedFilters (row-group stats) and NOT a post-scan Filter
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    assert f"(event_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    # pruning must not change results: same rows as the unpartitioned scan
    want = ev.filter(F.to_date("ts") == day).count()
    assert pruned.count() == want and want > 0

    # executed-scan metrics are the ground truth: ONE directory read
    # (inputFiles() lists the relation pre-pruning, so don't use it)
    pruned.collect()
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    scans = [leaves.apply(i) for i in range(leaves.size())]
    scan = next(n for n in scans if "Scan" in n.nodeName())
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 1
    assert scan.metrics().apply("numPartitions").value() == 1
    assert scan.metrics().apply("numFiles").value() == 1
