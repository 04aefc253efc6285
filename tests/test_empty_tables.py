"""Empty-input totality: every registered query must PLAN AND RUN over
empty (zero-row, schema-preserving) copies of all ten tables without
raising — the guard against `.collect()[0]` on an empty aggregate,
division expressions that assume rows exist, and percentile/window
calls that choke on empty partitions. A query may legitimately return
zero rows or NULL-valued aggregates on empty input; it may not crash.

Streaming queries are excluded: a file-stream source over an empty
directory has nothing to trigger on, and their crash surface is the
batch-side expressions already covered by the batch twins.
"""

from __future__ import annotations

import os

import pytest

from ocean_data_pipeline_spark.catalog import TABLES
from ocean_data_pipeline_spark.queries import load_all

# Full-registry sweep (~10 min): builder-cadence layer, skipped in the
# driver-budget default run (see conftest; SPARK_GRAFT_FULL_TESTS=1).
pytestmark = pytest.mark.slow
from tests.conftest import SF_SMOKE

REGISTRY = load_all()

#: stream-source queries need files to trigger; everything batch runs.
_STREAMING = {n for n in REGISTRY if n.startswith("stream_")}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _STREAMING)
)
def test_query_is_total_on_empty_tables(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, tmp_path_factory):
    """One-row copies of every table — the n=1 degenerate class
    (N−1 denominators, single-partition windows, self-joins with no
    second row)."""
    out = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        df.limit(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _STREAMING)
)
def test_query_is_total_on_single_row_tables(spark, single_row_sf_dir, name):
    df = REGISTRY[name].fn(spark, single_row_sf_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def constant_sf_dir(spark, tmp_path_factory):
    """Fifty identical copies of each table's first row — the
    zero-variance / hot-key degenerate class (stddev 0 denominators,
    single-value distributions, every join key colliding)."""
    out = tmp_path_factory.mktemp("sf_const")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        one = spark.read.parquet(src).limit(1)
        dup = one
        for _ in range(49):
            dup = dup.unionByName(one)
        dup.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _STREAMING)
)
def test_query_is_total_on_constant_tables(spark, constant_sf_dir, name):
    df = REGISTRY[name].fn(spark, constant_sf_dir)
    assert df.count() >= 0
