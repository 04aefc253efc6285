"""Physical-plan quality gates (the 100 TB posture, §4): pushdown and
column pruning reach the scan, dimension joins broadcast, top-k avoids
global sorts, declared equi-joins never degrade to cartesian products,
and JVM-path queries contain no Python eval operators.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tools.explain_audit import AUDIT

REGISTRY = load_all()

# Queries retired from the driver registry (round 9) keep their plan
# gates: resolve them straight from their module.
from ocean_data_pipeline_spark.queries.sql_surface import (  # noqa: E402
    sql_series_ordered,
)

RETIRED = {"sql_series_ordered": sql_series_ordered}


def _query_fn(name):
    return REGISTRY[name].fn if name in REGISTRY else RETIRED[name]


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(AUDIT))
def test_plan_quality(spark, name):
    must, must_not = AUDIT[name]
    plan = _formatted_plan(spark, _query_fn(name)(spark, SF_ORACLE))
    for frag in must:
        assert frag in plan, f"{name}: plan lost {frag!r}\n{plan}"
    for frag in must_not:
        assert frag not in plan, f"{name}: plan regressed to {frag!r}\n{plan}"


# Iterative queries unroll driver-side loops into the plan. The wave-34
# absorbing-chain fix (every-8-rounds localCheckpoint) cut its plan from
# 3,652 normalized lines / 312 joins to ~315 lines / 6 physical joins
# (bench 7.5 -> 5.3 s in-pass); gate the size so a dropped checkpoint
# can't silently reintroduce the unroll (VERDICT r09 item 4).
_PLAN_SIZE_CAP = {"absorbing_chain_steps": 1000}


@pytest.mark.parametrize("name", sorted(_PLAN_SIZE_CAP))
def test_plan_size_cap(spark, name):
    plan = _formatted_plan(spark, _query_fn(name)(spark, SF_ORACLE))
    n = plan.count("\n") + 1
    assert n < _PLAN_SIZE_CAP[name], (
        f"{name}: formatted plan blew up to {n} lines — an iterative "
        "checkpoint was probably dropped"
    )
