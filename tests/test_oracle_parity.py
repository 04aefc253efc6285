"""Oracle-parity gate, locally: every registered query with an oracle
must match DuckDB EXACTLY (row count, column names, values) at sf0.01 —
a strict superset of the driver's hash compare.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tools.verify_local import compare

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, rq in REGISTRY.items() if rq.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    rq = REGISTRY[name]
    sdf = rq.fn(spark, SF_ORACLE).toPandas()
    odf = duck.execute(rq.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + " | ".join(problems)
