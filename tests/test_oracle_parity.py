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


# --- smoke-scale parity: the knife-edge net ---------------------------
# Round 5 found two real bugs ONLY visible at sf0.001 (shortest-repr
# rounding boundaries on cents-exact values over tiny groups: EWMA e_2,
# heatmap 2-row cells). Value parity at a second scale factor makes
# "oracle matches at any scale" a tested property instead of a hope.

from tests.conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def duck_smoke():
    import os

    import duckdb

    from ocean_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_smoke_scale(spark, duck_smoke, name):
    rq = REGISTRY[name]
    sdf = rq.fn(spark, SF_SMOKE).toPandas()
    odf = duck_smoke.execute(rq.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + " | ".join(problems)
