"""Query registry: every implemented operator from SURVEY.md §2 lands
here as a named (spark_fn, oracle_sql) pair — the driver contract.

`spark_fn(spark, sf_dir) -> DataFrame` is the engine-side DataFrame
pipeline; `oracle` is the ANSI-SQL twin DuckDB runs over the same
parquet tables. Column names are aliased identically on both sides
(the driver's compare hashes values after sorting columns by name).
Oracle=None marks non-SQL-expressible ops (streaming, LSH, connector
behavior) — the driver records a rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module so the registry is fully populated."""
    from ocean_data_pipeline_spark.queries import (  # noqa: F401
        aggregates,
        approx,
        cache_queries,
        flagship,
        grid_queries,
        joins,
        llm_ops,
        reshape,
        set_ops,
        stream_twins,
        tpch_more,
        tpch_shapes2,
        tpch_shapes3,
        training_ops,
        windows,
    )

    return REGISTRY
