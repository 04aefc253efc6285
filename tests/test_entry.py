"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib

import pytest


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_aligned(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "registry must not be empty"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys missing from queries(): {unknown}"


@pytest.mark.slow
def test_every_query_runs_at_smoke_scale(spark):
    mod = _entry_module()
    for name, fn in mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
