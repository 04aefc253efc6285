"""The catalog scan-relation cache (round 11) must reuse the lazy
relation within ONE session and never across sessions: a DataFrame
binds to the SQLConf of the session that built it, so handing a
cached relation to an isolated `newSession()` (or vice versa) would
silently execute under the wrong plan-time confs — exactly the bug
the bloom_join_urgent_revenue plan gate caught during the round.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE

from ocean_data_pipeline_spark.catalog import table


def test_same_session_reuses_relation(spark):
    a = table(spark, SF_ORACLE, "orders")
    b = table(spark, SF_ORACLE, "orders")
    assert a is b


def test_spread_variant_cached_separately(spark):
    a = table(spark, SF_ORACLE, "orders")
    b = table(spark, SF_ORACLE, "orders", spread=True)
    assert a is not b
    assert table(spark, SF_ORACLE, "orders", spread=True) is b


def test_new_session_builds_fresh_relation(spark):
    parent = table(spark, SF_ORACLE, "lineitem")
    sub = spark.newSession()
    child = table(sub, SF_ORACLE, "lineitem")
    assert child is not parent
    # and the child's relation must belong to the child session
    assert child.sparkSession is sub
    # the parent keeps its own entry
    assert table(spark, SF_ORACLE, "lineitem") is parent
