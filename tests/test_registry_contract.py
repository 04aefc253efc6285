"""Registry-rotation contract: the driver verifies only the first 50
entries of ``queries()``, so a stale rotation set silently burns a whole
driver round re-checking long-green queries. These tests make that a CI
failure instead (VERDICT r03 item 4).

Contract:
  * every name in the rotation sets is a registered query (no drift on
    rename/delete);
  * the two rotation blocks are disjoint;
  * every never-driver-verified query rides in the front-50 window
    (when there are more than 50, the window must be entirely
    never-verified — no verified name may displace an unverified one);
  * driver order is deterministic and registration-order-stable.
"""

from __future__ import annotations

import pytest

from ocean_data_pipeline_spark.queries import (
    _DEFER_TO_BACK,
    _DRIVER_VERIFIED,
    REGISTRY,
    load_all,
)
from tests.conftest import SF_SMOKE

DRIVER_WINDOW = 50


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_rotation_sets_are_registered(registry):
    unknown = (_DRIVER_VERIFIED | _DEFER_TO_BACK) - registry.keys()
    assert not unknown, f"rotation sets name unregistered queries: {sorted(unknown)}"


def test_rotation_sets_disjoint():
    overlap = _DRIVER_VERIFIED & _DEFER_TO_BACK
    assert not overlap, f"queries in both rotation blocks: {sorted(overlap)}"


def test_unverified_queries_occupy_front_window(registry):
    names = list(registry)
    unverified = [n for n in names if n not in (_DRIVER_VERIFIED | _DEFER_TO_BACK)]
    window = set(names[:DRIVER_WINDOW])
    missed = [n for n in unverified[:DRIVER_WINDOW] if n not in window]
    assert not missed, (
        "never-driver-verified queries pushed outside the driver's "
        f"front-{DRIVER_WINDOW} window: {missed} — advance the rotation sets"
    )


def test_front_window_prefers_unverified(registry):
    """If >window unverified queries exist, no verified name may appear
    in the window; otherwise the window starts with ALL unverified."""
    names = list(registry)
    unverified = [n for n in names if n not in (_DRIVER_VERIFIED | _DEFER_TO_BACK)]
    k = min(len(unverified), DRIVER_WINDOW)
    assert names[:k] == unverified[:k], (
        "driver window does not lead with never-verified queries; "
        f"expected {unverified[:k]}, got {names[:k]}"
    )


def test_load_all_rejects_unknown_rotation_names(monkeypatch):
    import ocean_data_pipeline_spark.queries as q

    monkeypatch.setattr(
        q, "_DRIVER_VERIFIED", frozenset({"no_such_query_xyz"})
    )
    with pytest.raises(AssertionError, match="no_such_query_xyz"):
        q.load_all()


def test_registry_names_unique_and_callable(registry):
    assert len(registry) == len(set(registry))
    for name, rq in registry.items():
        assert callable(rq.fn), name
        assert rq.oracle is None or isinstance(rq.oracle, str), name


def test_rows_only_queries_are_the_documented_exceptions(registry):
    rows_only = sorted(n for n, rq in registry.items() if rq.oracle is None)
    # Each rows-only query must be one of the documented by-necessity
    # exceptions (quality-gated in tests). Growing this list is a
    # deliberate act, not an accident.
    allowed = {
        "sim_topk_lsh",            # BRP-LSH: hash buckets engine-specific
        "minhash_lsh_near_dup",    # LSH banding recall-gated
        "approx_distinct_counts",  # HLL sketch values engine-specific
        "approx_quartiles",        # KLL sketch values engine-specific
        "stream_file_session_cache",  # streaming e2e: foreachBatch side effects
    }
    unexpected = [n for n in rows_only if n not in allowed]
    assert not unexpected, (
        f"queries registered without an oracle but not documented: {unexpected}"
    )


@pytest.mark.slow
def test_oracle_backed_queries_return_flat_columns(registry, spark):
    """Harness-compat gate (VERDICT r06 item 3): the driver canonicalizes
    results through pandas ``sort_values``, which cannot factorize ndarray
    / dict cells — a top-level array/map/struct column in an oracle-backed
    query errors forever on the driver even when values are right (the
    ``nation_top_balances_array`` lesson). Nested payloads must be
    serialized to deterministic text (concat_ws / to_json ↔ string_agg /
    json) before return. Schema inspection is MOSTLY lazy, but rank-
    device queries run eager approxQuantile / localCheckpoint jobs
    inside fn(), so this test does execute real (smoke-scale) Spark
    jobs for those; construction failures are logged, not swallowed —
    outright correctness belongs to the parity suite."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    skipped: list[str] = []
    for name, rq in registry.items():
        if rq.oracle is None:
            continue
        try:
            schema = rq.fn(spark, SF_SMOKE).schema
        except Exception as e:  # noqa: BLE001 — log, don't hide
            skipped.append(f"{name}: {type(e).__name__}: {e}")
            continue  # execution-path issues belong to the parity suite
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    if skipped:
        print(
            "test_oracle_backed_queries_return_flat_columns skipped "
            f"{len(skipped)} queries whose construction raised: {skipped}"
        )
    assert not offenders, (
        "oracle-backed queries return top-level array/map/struct columns "
        f"(driver canonicalizer cannot hash these): {offenders}"
    )
    # Construction failures here are almost always real breakage (every
    # registered query must build against the smoke tables); cap the
    # tolerated count so a broad regression cannot hide in the skip path.
    assert len(skipped) <= 2, (
        f"too many queries failed to construct at smoke scale: {skipped}"
    )


def test_bench_headline_names_registered():
    """A typo'd HEADLINE entry silently drops out of the bench (the
    list is filtered against the registry) — fail loudly instead."""
    import bench
    from ocean_data_pipeline_spark.queries import load_all

    reg = load_all()
    missing = [n for n in bench.HEADLINE + bench.SPREAD_ONLY if n not in reg]
    assert not missing, f"bench HEADLINE names not registered: {missing}"
    all_names = bench.HEADLINE + bench.SPREAD_ONLY
    assert len(set(all_names)) == len(all_names), "duplicate bench names"


def test_audit_names_registered():
    from ocean_data_pipeline_spark.queries import load_all
    from tools.explain_audit import AUDIT, RETIRED_AUDIT_NAMES

    reg = load_all()
    missing = [
        n for n in AUDIT if n not in reg and n not in RETIRED_AUDIT_NAMES
    ]
    assert not missing, f"plan-audit names not registered: {missing}"
