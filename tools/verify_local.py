"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark side and DuckDB oracle side over the
same parquet tables, then compares row count, column names, and values
(sorted order-insensitively). Strict by default: values must match
EXACTLY after both sides land in pandas — if exact equality holds, any
reasonable driver hash matches too.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocean_data_pipeline_spark.catalog import TABLES  # noqa: E402
from ocean_data_pipeline_spark.queries import load_all  # noqa: E402
from ocean_data_pipeline_spark.session import get_spark  # noqa: E402


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c]
            if getattr(dt.dt, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    s, o = _canon(spark_df), _canon(oracle_df)
    if len(s) != len(o):
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The driver's value-hash is representation-sensitive: int64 vs
        # float64 (DuckDB HUGEINT sums land as float64) or object-date
        # vs datetime64 hash differently even when values are equal.
        # int-vs-float with NULLs present is NOT flagged: pandas
        # promotes a nullable BIGINT to float64 on one side only, and
        # the value comparison below still decides equality exactly.
        # Without NULLs, int-vs-float IS real drift (the DuckDB
        # HUGEINT-sum class); incompatible kinds (object-date vs
        # datetime64 etc.) are always a hard mismatch.
        sk, ok_ = sv.dtype.kind, ov.dtype.kind
        if sk != ok_:
            if {sk, ok_} - {"i", "u", "f"}:
                problems.append(
                    f"col {c}: dtype-kind mismatch spark={sv.dtype} oracle={ov.dtype}"
                )
            elif not (sv.isna().any() or ov.isna().any()):
                problems.append(
                    f"col {c}: int/float dtype drift without NULLs "
                    f"spark={sv.dtype} oracle={ov.dtype}"
                )
            else:
                # NULL-excused relaxation: values still compared exactly
                # below, but the driver's HASH is representation-
                # sensitive, so surface the residual risk instead of
                # passing silently (a DuckDB HUGEINT sum that happens to
                # include one NULL row would otherwise hide real drift).
                print(
                    f"WARN  {name} col {c}: int/float dtype drift excused "
                    f"by NULLs (spark={sv.dtype} oracle={ov.dtype}) — "
                    "driver-side hash may still differ",
                    file=sys.stderr,
                )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            eq = np.isclose(
                sv.astype(float), ov.astype(float), rtol=0, atol=0, equal_nan=True
            )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
        if not bool(np.all(eq)):
            bad = np.where(~np.asarray(eq))[0][:5]
            detail = "; ".join(
                f"row{i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}" for i in bad
            )
            problems.append(f"col {c}: {int((~np.asarray(eq)).sum())} mismatches ({detail})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("verify-local")
    con = duckdb_conn(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, rq in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            sdf = rq.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if rq.oracle is None:
            print(f"ROWS  {name}: rows={len(sdf)} (no oracle)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(rq.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sdf)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
