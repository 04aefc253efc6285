"""lit_double_matrix (round 11) builds codebook literals as ONE parsed
SQL expression instead of ~1000 py4j `F.lit` calls. The contract is
bit-identical values: `repr` of a finite double is its shortest
round-trip form and Spark's `<digits>D` literal parses through
Double.parseDouble (correctly rounded), so the parsed Literal must
carry the same IEEE-754 bits the Column-API construction would.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.similarity import (
    _sql_double,
    lit_double_matrix,
)

TRICKY = [
    [0.08595368204904454, -0.028465671498062357, 1e-05, -1.5e-07],
    [4.9e-324, -0.0, 1.0, 123456.78900000001],  # subnormal, signed zero
    [2.2250738585072014e-308, 1.7976931348623157e308, -1e308, 0.1],
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_parsed_literals_bit_equal_to_column_api(spark):
    new = lit_double_matrix(TRICKY)
    old = F.array(*[F.array(*[F.lit(x) for x in row]) for row in TRICKY])
    got = spark.range(1).select(new.alias("a"), old.alias("b")).first()
    for ra, rb, src in zip(got["a"], got["b"], TRICKY):
        for xa, xb, xs in zip(ra, rb, src):
            assert _bits(xa) == _bits(xb) == _bits(xs)


def test_frozen_codebooks_round_trip(spark):
    from ocean_data_pipeline_spark.operators.ivf_codebook import FROZEN_CENTROIDS
    from ocean_data_pipeline_spark.operators.pq_codebook import PQ_CODEBOOKS

    for rows in [FROZEN_CENTROIDS] + list(PQ_CODEBOOKS):
        got = spark.range(1).select(lit_double_matrix(rows).alias("m")).first()["m"]
        assert [
            [_bits(x) for x in r] for r in got
        ] == [[_bits(x) for x in r] for r in rows]


def test_non_finite_rejected():
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            _sql_double(bad)
    assert _sql_double(0.5) == "0.5D"
    assert math.isfinite(float(_sql_double(1e-12)[:-1]))
