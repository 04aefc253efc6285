"""PII detection/redaction laws (operators.pii): totality, idempotence,
completeness (no residual matches after redaction), and cross-engine
pattern compatibility is covered by the pii_redaction_census oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocean_data_pipeline_spark.operators.pii import (
    PII_PATTERNS,
    REDACTION_TOKENS,
    pii_count,
    redact_pii,
)

SAMPLES = [
    ("plain text with no pii at all", 0, 0, 0),
    ("mail me at alice.smith+x@sub.example.co right away", 1, 0, 0),
    ("call 555-123-4567 or 999-000-1111 now", 0, 2, 0),
    ("server at 192.168.0.1 and 10.0.0.255", 0, 0, 2),
    ("bob@x.io on 1.2.3.4 dial 555-000-9999", 1, 1, 1),
    ("", 0, 0, 0),
    (None, 0, 0, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(SAMPLES)], "i long, t string"
    )


def test_counts_match_expected(spark):
    got = (
        _df(spark)
        .select(
            "i",
            pii_count(F.col("t"), "email").alias("e"),
            pii_count(F.col("t"), "phone").alias("p"),
            pii_count(F.col("t"), "ipv4").alias("ip"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (_, e, p, ip) in zip(got, SAMPLES):
        assert (row["e"], row["p"], row["ip"]) == (e, p, ip), row


def test_redaction_complete_and_idempotent(spark):
    out = (
        _df(spark)
        .select("i", "t", redact_pii(F.col("t")).alias("r1"))
        .select(
            "i",
            "r1",
            redact_pii(F.col("r1")).alias("r2"),
            (
                pii_count(F.col("r1"), "email")
                + pii_count(F.col("r1"), "phone")
                + pii_count(F.col("r1"), "ipv4")
            ).alias("residual"),
        )
        .collect()
    )
    for row in out:
        assert row["residual"] == 0, row
        assert row["r1"] == row["r2"], f"redaction not idempotent: {row}"


def test_tokens_do_not_self_match():
    """Redaction tokens must not themselves match any pattern (the
    idempotence guarantee's static half)."""
    import re

    for tok in REDACTION_TOKENS.values():
        for pat in PII_PATTERNS.values():
            assert not re.search(pat, tok), (tok, pat)


def test_jvm_only_plan(spark):
    df = _df(spark).select(redact_pii(F.col("t")).alias("r"))
    explained = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in explained
    assert "ArrowEvalPython" not in explained
