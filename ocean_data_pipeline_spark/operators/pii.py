"""PII detection / redaction (training-data curation; capability-class
extension of SURVEY.md §2-J text analysis — the scrub stage every
corpus pipeline runs before training).

JVM-side only: detection is `regexp_extract_all` + `size`, redaction is
chained `regexp_replace` — whole-stage-codegen expressions, no Python
in the hot path. Patterns are deliberately restricted to syntax RE2
and Java regex interpret identically (character classes, bounded
repetition, \\b word boundaries — no lookaround, no backrefs) so the
DuckDB oracle runs the very same patterns.

At 100 TB this is a pure map stage: no shuffle, no state; it composes
with the curation funnel (one scan, conditional aggregates) and the
dedup pipeline upstream/downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Pattern syntax valid AND equivalent in Java regex and RE2 (DuckDB).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}

#: Replacement order matters where patterns overlap: the IPv4 pattern
#: would match the dotted-quad inside nothing here (emails have no '@'
#: in the IP pattern and phones are dash-separated), but redact emails
#: first anyway so an address like 1.2.3.4@host.com is treated as an
#: email, not an IP with residue.
REDACTION_ORDER = ("email", "phone", "ipv4")


def pii_count(col: Column, kind: str) -> Column:
    """Number of `kind` PII matches in `col` (0 for NULL text)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0))),
        F.lit(0),
    )


def redact_pii(col: Column) -> Column:
    """`col` with every known PII pattern replaced by its token.

    Idempotent: redaction tokens contain no characters the patterns
    can match (tests/test_pii.py pins this)."""
    out = col
    for kind in REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKENS[kind])
    return out
