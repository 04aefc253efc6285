"""PII scrub as an oracle-checked query (SURVEY.md §2-J capability
class; operators/pii.py).

The synthetic documents corpus carries no PII, so — like the
multimodal query's synthetic containers — the query INJECTS
deterministic PII derived arithmetically from doc_id (an email for
doc_id % 5 == 0, a phone for % 7, an IPv4 for % 11; a doc can get
several), then detects and redacts it. Both engines build the same
augmented text from the same arithmetic, so the DuckDB oracle verifies
detection counts AND redaction byte-effects exactly; `n_residual`
being 0 proves the redaction actually removed everything it detected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocean_data_pipeline_spark.catalog import table
from ocean_data_pipeline_spark.operators.pii import pii_count, redact_pii
from ocean_data_pipeline_spark.queries import register

_PII_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 555-'
                      || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
                      || '-'
                      || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 5) % 256 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
),
per_doc AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
         len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
  FROM aug
)
SELECT
  count(*)                                                    AS n_docs,
  count(CASE WHEN n_email > 0 THEN 1 END)                     AS n_docs_email,
  count(CASE WHEN n_phone > 0 THEN 1 END)                     AS n_docs_phone,
  count(CASE WHEN n_ip > 0 THEN 1 END)                        AS n_docs_ip,
  CAST(sum(n_email + n_phone + n_ip) AS BIGINT)               AS n_pii_total,
  count(CASE WHEN redacted != t THEN 1 END)                   AS n_docs_redacted,
  CAST(sum(len(t) - len(redacted)) AS BIGINT)                 AS chars_delta,
  CAST(sum(
    len(regexp_extract_all(redacted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
    + len(regexp_extract_all(redacted, '\b\d{3}-\d{3}-\d{4}\b'))
    + len(regexp_extract_all(redacted, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
  ) AS BIGINT)                                                AS n_residual
FROM per_doc
"""


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text + arithmetically injected PII (same expressions
    as the oracle's aug CTE)."""
    d = F.col("doc_id")
    email = F.when(
        d % 5 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad(((d * 7) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((d * 13) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 11 == 0,
        F.concat(
            F.lit(" host 10."),
            (d % 256).cast("string"),
            F.lit("."),
            ((d * 3) % 256).cast("string"),
            F.lit("."),
            ((d * 5) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("t")
    )


@register("pii_redaction_census", oracle=_PII_ORACLE)
def pii_redaction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact emails/phones/IPs over the (synthetically
    augmented) corpus and report the scrub census: per-type document
    counts, total matches, docs changed by redaction, net bytes
    removed, and the residual match count after redaction — which the
    oracle pins to the SAME value (0 would be asserted in a real
    pipeline's quality gate; here both engines must agree exactly).
    Pure map + one aggregate: no shuffle beyond the final 1-row agg."""
    aug = _augmented(spark, sf_dir)
    per_doc = aug.select(
        "doc_id",
        "t",
        pii_count(F.col("t"), "email").alias("n_email"),
        pii_count(F.col("t"), "phone").alias("n_phone"),
        pii_count(F.col("t"), "ipv4").alias("n_ip"),
        redact_pii(F.col("t")).alias("redacted"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("n_email") > 0, 1)).alias("n_docs_email"),
        F.count(F.when(F.col("n_phone") > 0, 1)).alias("n_docs_phone"),
        F.count(F.when(F.col("n_ip") > 0, 1)).alias("n_docs_ip"),
        F.sum(F.col("n_email") + F.col("n_phone") + F.col("n_ip"))
        .cast("long")
        .alias("n_pii_total"),
        F.count(F.when(F.col("redacted") != F.col("t"), 1)).alias("n_docs_redacted"),
        F.sum(F.length("t") - F.length("redacted")).cast("long").alias("chars_delta"),
        F.sum(
            pii_count(F.col("redacted"), "email")
            + pii_count(F.col("redacted"), "phone")
            + pii_count(F.col("redacted"), "ipv4")
        )
        .cast("long")
        .alias("n_residual"),
    )


# --- URL / domain provenance census -----------------------------------

_URL_CENSUS_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' see https://w' || CAST(doc_id % 50 AS VARCHAR)
                      || '.example' || CAST(doc_id % 7 AS VARCHAR)
                      || '.com/p/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' ref http://cdn' || CAST(doc_id % 20 AS VARCHAR)
                      || '.assets' || CAST(doc_id % 5 AS VARCHAR) || '.net/x'
                 ELSE '' END
         || CASE WHEN doc_id % 10 = 0
                 THEN ' mirror https://m' || CAST(doc_id % 9 AS VARCHAR)
                      || '.example' || CAST(doc_id % 7 AS VARCHAR) || '.org/'
                 ELSE '' END AS t
  FROM documents
),
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[A-Za-z0-9.-]+[A-Za-z0-9/?=._-]*')) AS url
  FROM aug
),
parsed AS (
  SELECT doc_id, url,
         regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS host
  FROM urls
),
named AS (
  SELECT doc_id, url, host,
         regexp_extract(host, '([A-Za-z0-9-]+\.[A-Za-z]+)$', 1) AS domain,
         regexp_extract(host, '\.([A-Za-z]+)$', 1) AS tld
  FROM parsed
),
tot AS (SELECT count(*) AS n_total FROM named)
SELECT n.tld,
       count(*) AS n_urls,
       count(DISTINCT n.doc_id) AS n_docs,
       count(DISTINCT n.domain) AS n_domains,
       count(DISTINCT n.host) AS n_hosts,
       CAST(count(CASE WHEN n.domain LIKE 'assets%' THEN 1 END) AS BIGINT)
         AS n_blocklisted,
       CAST(count(*) AS DOUBLE) / t.n_total AS url_share
FROM named n CROSS JOIN tot t
GROUP BY n.tld, t.n_total
ORDER BY n.tld
"""


@register("url_domain_census", oracle=_URL_CENSUS_ORACLE)
def url_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-provenance census: extract every URL from the corpus, parse
    host → registered domain → TLD, and report per-TLD URL/document/
    domain counts plus blocklist hits (domains matching 'assets%') —
    the curation pass that decides which crawl sources to keep before
    training. Like `pii_redaction_census`, URLs are INJECTED
    deterministically from doc_id arithmetic (the synthetic corpus has
    none), so the oracle verifies extraction and parsing exactly.

    Plan shape: regexp_extract_all → explode stays inside whole-stage
    codegen (patterns restricted to Java∩RE2 syntax, operators/pii.py
    rule); the census aggregate runs on the exploded URL relation with
    map-side partials, and the total arrives from a 1-row broadcast.
    At 100 TB the only row-scale stage is the extraction scan."""
    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" see https://w"),
                    (F.col("doc_id") % 50).cast("string"),
                    F.lit(".example"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".com/p/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" ref http://cdn"),
                    (F.col("doc_id") % 20).cast("string"),
                    F.lit(".assets"),
                    (F.col("doc_id") % 5).cast("string"),
                    F.lit(".net/x"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" mirror https://m"),
                    (F.col("doc_id") % 9).cast("string"),
                    F.lit(".example"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".org/"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    urls = aug.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                "t", F.lit(r"https?://[A-Za-z0-9.-]+[A-Za-z0-9/?=._-]*"), 0
            )
        ).alias("url"),
    )
    named = urls.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"https?://([A-Za-z0-9.-]+)", 1).alias("host"),
    ).select(
        "doc_id",
        "url",
        "host",
        F.regexp_extract("host", r"([A-Za-z0-9-]+\.[A-Za-z]+)$", 1).alias("domain"),
        F.regexp_extract("host", r"\.([A-Za-z]+)$", 1).alias("tld"),
    )
    tot = named.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        named.crossJoin(F.broadcast(tot))
        .groupBy("tld", "n_total")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("domain").alias("n_domains"),
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.when(F.col("domain").like("assets%"), 1))
            .cast("bigint")
            .alias("n_blocklisted"),
        )
        .select(
            "tld",
            "n_urls",
            "n_docs",
            "n_domains",
            "n_hosts",
            "n_blocklisted",
            (F.col("n_urls").cast("double") / F.col("n_total")).alias("url_share"),
        )
        .orderBy("tld")
    )
