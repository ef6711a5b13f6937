"""PII detection + redaction for training-data curation.

Every serious pretraining pipeline runs a PII scrub before the mix is
frozen (emails / phone numbers / IP addresses at minimum).  Counting and
redaction are pure JVM regex column ops — `regexp_count` + chained
`regexp_replace` — so the scrub rides whole-stage codegen at corpus scan
speed: no UDF, no shuffle, linear in corpus bytes.

The patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — ASCII classes, `\\b` word boundaries, no
lookarounds — so the DuckDB oracle twin matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII-only on purpose: identical semantics in Java regex and RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,6}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# redaction order matters: emails first (their local/domain parts contain
# dots and digits that the looser phone/IP patterns could otherwise chew
# on), then phones (digit groups with separators), then bare IPs.
_REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def redact_col(text) -> F.Column:
    out = text
    for pat, tag in _REDACTIONS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_stats(docs: DataFrame, text_col: str = "text",
              key_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, any_pii, redacted_fingerprint):
    per-document PII hit counts on the RAW text plus the md5 of the
    redacted text (counts and redaction are independent, so a redaction
    that swallows an overlapping match can never hide a count).
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phone = F.regexp_count(t, F.lit(PHONE_RE))
    n_ip = F.regexp_count(t, F.lit(IPV4_RE))
    return docs.select(
        F.col(key_col),
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        n_ip.cast("bigint").alias("n_ipv4"),
        ((n_email + n_phone + n_ip) > 0).alias("any_pii"),
        F.md5(redact_col(t)).alias("redacted_fingerprint"),
    )


def _redact_sql(expr: str) -> str:
    out = expr
    for pat, tag in _REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def pii_stats_sql(table: str = "documents", text_col: str = "text",
                  key_col: str = "doc_id") -> str:
    n_email = f"len(regexp_extract_all({text_col}, '{EMAIL_RE}'))"
    n_phone = f"len(regexp_extract_all({text_col}, '{PHONE_RE}'))"
    n_ip = f"len(regexp_extract_all({text_col}, '{IPV4_RE}'))"
    return f"""
SELECT {key_col},
       CAST({n_email} AS BIGINT) AS n_emails,
       CAST({n_phone} AS BIGINT) AS n_phones,
       CAST({n_ip} AS BIGINT) AS n_ipv4,
       ({n_email} + {n_phone} + {n_ip}) > 0 AS any_pii,
       md5({_redact_sql(text_col)}) AS redacted_fingerprint
FROM {table}
"""


def synthetic_pii_col(text, doc_id) -> F.Column:
    """Deterministic PII injection for tests/benchmarks: the fixture corpus
    contains no PII-shaped strings, so the registered query appends
    synthetic contact lines derived from doc_id (docs with id % 3 == 2 stay
    clean — the operator must prove it does NOT fire on clean text)."""
    email = F.concat(text, F.lit(" reach user"), doc_id.cast("string"),
                     F.lit("@example.com"))
    phone = F.concat(text, F.lit(" call 212-555-"),
                     F.lpad((doc_id % 10000).cast("string"), 4, "0"))
    base = (
        F.when(doc_id % 3 == 0, email)
        .when(doc_id % 3 == 1, phone)
        .otherwise(text)
    )
    ip = F.concat(base, F.lit(" from 10.0."), (doc_id % 256).cast("string"),
                  F.lit("."), (doc_id % 100 + 1).cast("string"))
    return F.when(doc_id % 7 == 0, ip).otherwise(base)


def synthetic_pii_sql(text_col: str = "text", key_col: str = "doc_id") -> str:
    email = f"{text_col} || ' reach user' || {key_col} || '@example.com'"
    phone = (f"{text_col} || ' call 212-555-' || "
             f"lpad(CAST({key_col} % 10000 AS VARCHAR), 4, '0')")
    base = (f"CASE WHEN {key_col} % 3 = 0 THEN {email} "
            f"WHEN {key_col} % 3 = 1 THEN {phone} ELSE {text_col} END")
    ip = (f"({base}) || ' from 10.0.' || CAST({key_col} % 256 AS VARCHAR)"
          f" || '.' || CAST({key_col} % 100 + 1 AS VARCHAR)")
    return f"CASE WHEN {key_col} % 7 = 0 THEN {ip} ELSE {base} END"
