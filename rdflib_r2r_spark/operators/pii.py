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
# checksum-gated detectors (v2): the regex finds SHAPE candidates, a
# column-expression checksum validates — counting is precise (a
# fails-Luhn number never counts), redaction stays shape-conservative
CC_RE = r"\b(\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}|\d{13,16})\b"
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

# redaction order matters: emails first (their local/domain parts contain
# dots and digits that the looser phone/IP patterns could otherwise chew
# on), then the letter-anchored IBANs, then long card-number runs, then
# SSNs/phones (short separated digit groups), then bare IPs.  Redaction is
# deliberately shape-based (conservative over-redaction is the standard
# scrub posture); only the COUNT columns are checksum-gated.
_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"), (IBAN_RE, "<IBAN>"), (CC_RE, "<CCN>"),
    (SSN_RE, "<SSN>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>"),
]


def luhn_ok_col(s: F.Column) -> F.Column:
    """Luhn checksum over a digits-only string column — a single
    F.aggregate fold, JVM-side (no UDF): from the right, double every
    second digit, fold >9 to digit sum, total % 10 == 0."""
    n = F.length(s)

    def term(i):
        d = s.substr(i, F.lit(1)).cast("int")
        return F.when((n - i) % 2 == 1,
                      F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
                      ).otherwise(d)

    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + term(i),
    )
    return total % 10 == 0


def iban_ok_col(s: F.Column) -> F.Column:
    """IBAN mod-97 (ISO 13616): move the first 4 chars to the end, read
    letters as two-digit values (A=10..Z=35), big-number mod 97 == 1 —
    folded incrementally so the accumulator never leaves bigint range."""
    r = F.concat(s.substr(F.lit(5), F.length(s)), s.substr(F.lit(1), F.lit(4)))
    acc = F.aggregate(
        F.split(r, ""),
        F.lit(0).cast("bigint"),
        lambda a, c: F.when(
            c.rlike("^[0-9]$"), (a * 10 + c.cast("bigint")) % 97
        ).otherwise((a * 100 + (F.ascii(c) - 55)) % 97),
    )
    return acc == 1


def ssn_ok_col(s: F.Column) -> F.Column:
    """SSN validity rules on a ddd-dd-dddd candidate: area not 000/666 and
    not 9xx, group not 00, serial not 0000 (RE2 has no lookahead, so these
    are column predicates, not regex)."""
    area = s.substr(1, 3)
    return (
        (area != "000") & (area != "666") & (s.substr(1, 1) != "9")
        & (s.substr(5, 2) != "00") & (s.substr(8, 4) != "0000")
    )


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
    n_ccn = F.size(F.filter(
        F.regexp_extract_all(t, F.lit(CC_RE), F.lit(0)),
        lambda s: luhn_ok_col(F.translate(s, " -", "")),
    ))
    n_iban = F.size(F.filter(
        F.regexp_extract_all(t, F.lit(IBAN_RE), F.lit(0)), iban_ok_col,
    ))
    n_ssn = F.size(F.filter(
        F.regexp_extract_all(t, F.lit(SSN_RE), F.lit(0)), ssn_ok_col,
    ))
    return docs.select(
        F.col(key_col),
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        n_ip.cast("bigint").alias("n_ipv4"),
        n_ccn.cast("bigint").alias("n_ccn"),
        n_iban.cast("bigint").alias("n_iban"),
        n_ssn.cast("bigint").alias("n_ssn"),
        ((n_email + n_phone + n_ip + n_ccn + n_iban + n_ssn) > 0).alias("any_pii"),
        F.md5(redact_col(t)).alias("redacted_fingerprint"),
    )


def _redact_sql(expr: str) -> str:
    out = expr
    for pat, tag in _REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def luhn_ok_sql(s: str) -> str:
    """DuckDB twin of luhn_ok_col over a digits-only string expression."""
    return (
        f"(list_sum(list_transform(range(1, length({s}) + 1), i -> "
        f"CASE WHEN (length({s}) - i) % 2 = 1 THEN "
        f"CASE WHEN CAST(({s})[i] AS INT) * 2 > 9 "
        f"THEN CAST(({s})[i] AS INT) * 2 - 9 "
        f"ELSE CAST(({s})[i] AS INT) * 2 END "
        f"ELSE CAST(({s})[i] AS INT) END)) % 10 = 0)"
    )


def iban_ok_sql(s: str) -> str:
    """DuckDB twin of iban_ok_col: same incremental mod-97 fold
    (list_reduce needs a uniform element type, so letters are encoded as
    100000 + value and decoded in the lambda)."""
    r = f"(substr({s}, 5) || substr({s}, 1, 4))"
    enc = (
        f"list_transform(range(1, length({r}) + 1), i -> "
        f"CASE WHEN {r}[i] BETWEEN '0' AND '9' THEN CAST({r}[i] AS BIGINT) "
        f"ELSE 100000 + (ascii({r}[i]) - 55) END)"
    )
    return (
        f"(list_reduce(list_prepend(CAST(0 AS BIGINT), {enc}), "
        f"(acc, e) -> CASE WHEN e >= 100000 THEN (acc * 100 + (e - 100000)) % 97 "
        f"ELSE (acc * 10 + e) % 97 END) = 1)"
    )


def ssn_ok_sql(s: str) -> str:
    return (
        f"(substr({s}, 1, 3) <> '000' AND substr({s}, 1, 3) <> '666' "
        f"AND substr({s}, 1, 1) <> '9' AND substr({s}, 5, 2) <> '00' "
        f"AND substr({s}, 8, 4) <> '0000')"
    )


def pii_stats_sql(table: str = "documents", text_col: str = "text",
                  key_col: str = "doc_id") -> str:
    n_email = f"len(regexp_extract_all({text_col}, '{EMAIL_RE}'))"
    n_phone = f"len(regexp_extract_all({text_col}, '{PHONE_RE}'))"
    n_ip = f"len(regexp_extract_all({text_col}, '{IPV4_RE}'))"
    cc_digits = "translate(c, ' -', '')"
    n_ccn = (
        f"len(list_filter(regexp_extract_all({text_col}, '{CC_RE}'), "
        f"c -> {luhn_ok_sql(cc_digits)}))"
    )
    n_iban = (
        f"len(list_filter(regexp_extract_all({text_col}, '{IBAN_RE}'), "
        f"c -> {iban_ok_sql('c')}))"
    )
    n_ssn = (
        f"len(list_filter(regexp_extract_all({text_col}, '{SSN_RE}'), "
        f"c -> {ssn_ok_sql('c')}))"
    )
    return f"""
SELECT {key_col},
       CAST({n_email} AS BIGINT) AS n_emails,
       CAST({n_phone} AS BIGINT) AS n_phones,
       CAST({n_ip} AS BIGINT) AS n_ipv4,
       CAST({n_ccn} AS BIGINT) AS n_ccn,
       CAST({n_iban} AS BIGINT) AS n_iban,
       CAST({n_ssn} AS BIGINT) AS n_ssn,
       ({n_email} + {n_phone} + {n_ip} + {n_ccn} + {n_iban} + {n_ssn}) > 0 AS any_pii,
       md5({_redact_sql(text_col)}) AS redacted_fingerprint
FROM {table}
"""


# checksum-verified injection literals (v2): every VALID entry passes its
# checksum, every NEAR_MISS fails it while keeping the exact shape (the
# counts must NOT fire on near-misses; redaction still does, by design)
CC_VALID = ["4111111111111111", "5500005555555559", "340000000000009",
            "6011000990139424", "4242 4242 4242 4242"]
CC_NEAR_MISS = ["4111111111111112", "5500005555555550", "340000000000000",
                "6011000990139425", "4242 4242 4242 4243"]
IBAN_VALID = ["DE89370400440532013000", "GB82WEST12345698765432",
              "FR1420041010050500013M02606", "NL91ABNA0417164300",
              "ES9121000418450200051332"]
IBAN_NEAR_MISS = ["DE89370400440532013001", "GB82WEST12345698765433",
                  "FR1420041010050500013M02607", "NL91ABNA0417164301",
                  "ES9121000418450200051333"]
SSN_VALID = ["123-45-6789", "234-56-7890", "345-67-8901", "456-78-9012",
             "567-89-0123"]
SSN_NEAR_MISS = ["000-12-3456", "666-45-6789", "912-34-5678", "123-00-4567",
                 "123-45-0000"]


def synthetic_pii_col(text, doc_id) -> F.Column:
    """Deterministic PII injection for tests/benchmarks: the fixture corpus
    contains no PII-shaped strings, so the registered query appends
    synthetic contact lines derived from doc_id.  Arms stack: id % 3 picks
    email/phone/none, id % 7 == 0 adds an IP, id % 5 picks a
    card-number/IBAN/SSN line — VALID when id % 2 == 0, shape-matched
    checksum-failing NEAR-MISS when odd (the near-miss must be redacted
    but never counted).  Docs with id % 3 == 2 AND id % 7 != 0 AND
    id % 5 >= 3 stay fully clean — the operator must prove it does NOT
    fire on that clean subset."""

    def pick(valid: list[str], near: list[str]) -> F.Column:
        idx = (F.floor(doc_id / 5) % 5 + 1).cast("int")
        return F.when(doc_id % 2 == 0,
                      F.element_at(F.array(*[F.lit(v) for v in valid]), idx)
                      ).otherwise(
                      F.element_at(F.array(*[F.lit(v) for v in near]), idx))

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
    base = F.when(doc_id % 7 == 0, ip).otherwise(base)
    return (
        F.when(doc_id % 5 == 0,
               F.concat(base, F.lit(" card "), pick(CC_VALID, CC_NEAR_MISS)))
        .when(doc_id % 5 == 1,
              F.concat(base, F.lit(" iban "),
                       pick(IBAN_VALID, IBAN_NEAR_MISS)))
        .when(doc_id % 5 == 2,
              F.concat(base, F.lit(" ssn "), pick(SSN_VALID, SSN_NEAR_MISS)))
        .otherwise(base)
    )


def synthetic_pii_sql(text_col: str = "text", key_col: str = "doc_id") -> str:
    def pick_sql(valid: list[str], near: list[str]) -> str:
        idx = f"(CAST(floor({key_col} / 5.0) AS BIGINT) % 5 + 1)"
        vlist = ", ".join(f"'{v}'" for v in valid)
        nlist = ", ".join(f"'{v}'" for v in near)
        return (f"CASE WHEN {key_col} % 2 = 0 THEN ([{vlist}])[{idx}] "
                f"ELSE ([{nlist}])[{idx}] END")

    email = f"{text_col} || ' reach user' || {key_col} || '@example.com'"
    phone = (f"{text_col} || ' call 212-555-' || "
             f"lpad(CAST({key_col} % 10000 AS VARCHAR), 4, '0')")
    base = (f"CASE WHEN {key_col} % 3 = 0 THEN {email} "
            f"WHEN {key_col} % 3 = 1 THEN {phone} ELSE {text_col} END")
    ip = (f"({base}) || ' from 10.0.' || CAST({key_col} % 256 AS VARCHAR)"
          f" || '.' || CAST({key_col} % 100 + 1 AS VARCHAR)")
    base = f"CASE WHEN {key_col} % 7 = 0 THEN {ip} ELSE {base} END"
    return (
        f"CASE WHEN {key_col} % 5 = 0 THEN ({base}) || ' card ' || "
        f"{pick_sql(CC_VALID, CC_NEAR_MISS)} "
        f"WHEN {key_col} % 5 = 1 THEN ({base}) || ' iban ' || "
        f"{pick_sql(IBAN_VALID, IBAN_NEAR_MISS)} "
        f"WHEN {key_col} % 5 = 2 THEN ({base}) || ' ssn ' || "
        f"{pick_sql(SSN_VALID, SSN_NEAR_MISS)} "
        f"ELSE {base} END"
    )
