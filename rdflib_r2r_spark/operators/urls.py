"""URL normalization + canonical-URL dedup for web corpora.

Crawls re-fetch the same resource under syntactic variants — scheme/host
case, default ports, tracking parameters, param order, fragments,
trailing slashes.  Normalizing to a canonical form and deduping on it is
the first dedup pass of every web pipeline (cheaper than any content
hash: no document bytes touched).

All steps are JVM regex/array column ops with exact DuckDB twins:

1. drop the fragment (``#...``);
2. lowercase the scheme and host (path/query case is preserved);
3. strip default ports ``:80`` (http) / ``:443`` (https);
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``), sort the
   survivors byte-wise, drop the ``?`` if none survive;
5. strip one trailing slash from a non-root path.

Scale: per-row expressions in whole-stage codegen; the dedup is one
groupBy on the (short) canonical string — at 100 TB group on
``xxhash64(norm_url)`` to shrink the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (=|$) so valueless tracking params ("?fbclid", "?utm_source") are also
# stripped, not just the key=value form — same syntax in Java regex (Spark
# rlike) and RE2 (DuckDB regexp_matches), so oracle parity holds
TRACKING_RE = "^(utm_[^=&]*|fbclid|gclid)(=|$)"


def url_dedup(docs: DataFrame, url_col: str = "url",
              key_col: str = "doc_id") -> DataFrame:
    """(doc_id, norm_url, n_variants, keep): canonical-URL dedup — keep is
    true for the minimum doc_id per canonical URL (deterministic
    representative), n_variants counts how many raw URLs collapsed."""
    d = docs.select(
        F.col(key_col),
        normalize_url(F.col(url_col)).alias("norm_url"),
    )
    agg = d.groupBy("norm_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min(key_col).alias("_rep"),
    )
    return (
        d.join(agg, "norm_url")
        .select(
            key_col, "norm_url",
            F.col("n_variants").cast("bigint").alias("n_variants"),
            (F.col(key_col) == F.col("_rep")).alias("keep"),
        )
    )


def normalize_url(url) -> F.Column:
    """Canonical form of a URL column (see module docstring for the rules)."""
    u = F.regexp_replace(url, "#.*$", "")
    head = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    head = F.regexp_replace(head, "^(http://[^/?:]*):80$", "$1")
    head = F.regexp_replace(head, "^(https://[^/?:]*):443$", "$1")
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    path = F.regexp_replace(rest, "\\?.*$", "")
    query = F.when(rest.contains("?"),
                   F.regexp_replace(rest, "^[^?]*\\?", "")).otherwise(F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    ))
    qs = F.concat_ws("&", kept)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    return F.concat(head, path, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))


def url_dedup_sql(table: str = "documents", url_expr: str | None = None,
                  key_col: str = "doc_id") -> str:
    u = url_expr or "url"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    head = (f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1))")
    head = f"regexp_replace({head}, '^(http://[^/?:]*):80$', '\\1')"
    head = f"regexp_replace({head}, '^(https://[^/?:]*):443$', '\\1')"
    rest = f"regexp_replace({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '')"
    path = f"regexp_replace({rest}, '\\?.*$', '')"
    query = (f"CASE WHEN contains({rest}, '?') "
             f"THEN regexp_replace({rest}, '^[^?]*\\?', '') ELSE '' END")
    kept = (f"list_sort(list_filter(string_split({query}, '&'), "
            f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}')))")
    qs = f"array_to_string({kept}, '&')"
    path2 = (f"CASE WHEN length({path}) > 1 AND {path} LIKE '%/' "
             f"THEN substring({path}, 1, length({path}) - 1) ELSE {path} END")
    norm = (f"{head} || {path2} || "
            f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END")
    return f"""
WITH d AS (SELECT {key_col} AS doc_id, {norm} AS norm_url FROM {table}),
a AS (SELECT norm_url, count(*) AS n_variants, min(doc_id) AS rep
      FROM d GROUP BY 1)
SELECT d.doc_id AS {key_col}, d.norm_url,
       CAST(a.n_variants AS BIGINT) AS n_variants,
       d.doc_id = a.rep AS keep
FROM d JOIN a USING (norm_url)
"""


def synthetic_url_col(doc_id) -> F.Column:
    """Deterministic messy-URL synthesis for tests/benchmarks: doc_id % 5
    picks a syntactic variant; doc_id // 5 picks the logical resource, so
    five raw URLs collapse onto each canonical form."""
    # floor, not cast: Spark's double->bigint cast truncates while
    # DuckDB's rounds half-even — floor agrees everywhere
    res = F.floor(doc_id / 5).cast("bigint").cast("string")
    return (
        F.when(doc_id % 5 == 0,
               F.concat(F.lit("http://example.com/p/"), res, F.lit("?a=1&b=2")))
        .when(doc_id % 5 == 1,
              F.concat(F.lit("HTTP://Example.COM:80/p/"), res,
                       F.lit("?b=2&a=1#frag")))
        .when(doc_id % 5 == 2,
              F.concat(F.lit("http://example.com/p/"), res,
                       F.lit("/?utm_source=x&a=1&b=2")))
        .when(doc_id % 5 == 3,
              F.concat(F.lit("http://EXAMPLE.com/p/"), res,
                       F.lit("?a=1&fbclid=z&b=2")))
        .otherwise(
            F.concat(F.lit("http://example.com:80/p/"), res,
                     F.lit("?b=2&a=1&gclid=q#x")))
    )


def synthetic_url_sql(key_col: str = "doc_id") -> str:
    res = f"CAST(CAST(floor({key_col} / 5.0) AS BIGINT) AS VARCHAR)"
    return f"""CASE
 WHEN {key_col} % 5 = 0 THEN 'http://example.com/p/' || {res} || '?a=1&b=2'
 WHEN {key_col} % 5 = 1 THEN 'HTTP://Example.COM:80/p/' || {res} || '?b=2&a=1#frag'
 WHEN {key_col} % 5 = 2 THEN 'http://example.com/p/' || {res} || '/?utm_source=x&a=1&b=2'
 WHEN {key_col} % 5 = 3 THEN 'http://EXAMPLE.com/p/' || {res} || '?a=1&fbclid=z&b=2'
 ELSE 'http://example.com:80/p/' || {res} || '?b=2&a=1&gclid=q#x'
END"""
