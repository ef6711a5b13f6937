"""HTML -> text extraction as an Arrow-vectorized pandas UDF — the one stage
where Python is genuinely needed (north_star: "a vectorized Arrow-UDF stage
for HTML->text extraction, byte-identical per url"). All string work is
pandas ``.str`` vectorized ops over Arrow batches; no per-row Python.

Extractor spec (versioned; EXTRACTOR_VERSION feeds stage fingerprints):
1. decode UTF-8;
2. drop <script>/<style> subtrees;
3. keep the first <article>...</article> body if present, else <body>;
4. strip remaining tags;
5. unescape &lt; &gt; &amp; (amp last).

For any text whose HTML was produced by ``pages.html_wrap_col`` this is an
exact byte-level inverse (escape encodes all '<'/'>'/'&' of the original, so
strip-tags cannot eat content and unescape restores the original bytes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = "1"

_SCRIPT_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1>"
_ARTICLE_RE = r"(?is).*?<article\b[^>]*>(.*?)</article>.*"
_BODY_RE = r"(?is).*?<body\b[^>]*>(.*?)</body>.*"
_TAG_RE = r"(?s)<[^>]*>"


def extract_text_pd(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    art = s.str.replace(_ARTICLE_RE, r"\1", regex=True)
    body = s.str.replace(_BODY_RE, r"\1", regex=True)
    has_article = s.str.contains(r"(?is)<article\b", regex=True)
    s = art.where(has_article, body)
    s = s.str.replace(_TAG_RE, "", regex=True)
    s = s.str.replace("&lt;", "<", regex=False)
    s = s.str.replace("&gt;", ">", regex=False)
    s = s.str.replace("&amp;", "&", regex=False)
    return s


_udf_cache = {}


def extract_text(html: Column) -> Column:
    # UDF creation needs an active SparkSession, so build lazily.
    if "udf" not in _udf_cache:
        from pyspark.sql import types as T

        _udf_cache["udf"] = pandas_udf(extract_text_pd, T.StringType())
    return _udf_cache["udf"](html)
