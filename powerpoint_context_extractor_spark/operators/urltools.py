"""URL canonicalization — the dedup key-prep every crawl pipeline runs
before url-level dedup/frontier work (reference keys files by path,
pptx_extract.py:44-71; a web corpus keys by canonical URL).

All steps are single regexp_replace/extract expressions (JVM codegen,
zero shuffles, scan speed at any scale). Patterns avoid lookarounds so
they run identically under Java regex (Spark) and RE2 (DuckDB); the
oracle mirrors each step with ``\\1`` capture syntax in place of
``$1``.

Canonical form (frozen; the contract query pins it):
1. strip the #fragment;
2. lowercase scheme://host (path/query case is preserved);
3. drop default ports :80 (http) / :443 (https);
4. remove tracking params (utm_*, gclid, fbclid) wherever they sit in
   the query string, fixing ?/& separators;
5. drop a trailing '?' or '&' left by removals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRACK = r"(utm_[^=&#]*|gclid|fbclid)"
_PREFIX = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def canonical_url(col: F.Column) -> F.Column:
    """Column expression: canonicalized URL (see module docstring)."""
    u = F.regexp_replace(col, r"#.*$", "")
    prefix = F.regexp_extract(u, _PREFIX, 0)
    # lowercase scheme+host: lower(prefix) + remainder
    u = F.concat(F.lower(prefix),
                 u.substr(F.length(prefix) + 1, F.lit(1 << 30)))
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80([/?]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443([/?]|$)", "$1$2")
    u = F.regexp_replace(u, r"&" + _TRACK + r"=[^&#]*", "")
    u = F.regexp_replace(u, r"\?" + _TRACK + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACK + r"=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    return u


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canon_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))
