"""URL canonicalization — the crawl-dedup step BEFORE content dedup.

A crawl sees the same resource under many spellings (case-shifted hosts,
default ports, tracking parameters, fragments, permuted query order);
canonicalizing URLs collapses those variants so URL-level dedup and
host-level aggregation run on one key. Everything here is scan-side
Column algebra (regexp extracts + higher-order array functions — no UDF,
no shuffle), with RE2/Java-portable patterns so a DuckDB oracle can run
the identical program.

Scope: absolute http(s) URLs, the crawl case. Userinfo and IPv6 literal
hosts pass through untouched inside the authority (lowercased); a
production canonicalizer would add scheme-relative resolution and IDN
normalization as explicit steps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never identify content (tracking/session noise).
TRACKING_PARAM_PATTERN = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref|sessionid)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and authority lowercased (path/query case is significant
      and preserved);
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - empty path becomes ``/``;
    - query parameters: tracking params dropped
      (:data:`TRACKING_PARAM_PATTERN`), the rest SORTED bytewise and
      rejoined — permuted-order variants collapse; an emptied query
      drops its ``?``;
    - fragment dropped.

    Non-http(s) or scheme-less strings pass through unchanged (and NULL
    stays NULL): canonicalization must never invent a URL from a
    non-URL.
    """
    u = _c(url)
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    authority = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    path = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(scheme.isin("http", "https"), canon).otherwise(u)
