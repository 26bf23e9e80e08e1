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
    # Query extraction runs on the PRE-FRAGMENT prefix: a '?' whose first
    # occurrence is inside the fragment (hashbang routes like
    # '#!/route?x=1') is fragment content, not a query — matching it over
    # the whole URL both failed to collapse the variant with its
    # query-less spelling and falsely collapsed it with the genuinely
    # different '?x=1' resource (ADVICE r8).
    prefrag = F.regexp_extract(u, "^([^#]*)", 1)
    query = F.regexp_extract(prefrag, "\\?(.*)", 1)
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


def robots_decisions(urls: DataFrame, robots: DataFrame) -> DataFrame:
    """Crawl governance: per-URL fetch decisions against per-host
    robots.txt rules — the standard longest-match semantics (the most
    specific matching Allow/Disallow prefix wins; Allow wins length
    ties; no matching rule means allowed).

    ``urls`` carries a ``url`` column; ``robots`` carries (host,
    robots_txt). Rules explode scan-side (one row per Allow/Disallow
    line), join to URLs BY HOST with a broadcast — robots tables are
    small by nature (one document per host, a few rules each), so the
    decision never shuffles the URL corpus — and the winner is one
    ``max_by`` aggregate over an integer score that encodes
    (prefix length, Allow-beats-Disallow) lexicographically. Returns
    (url, host, path, allowed, rule_verb, rule_prefix) with NULL rule
    columns for no-rule hosts/paths. Scope: the '*' user-agent group
    (``robots_txt`` is expected pre-filtered to the relevant group).

    Wildcards (RFC 9309 / Google semantics): ``*`` in a rule matches any
    character sequence (including ``/``) and a TRAILING ``$`` anchors the
    rule to the end of the path; a non-trailing ``$`` is a literal.
    Wildcard rules are translated to anchored Java regexes ONCE per rule
    on the broadcast side (escape regex specials, ``*`` → ``.*``, keep
    the trailing anchor); literal rules keep the cheap ``startswith``
    path, so the per-(url, rule) cost only rises for rules that actually
    use wildcards. Specificity stays pattern LENGTH as written (the
    spec's rule), Allow still wins length ties.

    Host keying: the join host is NORMALIZED the same way
    :func:`canonical_url` normalizes the authority — lowercased,
    userinfo stripped, default port stripped (:80 for http, :443 for
    https) — so case-shifted or default-port URL spellings match their
    host's rules instead of failing open (ADVICE r8). A NON-default
    port is kept in the key (robots govern per origin), so a robots
    table keyed by bare hostname only governs default-port URLs; rules
    for ``host:8080`` must be keyed ``host:8080``. Feeding
    pre-canonicalized URLs (:func:`canonical_url`) makes the spelling
    question moot and is the recommended pipeline order."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    rule_re = "^(Allow|Disallow): *(.*)$"
    rules = (
        robots.select(
            "host", F.explode(F.split("robots_txt", "\n")).alias("line")
        )
        .select(
            "host",
            F.regexp_extract("line", rule_re, 1).alias("verb"),
            F.regexp_extract("line", rule_re, 2).alias("prefix"),
        )
        .filter((F.col("verb") != "") & (F.col("prefix") != ""))
    )
    # Wildcard translation, computed once per rule (broadcast side is
    # tiny): strip a trailing '$' (it becomes the regex anchor), escape
    # every regex special EXCEPT '*', then widen '*' to '.*'.
    ends_anchor = F.col("prefix").endswith("$")
    core = F.when(
        ends_anchor, F.expr("substring(prefix, 1, length(prefix) - 1)")
    ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(core, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1")
    rules = rules.select(
        "host",
        "verb",
        "prefix",
        (F.col("prefix").contains("*") | ends_anchor).alias("has_wild"),
        F.concat(
            F.lit("^"),
            F.regexp_replace(esc, r"\*", ".*"),
            F.when(ends_anchor, F.lit("$")).otherwise(F.lit("")),
        ).alias("rx"),
    )
    scheme = F.lower(F.regexp_extract("url", "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # Authority → host key: drop userinfo, lowercase, strip the scheme's
    # default port. Mirrors canonical_url's authority normalization.
    authority = F.lower(
        F.regexp_replace(
            F.regexp_extract("url", "://([^/?#]*)", 1), "^[^/?#@]*@", ""
        )
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    u = urls.select(
        "url",
        host.alias("host"),
        F.regexp_extract("url", "://[^/?#]*([^?#]*)", 1).alias("path"),
    )
    matched = F.when(
        F.col("has_wild"), F.regexp_like(F.col("path"), F.col("rx"))
    ).otherwise(F.col("path").startswith(F.col("prefix")))
    j = u.join(F.broadcast(rules), "host", "left").withColumn(
        "score",
        F.when(
            matched,
            F.length("prefix") * 2 + (F.col("verb") == "Allow").cast("int"),
        ).otherwise(F.lit(-1)),
    )
    # Deterministic winner even when two same-length same-verb rules
    # match: the ordering key is (score, prefix) lexicographic, so ties
    # break on the prefix bytes rather than on aggregation order.
    ordk = F.struct(F.col("score"), F.col("prefix"))
    best = j.groupBy("url", "host", "path").agg(
        F.max("score").alias("best_score"),
        F.max_by("verb", ordk).alias("rule_verb"),
        F.max_by("prefix", ordk).alias("rule_prefix"),
    )
    return best.select(
        "url",
        "host",
        "path",
        F.when(F.col("best_score") < 0, F.lit(True))
        .otherwise(F.col("rule_verb") == "Allow")
        .alias("allowed"),
        F.when(F.col("best_score") >= 0, F.col("rule_verb")).alias("rule_verb"),
        F.when(F.col("best_score") >= 0, F.col("rule_prefix")).alias("rule_prefix"),
    )
