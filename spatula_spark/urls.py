"""URL canonicalization & hashing — 100% native Catalyst expressions.

The reference delegates URL handling to ``scrapelib``/``requests`` and
does no canonicalization beyond lxml's ``make_links_absolute``
(``/root/reference/src/spatula/pages.py:343-344``). A 10^10-URL frontier
needs a real canonicalizer so the seen-set key is stable. Per the north
rule everything here is vectorized; in fact no UDF is needed at all —
``parse_url`` / ``regexp_replace`` / ``array_sort`` / ``xxhash64`` are
all JVM-side, whole-stage-codegen'd expressions.

Rules (conservative, reversible-order-free):
  * trim surrounding whitespace, drop the ``#fragment``
  * lowercase scheme and host
  * drop default ports (``:80`` http, ``:443`` https)
  * collapse duplicate ``//`` in the path, strip a trailing slash
    (except the root path), empty path -> ``/``
  * sort query parameters (``a=1&b=2`` == ``b=2&a=1``); drop empty query

``canonicalize_url_duckdb(expr)`` renders the *same* transformation as
DuckDB SQL so the driver's oracle can verify it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (native exprs only)."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    authority = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, ":(\\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80")) | ((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            query.isNotNull() & (sorted_query != ""),
            F.concat(F.lit("?"), sorted_query),
        ).otherwise(F.lit("")),
    )


def canonicalize_url_duckdb(expr: str) -> str:
    """The same canonicalization rendered as DuckDB SQL over ``expr``.

    Kept in lockstep with :func:`canonicalize_url`; used by
    ``__spark_entry__.oracle_sql`` so DuckDB verifies the transformation
    value-for-value.
    """
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    proto = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    authority = f"regexp_extract({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)"
    host = f"lower(regexp_replace({authority}, ':[0-9]+$', ''))"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    raw_path = f"regexp_extract({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path1 = f"regexp_replace({raw_path}, '/{{2,}}', '/', 'g')"
    path2 = f"regexp_replace({path1}, '(.)/$', '\\1')"
    path = f"(CASE WHEN {path2} = '' THEN '/' ELSE {path2} END)"
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    sorted_query = f"list_aggregate(list_sort(string_split({query}, '&')), 'string_agg', '&')"
    keep_port = (
        f"({port} <> '' AND NOT (({proto} = 'http' AND {port} = '80') "
        f"OR ({proto} = 'https' AND {port} = '443')))"
    )
    return (
        f"({proto} || '://' || {host} "
        f"|| (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) "
        f"|| {path} "
        f"|| (CASE WHEN {query} <> '' THEN '?' || {sorted_query} ELSE '' END))"
    )


def url_hash(canonical_url: Column) -> Column:
    """64-bit seen-set key: native ``xxhash64`` over the canonical URL.

    Internal only (DuckDB can't reproduce xxhash64); oracle-facing
    queries use :func:`portable_hash64`.
    """
    return F.xxhash64(canonical_url)


def host_of(url: Column) -> Column:
    """Politeness partition key (lowercased host, native ``parse_url``)."""
    return F.lower(F.parse_url(F.trim(url), F.lit("HOST")))


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash computable identically in Spark & DuckDB.

    Spark: ``conv(substr(md5(s),1,15),16,10)`` cast to long. DuckDB
    mirror: ``('0x' || substr(md5(s),1,15))::ubigint``. 15 hex digits =
    60 bits, always < 2^63 so the long cast is exact.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_duckdb(expr: str) -> str:
    """DuckDB rendering of :func:`portable_hash64`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::ubigint)::bigint"


def surt_key(url: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform) — the CDX
    index sort key used by web-archive tooling (OpenWayback/pywb):
    ``com,example)/path?a=1`` for ``http://www.Example.com/path?a=1``.

    Builds on :func:`canonicalize_url` (sorted query, default ports
    dropped, lowercased host), then lowercases the WHOLE key (pywb's
    canonicalizer semantics), strips one leading ``www.`` label, and
    reverses the host labels comma-joined so hosts sort hierarchically
    — which is exactly what makes a 100-TB CDX range-scannable by
    domain prefix. Native Catalyst expressions only; mirrored
    value-for-value by :func:`surt_key_duckdb`."""
    c = F.lower(canonicalize_url(url))
    authority = F.regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_replace(authority, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    rest = F.regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1)
    return F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        rest,
    )


def surt_key_duckdb(expr: str) -> str:
    """DuckDB rendering of :func:`surt_key` (kept in lockstep)."""
    c = f"lower({canonicalize_url_duckdb(expr)})"
    authority = f"regexp_extract({c}, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)"
    host = f"regexp_replace(regexp_replace({authority}, ':[0-9]+$', ''), '^www\\.', '')"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    rest = f"regexp_extract({c}, '^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$', 1)"
    return (
        f"({rev} || (CASE WHEN {port} <> '' THEN ':' || {port} ELSE '' END)"
        f" || ')' || {rest})"
    )


def url_templates(
    df, url_col: str = "url", host_col: str = "host", threshold: int = 50
):
    """URL-template mining: generalize paths by masking digit runs to
    '{n}' and count DISTINCT urls per (host, template) — the
    crawl-budget analysis that finds unbounded URL spaces
    (/cal/{n}/{n}, /product/{n}?page={n}) before the frontier drowns
    in them. Complements operators/politeness.trap_hosts: that flags
    hosts by growth-vs-diversity across waves; this attributes the
    blowup to the specific URL SHAPE, host by host, in one pass over
    the frontier log. A flagged template feeds the same budget/deny
    machinery.

    One count-distinct aggregate keyed by (host, template) — map-side
    combinable, vocabulary-sized output (templates are few by
    construction), no join. The digit-masking regex is RE2/Java
    common subset, so the DuckDB oracle evaluates the identical
    pattern."""
    from pyspark.sql import functions as F

    tpl = F.regexp_replace(F.col(url_col), "[0-9]+", "{n}")
    out = (
        df.select(F.col(host_col).alias("host"), tpl.alias("template"),
                  F.col(url_col).alias("u"))
        .groupBy("host", "template")
        .agg(F.countDistinct("u").alias("n_urls"))
    )
    return out.select(
        "host", "template", "n_urls",
        (F.col("n_urls") >= threshold).alias("flagged"),
    )
