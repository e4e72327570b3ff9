"""URL parsing expressions for the web-page data model.

The north-star input is url-keyed (BASELINE.json input_hint), so
host/path/query extraction is a first-class need (host-level dedup,
per-site stats, crawl budgeting). Patterns live in shared constants and
are confined to the Java-regex ∩ RE2 subset, so the Spark expressions
and the DuckDB oracle parse identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/?#]+)"
URL_PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)"
URL_QUERY_RE = r"\?([^#]*)"


def url_host(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URL_HOST_RE, 1)


def url_path(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URL_PATH_RE, 1)


def url_query(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URL_QUERY_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last two labels of the host ('a.b.example.com' -> 'example.com').
    A real deployment would consult the public-suffix list (data file,
    broadcast join); the two-label fallback is the documented
    approximation."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def path_depth(path: Column) -> Column:
    """Number of non-empty '/'-separated segments, as BIGINT."""
    return F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast("long")


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL for exact-dup collapsing at crawl scale:
    lowercase host, default port (:80/:443) stripped, fragment dropped
    (the part regexes never capture past '#'), tracking params (utm_*)
    removed, remaining query params sorted, empty path -> '/'.

    Pure JVM string/array expressions — runs on the scan, map-side, no
    shuffle of its own; the scheme is assumed lowercase (the shared
    regex constants require it, and crawlers store normalized schemes).
    Mirrors the per-record URL normalization the reference applies to
    review ids before dedup (utils/data_quality.py duplicate keying),
    lifted to the web-page url key of the north-star input."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_replace(F.lower(url_host(c)), ":(443|80)$", "")
    raw_path = url_path(c)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    params = F.array_sort(
        F.filter(
            F.split(url_query(c), "&"),
            lambda s: (s != "") & ~s.startswith("utm_"),
        )
    )
    q = F.array_join(params, "&")
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def sql_url_exprs(col: str) -> dict[str, str]:
    """DuckDB twins built from the same regex constants."""
    host = f"regexp_extract({col}, '{URL_HOST_RE}', 1)"
    path = f"regexp_extract({col}, '{URL_PATH_RE}', 1)"
    return {
        "host": host,
        "path": path,
        "query": f"regexp_extract({col}, '{URL_QUERY_RE}', 1)",
        "registered_domain": (
            f"(CASE WHEN len(string_split({host}, '.')) <= 2 THEN {host} "
            f"ELSE string_split({host}, '.')[-2] || '.' || string_split({host}, '.')[-1] END)"
        ),
        "path_depth": f"len(list_filter(string_split({path}, '/'), s -> s != ''))",
        "canonical": _sql_canonical(host, path, f"regexp_extract({col}, '{URL_QUERY_RE}', 1)"),
    }


def _sql_canonical(host: str, path: str, query: str) -> str:
    """DuckDB twin of canonical_url, built from the same part exprs."""
    chost = f"regexp_replace(lower({host}), ':(443|80)$', '')"
    cpath = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    cq = (
        "array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        "s -> s != '' AND NOT s LIKE 'utm_%')), '&')"
    )
    return (
        f"('https://' || {chost} || {cpath} || "
        f"(CASE WHEN {cq} = '' THEN '' ELSE '?' || {cq} END))"
    )
