"""URL operators for the web-page table (url, warc_ts, html, text, lang):
RFC 3986 parsing, canonical normalization, registered-domain extraction,
Common-Crawl-style SURT keys, and canonical-URL dedup.

All pure Catalyst (regexp_extract / split / sort / join — no Python), with
DuckDB SQL twins for every operator so results are oracle-checkable.  The
parse regex is the RFC 3986 Appendix B reference pattern (public standard);
SURT is the public web-archive sort-friendly URI format ("com,example)/p").

Scale notes (100 TB): every operator here is a projection — no shuffle.
`dedup_by_url` adds exactly one shuffle keyed by the canonical URL; hot
canonical keys (a viral page crawled millions of times) are bounded by the
min-struct aggregation (map-side combine reduces each partition's copies
to one row before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RFC 3986 Appendix B groups: 2=scheme 4=authority 5=path 7=query 9=fragment
_RFC3986 = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?$"
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
# tracking params stripped by normalization (the common public set)
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=.*)?$"
# multi-label public suffixes (approximate PSL subset, documented deviation:
# the full Mozilla list is data the runtime does not ship; these cover the
# common ccTLD second-level registries)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.ar", "com.tr", "co.kr",
)


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _RFC3986, 2))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, _RFC3986, 4)


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    a = _authority(url)
    return F.lower(
        F.regexp_extract(F.regexp_replace(a, r"^[^@]*@", ""), r"^([^:]*)", 1)
    )


def url_port(url: Column) -> Column:
    """Explicit port string ('' when absent)."""
    a = F.regexp_replace(_authority(url), r"^[^@]*@", "")
    return F.regexp_extract(a, r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _RFC3986, 5)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _RFC3986, 7)


def url_fragment(url: Column) -> Column:
    return F.regexp_extract(url, _RFC3986, 9)


def url_parts(url: Column) -> Column:
    """struct(scheme, host, port, path, query, fragment)."""
    return F.struct(
        url_scheme(url).alias("scheme"),
        url_host(url).alias("host"),
        url_port(url).alias("port"),
        url_path(url).alias("path"),
        url_query(url).alias("query"),
        url_fragment(url).alias("fragment"),
    )


def _norm_query(q: Column) -> Column:
    """Sorted query params with tracking params removed ('' if none left)."""
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(url: Column) -> Column:
    """Canonical URL for dedup: lowercase scheme+host, strip 'www.', strip
    default port, drop fragment, drop tracking params, sort the rest, drop
    a single trailing '/' on non-root paths, '' path -> '/'.

    Deterministic rewrite rules (the exact rule set is this engine's
    contract; web-archive canonicalizers vary in the details)."""
    scheme = url_scheme(url)
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    port = url_port(url)
    keep_port = (port != F.lit("")) & ~F.array_contains(
        F.array(*[
            F.when(scheme == s, F.lit(p)).otherwise(F.lit(""))
            for s, p in _DEFAULT_PORTS.items()
        ]),
        port,
    )
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    q = _norm_query(url_query(url))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain: last two labels, or last three when the final
    two form a known multi-label public suffix (approximate PSL subset)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_multi = F.array_contains(
        F.array(*[F.lit(s) for s in MULTI_SUFFIXES]), last2
    )
    return F.when(n <= 2, F.array_join(labels, ".")).otherwise(
        F.when(is_multi & (n >= 3), last3).otherwise(last2)
    )


def surt_key(url: Column) -> Column:
    """Sort-friendly URI key (web-archive SURT): reversed host labels
    comma-joined + ')' + normalized path/query — groups a site's pages
    contiguously under any ordered partitioning (Iceberg/parquet sort keys).
    Built on the normalized URL (www stripped, params sorted)."""
    norm = url_normalize(url)
    host = url_host(norm)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = url_path(norm)
    q = url_query(norm)
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def dedup_by_url(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Keep ONE row per canonical URL: the earliest ts, ties broken by the
    raw url string (deterministic at any parallelism).  One shuffle keyed
    by the canonical URL; min-struct aggregation map-side combines, so a
    hot key contributes one row per partition to the shuffle."""
    keyed = df.withColumn("_canon", url_normalize(F.col(url_col)))
    others = [c for c in df.columns]
    packed = keyed.select(
        "_canon",
        F.struct(F.col(ts_col), F.col(url_col), *[F.col(c) for c in others if c not in (ts_col, url_col)]).alias("_row"),
    )
    out = packed.groupBy("_canon").agg(F.min("_row").alias("_row"))
    return out.select(
        F.col("_canon").alias("canonical_url"), F.col("_row.*")
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_RFC3986_SQL = _RFC3986.replace("'", "''")


def url_parts_sql(col: str) -> dict[str, str]:
    """DuckDB expressions mirroring url_parts, keyed by field name."""
    auth = f"regexp_extract({col}, '{_RFC3986_SQL}', 4)"
    no_user = f"regexp_replace({auth}, '^[^@]*@', '')"
    return {
        "scheme": f"lower(regexp_extract({col}, '{_RFC3986_SQL}', 2))",
        "host": f"lower(regexp_extract({no_user}, '^([^:]*)', 1))",
        "port": f"regexp_extract({no_user}, ':(\\d+)$', 1)",
        "path": f"regexp_extract({col}, '{_RFC3986_SQL}', 5)",
        "query": f"regexp_extract({col}, '{_RFC3986_SQL}', 7)",
        "fragment": f"regexp_extract({col}, '{_RFC3986_SQL}', 9)",
    }


def url_normalize_sql(col: str) -> str:
    """DuckDB expression twin of url_normalize."""
    p = url_parts_sql(col)
    scheme = p["scheme"]
    host = f"regexp_replace({p['host']}, '^www\\.', '')"
    port = p["port"]
    default_port = (
        "CASE " + " ".join(
            f"WHEN {scheme} = '{s}' THEN '{d}'" for s, d in _DEFAULT_PORTS.items()
        ) + " ELSE '' END"
    )
    path0 = f"(CASE WHEN {p['path']} = '' THEN '/' ELSE {p['path']} END)"
    path = (
        f"(CASE WHEN {path0} <> '/' AND {path0} LIKE '%/' "
        f"THEN substring({path0}, 1, length({path0}) - 1) ELSE {path0} END)"
    )
    kept = (
        f"list_filter(string_split({p['query']}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE}'))"
    )
    q = f"array_to_string(list_sort({kept}), '&')"
    return (
        f"({scheme} || '://' || {host} || "
        f"(CASE WHEN {port} <> '' AND {port} <> {default_port} "
        f"THEN ':' || {port} ELSE '' END) || {path} || "
        f"(CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END))"
    )


def registered_domain_sql(host: str) -> str:
    """DuckDB expression twin of registered_domain."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    labels = f"string_split({host}, '.')"
    return f"""(
        CASE WHEN len({labels}) <= 2 THEN {host}
             WHEN array_to_string({labels}[-2:], '.') IN ({suffixes})
                  AND len({labels}) >= 3
             THEN array_to_string({labels}[-3:], '.')
             ELSE array_to_string({labels}[-2:], '.') END
    )"""


def surt_key_sql(col: str) -> str:
    """DuckDB expression twin of surt_key."""
    norm = url_normalize_sql(col)
    p = url_parts_sql(f"({norm})")
    rev = f"array_to_string(list_reverse(string_split({p['host']}, '.')), ',')"
    return (
        f"({rev} || ')' || {p['path']} || "
        f"(CASE WHEN {p['query']} <> '' THEN '?' || {p['query']} ELSE '' END))"
    )
