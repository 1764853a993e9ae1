"""URL operators (engine/urlops.py): RFC 3986 parsing, normalization,
registered domain, SURT keys, canonical dedup — hand fixtures + DuckDB
expression-twin parity on the pages fixture."""

import os
import sys

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import urlops  # noqa: E402
from engine.fixtures import make_pages  # noqa: E402

URLS = [
    "https://www.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
    "http://example.com:8080/path/",
    "https://sub.shop.co.uk/item?id=9",
    "http://example.com",
    "https://example.com/?fbclid=abc",
    "ftp://Files.example.org:21/pub/",
    "https://example.com/a//b?z=1&y=2&utm_medium=m",
    "http://user:pw@host.example.net:80/x",
]


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({"url": URLS}))


def test_url_parts(spark):
    got = (
        _df(spark)
        .select("url", urlops.url_parts(F.col("url")).alias("p"))
        .toPandas()
        .set_index("url")
    )
    p = got.loc[URLS[0], "p"]
    assert p["scheme"] == "https" and p["host"] == "www.example.com"
    assert p["port"] == "443" and p["path"] == "/a/b/"
    assert p["query"] == "utm_source=x&b=2&a=1" and p["fragment"] == "frag"
    p = got.loc[URLS[7], "p"]
    assert p["host"] == "host.example.net" and p["port"] == "80"
    assert got.loc[URLS[3], "p"]["path"] == ""


def test_url_normalize_rules(spark):
    got = dict(
        _df(spark)
        .select("url", urlops.url_normalize(F.col("url")).alias("n"))
        .collect()
    )
    # lowercase, www/default-port/fragment stripped, params sorted, utm_ gone
    assert got[URLS[0]] == "https://example.com/a/b?a=1&b=2"
    # non-default port kept, trailing slash stripped
    assert got[URLS[1]] == "http://example.com:8080/path"
    # empty path -> '/'
    assert got[URLS[3]] == "http://example.com/"
    # tracking-only query vanishes, root path keeps its '/'
    assert got[URLS[4]] == "https://example.com/"
    assert got[URLS[5]] == "ftp://files.example.org/pub"
    assert got[URLS[6]] == "https://example.com/a//b?y=2&z=1"
    # default port 80 stripped even with userinfo
    assert got[URLS[7]] == "http://host.example.net/x"


def test_registered_domain(spark):
    hosts = ["www.example.com", "sub.shop.co.uk", "a.b.c.example.org",
             "example.com", "localhost", "x.com.au"]
    df = spark.createDataFrame(pd.DataFrame({"h": hosts}))
    got = dict(
        df.select("h", urlops.registered_domain(F.col("h")).alias("d")).collect()
    )
    assert got["www.example.com"] == "example.com"
    assert got["sub.shop.co.uk"] == "shop.co.uk"
    assert got["a.b.c.example.org"] == "example.org"
    assert got["example.com"] == "example.com"
    assert got["localhost"] == "localhost"
    assert got["x.com.au"] == "x.com.au"


def test_surt_key(spark):
    got = dict(
        _df(spark).select("url", urlops.surt_key(F.col("url")).alias("s")).collect()
    )
    assert got[URLS[0]] == "com,example)/a/b?a=1&b=2"
    assert got[URLS[2]] == "uk,co,shop,sub)/item?id=9"
    # site pages sort contiguously
    assert got[URLS[3]].startswith("com,example)")


def test_duckdb_twin_parity(spark):
    pages = make_pages(n=400)[["url", "warc_ts"]]
    extra = pd.DataFrame({"url": URLS, "warc_ts": pd.Timestamp("2024-06-01", tz="UTC")})
    pdf = pd.concat([pages, extra], ignore_index=True)
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            "url",
            urlops.url_normalize(F.col("url")).alias("norm"),
            urlops.registered_domain(urlops.url_host(F.col("url"))).alias("dom"),
            urlops.surt_key(F.col("url")).alias("surt"),
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pages", pdf)
    host = urlops.url_parts_sql("url")["host"]
    exp = con.execute(
        f"""SELECT url, {urlops.url_normalize_sql('url')} AS norm,
                   {urlops.registered_domain_sql(host)} AS dom,
                   {urlops.surt_key_sql('url')} AS surt
            FROM pages ORDER BY url"""
    ).df().reset_index(drop=True)
    for c in ("norm", "dom", "surt"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_dedup_by_url(spark):
    rows = pd.DataFrame(
        {
            "url": [
                "https://www.example.com/a?utm_source=x",
                "https://example.com/a",       # same canonical, later ts
                "https://example.com/a/",      # same canonical, earliest ts
                "https://example.com/b",
            ],
            "warc_ts": pd.to_datetime(
                ["2024-01-02", "2024-01-03", "2024-01-01", "2024-01-01"], utc=True
            ),
            "text": ["t1", "t2", "t3", "t4"],
        }
    )
    df = spark.createDataFrame(rows)
    got = urlops.dedup_by_url(df).toPandas().set_index("canonical_url").sort_index()
    assert len(got) == 2
    assert got.loc["https://example.com/a", "text"] == "t3"  # earliest wins
    assert got.loc["https://example.com/b", "text"] == "t4"
    # deterministic under repartition
    again = (
        urlops.dedup_by_url(df.repartition(8))
        .toPandas()
        .set_index("canonical_url")
        .sort_index()
    )
    assert (again["text"].to_numpy() == got["text"].to_numpy()).all()
    # empty probe
    assert urlops.dedup_by_url(df.limit(0)).count() == 0
