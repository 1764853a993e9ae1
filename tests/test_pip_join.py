"""Minimum end-to-end slice (SURVEY.md §7 P3/P4): pages → geotag →
tile-assign → point-in-polygon join, verified row-exact against the
single-process oracle; broadcast and shuffle plans must emit identical rows;
salting must not change results."""

import numpy as np
import pandas as pd
import pytest

from engine import geom, joins, oracle
from engine.fixtures import make_gazetteer, make_pages, make_polygons, subdivide_polygons
from engine.geotag import geotag_all, geotag_first


@pytest.fixture(scope="module")
def data(spark):
    gaz = make_gazetteer(n=400, n_countries=50)
    pages = make_pages(n=800, gazetteer=gaz, seed=10)
    polys = make_polygons(n=80)
    return {
        "gaz_pdf": gaz,
        "pages_pdf": pages,
        "polys_pdf": polys,
        "pages": spark.createDataFrame(pages),
        "gaz": spark.createDataFrame(gaz),
        "polys": spark.createDataFrame(polys),
    }


def _oracle_points(data):
    """Single-process geotag: every (url, place) pair via token scan."""
    gaz = {r.name: (r.lon, r.lat) for r in data["gaz_pdf"].itertuples()}
    out = []
    for r in data["pages_pdf"].itertuples():
        for tok in r.text.split(" "):
            if tok in gaz:
                out.append((r.url, tok, *gaz[tok]))
    return out


def test_geotag_matches_oracle(spark, data):
    got = sorted(
        (r.url, r.name, r.lon, r.lat)
        for r in geotag_all(data["pages"], data["gaz"]).collect()
    )
    assert got == sorted(_oracle_points(data))


def test_geotag_first_is_first_by_position(spark, data):
    rows = geotag_first(data["pages"], data["gaz"]).collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls))  # exactly one row per geotagged page
    # first token by position in the text
    gaz = set(data["gaz_pdf"]["name"])
    expect = {}
    for r in data["pages_pdf"].itertuples():
        for tok in r.text.split(" "):
            if tok in gaz:
                expect[r.url] = tok
                break
    got = {r.url: r.name for r in rows}
    assert got == expect


def _polys_rings(polys_pdf):
    out = []
    for r in polys_pdf.itertuples():
        rings = [rg.tolist() for rg in geom.polygon_rings(r.geom_wkb)]
        out.append((r.polygon_id, rings))
    return out


def test_pip_broadcast_matches_oracle(spark, data):
    tagged = geotag_first(data["pages"], data["gaz"])
    got = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_broadcast(tagged, data["polys_pdf"]).collect()
    )
    pts = [(r.url, r.lon, r.lat) for r in tagged.collect()]
    expect = oracle.pip_join_oracle(pts, _polys_rings(data["polys_pdf"]))
    assert got == expect
    assert len(got) > 0


@pytest.mark.parametrize("n_salt", [None, 4])
def test_pip_shuffle_matches_broadcast(spark, data, n_salt):
    tagged = geotag_first(data["pages"], data["gaz"])
    bc = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_broadcast(tagged, data["polys_pdf"]).collect()
    )
    sh = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_shuffle(tagged, data["polys"], zoom=6, n_salt=n_salt).collect()
    )
    assert sh == bc


def test_pip_large_subdivided_layer_parity(spark, data):
    """polys-large (subdivided) must produce the same matched pairs as the
    coarse layer matched by name (same covered area, finer pieces)."""
    tagged = geotag_first(data["pages"], data["gaz"]).cache()
    large_pdf = subdivide_polygons(data["polys_pdf"], factor=3)
    large = spark.createDataFrame(large_pdf)
    got = joins.pip_join_shuffle(tagged, large, zoom=6, keep_cols=("url",))
    # map subdivided pid → name, compare (url, name) sets vs broadcast on coarse
    name_of = dict(zip(large_pdf["polygon_id"], large_pdf["name"]))
    got_pairs = {(r.url, name_of[r.polygon_id]) for r in got.collect()}
    coarse_name = dict(zip(data["polys_pdf"]["polygon_id"], data["polys_pdf"]["name"]))
    bc_pairs = {
        (r.url, coarse_name[r.polygon_id])
        for r in joins.pip_join_broadcast(tagged, data["polys_pdf"]).collect()
    }
    # subdivision introduces interior shared edges: a point on such an edge
    # matches ≥1 subcell of the same parent, and may also match its parent's
    # neighbor only if it was on the coarse boundary too → name-sets equal
    assert got_pairs == bc_pairs


def test_with_tile_matches_oracle(spark, data):
    merc = oracle.GlobalMercatorOracle()
    tagged = geotag_first(data["pages"], data["gaz"])
    out = joins.with_tile(tagged, zoom=8).collect()
    assert len(out) > 0
    for r in out:
        otx, oty = merc.lonlat_to_tile(r.lon, r.lat, 8)
        assert (r.tx, r.ty) == (otx, oty)
        assert r.quadkey == merc.quad_tree(otx, oty, 8)


def test_adaptive_split_parity(spark, data):
    """Adaptive cell-resolution splitting (hot cells re-encoded at zoom+2 on
    both sides) must emit exactly the plain shuffle join's rows."""
    tagged = geotag_first(data["pages"], data["gaz"])
    plain = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_shuffle(tagged, data["polys"], zoom=5).collect()
    )
    # threshold low enough that several cells split
    adaptive = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_shuffle_adaptive(
            tagged, data["polys"], zoom=5, hot_threshold=10, split_levels=2
        ).collect()
    )
    assert adaptive == plain and len(plain) > 0
    # threshold high: falls back to the plain path, still identical
    none_hot = sorted(
        (r.url, r.polygon_id)
        for r in joins.pip_join_shuffle_adaptive(
            tagged, data["polys"], zoom=5, hot_threshold=10**9
        ).collect()
    )
    assert none_hot == plain


def test_hot_cell_skew_fixture(spark):
    """pages_hot: 50% of geotags in one cell; salted shuffle still exact."""
    gaz = make_gazetteer(n=200, n_countries=20)
    pages = make_pages(n=600, gazetteer=gaz, seed=20, hot_cell_frac=0.5)
    polys_pdf = make_polygons(n=40)
    sdf_pages = spark.createDataFrame(pages)
    sdf_gaz = spark.createDataFrame(gaz)
    sdf_polys = spark.createDataFrame(polys_pdf)
    tagged = geotag_all(sdf_pages, sdf_gaz).withColumnRenamed("name", "place")
    bc = sorted(
        (r.url, r.place, r.polygon_id)
        for r in joins.pip_join_broadcast(tagged, polys_pdf, keep_cols=("url", "place")).collect()
    )
    sh = sorted(
        (r.url, r.place, r.polygon_id)
        for r in joins.pip_join_shuffle(
            tagged, sdf_polys, zoom=6, keep_cols=("url", "place"), n_salt=8
        ).collect()
    )
    assert sh == bc and len(bc) > 0


def test_knn_broadcast_matches_rings(spark):
    """Both kNN physical plans emit identical rows."""
    import pandas as pd

    from engine import joins
    from pyspark.sql import functions as F

    rng = np.random.default_rng(14)
    pts = spark.createDataFrame(
        pd.DataFrame({"name": [f"p{i}" for i in range(3000)],
                      "lon": rng.uniform(-170, 170, 3000),
                      "lat": rng.uniform(-75, 75, 3000)})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"qid": list(range(40)),
                      "lon": rng.uniform(-170, 170, 40),
                      "lat": rng.uniform(-75, 75, 40)})
    )
    a = joins.knn_join(qs, pts, k=5, zoom=4, max_ring=8, strategy="rings").collect()
    b = joins.knn_join(qs, pts, k=5, strategy="broadcast").collect()
    ka = sorted((r.qid, r.rank, r.neighbor, round(r.dist, 9)) for r in a)
    kb = sorted((r.qid, r.rank, r.neighbor, round(r.dist, 9)) for r in b)
    assert ka == kb


def test_geocode_reverse_matches_oracle(spark, data):
    """geocode_reverse (OGRGeocodeReverse analog): every query resolves to
    the brute-force nearest gazetteer place, ties broken by name; repeated
    runs are identical (the cache-table determinism contract)."""
    import numpy as np

    from engine.geotag import geocode_reverse

    rng = np.random.default_rng(7)
    qs = [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(-179, 179, 40), rng.uniform(-80, 80, 40)))]
    queries = spark.createDataFrame(qs, "qid long, lon double, lat double")
    got = {r.qid: (r.name, r.dist, r.country_id)
           for r in geocode_reverse(queries, data["gaz"]).collect()}
    gaz = data["gaz_pdf"]
    glon = gaz["lon"].to_numpy(float)
    glat = gaz["lat"].to_numpy(float)
    gname = gaz["name"].to_numpy()
    gcountry = gaz["country_id"].to_numpy()
    for qid, lon, lat in qs:
        d = np.sqrt((glon - lon) ** 2 + (glat - lat) ** 2)
        order = np.lexsort((gname, d))
        i = order[0]
        assert got[qid][0] == gname[i], qid
        assert abs(got[qid][1] - d[i]) < 1e-12
        assert got[qid][2] == gcountry[i]
    again = {r.qid: r.name for r in geocode_reverse(queries, data["gaz"]).collect()}
    assert again == {q: v[0] for q, v in got.items()}
