"""Vector-layer operators vs oracle: spatial filters, extent, semi/anti,
dissolve, area, splitlistfields + test_ogrsf-style invariants
(apps/test_ogrsf.cpp:608,1140,1914)."""

import numpy as np
import pytest

from engine import geom, vector
from engine.fixtures import make_gazetteer, make_pages, make_polygons
from engine.geotag import geotag_first
from engine.oracle import point_in_polygon


@pytest.fixture(scope="module")
def tagged(spark):
    gaz = make_gazetteer(n=300, n_countries=30)
    pages = make_pages(n=700, gazetteer=gaz, seed=77)
    return geotag_first(spark.createDataFrame(pages), spark.createDataFrame(gaz)).cache()


def test_spatial_filter_rect_invariants(spark, tagged):
    total = tagged.count()
    # covering rect returns all rows; disjoint rect returns none (test_ogrsf.cpp:1140)
    assert vector.spatial_filter_rect(tagged, -180, -90, 180, 90).count() == total
    assert vector.spatial_filter_rect(tagged, 200, 91, 300, 95).count() == 0
    # count(scan) == count(agg) under a filter (test_ogrsf.cpp:608)
    f = vector.spatial_filter_rect(tagged, -40, -40, 40, 40)
    rows = f.collect()
    assert len(rows) == f.count()
    for r in rows:
        assert -40 <= r.lon <= 40 and -40 <= r.lat <= 40


def test_spatial_filter_geom_matches_oracle(spark, tagged):
    wkb = geom.wkb_polygon([[(-60, -30), (50, -30), (50, 45), (-60, 45), (-60, 40), (0, 40), (0, -20), (-60, -20)]])
    got = {r.url for r in vector.spatial_filter_geom(tagged, wkb).collect()}
    rings = [r.tolist() for r in geom.polygon_rings(wkb)]
    expect = {
        r.url for r in tagged.collect() if point_in_polygon(r.lon, r.lat, rings)
    }
    assert got == expect


def test_layer_extent_consistency(spark, tagged):
    # extents from manifest == agg over rows (test_ogrsf.cpp:1914)
    ext = vector.layer_extent(tagged).collect()[0]
    rows = tagged.collect()
    assert ext.feature_count == len(rows)
    assert ext.minx == min(r.lon for r in rows)
    assert ext.maxy == max(r.lat for r in rows)


def test_semi_anti_partition(spark, tagged):
    polys = make_polygons(n=40)
    # semi ∪ anti == all, semi ∩ anti == ∅
    semi = {r.url for r in vector.pip_semi_join(tagged, polys).collect()}
    anti = {r.url for r in vector.pip_anti_join(tagged, polys).collect()}
    allu = {r.url for r in tagged.collect()}
    assert semi | anti == allu
    assert not (semi & anti)


def test_dissolve_area_and_parts(spark):
    polys = make_polygons(n=40)
    sdf = spark.createDataFrame(polys)
    from pyspark.sql import functions as F

    grouped = vector.dissolve(sdf.withColumn("grp", (F.col("polygon_id") % 5).cast("int")), "grp")
    rows = grouped.collect()
    assert sum(r.n_parts for r in rows) >= len(polys)  # multipolys may split
    # area additivity: group areas sum to total area of all members
    total = sum(vector.shoelace_area_py(w) for w in polys["geom_wkb"])
    assert sum(r.area for r in rows) == pytest.approx(total, rel=1e-12)
    # merged WKB re-parses and contains all member rings
    for r in rows:
        kind, body = geom.wkb_loads(bytes(r.geom_wkb))
        assert kind == "MultiPolygon" and len(body) == r.n_parts


def test_st_area_shoelace():
    sq = geom.wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4)]])
    assert vector.shoelace_area_py(sq) == 16.0
    holed = geom.wkb_polygon(
        [[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (4, 2), (4, 4), (2, 4)]]
    )
    assert vector.shoelace_area_py(holed) == 100.0 - 4.0


def test_split_list_fields(spark):
    df = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [40])], "id int, vals array<int>"
    )
    out = vector.split_list_fields(df, ["vals"], max_elems=3)
    rows = {r.id: (r.vals1, r.vals2, r.vals3) for r in out.collect()}
    assert rows[1] == (10, 20, 30)
    assert rows[2] == (40, None, None)


def test_dissolve_union_overlapping(spark):
    import pandas as pd

    from engine import geom, vector

    def rect(x0, y0, x1, y1):
        return geom.wkb_polygon([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]])

    # group 0: two 10x10 squares overlapping in a 5x10 strip -> union 150
    # group 1: three stacked rects A=[0,20]x[0,10], B=[10,30]x[0,10],
    #          C=[5,25]x[5,15]: union = 200+100+? inclusion-exclusion:
    #          |A|=200 |B|=200 |C|=200; A∩B=100 A∩C=75 B∩C=75 A∩B∩C=50
    #          union = 600-250+50 = 400
    pdf = pd.DataFrame(
        {
            "grp": pd.array([0, 0, 1, 1, 1], dtype="int32"),
            "geom_wkb": [
                rect(0, 0, 10, 10), rect(5, 0, 15, 10),
                rect(0, 0, 20, 10), rect(10, 0, 30, 10), rect(5, 5, 25, 15),
            ],
        }
    )
    out = {r.grp: r for r in vector.dissolve_union(spark.createDataFrame(pdf), "grp").collect()}
    assert abs(out[0].area - 150.0) < 1e-9
    assert abs(out[1].area - 400.0) < 1e-9
    assert out[0].n_members == 2 and out[1].n_members == 3
    # piece membership equals union membership at sample points
    import numpy as np

    from engine import clip as clipmod

    kind, body = geom.wkb_loads(out[0].geom_wkb)
    pieces = [np.asarray(rings[0])[:-1] for _, rings in body]
    rng = np.random.default_rng(3)
    px = rng.uniform(-2, 17, 2000)
    py = rng.uniform(-2, 12, 2000)
    in_pieces = clipmod.pieces_contain(pieces, px, py)
    truth = ((px >= 0) & (px <= 10) | (px >= 5) & (px <= 15)) & (py >= 0) & (py <= 10)
    assert (in_pieces != truth).mean() < 0.005


def test_asof_join_directions_and_ties(spark):
    import pandas as pd

    from engine import joins

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3],
                "t": pd.to_datetime(
                    ["2020-01-05", "2020-01-10", "2020-01-01", "2020-01-05", "2020-01-05"]
                ),
                "lid": [10, 11, 12, 20, 30],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "t": pd.to_datetime(["2020-01-03", "2020-01-05", "2020-01-07"]),
                "v": [100, 105, 207],
            }
        )
    )
    back = {r.lid: r.v for r in joins.asof_join(left, right).collect()}
    # lid 10 at 01-05: tie with right 01-05 → inclusive → 105
    assert back == {10: 105, 11: 105, 12: None, 20: None, 30: None}
    fwd = {r.lid: r.v for r in joins.asof_join(left, right, direction="forward").collect()}
    # forward: smallest right t >= left t
    assert fwd == {10: 105, 11: None, 12: 100, 20: 207, 30: None}


# ------------------------------------------------------------- graticule

def _float_range(*args):
    """Transcription of mkgraticule.py:42-61 float_range semantics."""
    start, step = 0.0, 1.0
    if len(args) == 1:
        (stop,) = args
    elif len(args) == 2:
        start, stop = args
    else:
        start, stop, step = args
    steps = (stop - start) / step
    if steps != int(steps):
        steps = steps + 1.0
    return [i * step + start for i in range(int(steps))]


def test_graticule_unconnected_matches_reference_loops(spark):
    from engine.vector import graticule

    xmin, ymin, xmax, ymax, step, substep = -30.0, -10.0, 30.0, 20.0, 10.0, 5.0
    got = graticule(spark, xmin, ymin, xmax, ymax, step, substep).toPandas()
    exp = set()
    for lat in _float_range(ymin, ymax + step / 2, step):
        for lon in _float_range(xmin, xmax - substep / 2, substep):
            exp.add(("lat", lon, lat, lon + substep, lat))
    for lon in _float_range(xmin, xmax + step / 2, step):
        for lat in _float_range(ymin, ymax - substep / 2, substep):
            exp.add(("lon", lon, lat, lon, lat + substep))
    gotset = set(map(tuple, got[["kind", "x0", "y0", "x1", "y1"]].itertuples(index=False)))
    assert gotset == exp
    assert len(got) == len(exp)


def test_graticule_connected_and_substep_clamp(spark):
    from engine.vector import graticule

    got = graticule(spark, -20, -10, 20, 10, step=10.0, substep=20.0, connected=True).toPandas()
    # substep clamps to step (reference: substepsize = stepsize)
    lats = _float_range(-10, 10 + 5.0, 10.0)
    lons = _float_range(-20, 20 + 5.0, 10.0)
    lat_rows = got[got.kind == "lat"].sort_values("c")
    assert lat_rows.c.tolist() == lats
    for _, row in lat_rows.iterrows():
        assert [p["x"] for p in row.points] == _float_range(-20, 20 + 5.0, 10.0)
        assert all(p["y"] == row.c for p in row.points)
    lon_rows = got[got.kind == "lon"].sort_values("c")
    assert lon_rows.c.tolist() == lons


def test_graticule_transform_drops_nonfinite(spark):
    from engine.srs import LCCTransformer
    from engine.vector import graticule

    tr = LCCTransformer(33.0, 45.0, 23.0, -96.0)  # CONUS Lambert
    plain = graticule(spark, -120, 20, -70, 50, 10.0, 10.0).toPandas()
    proj = graticule(spark, -120, 20, -70, 50, 10.0, 10.0,
                     transform_fn=tr.forward).toPandas()
    assert len(proj) == len(plain)  # all finite in this window
    # spot-check one vertex against the transformer directly
    row = proj.iloc[0]
    praw = plain.iloc[0]
    x, y = tr.forward(np.array([praw.x0]), np.array([praw.y0]))
    assert row.x0 == pytest.approx(x[0], abs=1e-9)
    assert row.y0 == pytest.approx(y[0], abs=1e-9)
