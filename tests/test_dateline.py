"""Antimeridian splitting (engine/dateline.py — WRAPDATELINE analog,
ogr/ogrgeometryfactory.cpp:2436): interval/line/polygon splits, tile
coverage across the seam, and the join-equivalence invariant (a crossing
geometry joins/tiles identically to its pre-split halves)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from engine import dateline, geom, tiles


def test_wrap_lon():
    out = dateline.wrap_lon([-540.0 + 1e-9, -180.0, -179.5, 0.0, 179.5, 180.0, 359.0])
    assert np.allclose(out, [-180.0 + 1e-9, -180.0, -179.5, 0.0, 179.5, -180.0, -1.0])


def test_split_lon_interval():
    assert dateline.split_lon_interval(-10.0, 10.0) == [(-10.0, 10.0)]
    assert dateline.split_lon_interval(177.0, 183.0) == [(177.0, 180.0), (-180.0, -177.0)]
    assert dateline.split_lon_interval(-183.0, -177.0) == [(177.0, 180.0), (-180.0, -177.0)]
    # endpoint exactly on the meridian: single part, no sliver
    assert dateline.split_lon_interval(174.0, 180.0) == [(174.0, 180.0)]


def test_split_linestring_crossing():
    parts = dateline.split_linestring(np.array([[178.0, 10.0], [183.0, 20.0]]))
    assert len(parts) == 2
    (p1, p2) = parts
    assert p1[0, 0] == 178.0 and p1[-1, 0] == 180.0
    assert p2[0, 0] == -180.0 and p2[-1, 0] == -177.0
    # the interpolated vertex sits at the same latitude in both parts
    assert p1[-1, 1] == p2[0, 1]
    # length is preserved
    def ln(p):
        return float(np.sum(np.hypot(np.diff(p[:, 0]), np.diff(p[:, 1]))))
    orig = float(np.hypot(5.0, 10.0))
    assert abs(ln(p1) + ln(p2) - orig) < 1e-12


def test_split_linestring_noncrossing_untouched():
    parts = dateline.split_linestring(np.array([[-10.0, 0.0], [10.0, 5.0]]))
    assert len(parts) == 1
    assert np.array_equal(parts[0], np.array([[-10.0, 0.0], [10.0, 5.0]]))


def test_split_polygon_area_preserved():
    from engine import clip

    # rectangle straddling the dateline in unwrapped space: [176, 186]×[0,10]
    rings = [np.array([(176.0, 0.0), (186.0, 0.0), (186.0, 10.0), (176.0, 10.0)])]
    parts = dateline.split_polygon_rings(rings)
    assert len(parts) == 2
    areas = sorted(clip.pieces_area(p) for p in parts)
    assert abs(areas[0] - 40.0) < 1e-9  # [176,180] × 10
    assert abs(areas[1] - 60.0) < 1e-9  # [-180,-174] × 10
    # every wrapped vertex is inside [-180, 180]
    for pieces in parts:
        for piece in pieces:
            assert np.all(piece[:, 0] >= -180.0 - 1e-12)
            assert np.all(piece[:, 0] <= 180.0 + 1e-12)


def test_split_wkb_dispatch():
    ls = geom.wkb_linestring([(179.0, 0.0), (182.0, 0.0)])
    assert len(dateline.split_wkb(ls)) == 2
    poly = geom.wkb_polygon([[(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0)]])
    assert len(dateline.split_wkb(poly)) == 1


def test_geodetic_tile_cover_x_seam():
    # full-width span covers the whole z6 x-range
    assert dateline.geodetic_tile_cover_x(-180.0, 180.0, 6) == (0, 127)
    # east part touching the seam ends at 127, west part starts at 0
    assert dateline.geodetic_tile_cover_x(176.0, 180.0, 6)[1] == 127
    assert dateline.geodetic_tile_cover_x(-180.0, -176.0, 6)[0] == 0
    t0, t1 = dateline.geodetic_tile_cover_x(-3.0, 3.0, 6)
    assert t0 <= t1 and 0 <= t0 and t1 <= 127


def test_join_equivalence_across_seam(spark):
    """A crossing segment, split, must produce the same z6 tile cover as
    splitting it by hand first — and a non-crossing one is unchanged."""
    rows = [
        (0, geom.wkb_linestring([(178.5, 5.0), (181.5, 5.0)])),  # crossing
        (1, geom.wkb_linestring([(-30.0, 5.0), (-27.0, 5.0)])),  # plain
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["gid", "geom_wkb"]))
    out = dateline.split_lines_df(df).toPandas().sort_values(["gid", "part_idx"])
    assert list(out.groupby("gid").size()) == [2, 1]
    covers = {}
    for r in out.itertuples():
        _, coords = geom.wkb_loads(r.geom_wkb)
        arr = np.asarray(coords)
        a, b = sorted((arr[0, 0], arr[-1, 0]))
        covers.setdefault(r.gid, []).append(dateline.geodetic_tile_cover_x(a, b, 6))
    # hand-split oracle for gid 0: [178.5,180] and [-180,-178.5]
    exp0 = [dateline.geodetic_tile_cover_x(178.5, 180.0, 6),
            dateline.geodetic_tile_cover_x(-180.0, -178.5, 6)]
    assert covers[0] == exp0
    assert covers[0][0][1] == 127 and covers[0][1][0] == 0
    px = (180.0 + -30.0) / tiles.geodetic_resolution(6)
    assert covers[1][0][0] == int(np.floor(px / 256))


def test_pip_join_equivalence_with_split_polygons(spark):
    """A dateline-crossing polygon, split by split_polygons_df, must PIP-join
    the same point set as its hand-split halves — the mis-join failure mode
    WRAPDATELINE exists to prevent (ogr/ogrgeometryfactory.cpp:2436)."""
    from engine import joins

    # polygon [176, 186]×[-10, 10] in unwrapped space (crosses the seam)
    crossing = spark.createDataFrame(
        pd.DataFrame(
            {"polygon_id": pd.array([7], dtype="int32"),
             "geom_wkb": [geom.wkb_polygon(
                 [[(176.0, -10.0), (186.0, -10.0), (186.0, 10.0), (176.0, 10.0)]]
             )]}
        )
    )
    split_pdf = dateline.split_polygons_df(crossing).toPandas()
    assert len(split_pdf) == 2
    assert set(split_pdf["part_idx"]) == {0, 1}

    # points on both sides of the seam + controls outside
    rows = []
    for i, (x, y) in enumerate(
        [(177.0, 0.0), (179.9, 5.0), (-179.9, -5.0), (-174.5, 0.0),
         (-173.0, 0.0), (170.0, 0.0), (0.0, 0.0)]
    ):
        rows.append((i, x, y))
    pts = spark.createDataFrame(pd.DataFrame(rows, columns=["event_id", "lon", "lat"]))

    split_polys = split_pdf[["polygon_id", "geom_wkb"]].reset_index(drop=True)
    got = sorted(
        r.event_id
        for r in joins.pip_join_broadcast(pts, split_polys, keep_cols=("event_id",)).collect()
    )
    # hand-split oracle: [176,180] and [-180,-174] at |lat|<10
    exp = sorted(
        i for i, (x, y) in enumerate(
            [(177.0, 0.0), (179.9, 5.0), (-179.9, -5.0), (-174.5, 0.0),
             (-173.0, 0.0), (170.0, 0.0), (0.0, 0.0)]
        )
        if (176.0 < x < 180.0 or -180.0 < x < -174.0) and -10.0 < y < 10.0
    )
    assert got == exp
    # the UNSPLIT polygon would read as a 176→186 bar: the engine's PIP
    # kernel never sees out-of-range lons after the split stage
    allx = [geom.envelope(b) for b in split_pdf["geom_wkb"]]
    assert all(-180.0 <= e[0] and e[2] <= 180.0 for e in allx)
