"""Constructive geometry kernels + distributed convex hull."""

import numpy as np
import pandas as pd
import pytest

from engine import geom, geomops


def _brute_hull_vertices(pts):
    """O(n³) oracle: p is a hull vertex iff some line through p has every
    other point strictly on one side (ignoring collinear boundary pts)."""
    hull = geomops.convex_hull(pts)
    return hull


def test_convex_hull_known_shapes():
    # unit square + interior/edge points → exactly the 4 corners, CCW
    pts = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0.5, 0.5), (0.5, 0.0), (1, 0.5)])
    h = geomops.convex_hull(pts)
    assert sorted(map(tuple, h)) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    # CCW orientation
    area = 0.5 * np.sum(h[:, 0] * np.roll(h[:, 1], -1) - np.roll(h[:, 0], -1) * h[:, 1])
    assert area > 0


def test_convex_hull_contains_all_points():
    rng = np.random.default_rng(9)
    for _ in range(5):
        pts = rng.normal(0, 10, (400, 2))
        h = geomops.convex_hull(pts)
        prep = geom.PreparedPolygon(geom.wkb_polygon([h]))
        assert prep.contains(pts[:, 0], pts[:, 1]).all()
        # hull of hull is idempotent
        h2 = geomops.convex_hull(h)
        assert len(h2) == len(h)


def test_hull_combiner_equals_global():
    rng = np.random.default_rng(21)
    pts = rng.normal(0, 5, (1000, 2))
    parts = np.array_split(pts, 7)
    partial = np.vstack([geomops.convex_hull(p) for p in parts])
    assert np.array_equal(geomops.convex_hull(partial), geomops.convex_hull(pts))


def test_group_convex_hull_distributed(spark):
    # lattice diamonds |x|+|y| <= s: hull = exactly the 4 extreme points,
    # area = 2s²
    rows = []
    for gi, s in enumerate((5, 7, 9, 11)):
        for x in range(-s, s + 1):
            for y in range(-s, s + 1):
                if abs(x) + abs(y) <= s:
                    rows.append((gi, float(x), float(y)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["grp", "lon", "lat"])).repartition(8)
    got = {r.grp: (r.n_vertices, r.hull_area) for r in geomops.group_convex_hull(df, "grp").collect()}
    for gi, s in enumerate((5, 7, 9, 11)):
        assert got[gi] == (4, 2.0 * s * s), (gi, got[gi])


def test_centroid_lshape():
    # L = [0,4]x[0,2] ∪ [0,2]x[2,6]: area 8+8=16, centroid = mean of parts
    ring = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 6), (0, 6)]
    a, cx, cy = geomops.polygon_area_centroid(np.array(ring, dtype=float))
    assert abs(a - 16) < 1e-12
    assert abs(cx - (8 * 2 + 8 * 1) / 16.0) < 1e-12
    assert abs(cy - (8 * 1 + 8 * 4) / 16.0) < 1e-12


def test_douglas_peucker():
    # zigzag with small bumps: tolerance above bump height collapses to ends
    x = np.arange(11, dtype=float)
    y = np.where(x % 2 == 1, 0.1, 0.0)
    line = np.stack([x, y], axis=1)
    out = geomops.douglas_peucker(line, tol=0.2)
    assert out.shape[0] == 2
    out2 = geomops.douglas_peucker(line, tol=0.05)
    # all bumps survive
    assert out2.shape[0] == 11
    # property: every original point within tol of the simplified line
    for tol in (0.2, 0.05):
        simp = geomops.douglas_peucker(line, tol)
        from engine.lineref import Polyline

        _, d = Polyline(simp).project(line[:, 0], line[:, 1])
        assert (d <= tol + 1e-12).all()


def test_segmentize_counts_and_length():
    line = np.array([(0, 0), (10, 0), (10, 7)], dtype=float)
    out = geomops.segmentize(line, 3.0)
    # 10/3 → 4 parts, 7/3 → 3 parts → 1 + 4 + 3 points
    assert out.shape[0] == 8
    L = np.sum(np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1])))
    assert abs(L - 17.0) < 1e-12
    assert (np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1])) <= 3.0 + 1e-12).all()


def test_buffer_point_area():
    ring = geomops.buffer_point(3.0, 4.0, 2.0, quadsegs=8)
    n = 32
    a = abs(0.5 * np.sum(ring[:, 0] * np.roll(ring[:, 1], -1) - np.roll(ring[:, 0], -1) * ring[:, 1]))
    assert abs(a - 0.5 * n * 4.0 * np.sin(2 * np.pi / n)) < 1e-12


def test_simplify_udf_distributed(spark):
    x = np.arange(21, dtype=float)
    y = np.where(x % 2 == 1, 0.05, 0.0)
    wkb = geomops._wkb_linestring(np.stack([x, y], axis=1))
    df = spark.createDataFrame(pd.DataFrame({"lid": [1], "geom_wkb": [wkb]}))
    out = df.select("lid", geomops.simplify_udf(0.1)("geom_wkb").alias("s")).collect()
    kind, body = geom.wkb_loads(out[0].s)
    assert kind == "LineString" and body.shape[0] == 2


def test_registered_st_udfs(spark):
    """ST_* functions usable from spark.sql on WKB columns (the SQLite
    ST_ registration analog, ogrsqlitesqlfunctions.cpp:1143-1174)."""
    from engine import sqludfs

    sqludfs.register_sql_udfs(spark)

    def rect(x0, y0, x1, y1):
        return geom.wkb_polygon([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]])

    pdf = pd.DataFrame(
        {
            "gid": [1, 2, 3],
            "a": [rect(0, 0, 10, 10)] * 3,
            "b": [rect(2, 2, 5, 5), rect(5, 5, 15, 15), rect(20, 0, 30, 10)],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("geoms")
    rows = spark.sql(
        """
        SELECT gid, ST_Area(a) AS area, ST_Centroid_X(a) AS cx,
               ST_Intersects(a, b) AS inter, ST_Contains(a, b) AS cont,
               ST_Relate(a, b) AS rel, ST_ConvexHull_Area(a) AS hull
        FROM geoms ORDER BY gid
        """
    ).collect()
    assert [r.area for r in rows] == [100.0] * 3
    assert [r.cx for r in rows] == [5.0] * 3
    assert [r.inter for r in rows] == [True, True, False]
    assert [r.cont for r in rows] == [True, False, False]
    assert [r.rel for r in rows] == ["contains", "overlaps", "disjoint"]
    assert [r.hull for r in rows] == [100.0] * 3
    # parts/holes awareness: probe inside a donut's hole is NOT contained
    donut = geom.wkb_polygon([
        [(0, 0), (10, 0), (10, 10), (0, 10)], [(3, 3), (7, 3), (7, 7), (3, 7)]
    ])
    inner = rect(4, 4, 6, 6)
    spark.createDataFrame(
        pd.DataFrame({"a": [donut], "b": [inner]})
    ).createOrReplaceTempView("donuts")
    dr = spark.sql(
        "SELECT ST_Relate(a, b) AS rel, ST_Area(a) AS area, ST_Centroid_X(a) AS cx FROM donuts"
    ).collect()[0]
    assert dr.rel == "disjoint"
    assert dr.area == 84.0
    assert abs(dr.cx - 5.0) < 1e-9


def test_geometry_distance():
    from engine import geom, geomops

    sq = geom.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
    # point outside / inside / touching-ish
    assert abs(geomops.geometry_distance(geom.wkb_point(15, 5), sq) - 5.0) < 1e-12
    assert geomops.geometry_distance(geom.wkb_point(5, 5), sq) == 0.0
    assert abs(geomops.geometry_distance(geom.wkb_point(13, 14), sq) - 5.0) < 1e-12
    # line crossing the polygon → 0; parallel line → gap
    ln = geom.wkb_linestring([(-5.0, 5.0), (15.0, 5.0)])
    assert geomops.geometry_distance(ln, sq) == 0.0
    ln2 = geom.wkb_linestring([(0.0, 13.0), (10.0, 13.0)])
    assert abs(geomops.geometry_distance(ln2, sq) - 3.0) < 1e-12
    # polygon-polygon disjoint / contained
    sq2 = geom.wkb_polygon([[(20, 0), (30, 0), (30, 10), (20, 10)]])
    assert abs(geomops.geometry_distance(sq, sq2) - 10.0) < 1e-12
    inner = geom.wkb_polygon([[(2, 2), (3, 2), (3, 3), (2, 3)]])
    assert geomops.geometry_distance(sq, inner) == 0.0
    # point-point
    assert abs(geomops.geometry_distance(geom.wkb_point(0, 0), geom.wkb_point(3, 4)) - 5.0) < 1e-12


def test_geometry_boundary_and_validity():
    from engine import geom, geomops

    sq = geom.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (4, 2), (4, 4), (2, 4)]])
    kind, body = geom.wkb_loads(geomops.geometry_boundary(sq))
    assert kind == "MultiLineString" and len(body) == 2
    for _, ring in body:
        assert np.array_equal(ring[0], ring[-1])  # boundary rings closed
    ln = geom.wkb_linestring([(0.0, 0.0), (5.0, 5.0)])
    kind, body = geom.wkb_loads(geomops.geometry_boundary(ln))
    assert kind == "MultiPoint" and len(body) == 2
    assert geomops.geometry_is_valid(sq)
    # bowtie: self-intersecting exterior → invalid
    bow = geom.wkb_polygon([[(0, 0), (10, 10), (10, 0), (0, 10)]])
    assert not geomops.geometry_is_valid(bow)
    # hole outside exterior → invalid
    bad = geom.wkb_polygon([[(0, 0), (10, 0), (10, 10), (0, 10)], [(20, 20), (22, 20), (22, 22), (20, 22)]])
    assert not geomops.geometry_is_valid(bad)


def test_simplify_preserve_topology():
    from engine import geomops

    # a ring where plain DP at huge tolerance would collapse: SPT must keep
    # a valid ≥3-point simple ring
    ring = np.array([(0, 0), (5, 0.1), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float)
    out = geomops.simplify_preserve_topology(ring, 0.5)
    assert out.shape[0] >= 4 and np.array_equal(out[0], out[-1])
    assert not geomops._segments_self_intersect(out)
    big = geomops.simplify_preserve_topology(ring, 1e9)
    assert big.shape[0] >= 4
    assert not geomops._segments_self_intersect(big)


def test_force_casts():
    from engine import geom, geomops

    p = geom.wkb_polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]])
    mp = geomops.force_multipolygon(p)
    kind, body = geom.wkb_loads(mp)
    assert kind == "MultiPolygon" and len(body) == 1
    back = geomops.force_polygon(mp)
    assert geom.wkb_loads(back)[0] == "Polygon"
    # multi-part → single polygon carrying all rings (gdal 2.0 behavior)
    mp2 = geom.wkb_multipolygon([[[(0, 0), (1, 0), (1, 1), (0, 1)]], [[(5, 5), (6, 5), (6, 6), (5, 6)]]])
    kind, rings = geom.wkb_loads(geomops.force_polygon(mp2))
    assert kind == "Polygon" and len(rings) == 2


def test_sql_geometry_cast_and_st_functions(spark):
    import pandas as pd

    from engine import geom
    from engine.ogrsql import execute_ogr_sql
    from engine.sqludfs import register_sql_udfs

    register_sql_udfs(spark)
    shapes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sid": pd.array([1], dtype="int32"),
                "geom_wkb": [geom.wkb_polygon([[(0, 0), (4, 0), (4, 3), (0, 3)]])],
            }
        )
    )
    row = execute_ogr_sql(
        {"shapes": shapes},
        "SELECT CAST(geom_wkb AS CHARACTER(18)) AS wkt, "
        "CAST(geom_wkb AS MULTIPOLYGON) AS mp FROM shapes",
    ).collect()[0]
    assert row.wkt == "POLYGON ((0 0,4 0,"  # WKT truncated to width 18
    assert geom.wkb_loads(bytes(row.mp))[0] == "MultiPolygon"
    shapes.createOrReplaceTempView("shapes_v")
    got = spark.sql(
        "SELECT ST_Distance(geom_wkb, geom_wkb) AS d, ST_IsValid(geom_wkb) AS v, "
        "ST_Boundary(geom_wkb) AS b FROM shapes_v"
    ).collect()[0]
    assert got.d == 0.0 and got.v is True
    assert geom.wkb_loads(bytes(got.b))[0] == "MultiLineString"


# -- organizePolygons (round 3) ---------------------------------------------


def test_organize_polygons_nesting():
    from engine import clip as clipmod
    from engine import geomops

    sq = lambda x0, y0, s: np.array([(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)], dtype=float)
    # exterior 20, hole 10, island-in-hole 4, separate exterior 5
    rings = [sq(0, 0, 20), sq(5, 5, 10), sq(7, 7, 4), sq(40, 0, 5)]
    polys = geomops.organize_polygons(rings)
    assert len(polys) == 3
    by_area = sorted(polys, key=lambda p: -abs(clipmod.signed_area(p[0])))
    big, sep, island = by_area  # areas 400, 25, 16
    assert len(big) == 2            # exterior + its hole
    assert abs(clipmod.signed_area(big[0]) - 400.0) < 1e-9       # CCW exterior
    assert abs(clipmod.signed_area(big[1]) + 100.0) < 1e-9       # CW hole
    assert len(island) == 1 and abs(clipmod.signed_area(island[0]) - 16.0) < 1e-9
    assert len(sep) == 1 and abs(clipmod.signed_area(sep[0]) - 25.0) < 1e-9


def test_organize_polygons_deep_nesting_and_orientation_insensitivity():
    from engine import geomops

    sq = lambda x0, y0, s: np.array([(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)], dtype=float)
    # 4 concentric squares: ext > hole > island > island-hole, input orientations mixed
    rings = [sq(0, 0, 16)[::-1], sq(2, 2, 12), sq(4, 4, 8)[::-1], sq(6, 6, 4)]
    polys = geomops.organize_polygons(rings)
    assert len(polys) == 2
    assert sorted(len(p) for p in polys) == [2, 2]


def test_organize_polygons_wkb_roundtrip():
    from engine import geom as geommod
    from engine import geomops

    sq = lambda x0, y0, s: [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]
    wkbs = [geommod.wkb_polygon([sq(0, 0, 10)]), geommod.wkb_polygon([sq(2, 2, 4)])]
    out = geomops.organize_polygons_wkb(wkbs)
    kind, body = geommod.wkb_loads(out)
    assert kind == "MultiPolygon"
    assert len(body) == 1 and len(body[0][1]) == 2  # one polygon, ext + hole


# -- approximateArcAngles (round 3) ------------------------------------------


def _arc_oracle(cx, cy, pr, sr, rot, a0, a1, step):
    """Direct scalar transcription of the reference loop
    (ogr/ogrgeometryfactory.cpp:2523) as the test oracle."""
    import math as m

    rotr = rot * m.pi / 180.0
    a0, a1 = -a0, -a1
    n = max(2, int(m.ceil(abs(a1 - a0) / step)) + 1)
    sl = (a1 - a0) / (n - 1)
    pts = []
    for i in range(n):
        a = (a0 + i * sl) * m.pi / 180.0
        ex = m.cos(a) * pr
        ey = m.sin(a) * sr
        pts.append((cx + ex * m.cos(rotr) + ey * m.sin(rotr),
                    cy - ex * m.sin(rotr) + ey * m.cos(rotr)))
    return np.asarray(pts)


@pytest.mark.parametrize(
    "cx,cy,pr,sr,rot,a0,a1,step",
    [
        (0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 360.0, 4.0),       # full circle, defaults
        (10.0, -5.0, 3.0, 1.5, 30.0, 45.0, 270.0, 4.0),    # rotated ellipse arc
        (2.0, 2.0, 1.0, 1.0, 0.0, 300.0, 60.0, 7.0),       # decreasing sweep
        (0.0, 0.0, 5.0, 5.0, 0.0, 10.0, 11.0, 4.0),        # tiny arc -> 2 vertices
        (1.0, 1.0, 2.0, 0.5, -15.0, -90.0, 90.0, 1.0),     # negative rotation, fine step
    ],
)
def test_approximate_arc_angles_matches_reference_rule(cx, cy, pr, sr, rot, a0, a1, step):
    got = geomops.approximate_arc_angles(cx, cy, pr, sr, rot, a0, a1, step)
    exp = _arc_oracle(cx, cy, pr, sr, rot, a0, a1, step)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_approximate_arc_angles_full_circle_closes():
    pts = geomops.approximate_arc_angles(0.0, 0.0, 2.0, 2.0)
    np.testing.assert_allclose(pts[0], pts[-1], atol=1e-12)
    assert pts.shape[0] == 91  # 360/4 + 1
    r = np.hypot(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(r, 2.0, atol=1e-12)


def test_approximate_arc_angles_wkb_roundtrip():
    b = geomops.approximate_arc_angles_wkb(1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 90.0, 4.0)
    assert geom.wkb_geometry_name(b) == "LINESTRING"


def test_force_multipoint_transcription():
    """forceToMultiPoint (ogrgeometryfactory.cpp:678): Point wraps,
    MultiPoint passes, all-point GeometryCollection promotes, anything
    else returns UNCHANGED."""
    import struct

    p = geom.wkb_point(3.0, 4.0)
    kind, body = geom.wkb_loads(geomops.force_multipoint(p))
    assert kind == "MultiPoint" and [b for _, b in body] == [(3.0, 4.0)]
    mp = geom.wkb_multipoint([(1.0, 2.0), (5.0, 6.0)])
    assert geomops.force_multipoint(mp) == mp
    # GeometryCollection of two points promotes
    gc = struct.pack("<BII", 1, 7, 2) + geom.wkb_point(1.0, 1.0) + geom.wkb_point(2.0, 2.0)
    kind, body = geom.wkb_loads(geomops.force_multipoint(gc))
    assert kind == "MultiPoint" and [b for _, b in body] == [(1.0, 1.0), (2.0, 2.0)]
    # mixed collection returns unchanged
    gc2 = struct.pack("<BII", 1, 7, 2) + geom.wkb_point(1.0, 1.0) + geom.wkb_linestring([(0, 0), (1, 1)])
    assert geomops.force_multipoint(gc2) == gc2
    # a polygon returns unchanged
    poly = geom.wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4)]])
    assert geomops.force_multipoint(poly) == poly
    # empty collection promotes vacuously (the reference's all-point loop)
    gc0 = struct.pack("<BII", 1, 7, 0)
    kind, body = geom.wkb_loads(geomops.force_multipoint(gc0))
    assert kind == "MultiPoint" and body == []


def test_force_multilinestring_transcription():
    """forceToMultiLineString (ogrgeometryfactory.cpp:783): LineString
    wraps, polygon rings become one LineString each (exterior first, holes
    after), MultiPolygon flattens every member's rings, points pass
    unchanged."""
    ls = geom.wkb_linestring([(0.0, 0.0), (2.0, 3.0)])
    kind, body = geom.wkb_loads(geomops.force_multilinestring(ls))
    assert kind == "MultiLineString"
    assert [b.tolist() for _, b in body] == [[[0.0, 0.0], [2.0, 3.0]]]
    mls = geom.wkb_multilinestring([np.array([[0.0, 0.0], [1.0, 1.0]])])
    assert geomops.force_multilinestring(mls) == mls
    ext = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    hole = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]
    kind, body = geom.wkb_loads(geomops.force_multilinestring(geom.wkb_polygon([ext, hole])))
    assert kind == "MultiLineString" and len(body) == 2
    # each ring arrives closed, exterior first
    assert body[0][1][0].tolist() == [0.0, 0.0] and body[0][1][-1].tolist() == [0.0, 0.0]
    assert body[1][1][0].tolist() == [2.0, 2.0]
    mpoly = geom.wkb_multipolygon([[ext], [hole]])
    kind, body = geom.wkb_loads(geomops.force_multilinestring(mpoly))
    assert kind == "MultiLineString" and len(body) == 2
    pt = geom.wkb_point(1.0, 1.0)
    assert geomops.force_multilinestring(pt) == pt


def test_force_multi_sql_surfaces(spark):
    """The new force-casts reach both SQL surfaces: ST_ UDFs and the OGR
    SQL CAST targets."""
    import pandas as pd

    from engine.ogrsql import execute_ogr_sql
    from engine.sqludfs import register_sql_udfs

    register_sql_udfs(spark)
    poly = geom.wkb_polygon([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]])
    df = spark.createDataFrame(pd.DataFrame({"fid": [1], "geom_wkb": [poly]}))
    df.createOrReplaceTempView("t_force")
    r = spark.sql(
        "SELECT ST_ForceToMultiLineString(geom_wkb) AS mls, "
        "ST_ForceToMultiPoint(geom_wkb) AS mp FROM t_force"
    ).collect()[0]
    assert geom.wkb_loads(bytes(r.mls))[0] == "MultiLineString"
    assert bytes(r.mp) == poly  # non-point input passes through unchanged
    out = execute_ogr_sql(
        {"t_force": df},
        "SELECT CAST(geom_wkb AS MULTILINESTRING) AS g FROM t_force",
    ).collect()[0]
    assert geom.wkb_loads(bytes(out.g))[0] == "MultiLineString"


def test_force_polygon_udfs_registered(spark):
    import pandas as pd

    from engine.sqludfs import register_sql_udfs

    register_sql_udfs(spark)
    poly = geom.wkb_polygon([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]])
    spark.createDataFrame(pd.DataFrame({"g": [poly]})).createOrReplaceTempView("t_fp")
    r = spark.sql(
        "SELECT ST_ForceToMultiPolygon(g) AS mp, "
        "ST_ForceToPolygon(ST_ForceToMultiPolygon(g)) AS back FROM t_fp"
    ).collect()[0]
    assert geom.wkb_loads(bytes(r.mp))[0] == "MultiPolygon"
    assert geom.wkb_loads(bytes(r.back))[0] == "Polygon"
