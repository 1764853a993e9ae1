"""Polygon overlay kernel + distributed layer algebra.

Oracle strategy: analytic areas for rectangles; conservation laws
(area(A∩B) + area(A\\B) == area(A)) and PIP-sample parity against
engine.geom's independent ray-cast kernel for arbitrary concave shapes.
"""

import numpy as np
import pytest

from engine import algebra, clip, geom


def _rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def _rot(ring, deg, cx=0.0, cy=0.0):
    t = np.deg2rad(deg)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    return (ring - [cx, cy]) @ R.T + [cx, cy]


def _star(n=7, r1=10.0, r2=4.0, cx=0.0, cy=0.0):
    """Concave star polygon."""
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    r = np.where(np.arange(2 * n) % 2 == 0, r1, r2)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def test_triangulate_area_conservation():
    for ring in [_rect(0, 0, 4, 3), _star(5), _star(9, 7, 2), _rot(_star(6), 33)]:
        tris = clip.triangulate(ring)
        assert abs(sum(abs(clip.signed_area(t)) for t in tris) - abs(clip.signed_area(ring))) < 1e-9


def test_rect_intersection_analytic():
    a, b = _rect(0, 0, 10, 10), _rect(4, 6, 14, 16)
    pieces = clip.intersection_pieces(a, b)
    assert abs(clip.pieces_area(pieces) - 6 * 4) < 1e-9
    # disjoint rects -> empty
    assert clip.intersection_pieces(_rect(0, 0, 1, 1), _rect(5, 5, 6, 6)) == []


def test_rotated_squares_analytic():
    # unit square ∩ same square rotated 45° about its center:
    # regular octagon, area = 2(√2−1)
    a = _rect(-0.5, -0.5, 0.5, 0.5)
    b = _rot(a, 45)
    assert abs(clip.pieces_area(clip.intersection_pieces(a, b)) - 2 * (np.sqrt(2) - 1)) < 1e-9


@pytest.mark.parametrize("mk_b", [lambda: _rect(2, -3, 9, 5), lambda: _rot(_star(5, 6, 2, 3, 1), 17)])
def test_conservation_laws(mk_b):
    a = _star(7, 10, 4)
    b = mk_b()
    area_a = abs(clip.signed_area(a))
    area_b = abs(clip.signed_area(b))
    inter = clip.pieces_area(clip.intersection_pieces(a, b))
    a_minus_b = clip.pieces_area(clip.erase_pieces(a, [b]))
    b_minus_a = clip.pieces_area(clip.erase_pieces(b, [a]))
    union = clip.pieces_area(clip.union_pieces(a, b))
    sym = clip.pieces_area(clip.sym_difference_pieces(a, b))
    assert abs(inter + a_minus_b - area_a) < 1e-8
    assert abs(inter + b_minus_a - area_b) < 1e-8
    assert abs(union - (area_a + area_b - inter)) < 1e-8
    assert abs(sym - (area_a + area_b - 2 * inter)) < 1e-8
    assert inter > 0


def test_clip_pieces_overlapping_methods_no_double_count():
    # two overlapping method rects covering [0,6]x[0,4] ∪ [4,0]x[10,4]
    a = _rect(0, 0, 10, 4)
    b1, b2 = _rect(0, 0, 6, 4), _rect(4, 0, 10, 4)
    pieces = clip.clip_pieces(a, [b1, b2])
    assert abs(clip.pieces_area(pieces) - 40.0) < 1e-9  # not 6*4+6*4=48


def test_pip_sample_parity_concave():
    """Membership in the piece dissection == membership in (A∩B) decided by
    the independent ray-cast kernel."""
    rng = np.random.default_rng(42)
    a = _star(7, 10, 4)
    b = _rot(_star(5, 8, 3, 2, 1), 29)
    pieces = clip.intersection_pieces(a, b)
    px = rng.uniform(-12, 12, 4000)
    py = rng.uniform(-12, 12, 4000)
    in_pieces = clip.pieces_contain(pieces, px, py)
    prep_a = geom.PreparedPolygon(geom.wkb_polygon([a]))
    prep_b = geom.PreparedPolygon(geom.wkb_polygon([b]))
    truth = prep_a.contains(px, py) & prep_b.contains(px, py)
    # boundary-adjacent points may flip either way; interior agreement must
    # be essentially total
    disagree = (in_pieces != truth).mean()
    assert disagree < 0.003, disagree


def test_erase_pip_parity():
    rng = np.random.default_rng(7)
    a = _star(6, 9, 5)
    b = _rect(-2, -8, 6, 3)
    pieces = clip.erase_pieces(a, [b])
    px = rng.uniform(-10, 10, 3000)
    py = rng.uniform(-10, 10, 3000)
    in_pieces = clip.pieces_contain(pieces, px, py)
    prep_a = geom.PreparedPolygon(geom.wkb_polygon([a]))
    prep_b = geom.PreparedPolygon(geom.wkb_polygon([b]))
    truth = prep_a.contains(px, py) & ~prep_b.contains(px, py)
    assert (in_pieces != truth).mean() < 0.005


# ---------------------------------------------------------------------------
# Distributed layer algebra
# ---------------------------------------------------------------------------


def _layer(spark, specs):
    """specs: [(id, ring)] → DataFrame (pid, geom_wkb)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"pid": [int(i) for i, _ in specs], "geom_wkb": [geom.wkb_polygon([r]) for _, r in specs]}
    )
    pdf["pid"] = pdf["pid"].astype("int32")
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def grids(spark):
    # layer A: 8 cells of 10x10 in a row; layer B: 15x15 cells offset (3,2)
    a = _layer(spark, [(i, _rect(-40 + 10 * i, 0, -30 + 10 * i, 10)) for i in range(8)])
    b = _layer(spark, [(j, _rect(-37 + 15 * j, 2, -22 + 15 * j, 17)) for j in range(5)])
    return a, b


def test_layer_intersection_matches_rect_math(spark, grids):
    a, b = grids
    rows = algebra.layer_intersection(a, b, res=10.0).collect()
    got = {(r.a_id, r.b_id): r.area for r in rows}
    expect = {}
    for i in range(8):
        ax0, ax1 = -40 + 10 * i, -30 + 10 * i
        for j in range(5):
            bx0, bx1 = -37 + 15 * j, -22 + 15 * j
            w = min(ax1, bx1) - max(ax0, bx0)
            h = min(10, 17) - max(0, 2)
            if w > 0 and h > 0:
                expect[(i, j)] = w * h
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9, k


def test_layer_erase_conservation(spark, grids):
    a, b = grids
    inter = algebra.layer_intersection(a, b, res=10.0).groupBy("a_id").sum("area").collect()
    inter_by_a = {r.a_id: r["sum(area)"] for r in inter}
    erased = {r.a_id: r.area for r in algebra.layer_erase(a, b, res=10.0).collect()}
    for i in range(8):
        total = inter_by_a.get(i, 0.0) + erased.get(i, 0.0)
        assert abs(total - 100.0) < 1e-8, (i, total)


def test_layer_clip_equals_intersection_sum_disjoint_methods(spark, grids):
    a, b = grids
    inter = algebra.layer_intersection(a, b, res=10.0).groupBy("a_id").sum("area").collect()
    inter_by_a = {r.a_id: r["sum(area)"] for r in inter}
    clipped = {r.a_id: r.area for r in algebra.layer_clip(a, b, res=10.0).collect()}
    assert set(clipped) == set(inter_by_a)
    for k, v in inter_by_a.items():
        assert abs(clipped[k] - v) < 1e-8


def test_layer_union_identity_update_row_structure(spark, grids):
    a, b = grids
    uni = algebra.layer_union(a, b, res=10.0).collect()
    total_area = sum(r.area for r in uni)
    # A covers [-40,40]x[0,10] = 800; B covers 5 cells 15x15 = 1125;
    # overlap strip y in [2,10] for x in [-37,38] = 75*8 = 600
    assert abs(total_area - (800 + 1125 - 600)) < 1e-7
    ident = algebra.layer_identity(a, b, res=10.0).collect()
    assert abs(sum(r.area for r in ident) - 800) < 1e-7
    upd = algebra.layer_update(a, b, res=10.0).collect()
    assert abs(sum(r.area for r in upd) - (1125 + 800 - 600)) < 1e-7


def test_owner_cell_dedup_no_duplicate_pairs(spark):
    # one big polygon spanning many cells x one method spanning many cells
    a = _layer(spark, [(0, _rect(-35, -25, 35, 25))])
    b = _layer(spark, [(0, _rect(-20, -40, 20, 40))])
    rows = algebra.pair_candidates(a, b, res=10.0).collect()
    assert len(rows) == 1


def test_triangulate_polygon_with_holes():
    ext = _rect(0, 0, 10, 10)
    h1 = _rect(2, 2, 4, 4)
    h2 = _rect(6, 5, 8, 8)
    tris = clip.triangulate_polygon([ext, h1, h2])
    area = sum(abs(clip.signed_area(t)) for t in tris)
    assert abs(area - (100 - 4 - 6)) < 1e-9
    # PIP parity: triangles cover exactly exterior minus holes
    rng = np.random.default_rng(5)
    px = rng.uniform(-1, 11, 4000)
    py = rng.uniform(-1, 11, 4000)
    in_tris = clip.pieces_contain(tris, px, py)
    truth = (
        (px >= 0) & (px <= 10) & (py >= 0) & (py <= 10)
        & ~((px > 2) & (px < 4) & (py > 2) & (py < 4))
        & ~((px > 6) & (px < 8) & (py > 5) & (py < 8))
    )
    assert (in_tris != truth).mean() < 0.005


def test_overlay_with_holes():
    donut = [_rect(0, 0, 10, 10), _rect(3, 3, 7, 7)]  # area 84
    probe = _rect(2, 2, 8, 8)                          # area 36; 16 in hole
    inter = clip.pieces_area(clip.intersection_pieces(donut, probe))
    assert abs(inter - (36 - 16)) < 1e-9
    left = clip.pieces_area(clip.erase_pieces(donut, [probe]))
    assert abs(left - (84 - 20)) < 1e-9
    # subject entirely inside the hole → empty intersection
    inside_hole = _rect(4, 4, 6, 6)
    assert clip.intersection_pieces(donut, inside_hole) == []


def test_predicates_with_holes():
    from engine import predicates

    donut = [_rect(0, 0, 10, 10), _rect(3, 3, 7, 7)]
    # probe exactly filling the hole: zero intersection area but boundary
    # contact along the hole ring -> touches
    assert predicates.relate(donut, _rect(3, 3, 7, 7)) == "touches"
    assert predicates.relate(donut, _rect(4.5, 4.5, 5.5, 5.5)) == "disjoint"
    assert predicates.relate(donut, _rect(1, 1, 2, 2)) == "contains"
    assert predicates.relate(donut, _rect(2, 2, 4, 4)) == "overlaps"


def test_dissolve_union_with_holes(spark):
    import pandas as pd

    from engine import geom as geommod
    from engine import vector

    donut = geommod.wkb_polygon([
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(3, 3), (7, 3), (7, 7), (3, 7)],
    ])
    patch = geommod.wkb_polygon([[(2, 2), (8, 2), (8, 8), (2, 8)]])
    pdf = pd.DataFrame({"grp": pd.array([0, 0], dtype="int32"), "geom_wkb": [donut, patch]})
    r = vector.dissolve_union(spark.createDataFrame(pdf), "grp").collect()[0]
    # union area: donut 84 + patch part inside the hole 16 = 100... patch
    # covers [2,8]^2=36: overlap with donut = 36-16=20 → union = 84+36-20
    assert abs(r.area - 100.0) < 1e-9


def test_multipolygon_parts_overlay(spark):
    import pandas as pd

    # A = MultiPolygon of two disjoint squares (each 4x4); B = rect covering
    # half of each → intersection area = 8 + 8
    mp = geom.wkb_multipolygon([[_rect(0, 0, 4, 4)], [_rect(10, 0, 14, 4)]])
    probe = geom.wkb_polygon([[(2, 0), (12, 0), (12, 4), (2, 4)]])
    a = spark.createDataFrame(pd.DataFrame({"pid": pd.array([0], dtype="int32"), "geom_wkb": [mp]}))
    b = spark.createDataFrame(pd.DataFrame({"pid": pd.array([0], dtype="int32"), "geom_wkb": [probe]}))
    r = algebra.layer_intersection(a, b).collect()[0]
    assert abs(r.area - (2 * 4 + 2 * 4)) < 1e-9
    e = algebra.layer_erase(a, b).collect()[0]
    assert abs(e.area - (32 - 16)) < 1e-9
    # predicates on multipolygon: B overlaps A
    from engine import predicates

    assert predicates.relate(geom.polygon_parts(mp), geom.polygon_parts(probe)) == "overlaps"
    # contained multipolygon
    small = geom.wkb_multipolygon([[_rect(1, 1, 2, 2)], [_rect(11, 1, 12, 2)]])
    assert predicates.relate(geom.polygon_parts(mp), geom.polygon_parts(small)) == "contains"


def test_layer_sym_difference_multipart_no_double_count(spark):
    import pandas as pd

    # A = two unit squares; B = rect covering both: true AΔB = B minus the
    # two squares = 3*1 - 2 = 1.0 (a per-part sym loop yields 4.0).
    # Grouped semantics (ogrlayer.cpp:2564): the A-side row (A minus ALL of
    # B) is empty and dropped; the single surviving row is B minus A.
    mp = geom.wkb_multipolygon([[_rect(0, 0, 1, 1)], [_rect(2, 0, 3, 1)]])
    cover = geom.wkb_polygon([[(0, 0), (3, 0), (3, 1), (0, 1)]])
    a = spark.createDataFrame(pd.DataFrame({"pid": pd.array([0], dtype="int32"), "geom_wkb": [mp]}))
    b = spark.createDataFrame(pd.DataFrame({"pid": pd.array([0], dtype="int32"), "geom_wkb": [cover]}))
    rows = algebra.layer_sym_difference(a, b).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.a_id is None and r.b_id == 0
    assert abs(r.area - 1.0) < 1e-9
    # pieces must be disjoint: no sample point in more than one piece
    kind, body = geom.wkb_loads(r.geom_wkb)
    pieces = [np.asarray(rings[0])[:-1] for _, rings in body]
    rng = np.random.default_rng(4)
    px = rng.uniform(-0.5, 3.5, 3000)
    py = rng.uniform(-0.5, 1.5, 3000)
    counts = np.zeros(px.shape[0])
    for p in pieces:
        n = p.shape[0]
        ok = np.ones(px.shape[0], dtype=bool)
        for i in range(n):
            aa, bb = p[i], p[(i + 1) % n]
            ok &= (bb[0] - aa[0]) * (py - aa[1]) - (bb[1] - aa[1]) * (px - aa[0]) >= 1e-9
        counts += ok
    assert counts.max() <= 1


def test_layer_sym_difference_grouped_multi_method(spark):
    import pandas as pd

    # input A overlaps TWO method features: the reference subtracts BOTH
    # from the single A-side row (ogrlayer.cpp:2564) — pairwise rows would
    # each retain the other's overlap.  A=4×1 strip, B1/B2 unit squares
    # inside it: A-side row = 4−1−1 = 2; both B-side rows are empty.
    a = spark.createDataFrame(
        pd.DataFrame({"pid": pd.array([0], dtype="int32"),
                      "geom_wkb": [geom.wkb_polygon([_rect(0, 0, 4, 1)])]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"pid": pd.array([0, 1], dtype="int32"),
                      "geom_wkb": [geom.wkb_polygon([_rect(0, 0, 1, 1)]),
                                   geom.wkb_polygon([_rect(2, 0, 3, 1)])]})
    )
    rows = algebra.layer_sym_difference(a, b).collect()
    assert len(rows) == 1
    assert rows[0].a_id == 0 and rows[0].b_id is None
    assert abs(rows[0].area - 2.0) < 1e-9


def test_layer_sym_difference_passthrough(spark):
    import pandas as pd

    # disjoint features pass through whole on both sides
    a = spark.createDataFrame(
        pd.DataFrame({"pid": pd.array([7], dtype="int32"),
                      "geom_wkb": [geom.wkb_polygon([_rect(0, 0, 2, 2)])]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"pid": pd.array([9], dtype="int32"),
                      "geom_wkb": [geom.wkb_polygon([_rect(10, 10, 11, 11)])]})
    )
    rows = sorted(algebra.layer_sym_difference(a, b).collect(), key=lambda r: r.area)
    assert len(rows) == 2
    assert rows[0].b_id == 9 and abs(rows[0].area - 1.0) < 1e-9
    assert rows[1].a_id == 7 and abs(rows[1].area - 4.0) < 1e-9


def test_triangulate_polygon_multi_hole_fuzz():
    """The bridge-cut bug class (reviewed): multi-hole and concave-exterior
    decompositions must cover exactly exterior − holes."""
    # the review's exact repro: was 96.0 with the bridge-cut ear clip
    tris = clip.triangulate_polygon([_rect(0, 0, 10, 10), _rect(2, 1, 6, 3), _rect(4, 6, 6, 8)])
    assert abs(sum(abs(clip.signed_area(t)) for t in tris) - 88.0) < 1e-9
    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(4, 9))
        ext = _star(n, 10, float(rng.uniform(3, 6)))
        cx, cy = rng.uniform(-1.2, 1.2, 2)
        w, h = rng.uniform(0.3, 1.2, 2)
        hole = _rect(cx - w, cy - h, cx + w, cy + h)
        tris = clip.triangulate_polygon([ext, hole])
        area = sum(abs(clip.signed_area(t)) for t in tris)
        expect = abs(clip.signed_area(ext)) - abs(clip.signed_area(hole))
        assert abs(area - expect) < 1e-6


def test_convex_minus_convex_quad():
    """Subtracting a 4-edge convex clip (trapezoid) must remove its whole
    footprint — the hardcoded-3-edges bug left the 4th half-plane behind."""
    piece = _rect(0, 0, 4, 4)
    quad = np.array([(1.0, 1.0), (3.0, 1.0), (3.5, 3.0), (0.5, 3.0)])
    pieces = clip.convex_minus_convex(piece, quad)
    assert abs(clip.pieces_area(pieces) - (16.0 - abs(clip.signed_area(quad)))) < 1e-9
