"""Line × polygon clipping: analytic cases, length conservation
(clip + erase == original, fuzzed), holes, MultiPolygon methods, and the
distributed layer ops."""

import numpy as np
import pandas as pd
import pytest

from engine import clip as clipmod
from engine import geom, lineclip


def _rect(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def _pieces(rings):
    return [clipmod.ensure_ccw(p) for p in clipmod.triangulate_polygon(rings)]


def test_segment_clip_convex_basic():
    sq = np.array(_rect(0, 0, 10, 10), dtype=float)
    # crossing segment
    t = lineclip.segment_clip_convex(np.array([-5.0, 5.0]), np.array([15.0, 5.0]), sq)
    assert t is not None and abs(t[0] - 0.25) < 1e-12 and abs(t[1] - 0.75) < 1e-12
    # fully inside
    t = lineclip.segment_clip_convex(np.array([1.0, 1.0]), np.array([2.0, 2.0]), sq)
    assert t == (0.0, 1.0)
    # fully outside
    assert lineclip.segment_clip_convex(np.array([20.0, 0.0]), np.array([30.0, 5.0]), sq) is None
    # parallel outside
    assert lineclip.segment_clip_convex(np.array([-1.0, 20.0]), np.array([11.0, 20.0]), sq) is None


def test_clip_line_through_square():
    pieces = _pieces([_rect(0, 0, 10, 10)])
    line = np.array([(-5.0, 5.0), (15.0, 5.0)])
    inside = lineclip.clip_line_pieces(line, pieces, keep_inside=True)
    assert len(inside) == 1
    assert abs(lineclip.lines_length(inside) - 10.0) < 1e-9
    outside = lineclip.clip_line_pieces(line, pieces, keep_inside=False)
    assert len(outside) == 2
    assert abs(lineclip.lines_length(outside) - 10.0) < 1e-9


def test_clip_polyline_stitches_across_segments():
    # L-shaped 2-segment polyline fully inside: must come back as ONE part
    pieces = _pieces([_rect(0, 0, 10, 10)])
    line = np.array([(1.0, 1.0), (9.0, 1.0), (9.0, 9.0)])
    inside = lineclip.clip_line_pieces(line, pieces, keep_inside=True)
    assert len(inside) == 1 and inside[0].shape[0] >= 3
    assert abs(lineclip.lines_length(inside) - 16.0) < 1e-9


def test_clip_line_with_hole():
    # square with centered hole: horizontal midline splits into 2 parts
    pieces = _pieces([_rect(0, 0, 10, 10), _rect(4, 4, 6, 6)])
    line = np.array([(-2.0, 5.0), (12.0, 5.0)])
    inside = lineclip.clip_line_pieces(line, pieces, keep_inside=True)
    assert len(inside) == 2
    assert abs(lineclip.lines_length(inside) - 8.0) < 1e-9
    outside = lineclip.clip_line_pieces(line, pieces, keep_inside=False)
    # outside parts: two tails + the hole crossing
    assert len(outside) == 3
    assert abs(lineclip.lines_length(outside) - 6.0) < 1e-9


def test_clip_erase_length_conservation_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(40):
        # random concave-ish polygon (star) + random polyline
        n = int(rng.integers(5, 10))
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        rad = rng.uniform(2, 6, n)
        ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
        pieces = _pieces([ring])
        m = int(rng.integers(2, 6))
        line = rng.uniform(-8, 8, (m, 2))
        total = lineclip.lines_length([line])
        li = lineclip.lines_length(lineclip.clip_line_pieces(line, pieces, True))
        lo = lineclip.lines_length(lineclip.clip_line_pieces(line, pieces, False))
        assert abs((li + lo) - total) < 1e-6
        # sample-point parity: midpoints of inside parts are inside the ring
        for part in lineclip.clip_line_pieces(line, pieces, True):
            mid = (part[:-1] + part[1:]) / 2
            prep = geom.PreparedPolygon(geom.wkb_polygon([ring]))
            assert prep.contains(mid[:, 0], mid[:, 1]).all()


def test_layer_clip_erase_lines(spark):
    # 3 lines, 2 rect polygons (one with a hole), analytic lengths
    lines = [
        (0, geom.wkb_linestring([(-5.0, 5.0), (15.0, 5.0)])),    # crosses A
        (1, geom.wkb_linestring([(40.0, 0.0), (40.0, 20.0)])),   # inside B column
        (2, geom.wkb_linestring([(100.0, 100.0), (110.0, 100.0)])),  # misses all
    ]
    polys = [
        (0, geom.wkb_polygon([_rect(0, 0, 10, 10)])),
        (1, geom.wkb_polygon([_rect(35, 2, 45, 12), _rect(38, 4, 42, 6)])),  # holed
    ]
    ldf = spark.createDataFrame(pd.DataFrame(lines, columns=["lid", "geom_wkb"]))
    pdf_ = spark.createDataFrame(pd.DataFrame(polys, columns=["pid", "geom_wkb"]))

    clipped = {r.a_id: r for r in lineclip.layer_clip_lines(ldf, pdf_).collect()}
    assert set(clipped) == {0, 1}
    assert abs(clipped[0].length - 10.0) < 1e-9
    # line 1: x=40 inside [2,12] minus hole [4,6] → (12-2) - 2 = 8
    assert abs(clipped[1].length - 8.0) < 1e-9 and clipped[1].n_parts == 2

    erased = {r.a_id: r for r in lineclip.layer_erase_lines(ldf, pdf_).collect()}
    assert set(erased) == {0, 1, 2}
    assert abs(erased[0].length - 10.0) < 1e-9 and erased[0].n_parts == 2
    assert abs(erased[1].length - 12.0) < 1e-9  # 20 - 8
    assert abs(erased[2].length - 10.0) < 1e-9  # untouched pass-through

    inter = {(r.a_id, r.b_id): r for r in lineclip.layer_intersection_lines(ldf, pdf_).collect()}
    assert set(inter) == {(0, 0), (1, 1)}
    assert abs(inter[(0, 0)].length - 10.0) < 1e-9
    kind, body = geom.wkb_loads(inter[(1, 1)].geom_wkb)
    assert kind == "MultiLineString" and len(body) == 2
