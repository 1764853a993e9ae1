"""Polygonize ring tracing: analytic shapes, holes, seam crossing, and the
area == pixel-count invariant against connected_components."""

import numpy as np
import pandas as pd
import pytest

from engine import components, geom, polygonize, raster

T = raster.TILE_SIZE


def _tile_table(spark, grids: dict):
    pdf = pd.DataFrame(
        {
            "zoom": [3] * len(grids),
            "tx": [k[0] for k in grids],
            "ty": [k[1] for k in grids],
            "data": [raster.tile_to_bytes(g) for g in grids.values()],
        }
    )
    return spark.createDataFrame(pdf)


def test_trace_rings_unit_square():
    edges = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]
    rings = polygonize.trace_rings(edges)
    assert len(rings) == 1
    assert polygonize.ring_signed_area(rings[0]) == 1.0


def test_trace_rings_pinch_corner():
    # L-shaped 3-pixel region (0,0),(0,1),(1,1): pinch-free actually; build
    # true pinch: pixels (0,0) and (1,1) joined via (0,1) — boundary passes
    # vertex (1,1) twice
    px = [(0, 0), (0, 1), (1, 1)]
    edges = []
    occ = set(px)
    for x, y in px:
        if (x, y - 1) not in occ:
            edges.append(((x, y), (x + 1, y)))
        if (x + 1, y) not in occ:
            edges.append(((x + 1, y), (x + 1, y + 1)))
        if (x, y + 1) not in occ:
            edges.append(((x + 1, y + 1), (x, y + 1)))
        if (x - 1, y) not in occ:
            edges.append(((x, y + 1), (x, y)))
    rings = polygonize.trace_rings(edges)
    assert len(rings) == 1
    assert polygonize.ring_signed_area(rings[0]) == 3.0


def test_polygonize_rect_and_donut(spark):
    g = np.zeros((T, T), dtype=np.int64)
    g[10:13, 5:9] = 4          # 4x3 rect, area 12
    g[100:108, 150:160] = 9    # 10x8 donut outer
    g[102:104, 153:157] = 0    # 4x2 hole
    out = {r.value: r for r in polygonize.polygonize(_tile_table(spark, {(0, 0): g})).collect()}
    rect = out[4]
    assert rect.n_rings == 1 and rect.area == 12.0
    kind, rings = geom.wkb_loads(rect.geom_wkb)
    assert kind == "Polygon" and rings[0].shape[0] == 5  # 4 corners + close
    donut = out[9]
    assert donut.n_rings == 2 and donut.area == 80.0 - 8.0
    kind, rings = geom.wkb_loads(donut.geom_wkb)
    assert len(rings) == 2
    ext = rings[0][:-1]
    hole = rings[1][:-1]
    assert polygonize.ring_signed_area(ext) == 80.0
    assert polygonize.ring_signed_area(hole) == -8.0


def test_polygonize_seam_crossing(spark):
    a = np.zeros((T, T), dtype=np.int64)
    b = np.zeros((T, T), dtype=np.int64)
    a[50:55, T - 10 :] = 7
    b[50:55, :20] = 7  # 5 x 30 rect across the seam
    out = polygonize.polygonize(_tile_table(spark, {(1, 1): a, (2, 1): b})).collect()
    assert len(out) == 1
    r = out[0]
    assert r.value == 7 and r.n_rings == 1 and r.area == 150.0
    kind, rings = geom.wkb_loads(r.geom_wkb)
    xs = rings[0][:, 0]
    assert xs.min() == 1 * T + (T - 10) and xs.max() == 2 * T + 20


def test_polygonize_component_spanning_3x3_tiles(spark):
    """Chain stitching across many seams: a hollow rectangular frame through
    all 9 tiles of a 3×3 block must assemble into ONE polygon with exactly
    2 rings (exterior + hole), exact area, stitched from per-tile chains."""
    big = np.zeros((3 * T, 3 * T), dtype=np.int64)
    big[100:-100, 100:-100] = 7
    big[120:-120, 120:-120] = 0
    grids = {}
    for i in range(3):
        for j in range(3):
            grids[(j, 2 - i)] = big[i * T : (i + 1) * T, j * T : (j + 1) * T]
    out = polygonize.polygonize(_tile_table(spark, grids)).collect()
    assert len(out) == 1
    r = out[0]
    side = 3 * T - 200
    assert r.value == 7 and r.n_rings == 2
    assert r.area == side * side - (side - 40) * (side - 40)
    kind, rings = geom.wkb_loads(r.geom_wkb)
    assert polygonize.ring_signed_area(rings[0][:-1]) == side * side
    assert polygonize.ring_signed_area(rings[1][:-1]) == -(side - 40) * (side - 40)
    # rectangle rings compress to 4 corners + closure even across seams
    assert rings[0].shape[0] == 5 and rings[1].shape[0] == 5


def test_polygonize_area_equals_pixel_count(spark):
    rng = np.random.default_rng(8)
    grids = {}
    for tx in (0, 1):
        g = np.zeros((T, T), dtype=np.int64)
        for _ in range(25):
            r, c = rng.integers(0, T - 20, 2)
            h, w = rng.integers(2, 14, 2)
            g[r : r + h, c : c + w] = int(rng.integers(1, 5))
        grids[(tx, 0)] = g
    tiles_df = _tile_table(spark, grids)
    polys = polygonize.polygonize(tiles_df).collect()
    comps = components.connected_components(tiles_df).collect()
    a = sorted((r.component_id, r.value, r.area) for r in polys)
    c = sorted((r.component_id, r.value, float(r.pixel_count)) for r in comps)
    assert a == c
    # every exterior ring has positive area; holes negative; WKB round-trips
    for r in polys:
        kind, rings = geom.wkb_loads(r.geom_wkb)
        assert polygonize.ring_signed_area(rings[0][:-1]) > 0
        for h in rings[1:]:
            assert polygonize.ring_signed_area(h[:-1]) < 0


def test_fpolygonize_float_equality_and_parity(spark):
    """fpolygonize: exact float32 equality (3.25 vs 3.250001 split), -0.0
    merges with +0.0, NaN masked to background, and the polygon set over a
    float-encoded integer grid matches integer polygonize exactly."""
    g = np.zeros((T, T), dtype=np.float32)
    g[2:6, 2:6] = np.float32(3.25)
    g[2:6, 8:12] = np.float32(3.250001)   # adjacent column gap keeps them apart anyway
    g[6, 2] = np.float32(-0.0)            # background (+0.0) — must NOT be a polygon
    g[10, 10] = np.nan                    # masked to background
    g[12:14, 12:14] = np.float32(-7.5)
    pdf = pd.DataFrame({"zoom": [3], "tx": [1], "ty": [1],
                        "data": [np.ascontiguousarray(g, "<f4").tobytes()]})
    out = polygonize.fpolygonize(spark.createDataFrame(pdf)).collect()
    vals = sorted(round(r["value"], 6) for r in out)
    assert len(out) == 3
    assert vals == [-7.5, 3.25, round(float(np.float32(3.250001)), 6)]
    areas = {round(r["value"], 6): r["area"] for r in out}
    assert areas[3.25] == 16 and areas[-7.5] == 4

    # parity with integer polygonize on an integer-valued float grid
    gi = np.zeros((T, T), dtype=np.int64)
    gi[1:5, 1:9] = 4
    gi[8:11, 3:6] = 9
    fpdf = pd.DataFrame({"zoom": [3], "tx": [0], "ty": [2],
                         "data": [np.ascontiguousarray(gi, "<f4").tobytes()]})
    ipdf = _tile_table(spark, {(0, 2): gi})
    fout = sorted(
        (round(r["value"], 6), r["area"], r["n_rings"])
        for r in polygonize.fpolygonize(spark.createDataFrame(fpdf)).collect()
    )
    iout = sorted(
        (float(r["value"]), r["area"], r["n_rings"])
        for r in polygonize.polygonize(ipdf).collect()
    )
    assert fout == iout


def test_trace_rings_8_connect_diagonal_pair():
    """Two diagonal pixels: 4-connect traces two unit rings; 8-connect's
    leftmost-turn rule crosses the shared corner and traces ONE ring of
    area 2 (alg/polygonize.cpp 8CONNECTED ring assembly)."""
    px = [(0, 0), (1, 1)]
    occ = set(px)
    edges = []
    for x, y in px:
        if (x, y - 1) not in occ:
            edges.append(((x, y), (x + 1, y)))
        if (x + 1, y) not in occ:
            edges.append(((x + 1, y), (x + 1, y + 1)))
        if (x, y + 1) not in occ:
            edges.append(((x + 1, y + 1), (x, y + 1)))
        if (x - 1, y) not in occ:
            edges.append(((x, y + 1), (x, y)))
    r4 = polygonize.trace_rings(edges, connectedness=4)
    assert len(r4) == 2
    assert sorted(polygonize.ring_signed_area(r) for r in r4) == [1.0, 1.0]
    r8 = polygonize.trace_rings(edges, connectedness=8)
    assert len(r8) == 1
    assert polygonize.ring_signed_area(r8[0]) == 2.0


def test_polygonize_8_connect_diagonal_staircase(spark):
    """A 6-step diagonal staircase inside one tile: 4-connect → 6 unit
    polygons; 8-connect → ONE polygon, area 6, exterior ring pinching
    through each shared corner."""
    g = np.zeros((T, T), dtype=np.int64)
    for i in range(6):
        g[10 + i, 20 + i] = 3
    df = _tile_table(spark, {(0, 0): g})
    out4 = polygonize.polygonize(df).collect()
    assert len(out4) == 6 and all(r.area == 1.0 for r in out4)
    out8 = polygonize.polygonize(df, connectedness=8).collect()
    assert len(out8) == 1
    r = out8[0]
    assert r.value == 3 and r.area == 6.0 and r.n_rings == 1
    kind, rings = geom.wkb_loads(r.geom_wkb)
    assert polygonize.ring_signed_area(rings[0][:-1]) == 6.0


def test_polygonize_8_connect_seam_and_corner_crossing(spark):
    """Diagonal connectivity across a vertical tile seam AND across a
    four-tile corner point: one 8-connected component, one polygon, exact
    area; 4-connect splits it."""
    grids = {k: np.zeros((T, T), dtype=np.int64) for k in [(0, 0), (1, 0), (0, 1), (1, 1)]}
    # tiles laid out with ty increasing upward (engine convention): tile
    # (0,1) is ABOVE (0,0).  Global pixel row within a tile: row T-1 = south.
    # seam-diagonal: last col of (0,0) row 40, first col of (1,0) row 41
    grids[(0, 0)][40, T - 1] = 5
    grids[(1, 0)][41, 0] = 5
    # corner-diagonal: NE corner pixel of tile (0,0) is grid row 0, col T-1;
    # SW corner pixel of tile (1,1) is its row T-1, col 0
    grids[(0, 0)][0, T - 1] = 7
    grids[(1, 1)][T - 1, 0] = 7
    df = _tile_table(spark, grids)
    out4 = {}
    for r in polygonize.polygonize(df).collect():
        out4.setdefault(r.value, []).append(r)
    assert len(out4[5]) == 2 and len(out4[7]) == 2
    out8 = {}
    for r in polygonize.polygonize(df, connectedness=8).collect():
        out8.setdefault(r.value, []).append(r)
    assert len(out8[5]) == 1 and out8[5][0].area == 2.0 and out8[5][0].n_rings == 1
    assert len(out8[7]) == 1 and out8[7][0].area == 2.0 and out8[7][0].n_rings == 1


def test_polygonize_8_connect_area_equals_pixel_count(spark):
    """Random speckle across two tiles: every 8-connected component's
    polygon area equals its pixel count (the flood-fill oracle), mirroring
    the 4-connect invariant test."""
    rng = np.random.default_rng(88)
    grids = {}
    for tx in (0, 1):
        g = np.zeros((T, T), dtype=np.int64)
        # speckle noise: isolated + diagonal-touching pixels
        m = rng.random((T, T)) < 0.08
        g[m] = rng.integers(1, 4, size=int(m.sum()))
        grids[(tx, 0)] = g
    tiles_df = _tile_table(spark, grids)
    polys = polygonize.polygonize(tiles_df, connectedness=8).collect()
    comps = components.connected_components(tiles_df, 0, connectedness=8).collect()
    a = sorted((r.component_id, r.value, r.area) for r in polys)
    c = sorted((r.component_id, r.value, float(r.pixel_count)) for r in comps)
    assert a == c
