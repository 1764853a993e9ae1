"""Single-process pure-Python oracle: the reference semantics, transcribed.

This module IS the correctness definition for the distributed engine
(SURVEY.md §5.5): a direct, scalar, ``math``-module transcription of

* ``swig/python/scripts/gdal2tiles.py:205-318``  (GlobalMercator + quadkey)
* ``swig/python/scripts/gdal2tiles.py:322-418``  (GlobalGeodetic)
* the spatial-filter boundary rule of ``ogr/ogrsf_frmts/generic/
  ogrlayer.cpp:1296-1405`` (GEOS Intersects — boundary points match)
* ``alg/gdalrasterize.cpp:485-498`` MERGE_ALG=ADD point burn
* 2×2 AVERAGE pyramid reduce (``gcore/overview.cpp:1582-1590``,
  ``gdal2tiles.py:1332-1389``)

Tests run the Spark operators and compare row-for-row / checksum-for-checksum
against these functions executed in one process on the collected input.
Deliberately unvectorized; do not optimize.

Note on libm: CPython ``math.tan``/``math.log`` (glibc) and numpy's
vectorized float64 kernels differ in the last ulp for some inputs.  numpy is
self-consistent regardless of array length/offset (verified in
tests/test_tiles.py), so the engine is deterministic under any partitioning;
the oracle therefore calls the *scalar* numpy functions — same formula as
gdal2tiles.py, same rounding as the engine.
"""

from __future__ import annotations

import math

import numpy as np

_tan = lambda x: float(np.tan(np.float64(x)))  # noqa: E731 — scalar numpy libm
_log = lambda x: float(np.log(np.float64(x)))  # noqa: E731

TILE_SIZE = 256
INITIAL_RESOLUTION = 2 * math.pi * 6378137 / TILE_SIZE
ORIGIN_SHIFT = 2 * math.pi * 6378137 / 2.0


class GlobalMercatorOracle:
    """Scalar transcription of gdal2tiles.py:205-318 (GlobalMercator)."""

    def lat_lon_to_meters(self, lat, lon):
        mx = lon * ORIGIN_SHIFT / 180.0
        my = _log(_tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
        my = my * ORIGIN_SHIFT / 180.0
        return mx, my

    def resolution(self, zoom):
        return INITIAL_RESOLUTION / (2**zoom)

    def meters_to_pixels(self, mx, my, zoom):
        res = self.resolution(zoom)
        px = (mx + ORIGIN_SHIFT) / res
        py = (my + ORIGIN_SHIFT) / res
        return px, py

    def pixels_to_tile(self, px, py):
        tx = int(math.ceil(px / float(TILE_SIZE)) - 1)
        ty = int(math.ceil(py / float(TILE_SIZE)) - 1)
        return tx, ty

    def meters_to_tile(self, mx, my, zoom):
        px, py = self.meters_to_pixels(mx, my, zoom)
        return self.pixels_to_tile(px, py)

    def lonlat_to_tile(self, lon, lat, zoom):
        mx, my = self.lat_lon_to_meters(lat, lon)
        return self.meters_to_tile(mx, my, zoom)

    def google_tile(self, tx, ty, zoom):
        return tx, (2**zoom - 1) - ty

    def quad_tree(self, tx, ty, zoom):
        quad_key = ""
        ty = (2**zoom - 1) - ty
        for i in range(zoom, 0, -1):
            digit = 0
            mask = 1 << (i - 1)
            if (tx & mask) != 0:
                digit += 1
            if (ty & mask) != 0:
                digit += 2
            quad_key += str(digit)
        return quad_key


class GlobalGeodeticOracle:
    """Scalar transcription of gdal2tiles.py:322-418 (GlobalGeodetic)."""

    def __init__(self, tmscompatible=True):
        self.res_fact = 180.0 / TILE_SIZE if tmscompatible else 360.0 / TILE_SIZE

    def lon_lat_to_pixels(self, lon, lat, zoom):
        res = self.res_fact / 2**zoom
        px = (180 + lon) / res
        py = (90 + lat) / res
        return px, py

    def lon_lat_to_tile(self, lon, lat, zoom):
        px, py = self.lon_lat_to_pixels(lon, lat, zoom)
        tx = int(math.ceil(px / float(TILE_SIZE)) - 1)
        ty = int(math.ceil(py / float(TILE_SIZE)) - 1)
        return tx, ty


def point_in_ring(x, y, ring):
    """Even-odd ray cast for one ring; returns (crossings, on_boundary).

    Scalar analog of the vectorized kernel in engine.geom; boundary points
    are detected exactly (cross product == 0 within segment bbox) to pin the
    GEOS-Intersects rule: boundary counts as a match (ogrlayer.cpp:1394-1401).
    """
    crossings = 0
    on_boundary = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        # on-segment test
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if cross == 0 and min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2):
            on_boundary = True
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xin:
                crossings += 1
    return crossings, on_boundary


def point_in_polygon(x, y, rings):
    """Even-odd point-in-polygon over [exterior, hole1, ...] rings.

    Boundary (on any ring edge) → True, matching GEOS Intersects semantics.
    """
    total = 0
    for ring in rings:
        c, on_b = point_in_ring(x, y, ring)
        if on_b:
            return True
        total += c
    return total % 2 == 1


def pip_join_oracle(points, polygons):
    """points: [(key, lon, lat)]; polygons: [(pid, [rings])].
    Returns sorted list of (key, pid) pairs — one per matching polygon
    (overlaps emit multiple rows, ogrlayer.cpp:1954 Intersection semantics)."""
    out = []
    for key, lon, lat in points:
        for pid, rings in polygons:
            if point_in_polygon(lon, lat, rings):
                out.append((key, pid))
    return sorted(out)


def burn_tiles_oracle(points, zoom):
    """MERGE_ALG=ADD point burn (alg/gdalrasterize.cpp:485-498): each point
    adds 1 to its pixel.  Returns {(tx,ty): 256x256 list-of-lists int grid},
    grid row 0 = TOP of the tile (raster convention, gdal2tiles PixelsToRaster
    flip :254-258)."""
    merc = GlobalMercatorOracle()
    tiles = {}
    for lon, lat in points:
        mx, my = merc.lat_lon_to_meters(lat, lon)
        px, py = merc.meters_to_pixels(mx, my, zoom)
        tx, ty = merc.pixels_to_tile(px, py)
        ix = int(math.floor(px)) - tx * TILE_SIZE
        iy = int(math.floor(py)) - ty * TILE_SIZE
        ix = min(max(ix, 0), TILE_SIZE - 1)
        iy = min(max(iy, 0), TILE_SIZE - 1)
        row = TILE_SIZE - 1 - iy  # raster top-left origin
        grid = tiles.setdefault((tx, ty), [[0] * TILE_SIZE for _ in range(TILE_SIZE)])
        grid[row][ix] += 1
    return tiles


def pyramid_reduce_oracle(tiles):
    """One AVERAGE 2×2 reduce level (gcore/overview.cpp:1582-1590 AVERAGE,
    gdal2tiles.py:1369-1387 child mosaic).  Missing children = all-zero.
    Integer average = floor(sum/4 + 0.5) (round half up), documented engine
    convention."""
    parents = {}
    for (tx, ty), grid in tiles.items():
        ptx, pty = tx // 2, ty // 2
        parents.setdefault((ptx, pty), {})[(tx % 2, ty % 2)] = grid
    out = {}
    for (ptx, pty), children in parents.items():
        pgrid = [[0] * TILE_SIZE for _ in range(TILE_SIZE)]
        for (cx, cy), grid in children.items():
            # child (cx, cy) occupies columns cx*128.., rows: TMS ty up = raster rows
            # top half is cy=1 (higher ty = further north = top of raster)
            col0 = cx * (TILE_SIZE // 2)
            row0 = (1 - cy) * (TILE_SIZE // 2)
            for r in range(0, TILE_SIZE, 2):
                for c in range(0, TILE_SIZE, 2):
                    s = grid[r][c] + grid[r][c + 1] + grid[r + 1][c] + grid[r + 1][c + 1]
                    pgrid[row0 + r // 2][col0 + c // 2] = (s * 2 + 4) // 8  # floor(s/4+0.5)
        out[(ptx, pty)] = pgrid
    return out


def gdal_checksum_oracle(grid):
    """Scalar transcription of GDALChecksumImage int path
    (alg/gdalchecksum.cpp:146-165): nChecksum += val % prime (C truncating
    modulo), primes cycle 7..43 continuing across lines, mask 0xffff."""
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    checksum = 0
    iprime = 0
    for row in grid:
        for v in row:
            m = abs(v) % primes[iprime]
            if v < 0:
                m = -m  # C % truncates toward zero
            checksum = (checksum + m) & 0xFFFF
            iprime = (iprime + 1) % 11
    return checksum
