"""Tile math parity: vectorized engine.tiles vs the scalar oracle
(direct transcription of gdal2tiles.py:205-318).  Property: bit-for-bit
equal for 10^5 random points + edge cases (SURVEY.md §7 P1)."""

import math

import numpy as np
import pytest

from engine import tiles
from engine.oracle import GlobalGeodeticOracle, GlobalMercatorOracle

MERC = GlobalMercatorOracle()


def _random_lonlat(n=100_000, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-85.05112877980659, 85.05112877980659, n)
    return lon, lat


EDGES = [
    (0.0, 0.0),
    (-180.0, 0.0),
    (180.0, 0.0),
    (179.99999999, -33.3),
    (0.0, 85.05112877980659),
    (0.0, -85.05112877980659),
    (45.0, 45.0),
    (-45.0, -45.0),
    (1.40625, 0.0),  # z8 tile x-boundary
    (5.625, 0.005),  # another exact boundary
]


def test_constants_match_reference():
    # exact same expressions as gdal2tiles.py:208-211 (the inline comments
    # there are rounded; the computed value is authoritative)
    assert tiles.INITIAL_RESOLUTION == 2 * math.pi * 6378137 / 256
    assert tiles.ORIGIN_SHIFT == 2 * math.pi * 6378137 / 2.0
    assert tiles.INITIAL_RESOLUTION == pytest.approx(156543.03392804062, rel=1e-12)
    assert tiles.ORIGIN_SHIFT == pytest.approx(20037508.342789244, rel=1e-12)


def test_meters_bitexact_vs_oracle():
    lon, lat = _random_lonlat()
    mx, my = tiles.lonlat_to_meters(lon, lat)
    for i in range(0, len(lon), 997):
        omx, omy = MERC.lat_lon_to_meters(lat[i], lon[i])
        assert mx[i] == omx and my[i] == omy  # bit-for-bit


@pytest.mark.parametrize("zoom", [0, 1, 4, 8, 12, 18])
def test_tile_assign_bitexact_vs_oracle(zoom):
    lon, lat = _random_lonlat(20_000, seed=zoom + 1)
    lon = np.concatenate([lon, [e[0] for e in EDGES]])
    lat = np.concatenate([lat, [e[1] for e in EDGES]])
    tx, ty = tiles.lonlat_to_tile(lon, lat, zoom)
    for i in range(len(lon)):
        otx, oty = MERC.lonlat_to_tile(lon[i], lat[i], zoom)
        assert (tx[i], ty[i]) == (otx, oty), f"mismatch at {lon[i]},{lat[i]} z{zoom}"


def test_tile_boundary_rule():
    # gdal2tiles.py:247-252: ceil(p/256)-1 → px exactly 256 belongs to tile 0
    tx, ty = tiles.pixels_to_tile(np.array([256.0, 256.0000001, 0.0, 255.999]), np.array([512.0, 512.1, 1.0, 5.0]))
    assert list(tx) == [0, 1, -1, 0]
    assert list(ty) == [1, 2, 0, 0]


@pytest.mark.parametrize("zoom", [1, 3, 8, 12])
def test_quadkey_matches_oracle(zoom):
    rng = np.random.default_rng(zoom)
    tx = rng.integers(0, 2**zoom, 500)
    ty = rng.integers(0, 2**zoom, 500)
    qk = tiles.quadkey(tx, ty, zoom)
    for i in range(len(tx)):
        assert qk[i] == MERC.quad_tree(int(tx[i]), int(ty[i]), zoom)


def test_quadkey_prefix_property():
    # quadkey at z-1 of the parent tile is the prefix of the child's quadkey
    rng = np.random.default_rng(3)
    z = 10
    tx = rng.integers(0, 2**z, 300)
    ty = rng.integers(0, 2**z, 300)
    qk = tiles.quadkey(tx, ty, z)
    ptx, pty = tiles.parent_tile(tx, ty)
    pqk = tiles.quadkey(ptx, pty, z - 1)
    for i in range(len(tx)):
        assert qk[i][: z - 1] == pqk[i]


def test_quadkey_roundtrip():
    z = 9
    rng = np.random.default_rng(4)
    tx = rng.integers(0, 2**z, 200)
    ty = rng.integers(0, 2**z, 200)
    qk = tiles.quadkey(tx, ty, z)
    for i in range(len(tx)):
        rtx, rty, rz = tiles.quadkey_to_tile(qk[i])
        assert (rtx, rty, rz) == (tx[i], ty[i], z)


def test_google_tile_flip():
    tx, gy = tiles.google_tile(np.array([3]), np.array([5]), 4)
    assert (tx[0], gy[0]) == MERC.google_tile(3, 5, 4)


def test_tile_bounds_roundtrip():
    # TileBounds of the tile containing a point must contain the point's meters
    lon, lat = _random_lonlat(5000, seed=11)
    z = 7
    tx, ty = tiles.lonlat_to_tile(lon, lat, z)
    minx, miny, maxx, maxy = tiles.tile_bounds(tx, ty, z)
    mx, my = tiles.lonlat_to_meters(lon, lat)
    # boundary rule: left/bottom edge exclusive-ish (point on edge belongs below)
    assert np.all(mx <= maxx + 1e-9) and np.all(mx >= minx - 1e-6)
    assert np.all(my <= maxy + 1e-9) and np.all(my >= miny - 1e-6)


@pytest.mark.parametrize("zoom", [0, 2, 8])
def test_geodetic_vs_oracle(zoom):
    geo = GlobalGeodeticOracle()
    lon, lat = _random_lonlat(5000, seed=zoom + 20)
    tx, ty = tiles.geodetic_lonlat_to_tile(lon, lat, zoom)
    for i in range(0, len(lon), 97):
        assert (tx[i], ty[i]) == geo.lon_lat_to_tile(lon[i], lat[i], zoom)


def test_numpy_batch_determinism():
    """The hard risk from SURVEY.md §7: tile math must be bit-identical
    regardless of how points are batched/partitioned.  numpy's float64
    log/tan are self-consistent across array lengths, offsets and the scalar
    path (CPython ``math`` differs by an ulp on some inputs — which is why
    the oracle transcription uses scalar numpy, see engine.oracle)."""
    lon, lat = _random_lonlat(50_000, seed=42)
    arg = (90.0 + lat) * math.pi / 360.0
    full = np.log(np.tan(arg))
    assert np.array_equal(full[7:], np.log(np.tan(arg[7:])))  # offset slice
    for i in range(0, len(lat), 4999):
        assert full[i] == np.log(np.tan(arg[i : i + 1]))[0]  # scalar path
    # and tile assignment is identical when computed in shuffled chunks
    z = 12
    tx, ty = tiles.lonlat_to_tile(lon, lat, z)
    perm = np.random.default_rng(0).permutation(len(lon))
    tx2 = np.empty_like(tx)
    ty2 = np.empty_like(ty)
    for s in range(0, len(lon), 1777):
        sl = perm[s : s + 1777]
        tx2[sl], ty2[sl] = tiles.lonlat_to_tile(lon[sl], lat[sl], z)
    assert np.array_equal(tx, tx2) and np.array_equal(ty, ty2)
