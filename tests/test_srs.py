"""Transverse Mercator / UTM closed forms: round-trip accuracy, known
values, zone math — pure numpy (no Spark)."""

import numpy as np

from engine import srs


def test_roundtrip_within_zone():
    rng = np.random.default_rng(7)
    t = srs.UTMTransformer(31)  # central meridian 3°E
    lon = rng.uniform(0.0, 6.0, 2000)
    lat = rng.uniform(-80.0, 84.0, 2000)
    e, n = t.forward(lon, lat)
    lon2, lat2 = t.inverse(e, n)
    # 4th-order series: sub-mm in coords ⇒ < 1e-8 degrees
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


def test_known_values():
    # equator on the central meridian: easting exactly 500000, northing 0
    t = srs.UTMTransformer(33)  # 15°E
    e, n = t.forward(np.array([15.0]), np.array([0.0]))
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # northing on the central meridian = k0 × meridian arc; 1° of latitude
    # arc ≈ 110574.4 m (Snyder) scaled by k0=0.9996
    e1, n1 = t.forward(np.array([15.0]), np.array([1.0]))
    assert abs(n1[0] - 0.9996 * 110574.4) < 1.0
    # southern hemisphere false northing
    ts = srs.UTMTransformer(33, south=True)
    _, ns = ts.forward(np.array([15.0]), np.array([-1.0]))
    assert abs(ns[0] - (10000000.0 - 0.9996 * 110574.4)) < 1.0


def test_zone_helpers():
    assert srs.utm_zone(-180.0) == 1
    assert srs.utm_zone(0.0) == 31
    assert srs.utm_zone(179.9) == 60
    assert srs.utm_central_meridian(31) == 3.0


def test_forward_monotone_easting():
    t = srs.UTMTransformer(31)
    lons = np.linspace(0.5, 5.5, 50)
    e, _ = t.forward(lons, np.full(50, 45.0))
    assert (np.diff(e) > 0).all()


def test_warp_custom_to_utm_grid(spark):
    """General-SRS warp composition: mercator tile table → UTM pixel grid
    via warp_custom with (UTM inverse ∘ lonlat→mercator-pixels) as the
    dst→src map — the engine's gdalwarp -t_srs EPSG:326xx analog."""
    import pandas as pd

    from engine import raster, tiles, warp

    T = raster.TILE_SIZE
    src_zoom = 6
    # source tile covering ~(0..5.6°E, 40..45°N): z6 mercator tile
    tx, ty = tiles.lonlat_to_tile(np.array([3.0]), np.array([43.0]), src_zoom)
    tx, ty = int(tx[0]), int(ty[0])
    rng = np.random.default_rng(4)
    g = rng.integers(0, 100, (T, T)).astype(np.int64)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [src_zoom], "tx": [tx], "ty": [ty], "data": [raster.tile_to_bytes(g)]})
    )

    utm = srs.UTMTransformer(31)  # central meridian 3°E
    res_m = 500.0  # meters per destination pixel
    # dst tile (0,0) anchored at the UTM coords of the source tile center
    minlon, minlat, maxlon, maxlat = (float(v) for v in tiles.tile_lonlat_bounds(tx, ty, src_zoom))
    e0, n0 = utm.forward(np.array([(minlon + maxlon) / 2]), np.array([(minlat + maxlat) / 2]))
    e0, n0 = float(e0[0]), float(n0[0])

    def inv_fn(dpx, dpy):
        # dst pixel → UTM meters → lon/lat → src mercator global pixels
        e = e0 + (np.asarray(dpx) - 0.0) * res_m
        n = n0 + (np.asarray(dpy) - 0.0) * res_m
        lon, lat = utm.inverse(e, n)
        return tiles.lonlat_to_pixels(lon, lat, src_zoom)

    out = warp.warp_custom(spark, src, src_zoom, [(0, 0)], inv_fn).collect()
    assert len(out) == 1
    grid = raster.bytes_to_tile(out[0].data)
    # sample parity: a destination pixel's value equals the source pixel
    # its center maps to (nearest kernel)
    for row, col in [(10, 10), (100, 200), (255, 0)]:
        dpx = 0 * T + col + 0.5
        dpy = (0 + 1) * T - row - 0.5
        spx, spy = inv_fn(np.array([dpx]), np.array([dpy]))
        stx, sty = tiles.pixels_to_tile(spx, spy)
        if (int(stx[0]), int(sty[0])) == (tx, ty):
            ix = int(np.clip(np.floor(spx[0]) - tx * T, 0, T - 1))
            iy = int(np.clip(np.floor(spy[0]) - ty * T, 0, T - 1))
            assert grid[row, col] == g[T - 1 - iy, ix]
        else:
            assert grid[row, col] == 0  # outside the single source tile
