"""Transverse Mercator / UTM closed forms: round-trip accuracy, known
values, zone math — pure numpy (no Spark)."""

import numpy as np
import pytest

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


# -- Lambert conformal conic / Albers / Helmert (round 3) -------------------


def test_lcc_snyder_example():
    """Snyder PP1395 p.296 numerical example (Clarke 1866, SP 33/45,
    origin 23/-96): φ=35°, λ=-75° → x=1,894,410.9  y=1,564,649.5 (±0.1 m,
    the table's rounding)."""
    t = srs.LCCTransformer(33.0, 45.0, 23.0, -96.0, ellipsoid="clrk66")
    x, y = t.forward(np.array([-75.0]), np.array([35.0]))
    assert abs(x[0] - 1894410.9) < 0.1
    assert abs(y[0] - 1564649.5) < 0.1


def test_lcc_roundtrip():
    rng = np.random.default_rng(11)
    t = srs.LCCTransformer(33.0, 45.0, 23.0, -96.0)
    lon = rng.uniform(-130.0, -60.0, 2000)
    lat = rng.uniform(15.0, 60.0, 2000)
    x, y = t.forward(lon, lat)
    lon2, lat2 = t.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_lcc_standard_parallel_scale():
    """On a standard parallel the scale factor is exactly 1: a tiny
    east-west step of dλ meters of arc must map to the same projected
    distance (to first order)."""
    t = srs.LCCTransformer(33.0, 45.0, 23.0, -96.0)
    a, e2, _ = srs._ellipsoid("WGS84")
    lat = 33.0
    m = srs._snyder_m(np.radians(lat), e2)  # parallel radius factor
    dlam = 1e-6  # degrees
    (x0, x1), (y0, y1) = t.forward(np.array([-96.0, -96.0 + dlam]), np.array([lat, lat]))
    d_proj = np.hypot(x1 - x0, y1 - y0)
    d_arc = np.radians(dlam) * a * m
    assert abs(d_proj / d_arc - 1.0) < 1e-7  # finite-difference truncation


def test_albers_snyder_example():
    """Snyder PP1395 p.292 example (Clarke 1866, SP 29.5/45.5, origin
    23/-96): φ=35°, λ=-75° → x=1,885,472.7  y=1,535,925.0 (±0.1 m)."""
    t = srs.AlbersTransformer(29.5, 45.5, 23.0, -96.0, ellipsoid="clrk66")
    x, y = t.forward(np.array([-75.0]), np.array([35.0]))
    assert abs(x[0] - 1885472.7) < 0.1
    assert abs(y[0] - 1535925.0) < 0.1


def test_albers_roundtrip_and_area_preservation():
    rng = np.random.default_rng(13)
    t = srs.AlbersTransformer(29.5, 45.5, 23.0, -96.0)
    lon = rng.uniform(-120.0, -70.0, 1000)
    lat = rng.uniform(20.0, 55.0, 1000)
    x, y = t.forward(lon, lat)
    lon2, lat2 = t.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8
    # equal-area: a small quadrangle's projected area equals its authalic
    # area on the ellipsoid (relative error < 1e-6 for a 0.01° box)
    a, e2, e = srs._ellipsoid("WGS84")
    lat0, lon0, d = 40.0, -100.0, 0.01
    ring_lon = np.array([lon0, lon0 + d, lon0 + d, lon0])
    ring_lat = np.array([lat0, lat0, lat0 + d, lat0 + d])
    rx, ry = t.forward(ring_lon, ring_lat)
    proj_area = 0.5 * abs(np.sum(rx * np.roll(ry, -1) - np.roll(rx, -1) * ry))
    q1 = srs._snyder_q(np.radians(lat0), e, e2)
    q2 = srs._snyder_q(np.radians(lat0 + d), e, e2)
    ell_area = (a * a / 2.0) * (q2 - q1) * np.radians(d)
    assert abs(proj_area / ell_area - 1.0) < 1e-6


def test_helmert_identity_and_shift():
    ident = srs.HelmertTransformer(0, 0, 0)
    lon, lat, h = ident.forward(np.array([12.5]), np.array([-33.25]))
    assert abs(lon[0] - 12.5) < 1e-12 and abs(lat[0] + 33.25) < 1e-11
    # ED50→WGS84 European mean shift (-87,-96,-120): ~100 m magnitude,
    # round-trip exact
    t = srs.HelmertTransformer(-87.0, -96.0, -120.0, src_ellipsoid="intl")
    lon2, lat2, h2 = t.forward(np.array([2.0]), np.array([48.0]))
    dist = np.hypot((lon2[0] - 2.0) * 111000 * np.cos(np.radians(48)), (lat2[0] - 48.0) * 111000)
    assert 50.0 < dist < 250.0
    lon1, lat1, _ = t.inverse(lon2, lat2, h2)
    assert abs(lon1[0] - 2.0) < 1e-11 and abs(lat1[0] - 48.0) < 1e-11


def test_helmert_rotation_scale_inverse_exact():
    t = srs.HelmertTransformer(10.0, -5.0, 3.0, rx=1.5, ry=-0.8, rz=2.0, ds=5.0)
    rng = np.random.default_rng(17)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)
    lon2, lat2, h2 = t.forward(lon, lat)
    lon1, lat1, _ = t.inverse(lon2, lat2, h2)
    assert np.abs(lon1 - lon).max() < 1e-10
    assert np.abs(lat1 - lat).max() < 1e-10


def test_datum_projected_chain():
    """NAD27-style chain: Helmert + LCC composes like the reference's
    transformer chain (alg/gdaltransformer.cpp:974)."""
    helm = srs.HelmertTransformer(-8.0, 160.0, 176.0, src_ellipsoid="clrk66")
    proj = srs.LCCTransformer(33.0, 45.0, 23.0, -96.0)
    chain = srs.DatumProjectedTransformer(helm, proj)
    lon = np.array([-100.0, -90.0])
    lat = np.array([35.0, 40.0])
    x, y = chain.forward(lon, lat)
    lon2, lat2 = chain.inverse(x, y)
    # sub-mm: Bowring iteration in the geocentric->geodetic leg
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


def test_warp_custom_to_lcc_grid(spark):
    """General-SRS warp composition, LCC case: mercator tile table → LCC
    pixel grid via warp_custom with (LCC inverse ∘ lonlat→mercator-pixels)
    as the dst→src map — gdalwarp -t_srs <LCC> (mirrors the UTM test)."""
    import pandas as pd

    from engine import raster, tiles, warp

    T = raster.TILE_SIZE
    src_zoom = 6
    tx, ty = tiles.lonlat_to_tile(np.array([-90.0]), np.array([40.0]), src_zoom)
    tx, ty = int(tx[0]), int(ty[0])
    rng = np.random.default_rng(8)
    g = rng.integers(0, 100, (T, T)).astype(np.int64)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [src_zoom], "tx": [tx], "ty": [ty], "data": [raster.tile_to_bytes(g)]})
    )

    lcc = srs.LCCTransformer(33.0, 45.0, 23.0, -96.0)
    res_m = 500.0
    minlon, minlat, maxlon, maxlat = (float(v) for v in tiles.tile_lonlat_bounds(tx, ty, src_zoom))
    x0, y0 = lcc.forward(np.array([(minlon + maxlon) / 2]), np.array([(minlat + maxlat) / 2]))
    x0, y0 = float(x0[0]), float(y0[0])

    def inv_fn(dpx, dpy):
        x = x0 + np.asarray(dpx) * res_m
        y = y0 + np.asarray(dpy) * res_m
        lon, lat = lcc.inverse(x, y)
        return tiles.lonlat_to_pixels(lon, lat, src_zoom)

    out = warp.warp_custom(spark, src, src_zoom, [(0, 0)], inv_fn).collect()
    assert len(out) == 1
    grid = raster.bytes_to_tile(out[0].data)
    hits = 0
    for row, col in [(10, 10), (100, 200), (255, 0), (128, 128)]:
        dpx = col + 0.5
        dpy = T - row - 0.5
        spx, spy = inv_fn(np.array([dpx]), np.array([dpy]))
        stx, sty = tiles.pixels_to_tile(spx, spy)
        if (int(stx[0]), int(sty[0])) == (tx, ty):
            ix = int(np.clip(np.floor(spx[0]) - tx * T, 0, T - 1))
            iy = int(np.clip(np.floor(spy[0]) - ty * T, 0, T - 1))
            assert grid[row, col] == g[T - 1 - iy, ix]
            hits += 1
        else:
            assert grid[row, col] == 0
    assert hits >= 1  # the probe set must actually exercise the source


def test_warp_custom_datum_shift_chain(spark):
    """NAD27-style datum chain through warp_custom: the dst→src map runs
    DatumProjectedTransformer.inverse (LCC⁻¹ then Helmert⁻¹) — the full
    gdalwarp -s_srs <datum> -t_srs <LCC> composition."""
    import pandas as pd

    from engine import raster, tiles, warp

    T = raster.TILE_SIZE
    src_zoom = 6
    tx, ty = tiles.lonlat_to_tile(np.array([-90.0]), np.array([40.0]), src_zoom)
    tx, ty = int(tx[0]), int(ty[0])
    g = np.arange(T * T, dtype=np.int64).reshape(T, T) % 251
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [src_zoom], "tx": [tx], "ty": [ty], "data": [raster.tile_to_bytes(g)]})
    )
    chain = srs.DatumProjectedTransformer(
        srs.HelmertTransformer(-8.0, 160.0, 176.0, src_ellipsoid="clrk66"),
        srs.LCCTransformer(33.0, 45.0, 23.0, -96.0),
    )
    res_m = 500.0
    minlon, minlat, maxlon, maxlat = (float(v) for v in tiles.tile_lonlat_bounds(tx, ty, src_zoom))
    x0, y0 = chain.forward(np.array([(minlon + maxlon) / 2]), np.array([(minlat + maxlat) / 2]))
    x0, y0 = float(x0[0]), float(y0[0])

    def inv_fn(dpx, dpy):
        lon, lat = chain.inverse(x0 + np.asarray(dpx) * res_m, y0 + np.asarray(dpy) * res_m)
        return tiles.lonlat_to_pixels(lon, lat, src_zoom)

    out = warp.warp_custom(spark, src, src_zoom, [(0, 0)], inv_fn).collect()
    grid = raster.bytes_to_tile(out[0].data)
    spx, spy = inv_fn(np.array([128 + 0.5]), np.array([T - 128 - 0.5]))
    stx, sty = tiles.pixels_to_tile(spx, spy)
    assert (int(stx[0]), int(sty[0])) == (tx, ty)
    ix = int(np.floor(spx[0]) - tx * T)
    iy = int(np.floor(spy[0]) - ty * T)
    assert grid[128, 128] == g[T - 1 - iy, ix]


def test_polar_stereographic_snyder_example():
    """Snyder PP1395 p.315 south-polar example (International ellipsoid,
    std parallel −71°, λ0=−100°): φ=−75°, λ=150° →
    x=−1,540,033.6  y=−560,526.4 (±0.1 m)."""
    t = srs.PolarStereographicTransformer(-71.0, -100.0, ellipsoid="intl")
    x, y = t.forward(np.array([150.0]), np.array([-75.0]))
    assert abs(x[0] + 1540033.6) < 0.1
    assert abs(y[0] + 560526.4) < 0.1
    lo, la = t.inverse(x, y)
    assert abs(lo[0] - 150.0) < 1e-9 and abs(la[0] + 75.0) < 1e-9


def test_polar_stereographic_roundtrip_both_aspects():
    rng = np.random.default_rng(19)
    for lat_ts, lo_rng in ((70.0, (60.0, 89.9)), (-71.0, (-89.9, -60.0))):
        t = srs.PolarStereographicTransformer(lat_ts, -45.0)
        lon = rng.uniform(-179.9, 179.9, 1500)
        lat = rng.uniform(*lo_rng, 1500)
        x, y = t.forward(lon, lat)
        lon2, lat2 = t.inverse(x, y)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9


def test_sinusoidal_properties_and_roundtrip():
    t = srs.SinusoidalTransformer(lon0=0.0)
    # y on the central meridian equals the meridian arc (tmerc shares it)
    y_arc = srs._m_arc(np.radians(np.array([45.0])))
    _, y = t.forward(np.array([0.0]), np.array([45.0]))
    assert abs(y[0] - y_arc[0]) < 1e-6
    # MODIS-known constant: equator circumference/2 at x for lon=180
    x, _ = t.forward(np.array([180.0]), np.array([0.0]))
    assert abs(x[0] - np.pi * 6378137.0) < 1e-3
    rng = np.random.default_rng(23)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-85, 85, 2000)
    lon2, lat2 = t.inverse(*t.forward(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # equal-area: a small quad's projected area ~ its authalic area
    a, e2, e = srs._ellipsoid("WGS84")
    d = 0.01
    rl = np.array([10.0, 10.0 + d, 10.0 + d, 10.0])
    rp = np.array([40.0, 40.0, 40.0 + d, 40.0 + d])
    x, y = t.forward(rl, rp)
    proj_area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    q1 = srs._snyder_q(np.radians(40.0), e, e2)
    q2 = srs._snyder_q(np.radians(40.0 + d), e, e2)
    ell_area = (a * a / 2.0) * (q2 - q1) * np.radians(d)
    assert abs(proj_area / ell_area - 1.0) < 1e-5


def test_equirectangular_roundtrip_and_scale():
    t = srs.EquirectangularTransformer(lat_ts=30.0, lon0=10.0)
    rng = np.random.default_rng(29)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-89, 89, 500)
    lon2, lat2 = t.inverse(*t.forward(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12
    # x-scale at the standard parallel: a*cos(30°) per radian
    x1, _ = t.forward(np.array([11.0]), np.array([30.0]))
    assert abs(x1[0] - 6378137.0 * np.cos(np.radians(30.0)) * np.radians(1.0)) < 1e-6


def test_mercator_snyder_example_and_properties():
    """Snyder PP1395 Mercator ellipsoidal example (p. 266-267: Clarke 1866,
    lat 35N lon -75, lon0 -180 -> x=11,688,673.7  y=4,139,145.6) plus
    round-trip, exact equator scale, and spherical-limit equivalence."""
    import numpy as np
    from engine.srs import MercatorTransformer

    e2 = 0.00676866
    f = 1 - np.sqrt(1 - e2)
    m = MercatorTransformer(lon0=-180.0, ellipsoid=(6378206.4, 1 / f))
    x, y = m.forward(-75.0, 35.0)
    assert abs(float(x) - 11688673.7) < 0.1
    assert abs(float(y) - 4139145.6) < 0.1

    # round-trip < 1e-9 deg over the usable domain (WGS84 / EPSG:3395)
    w = MercatorTransformer()
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    lon2, lat2 = w.inverse(*w.forward(lon, lat))
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-9)

    # equator: x is exact arc length a*dlam, y == 0
    xe, ye = w.forward(90.0, 0.0)
    assert abs(float(xe) - 6378137.0 * np.pi / 2) < 1e-6 and abs(float(ye)) < 1e-6

    # e -> 0 degenerates to the spherical (web-mercator) formula
    sph = MercatorTransformer(ellipsoid=(6378137.0, 1e15))
    xs, ys = sph.forward(lon, lat)
    ys_ref = 6378137.0 * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    np.testing.assert_allclose(ys, ys_ref, rtol=1e-12, atol=1e-6)

    # standard-parallel variant: k0 scales x uniformly
    ts = MercatorTransformer(lat_ts=30.0)
    xt, _ = ts.forward(90.0, 0.0)
    k0 = np.cos(np.radians(30)) / np.sqrt(1 - 0.00669437999014 * np.sin(np.radians(30)) ** 2)
    assert abs(float(xt) / float(xe) - k0) < 1e-9


# -- round 4: general tmerc, pole-tangent + oblique stereographic -----------


def test_tmerc_snyder_example_clarke1866():
    """Snyder PP1395 transverse-Mercator numerical example (pp. 269-270):
    Clarke 1866, k0=0.9996, lon0=-75, point 40°30'N 73°30'W →
    x = 127,106.5  y = 4,484,124.4."""
    tr = srs.TransverseMercatorTransformer(0.0, -75.0, 0.9996, ellipsoid="clrk66")
    x, y = tr.forward(np.array([-73.5]), np.array([40.5]))
    assert abs(float(x[0]) - 127106.5) < 0.1
    assert abs(float(y[0]) - 4484124.4) < 0.1


def test_tmerc_osgb_worked_example():
    """The published OSGB worked example (OS 'A guide to coordinate systems
    in Great Britain'): Airy 1830, lat0=49, lon0=-2, k0=0.9996012717,
    FE=400000, FN=-100000; φ=52°39'27.2531\"N λ=1°43'4.5177\"E →
    E=651409.903 N=313177.270 — exercises BOTH the nonzero latitude of
    origin and a non-WGS84 ellipsoid the engine previously refused."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    tr = srs.TransverseMercatorTransformer(
        49.0, -2.0, 0.9996012717, 400000.0, -100000.0, "airy"
    )
    e, n = tr.forward(np.array([lon]), np.array([lat]))
    assert abs(float(e[0]) - 651409.903) < 0.005
    assert abs(float(n[0]) - 313177.270) < 0.005
    lo, la = tr.inverse(e, n)
    assert abs(float(lo[0]) - lon) < 1e-7 and abs(float(la[0]) - lat) < 1e-7
    # the true origin maps to the false offsets
    e0, n0 = tr.forward(np.array([-2.0]), np.array([49.0]))
    assert abs(float(e0[0]) - 400000.0) < 1e-6
    assert abs(float(n0[0]) + 100000.0) < 1e-6


def test_tmerc_proj4_general_params():
    """make_transformer no longer refuses +lat_0≠0 / non-WGS84 tmerc."""
    tr = srs.make_transformer(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy"
    )
    e, n = tr.forward(np.array([0.5]), np.array([51.0]))
    lo, la = tr.inverse(e, n)
    assert abs(float(lo[0]) - 0.5) < 1e-8 and abs(float(la[0]) - 51.0) < 1e-8


def test_polar_stereographic_pole_tangent():
    """lat_ts=±90 (the pole-tangent aspect make_transformer produces when
    +lat_ts is absent) no longer yields NaN: Snyder eq. 21-33 with k0.
    Cross-checked against the standard-parallel form as lat_ts→90."""
    tr = srs.make_transformer("+proj=stere +lat_0=90 +lon_0=0")
    x, y = tr.forward(np.array([45.0, -120.0]), np.array([80.0, 70.0]))
    assert np.isfinite(x).all() and np.isfinite(y).all()
    lo, la = tr.inverse(x, y)
    assert np.allclose(lo, [45.0, -120.0], atol=1e-9)
    assert np.allclose(la, [80.0, 70.0], atol=1e-9)
    # continuity: a standard parallel 1e-4 degrees off the pole agrees to
    # sub-mm (closer offsets hit cos-near-π/2 cancellation in the m/t ratio
    # — the very degeneracy the 21-33 form exists to avoid)
    near = srs.PolarStereographicTransformer(90.0 - 1e-4, 0.0)
    xn, yn = near.forward(np.array([45.0]), np.array([80.0]))
    assert abs(float(xn[0]) - float(x[0])) < 1e-3
    # south pole-tangent mirrors
    s = srs.make_transformer("+proj=stere +lat_0=-90 +lon_0=0")
    xs, ys = s.forward(np.array([45.0]), np.array([-80.0]))
    lo, la = s.inverse(xs, ys)
    assert abs(float(lo[0]) - 45.0) < 1e-9 and abs(float(la[0]) + 80.0) < 1e-9


def test_oblique_stereographic_snyder_example():
    """Snyder PP1395 oblique stereographic numerical example: Clarke 1866,
    k0=0.9999, φ1=40°N, λ0=100°W, point 30°N 90°W →
    x = 971,630.8  y = −1,063,049.3."""
    tr = srs.ObliqueStereographicTransformer(40.0, -100.0, 0.9999, ellipsoid="clrk66")
    x, y = tr.forward(np.array([-90.0]), np.array([30.0]))
    assert abs(float(x[0]) - 971630.8) < 0.1
    assert abs(float(y[0]) + 1063049.3) < 0.1


def test_oblique_stereographic_properties():
    """Round-trip, center scale = k0 (numerically differentiated), the
    spherical limit equals the exact spherical oblique formula, and the
    center maps to the false offsets."""
    tr = srs.ObliqueStereographicTransformer(40.0, -100.0, 0.9999, 10000.0, 20000.0, "clrk66")
    lon = np.array([-90.0, -110.0, -100.0, -95.5])
    lat = np.array([30.0, 50.0, 40.0, 44.25])
    x, y = tr.forward(lon, lat)
    lo, la = tr.inverse(x, y)
    assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat, atol=1e-9)
    x0, y0 = tr.forward(np.array([-100.0]), np.array([40.0]))
    assert abs(float(x0[0]) - 10000.0) < 1e-6 and abs(float(y0[0]) - 20000.0) < 1e-6
    # scale along the meridian at the center = k0
    d = 1e-6
    x1, y1 = tr.forward(np.array([-100.0]), np.array([40.0 + d]))
    a, e2, _ = srs._ellipsoid("clrk66")
    phi = np.radians(40.0)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    scale = np.hypot(float(x1[0] - x0[0]), float(y1[0] - y0[0])) / (M * np.radians(d))
    assert abs(scale - 0.9999) < 1e-4
    # spherical limit: e → 0 collapses to the exact spherical form
    R = 6370997.0
    sph = srs.ObliqueStereographicTransformer(40.0, -100.0, 1.0, ellipsoid=(R, 1e17))
    lam0, phi1 = np.radians(-100.0), np.radians(40.0)
    for LO, LA in [(-90.0, 30.0), (-75.0, 55.0), (-130.0, 10.0)]:
        lam, phi = np.radians(LO), np.radians(LA)
        k = 2.0 / (1 + np.sin(phi1) * np.sin(phi) + np.cos(phi1) * np.cos(phi) * np.cos(lam - lam0))
        xs = R * k * np.cos(phi) * np.sin(lam - lam0)
        ys = R * k * (np.cos(phi1) * np.sin(phi) - np.sin(phi1) * np.cos(phi) * np.cos(lam - lam0))
        xg, yg = sph.forward(np.array([LO]), np.array([LA]))
        assert abs(float(xg[0]) - xs) < 1e-6 and abs(float(yg[0]) - ys) < 1e-6
    # equatorial aspect is lat0=0
    eq = srs.make_transformer("+proj=stere +lat_0=0 +lon_0=20")
    xe, ye = eq.forward(np.array([25.0]), np.array([5.0]))
    lo, la = eq.inverse(xe, ye)
    assert abs(float(lo[0]) - 25.0) < 1e-9 and abs(float(la[0]) - 5.0) < 1e-9


# ---------------------------------------------------- WKT1 dialect translation


_WKT_RT_CASES = [
    "+proj=longlat +ellps=WGS84",
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy",
    "+proj=utm +zone=33 +ellps=WGS84",
    "+proj=utm +zone=19 +south +ellps=WGS84",
    "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80",
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80",
    "+proj=merc +lat_ts=10 +lon_0=5 +x_0=0 +y_0=0 +ellps=WGS84",
    "+proj=merc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
    "+proj=stere +lat_0=52.15616056 +lon_0=5.38763889 +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
    "+proj=sinu +lon_0=12 +x_0=0 +y_0=0 +ellps=WGS84",
    "+proj=eqc +lat_ts=30 +lon_0=7 +x_0=0 +y_0=0 +ellps=WGS84",
    "+proj=lcc +lat_1=40 +lat_2=43 +lat_0=41 +lon_0=1 +x_0=0 +y_0=0 +ellps=WGS84 +towgs84=1,2,3,4,5,6,7",
]


@pytest.mark.parametrize("p4", _WKT_RT_CASES)
def test_wkt1_roundtrip_preserves_transform(p4):
    """proj4 -> WKT1 -> proj4 must produce a transformer with IDENTICAL
    forward coordinates (the parity criterion, stronger than string
    equality: utm legitimately re-expresses as explicit tmerc params)."""
    w = srs.proj4_to_wkt1(p4)
    back = srs.wkt1_to_proj4(w)
    lon = np.array([-120.0, -3.0, 0.0, 7.25, 151.2])
    lat = np.array([-65.0, -10.0, 0.5, 48.85, 70.0])
    t1, t2 = srs.make_transformer(p4), srs.make_transformer(back)
    x1, y1 = t1.forward(lon, lat)
    x2, y2 = t2.forward(lon, lat)
    assert np.allclose(x1, x2, rtol=0, atol=1e-6)
    assert np.allclose(y1, y2, rtol=0, atol=1e-6)
    # and the WKT re-emits identically (writer is canonical)
    assert srs.proj4_to_wkt1(back) == srs.proj4_to_wkt1(srs.wkt1_to_proj4(w))


def test_wkt1_geogcs_roundtrip():
    w = srs.proj4_to_wkt1("+proj=longlat +ellps=clrk66")
    assert w.startswith("GEOGCS[")
    assert srs.wkt1_to_proj4(w) == "+proj=longlat +ellps=clrk66"


def test_esri_dialect_morph():
    """esri2wkt semantics: D_ datum prefix, alias projection/parameter
    names, GCS_ geogcs — morphed to the OGC form (esri2wkt.py direction)."""
    esri = (
        'PROJCS["NAD_1983_Albers",GEOGCS["GCS_North_American_1983",'
        'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Albers"],PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-96.0],'
        'PARAMETER["Standard_Parallel_1",29.5],PARAMETER["Standard_Parallel_2",45.5],'
        'PARAMETER["Central_Parallel",23.0],UNIT["Meter",1.0]]'
    )
    p4 = srs.wkt1_to_proj4(esri)
    assert p4.startswith("+proj=aea")
    t = srs.make_transformer(p4)
    ref = srs.make_transformer(
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
        "+x_0=0 +y_0=0 +ellps=GRS80")
    lon, lat = np.array([-100.0, -80.0]), np.array([30.0, 45.0])
    assert np.allclose(t.forward(lon, lat), ref.forward(lon, lat))
    ogc = srs.esri2wkt(esri)
    assert 'PROJECTION["Albers_Conic_Equal_Area"]' in ogc
    assert 'DATUM["North_American_Datum_1983"' in ogc


def test_epsg_subset():
    """epsg_tr -wkt analog over the transcribed public subset: every code
    yields a WKT that round-trips to a buildable transformer."""
    assert len(srs.EPSG_PROJ4) == 129  # 9 named (incl. 3857) + 120 UTM
    for code in (4326, 2154, 5070, 3031, 3413, 3857, 32633, 32719):
        w = srs.epsg_to_wkt1(code)
        p4 = srs.wkt1_to_proj4(w)
        srs.make_transformer(p4)  # must not raise
    assert 'UTM Zone 19, Southern Hemisphere' in srs.epsg_to_wkt1(32719)
    with pytest.raises(KeyError):
        srs.epsg_to_wkt1(99999)
