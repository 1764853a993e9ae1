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
