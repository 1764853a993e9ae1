"""Closed-form SRS transforms: WGS84 geodetic ↔ transverse Mercator / UTM.

Extends the engine's SRS surface beyond the spherical-mercator↔geodetic
pair (engine/tiles.py) toward the reference's general reprojection
(gdalwarp -t_srs, via PROJ's tmerc — alg/gdaltransformer.cpp:974 chains
src→georef→dst through OGRCoordinateTransformation).  PROJ itself is not
in this runtime, so this module supplies the ellipsoidal transverse
Mercator from the published series (USGS Snyder, *Map Projections — A
Working Manual*, eqs. 8-9..8-17 — the same formulas PROJ's ``tmerc``
implements), vectorized in numpy.

Accuracy: the 4th-order series is sub-millimeter within ±4° of the
central meridian (a UTM zone is ±3°) — verified by forward/inverse
round-trip tests.

A fitted/closed transformer composes with :func:`engine.warp.warp_custom`
by wrapping pixel grids around :class:`UTMTransformer`.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)          # e²
_EP2 = _E2 / (1.0 - _E2)       # e'²
_K0 = 0.9996                   # UTM scale factor
_FE = 500000.0                 # false easting
_FN_S = 10000000.0             # false northing (southern hemisphere)


def _m_arc(lat: np.ndarray) -> np.ndarray:
    """Meridian arc length from the equator (Snyder eq. 3-21)."""
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
        - (35 * e6 / 3072) * np.sin(6 * lat)
    )


def tmerc_forward(lon, lat, lon0: float, k0: float = _K0):
    """Geodetic degrees → transverse Mercator (x, y) meters about the
    central meridian ``lon0`` (Snyder eqs. 8-9..8-13), no false offsets."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    l0 = np.radians(lon0)
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    N = _A / np.sqrt(1 - _E2 * sin_lat ** 2)
    T = (sin_lat / cos_lat) ** 2
    C = _EP2 * cos_lat ** 2
    Aa = (lon - l0) * cos_lat
    M = _m_arc(lat)
    x = k0 * N * (
        Aa + (1 - T + C) * Aa ** 3 / 6
        + (5 - 18 * T + T ** 2 + 72 * C - 58 * _EP2) * Aa ** 5 / 120
    )
    y = k0 * (
        M + N * (sin_lat / cos_lat) * (
            Aa ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * Aa ** 4 / 24
            + (61 - 58 * T + T ** 2 + 600 * C - 330 * _EP2) * Aa ** 6 / 720
        )
    )
    return x, y


def tmerc_inverse(x, y, lon0: float, k0: float = _K0):
    """Transverse Mercator meters → geodetic degrees (Snyder eqs.
    8-17..8-25, footpoint-latitude form)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    l0 = np.radians(lon0)
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    M = y / k0
    mu = M / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    lat1 = (
        mu
        + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    )
    sin1 = np.sin(lat1)
    cos1 = np.cos(lat1)
    C1 = _EP2 * cos1 ** 2
    T1 = (sin1 / cos1) ** 2
    N1 = _A / np.sqrt(1 - _E2 * sin1 ** 2)
    R1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    D = x / (N1 * k0)
    lat = lat1 - (N1 * sin1 / cos1 / R1) * (
        D ** 2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 ** 2 - 9 * _EP2) * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 ** 2 - 252 * _EP2 - 3 * C1 ** 2) * D ** 6 / 720
    )
    lon = l0 + (
        D - (1 + 2 * T1 + C1) * D ** 3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1 ** 2 + 8 * _EP2 + 24 * T1 ** 2) * D ** 5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def utm_zone(lon: float) -> int:
    """UTM zone number for a longitude (1..60)."""
    return int(np.floor((lon + 180.0) / 6.0)) % 60 + 1


def utm_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


class UTMTransformer:
    """WGS84 geodetic ↔ UTM (zone easting/northing), the common
    `-t_srs EPSG:326xx/327xx` gdalwarp target.  ``south`` selects the
    false-northing convention."""

    def __init__(self, zone: int, south: bool = False):
        if not 1 <= zone <= 60:
            raise ValueError("UTM zone must be 1..60")
        self.zone = zone
        self.south = south
        self.lon0 = utm_central_meridian(zone)

    def forward(self, lon, lat):
        x, y = tmerc_forward(lon, lat, self.lon0)
        return x + _FE, y + (_FN_S if self.south else 0.0)

    def inverse(self, e, n):
        x = np.asarray(e, dtype=np.float64) - _FE
        y = np.asarray(n, dtype=np.float64) - (_FN_S if self.south else 0.0)
        return tmerc_inverse(x, y, self.lon0)
