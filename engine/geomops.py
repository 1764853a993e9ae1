"""Constructive geometry kernels: the GEOS-method surface of OGRGeometry.

Reference methods (ogr/ogrgeometry.cpp): ConvexHull :2138, Simplify :3748 /
SimplifyPreserveTopology :3833, Centroid :3520, Buffer :2358, Boundary
:2227, segmentize :595.  GEOS is unavailable in this runtime, so each is a
pure-numpy kernel with the same contract:

* **convex hull** — Andrew monotone chain with strict turns (collinear
  boundary points excluded, GEOS behavior);
* **simplify** — Douglas–Peucker on the perpendicular-distance criterion
  (GEOS DouglasPeuckerSimplifier);
* **centroid** — area-weighted polygon centroid (the 1/(6A)·Σ cross form);
* **segmentize** — insert evenly spaced points so no segment exceeds
  ``max_length`` (OGRLineString::segmentize splits each segment into
  ``ceil(len/max)`` equal parts);
* **buffer** — point buffer as the inscribed 4·quadsegs-gon (GEOS
  approximates circles with 8 segments per quadrant by default; vertex
  count is explicit here, and the analytic n-gon area
  ``½·n·r²·sin(2π/n)`` is the parity surface).

Distributed convex hull uses the combiner pattern: per-partition partial
hulls (mapInPandas, each partition reduces its points to ≤ hull size) →
groupBy final hull — the shuffle carries hull points only, not the point
cloud.  That is what makes the op viable at 10¹²-point scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geom


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain → CCW hull vertices (strict turns: collinear
    points on hull edges are dropped, matching GEOS ConvexHull)."""
    p = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # sorts lexicographically
    n = p.shape[0]
    if n <= 2:
        return p

    def _half(seq):
        out = []
        for q in seq:
            while len(out) >= 2:
                u = out[-1] - out[-2]
                v = q - out[-2]
                if u[0] * v[1] - u[1] * v[0] <= 0:  # non-left turn → drop
                    out.pop()
                else:
                    break
            out.append(q)
        return out

    lower = _half(p)
    upper = _half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def polygon_area_centroid(ring: np.ndarray):
    """(signed area, centroid) of a simple ring — OGRGeometry::Centroid's
    area-weighted form: C = Σ (p_i + p_{i+1})·cross_i / (6A)."""
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = 0.5 * np.sum(cross)
    cx = np.sum((x + xn) * cross) / (6.0 * a)
    cy = np.sum((y + yn) * cross) / (6.0 * a)
    return float(a), float(cx), float(cy)


def douglas_peucker(line: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker simplification (GEOS Simplify): keep endpoints,
    recursively keep the farthest point while its perpendicular distance
    exceeds ``tol``."""
    pts = np.asarray(line, dtype=np.float64)
    n = pts.shape[0]
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        L = np.hypot(*seg)
        mid = pts[i + 1 : j]
        if L == 0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs(seg[0] * (mid[:, 1] - pts[i, 1]) - seg[1] * (mid[:, 0] - pts[i, 0])) / L
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return pts[keep]


def segmentize(line: np.ndarray, max_length: float) -> np.ndarray:
    """OGRLineString::segmentize (ogr/ogrgeometry.cpp:595): split every
    segment longer than ``max_length`` into ``ceil(len/max_length)`` equal
    parts (total length unchanged)."""
    pts = np.asarray(line, dtype=np.float64)
    out = [pts[:1]]
    for i in range(pts.shape[0] - 1):
        a, b = pts[i], pts[i + 1]
        n = int(np.ceil(np.hypot(*(b - a)) / max_length))
        n = max(n, 1)
        ts = np.arange(1, n + 1, dtype=np.float64) / n
        out.append(a[None, :] + ts[:, None] * (b - a)[None, :])
    return np.vstack(out)


def buffer_point(x: float, y: float, dist: float, quadsegs: int = 8) -> np.ndarray:
    """Point buffer ring: inscribed regular (4·quadsegs)-gon starting at
    angle 0, CCW (OGRGeometry::Buffer via GEOS quadrant segments)."""
    n = 4 * quadsegs
    ang = 2.0 * np.pi * np.arange(n) / n
    return np.stack([x + dist * np.cos(ang), y + dist * np.sin(ang)], axis=1)


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

_HULL_PARTIAL_SCHEMA = "grp int, lon double, lat double"
_HULL_SCHEMA = "grp int, n_vertices int, hull_area double, geom_wkb binary"


def group_convex_hull(points: DataFrame, group_col: str, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Distributed convex hull per group, combiner-style: each scan
    partition reduces its points to the partial hull (≤ hull-size rows per
    group leave the map side), then one shuffle computes hull-of-hulls —
    correct because conv(A ∪ B) = conv(hull(A) ∪ hull(B))."""

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for g, sub in pdf.groupby(group_col):
                h = convex_hull(sub[[lon_col, lat_col]].to_numpy(np.float64))
                out.append(pd.DataFrame({"grp": int(g), "lon": h[:, 0], "lat": h[:, 1]}))
            yield pd.concat(out) if out else pd.DataFrame({"grp": [], "lon": [], "lat": []})

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        h = convex_hull(pdf[["lon", "lat"]].to_numpy(np.float64))
        if h.shape[0] >= 3:
            area = abs(float(np.sum(h[:, 0] * np.roll(h[:, 1], -1) - np.roll(h[:, 0], -1) * h[:, 1]))) * 0.5
        else:
            area = 0.0
        return pd.DataFrame(
            {
                "grp": [int(pdf["grp"].iat[0])],
                "n_vertices": [int(h.shape[0])],
                "hull_area": [area],
                "geom_wkb": [geom.wkb_polygon([h]) if h.shape[0] >= 3 else None],
            }
        )

    partials = points.select(F.col(group_col).cast("int").alias(group_col), lon_col, lat_col).mapInPandas(
        _partial, _HULL_PARTIAL_SCHEMA
    )
    return partials.groupBy("grp").applyInPandas(_final, _HULL_SCHEMA)


def simplify_udf(tol: float):
    """WKB LineString → simplified WKB (Douglas–Peucker at ``tol``)."""

    @F.pandas_udf("binary")
    def _simp(wkb: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            kind, body = geom.wkb_loads(b)
            if kind != "LineString":
                raise ValueError(f"simplify expects LineString WKB, got {kind}")
            return _wkb_linestring(douglas_peucker(body, tol))

        return wkb.map(one)

    return _simp


def _wkb_linestring(pts: np.ndarray) -> bytes:
    import struct

    pts = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BII", 1, geom.WKB_LINESTRING, pts.shape[0]) + pts.astype("<f8").tobytes()
