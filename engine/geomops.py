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

import math
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


# ---------------------------------------------------------------------------
# Scalar geometry methods: Distance / Boundary / IsValid /
# SimplifyPreserveTopology / force-casts (ogr/ogrgeometry.cpp:2039,2227,
# 1361,3833; ogr/ogrgeometryfactory.cpp:496,575)
# ---------------------------------------------------------------------------


def _geom_segments_points(kind, body):
    """Any parsed geometry → (segments list [(4,) a..b], points (N,2))."""
    segs = []
    pts = []

    def add_line(arr, ring=False):
        arr = np.asarray(arr, dtype=np.float64)
        pts.append(arr)
        n = arr.shape[0]
        for i in range(n - 1):
            segs.append((arr[i], arr[i + 1]))
        if ring and n >= 2 and not np.array_equal(arr[0], arr[-1]):
            segs.append((arr[-1], arr[0]))

    if kind == "Point":
        pts.append(np.array([body], dtype=np.float64))
    elif kind == "LineString":
        add_line(body)
    elif kind == "Polygon":
        for r in body:
            add_line(r, ring=True)
    else:  # Multi* / GeometryCollection
        for pk, pb in body:
            s2, p2 = _geom_segments_points(pk, pb)
            segs.extend(s2)
            pts.extend(p2)
    return segs, pts


def _seg_seg_distance(a0, a1, b0, b1) -> float:
    """Min distance between two segments (0 when crossing)."""
    def pt_seg(p, s0, s1):
        d = s1 - s0
        L2 = float(d @ d)
        if L2 == 0.0:
            return float(np.hypot(*(p - s0)))
        t = float(np.clip((p - s0) @ d / L2, 0.0, 1.0))
        return float(np.hypot(*(p - (s0 + t * d))))

    def ccw(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    d1, d2 = ccw(a0, a1, b0), ccw(a0, a1, b1)
    d3, d4 = ccw(b0, b1, a0), ccw(b0, b1, a1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return 0.0
    return min(pt_seg(b0, a0, a1), pt_seg(b1, a0, a1), pt_seg(a0, b0, b1), pt_seg(a1, b0, b1))


def geometry_distance(a_wkb: bytes, b_wkb: bytes) -> float:
    """OGRGeometry::Distance (ogrgeometry.cpp:2039): min planar distance;
    0 when the geometries intersect (including polygon containment)."""
    ka, ba = geom.wkb_loads(bytes(a_wkb))
    kb, bb = geom.wkb_loads(bytes(b_wkb))
    # polygon containment → 0 (a point of one inside the other)
    for (kp, wp, ko, bo_) in ((ka, a_wkb, kb, bb), (kb, b_wkb, ka, ba)):
        if kp in ("Polygon", "MultiPolygon"):
            prep = geom.PreparedPolygon(bytes(wp))
            _, opts = _geom_segments_points(ko, bo_)
            for arr in opts:
                if prep.contains(arr[:, 0], arr[:, 1]).any():
                    return 0.0
    sa, pa = _geom_segments_points(ka, ba)
    sb, pb = _geom_segments_points(kb, bb)
    best = np.inf
    if sa and sb:
        for x0, x1 in sa:
            for y0, y1 in sb:
                best = min(best, _seg_seg_distance(x0, x1, y0, y1))
    elif sa:  # b is point(s)
        for arr in pb:
            for p in arr:
                for x0, x1 in sa:
                    best = min(best, _seg_seg_distance(x0, x1, p, p))
    elif sb:
        for arr in pa:
            for p in arr:
                for y0, y1 in sb:
                    best = min(best, _seg_seg_distance(y0, y1, p, p))
    else:  # point vs point
        for arr in pa:
            for p in arr:
                for arr2 in pb:
                    best = min(best, float(np.min(np.hypot(arr2[:, 0] - p[0], arr2[:, 1] - p[1]))))
    return float(best)


def geometry_boundary(wkb: bytes) -> bytes:
    """OGRGeometry::Boundary (ogrgeometry.cpp:2227): Polygon → the ring set
    as MultiLineString; LineString → MultiPoint of its endpoints (empty for
    closed lines); Point → empty GeometryCollection."""
    import struct

    kind, body = geom.wkb_loads(bytes(wkb))
    if kind in ("Polygon", "MultiPolygon"):
        rings = body if kind == "Polygon" else [r for _, prings in body for r in prings]
        closed = [
            np.vstack([r, r[:1]]) if not np.array_equal(r[0], r[-1]) else np.asarray(r)
            for r in rings
        ]
        return geom.wkb_multilinestring(closed)
    def _mpoint(pts) -> bytes:
        out = [struct.pack("<BII", 1, geom.WKB_MULTIPOINT, len(pts))]
        for p in pts:
            out.append(geom.wkb_point(float(p[0]), float(p[1])))
        return b"".join(out)

    if kind == "LineString":
        arr = np.asarray(body, dtype=np.float64)
        ends = [] if np.array_equal(arr[0], arr[-1]) else [arr[0], arr[-1]]
        return _mpoint(ends)
    if kind == "MultiLineString":
        # mod-2 rule (OGC SFA / OGRGeometry::Boundary): boundary = points
        # that are an endpoint of an ODD number of member lines
        counts: dict = {}
        for lkind, lbody in body:
            assert lkind == "LineString"
            arr = np.asarray(lbody, dtype=np.float64)
            if np.array_equal(arr[0], arr[-1]):
                continue  # closed member contributes no boundary
            for p in (arr[0], arr[-1]):
                key = (float(p[0]), float(p[1]))
                counts[key] = counts.get(key, 0) + 1
        odd = [k for k, v in counts.items() if v % 2 == 1]
        return _mpoint(odd)
    if kind in ("Point", "MultiPoint"):
        # 0-dimensional geometry → empty GeometryCollection
        return struct.pack("<BII", 1, geom.WKB_GEOMETRYCOLLECTION, 0)
    raise ValueError(f"Boundary of {kind} unsupported")


def _segments_self_intersect(arr: np.ndarray) -> bool:
    """Any two non-adjacent segments of the CLOSED ring cross (proper or
    collinear-overlap touch)."""
    r = np.asarray(arr, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    n = r.shape[0]

    def ccw(p, q, s):
        return (q[0] - p[0]) * (s[1] - p[1]) - (q[1] - p[1]) * (s[0] - p[0])

    for i in range(n):
        a0, a1 = r[i], r[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            b0, b1 = r[j], r[(j + 1) % n]
            d1, d2 = ccw(a0, a1, b0), ccw(a0, a1, b1)
            d3, d4 = ccw(b0, b1, a0), ccw(b0, b1, a1)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                return True
    return False


def geometry_is_valid(wkb: bytes) -> bool:
    """OGRGeometry::IsValid (ogrgeometry.cpp:1361) — the practical subset
    GEOS checks that this kernel family relies on: rings have ≥ 4 points
    (closed form) and nonzero area, exterior rings don't self-intersect,
    every hole lies inside its exterior.  Non-polygonal geometries with ≥ 1
    point are valid (matching GEOS for simple points/lines)."""
    kind, body = geom.wkb_loads(bytes(wkb))
    if kind not in ("Polygon", "MultiPolygon"):
        return True
    polys = [body] if kind == "Polygon" else [b for _, b in body]
    from . import clip as clipmod

    for rings in polys:
        for i, r in enumerate(rings):
            arr = np.asarray(r, dtype=np.float64)
            closed = np.array_equal(arr[0], arr[-1])
            if (arr.shape[0] - (1 if closed else 0)) < 3:
                return False
            if abs(clipmod.signed_area(arr)) <= 1e-12:
                return False
            if _segments_self_intersect(arr):
                return False
        ext = geom.PreparedPolygon(geom.wkb_polygon([rings[0]]))
        for hole in rings[1:]:
            h = np.asarray(hole, dtype=np.float64)
            if not ext.contains(h[:, 0], h[:, 1]).all():
                return False
    return True


def simplify_preserve_topology(ring: np.ndarray, tol: float) -> np.ndarray:
    """SimplifyPreserveTopology (ogrgeometry.cpp:3833 → GEOS
    TopologyPreservingSimplifier): Douglas–Peucker, but the result must
    stay a valid simple ring (≥ 3 distinct points, no self-intersection);
    on violation the tolerance halves and the ring re-simplifies (bounded),
    degrading to the original ring — a documented conservative deviation
    from GEOS's per-vertex constraint enforcement with identical
    guarantees (output valid, within tol of the input)."""
    r = np.asarray(ring, dtype=np.float64)
    closed = np.array_equal(r[0], r[-1])
    base = r if closed else np.vstack([r, r[:1]])
    t = float(tol)
    for _ in range(8):
        simp = douglas_peucker(base, t)
        core = simp[:-1] if np.array_equal(simp[0], simp[-1]) else simp
        if core.shape[0] >= 3 and not _segments_self_intersect(simp):
            return simp if closed else core
        t /= 2.0
    return base if closed else r


def force_polygon(wkb: bytes) -> bytes:
    """OGRGeometryFactory::forceToPolygon (ogrgeometryfactory.cpp:496):
    MultiPolygon → one Polygon carrying ALL rings (first part's exterior
    first, remaining parts' rings appended); Polygon passes through."""
    kind, body = geom.wkb_loads(bytes(wkb))
    if kind == "Polygon":
        return bytes(wkb)
    if kind == "MultiPolygon":
        rings = [r for _, prings in body for r in prings]
        return geom.wkb_polygon(rings)
    raise ValueError(f"forceToPolygon: unsupported {kind}")


def force_multipolygon(wkb: bytes) -> bytes:
    """OGRGeometryFactory::forceToMultiPolygon (ogrgeometryfactory.cpp:575):
    Polygon → single-member MultiPolygon; MultiPolygon passes through."""
    kind, body = geom.wkb_loads(bytes(wkb))
    if kind == "MultiPolygon":
        return bytes(wkb)
    if kind == "Polygon":
        return geom.wkb_multipolygon([body])
    raise ValueError(f"forceToMultiPolygon: unsupported {kind}")


def force_multipoint(wkb: bytes) -> bytes:
    """OGRGeometryFactory::forceToMultiPoint (ogrgeometryfactory.cpp:678):
    Point → single-member MultiPoint; MultiPoint passes through; a
    GeometryCollection promotes iff EVERY member is a Point (an empty
    collection promotes — the all-point check is vacuously true, :704-711);
    any other geometry returns UNCHANGED (the reference returns the input
    rather than erroring, :729-730)."""
    kind, body = geom.wkb_loads(bytes(wkb))
    if kind == "MultiPoint":
        return bytes(wkb)
    if kind == "Point":
        return geom.wkb_multipoint([body])
    if kind == "GeometryCollection" and all(k == "Point" for k, _ in body):
        return geom.wkb_multipoint([b for _, b in body])
    return bytes(wkb)


def force_multilinestring(wkb: bytes) -> bytes:
    """OGRGeometryFactory::forceToMultiLineString
    (ogrgeometryfactory.cpp:783): MultiLineString passes through; a
    GeometryCollection of only LineStrings promotes (empty promotes);
    LineString wraps; Polygon → one LineString PER RING (exterior first,
    then holes, empty rings skipped, :857-877); MultiPolygon → the rings
    of every member polygon in order (:884-925); anything else returns
    unchanged."""
    kind, body = geom.wkb_loads(bytes(wkb))
    if kind == "MultiLineString":
        return bytes(wkb)
    if kind == "GeometryCollection" and all(k == "LineString" for k, _ in body):
        return geom.wkb_multilinestring([b for _, b in body])
    if kind == "LineString":
        return geom.wkb_multilinestring([body])
    if kind == "Polygon":
        return geom.wkb_multilinestring([r for r in body if len(r) > 0])
    if kind == "MultiPolygon":
        return geom.wkb_multilinestring(
            [r for _, rings in body for r in rings if len(r) > 0]
        )
    return bytes(wkb)


# ---------------------------------------------------------------------------
# organizePolygons (OGRGeometryFactory::organizePolygons,
# ogr/ogrgeometryfactory.cpp:1055): assemble a flat ring soup into
# polygons-with-holes by containment nesting — the step drivers run after
# reading formats that store rings unstructured (shapefile rule), and the
# general companion of the dateline splitter.
# ---------------------------------------------------------------------------


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd ray cast of one point against one ring (vectorized edges)."""
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    cross = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cross & (px < xint)) % 2)


def organize_polygons(rings: list) -> list:
    """Ring soup → list of polygons (each ``[exterior, hole, ...]``).

    DEFAULT-method semantics for non-crossing rings: rings sorted by
    |area| descending; each ring nests inside the smallest previously
    placed ring containing it; even nesting depth → new exterior, odd →
    hole of its parent exterior (islands inside holes become their own
    polygons).  Ring orientation in the output follows OGR convention:
    exterior CCW, holes CW.
    """
    from . import clip as clipmod

    items = []
    for r in rings:
        arr = np.asarray(r, dtype=np.float64)
        if arr.shape[0] >= 3 and abs(clipmod.signed_area(arr)) > 1e-12:
            items.append(arr)
    order = sorted(range(len(items)), key=lambda i: -abs(clipmod.signed_area(items[i])))
    depth = {}
    parent_exterior = {}
    polygons: dict = {}  # exterior index -> [exterior, holes...]
    placed: list = []
    for i in order:
        ring = items[i]
        bx0, by0 = ring[:, 0].min(), ring[:, 1].min()
        bx1, by1 = ring[:, 0].max(), ring[:, 1].max()
        container = None
        # placed is in descending area order: scan backwards = smallest first
        for j in reversed(placed):
            rj = items[j]
            if bx0 < rj[:, 0].min() or bx1 > rj[:, 0].max():
                continue
            if by0 < rj[:, 1].min() or by1 > rj[:, 1].max():
                continue
            if _point_in_ring(float(ring[0, 0]), float(ring[0, 1]), rj):
                container = j
                break
        if container is None:
            depth[i] = 0
        else:
            depth[i] = depth[container] + 1
        if depth[i] % 2 == 0:  # exterior (possibly island inside a hole)
            ext = clipmod.ensure_ccw(ring)
            polygons[i] = [ext]
            parent_exterior[i] = i
        else:  # hole of the containing exterior
            owner = parent_exterior[container]
            hole = clipmod.ensure_ccw(ring)[::-1].copy()  # CW per convention
            polygons[owner].append(hole)
            parent_exterior[i] = owner
        placed.append(i)
    return [polygons[i] for i in sorted(polygons)]


def organize_polygons_wkb(ring_wkbs: list) -> bytes:
    """WKB polygon/ring list → one organized MultiPolygon WKB."""
    rings = []
    for b in ring_wkbs:
        rings.extend(geom.polygon_rings(bytes(b)))
    return geom.wkb_multipolygon(organize_polygons(rings))


# ---------------------------------------------------------------------------
# approximateArcAngles (OGRGeometryFactory::approximateArcAngles,
# ogr/ogrgeometryfactory.cpp:2523): stroke an (elliptical) arc into a
# LineString — the factory op DXF/DWG-style drivers run on arc records.
# ---------------------------------------------------------------------------


def approximate_arc_angles(
    cx: float,
    cy: float,
    primary_radius: float,
    secondary_radius: float,
    rotation_deg: float = 0.0,
    start_angle_deg: float = 0.0,
    end_angle_deg: float = 360.0,
    max_step_deg: float = 4.0,
) -> np.ndarray:
    """Vertex array (n, 2) of the stroked arc, reproducing the reference's
    exact vertex rule: angles are NEGATED (clockwise-of-X convention),
    vertex count = max(2, ceil(|end-start| / step) + 1), uniform slices
    inclusive of both endpoints, ellipse point rotated CLOCKWISE by
    ``rotation_deg`` about the center.  Default step 4° is the reference's
    OGR_ARC_STEPSIZE default."""
    if max_step_deg <= 0:
        max_step_deg = 4.0
    start, end = -float(start_angle_deg), -float(end_angle_deg)
    n = max(2, int(math.ceil(abs(end - start) / max_step_deg)) + 1)
    ang = np.radians(start + (end - start) / (n - 1) * np.arange(n))
    ex = np.cos(ang) * float(primary_radius)
    ey = np.sin(ang) * float(secondary_radius)
    rot = math.radians(float(rotation_deg))
    x = cx + ex * math.cos(rot) + ey * math.sin(rot)
    y = cy - ex * math.sin(rot) + ey * math.cos(rot)
    return np.column_stack([x, y])


def approximate_arc_angles_wkb(*args, **kwargs) -> bytes:
    """WKB LineString form of :func:`approximate_arc_angles`."""
    return geom.wkb_linestring(approximate_arc_angles(*args, **kwargs))
