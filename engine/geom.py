"""Pure-numpy geometry kernel: WKB codec + vectorized point-in-polygon.

Replaces the reference's GEOS-backed predicates for the subset this engine
needs (shapely is unavailable in the target runtime, SURVEY.md §7 risk (e)):

* WKB encode/decode for Point / LineString / Polygon / MultiPolygon
  (``ogr/ogrgeometryfactory.cpp:77`` createFromWkb — same ISO WKB layout).
* Envelope computation (``OGRGeometry::getEnvelope``) → the bbox sidecar
  columns used for the two-phase spatial filter.
* Vectorized many-points × one-polygon intersects test replicating the
  FilterGeometry cascade (``ogr/ogrsf_frmts/generic/ogrlayer.cpp:1296-1405``):
  bbox reject → even-odd ray cast with exact on-boundary detection
  (boundary counts as a match = GEOS Intersects, :1394-1401).

All kernels operate on numpy float64 arrays and are called from pandas UDFs;
per-polygon Python iteration only over the (small) polygon list, never over
points.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_BO = {0: ">", 1: "<"}


# ---------------------------------------------------------------------------
# WKB codec
# ---------------------------------------------------------------------------


def _read_header(buf: bytes, off: int):
    bo = _BO[buf[off]]
    (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
    return bo, gtype & 0xFF, off + 5  # mask off 2.5D/SRID flags (wkbFlatten, ogr_core.h:347)


def _read_ring(buf: bytes, off: int, bo: str):
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype=np.dtype(np.float64).newbyteorder(bo), count=2 * n, offset=off)
    return pts.reshape(n, 2).astype(np.float64), off + 16 * n


def _parse(buf: bytes, off: int):
    bo, gtype, off = _read_header(buf, off)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return ("Point", (x, y)), off + 16
    if gtype == WKB_LINESTRING:
        ring, off = _read_ring(buf, off, bo)
        return ("LineString", ring), off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off, bo)
            rings.append(ring)
        return ("Polygon", rings), off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (nparts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            part, off = _parse(buf, off)
            parts.append(part)
        names = {
            WKB_MULTIPOINT: "MultiPoint",
            WKB_MULTILINESTRING: "MultiLineString",
            WKB_MULTIPOLYGON: "MultiPolygon",
            WKB_GEOMETRYCOLLECTION: "GeometryCollection",
        }
        return (names[gtype], parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_loads(buf: bytes):
    """Parse WKB → ("Point",(x,y)) | ("Polygon",[rings]) | ("MultiPolygon",[parts]) ..."""
    geom, _ = _parse(bytes(buf), 0)
    return geom


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def wkb_polygon(rings) -> bytes:
    """rings: list of (N,2) arrays/lists, first = exterior. Rings are closed
    automatically (first point appended) if not already closed."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_multipolygon(polys) -> bytes:
    """polys: list of ring-lists."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def polygon_rings(buf: bytes):
    """WKB Polygon/MultiPolygon → flat list of rings (exterior+holes mixed).

    Even-odd ray casting treats holes and islands uniformly, so a flat ring
    list is sufficient for the intersects test.
    """
    kind, body = wkb_loads(buf)
    if kind == "Polygon":
        return body
    if kind == "MultiPolygon":
        rings = []
        for pkind, prings in body:
            assert pkind == "Polygon"
            rings.extend(prings)
        return rings
    raise ValueError(f"expected polygonal WKB, got {kind}")


def envelope(buf: bytes):
    """(minx, miny, maxx, maxy) of any supported WKB geometry
    (OGRGeometry::getEnvelope analog) — the bbox sidecar columns."""
    kind, body = wkb_loads(buf)
    pts = _all_points(kind, body)
    arr = np.vstack(pts)
    return float(arr[:, 0].min()), float(arr[:, 1].min()), float(arr[:, 0].max()), float(arr[:, 1].max())


def _all_points(kind, body):
    if kind == "Point":
        return [np.array([body])]
    if kind == "LineString":
        return [body]
    if kind == "Polygon":
        return list(body)
    pts = []
    for pkind, pbody in body:
        pts.extend(_all_points(pkind, pbody))
    return pts


# ---------------------------------------------------------------------------
# Vectorized point-in-polygon
# ---------------------------------------------------------------------------


class PreparedPolygon:
    """Pre-parsed polygon for repeated many-point tests — the engine's analog
    of GEOS prepared geometries (OGRPreparedGeometry, ogrlayer.cpp:1397-1399).

    Edges of all rings are flattened into contiguous arrays once; each
    contains() call is pure vectorized numpy over the point arrays.
    """

    __slots__ = ("x1", "y1", "x2", "y2", "minx", "miny", "maxx", "maxy")

    def __init__(self, wkb_buf: bytes):
        rings = polygon_rings(wkb_buf)
        segs = []
        for ring in rings:
            ring = np.asarray(ring, dtype=np.float64)
            if not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            segs.append(np.hstack([ring[:-1], ring[1:]]))
        edges = np.vstack(segs)
        self.x1, self.y1, self.x2, self.y2 = (np.ascontiguousarray(edges[:, i]) for i in range(4))
        self.minx = float(min(self.x1.min(), self.x2.min()))
        self.maxx = float(max(self.x1.max(), self.x2.max()))
        self.miny = float(min(self.y1.min(), self.y2.min()))
        self.maxy = float(max(self.y1.max(), self.y2.max()))

    def contains(self, px: np.ndarray, py: np.ndarray, chunk: int = 65536) -> np.ndarray:
        """Vectorized intersects test: True for interior OR boundary points
        (GEOS Intersects rule, ogrlayer.cpp:1394-1401).  Two-phase: bbox
        reject first (FilterGeometry envelope prefilter :1315-1323), exact
        even-odd ray cast + on-segment check on survivors only."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.zeros(px.shape[0], dtype=bool)
        cand = (px >= self.minx) & (px <= self.maxx) & (py >= self.miny) & (py <= self.maxy)
        idx = np.nonzero(cand)[0]
        for s in range(0, idx.shape[0], chunk):
            sub = idx[s : s + chunk]
            out[sub] = self._test(px[sub], py[sub])
        return out

    def _test(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        x1, y1, x2, y2 = self.x1, self.y1, self.x2, self.y2
        P, E = px.shape[0], x1.shape[0]
        if P == 0:
            return np.zeros(0, dtype=bool)
        pxc = px[:, None]
        pyc = py[:, None]
        # crossing test: edge straddles the horizontal ray at py
        straddle = (y1[None, :] > pyc) != (y2[None, :] > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x1[None, :] + (pyc - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            )
        crossings = (straddle & (pxc < xin)).sum(axis=1)
        inside = (crossings % 2) == 1
        # exact boundary: cross product zero AND within segment envelope
        cross = (x2 - x1)[None, :] * (pyc - y1[None, :]) - (y2 - y1)[None, :] * (pxc - x1[None, :])
        on_seg = (
            (cross == 0.0)
            & (pxc >= np.minimum(x1, x2)[None, :])
            & (pxc <= np.maximum(x1, x2)[None, :])
            & (pyc >= np.minimum(y1, y2)[None, :])
            & (pyc <= np.maximum(y1, y2)[None, :])
        ).any(axis=1)
        return inside | on_seg


def prepare_polygons(pid_wkb_pairs):
    """[(pid, wkb)] → [(pid, PreparedPolygon)] — built once per executor via
    broadcast; mirrors the reference's 'copy method layer to memory' advice
    (ogrlayer.cpp:1915-1916)."""
    return [(pid, PreparedPolygon(w)) for pid, w in pid_wkb_pairs]
