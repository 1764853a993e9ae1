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
    # wkbFlatten (ogr_core.h:347): strip the 2.5D flag but REMEMBER it —
    # a Z geometry carries 3 doubles per vertex that the 2D readers must skip
    has_z = bool(gtype & 0x80000000)
    return bo, gtype & 0xFF, has_z, off + 5


def _read_ring(buf: bytes, off: int, bo: str, has_z: bool = False):
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    dims = 3 if has_z else 2
    pts = np.frombuffer(buf, dtype=np.dtype(np.float64).newbyteorder(bo), count=dims * n, offset=off)
    pts = pts.reshape(n, dims)[:, :2]
    return pts.astype(np.float64), off + 8 * dims * n


def _parse(buf: bytes, off: int):
    bo, gtype, has_z, off = _read_header(buf, off)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return ("Point", (x, y)), off + (24 if has_z else 16)
    if gtype == WKB_LINESTRING:
        ring, off = _read_ring(buf, off, bo, has_z)
        return ("LineString", ring), off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off, bo, has_z)
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


# -- 2.5D (Z) support: the wkb25DBit flag (ogr_core.h:347) ------------------

_WKB_25D = 0x80000000


def _read_pts_z(buf: bytes, off: int, bo: str, has_z: bool):
    """Read a vertex run as (N,3) float64; z = 0 when the geometry is 2D."""
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    dims = 3 if has_z else 2
    pts = np.frombuffer(
        buf, dtype=np.dtype(np.float64).newbyteorder(bo), count=dims * n, offset=off
    ).reshape(n, dims)
    if not has_z:
        pts = np.column_stack([pts, np.zeros(n)])
    return pts.astype(np.float64), off + 8 * dims * n


def _collect_parts_z(buf: bytes, off: int, parts: list):
    """Recursive part collector mirroring GDALCollectRingsFromGeometry
    (alg/gdalrasterize.cpp:176-283): points → 1-vertex parts, linestrings →
    one part each, polygons → one part PER RING (exterior first), multis
    recurse in order.  Returns (flat geometry kind of the outermost
    geometry, next offset); appends (N,3) arrays to ``parts``."""
    bo = _BO[buf[off]]
    (raw,) = struct.unpack_from(bo + "I", buf, off + 1)
    has_z = bool(raw & _WKB_25D)
    gtype = raw & 0xFF
    off += 5
    if gtype == WKB_POINT:
        dims = 3 if has_z else 2
        vals = struct.unpack_from(bo + "d" * dims, buf, off)
        parts.append(np.array([[vals[0], vals[1], vals[2] if has_z else 0.0]]))
        return "Point", off + 8 * dims
    if gtype == WKB_LINESTRING:
        pts, off = _read_pts_z(buf, off, bo, has_z)
        parts.append(pts)
        return "LineString", off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        for _ in range(nrings):
            ring, off = _read_pts_z(buf, off, bo, has_z)
            parts.append(ring)
        return "Polygon", off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (nparts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        kind = "GeometryCollection"
        inner = None
        for _ in range(nparts):
            inner, off = _collect_parts_z(buf, off, parts)
        names = {
            WKB_MULTIPOINT: "MultiPoint",
            WKB_MULTILINESTRING: "MultiLineString",
            WKB_MULTIPOLYGON: "MultiPolygon",
            WKB_GEOMETRYCOLLECTION: "GeometryCollection",
        }
        return names[gtype], off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def collect_parts_z(buf: bytes):
    """(kind, [ (N,3) float64 arrays ]) — vertex parts with Z (0 when 2D),
    in GDALCollectRingsFromGeometry order.  The rasterizer's
    BURN_VALUE_FROM=Z source: parts[0][0, 2] is aPointVariant[0]."""
    parts: list = []
    kind, _ = _collect_parts_z(bytes(buf), 0, parts)
    return kind, parts


def wkb_point_z(x: float, y: float, z: float) -> bytes:
    return struct.pack("<BIddd", 1, WKB_POINT | _WKB_25D, x, y, z)


def wkb_linestring_z(pts) -> bytes:
    """pts: (N,3) x/y/z."""
    pts = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BII", 1, WKB_LINESTRING | _WKB_25D, pts.shape[0]) + pts.astype("<f8").tobytes()


def wkb_polygon_z(rings) -> bytes:
    """rings: list of (N,3) arrays, first = exterior; closed automatically."""
    out = [struct.pack("<BII", 1, WKB_POLYGON | _WKB_25D, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def wkb_linestring(pts) -> bytes:
    pts = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BII", 1, WKB_LINESTRING, pts.shape[0]) + pts.astype("<f8").tobytes()


def wkb_multipoint(pts) -> bytes:
    """pts: list of (x, y)."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(pts))]
    for x, y in pts:
        out.append(wkb_point(float(x), float(y)))
    return b"".join(out)


def wkb_multilinestring(lines) -> bytes:
    """lines: list of (N,2) arrays."""
    out = [struct.pack("<BII", 1, WKB_MULTILINESTRING, len(lines))]
    for pts in lines:
        out.append(wkb_linestring(pts))
    return b"".join(out)


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


def _wkt_num(v: float) -> str:
    """GDAL WKT number format (OGRMakeWktCoordinate %.15g): integral values
    print without a decimal point."""
    return f"{v:.15g}"


def _wkt_coords(pts) -> str:
    return ",".join(f"{_wkt_num(x)} {_wkt_num(y)}" for x, y in np.asarray(pts, dtype=np.float64))


def wkt_dumps(buf: bytes) -> str:
    """WKB → WKT (OGRGeometry::exportToWkt analog, GDAL formatting)."""
    kind, body = wkb_loads(buf)
    return _wkt_geom(kind, body)


def _wkt_geom(kind, body) -> str:
    if kind == "Point":
        return f"POINT ({_wkt_num(body[0])} {_wkt_num(body[1])})"
    if kind == "LineString":
        return f"LINESTRING ({_wkt_coords(body)})"
    if kind == "Polygon":
        rings = ",".join(f"({_wkt_coords(r)})" for r in body)
        return f"POLYGON ({rings})"
    if kind == "MultiPoint":
        pts = ",".join(f"{_wkt_num(b[0])} {_wkt_num(b[1])}" for _, b in body)
        return f"MULTIPOINT ({pts})"
    if kind == "MultiLineString":
        parts = ",".join(f"({_wkt_coords(b)})" for _, b in body)
        return f"MULTILINESTRING ({parts})"
    if kind == "MultiPolygon":
        parts = ",".join(
            "(" + ",".join(f"({_wkt_coords(r)})" for r in b) + ")" for _, b in body
        )
        return f"MULTIPOLYGON ({parts})"
    raise ValueError(f"WKT export unsupported for {kind}")


def wkb_geometry_name(buf: bytes) -> str:
    """OGRGeometry::getGeometryName: 'POINT', 'POLYGON', ... (the value of
    the OGR_GEOMETRY special field, ogr/ogr_sql.dox:459)."""
    kind, _ = wkb_loads(bytes(buf))
    return {
        "Point": "POINT", "LineString": "LINESTRING", "Polygon": "POLYGON",
        "MultiPoint": "MULTIPOINT", "MultiLineString": "MULTILINESTRING",
        "MultiPolygon": "MULTIPOLYGON", "GeometryCollection": "GEOMETRYCOLLECTION",
    }[kind]


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

    __slots__ = ("x1", "y1", "x2", "y2", "minx", "miny", "maxx", "maxy", "is_rect")

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
        # exact-rectangle flag (the GEOS prepared-geometry shortcut): a
        # single 4-edge axis-parallel ring with |shoelace area| == bbox area
        # IS its bbox, so intersects == the bbox test — contains() then
        # skips the ray cast entirely.  Grid/tile dimension layers are the
        # common case.
        self.is_rect = False
        if self.x1.shape[0] == 4 and bool(
            np.all((self.x1 == self.x2) | (self.y1 == self.y2))
        ):
            area2 = abs(float(np.sum(self.x1 * self.y2 - self.x2 * self.y1)))
            if area2 == 2.0 * (self.maxx - self.minx) * (self.maxy - self.miny):
                self.is_rect = True

    def contains(self, px: np.ndarray, py: np.ndarray, chunk: int = 65536) -> np.ndarray:
        """Vectorized intersects test: True for interior OR boundary points
        (GEOS Intersects rule, ogrlayer.cpp:1394-1401).  Two-phase: bbox
        reject first (FilterGeometry envelope prefilter :1315-1323), exact
        even-odd ray cast + on-segment check on survivors only."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.is_rect:
            # interior-or-boundary of an axis-aligned rectangle IS the bbox
            # test — identical truth table to parity|on_seg
            return (px >= self.minx) & (px <= self.maxx) & (py >= self.miny) & (py <= self.maxy)
        # small batches: the exact test is correct for any point (ray parity
        # is 0 outside), so skip the bbox-mask machinery — its fixed numpy
        # overhead dominates when called once per (cell, polygon) group
        if px.shape[0] <= 4096:
            return self._test(px, py)
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


class VectorPIPIndex:
    """Fully-vectorized many-points × many-polygons intersects index.

    The scalable replacement for looping PreparedPolygon.contains per
    (cell, polygon) group: polygons with ≤ ``emax`` edges go into one
    NaN-padded dense edge tensor ``(n_polys, emax, 4)``; a uniform grid maps
    each point cell to a fixed-width candidate matrix.  A query expands
    (point, candidate) pairs and evaluates ray-cast parity + exact boundary
    for ALL pairs in a handful of broadcasted numpy ops — no python loop
    over cells or polygons.  (NaN pad edges: every comparison with NaN is
    False, so padding contributes neither crossings nor boundary hits.)

    Oversized polygons (> emax edges) fall back to PreparedPolygon scans —
    they are few by construction (a layer of huge polygons broadcasts fine
    as per-polygon vector tests).

    Semantics identical to PreparedPolygon.contains: interior or boundary
    (GEOS Intersects, ogrlayer.cpp:1394-1401).
    """

    def __init__(self, pid_wkb: list, cells: int | None = None, emax: int = 64, kmax: int = 8):
        if cells is None:
            # index cell ~1/4 the linear size of an average polygon: candidate
            # count per point ≈ (s/p + 1)² shrinks quadratically with finer
            # cells, and the candidate matrix stays small (measured optimum)
            cells = max(16, min(256, 4 * int(max(len(pid_wkb), 1) ** 0.5)))
        self.cells = cells
        self.step_x = 360.0 / cells
        self.step_y = 180.0 / cells
        dense_raw = []
        dense_pid = []
        dense_bbox = []
        self.fallback = []  # [(pid, PreparedPolygon)]
        for pid, wkb in pid_wkb:
            prep = PreparedPolygon(wkb)
            n_edges = prep.x1.shape[0]
            if n_edges <= emax:
                dense_raw.append(prep)
                dense_pid.append(pid)
                dense_bbox.append((prep.minx, prep.miny, prep.maxx, prep.maxy))
            else:
                self.fallback.append((pid, prep))
        self.n_dense = len(dense_pid)
        # pad only to the ACTUAL max edge count — excess pad width multiplies
        # memory traffic directly (measured 20x slowdown padding 4-edge cells
        # to 64).  Layout: per-edge-slot arrays (width, n_dense) so the hot
        # loop gathers (chunk,) vectors from small cache-resident sources
        # instead of materializing a (chunk, width, 4) tensor.
        width = max((p.x1.shape[0] for p in dense_raw), default=1)
        self.edge_width = width
        self.ex1 = np.full((width, self.n_dense), np.nan)
        self.ey1 = np.full((width, self.n_dense), np.nan)
        self.ex2 = np.full((width, self.n_dense), np.nan)
        self.ey2 = np.full((width, self.n_dense), np.nan)
        # per-polygon bbox columns + exact-rectangle flag.  A polygon whose
        # single 4-edge ring is axis-parallel with |shoelace area| == bbox
        # area IS its bbox, so intersects == bbox containment — the same
        # rectangle shortcut GEOS prepared geometries take.  Grid/tile
        # layers (the common dimension shape) then skip the ray-cast
        # entirely, and every other pair gets a bbox pre-filter before the
        # edge loop — both cut the per-pair temporary allocations that
        # dominate this kernel's cost at scale.
        self.bminx = np.array([b[0] for b in dense_bbox], dtype=np.float64)
        self.bminy = np.array([b[1] for b in dense_bbox], dtype=np.float64)
        self.bmaxx = np.array([b[2] for b in dense_bbox], dtype=np.float64)
        self.bmaxy = np.array([b[3] for b in dense_bbox], dtype=np.float64)
        self.is_rect = np.zeros(max(self.n_dense, 1), dtype=bool)[: self.n_dense]
        for i, prep in enumerate(dense_raw):
            n = prep.x1.shape[0]
            self.ex1[:n, i] = prep.x1
            self.ey1[:n, i] = prep.y1
            self.ex2[:n, i] = prep.x2
            self.ey2[:n, i] = prep.y2
            if prep.is_rect:
                self.is_rect[i] = True
        # dense edges also as (n_dense, width, 4) for the per-cell overflow path
        self.edges = np.stack(
            [self.ex1.T, self.ey1.T, self.ex2.T, self.ey2.T], axis=2
        ) if self.n_dense else np.zeros((0, width, 4))
        self.pid = np.asarray(dense_pid, dtype=np.int64)
        # grid → fixed-width candidate matrix (-1 pad); overflow goes to a
        # per-cell python list (rare: means >kmax polygons overlap one cell)
        grid_lists: dict = {}
        for di, (minx, miny, maxx, maxy) in enumerate(dense_bbox):
            cx0 = max(int((minx + 180.0) // self.step_x), 0)
            cx1 = min(int((maxx + 180.0) // self.step_x), cells - 1)
            cy0 = max(int((miny + 90.0) // self.step_y), 0)
            cy1 = min(int((maxy + 90.0) // self.step_y), cells - 1)
            for cx in range(cx0, cx1 + 1):
                for cy in range(cy0, cy1 + 1):
                    grid_lists.setdefault(cx * cells + cy, []).append(di)
        width = max((len(v) for v in grid_lists.values()), default=1)
        self.kmax = min(width, kmax)
        self.cand = np.full((cells * cells, self.kmax), -1, dtype=np.int64)
        self.overflow: dict = {}
        for c, lst in grid_lists.items():
            if len(lst) <= self.kmax:
                self.cand[c, : len(lst)] = lst
            else:
                self.cand[c, :] = lst[: self.kmax]
                self.overflow[c] = tuple(lst[self.kmax :])

    def query(self, lon: np.ndarray, lat: np.ndarray, pair_chunk: int = 131072):
        """→ (point_index_array, polygon_id_array) of all intersecting pairs."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        P = lon.shape[0]
        out_pt: list = []
        out_pid: list = []
        if self.n_dense and P:
            cx = np.clip(((lon + 180.0) // self.step_x).astype(np.int64), 0, self.cells - 1)
            cy = np.clip(((lat + 90.0) // self.step_y).astype(np.int64), 0, self.cells - 1)
            cell = cx * self.cells + cy
            cmat = self.cand[cell]  # (P, kmax)
            valid = cmat >= 0
            pair_pt = np.repeat(np.arange(P, dtype=np.int64), self.kmax)[valid.ravel()]
            pair_poly = cmat.ravel()[valid.ravel()]
            for s in range(0, pair_pt.shape[0], pair_chunk):
                pt = pair_pt[s : s + pair_chunk]
                pl = pair_poly[s : s + pair_chunk]
                px = lon[pt]
                py = lat[pt]
                # bbox gate first: candidates come from coarse index cells,
                # so most pairs die on 4 compares instead of the edge loop;
                # exact rectangles (is_rect) are fully DECIDED by it
                inbox = (
                    (px >= self.bminx[pl])
                    & (px <= self.bmaxx[pl])
                    & (py >= self.bminy[pl])
                    & (py <= self.bmaxy[pl])
                )
                rect = self.is_rect[pl]
                hit = inbox & rect
                need = np.nonzero(inbox & ~rect)[0]
                if need.size:
                    px2 = px[need]
                    py2 = py[need]
                    pl2 = pl[need]
                    # per-edge-slot loop over (chunk,) vectors: every operand
                    # stays L2-resident; parity accumulates by XOR and
                    # boundary by OR in place (the (chunk, width) tensor
                    # formulation was DRAM-bandwidth-bound and collapsed
                    # under multi-worker load)
                    parity = np.zeros(need.size, dtype=bool)
                    on_seg = np.zeros(need.size, dtype=bool)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        for e in range(self.edge_width):
                            x1 = self.ex1[e][pl2]
                            y1 = self.ey1[e][pl2]
                            x2 = self.ex2[e][pl2]
                            y2 = self.ey2[e][pl2]
                            straddle = (y1 > py2) != (y2 > py2)
                            xin = x1 + (py2 - y1) / (y2 - y1) * (x2 - x1)
                            np.logical_xor(parity, straddle & (px2 < xin), out=parity)
                            cross = (x2 - x1) * (py2 - y1) - (y2 - y1) * (px2 - x1)
                            on_e = (
                                (cross == 0.0)
                                & (px2 >= np.minimum(x1, x2))
                                & (px2 <= np.maximum(x1, x2))
                                & (py2 >= np.minimum(y1, y2))
                                & (py2 <= np.maximum(y1, y2))
                            )
                            np.logical_or(on_seg, on_e, out=on_seg)
                    hit[need] = parity | on_seg
                if hit.any():
                    out_pt.append(pt[hit])
                    out_pid.append(self.pid[pl[hit]])
            # overflow cells (rare): per-cell candidate tail
            if self.overflow:
                for c, tail in self.overflow.items():
                    rows = np.nonzero(cell == c)[0]
                    if not rows.size:
                        continue
                    for di in tail:
                        e = self.edges[di]
                        prep_hits = _edges_contains(e, lon[rows], lat[rows])
                        if prep_hits.any():
                            out_pt.append(rows[prep_hits])
                            out_pid.append(np.full(int(prep_hits.sum()), self.pid[di]))
        for pid, prep in self.fallback:
            hits = prep.contains(lon, lat)
            if hits.any():
                rows = np.nonzero(hits)[0]
                out_pt.append(rows)
                out_pid.append(np.full(rows.size, pid, dtype=np.int64))
        if not out_pt:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_pid)


def _edges_contains(e: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Ray-cast + boundary over one NaN-padded edge array (emax, 4)."""
    x1, y1, x2, y2 = e[:, 0][None, :], e[:, 1][None, :], e[:, 2][None, :], e[:, 3][None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        straddle = (y1 > pyc) != (y2 > pyc)
        xin = x1 + (pyc - y1) / (y2 - y1) * (x2 - x1)
        crossings = (straddle & (pxc < xin)).sum(axis=1)
        cross = (x2 - x1) * (pyc - y1) - (y2 - y1) * (pxc - x1)
        on_seg = (
            (cross == 0.0)
            & (pxc >= np.minimum(x1, x2))
            & (pxc <= np.maximum(x1, x2))
            & (pyc >= np.minimum(y1, y2))
            & (pyc <= np.maximum(y1, y2))
        ).any(axis=1)
    return ((crossings % 2) == 1) | on_seg


def polygon_parts(buf: bytes):
    """WKB Polygon/MultiPolygon → list of parts, each part a ring-list
    [exterior, hole, ...] (numpy float64 arrays).  The structured accessor
    the overlay kernel needs (polygon_rings flattens parts+holes, which is
    right for even-odd PIP but loses part attribution)."""
    kind, body = wkb_loads(buf)
    if kind == "Polygon":
        return [[np.asarray(r, dtype=np.float64) for r in body]]
    if kind == "MultiPolygon":
        out = []
        for pkind, prings in body:
            assert pkind == "Polygon"
            out.append([np.asarray(r, dtype=np.float64) for r in prings])
        return out
    raise ValueError(f"expected polygonal WKB, got {kind}")
