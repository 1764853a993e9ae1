"""Pure-numpy polygon clipping kernel: the GEOS replacement for layer algebra.

The reference's layer-algebra family (Intersection/Union/SymDifference/
Identity/Update/Clip/Erase, ogr/ogrsf_frmts/generic/ogrlayer.cpp:1954-3660)
computes per-pair GEOS overlays.  GEOS/shapely is unavailable in this
runtime (SURVEY.md §7 risk (e)), so this module supplies an exact overlay
kernel built from three primitives:

1. **Ear-clip triangulation** of simple (possibly concave) rings —
   O(n²), fine for polygon-layer vertex counts.
2. **Convex ∩ convex** via Sutherland–Hodgman half-plane clipping —
   each output piece is a clean convex ring (no S-H bridge artifacts,
   because both operands are triangles).
3. **Convex \\ triangle** via the disjoint half-plane decomposition
   ``T \\ (H1∩H2∩H3) = (T∩¬H1) ⊔ (T∩H1∩¬H2) ⊔ (T∩H1∩H2∩¬H3)``.

An overlay result is therefore a *dissected exact cover*: a list of disjoint
convex pieces whose union equals the true GEOS result and whose total area
matches it exactly (up to float rounding).  This is the documented deviation
from the reference: GDAL emits one merged GEOS geometry per pair; we emit an
equal-area MultiPolygon dissection (area, coverage and point-membership are
identical — verified by PIP-sample parity tests).

Holes: polygons may carry interior rings — :func:`merge_holes` bridge-cuts
them into the exterior (the earcut device) before ear clipping, so every
overlay op accepts either a single exterior ring or an
``[exterior, hole, ...]`` ring-list.

All functions are driver/executor-side pure Python+numpy called from
``applyInPandas`` — never per-row Python in a Spark hot path.
"""

from __future__ import annotations

import numpy as np

AREA_EPS = 1e-12  # drop degenerate slivers below this area


# ---------------------------------------------------------------------------
# Ring basics
# ---------------------------------------------------------------------------


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of an (N,2) open or closed ring (CCW > 0)."""
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return float(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    """Return the ring open (unclosed) and counter-clockwise."""
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    return r if signed_area(r) >= 0 else r[::-1].copy()


# ---------------------------------------------------------------------------
# Ear-clip triangulation (simple polygons, concave OK, no holes)
# ---------------------------------------------------------------------------


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c, eps=1e-12) -> bool:
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    return d1 >= -eps and d2 >= -eps and d3 >= -eps


def triangulate(ring) -> list:
    """Ear-clip a simple CCW ring into triangles [(3,2) float64 arrays].

    Property (tested): Σ triangle areas == ring area; triangles are disjoint
    and cover the polygon.  Collinear vertices are tolerated (zero-area ears
    are clipped freely).
    """
    pts = ensure_ccw(ring)
    n = pts.shape[0]
    if n < 3:
        return []
    idx = list(range(n))
    tris: list = []
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        ear_found = False
        m = len(idx)
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            conv = _cross(a, b, c)
            if conv < -AREA_EPS:
                continue  # reflex vertex
            # no other remaining vertex strictly inside the candidate ear
            ok = True
            if conv > AREA_EPS:
                for j in idx:
                    if j in (i0, i1, i2):
                        continue
                    if _point_in_tri(pts[j], a, b, c, eps=-1e-12):
                        ok = False
                        break
            if ok:
                if conv > AREA_EPS:
                    tris.append(np.array([a, b, c]))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:
            # numerically stuck (degenerate input): fall back to fan — area
            # still correct for star-shaped remainders; better than failing
            break
    if len(idx) >= 3:
        p0 = pts[idx[0]]
        for k in range(1, len(idx) - 1):
            t = np.array([p0, pts[idx[k]], pts[idx[k + 1]]])
            if abs(signed_area(t)) > AREA_EPS:
                tris.append(t)
    return tris


def _seg_blocked(p, q, rings, skip=()):
    """True if open segment p→q properly crosses any ring edge (shared
    endpoints don't block) — the visibility test for bridge construction."""
    px, py = p
    qx, qy = q
    for ri, ring in enumerate(rings):
        n = ring.shape[0]
        for i in range(n):
            if (ri, i) in skip:
                continue
            a = ring[i]
            b = ring[(i + 1) % n]
            if (tuple(a) in (tuple(p), tuple(q))) or (tuple(b) in (tuple(p), tuple(q))):
                continue
            d1 = (qx - px) * (a[1] - py) - (qy - py) * (a[0] - px)
            d2 = (qx - px) * (b[1] - py) - (qy - py) * (b[0] - px)
            d3 = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
            d4 = (b[0] - a[0]) * (qy - a[1]) - (b[1] - a[1]) * (qx - a[0])
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                return True
    return False


def merge_holes(exterior: np.ndarray, holes: list) -> np.ndarray:
    """Bridge-cut each hole into the exterior (the earcut device): connect
    the hole's max-x vertex to a visible outer vertex with a zero-width
    double edge, producing one simple (self-touching) ring whose ear-clip
    triangulation covers exterior − holes exactly.

    Holes are merged right-to-left (max-x first) so earlier bridges don't
    occlude later ones.  Visibility = the bridge crosses no current edge.
    """
    outer = ensure_ccw(exterior)
    hs = [ensure_ccw(h)[::-1].copy() for h in holes]  # holes CW
    for h in sorted(hs, key=lambda r: -r[:, 0].max()):
        mi = int(np.argmax(h[:, 0]))
        m = h[mi]
        # candidate outer vertices to the right of m, nearest first
        order = np.argsort((outer[:, 0] - m[0]) ** 2 + (outer[:, 1] - m[1]) ** 2)
        vi = None
        for j in order:
            v = outer[int(j)]
            if v[0] < m[0]:
                continue
            if not _seg_blocked(m, v, [outer, h]):
                vi = int(j)
                break
        if vi is None:  # fallback: nearest vertex regardless (degenerate input)
            vi = int(order[0])
        # splice: outer[..vi], m, hole cycle from mi, m?  standard form:
        # outer[0..vi] + [hole[mi..], hole[..mi], hole[mi]] + [outer[vi..]]
        hole_cycle = np.vstack([h[mi:], h[:mi], h[mi : mi + 1]])
        outer = np.vstack([outer[: vi + 1], hole_cycle, outer[vi:]])
    return outer


def triangulate_polygon(rings: list) -> list:
    """Triangulate a polygon given [exterior, hole, hole, ...] rings →
    disjoint triangles covering exterior − holes (Σ areas == net area,
    tested).  Hole-free input short-circuits to plain ear clipping."""
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    rings = [r[:-1] if np.array_equal(r[0], r[-1]) else r for r in rings]
    holes = [r for r in rings[1:] if abs(signed_area(r)) > AREA_EPS]
    if not holes:
        return triangulate(rings[0])
    return triangulate(merge_holes(rings[0], holes))


# ---------------------------------------------------------------------------
# Convex clipping primitives
# ---------------------------------------------------------------------------


def clip_halfplane(poly: np.ndarray, ax: float, ay: float, bx: float, by: float, keep_left=True):
    """Clip convex ring ``poly`` (open, CCW) by the line a→b, keeping the
    left (keep_left) or right side.  One Sutherland–Hodgman pass."""
    n = poly.shape[0]
    if n == 0:
        return poly
    ex, ey = bx - ax, by - ay
    side = ex * (poly[:, 1] - ay) - ey * (poly[:, 0] - ax)
    if not keep_left:
        side = -side
    inside = side >= -1e-12
    if inside.all():
        return poly
    if not inside.any():
        return poly[:0]
    out = []
    for i in range(n):
        j = (i + 1) % n
        pi, pj = poly[i], poly[j]
        si, sj = side[i], side[j]
        if si >= -1e-12:
            out.append(pi)
        if (si > 1e-12 and sj < -1e-12) or (si < -1e-12 and sj > 1e-12):
            t = si / (si - sj)
            out.append(pi + t * (pj - pi))
    return np.array(out) if out else poly[:0]


def clip_convex_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: convex subject ∩ convex clip → convex ring
    (possibly empty).  Both inputs open CCW rings."""
    out = subject
    n = clip.shape[0]
    for i in range(n):
        if out.shape[0] == 0:
            break
        a, b = clip[i], clip[(i + 1) % n]
        out = clip_halfplane(out, a[0], a[1], b[0], b[1], keep_left=True)
    return out


def convex_minus_triangle(piece: np.ndarray, tri: np.ndarray) -> list:
    """Disjoint convex decomposition of ``piece \\ tri``.

    ``tri`` CCW = ∩ of left half-planes H1,H2,H3 of its edges, so
    piece\\tri = ⊔_i (piece ∩ H1..H_{i-1} ∩ ¬H_i) — each term convex, terms
    pairwise disjoint (alg/gdalcutline.cpp computes the same set membership
    via rasterized masks; we keep it vector-exact)."""
    out = []
    cur = piece
    for i in range(3):
        a, b = tri[i], tri[(i + 1) % 3]
        neg = clip_halfplane(cur, a[0], a[1], b[0], b[1], keep_left=False)
        if neg.shape[0] >= 3 and abs(signed_area(neg)) > AREA_EPS:
            out.append(neg)
        cur = clip_halfplane(cur, a[0], a[1], b[0], b[1], keep_left=True)
        if cur.shape[0] < 3:
            break
    return out


# ---------------------------------------------------------------------------
# Overlay operations on (exterior-)rings
# ---------------------------------------------------------------------------


def _bbox(r: np.ndarray):
    return r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()


def _bbox_disjoint(b1, b2) -> bool:
    return b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]


def _tris(poly) -> list:
    """Triangles of a polygon given as one exterior ring (ndarray) or a
    ring-list [exterior, hole, ...]."""
    if isinstance(poly, (list, tuple)):
        return triangulate_polygon(list(poly))
    return triangulate(poly)


def intersection_pieces(a_ring, b_ring) -> list:
    """A ∩ B as disjoint convex pieces; operands are simple rings or
    [exterior, hole, ...] ring-lists (holes via bridge-cut triangulation)."""
    ta = _tris(a_ring)
    tb = _tris(b_ring)
    out = []
    boxes_b = [(_bbox(t), t) for t in tb]
    for t1 in ta:
        b1 = _bbox(t1)
        for b2, t2 in boxes_b:
            if _bbox_disjoint(b1, b2):
                continue
            p = clip_convex_convex(t1, t2)
            if p.shape[0] >= 3 and abs(signed_area(p)) > AREA_EPS:
                out.append(p)
    return out


def erase_pieces(a_ring, b_rings: list) -> list:
    """A \\ (∪ B_k) as disjoint convex pieces.  B polygons may overlap each
    other — subtraction is sequential, so overlap double-removal cannot
    happen (pieces shrink monotonically)."""
    pieces = _tris(a_ring)
    for b_ring in b_rings:
        tb = _tris(b_ring)
        boxes_b = [(_bbox(t), t) for t in tb]
        for bb, t2 in boxes_b:
            nxt = []
            for p in pieces:
                if _bbox_disjoint(_bbox(p), bb):
                    nxt.append(p)
                else:
                    nxt.extend(convex_minus_triangle(p, t2))
            pieces = nxt
            if not pieces:
                return pieces
    return pieces


def clip_pieces(a_ring, b_rings: list) -> list:
    """A ∩ (∪ B_k) as disjoint convex pieces, exact even when the B polygons
    overlap each other: sequential in/out partition — every A-piece entering
    some B triangle moves to the "in" set and is removed from the remainder,
    so overlapping B regions cannot double-count (Clip, ogrlayer.cpp:3424)."""
    remaining = _tris(a_ring)
    inside: list = []
    for b_ring in b_rings:
        for t2 in _tris(b_ring):
            bb = _bbox(t2)
            nxt = []
            for p in remaining:
                if _bbox_disjoint(_bbox(p), bb):
                    nxt.append(p)
                    continue
                hit = clip_convex_convex(p, t2)
                if hit.shape[0] >= 3 and abs(signed_area(hit)) > AREA_EPS:
                    inside.append(hit)
                    nxt.extend(convex_minus_triangle(p, t2))
                else:
                    nxt.append(p)
            remaining = nxt
            if not remaining:
                return inside
    return inside


def union_pieces(a_ring, b_ring) -> list:
    """A ∪ B = (A \\ B) ⊔ (A ∩ B) ⊔ (B \\ A) — disjoint by construction."""
    return erase_pieces(a_ring, [b_ring]) + intersection_pieces(a_ring, b_ring) + erase_pieces(b_ring, [a_ring])


def sym_difference_pieces(a_ring, b_ring) -> list:
    """A Δ B = (A \\ B) ⊔ (B \\ A)."""
    return erase_pieces(a_ring, [b_ring]) + erase_pieces(b_ring, [a_ring])


def pieces_area(pieces: list) -> float:
    return float(sum(abs(signed_area(p)) for p in pieces))


def pieces_contain(pieces: list, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Vectorized membership in the piece union (interior or boundary) —
    used by the PIP-sample parity tests."""
    out = np.zeros(px.shape[0], dtype=bool)
    for p in pieces:
        n = p.shape[0]
        rem = ~out
        if not rem.any():
            break
        x, y = px[rem], py[rem]
        ok = np.ones(x.shape[0], dtype=bool)
        for i in range(n):
            a, b = p[i], p[(i + 1) % n]
            side = (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0])
            ok &= side >= -1e-9
            if not ok.any():
                break
        idx = np.nonzero(rem)[0]
        out[idx[ok]] = True
    return out
