"""Polygon×polygon spatial predicates: the GEOS predicate set of
OGRGeometry (ogr/ogrgeometry.cpp — Intersects :310, Equals :750, Disjoint
:2978, Touches :3060, Within :3226, Contains :3308, Overlaps :3391).

Implemented from the exact overlay kernel (engine/clip.py) by the DE-9IM
area decomposition: with I = area(A∩B), RA = area(A\\B), RB = area(B\\A)
and a boundary-contact test (any-pair segment intersection):

* ``equals``    — I > 0, RA = 0, RB = 0
* ``contains``  — A contains B: RB = 0, I > 0 (boundary contact allowed,
  matching GEOS Contains for area/area inputs)
* ``within``    — A within B: RA = 0, I > 0
* ``overlaps``  — I > 0, RA > 0, RB > 0
* ``touches``   — I = 0 but boundaries intersect
* ``disjoint``  — I = 0 and no boundary contact
* ``intersects``— not disjoint

Area tests use the kernel's AREA_EPS, so measure-zero interior slivers
(degenerate geometry) classify as boundary contact — the documented
tolerance vs GEOS's topological (DE-9IM) evaluation.

Distributed form: the same candidate generation as layer algebra
(pair_candidates: coarse-cell equi-join + owner-cell dedup) with a
pairwise mapInPandas refine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import clip, geom
from .algebra import pair_candidates

AREA_EPS = 1e-9


def _as_parts(poly):
    """Normalize ring / ring-list / parts-list to a list of parts."""
    if isinstance(poly, np.ndarray):
        return [[poly]]
    if poly and isinstance(poly[0], np.ndarray):
        return [list(poly)]  # one polygon: [ext, holes...]
    return [list(p) for p in poly]


def _segments(poly) -> np.ndarray:
    rings = poly if isinstance(poly, (list, tuple)) else [poly]
    segs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        segs.append(np.hstack([r[:-1], r[1:]]))
    return np.vstack(segs)  # (n, 4)


def boundaries_intersect(a_ring, b_ring) -> bool:
    """Any-pair segment intersection (proper or touching) over ALL rings
    (exterior + holes), vectorized orientation tests on the pair grid."""
    A = _segments(a_ring)
    B = _segments(b_ring)
    ax1, ay1, ax2, ay2 = (A[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (B[:, i][None, :] for i in range(4))

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = cross(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = cross(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = cross(bx1, by1, bx2, by2, ax1, ay1)
    d4 = cross(bx1, by1, bx2, by2, ax2, ay2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True

    # collinear / endpoint-on-segment contact
    def on_seg(px, py, x1, y1, x2, y2, d):
        return (
            (d == 0)
            & (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
            & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2))
        )

    touch = (
        on_seg(bx1, by1, ax1, ay1, ax2, ay2, d1)
        | on_seg(bx2, by2, ax1, ay1, ax2, ay2, d2)
        | on_seg(ax1, ay1, bx1, by1, bx2, by2, d3)
        | on_seg(ax2, ay2, bx1, by1, bx2, by2, d4)
    )
    return bool(touch.any())


def relate(a_poly, b_poly) -> str:
    """Classify the pair into one relation label (see module doc).
    Operands: a single ring, a ring-list [ext, holes...], or a list of
    parts (MultiPolygon) — normalized to part lists below."""
    a_parts = _as_parts(a_poly)
    b_parts = _as_parts(b_poly)
    inter = sum(
        clip.pieces_area(clip.intersection_pieces(pa, pb))
        for pa in a_parts for pb in b_parts
    )
    if inter <= AREA_EPS:
        touch = any(
            boundaries_intersect(pa, pb) for pa in a_parts for pb in b_parts
        )
        return "touches" if touch else "disjoint"
    ra = sum(clip.pieces_area(clip.erase_pieces(pa, b_parts)) for pa in a_parts)
    rb = sum(clip.pieces_area(clip.erase_pieces(pb, a_parts)) for pb in b_parts)
    if ra <= AREA_EPS and rb <= AREA_EPS:
        return "equals"
    if rb <= AREA_EPS:
        return "contains"
    if ra <= AREA_EPS:
        return "within"
    return "overlaps"


def layer_relate(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """(a_id, b_id, relation) for every bbox-overlapping pair; disjoint
    pairs (bbox overlap but no area/boundary contact) are emitted too, so
    all seven predicates are derivable by filtering."""
    pairs = pair_candidates(inp, method, res)

    def _refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"a_id": [], "b_id": [], "relation": []}
            for r in pdf.itertuples():
                a = geom.polygon_parts(r.a_wkb)
                b = geom.polygon_parts(r.b_wkb)
                out["a_id"].append(r.a_id)
                out["b_id"].append(r.b_id)
                out["relation"].append(relate(a, b))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(_refine, "a_id int, b_id int, relation string")
