"""Line × polygon layer algebra: Intersection / Clip / Erase for
LineString and MultiLineString inputs.

The reference's layer algebra is geometry-type-generic: OGRLayer's
Intersection/Clip/Erase (ogr/ogrsf_frmts/generic/ogrlayer.cpp:1954,3424,
3660) run a GEOS overlay on whatever geometry the feature carries and keep
dimension-preserving results (:2038-2054), and ``ogr2ogr -clipsrc`` clips
line layers (apps/ogr2ogr.cpp:3513).  This module supplies the line-input
half of that surface, polygon inputs being :mod:`engine.algebra`.

Kernel: the method polygon (holes and MultiPolygon parts included) is
decomposed into DISJOINT convex pieces by the existing overlay machinery
(:func:`engine.clip.triangulate_polygon` exact cover).  Each line segment
is clipped against each bbox-overlapping piece with a parametric
(Cyrus–Beck) half-plane interval intersection → a t-interval per piece;
because the pieces are an exact disjoint cover, the union of the intervals
is the inside part of the segment, and interval complement gives the erase
part.  Sub-polylines are re-stitched across segment boundaries, so a line
crossing a polygon emits one LineString per crossing, exactly like the
GEOS result (vertex set may include piece-boundary points of measure zero
only at interval joins, which merge away).

Distributed form mirrors engine.algebra: bbox cover-cell candidate join →
owner-cell dedup → grouped refine (Erase/Clip need all method matches of
one input jointly; Intersection is per-pair).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import clip as clipmod
from . import geom
from .algebra import pair_candidates

_EPS = 1e-12


def line_points(buf: bytes) -> list:
    """WKB LineString/MultiLineString → list of (N,2) float arrays."""
    kind, body = geom.wkb_loads(buf)
    if kind == "LineString":
        return [np.asarray(body, dtype=np.float64)]
    if kind == "MultiLineString":
        return [np.asarray(b, dtype=np.float64) for (k, b) in body]
    raise ValueError(f"expected line WKB, got {kind}")


def segment_clip_convex(p0: np.ndarray, p1: np.ndarray, conv: np.ndarray):
    """Parametric clip of segment p0→p1 against an open CCW convex ring →
    (t0, t1) with 0 ≤ t0 < t1 ≤ 1, or None when outside."""
    t0, t1 = 0.0, 1.0
    d = p1 - p0
    n = conv.shape[0]
    for i in range(n):
        a = conv[i]
        b = conv[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # inside = left of a→b: cross(e, p-a) >= 0
        fp0 = ex * (p0[1] - a[1]) - ey * (p0[0] - a[0])
        fd = ex * d[1] - ey * d[0]
        if abs(fd) < _EPS:
            if fp0 < -_EPS:
                return None  # parallel and outside
            continue
        t = -fp0 / fd
        if fd > 0:  # entering
            if t > t0:
                t0 = t
        else:  # leaving
            if t < t1:
                t1 = t
        if t0 >= t1 - _EPS:
            return None
    if t1 - t0 <= _EPS:
        return None
    return (t0, t1)


class ConvexCover:
    """Flattened edge arrays for a list of convex pieces, built once per
    cover and reused across every segment of every line in the group —
    the vectorized replacement for the per-(segment×piece) Python loop
    that dominated the line_clip profile (round-2 NOTES)."""

    __slots__ = ("pieces", "starts", "ax", "ay", "ex", "ey", "n_edges")

    def __init__(self, pieces: list):
        self.pieces = pieces
        if not pieces:
            self.starts = np.zeros(0, dtype=np.int64)
            self.ax = self.ay = self.ex = self.ey = np.zeros(0, dtype=np.float64)
            self.n_edges = 0
            return
        counts = np.array([p.shape[0] for p in pieces], dtype=np.int64)
        self.starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        a = np.concatenate(pieces, axis=0)
        b = np.concatenate([np.roll(p, -1, axis=0) for p in pieces], axis=0)
        self.ax, self.ay = a[:, 0].copy(), a[:, 1].copy()
        e = b - a
        self.ex, self.ey = e[:, 0].copy(), e[:, 1].copy()
        self.n_edges = int(a.shape[0])

    def clip_segment(self, p0: np.ndarray, p1: np.ndarray) -> list:
        """Parametric clip of p0→p1 against every piece at once →
        [(t0, t1)] for pieces with non-degenerate overlap.  Arithmetic is
        operation-identical to :func:`segment_clip_convex` (t = −fp0/fd
        per edge; max/min are order-free), so results are bit-identical."""
        if self.n_edges == 0:
            return []
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        fp0 = self.ex * (p0[1] - self.ay) - self.ey * (p0[0] - self.ax)
        fd = self.ex * dy - self.ey * dx
        parallel = np.abs(fd) < _EPS
        bad_edge = parallel & (fp0 < -_EPS)
        # masked divide (no errstate context: ~25 us/call at this rate)
        t = np.divide(-fp0, fd, out=np.zeros_like(fd), where=~parallel)
        entering = (~parallel) & (fd > 0)
        leaving = (~parallel) & (fd < 0)
        t_in = np.where(entering, t, 0.0)
        t_out = np.where(leaving, t, 1.0)
        t0 = np.maximum.reduceat(t_in, self.starts)
        t1 = np.minimum.reduceat(t_out, self.starts)
        bad = np.bitwise_or.reduceat(bad_edge, self.starts)
        valid = (~bad) & (t1 - t0 > _EPS)
        idx = np.nonzero(valid)[0]
        return list(zip(t0[idx].tolist(), t1[idx].tolist()))


def _merge_intervals(iv: list) -> list:
    """Union of [t0,t1] intervals (pieces are disjoint, so intervals only
    touch at piece boundaries)."""
    if not iv:
        return []
    iv.sort()
    out = [list(iv[0])]
    for a, b in iv[1:]:
        if a <= out[-1][1] + 1e-9:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return out


def _complement(iv: list) -> list:
    """[0,1] minus merged intervals."""
    out = []
    cur = 0.0
    for a, b in iv:
        if a > cur + 1e-9:
            out.append([cur, a])
        cur = max(cur, b)
    if cur < 1.0 - 1e-9:
        out.append([cur, 1.0])
    return out


def clip_line_pieces(line: np.ndarray, pieces: list, keep_inside: bool = True, boxes: list | None = None) -> list:
    """Clip one polyline against a disjoint convex cover.

    Returns a list of (N,2) sub-polylines: the parts inside
    (``keep_inside``) or outside the cover.  Parts contiguous across
    segment boundaries are stitched into one polyline.

    ``pieces`` may be a list of convex rings or a prebuilt
    :class:`ConvexCover`; ``boxes`` is accepted for backward
    compatibility and ignored (the vectorized kernel evaluates all
    pieces at once — a bbox-disjoint piece yields no interval anyway).
    """
    cover = pieces if isinstance(pieces, ConvexCover) else ConvexCover(pieces)
    out = []
    cur: list | None = None  # open polyline being stitched
    for i in range(line.shape[0] - 1):
        p0 = line[i]
        p1 = line[i + 1]
        iv = cover.clip_segment(p0, p1)
        iv = _merge_intervals(iv)
        if not keep_inside:
            iv = _complement(iv)
        for a, b in iv:
            qa = p0 + a * (p1 - p0)
            qb = p0 + b * (p1 - p0)
            if cur is not None and a <= 1e-9 and np.allclose(cur[-1], qa, atol=1e-9):
                cur.append(qb)
            else:
                if cur is not None and len(cur) >= 2:
                    out.append(np.asarray(cur))
                cur = [qa, qb]
        if not iv or iv[-1][1] < 1.0 - 1e-9:
            if cur is not None and len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = None
    if cur is not None and len(cur) >= 2:
        out.append(np.asarray(cur))
    # drop zero-length artifacts, merge collinear duplicate points
    cleaned = []
    for p in out:
        d = np.diff(p, axis=0)
        keep = np.ones(p.shape[0], dtype=bool)
        keep[1:] = (np.abs(d) > 1e-12).any(axis=1)
        p = p[keep]
        if p.shape[0] >= 2:
            cleaned.append(p)
    return cleaned


def lines_length(lines: list) -> float:
    return float(
        sum(np.hypot(*np.diff(p, axis=0).T).sum() for p in lines)
    )


_PIECES_CACHE: dict = {}


def _poly_pieces(wkb: bytes) -> list:
    """Polygon WKB (holes, MultiPolygon) → disjoint convex cover.

    Memoized per executor worker: candidate pairs repeat the same method
    polygon for thousands of input lines, and triangulation dominates the
    refine cost otherwise (bounded cache — method layers are dimension
    tables)."""
    key = bytes(wkb)
    hit = _PIECES_CACHE.get(key)
    if hit is not None:
        return hit
    pieces = []
    for part in geom.polygon_parts(key):
        pieces.extend(clipmod.triangulate_polygon(part))
    out = [clipmod.ensure_ccw(p) for p in pieces]
    if len(_PIECES_CACHE) < 4096:
        _PIECES_CACHE[key] = out
    return out


_COVER_CACHE: dict = {}


def _poly_cover(wkb: bytes) -> ConvexCover:
    """Memoized ConvexCover per method polygon: candidate pairs repeat the
    same polygon for thousands of lines and the cover build (edge-array
    concat) dominated the refine profile when rebuilt per pair."""
    key = bytes(wkb)
    hit = _COVER_CACHE.get(key)
    if hit is not None:
        return hit
    cover = ConvexCover(_poly_pieces(key))
    if len(_COVER_CACHE) < 4096:
        _COVER_CACHE[key] = cover
    return cover


_PAIR_SCHEMA = "a_id int, b_id int, n_parts long, length double, geom_wkb binary"
_GROUP_SCHEMA = "a_id int, n_parts long, length double, geom_wkb binary"


def layer_intersection_lines(lines: DataFrame, polys: DataFrame, res: float = 10.0) -> DataFrame:
    """Line layer ∩ polygon layer, one row per intersecting pair
    (dimension-preserving line result — ogrlayer.cpp:2038-2054)."""
    pairs = pair_candidates(lines, polys, res)

    def _refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("a_id", "b_id", "n_parts", "length", "geom_wkb")}
            for r in pdf.itertuples():
                cover = _poly_cover(r.b_wkb)
                parts = []
                for ln in line_points(r.a_wkb):
                    parts.extend(clip_line_pieces(ln, cover, keep_inside=True))
                if not parts:
                    continue
                out["a_id"].append(r.a_id)
                out["b_id"].append(r.b_id)
                out["n_parts"].append(len(parts))
                out["length"].append(lines_length(parts))
                out["geom_wkb"].append(geom.wkb_multilinestring(parts))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(_refine, _PAIR_SCHEMA)


def _grouped_lines(lines: DataFrame, polys: DataFrame, res: float, keep_inside: bool, keep_unmatched: bool) -> DataFrame:
    """Clip/Erase: all method polygons of one input line act JOINTLY (the
    per-input inner loop of ogrlayer.cpp:3424,3660): their disjoint convex
    covers concatenate into one cover (clip = union semantics because the
    interval union over all pieces is the union of the polygons)."""
    id_col = lines.columns[0]
    pairs = pair_candidates(lines, polys, res)

    def _apply_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # sort-based manual grouping: one partition holds MANY input lines
        # (most with 1-2 candidate polygons); per-group applyInPandas or
        # pandas groupby overhead would dominate at web scale
        parts_list = list(batches)
        if not parts_list:
            return
        pdf = pd.concat(parts_list, ignore_index=True)
        if pdf.empty:
            return
        a_ids = pdf["a_id"].to_numpy()
        order = np.argsort(a_ids, kind="stable")
        a_s = a_ids[order]
        aw = pdf["a_wkb"].to_numpy()[order]
        bw = pdf["b_wkb"].to_numpy()[order]
        starts = np.nonzero(np.concatenate([[True], a_s[1:] != a_s[:-1]]))[0]
        ends = np.append(starts[1:], a_s.shape[0])
        out = {k: [] for k in ("a_id", "n_parts", "length", "geom_wkb")}
        for s, e in zip(starts, ends):
            if e - s == 1:  # dominant case: one method polygon → cached cover
                cover = _poly_cover(bw[s])
            else:
                pieces = []
                for i in range(s, e):
                    pieces.extend(_poly_pieces(bw[i]))
                cover = ConvexCover(pieces)
            parts = []
            for ln in line_points(aw[s]):
                parts.extend(clip_line_pieces(ln, cover, keep_inside=keep_inside))
            if not parts:
                continue
            out["a_id"].append(int(a_s[s]))
            out["n_parts"].append(len(parts))
            out["length"].append(lines_length(parts))
            out["geom_wkb"].append(geom.wkb_multilinestring(parts))
        yield pd.DataFrame(out)

    nparts = lines.sparkSession.sparkContext.defaultParallelism
    matched = pairs.repartition(nparts, "a_id").mapInPandas(_apply_part, _GROUP_SCHEMA)
    if not keep_unmatched:
        return matched

    @F.pandas_udf("double")
    def _len_udf(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: lines_length(line_points(b)))

    untouched = (
        lines.join(pairs.select(F.col("a_id").alias(id_col)).distinct(), on=id_col, how="left_anti")
        .select(
            F.col(id_col).cast("int").alias("a_id"),
            F.lit(1).cast("long").alias("n_parts"),
            _len_udf(F.col("geom_wkb")).alias("length"),
            F.col("geom_wkb"),
        )
    )
    return matched.unionByName(untouched)


def layer_clip_lines(lines: DataFrame, polys: DataFrame, res: float = 10.0) -> DataFrame:
    """ogr2ogr -clipsrc for a line layer (apps/ogr2ogr.cpp:3513; layer
    Clip ogrlayer.cpp:3424): parts of each line inside the union of the
    method polygons; lines entirely outside vanish."""
    return _grouped_lines(lines, polys, res, keep_inside=True, keep_unmatched=False)


def layer_erase_lines(lines: DataFrame, polys: DataFrame, res: float = 10.0) -> DataFrame:
    """Line-layer Erase (ogrlayer.cpp:3660): parts of each line outside
    every method polygon; untouched lines pass through whole."""
    return _grouped_lines(lines, polys, res, keep_inside=False, keep_unmatched=True)
