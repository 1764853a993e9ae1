"""Antimeridian (±180°) handling — the WRAPDATELINE analog.

The reference splits geometries that cross the dateline before any
downstream operation (``transformWithOptions`` WRAPDATELINE,
ogr/ogrgeometryfactory.cpp:2436, and ``organizePolygons`` :1055);
without it, a segment from lon 179 to −179 reads as a 358°-wide bar and
mis-tiles / mis-joins silently.  This module works in *unwrapped*
longitude space (coordinates may exceed ±180 by up to 360): geometries
are cut at the ±180 meridians and each part is shifted back into
[−180, 180].

Spark-first: the per-geometry split is pure numpy and runs inside
Arrow-batched pandas UDFs; the split multiplies row counts by ≤ 2, so it
composes with the tile/PIP/knn joins with no extra shuffle (split before
the cell-key assignment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine import geom, tiles


def wrap_lon(lon):
    """Wrap longitudes into [−180, 180).  Exact for inputs in
    (−540, 540): only ±360.0 is ever added (no fmod rounding)."""
    lon = np.asarray(lon, dtype=np.float64)
    out = lon.copy()
    out[out >= 180.0] -= 360.0
    out[out < -180.0] += 360.0
    return out


def split_lon_interval(x0: float, x1: float) -> list:
    """Split an unwrapped lon interval [x0, x1] (x0 ≤ x1, width < 360)
    at the ±180 meridians → list of (a, b) wrapped sub-intervals.

    Endpoints landing exactly on ±180 stay on the closed side of their
    part ([a, 180] / [−180, b]) so downstream tile assignment can apply
    its own boundary rule (the ceil−1 convention of engine.tiles)."""
    if x1 - x0 >= 360.0:
        raise ValueError("interval spans the full globe")
    parts = []
    for lo, hi, shift in ((-540.0, -180.0, 360.0), (-180.0, 180.0, 0.0), (180.0, 540.0, -360.0)):
        a, b = max(x0, lo), min(x1, hi)
        if b > a:
            parts.append((a + shift, b + shift))
    return parts


def split_linestring(coords: np.ndarray) -> list:
    """Split an unwrapped-lon polyline at the ±180 meridians → list of
    wrapped coordinate arrays.  Crossing segments get an interpolated
    vertex exactly on the meridian (both resulting parts own it)."""
    coords = np.asarray(coords, dtype=np.float64)
    out, cur = [], [coords[0]]
    for i in range(1, coords.shape[0]):
        p0, p1 = coords[i - 1], coords[i]
        x0, x1 = p0[0], p1[0]
        crossed = False
        for m in (-180.0, 180.0):
            lo, hi = (x0, x1) if x0 <= x1 else (x1, x0)
            if lo < m < hi:
                t = (m - x0) / (x1 - x0)
                ym = p0[1] + t * (p1[1] - p0[1])
                cur.append(np.array([m, ym]))
                out.append(np.array(cur))
                cur = [np.array([m, ym]), p1]
                crossed = True
                break
        if not crossed:
            cur.append(p1)
    out.append(np.array(cur))
    wrapped = []
    for part in out:
        part = np.array(part, dtype=np.float64)
        # shift by the part interior, not the (on-meridian) endpoints
        mid = float(np.mean(part[:, 0]))
        if mid > 180.0 or (mid == 180.0 and np.any(part[:, 0] > 180.0)):
            part[:, 0] -= 360.0
        elif mid < -180.0 or (mid == -180.0 and np.any(part[:, 0] < -180.0)):
            part[:, 0] += 360.0
        wrapped.append(part)
    return wrapped


def split_polygon_rings(rings: list) -> list:
    """Split an unwrapped-lon polygon (list of rings, exterior first) at
    the ±180 meridians → list of wrapped ring-lists, by clipping against
    the three wrap windows and shifting (the ogrgeometryfactory.cpp:2436
    cut-and-shift, re-expressed through the engine's exact convex-piece
    overlay kernel)."""
    from engine import clip

    out = []
    for lo, hi, shift in ((-540.0, -180.0, 360.0), (-180.0, 180.0, 0.0), (180.0, 540.0, -360.0)):
        window = np.array(
            [(lo, -90.0), (hi, -90.0), (hi, 90.0), (lo, 90.0)], dtype=np.float64
        )
        pieces = clip.clip_pieces(rings, [window])
        if pieces:
            shifted = [np.asarray(p, dtype=np.float64) + np.array([shift, 0.0]) for p in pieces]
            out.append(shifted)
    return out


def split_wkb(buf: bytes) -> list:
    """Split a WKB LineString/Polygon at the dateline → list of WKB parts."""
    kind, body = geom.wkb_loads(bytes(buf))
    if kind == "LineString":
        return [
            geom.wkb_linestring([tuple(p) for p in part])
            for part in split_linestring(np.asarray(body, dtype=np.float64))
        ]
    if kind == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in body]
        return [
            geom.wkb_multipolygon([[p] for p in pieces]) for pieces in split_polygon_rings(rings)
        ]
    raise ValueError(f"unsupported geometry type {kind}")


def geodetic_tile_cover_x(x0: float, x1: float, zoom: int) -> tuple:
    """Covering z-``zoom`` geodetic tile-x range for a wrapped lon span:
    left edge floor-inclusive, right edge by the ceil−1 rule, clamped to
    the profile's [0, 2^(zoom+1)−1] (gdal2tiles tminx/tmaxx range rule)."""
    res = tiles.geodetic_resolution(zoom)
    n_tiles = 2 ** (zoom + 1)
    px0 = (180.0 + x0) / res
    px1 = (180.0 + x1) / res
    tminx = int(np.floor(px0 / tiles.TILE_SIZE))
    tmaxx = int(np.ceil(px1 / tiles.TILE_SIZE) - 1)
    return max(0, tminx), min(n_tiles - 1, tmaxx)


def split_polygons_df(df: DataFrame, wkb_col: str = "geom_wkb") -> DataFrame:
    """Dataframe-level WRAPDATELINE for polygon layers: replace each
    (possibly crossing) polygon with its wrapped parts (MultiPolygon WKB
    per wrap window).  Adds ``part_idx``; other columns pass through; one
    Arrow-batched stage, no shuffle.  Downstream cell-keyed joins
    (engine.algebra.pair_candidates) then see only in-range longitudes —
    the pre-join normalization the reference applies in
    transformWithOptions (ogr/ogrgeometryfactory.cpp:2436)."""
    return _split_df(df, wkb_col)


def split_lines_df(df: DataFrame, wkb_col: str = "geom_wkb") -> DataFrame:
    """Dataframe-level WRAPDATELINE for line layers: explode each
    (possibly crossing) linestring into wrapped parts.  Output adds
    ``part_idx`` and replaces ``wkb_col``; all other columns pass
    through.  Runs as one Arrow-batched stage — no shuffle."""
    return _split_df(df, wkb_col)


def _split_df(df: DataFrame, wkb_col: str) -> DataFrame:
    other = [c for c in df.columns if c != wkb_col]
    schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in other)
    schema += f", part_idx int, {wkb_col} binary"

    def _split(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                parts = split_wkb(d[wkb_col])
                for i, pw in enumerate(parts):
                    rows.append({**{c: d[c] for c in other}, "part_idx": i, wkb_col: pw})
            yield pd.DataFrame(rows)

    return df.mapInPandas(_split, schema)
