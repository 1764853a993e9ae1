"""Proximity (distance transform) + focal nodata fill over tile tables.

Reference operators:

* ``GDALComputeProximity`` (alg/gdalproximity.cpp:44-85) — per-pixel
  distance to the nearest target-valued pixel, bounded by MAXDIST; the
  reference uses a two-pass scanline propagation that *approximates*
  euclidean distance on one machine.  We compute the EXACT euclidean
  distance (pixel-center metric) with a separable transform — a documented
  strictness upgrade: the distributed result is identical to running the
  same kernel on the mosaicked raster (seam-exact), which a scanline
  approximation cannot guarantee under tiling.
* ``GDALFillNodata`` (alg/rasterfill.cpp:352-391) — nodata pixels filled by
  inverse-distance weighting of the nearest valid pixel along each of the 8
  compass directions (the reference's dfMaxSearchDist + smoothing
  iterations), then optional 3×3 average smoothing restricted to filled
  pixels.

Distributed pattern (both ops): **ring-k neighbor-strip gather** — each
tile ships only the ``maxdist``-wide strips its neighbors need (one
mapInPandas + one groupBy shuffle), the kernel runs on the
(T+2·halo)² composite, and the center T×T window is emitted.  Ring
count = ceil(maxdist/T), so radii beyond one tile (up to the 4-ring cap)
gather 5×5/7×7/9×9 neighborhoods with shuffle bytes still proportional
to the halo width — the same cost GDAL pays re-reading neighbor blocks,
made explicit as one shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .raster import TILE_SIZE, bytes_to_tile, tile_to_bytes


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def edt(targets: np.ndarray, maxdist: float) -> np.ndarray:
    """Exact euclidean distance (float64) from each cell to the nearest True
    cell, separable two-stage form: vertical nearest-target distance per
    column (two scans), then a horizontal min over offsets |dc| ≤ maxdist of
    ``V[r, c+dc]² + dc²``.  Cells farther than ``maxdist`` get +inf."""
    H, W = targets.shape
    BIG = float(H + W + 1)
    # vertical pass: distance to nearest target in the same column
    v = np.full((H, W), BIG)
    v[targets] = 0.0
    for r in range(1, H):
        np.minimum(v[r], v[r - 1] + 1.0, out=v[r])
    for r in range(H - 2, -1, -1):
        np.minimum(v[r], v[r + 1] + 1.0, out=v[r])
    v2 = v * v
    m = int(np.ceil(maxdist))
    best = v2.copy()
    for dc in range(1, m + 1):
        d2 = float(dc * dc)
        if d2 > maxdist * maxdist and dc > 1:
            break
        np.minimum(best[:, dc:], v2[:, :-dc] + d2, out=best[:, dc:])
        np.minimum(best[:, :-dc], v2[:, dc:] + d2, out=best[:, :-dc])
    out = np.sqrt(best)
    out[out > maxdist] = np.inf
    return out


_DIRS = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]


def fill_kernel(grid: np.ndarray, nodata: int, maxdist: float, smoothing: int = 0,
                exists: np.ndarray | None = None) -> np.ndarray:
    """Directional IDW fill (rasterfill.cpp analog): for each nodata cell,
    the nearest valid value along each of 8 directions within ``maxdist``
    contributes with weight 1/d; unreachable cells stay nodata.  Then
    ``smoothing`` passes of 3×3 mean over the *filled* cells only.

    ``exists`` marks cells that are part of the raster (False = beyond the
    raster edge, e.g. composite padding): they are never sources, never
    filled, and never counted as smoothing neighbors — so a tiled run and a
    whole-raster run agree exactly at raster boundaries."""
    H, W = grid.shape
    if exists is None:
        exists = np.ones((H, W), dtype=bool)
    valid = (grid != nodata) & exists
    wsum = np.zeros((H, W))
    vsum = np.zeros((H, W))
    m = int(np.floor(maxdist))
    for dr, dc in _DIRS:
        step = np.hypot(dr, dc)
        # nearest valid value + distance along (-dr,-dc) looking direction,
        # propagated iteratively: value/dist arrays shifted one step at a time
        val = np.where(valid, grid.astype(np.float64), np.nan)
        dist = np.where(valid, 0.0, np.inf)
        cur_v = np.full((H, W), np.nan)
        cur_d = np.full((H, W), np.inf)
        for k in range(1, int(np.ceil(m / step)) + 1):
            # shift source arrays by k steps of (dr,dc)
            sv = np.full((H, W), np.nan)
            sd = np.full((H, W), np.inf)
            r0, r1 = max(dr * k, 0), min(H + dr * k, H)
            c0, c1 = max(dc * k, 0), min(W + dc * k, W)
            sv[r0:r1, c0:c1] = val[r0 - dr * k : r1 - dr * k, c0 - dc * k : c1 - dc * k]
            sd[r0:r1, c0:c1] = dist[r0 - dr * k : r1 - dr * k, c0 - dc * k : c1 - dc * k] + k * step
            take = (sd < cur_d) & ~np.isnan(sv)
            cur_v[take] = sv[take]
            cur_d[take] = sd[take]
            if not np.isinf(cur_d[~valid]).any():
                break
        reach = (~valid) & (cur_d <= maxdist) & ~np.isnan(cur_v)
        w = np.zeros((H, W))
        w[reach] = 1.0 / cur_d[reach]
        wsum += w
        vsum += np.where(reach, cur_v, 0.0) * w
    out = grid.astype(np.float64).copy()
    fillable = (~valid) & exists & (wsum > 0)
    out[fillable] = vsum[fillable] / wsum[fillable]
    filled = out.copy()
    for _ in range(smoothing):
        # 3×3 mean over non-nodata cells, applied to filled cells only
        # (GDALFillNodata smoothing touches only the interpolated region)
        acc = np.zeros((H, W))
        cnt = np.zeros((H, W))
        ok = (filled != nodata) & exists
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                sh = np.full((H, W), np.nan)
                r0, r1 = max(dr, 0), min(H + dr, H)
                c0, c1 = max(dc, 0), min(W + dc, W)
                sh[r0:r1, c0:c1] = np.where(ok, filled, np.nan)[r0 - dr : r1 - dr, c0 - dc : c1 - dc]
                hit = ~np.isnan(sh)
                acc[hit] += sh[hit]
                cnt[hit] += 1.0
        smoothed = np.where(cnt > 0, acc / np.maximum(cnt, 1), filled)
        filled = np.where(fillable, smoothed, filled)
    return filled


# ---------------------------------------------------------------------------
# 3×3 gather + distributed operators
# ---------------------------------------------------------------------------

_TILE_SCHEMA = "tx long, ty long, data binary"


def _strip_extents(p: int, h: int):
    """For a sender at tile offset ``p`` from the receiver (one axis):
    (slice into the sender tile, needed width) — 0 width ⇒ nothing to send.
    |p| = 1 neighbors face the receiver directly; ring-2+ neighbors send
    only the ``h − (|p|−1)·T`` pixels still inside the halo."""
    T = TILE_SIZE
    if p == 0:
        return slice(None), T
    w = min(max(h - (abs(p) - 1) * T, 0), T)
    if w == 0:
        return None, 0
    # sender east/north of receiver → its west/bottom side faces the halo
    return (slice(0, w) if p > 0 else slice(T - w, T)), w


def _gather_halo(tile_df: DataFrame, halo: int) -> DataFrame:
    """Each tile contributes its facing strips to every composite within
    ``ceil(halo/T)`` rings — the ring-1 case degenerates to the classic
    3×3 neighbor gather; shuffle bytes stay proportional to halo width.
    (otx, oty) = receiving composite; (dx, dy) = sender's tile offset in
    it (dy > 0 = sender north of the receiver)."""
    T = TILE_SIZE
    h = int(halo)
    k = max(1, -(-h // T))  # ceil
    strip_schema = "otx long, oty long, dx int, dy int, data binary"

    def _emit(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                g = bytes_to_tile(r.data)
                for rx in range(-k, k + 1):
                    for ry in range(-k, k + 1):
                        if rx == 0 and ry == 0:
                            rows.append((int(r.tx), int(r.ty), 0, 0, r.data))
                            continue
                        # receiver at (tx+rx, ty+ry); sender offset = (-rx, -ry)
                        px, py = -rx, -ry
                        cols, wx = _strip_extents(px, h)
                        if wx == 0:
                            continue
                        # y axis: py > 0 (north sender) → bottom rows face in
                        if py == 0:
                            rws, wy = slice(None), T
                        else:
                            wy = min(max(h - (abs(py) - 1) * T, 0), T)
                            if wy == 0:
                                continue
                            rws = slice(T - wy, T) if py > 0 else slice(0, wy)
                        sub = np.ascontiguousarray(g[rws, cols])
                        rows.append(
                            (int(r.tx) + rx, int(r.ty) + ry, px, py, sub.astype("<i4").tobytes())
                        )
            yield pd.DataFrame(rows, columns=["otx", "oty", "dx", "dy", "data"])

    return tile_df.select("tx", "ty", "data").mapInPandas(_emit, strip_schema)


def _composite_apply(tile_df: DataFrame, fn, out_float: bool, pad_value: int = 0,
                     halo: int = TILE_SIZE) -> DataFrame:
    """groupBy composite target tile → assemble (T+2h)² composite (missing
    neighbors = ``pad_value``), run ``fn(composite, exists)``, emit the
    center T×T window.  ``halo`` = required support width in pixels (any
    width — ring count scales as ceil(halo/T))."""
    T = TILE_SIZE
    h = int(halo)

    def _apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        otx, oty = key
        # the composite is only produced when the CENTER tile exists
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            return pd.DataFrame({"tx": [], "ty": [], "data": []})
        S = T + 2 * h
        comp = np.full((S, S), pad_value, dtype=np.int32)
        exists = np.zeros((S, S), dtype=bool)
        for r in pdf.itertuples():
            # dy: +1 = sender north of center; rows grow southward in-array
            px, py = int(r.dx), int(r.dy)
            wy = T if py == 0 else min(max(h - (abs(py) - 1) * T, 0), T)
            wx = T if px == 0 else min(max(h - (abs(px) - 1) * T, 0), T)
            g = np.frombuffer(r.data, dtype="<i4").reshape(wy, wx)
            # placement: sender tile spans composite rows [h − py·T, +T)
            # (rows grow southward, py>0 = north); only the facing strip of
            # that span was shipped
            if py == 0:
                r0 = h
            elif py > 0:
                r0 = h - (py - 1) * T - wy
            else:
                r0 = h - py * T
            if px == 0:
                c0 = h
            elif px > 0:
                c0 = h + px * T
            else:
                c0 = h + (px + 1) * T - wx
            comp[r0 : r0 + wy, c0 : c0 + wx] = g
            exists[r0 : r0 + wy, c0 : c0 + wx] = True
        out = fn(comp, exists)[h : h + T, h : h + T]
        buf = out.astype("<f8").tobytes() if out_float else np.asarray(out, dtype="<i4").tobytes()
        return pd.DataFrame({"tx": [otx], "ty": [oty], "data": [buf]})

    # explicit partition count: the EDT kernel is numpy-CPU-bound per tile
    nparts = tile_df.sparkSession.sparkContext.defaultParallelism
    return (
        _gather_halo(tile_df, h)
        .repartition(nparts, "otx", "oty")
        .groupBy("otx", "oty")
        .applyInPandas(_apply, _TILE_SCHEMA)
    )


def proximity(tile_df: DataFrame, target_values: tuple, maxdist: float, nodata: float = -1.0) -> DataFrame:
    """GDALComputeProximity analog: per-pixel exact euclidean distance (in
    pixels) to the nearest pixel whose value ∈ target_values, bounded by
    ``maxdist``; beyond it → ``nodata``.  Output tiles carry float64 pixel
    data.  The halo gather spans ceil(maxdist/T) tile rings; the practical
    cap keeps composite memory bounded."""
    if maxdist > 4 * TILE_SIZE:
        raise ValueError("maxdist > 4*TILE_SIZE: composite would exceed 9x9 tiles")
    tv = tuple(target_values)
    pad = int(max(tv)) + 1  # missing neighbors can never be targets

    def _fn(comp: np.ndarray, exists: np.ndarray) -> np.ndarray:
        targets = np.isin(comp, tv)
        d = edt(targets, maxdist)
        d[np.isinf(d)] = nodata
        return d

    return _composite_apply(tile_df, _fn, out_float=True, pad_value=pad,
                            halo=int(np.ceil(maxdist)))


def fill_nodata(tile_df: DataFrame, nodata: int, maxdist: float, smoothing: int = 0) -> DataFrame:
    """GDALFillNodata analog over the tile table (float64 output)."""
    if int(np.ceil(maxdist)) + smoothing > 4 * TILE_SIZE:
        raise ValueError("halo > 4*TILE_SIZE: composite would exceed 9x9 tiles")

    def _fn(comp: np.ndarray, exists: np.ndarray) -> np.ndarray:
        return fill_kernel(comp, nodata, maxdist, smoothing, exists=exists)

    return _composite_apply(tile_df, _fn, out_float=True, pad_value=nodata,
                            halo=int(np.ceil(maxdist)) + smoothing)
