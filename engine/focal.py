"""Focal (spatial-window) raster operators: the gdaldem family.

The reference computes hillshade/slope/aspect/TRI/TPI/roughness with a 3×3
window over the grid (apps/gdaldem.cpp:37-125).  Distributed form: each
256×256 tile needs a 1-pixel halo from its 8 neighbors — implemented as a
**halo exchange join**: every tile emits (itself + 8 neighbor-addressed
slivers) keyed by the receiving tile, one shuffle co-locates each tile with
its halo, and a grouped-map UDF assembles the 258×258 padded array and runs
the numpy kernel.  Missing neighbors pad with the edge value (gdaldem's
border handling computes windows from available cells).

The same pattern implements proximity (alg/gdalproximity.cpp) and focal
fill (alg/rasterfill.cpp) by iterating to a fixpoint; slope/TRI/roughness
are provided as representative kernels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .raster import TILE_SIZE, TILE_SCHEMA, bytes_to_tile, tile_to_bytes


def _emit_halo_slivers(pdf: pd.DataFrame) -> pd.DataFrame:
    """For one batch of tiles: rows addressed to each neighbor that needs a
    sliver of this tile, plus the tile itself addressed to itself.
    Sliver kinds: 8 compass directions encoded (dx, dy) ∈ {-1,0,1}²."""
    rows = []
    for r in pdf.itertuples():
        g = bytes_to_tile(r.data)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    payload = r.data
                else:
                    # receiver (tx+dx, ty+dy) needs this tile's strip on the
                    # side facing it; ty axis is TMS (up), array row 0 = top
                    cols = {-1: slice(0, 1), 0: slice(None), 1: slice(TILE_SIZE - 1, TILE_SIZE)}[dx]
                    # receiver above (dy=+1) needs our TOP row (row 0)
                    rws = {1: slice(0, 1), 0: slice(None), -1: slice(TILE_SIZE - 1, TILE_SIZE)}[dy]
                    payload = tile_to_bytes(np.ascontiguousarray(g[rws, cols]))
                rows.append((int(r.zoom), int(r.tx) + dx, int(r.ty) + dy, dx, dy, payload))
    return pd.DataFrame(rows, columns=["zoom", "tx", "ty", "dx", "dy", "data"])


def _assemble_padded(pdf: pd.DataFrame) -> np.ndarray | None:
    """(tile + slivers) rows for ONE receiver tile → 258×258 padded array,
    edge-replicated where neighbors are missing.  Returns None if the
    receiver has no center tile (it's outside the layer)."""
    center = None
    slivers = {}
    for r in pdf.itertuples():
        if r.dx == 0 and r.dy == 0:
            center = bytes_to_tile(r.data)
        else:
            slivers[(r.dx, r.dy)] = np.frombuffer(r.data, dtype="<i4")
    if center is None:
        return None
    P = TILE_SIZE
    pad = np.empty((P + 2, P + 2), dtype=np.int64)
    pad[1:-1, 1:-1] = center
    # sliver from neighbor at (dx,dy) relative to SENDER: receiver side is
    # (-dx,-dy).  Sender's strip lands on receiver's pad edge:
    # neighbor LEFT of us (sender dx=+1 toward us) fills pad column 0.
    left = slivers.get((1, 0))
    pad[1:-1, 0] = left if left is not None else center[:, 0]
    right = slivers.get((-1, 0))
    pad[1:-1, -1] = right if right is not None else center[:, -1]
    # neighbor ABOVE us in TMS (ty+1) sent its BOTTOM row; it reached us as
    # the sliver addressed with dy=-1 from sender → key (0,-1) fills pad row 0
    top = slivers.get((0, -1))
    pad[0, 1:-1] = top if top is not None else center[0, :]
    bot = slivers.get((0, 1))
    pad[-1, 1:-1] = bot if bot is not None else center[-1, :]
    for (sdx, sdy), corner_pos in (
        ((1, -1), (0, 0)),       # upper-left pad corner
        ((-1, -1), (0, P + 1)),  # upper-right
        ((1, 1), (P + 1, 0)),    # lower-left
        ((-1, 1), (P + 1, P + 1)),
    ):
        c = slivers.get((sdx, sdy))
        if c is not None:
            pad[corner_pos] = c[0]
        else:
            rr = 1 if corner_pos[0] == 0 else P
            cc = 1 if corner_pos[1] == 0 else P
            pad[corner_pos] = pad[rr, cc]
    return pad


def slope_kernel(pad: np.ndarray) -> np.ndarray:
    """Horn slope in value-units per pixel ×100 (int32 output), the 3×3
    Horn stencil of gdaldem slope (apps/gdaldem.cpp: slope case)."""
    a = pad.astype(np.float64)
    dzdx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    ) / 8.0
    dzdy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    ) / 8.0
    return np.floor(np.sqrt(dzdx**2 + dzdy**2) * 100.0 + 0.5).astype(np.int64)


def tri_kernel(pad: np.ndarray) -> np.ndarray:
    """Terrain Ruggedness Index: mean |center − neighbor| over the 8
    neighbors, ×100 rounded (apps/gdaldem.cpp TRI)."""
    c = pad[1:-1, 1:-1].astype(np.float64)
    acc = np.zeros_like(c)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            acc += np.abs(pad[1 + dr : 1 + dr + TILE_SIZE, 1 + dc : 1 + dc + TILE_SIZE] - c)
    return np.floor(acc / 8.0 * 100.0 + 0.5).astype(np.int64)


def roughness_kernel(pad: np.ndarray) -> np.ndarray:
    """Roughness: max − min of the 3×3 window (apps/gdaldem.cpp roughness)."""
    stack = np.stack(
        [
            pad[1 + dr : 1 + dr + TILE_SIZE, 1 + dc : 1 + dc + TILE_SIZE]
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
    )
    return (stack.max(axis=0) - stack.min(axis=0)).astype(np.int64)


def aspect_kernel(pad: np.ndarray) -> np.ndarray:
    """Aspect in degrees ×100 (0..36000), Horn stencil (apps/gdaldem.cpp
    aspect case): atan2(dz/dy, -dz/dx) mapped to compass-ish degrees; flat
    cells (both gradients 0) → -1 like gdaldem's nodata convention."""
    a = pad.astype(np.float64)
    dzdx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    ) / 8.0
    dzdy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    ) / 8.0
    ang = np.degrees(np.arctan2(dzdy, -dzdx))
    ang = np.where(ang < 0, ang + 360.0, ang)
    flat = (dzdx == 0) & (dzdy == 0)
    out = np.floor(ang * 100.0 + 0.5).astype(np.int64)
    out[flat] = -1
    return out


def hillshade_kernel(pad: np.ndarray) -> np.ndarray:
    """Hillshade 0..255 (apps/gdaldem.cpp hillshade): Horn gradients,
    azimuth 315°, altitude 45°, z-factor 1."""
    a = pad.astype(np.float64)
    dzdx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    ) / 8.0
    dzdy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    ) / 8.0
    az = np.radians(315.0)
    alt = np.radians(45.0)
    slope = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    aspect = np.arctan2(dzdy, -dzdx)
    shaded = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect)
    return np.clip(np.floor(shaded * 255.0 + 0.5), 0, 255).astype(np.int64)


def tpi_kernel(pad: np.ndarray) -> np.ndarray:
    """Topographic Position Index: center − mean of the 8 neighbors, ×100
    rounded (apps/gdaldem.cpp:37-125 TPI case) — positive on ridges,
    negative in valleys."""
    c = pad[1:-1, 1:-1].astype(np.float64)
    acc = np.zeros_like(c)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            acc += pad[1 + dr : 1 + dr + TILE_SIZE, 1 + dc : 1 + dc + TILE_SIZE]
    v = c - acc / 8.0
    return np.floor(np.abs(v) * 100.0 + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)


def _horn_gradients(pad: np.ndarray):
    a = pad.astype(np.float64)
    dzdx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    ) / 8.0
    dzdy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    ) / 8.0
    return dzdx, dzdy


def hillshade_combined_kernel(pad: np.ndarray) -> np.ndarray:
    """gdaldem hillshade -combined: the standard shade MULTIPLIED by the
    slope-darkening term (combined = shade · (1 − slope/(π/2)), the
    published gdaldem combined formula)."""
    dzdx, dzdy = _horn_gradients(pad)
    az = np.radians(315.0)
    alt = np.radians(45.0)
    slope = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    aspect = np.arctan2(dzdy, -dzdx)
    shaded = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect)
    combined = shaded * (1.0 - slope / (np.pi / 2.0))
    return np.clip(np.floor(combined * 255.0 + 0.5), 0, 255).astype(np.int64)


def hillshade_multidirectional_kernel(pad: np.ndarray) -> np.ndarray:
    """gdaldem hillshade -multidirectional (USGS open-file report 92-422,
    the formula gdaldem documents): weighted shades from azimuths
    225/270/315/360 with weights sin²(aspect − azimuth), normalized by
    the weight sum."""
    dzdx, dzdy = _horn_gradients(pad)
    alt = np.radians(45.0)
    slope = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    aspect = np.arctan2(dzdy, -dzdx)
    num = np.zeros_like(slope)
    den = np.zeros_like(slope)
    for az_deg in (225.0, 270.0, 315.0, 360.0):
        az = np.radians(az_deg)
        w = np.sin(aspect - (az - np.pi / 2.0)) ** 2
        sh = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect)
        num += w * sh
        den += w
    flat = den < 1e-12  # perfectly flat: every directional shade equals sin(alt)
    shaded = np.where(flat, np.sin(alt), num / np.where(flat, 1.0, den))
    return np.clip(np.floor(shaded * 255.0 + 0.5), 0, 255).astype(np.int64)


KERNELS = {
    "slope": slope_kernel,
    "tri": tri_kernel,
    "roughness": roughness_kernel,
    "aspect": aspect_kernel,
    "hillshade": hillshade_kernel,
    "hillshade_combined": hillshade_combined_kernel,
    "hillshade_multidirectional": hillshade_multidirectional_kernel,
    "tpi": tpi_kernel,
}


def color_relief(tile_df: DataFrame, ramp: list) -> DataFrame:
    """gdaldem color-relief (apps/gdaldem.cpp GDALColorRelief /
    GDALColorReliefGetRGBA): per-pixel linear interpolation of an
    (elevation, r, g, b) ramp, GDAL's quirky ``(int)(0.45 + ...)``
    near-round included; values outside the ramp clamp to the end entries
    (COLOR_SELECTION_INTERPOLATE default).

    Pointwise (no halo): one mapInPandas over the tile table.  Output
    packs RGB into one int band (r<<16 | g<<8 | b) so the tile schema is
    unchanged — a 3-band sink splits it back out.
    """
    from typing import Iterator

    ramp = sorted((float(e), int(r), int(g), int(b)) for e, r, g, b in ramp)
    ev = np.array([e for e, *_ in ramp])
    chans = [np.array([c[i + 1] for c in ramp], dtype=np.float64) for i in range(3)]

    def _apply(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                g = bytes_to_tile(row.data).astype(np.float64)
                idx = np.clip(np.searchsorted(ev, g, side="right"), 1, len(ev) - 1)
                e0 = ev[idx - 1]
                e1 = ev[idx]
                ratio = np.clip((g - e0) / np.where(e1 != e0, e1 - e0, 1.0), 0.0, 1.0)
                rgb = []
                for ch in chans:
                    c0 = ch[idx - 1]
                    c1 = ch[idx]
                    rgb.append(np.floor(0.45 + c0 + ratio * (c1 - c0)).astype(np.int64))
                packed = (rgb[0] << 16) | (rgb[1] << 8) | rgb[2]
                out.append((int(row.tx), int(row.ty), tile_to_bytes(packed)))
            yield pd.DataFrame(out, columns=["tx", "ty", "data"])

    return tile_df.select("tx", "ty", "data").mapInPandas(_apply, "tx long, ty long, data binary")


def focal(tile_df: DataFrame, kernel: str) -> DataFrame:
    """Apply a 3×3 focal kernel to every tile of a tile table with exact
    cross-tile halo exchange.  Output: same tile-table schema.

    Plan: mapInPandas emits 9 addressed rows per tile (center + 8 slivers,
    only 1-px strips — the halo traffic is ~1.5% of tile bytes) →
    groupBy(zoom, tx, ty) grouped-map assembles the padded array and runs
    the numpy kernel.  One shuffle total, independent of kernel count.
    """
    fn = KERNELS[kernel]
    sliver_schema = "zoom int, tx long, ty long, dx int, dy int, data binary"

    def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _emit_halo_slivers(pdf)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pad = _assemble_padded(pdf)
        if pad is None:
            return pd.DataFrame({"zoom": [], "tx": [], "ty": [], "data": []})
        out = fn(pad)
        return pd.DataFrame(
            {
                "zoom": [int(pdf["zoom"].iat[0])],
                "tx": [int(pdf["tx"].iat[0])],
                "ty": [int(pdf["ty"].iat[0])],
                "data": [tile_to_bytes(out)],
            }
        )

    # explicit partition count: the kernel stage is numpy-CPU-bound per
    # tile; AQE's size-based coalesce would pack it into too few tasks
    nparts = tile_df.sparkSession.sparkContext.defaultParallelism
    slivers = tile_df.mapInPandas(_emit, sliver_schema).repartition(nparts, "tx", "ty")
    return slivers.groupBy("zoom", "tx", "ty").applyInPandas(_apply, TILE_SCHEMA)
