"""Polygonize: raster connected components → polygon rings with holes.

Reference: ``GDALPolygonize`` (alg/polygonize.cpp:495, wrapper
swig/python/scripts/gdal_polygonize.py:209) — equal-valued 4-connected
pixel regions become polygons (exterior ring + holes) with the region value
as attribute.  Distributed form:

1. **edge emission** — per tile (with the focal 1-px value halo): every
   pixel side whose 4-neighbor has a different value emits one directed
   unit edge in global pixel-corner coordinates, oriented with the region
   interior on the RIGHT (y grows downward), so shared sides cancel by
   construction and each region's edge set forms closed loops;
2. **component keying** — edges carry the global component id (per-tile
   labels + the broadcast seam union-find of engine.components);
3. **ring assembly** — one shuffle groups each component's edges; a grouped
   UDF walks them (at pinch corners the rightmost turn w.r.t. the incoming
   direction keeps rings non-crossing — the same disambiguation GDAL's
   polygon enumerator applies), compresses collinear runs, classifies
   exterior (positive signed area in y-down coords) vs holes, and emits
   WKB.

Area invariant: Σ signed ring areas == component pixel count (tested).
The edge shuffle is perimeter-proportional (≪ pixel data); a continent-
sized component concentrates its ring assembly in one task — the same
sequential cost GDALPolygonize pays for the whole raster, paid here only
per component.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geom
from .components import _UF, build_seam_uf, label_tile
from .focal import _emit_halo_slivers
from .raster import TILE_SIZE, bytes_to_tile


def trace_rings(edges: list) -> list:
    """Directed unit edges [((x1,y1),(x2,y2))] → list of rings
    [np.ndarray (N,2)], collinear-compressed, walk deterministic (smallest
    unused edge first; rightmost turn at junctions)."""
    succ = defaultdict(list)
    for a, b in edges:
        succ[a].append(b)
    for v in succ.values():
        v.sort()
    unused = defaultdict(set)
    for a, b in edges:
        unused[a].add(b)
    rings = []
    for a0, b0 in sorted(edges):
        if b0 not in unused[a0]:
            continue
        ring = [a0]
        a, b = a0, b0
        while True:
            unused[a].discard(b)
            ring.append(b)
            if b == a0:
                break
            d = (b[0] - a[0], b[1] - a[1])
            cands = [c for c in succ[b] if c in unused[b]]
            if not cands:  # malformed input; bail to avoid infinite loop
                break
            # rightmost turn first: max cross(d, c-b); ties impossible for
            # distinct axis directions except straight/reverse
            cands.sort(key=lambda c: -(d[0] * (c[1] - b[1]) - d[1] * (c[0] - b[0])))
            a, b = b, cands[0]
        if ring[0] == ring[-1] and len(ring) >= 5:
            r = np.asarray(ring[:-1], dtype=np.float64)
            # drop collinear midpoints (GDAL emits direction changes only)
            d = np.diff(np.vstack([r[-1:], r, r[:1]]), axis=0)
            keep = (d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]) != 0
            rings.append(r[keep])
    return rings


def ring_signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return float(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


_EDGE_SCHEMA = "gid string, value long, x1 long, y1 long, x2 long, y2 long"
_POLY_SCHEMA = "component_id string, value long, n_rings int, area double, geom_wkb binary"


def polygonize(tile_df: DataFrame, background: int = 0) -> DataFrame:
    """GDALPolygonize over the tile table → (component_id, value, n_rings,
    area, geom_wkb) with geometry in global pixel-corner coordinates
    (x = tx·T + col, y = −ty·T + row, y downward)."""
    src = tile_df.select("tx", "ty", "data")
    uf = build_seam_uf(src, background)
    bc = tile_df.sparkSession.sparkContext.broadcast(dict(uf.p))
    sliver_schema = "zoom int, tx long, ty long, dx int, dy int, data binary"

    def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if "zoom" not in pdf.columns:
                pdf = pdf.assign(zoom=0)
            yield _emit_halo_slivers(pdf)

    def _edges(pdf: pd.DataFrame) -> pd.DataFrame:
        parents = bc.value

        def find(key):
            while parents.get(key, key) != key:
                key = parents[key]
            return key

        center = None
        slivers = {}
        for r in pdf.itertuples():
            if r.dx == 0 and r.dy == 0:
                center = bytes_to_tile(r.data)
            else:
                slivers[(r.dx, r.dy)] = np.frombuffer(r.data, dtype="<i4")
        if center is None:
            return pd.DataFrame({k: [] for k in ("gid", "value", "x1", "y1", "x2", "y2")})
        T = TILE_SIZE
        tx = int(pdf["tx"].iat[0])
        ty = int(pdf["ty"].iat[0])
        pv = np.full((T + 2, T + 2), background, dtype=np.int64)
        pv[1:-1, 1:-1] = center
        left = slivers.get((1, 0))
        if left is not None:
            pv[1:-1, 0] = left
        right = slivers.get((-1, 0))
        if right is not None:
            pv[1:-1, -1] = right
        top = slivers.get((0, -1))
        if top is not None:
            pv[0, 1:-1] = top
        bot = slivers.get((0, 1))
        if bot is not None:
            pv[-1, 1:-1] = bot
        lab = label_tile(center, background)
        nz = lab != 0
        # per-LABEL gid lookup table (labels are dense 1..K) — the edge
        # emission below is then fully vectorized per side
        kmax = int(lab.max())
        gid_lut = np.empty(kmax + 1, dtype=object)
        for l in range(1, kmax + 1):
            root = find((ty, tx, l))
            gid_lut[l] = f"{root[0]}_{root[1]}_{root[2]}"
        # directed edges, interior on the right (y-down): top L→R, right
        # T→B, bottom R→L, left B→T
        sides = (
            (pv[0:T, 1 : T + 1], 0, 0, 1, 0),        # top: (gx,gy)→(gx+1,gy)
            (pv[1 : T + 1, 2 : T + 2], 1, 0, 1, 1),  # right: (gx+1,gy)→(gx+1,gy+1)
            (pv[2 : T + 2, 1 : T + 1], 1, 1, 0, 1),  # bottom: (gx+1,gy+1)→(gx,gy+1)
            (pv[1 : T + 1, 0:T], 0, 1, 0, 0),        # left: (gx,gy+1)→(gx,gy)
        )
        frames = []
        for nbr, ax, ay, bx_, by_ in sides:
            m = nz & (nbr != center)
            if not m.any():
                continue
            rr, cc = np.nonzero(m)
            gx = tx * T + cc
            gy = -(ty * T) + rr
            frames.append(
                pd.DataFrame(
                    {
                        "gid": gid_lut[lab[rr, cc]],
                        "value": center[rr, cc].astype(np.int64),
                        "x1": gx + ax,
                        "y1": gy + ay,
                        "x2": gx + bx_,
                        "y2": gy + by_,
                    }
                )
            )
        if not frames:
            return pd.DataFrame({k: [] for k in ("gid", "value", "x1", "y1", "x2", "y2")})
        return pd.concat(frames, ignore_index=True)

    def _assemble_one(gid: str, sub: pd.DataFrame, out: dict):
        arr = sub[["x1", "y1", "x2", "y2"]].to_numpy(np.int64).tolist()
        edges = [((a, b), (c, d)) for a, b, c, d in arr]
        rings = trace_rings(edges)
        if not rings:
            return
        areas = [ring_signed_area(r) for r in rings]
        order = sorted(range(len(rings)), key=lambda i: -areas[i])
        ordered = [rings[i] for i in order]  # exterior (max positive) first
        out["component_id"].append(gid)
        out["value"].append(int(sub["value"].iat[0]))
        out["n_rings"].append(len(rings))
        out["area"].append(float(sum(areas)))
        out["geom_wkb"].append(geom.wkb_polygon(ordered))

    def _assemble_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a hash partition holds MANY components (all of each one's edges);
        # pandas groupby inside one task avoids Spark's per-group
        # applyInPandas overhead, which dominates when components are tiny
        # (world-scattered single-pixel regions).  Batches of one partition
        # must be concatenated first — a component's rows can straddle
        # Arrow batches.
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        out: dict = {k: [] for k in ("component_id", "value", "n_rings", "area", "geom_wkb")}
        for gid, sub in pdf.groupby("gid", sort=False):
            _assemble_one(gid, sub, out)
        yield pd.DataFrame(out)

    slivers = src.withColumn("zoom", F.lit(0)).select("zoom", "tx", "ty", "data").mapInPandas(
        _emit, sliver_schema
    )
    edges = slivers.groupBy("tx", "ty").applyInPandas(lambda k, p: _edges(p), _EDGE_SCHEMA)
    return edges.repartition(F.col("gid")).mapInPandas(_assemble_part, _POLY_SCHEMA)
