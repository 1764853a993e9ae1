"""Hexagonal multi-resolution cell index — the "H3" half of the north
star's "H3/S2 cell encoding at multiple resolutions" (the S2 half lives
in engine/s2cells.py).

From-scratch design on public hexagonal-grid mathematics: axial/cube
coordinates and cube rounding per the standard formulation (Amit Patel,
"Hexagonal Grids", Red Blob Games — public reference material).  This is
deliberately NOT a transcription of Uber H3: H3 projects the sphere onto
an icosahedron with aperture-7 rotated subdivision, and no H3
implementation exists in this runtime to validate bit parity against.
This index instead uses an equirectangular lon/lat plane with aperture-4
resolution halving, and is *exactly self-consistent* across every
operation (encode, center, parent, distance, disk, boundary, polyfill).
Role parity: multi-resolution hexagonal join keys / pruning prefixes for
the PIP-join and tiling operators (SURVEY §2.3, §2.9), same as S2 cells
and quadkeys.

Layout
------
* Pointy-top hexagons on the plane ``x = lon°``, ``y = lat°``.
* Resolution ``r`` in [0, 15]: circumradius ``s_r = 16 / 2**r`` degrees
  (aperture 4 — each resolution step quarters the cell area).
* Cell id packs (res, axial q, axial r) into one signed int64::

      id = res << 58 | (q + 2**28) << 29 | (r + 2**28)

  Axial coordinates stay far below 2**28 for any on-earth point at any
  supported resolution, so the packing is collision-free.
* Parenthood is by **center containment** at the coarser resolution.
  As in H3 itself, hexagon children are not geometrically nested inside
  their parent — containment is approximate by construction; parent
  lookup is exact and deterministic.

Cross-engine exactness
----------------------
``hex_cell_col`` (Catalyst expression — JVM-side, whole-stage codegen,
no Python) and ``hex_cell_sql`` (ANSI SQL for the DuckDB oracle) are
generated from the same closed form using only ``* / + - floor abs``
and comparisons on float64, all of which are IEEE-754-determined, so
Spark, DuckDB, and the numpy kernel produce bit-identical cell ids.
Rounding is written as ``floor(v + 0.5)`` everywhere (never a dialect
``round``) so half-way ties break identically in all three engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

SIZE0 = 16.0  # circumradius at resolution 0, in degrees
SQRT3 = 1.7320508075688772
MAX_RES = 15
_QR_BIAS = 1 << 28
_Q_SHIFT = 1 << 29
_RES_SHIFT = 1 << 58


def hex_size(res: int) -> float:
    """Circumradius in degrees at ``res`` (aperture-4 halving)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} outside [0, {MAX_RES}]")
    return SIZE0 / float(1 << res)


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube rounding (public formulation): round fractional axial coords to
    the containing hex, fixing the axis with the largest rounding error."""
    x, z = qf, rf
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _point_to_axial(lon: np.ndarray, lat: np.ndarray, res: int):
    s = hex_size(res)
    qf = (SQRT3 / 3.0 * lon - 1.0 / 3.0 * lat) / s
    rf = (2.0 / 3.0 * lat) / s
    return _axial_round(qf, rf)


def pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        np.int64(res) * np.int64(_RES_SHIFT)
        + (q + _QR_BIAS) * np.int64(_Q_SHIFT)
        + (r + _QR_BIAS)
    )


def unpack(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 58
    q = ((cell >> 29) & (_Q_SHIFT - 1)) - _QR_BIAS
    r = (cell & (_Q_SHIFT - 1)) - _QR_BIAS
    return res.astype(np.int64), q, r


def latlng_to_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized encode: lon/lat arrays → int64 hex cell ids at ``res``."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    q, r = _point_to_axial(lon, lat, res)
    return pack(res, q, r)


def cell_to_center(cell: np.ndarray):
    """Cell ids → (lon, lat) hex center arrays."""
    res, q, r = unpack(cell)
    s = SIZE0 / np.power(2.0, res.astype(np.float64))
    lon = s * SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    lat = s * 1.5 * r.astype(np.float64)
    return lon, lat


def cell_to_boundary(cell: int) -> np.ndarray:
    """One cell id → (6, 2) array of (lon, lat) vertices (pointy-top,
    starting at the top vertex, counter-clockwise)."""
    lon, lat = cell_to_center(np.asarray([cell], dtype=np.int64))
    res = int(np.asarray(cell, dtype=np.int64) >> 58)
    s = hex_size(res)
    ang = np.deg2rad(90.0 + 60.0 * np.arange(6))
    return np.stack([lon[0] + s * np.cos(ang), lat[0] + s * np.sin(ang)], axis=1)


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Vectorized parent by center containment at ``parent_res``."""
    res, _, _ = unpack(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be coarser (<=) than the cell resolution")
    lon, lat = cell_to_center(cell)
    return latlng_to_cell(lon, lat, parent_res)


def grid_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex grid distance between same-resolution cells (cube metric)."""
    ra, qa, sa = unpack(a)
    rb, qb, sb = unpack(b)
    if np.any(ra != rb):
        raise ValueError("grid_distance requires same-resolution cells")
    dq = qa - qb
    dr = sa - sb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within grid distance ``k`` of ``cell`` (1 + 3k(k+1) ids),
    deterministic order: by distance ring, then (dq, dr)."""
    res, q, r = unpack(np.asarray([cell], dtype=np.int64))
    dq, dr = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    dq = dq.ravel()
    dr = dr.ravel()
    dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    keep = dist <= k
    dq, dr, dist = dq[keep], dr[keep], dist[keep]
    order = np.lexsort((dr, dq, dist))
    return pack(int(res[0]), q[0] + dq[order], r[0] + dr[order])


def grid_ring(cell: int, k: int) -> np.ndarray:
    """The hollow ring at exactly grid distance ``k`` (6k ids for k>=1)."""
    disk = grid_disk(cell, k)
    if k == 0:
        return disk
    inner = grid_disk(cell, k - 1)
    return np.setdiff1d(disk, inner)


def polyfill(ring_lonlat: np.ndarray, res: int) -> np.ndarray:
    """Hex cells whose center falls inside the polygon ring (H3 polyfill
    containment rule).  ``ring_lonlat``: (n, 2) closed or open ring."""
    ring = np.asarray(ring_lonlat, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    lo = ring.min(axis=0)
    hi = ring.max(axis=0)
    s = hex_size(res)
    # candidate axial range from the bbox corners, padded one cell
    corners_lon = np.array([lo[0], hi[0], lo[0], hi[0]])
    corners_lat = np.array([lo[1], lo[1], hi[1], hi[1]])
    qc, rc = _point_to_axial(corners_lon, corners_lat, res)
    qs = np.arange(qc.min() - 1, qc.max() + 2)
    rs = np.arange(rc.min() - 1, rc.max() + 2)
    qg, rg = np.meshgrid(qs, rs, indexing="ij")
    cells = pack(res, qg.ravel(), rg.ravel())
    lon, lat = cell_to_center(cells)
    # even-odd ray casting (same rule as geom.PreparedPolygon)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(lon.shape, dtype=bool)
    for i in range(len(x0)):
        crosses = (y0[i] > lat) != (y1[i] > lat)
        if not crosses.any():
            continue
        xi = x0[i] + (lat - y0[i]) / (y1[i] - y0[i]) * (x1[i] - x0[i])
        inside ^= crosses & (lon < xi)
    return np.sort(cells[inside])


# ---------------------------------------------------------------------------
# Catalyst / SQL encoders (identical closed form, three engines)
# ---------------------------------------------------------------------------


def hex_cell_col(lon_col: Column, lat_col: Column, res: int) -> Column:
    """Pure-Catalyst hex cell id (no Python, whole-stage codegen)."""
    s = hex_size(res)
    qf = (F.lit(SQRT3 / 3.0) * lon_col - F.lit(1.0 / 3.0) * lat_col) / F.lit(s)
    rf = (F.lit(2.0 / 3.0) * lat_col) / F.lit(s)
    x, z = qf, rf
    y = -x - z
    rx = F.floor(x + F.lit(0.5)).cast("double")
    ry = F.floor(y + F.lit(0.5)).cast("double")
    rz = F.floor(z + F.lit(0.5)).cast("double")
    dx = F.abs(rx - x)
    dy = F.abs(ry - y)
    dz = F.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = (~fix_x) & (~(dy > dz))
    q = F.when(fix_x, -ry - rz).otherwise(rx).cast("long")
    r = F.when(fix_z, -(F.when(fix_x, -ry - rz).otherwise(rx)) - ry).otherwise(rz).cast("long")
    return (
        F.lit(res).cast("long") * F.lit(_RES_SHIFT)
        + (q + F.lit(_QR_BIAS)) * F.lit(_Q_SHIFT)
        + (r + F.lit(_QR_BIAS))
    ).alias(f"hex{res}")


def hex_cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """The same closed form as ANSI SQL (DuckDB oracle).  Bit-identical to
    ``hex_cell_col`` and ``latlng_to_cell``: only IEEE-determined ops."""
    s = repr(hex_size(res))
    qf = f"(({SQRT3!r} / 3.0 * ({lon_expr}) - 1.0 / 3.0 * ({lat_expr})) / {s})"
    rf = f"((2.0 / 3.0 * ({lat_expr})) / {s})"
    x, z = qf, rf
    y = f"(-{x} - {z})"
    rx = f"CAST(floor({x} + 0.5) AS DOUBLE)"
    ry = f"CAST(floor({y} + 0.5) AS DOUBLE)"
    rz = f"CAST(floor({z} + 0.5) AS DOUBLE)"
    dx = f"abs({rx} - {x})"
    dy = f"abs({ry} - {y})"
    dz = f"abs({rz} - {z})"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN NOT {fix_x} AND NOT ({dy} > {dz}) "
        f"THEN -(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END) - {ry} "
        f"ELSE {rz} END AS BIGINT)"
    )
    return (
        f"(CAST({res} AS BIGINT) * {_RES_SHIFT} "
        f"+ ({q} + {_QR_BIAS}) * {_Q_SHIFT} + ({r} + {_QR_BIAS}))"
    )


def with_hex_cell(
    df: DataFrame, res: int, lon_col: str = "lon", lat_col: str = "lat", out: str | None = None
) -> DataFrame:
    """Append the hex cell id at ``res`` as a plain Catalyst column."""
    return df.withColumn(out or f"hex{res}", hex_cell_col(F.col(lon_col), F.col(lat_col), res))


def multi_res_rollup(
    df: DataFrame, resolutions: list, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Per-cell counts at every resolution in one pass: encode the finest
    resolution once, derive coarser keys by re-encoding each point (exact —
    no parent approximation error accumulates), aggregate with a single
    grouping-sets-style union.  All JVM-side."""
    frames = []
    for res in resolutions:
        frames.append(
            df.select(hex_cell_col(F.col(lon_col), F.col(lat_col), res).alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("res", F.lit(int(res)))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
