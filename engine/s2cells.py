"""S2 cell IDs: the multi-resolution spherical cell index (Hilbert curve
on the cube), vectorized numpy + Arrow UDF.

Implements the *public* S2 geometry cell-id scheme (s2geometry.io /
Apache-2.0 reference design; no code ported): lon/lat -> unit sphere ->
cube face (0..5) -> (u,v) face coordinates -> quadratic (s,t) transform ->
30-bit (i,j) -> 64-bit cell id ``face(3) | hilbert-position(2*30) |
sentinel(1)``.  The engine's quadkey/tile index (engine/tiles.py) is the
planar web-mercator analog; S2 cells add the distortion-free spherical
index the north star calls for — equal-ish area cells, no dateline seam,
no polar singularity, and a single integer key whose PREFIX structure
(range_min/range_max) makes multi-resolution containment a BETWEEN
predicate, i.e. a sort-merge- or range-join-friendly pruning key at
100 TB.

Scale design: the encoder is a branch-free 30-iteration table walk over
whole numpy arrays (one Arrow batch at a time inside ``with_s2_cell``);
hierarchy ops (parent / range) are pure bit arithmetic usable as JVM-side
expressions on the already-encoded column.  Nothing here shuffles.

Correctness evidence (tests/test_s2cells.py): leaf round-trip lon/lat ->
cell -> center within leaf-cell size; face-center / face-corner anchors;
Hilbert continuity (consecutive leaf positions are ij-adjacent — any
table error breaks the curve); parent containment & range nesting;
cross-face coverage of the whole sphere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61

# Hilbert sub-cell order per orientation (SWAP=1, INVERT=2):
# _POS_TO_IJ[o][pos] = ij ;  _IJ_TO_POS[o][ij] = pos ;
# descending into pos XORs orientation with _POS_TO_ORIENT[pos]
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.uint64)


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cos_phi = np.cos(phi)
    return np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # u/v per face, consistent with the standard S2 face frames
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
        (lambda: y / x, lambda: z / x, None),      # face 0: +x
        (lambda: -x / y, lambda: z / y, None),     # face 1: +y
        (lambda: -x / z, lambda: -y / z, None),    # face 2: +z
        (lambda: z / x, lambda: y / x, None),      # face 3: -x
        (lambda: z / y, lambda: -x / y, None),     # face 4: -y
        (lambda: -y / z, lambda: -x / z, None),    # face 5: -z
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    one = np.ones_like(u)
    frames = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    for f, (fx, fy, fz) in enumerate(frames):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic cell-size flattening."""
    # both where-branches evaluate; the inactive one may sqrt a negative —
    # harmless (discarded), silence it
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor((1 << MAX_LEVEL) * s), 0, (1 << MAX_LEVEL) - 1).astype(np.uint64)


def _face_ij_to_leaf(face, i, j) -> np.ndarray:
    """(face, leaf i, leaf j) -> leaf cell id by the Hilbert walk."""
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = np.asarray(face, dtype=np.uint64)
    orient = n & np.uint64(1)  # initial orientation = face & SWAP
    flat_ij2pos = _IJ_TO_POS.ravel()
    for k in range(MAX_LEVEL - 1, -1, -1):
        kk = np.uint64(k)
        ij = (((i >> kk) & np.uint64(1)) << np.uint64(1)) | ((j >> kk) & np.uint64(1))
        pos = flat_ij2pos[(orient << np.uint64(2)) | ij]
        n = (n << np.uint64(2)) | pos
        orient = orient ^ _POS_TO_ORIENT[pos]
    return (n << np.uint64(1)) | np.uint64(1)


def lonlat_to_cell(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized lon/lat -> S2 cell id at ``level`` (uint64 array)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be 0..30")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _face_ij_to_leaf(face, i, j)
    return cell_parent(leaf, level) if level < MAX_LEVEL else leaf


def _cell_to_face_ij(ids: np.ndarray):
    """Leaf cell id -> (face, i, j) by the inverse Hilbert walk."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(_POS_BITS)).astype(np.int64)
    orient = (ids >> np.uint64(_POS_BITS)) & np.uint64(1)
    i = np.zeros_like(ids)
    j = np.zeros_like(ids)
    flat_pos2ij = _POS_TO_IJ.ravel()
    for k in range(MAX_LEVEL - 1, -1, -1):
        pos = (ids >> np.uint64(2 * k + 1)) & np.uint64(3)
        ij = flat_pos2ij[(orient << np.uint64(2)) | pos]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient = orient ^ _POS_TO_ORIENT[pos]
    return face, i, j


def cell_to_lonlat_center(ids) -> tuple:
    """S2 leaf cell id -> (lon, lat) of the leaf-cell center."""
    face, i, j = _cell_to_face_ij(ids)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / r, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def cell_level(ids) -> np.ndarray:
    """Level of a cell id (position of the lowest set bit)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return (MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2)).astype(np.int64)


def cell_parent(ids, level: int) -> np.ndarray:
    """Ancestor cell at ``level`` (pure bit arithmetic)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & (~(lsb - np.uint64(1)))) | lsb


def cell_range(ids) -> tuple:
    """(range_min, range_max) of leaf ids covered by each cell — the
    BETWEEN-predicate containment key for multi-resolution joins."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return ids - (lsb - np.uint64(1)), ids + (lsb - np.uint64(1))


def _as_i64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 cell ids as int64 for Spark LongType columns
    (bit pattern preserved; ordering of positive-face ids unchanged and
    faces 4-5 map below zero — document when sorting matters, or compare
    with the unsigned view)."""
    return u.view(np.int64)


# level-0 minimum cell width in radians under the quadratic projection
# (the public S2 kMinWidth metric, 2*sqrt(2)/3); width at level L = this / 2^L
MIN_WIDTH_RAD = 2.0 * np.sqrt(2.0) / 3.0


def level_for_radius(radius_rad: float) -> int:
    """Finest level whose minimum cell width still covers ``radius_rad`` —
    at this level any two points within the radius land in the same cell
    or in edge/corner-adjacent cells, so same-cell + 8-neighbor bucketing
    is an exact candidate generator for a radius join."""
    if radius_rad <= 0:
        raise ValueError("radius must be positive")
    lvl = int(np.floor(np.log2(MIN_WIDTH_RAD / radius_rad)))
    return max(0, min(MAX_LEVEL, lvl))


def cell_neighbors(ids, level: int) -> np.ndarray:
    """(n,) cells at ``level`` -> (n, 8) edge+corner neighbor cells.

    In-face neighbors take the exact Hilbert walk; neighbors across a cube
    edge re-encode the neighbor cell's *center* direction (the quadratic
    st->uv extension is monotone just beyond [0,1], and the tangential
    coordinate is preserved exactly along shared edges, so the center lands
    well inside the correct adjacent cell).  At the 8 cube corners the
    diagonal candidate does not exist; it collapses onto an edge neighbor
    and dedupe happens at join time (``array_distinct``)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be 0..30")
    ids = np.asarray(ids, dtype=np.uint64)
    size = np.int64(1) << np.int64(MAX_LEVEL - level)
    lo, _ = cell_range(ids)
    face, i0, j0 = _cell_to_face_ij(lo)
    i0 = i0.astype(np.int64) & ~(size - 1)
    j0 = j0.astype(np.int64) & ~(size - 1)
    n = ids.shape[0]
    out = np.empty((n, 8), dtype=np.uint64)
    lim = np.int64(1) << np.int64(MAX_LEVEL)
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    for c, (di, dj) in enumerate(offsets):
        ii = i0 + di * size
        jj = j0 + dj * size
        inb = (ii >= 0) & (ii < lim) & (jj >= 0) & (jj < lim)
        res = np.empty(n, dtype=np.uint64)
        if inb.any():
            res[inb] = cell_parent(
                _face_ij_to_leaf(face[inb], ii[inb].astype(np.uint64), jj[inb].astype(np.uint64)),
                level,
            )
        wrap = ~inb
        if wrap.any():
            # neighbor-cell center in (possibly out-of-range) st space
            s = (ii[wrap] + size * 0.5) / float(lim)
            t = (jj[wrap] + size * 0.5) / float(lim)
            x, y, z = _face_uv_to_xyz(face[wrap], _st_to_uv(s), _st_to_uv(t))
            f2, u2, v2 = _xyz_to_face_uv(x, y, z)
            leaf = _face_ij_to_leaf(f2, _st_to_ij(_uv_to_st(u2)), _st_to_ij(_uv_to_st(v2)))
            res[wrap] = cell_parent(leaf, level)
        out[:, c] = res
    return out


def s2_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_rad: float,
    level: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    suffix: str = "_r",
    dist_col: str | None = None,
) -> DataFrame:
    """Exact great-circle radius join via S2 bucketing: one shuffle, no
    dateline seam, no polar singularity (the quadkey/tile path needs the
    WRAPDATELINE split for this; the sphere-native key does not).

    Left rows explode to their covering cell plus its 8 neighbors (9 keys,
    deduped); right rows carry their cell; the equi-join on the key is an
    exact candidate generator because at ``level`` the minimum cell width
    is >= the radius (``level_for_radius``).  The exact great-circle test
    is a JVM-side Column expression (haversine), so nothing here leaves
    whole-stage codegen except the numpy cell encoder itself.  Each
    qualifying pair appears exactly once (keys are distinct per left row
    and a right row has one cell)."""
    if level is None:
        level = level_for_radius(radius_rad)

    lcell = with_s2_cell(left, level=level, lon_col=lon_col, lat_col=lat_col, out_col="_s2l")
    rcell = with_s2_cell(right, level=level, lon_col=lon_col, lat_col=lat_col, out_col="_s2r")
    rcell = rcell.drop("_s2r_leaf").withColumnsRenamed(
        {c: c + suffix for c in right.columns} | {"_s2r": "_s2key"}
    )

    nb_schema = StructType(
        list(lcell.schema.fields) + [StructField("_s2nb", ArrayType(LongType()))]
    )
    names = [f.name for f in lcell.schema.fields]

    def _nb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cells = pdf["_s2l"].to_numpy().view(np.uint64)
            keys = np.concatenate([cells[:, None], cell_neighbors(cells, level)], axis=1)
            out = pdf[names].copy()
            out["_s2nb"] = list(_as_i64(keys))
            yield out

    pairs = (
        lcell.mapInPandas(_nb, nb_schema)
        .withColumn("_s2key", F.explode(F.array_distinct("_s2nb")))
        .drop("_s2nb", "_s2l", "_s2l_leaf")
        .join(rcell, "_s2key")
        .drop("_s2key")
    )
    # exact haversine on the JVM side
    lat1 = F.radians(F.col(lat_col))
    lat2 = F.radians(F.col(lat_col + suffix))
    dlat = lat2 - lat1
    dlon = F.radians(F.col(lon_col + suffix)) - F.radians(F.col(lon_col))
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    dist = 2 * F.asin(F.sqrt(a))
    out = pairs.where(dist <= F.lit(float(radius_rad)))
    if dist_col:
        out = out.withColumn(dist_col, dist)
    return out


def with_s2_cell(
    points: DataFrame,
    level: int = 16,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "s2_cell",
) -> DataFrame:
    """Append the S2 cell id at ``level`` (plus leaf ``{out_col}_leaf``)
    as int64 columns — one Arrow batch at a time, no shuffle.  The coarse
    cell is the equi-join / groupBy key; the leaf id plus
    :func:`cell_range` bit arithmetic gives BETWEEN-style containment
    pruning at any other resolution without re-encoding."""
    in_fields = list(points.schema.fields)
    out_schema = StructType(
        in_fields + [StructField(out_col, LongType()), StructField(out_col + "_leaf", LongType())]
    )
    names = [f.name for f in in_fields]

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            leaf = lonlat_to_cell(pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy())
            cell = cell_parent(leaf, level) if level < MAX_LEVEL else leaf
            out = pdf[names].copy()
            out[out_col] = _as_i64(cell)
            out[out_col + "_leaf"] = _as_i64(leaf)
            yield out

    return points.mapInPandas(_enc, out_schema)


def s2_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    query_key: str,
    r0_rad: float = 0.02,
    max_rounds: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    suffix: str = "_r",
    right_key: str | None = None,
) -> DataFrame:
    """EXACT great-circle kNN via radius-doubling S2 joins — the
    sphere-native counterpart of ``engine.joins.knn_join`` (which ranks by
    planar degree distance): no dateline seam, no polar distortion.

    Round i joins the still-unsatisfied queries against ``right`` within
    radius r0·2^i.  Because :func:`s2_radius_join` is an exact candidate
    generator, a query with >= k matches inside radius r has its true
    top-k finalized (every point closer than its kth neighbor lies within
    r and was examined).  Queries still unsatisfied after ``max_rounds``
    (fewer than k points within the final radius) finish on a broadcast
    brute-force pass — by then the pending set is the sparse tail, so the
    cross join is bounded.

    Deterministic: equidistant neighbors rank by ``right_key`` (a column of
    ``right`` the caller asserts unique) when given, else by ALL suffixed
    right columns in order — so ranking never depends on the accident of
    the first right column being a unique key.  Output: left columns +
    suffixed right columns + ``dist_rad`` + ``rank`` (1..k).  Driver
    rounds are O(max_rounds) tiny jobs, mirroring knn_join's ring-doubling
    contract.
    """
    from pyspark.sql import Window

    if right_key is not None:
        if right_key not in right.columns:
            raise ValueError(f"right_key {right_key!r} is not a column of right")
        tie_cols = [F.col(right_key + suffix).asc()]
    else:
        from pyspark.sql.types import MapType

        # maps are not orderable in Spark — skip them rather than fail the
        # whole window for a column that would rarely break a tie anyway
        tie_cols = [
            F.col(f.name + suffix).asc()
            for f in right.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
    results = None
    pending = left
    r = float(r0_rad)
    for _ in range(max_rounds):
        if pending.limit(1).count() == 0:
            break
        cand = s2_radius_join(
            pending, right, r, lon_col=lon_col, lat_col=lat_col,
            suffix=suffix, dist_col="dist_rad",
        )
        w = Window.partitionBy(query_key).orderBy(
            F.col("dist_rad").asc(), *tie_cols
        )
        ranked = cand.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
        done = (
            ranked.groupBy(query_key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= k)
            .select(query_key)
        )
        # truncate lineage each round (same trap knn_join's ring loop hits:
        # an uncached anti-join chain replays every prior round's radius
        # join on each subsequent action)
        got = ranked.join(done, on=query_key, how="left_semi").localCheckpoint(
            eager=True
        )
        results = got if results is None else results.unionByName(got)
        pending = pending.join(done, on=query_key, how="left_anti").localCheckpoint(
            eager=True
        )
        r *= 2.0
    # sparse-tail fallback: brute-force the remaining queries (broadcast).
    # Also runs (empty) when no round produced results, so an empty left
    # input yields a typed empty frame rather than None.
    rest = pending
    if rest.limit(1).count() > 0 or results is None:
        # suffix every right column to match s2_radius_join's output shape
        rren = right.withColumnsRenamed({c: c + suffix for c in right.columns})
        pairs = F.broadcast(rest).crossJoin(rren)
        lat1 = F.radians(F.col(lat_col))
        lat2 = F.radians(F.col(lat_col + suffix))
        dlon = F.radians(F.col(lon_col + suffix)) - F.radians(F.col(lon_col))
        a = (
            F.pow(F.sin((lat2 - lat1) / 2), 2)
            + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
        )
        pairs = pairs.withColumn("dist_rad", 2 * F.asin(F.sqrt(a)))
        w = Window.partitionBy(query_key).orderBy(
            F.col("dist_rad").asc(), *tie_cols
        )
        tail = pairs.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
        results = tail if results is None else results.unionByName(tail)
    return results
