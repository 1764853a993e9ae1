"""Spatial join operators: tile/cell encode, broadcast + shuffle PIP, kNN.

The engine's re-expression of GDAL's spatial-join surface
(SURVEY.md §2.3):

* layer-algebra Intersection over point inputs (``ogr/ogrsf_frmts/generic/
  ogrlayer.cpp:1954``) → point-in-polygon join, in two physical plans that
  must emit identical rows:
    - **broadcast** (method layer small — mirrors the reference's own advice
      to copy the method layer to memory, ogrlayer.cpp:1915-1916): prepared
      polygons + grid index broadcast, ``mapInPandas`` over points;
    - **shuffle** (method layer large): both sides exploded to covering
      mercator tiles at an index zoom, equi-join on the cell id — the
      cell-prefix pruning the north star requires — then exact vectorized
      refine; optional hot-cell salting.
* ``GDALGridNearestNeighbor``'s quadtree-accelerated kNN
  (``alg/gdalgrid.cpp:675,691``) → cell-ring expansion join with
  sorted-merge (window top-k) refinement; rings grow per-round for
  unsatisfied queries only.

All heavy math is numpy inside Arrow-batched pandas UDFs; all matching is
JVM-side equi-joins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import geom, tiles


# ---------------------------------------------------------------------------
# Cell encoding (the H3/S2-style multi-resolution index of the north star,
# realized as web-mercator tiles + quadkey prefixes — gdal2tiles.py:205-318)
# ---------------------------------------------------------------------------


def with_tile(
    df: DataFrame,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    prefix: str = "",
) -> DataFrame:
    """Append TMS tile coords + quadkey at ``zoom`` (vectorized pandas UDF).

    Columns: ``{prefix}tx {prefix}ty {prefix}quadkey``.  The quadkey is the
    multi-resolution cell id: its z-length prefixes are the coarser cells.
    """
    import pyarrow as pa

    in_fields = list(df.schema.fields)
    names = [f.name for f in in_fields]
    i_lon, i_lat = names.index(lon_col), names.index(lat_col)
    out_schema = StructType(
        in_fields
        + [
            StructField(prefix + "tx", LongType()),
            StructField(prefix + "ty", LongType()),
            StructField(prefix + "quadkey", StringType()),
        ]
    )

    def _encode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            lon = batch.column(i_lon).to_numpy(zero_copy_only=False)
            lat = batch.column(i_lat).to_numpy(zero_copy_only=False)
            tx, ty = tiles.lonlat_to_tile(lon, lat, zoom)
            qk = tiles.quadkey(tx, ty, zoom)
            arrays = list(batch.columns) + [
                pa.array(tx, type=pa.int64()),
                pa.array(ty, type=pa.int64()),
                pa.array(qk),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=names + [prefix + "tx", prefix + "ty", prefix + "quadkey"]
            )

    return df.mapInArrow(_encode, out_schema)


def with_cell(df: DataFrame, zoom: int, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Append a single packed int64 cell id ``(tx << zoom+1) | ty`` at zoom —
    a cheaper join key than the quadkey string for fixed-zoom equi-joins."""
    out = with_tile(df, zoom, lon_col, lat_col, prefix="_c_")
    return out.withColumn(
        "cell", (F.col("_c_tx") * F.lit(np.int64(2 ** (zoom + 1))) + F.col("_c_ty")).cast("long")
    ).drop("_c_tx", "_c_ty", "_c_quadkey")


# ---------------------------------------------------------------------------
# Broadcast PIP join
# ---------------------------------------------------------------------------


# Worker-process cache of prepared polygon indexes, keyed by broadcast id.
# Spark reuses python workers across tasks (spark.python.worker.reuse), so the
# index is built ONCE per executor worker instead of once per task — without
# this, per-task index construction dominates and the join anti-scales as
# task count grows (measured: 3x slowdown at 64 tasks).  This is the engine's
# analog of the reference's one-time prepared-geometry setup per thread
# (GDALCloneTransformer pattern, alg/gdalwarpkernel.cpp:255-260).
_INDEX_CACHE: dict = {}


class _PolyGridIndex:
    """Driver-built uniform grid index over polygon bboxes (the analog of the
    reference's CPLQuadTree, port/cpl_quad_tree.h).  Broadcast once; lookup
    is integer arithmetic, candidate sets are per-cell python lists."""

    def __init__(self, pid_wkb: list, cells: int | None = None):
        self.prepared = geom.prepare_polygons(pid_wkb)
        if cells is None:
            # index cell ≈ polygon footprint: ~1-4 candidates per cell while
            # keeping the per-batch group count (and thus python-loop
            # iterations in the hot path) low
            cells = max(8, min(128, int(len(pid_wkb) ** 0.5)))
        self.cells = cells
        self.step_x = 360.0 / cells
        self.step_y = 180.0 / cells
        self.index: dict = {}
        for i, (_pid, prep) in enumerate(self.prepared):
            cx0 = int((prep.minx + 180.0) // self.step_x)
            cx1 = int((prep.maxx + 180.0) // self.step_x)
            cy0 = int((prep.miny + 90.0) // self.step_y)
            cy1 = int((prep.maxy + 90.0) // self.step_y)
            for cx in range(max(cx0, 0), min(cx1, self.cells - 1) + 1):
                for cy in range(max(cy0, 0), min(cy1, self.cells - 1) + 1):
                    self.index.setdefault(cx * cells + cy, []).append(i)
        # tuple-ify for cheap repeated lookup in the hot loop
        self.index = {k: tuple(v) for k, v in self.index.items()}

    def candidates(self, packed_cell: int) -> tuple:
        return self.index.get(packed_cell, ())


def pip_join_broadcast(
    points: DataFrame,
    polygons_pdf: pd.DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    keep_cols: tuple = ("url",),
) -> DataFrame:
    """Broadcast point-in-polygon join.

    ``polygons_pdf``: pandas (polygon_id, geom_wkb, ...) — the method layer,
    collected and broadcast (small side).  Output: ``keep_cols`` + lon/lat +
    ``polygon_id``; one row per matching polygon (overlaps → multiple rows,
    no match → row dropped = inner Intersection semantics,
    ogrlayer.cpp:2038-2054).
    """
    import uuid

    import pyarrow as pa

    spark = points.sparkSession
    pid_wkb = list(zip(polygons_pdf["polygon_id"].tolist(), polygons_pdf["geom_wkb"].tolist()))
    bc = spark.sparkContext.broadcast(pid_wkb)
    cache_key = uuid.uuid4().hex  # one prepared index per broadcast per worker

    in_cols = list(keep_cols) + [lon_col, lat_col]
    out_fields = [f for f in points.select(*in_cols).schema.fields]
    out_schema = StructType(out_fields + [StructField("polygon_id", IntegerType())])

    # Arrow-native (mapInArrow): numeric columns come out as zero-copy numpy
    # views and the match-row gather is C++ `take` — the pandas DataFrame
    # construction per batch was the dominant cost of the join at scale.
    def _match(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        index = _INDEX_CACHE.get(cache_key)
        if index is None:
            index = geom.VectorPIPIndex(bc.value)
            _INDEX_CACHE[cache_key] = index
        for batch in batches:
            lon = batch.column(len(keep_cols)).to_numpy(zero_copy_only=False)
            lat = batch.column(len(keep_cols) + 1).to_numpy(zero_copy_only=False)
            idx, pids = index.query(lon, lat)
            taken = batch.take(pa.array(idx, type=pa.int64()))
            arrays = list(taken.columns) + [pa.array(pids.astype(np.int32), type=pa.int32())]
            yield pa.RecordBatch.from_arrays(arrays, names=in_cols + ["polygon_id"])

    return points.select(*in_cols).mapInArrow(_match, out_schema)


# ---------------------------------------------------------------------------
# Shuffle (cell-partitioned) PIP join
# ---------------------------------------------------------------------------


def polygon_cover_cells(polygons: DataFrame, zoom: int) -> DataFrame:
    """Explode each polygon to the mercator tiles covering its bbox at
    ``zoom`` → (polygon_id, geom_wkb, cell).  The cell-side of the shuffle
    PIP join; bbox cover (not exact cover) keeps the UDF trivial — exactness
    is restored by the refine step."""
    out_schema = StructType(
        [
            StructField("polygon_id", IntegerType()),
            StructField("geom_wkb", polygons.schema["geom_wkb"].dataType),
            StructField("cell", LongType()),
        ]
    )
    shift = np.int64(2 ** (zoom + 1))

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            minx = pdf["minx"].to_numpy(np.float64)
            miny = pdf["miny"].to_numpy(np.float64)
            maxx = pdf["maxx"].to_numpy(np.float64)
            maxy = pdf["maxy"].to_numpy(np.float64)
            # clamp to the mercator world; tile of each bbox corner
            lat_lim = tiles.MERCATOR_LAT_MAX
            tx0, ty0 = tiles.lonlat_to_tile(
                np.clip(minx, -180.0, 180.0), np.clip(miny, -lat_lim, lat_lim), zoom
            )
            tx1, ty1 = tiles.lonlat_to_tile(
                np.clip(maxx, -180.0, 180.0), np.clip(maxy, -lat_lim, lat_lim), zoom
            )
            pids, wkbs, cells = [], [], []
            for i in range(len(pdf)):
                txs = np.arange(tx0[i], tx1[i] + 1, dtype=np.int64)
                tys = np.arange(ty0[i], ty1[i] + 1, dtype=np.int64)
                gx, gy = np.meshgrid(txs, tys)
                c = (gx.ravel() * shift + gy.ravel())
                pids.append(np.full(c.size, pdf["polygon_id"].iat[i], dtype=np.int32))
                wkbs.extend([pdf["geom_wkb"].iat[i]] * c.size)
                cells.append(c)
            if not pids:
                yield pd.DataFrame({"polygon_id": [], "geom_wkb": [], "cell": []})
                continue
            yield pd.DataFrame(
                {
                    "polygon_id": np.concatenate(pids),
                    "geom_wkb": wkbs,
                    "cell": np.concatenate(cells),
                }
            )

    return polygons.select("polygon_id", "geom_wkb", "minx", "miny", "maxx", "maxy").mapInPandas(
        _explode, out_schema
    )


def pip_join_shuffle_adaptive(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    keep_cols: tuple = ("url",),
    hot_threshold: int = 100_000,
    split_levels: int = 2,
) -> DataFrame:
    """Shuffle PIP with adaptive cell-resolution splitting (SURVEY.md §4 skew).

    One cheap pass counts points per base-zoom cell; cells above
    ``hot_threshold`` (dense-urban tiles) are re-encoded at
    ``zoom + split_levels`` on BOTH sides — the same 4-way subdivision the
    quadkey pyramid defines (gdal2tiles.py:304-318) — so one hot cell's work
    fans out over 4^levels shuffle keys.  Cold cells join at base zoom
    untouched.  Emits exactly the rows of :func:`pip_join_shuffle`.
    """
    fine = zoom + split_levels
    pts = with_cell(points.select(*keep_cols, lon_col, lat_col), zoom, lon_col, lat_col)
    hot_rows = (
        pts.groupBy("cell").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > hot_threshold)
        .select("cell")
        .collect()
    )
    hot = {r.cell for r in hot_rows}
    if not hot:
        return pip_join_shuffle(points, polygons, zoom, lon_col, lat_col, keep_cols)
    hot_arr = F.array(*[F.lit(c) for c in sorted(hot)])
    is_hot = F.array_contains(hot_arr, F.col("cell"))

    cold_pts = pts.where(~is_hot)
    hot_pts = with_cell(
        pts.where(is_hot).drop("cell"), fine, lon_col, lat_col
    )
    polys_base = polygon_cover_cells(polygons, zoom)
    cold_polys = polys_base.where(~F.array_contains(hot_arr, F.col("cell")))
    # fine cover restricted to subcells whose base-zoom parent is hot;
    # packed cell = (tx << (z+1)) | ty, so parent = bit shifts only
    polys_fine = polygon_cover_cells(polygons, fine)
    ftx = F.shiftright("cell", fine + 1)
    fty = F.col("cell") - (ftx * F.lit(np.int64(2 ** (fine + 1))))
    parent = (
        F.shiftright(ftx, split_levels) * F.lit(np.int64(2 ** (zoom + 1)))
        + F.shiftright(fty, split_levels)
    ).cast("long")
    hot_polys = polys_fine.where(F.array_contains(hot_arr, parent))

    out_parts = []
    for p, g in ((cold_pts, cold_polys), (hot_pts, hot_polys)):
        cand = p.join(g, on="cell", how="inner").drop("cell")
        out_parts.append(cand)
    cand_all = out_parts[0].unionByName(out_parts[1])
    return _pip_refine(cand_all, points, lon_col, lat_col, keep_cols)


def pip_join_shuffle(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    keep_cols: tuple = ("url",),
    n_salt: int | None = None,
) -> DataFrame:
    """Shuffle point-in-polygon join for large method layers.

    Plan: points → cell at ``zoom``; polygons → covering cells (replicated);
    equi-join on cell (both sides shuffle-partitioned by cell — the
    cell-prefix co-location); exact vectorized refine inside ``mapInPandas``
    (per-batch group by polygon, parse WKB once, ray-cast all its candidate
    points).  ``n_salt`` replicates every polygon-cell n ways and salts
    points by hash — the explicit hot-cell skew remedy (SURVEY.md §4 skew).

    Emits the same rows as :func:`pip_join_broadcast` (A/B parity test).
    """
    pts = with_cell(points.select(*keep_cols, lon_col, lat_col), zoom, lon_col, lat_col)
    polys = polygon_cover_cells(polygons, zoom)
    if n_salt:
        polys = polys.withColumn("salt", F.explode(F.array([F.lit(i) for i in range(n_salt)])))
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(*[F.col(c) for c in keep_cols]), F.lit(n_salt)).cast("int"))
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]
    cand = pts.join(polys, on=join_keys, how="inner").drop("cell", *(["salt"] if n_salt else []))
    out = _pip_refine(cand, points, lon_col, lat_col, keep_cols)
    # distinct because a polygon may cover a point's cell via several salted
    # replicas — never happens without salt (one (pid, cell) row per pair),
    # but dedupe is cheap insurance and pins exactly-once pair semantics.
    return out.dropDuplicates(list(keep_cols) + ["polygon_id"]) if n_salt else out


def _pip_refine(
    cand: DataFrame, points: DataFrame, lon_col: str, lat_col: str, keep_cols: tuple
) -> DataFrame:
    """Exact vectorized refine of (point, candidate polygon wkb) rows: batch
    group-by polygon, parse each WKB once, ray-cast its candidate points."""
    in_cols = list(keep_cols) + [lon_col, lat_col]
    out_fields = [f for f in points.select(*in_cols).schema.fields]
    out_schema = StructType(out_fields + [StructField("polygon_id", IntegerType())])

    def _refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            if pdf.empty:
                empty = pdf[in_cols].copy()
                empty["polygon_id"] = pd.Series(dtype="int32")
                yield empty
                continue
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = pdf[lat_col].to_numpy(np.float64)
            keep_parts = []
            for pid, grp in pdf.groupby("polygon_id", sort=False):
                prep = geom.PreparedPolygon(grp["geom_wkb"].iat[0])
                pos = grp.index.to_numpy()
                hit = prep.contains(lon[pos], lat[pos])
                if hit.any():
                    sub = grp.loc[pos[hit], in_cols].copy()
                    sub["polygon_id"] = np.int32(pid)
                    keep_parts.append(sub)
            if keep_parts:
                yield pd.concat(keep_parts, ignore_index=True)
            else:
                empty = pdf[in_cols].iloc[0:0].copy()
                empty["polygon_id"] = pd.Series(dtype="int32")
                yield empty

    return cand.mapInPandas(_refine, out_schema)


# ---------------------------------------------------------------------------
# kNN via cell-ring expansion (alg/gdalgrid.cpp:675 GDALGridNearestNeighbor)
# ---------------------------------------------------------------------------


def _ring_cells_udf(zoom: int, ring: int):
    """pandas UDF: (lon,lat) → struct(cells array, guarantee double).

    ``cells`` are the packed ids of the (2r+1)² box (clipped at world edges —
    the euclidean lon/lat metric does not wrap).  ``guarantee`` is the exact
    degree distance from the query point to the nearest edge of the explored
    tile box: every unexplored point is at least that far away, so having k
    neighbors within it proves the kNN answer final.
    """
    shift = np.int64(2 ** (zoom + 1))
    nmax = 2**zoom

    @F.pandas_udf("struct<cells: array<long>, guarantee: double>")
    def _cells(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        tx, ty = tiles.lonlat_to_tile(lo, la, zoom)
        x0 = np.clip(tx - ring, 0, nmax - 1)
        x1 = np.clip(tx + ring, 0, nmax - 1)
        y0 = np.clip(ty - ring, 0, nmax - 1)
        y1 = np.clip(ty + ring, 0, nmax - 1)
        # box edges: lon edges are exact rationals; lat edges via mercator
        lon_lo = -180.0 + x0 * (360.0 / nmax)
        lon_hi = -180.0 + (x1 + 1) * (360.0 / nmax)
        _, lat_lo_e = tiles.meters_to_lonlat(np.zeros_like(lo), (y0 * 256.0) * tiles.resolution(zoom) - tiles.ORIGIN_SHIFT)
        _, lat_hi_e = tiles.meters_to_lonlat(np.zeros_like(lo), ((y1 + 1) * 256.0) * tiles.resolution(zoom) - tiles.ORIGIN_SHIFT)
        inf = np.inf
        g = np.minimum.reduce(
            [
                np.where(x0 == 0, inf, lo - lon_lo),
                np.where(x1 == nmax - 1, inf, lon_hi - lo),
                np.where(y0 == 0, inf, la - lat_lo_e),
                np.where(y1 == nmax - 1, inf, lat_hi_e - la),
            ]
        )
        cells = []
        for i in range(lo.shape[0]):
            txs = np.arange(x0[i], x1[i] + 1, dtype=np.int64)
            tys = np.arange(y0[i], y1[i] + 1, dtype=np.int64)
            gx, gy = np.meshgrid(txs, tys)
            cells.append((gx.ravel() * shift + gy.ravel()).tolist())
        return pd.DataFrame({"cells": cells, "guarantee": g})

    return _cells


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    zoom: int = 6,
    max_ring: int = 4,
    query_id: str = "qid",
    point_id: str = "name",
    strategy: str = "auto",
    broadcast_threshold: int = 20000,
) -> DataFrame:
    """k nearest neighbors (euclidean in lon/lat degrees, ties by point id).

    ``strategy``: "rings" = the cell-ring expansion below (both sides
    large; MAXDIST-bounded — at ``max_ring`` the search is accepted
    as-is); "broadcast" = queries collected + one vectorized point scan
    (always exact global top-k, ``zoom``/``max_ring`` not applicable);
    "auto" probes the query count with a bounded limit-collect and picks
    broadcast under ``broadcast_threshold``.  The plans emit identical
    rows whenever the ring search isn't truncated; callers relying on
    MAXDIST-bounded semantics must pass strategy="rings" explicitly.

    Plan per round r (ring radius r): unsatisfied queries explode to the
    (2r+1)² candidate cells → equi-join points on cell → window top-k.  A
    query is final when it has ≥k neighbors no farther than the exact
    distance to the explored box edge (see _ring_cells_udf) — mirrors the
    radius-bounded search loop of GDALGridNearestNeighbor
    (alg/gdalgrid.cpp:675-775) with the quadtree (port/cpl_quad_tree.h)
    replaced by the multi-resolution cell grid.  At ``max_ring`` the search
    is accepted as-is (MAXDIST-bounded semantics, alg/gdalgrid.cpp:691-730).

    Output: (qid, neighbor, nbr_lon, nbr_lat, dist, rank).
    """
    if strategy == "auto":
        # bounded probe: evaluates the query lineage once, and the collected
        # rows are reused directly by the broadcast branch (no second pass)
        probe = queries.select(query_id, "lon", "lat").limit(broadcast_threshold + 1).collect()
        if len(probe) <= broadcast_threshold:
            return knn_join_broadcast(queries, points, k, query_id, point_id, _rows=probe)
        strategy = "rings"
    if strategy == "broadcast":
        return knn_join_broadcast(queries, points, k, query_id, point_id)
    pts = with_cell(points, zoom, "lon", "lat").select(
        F.col(point_id).alias("_nbr"), F.col("lon").alias("_nlon"), F.col("lat").alias("_nlat"), "cell"
    )

    remaining = queries.select(query_id, "lon", "lat")
    # typed empty seed so an empty queries input returns an empty DataFrame
    # with the output schema instead of None (explicit strategy="rings")
    results = (
        remaining.limit(0)
        .join(pts.limit(0), F.lit(True), "inner")
        .select(
            query_id,
            F.col("_nbr").alias("neighbor"),
            F.col("_nlon").alias("nbr_lon"),
            F.col("_nlat").alias("nbr_lat"),
            F.lit(0.0).alias("dist"),
            F.lit(0).alias("rank"),
        )
    )
    # geometric ring growth (1, 2, 4, ... max_ring): each driver round costs
    # a fixed few hundred ms of job overhead, so fewer-but-larger rounds beat
    # per-ring iteration; the (2r+1)² candidate blowup only hits queries
    # still unsatisfied, which shrink sharply per round
    rings = [1]
    while rings[-1] < max_ring:
        rings.append(min(rings[-1] * 2, max_ring))
    for ring in rings:
        if remaining.isEmpty():
            break
        last = ring >= max_ring
        cells_udf = _ring_cells_udf(zoom, ring)
        ringed = remaining.withColumn("_r", cells_udf(F.col("lon"), F.col("lat")))
        cand = (
            ringed.select(
                query_id, "lon", "lat", F.col("_r.guarantee").alias("_g"), F.explode("_r.cells").alias("cell")
            )
            .join(pts, on="cell", how="inner")
            .drop("cell")
            .dropDuplicates([query_id, "_nbr"])
        )
        dist = F.sqrt(
            (F.col("lon") - F.col("_nlon")) ** 2 + (F.col("lat") - F.col("_nlat")) ** 2
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col("_nbr").asc())
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        if last:
            satisfied = topk.select(query_id).distinct()
        else:
            satisfied = (
                topk.groupBy(query_id, "_g")
                .agg(F.count("*").alias("_n"), F.max("dist").alias("_dmax"))
                .where((F.col("_n") >= k) & (F.col("_dmax") <= F.col("_g")))
                .select(query_id)
            )
        done = topk.join(satisfied, on=query_id, how="left_semi").select(
            query_id,
            F.col("_nbr").alias("neighbor"),
            F.col("_nlon").alias("nbr_lon"),
            F.col("_nlat").alias("nbr_lat"),
            "dist",
            "rank",
        )
        results = results.unionByName(done)
        if last:
            break
        # materialize the shrinking remainder — without this each round's
        # isEmpty() replays the whole join lineage of all prior rounds
        remaining = remaining.join(satisfied, on=query_id, how="left_anti").localCheckpoint(eager=True)
    return results


# ---------------------------------------------------------------------------
# IDW interpolation (alg/gdalgrid.cpp:191 GDALGridInverseDistanceToAPower)
# ---------------------------------------------------------------------------


def idw_interpolate(
    queries: DataFrame,
    points: DataFrame,
    value_col: str,
    power: int = 2,
    zoom: int = 6,
    ring: int = 1,
    query_id: str = "qid",
) -> DataFrame:
    """Inverse-distance-weighted interpolation at query locations.

    GDALGridInverseDistanceToAPower analog (alg/gdalgrid.cpp:191): value =
    Σ v_i/d_i^p / Σ 1/d_i^p over the points in the (2r+1)² cell window
    around the query (the radius-bounded search); an exact-hit point
    (d == 0) short-circuits to its value (the reference's dfEpsilon path).
    Queries with no point in the window → NULL.

    Plan: one ring explode + cell equi-join + groupBy agg — all JVM-side
    except the ring-cell UDF.  Weights use squared euclidean degrees for
    p=2 (exact, no sqrt); general p uses pow(d, p).
    """
    pts = with_cell(points, zoom, "lon", "lat").select(
        F.col(value_col).alias("_v"), F.col("lon").alias("_plon"), F.col("lat").alias("_plat"), "cell"
    )
    cells_udf = _ring_cells_udf(zoom, ring)
    cand = (
        queries.select(query_id, "lon", "lat")
        .withColumn("_r", cells_udf(F.col("lon"), F.col("lat")))
        .select(query_id, "lon", "lat", F.explode("_r.cells").alias("cell"))
        .join(pts, on="cell", how="inner")
    )
    d2 = (F.col("lon") - F.col("_plon")) ** 2 + (F.col("lat") - F.col("_plat")) ** 2
    if power == 2:
        w = F.when(d2 == 0, F.lit(None)).otherwise(F.lit(1.0) / d2)
    else:
        w = F.when(d2 == 0, F.lit(None)).otherwise(F.lit(1.0) / F.pow(F.sqrt(d2), F.lit(float(power))))
    scored = cand.select(
        query_id,
        w.alias("_w"),
        (w * F.col("_v")).alias("_wv"),
        F.when(d2 == 0, F.col("_v")).alias("_exact"),
    )
    return scored.groupBy(query_id).agg(
        F.when(
            F.count("_exact") > 0, F.min("_exact")
        ).otherwise(F.sum("_wv") / F.sum("_w")).alias("idw_value")
    )


# ---------------------------------------------------------------------------
# Grid data metrics (alg/gdalgrid.cpp:834+ GDALGridDataMetric*)
# ---------------------------------------------------------------------------


def grid_metrics(
    queries: DataFrame,
    points: DataFrame,
    value_col: str,
    radius: float,
    zoom: int = 6,
    ring: int = 1,
    min_points: int = 1,
    query_id: str = "qid",
    distance_pts: bool = False,
) -> DataFrame:
    """Per-query-cell data metrics over the points within ``radius``
    (euclidean degrees): minimum / maximum / range / count /
    average_distance — the GDALGridDataMetric* family (enum
    alg/gdal_alg.h:359-368, impls alg/gdalgrid.cpp:834+) with a circular
    search window and nMinPoints semantics (rows with fewer than
    ``min_points`` neighbors are dropped, the reference's nodata case).

    With ``distance_pts=True`` an ``average_distance_pts`` column is added:
    the mean distance over all unordered PAIRS of in-window points
    (GGA_MetricAverageDistancePts, alg/gdalgrid.cpp:1385) — NULL when the
    window holds fewer than two points.  Pairs are enumerated exactly once
    via a per-cell row_number self-join (i < j); duplicate coordinates are
    distinct points, matching the reference's index-pair loop.  The extra
    cost is one window + one equi-join on the (radius-bounded) hit set —
    quadratic only in per-window point count, never in table size.

    Plan: ring explode + cell equi-join + JVM-side distance filter +
    groupBy agg — no Python in the hot path.  The (2r+1)² cell window must
    cover ``radius``: cell size at ``zoom`` is 360/2^zoom degrees, so
    ``ring * 360/2^zoom >= radius`` is asserted.
    """
    cell_deg = 360.0 / (2 ** zoom)
    if ring * cell_deg < radius:
        raise ValueError(f"ring window {ring}×{cell_deg}° cells does not cover radius {radius}°")
    pts = with_cell(points, zoom, "lon", "lat").select(
        F.col(value_col).alias("_v"), F.col("lon").alias("_plon"), F.col("lat").alias("_plat"), "cell"
    )
    cells_udf = _ring_cells_udf(zoom, ring)
    cand = (
        queries.select(query_id, "lon", "lat")
        .withColumn("_r", cells_udf(F.col("lon"), F.col("lat")))
        .select(query_id, "lon", "lat", F.explode("_r.cells").alias("cell"))
        .join(pts, on="cell", how="inner")
    )
    dlon = F.col("lon") - F.col("_plon")
    dlat = F.col("lat") - F.col("_plat")
    d2 = dlon * dlon + dlat * dlat
    hits = cand.where(d2 <= F.lit(radius * radius)).select(
        query_id, F.col("_v"), F.sqrt(d2).alias("_d"), "_plon", "_plat"
    )
    # average distance accumulates in decimal so the sum is order-independent
    # (same device as summary_select's float SUMs): double(exact Σ)/n is
    # bit-identical across partitionings and engines
    avg_dist = (
        F.sum(F.col("_d").cast("decimal(26,12)")).cast("double") / F.count(F.lit(1))
    ).alias("average_distance")
    out = (
        hits.groupBy(query_id)
        .agg(
            F.min("_v").alias("minimum"),
            F.max("_v").alias("maximum"),
            (F.max("_v") - F.min("_v")).alias("range"),
            F.count(F.lit(1)).alias("count"),
            avg_dist,
        )
        .where(F.col("count") >= min_points)
    )
    if distance_pts:
        from pyspark.sql import Window

        idx = hits.select(
            query_id, "_plon", "_plat",
            F.row_number()
            .over(Window.partitionBy(query_id).orderBy("_plon", "_plat"))
            .alias("_i"),
        )
        a = idx.select(query_id, F.col("_plon").alias("_ax"), F.col("_plat").alias("_ay"), F.col("_i").alias("_ia"))
        b = idx.select(query_id, F.col("_plon").alias("_bx"), F.col("_plat").alias("_by"), F.col("_i").alias("_ib"))
        dx = F.col("_ax") - F.col("_bx")
        dy = F.col("_ay") - F.col("_by")
        pair_d = F.sqrt(dx * dx + dy * dy)
        pairs = (
            a.join(b, on=query_id)
            .where(F.col("_ia") < F.col("_ib"))
            .groupBy(query_id)
            .agg(
                (
                    F.sum(pair_d.cast("decimal(26,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("average_distance_pts")
            )
        )
        out = out.join(pairs, on=query_id, how="left")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "k",
    time: str = "t",
    value: str = "v",
    direction: str = "backward",
) -> DataFrame:
    """ASOF join: for every left row, the ``value`` of the right row with
    the greatest time ≤ left time (``backward``, inclusive) or smallest
    time ≥ left time (``forward``) within the same ``key``.

    The OGR/reference family has no as-of operator (SURVEY §2.3 lists it
    as a Spark-native superset); this is the scalable single-shuffle
    form: tag + union both sides, one window per key ordered by time with
    a last-non-null fill — never a range-join row explosion.  Ties
    (right time == left time) resolve to the right row (inclusive), via
    the side column sorting right-before-left at equal times.

    Contract: ``left`` carries (key, time, payload...); ``right`` carries
    exactly (key, time, value).  Output = left payload + ``value``
    (NULL when no qualifying right row).  Duplicate (key, time) rows on
    the right are allowed but resolved deterministically: the GREATEST
    ``value`` wins (tertiary sort on ``value`` below); pre-aggregate the
    right side if a different tie rule is wanted.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    l = left.withColumn("_side", F.lit(1))
    r = right.select(key, time, value).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # the tertiary value sort makes duplicate (key, time) right rows
    # deterministic: F.last picks the max value, run-to-run stable
    if direction == "backward":
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time).asc(), F.col("_side").asc(), F.col(value).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time).desc(), F.col("_side").asc(), F.col(value).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    filled = u.withColumn(value, F.last(value, ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).drop("_side")


def grid_moving_average(
    queries: DataFrame,
    points: DataFrame,
    value_col: str,
    radius: float,
    zoom: int = 6,
    ring: int = 1,
    min_points: int = 1,
    query_id: str = "qid",
) -> DataFrame:
    """Moving average of point VALUES within ``radius`` of each query cell —
    GDALGridMovingAverage (alg/gdalgrid.cpp:580): value = Σvᵢ/n over the
    circular search window, rows with fewer than ``min_points`` neighbors
    dropped (the nodata case).  Same single-shuffle ring/cell plan as
    :func:`grid_metrics`; the sum accumulates in decimal so the double
    result is order-independent across partitionings and engines."""
    cell_deg = 360.0 / (2 ** zoom)
    if ring * cell_deg < radius:
        raise ValueError(f"ring window {ring}×{cell_deg}° cells does not cover radius {radius}°")
    pts = with_cell(points, zoom, "lon", "lat").select(
        F.col(value_col).alias("_v"), F.col("lon").alias("_plon"), F.col("lat").alias("_plat"), "cell"
    )
    cells_udf = _ring_cells_udf(zoom, ring)
    cand = (
        queries.select(query_id, "lon", "lat")
        .withColumn("_r", cells_udf(F.col("lon"), F.col("lat")))
        .select(query_id, "lon", "lat", F.explode("_r.cells").alias("cell"))
        .join(pts, on="cell", how="inner")
    )
    dlon = F.col("lon") - F.col("_plon")
    dlat = F.col("lat") - F.col("_plat")
    d2 = dlon * dlon + dlat * dlat
    hits = cand.where(d2 <= F.lit(radius * radius)).select(query_id, F.col("_v"))
    return (
        hits.groupBy(query_id)
        .agg(
            (F.sum(F.col("_v").cast("decimal(26,12)")).cast("double") / F.count(F.lit(1))).alias("moving_avg"),
            F.count(F.lit(1)).alias("count"),
        )
        .where(F.col("count") >= min_points)
    )


def knn_join_broadcast(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    point_id: str = "name",
    _rows: list | None = None,
) -> DataFrame:
    """Exact kNN for a SMALL query set: queries broadcast into a single
    vectorized scan of the points (per-partition top-k, combiner-style),
    then one tiny shuffle merges partials — no rings, no iteration.

    The mirror of the reference's quadtree loop for the inverted cardinality
    case (few probes, huge point set); the ring join (knn_join) remains the
    path when both sides are large.  Global top-k is exact because each
    partition keeps its own top-k per query (the global answer is a subset
    of the union of partials).  Output matches knn_join: (qid, neighbor,
    nbr_lon, nbr_lat, dist, rank), ties broken by point id ascending.
    """
    qrows = _rows if _rows is not None else queries.select(query_id, "lon", "lat").collect()
    qid_arr = np.array([r[0] for r in qrows])
    qlon = np.array([float(r[1]) for r in qrows])
    qlat = np.array([float(r[2]) for r in qrows])
    qid_type = dict(queries.dtypes)[query_id]
    nbr_type = dict(points.dtypes)[point_id]
    out_schema = (
        f"{query_id} {qid_type}, neighbor {nbr_type}, "
        "nbr_lon double, nbr_lat double, dist double"
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf) or qid_arr.size == 0:
                continue
            plon = pdf["lon"].to_numpy(np.float64)
            plat = pdf["lat"].to_numpy(np.float64)
            pid = pdf[point_id].to_numpy()
            # (P, Q) distance matrix in manageable column chunks
            for s in range(0, qid_arr.size, 512):
                ql = qlon[s : s + 512]
                qa = qlat[s : s + 512]
                d = np.sqrt((plon[:, None] - ql[None, :]) ** 2 + (plat[:, None] - qa[None, :]) ** 2)
                kk = min(k, d.shape[0])
                # per query: k smallest by (dist, point_id)
                order = np.lexsort((np.broadcast_to(pid[:, None], d.shape), d), axis=0)[:kk]
                qi = np.broadcast_to(np.arange(ql.size)[None, :], order.shape)
                rows = order.ravel()
                qs = qi.ravel() + s
                yield pd.DataFrame(
                    {
                        query_id: qid_arr[qs],
                        "neighbor": pid[rows],
                        "nbr_lon": plon[rows],
                        "nbr_lat": plat[rows],
                        "dist": d[rows, qs - s],
                    }
                )

    partials = points.select(F.col(point_id), "lon", "lat").mapInPandas(_partial, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col("neighbor").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
