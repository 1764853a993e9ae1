"""Warp/reproject: tile-table → tile-table in another profile/zoom.

The engine's re-expression of ``GDALWarpOperation::ChunkAndWarpImage``
(alg/gdalwarpoperation.cpp:660-720) + ``gdalwarp`` (SURVEY.md §2.9, §3.3):

* output-space chunking ≙ **destination-tile partitioning** — each output
  tile is one unit of work;
* per-chunk source-window computation ≙ a **tile-cover equi-join**: each
  destination tile's lon/lat bbox is transformed to the source profile and
  exploded to the covering source tiles;
* the warp kernel ≙ a grouped-map UDF that assembles available source tiles
  and samples every output pixel (GRA_NearestNeighbour,
  alg/gdalwarpkernel.cpp:424); pixels whose source tile is absent read 0
  (nodata).

The coordinate transform is the closed-form mercator↔geodetic pair from
engine.tiles, evaluated exactly per output pixel (the reference's
approximate-transformer optimization, alg/gdaltransformer.cpp:2584, is
unnecessary here because the exact transform is vectorized and cheap — the
same observation it exploits, applied at the numpy level).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tiles
from .raster import TILE_SCHEMA, TILE_SIZE, bytes_to_tile, tile_to_bytes


def _dst_tile_range(src_tiles_pdf_bounds, dst_zoom: int):
    """lon/lat bounds → geodetic tile range at dst_zoom."""
    minlon, minlat, maxlon, maxlat = src_tiles_pdf_bounds
    tx0, ty0 = (int(v) for v in tiles.geodetic_lonlat_to_tile(minlon + 1e-12, minlat + 1e-12, dst_zoom))
    tx1, ty1 = (int(v) for v in tiles.geodetic_lonlat_to_tile(maxlon - 1e-12, maxlat - 1e-12, dst_zoom))
    return tx0, ty0, tx1, ty1


def _cubic_weights(d: np.ndarray) -> np.ndarray:
    """GDAL cubic-convolution weights, A = −0.5 (alg/gdalwarpkernel.cpp
    GWKCubicComputeWeights): |d|<1 → ((A+2)|d|−(A+3))d²+1;
    1≤|d|<2 → A(|d|³−5d²+8|d|−4)."""
    A = -0.5
    ad = np.abs(d)
    w = np.where(
        ad < 1.0,
        ((A + 2.0) * ad - (A + 3.0)) * ad * ad + 1.0,
        np.where(ad < 2.0, A * (((ad - 5.0) * ad + 8.0) * ad - 4.0), 0.0),
    )
    return w


def _sample_mosaic(mos: np.ndarray, ax: np.ndarray, ay: np.ndarray, resampling: str) -> np.ndarray:
    """Sample the local source mosaic at continuous array coords (pixel
    centers at integer+0.5): the GRA_NearestNeighbour / GRA_Bilinear /
    GRA_Cubic kernels (alg/gdalwarpkernel.cpp:424-425, dtype-specialized
    fast paths :101-119 ≙ this one vectorized numpy path).

    Coordinates OUTSIDE the mosaic span ([0, W]×[0, H]) read as nodata 0,
    not border-replicate: the per-tile source window is estimated from a
    sample grid, so a strongly non-linear transformer (dense TPS, RPC at
    the scene edge) can push a true extremum past the window — clamping
    would silently copy edge pixels there.  In-span edge samples still
    clamp (the kernel's normal edge-extend)."""
    H, W = mos.shape
    oob = (ax < 0.0) | (ax > W) | (ay < 0.0) | (ay > H)
    if resampling == "nearest":
        ix = np.clip(np.floor(ax).astype(np.int64), 0, W - 1)
        iy = np.clip(np.floor(ay).astype(np.int64), 0, H - 1)
        return np.where(oob, 0.0, mos[iy, ix].astype(np.float64))
    gx = ax - 0.5
    gy = ay - 0.5
    if resampling == "bilinear":
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        wx = gx - x0
        wy = gy - y0
        x0c = np.clip(x0, 0, W - 1)
        x1c = np.clip(x0 + 1, 0, W - 1)
        y0c = np.clip(y0, 0, H - 1)
        y1c = np.clip(y0 + 1, 0, H - 1)
        m = mos.astype(np.float64)
        return (
            m[y0c, x0c] * (1 - wx) * (1 - wy)
            + m[y0c, x1c] * wx * (1 - wy)
            + m[y1c, x0c] * (1 - wx) * wy
            + m[y1c, x1c] * wx * wy
        ) * np.where(oob, 0.0, 1.0)
    if resampling in ("cubic", "cubicspline", "lanczos"):
        if resampling == "cubic":
            wfn, taps = _cubic_weights, (-1, 0, 1, 2)
        elif resampling == "cubicspline":
            wfn, taps = _bspline_weights, (-1, 0, 1, 2)
        else:  # lanczos, a=3 (GWKLanczosSinc, alg/gdalwarpkernel.cpp)
            wfn, taps = _lanczos_weights, (-2, -1, 0, 1, 2, 3)
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        fx = gx - x0
        fy = gy - y0
        m = mos.astype(np.float64)
        out = np.zeros(ax.shape[0], dtype=np.float64)
        wsum = np.zeros(ax.shape[0], dtype=np.float64)
        for dy in taps:
            wy = wfn(fy - dy)
            yc = np.clip(y0 + dy, 0, H - 1)
            for dx in taps:
                wx = wfn(fx - dx)
                xc = np.clip(x0 + dx, 0, W - 1)
                w = wx * wy
                out += m[yc, xc] * w
                wsum += w
        return np.where(oob, 0.0, out / wsum)  # weights sum to 1 except at clipped borders
    raise ValueError(f"unknown resampling {resampling!r}")


def _bspline_weights(d: np.ndarray) -> np.ndarray:
    """Cubic B-spline (GWKBSpline, alg/gdalwarpkernel.cpp GRA_CubicSpline):
    (1/6)·((2−|x|)³ − 4(1−|x|)³) for |x|<1; (1/6)(2−|x|)³ for 1≤|x|<2."""
    ad = np.abs(d)
    t2 = np.maximum(2.0 - ad, 0.0) ** 3
    t1 = np.maximum(1.0 - ad, 0.0) ** 3
    return (t2 - 4.0 * t1) / 6.0


def _lanczos_weights(d: np.ndarray) -> np.ndarray:
    """Lanczos windowed sinc, a=3 (GWKLanczosSinc)."""
    a = 3.0
    out = np.sinc(d) * np.sinc(d / a)
    return np.where(np.abs(d) < a, out, 0.0)


def _cutline_boundary_segments(cutline_wkb: bytes) -> np.ndarray:
    """Cutline polygon boundary as an (S, 2, 2) segment array — the
    poLines the blend generator measures distance to
    (alg/gdalcutline.cpp:60-121 builds the same boundary collection)."""
    from .geom import polygon_rings

    segs = []
    for ring in polygon_rings(cutline_wkb):
        r = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        segs.append(np.stack([r[:-1], r[1:]], axis=1))
    return np.concatenate(segs, axis=0)


def _dist_to_segments(xs: np.ndarray, ys: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance from each point to the nearest boundary
    segment (the GEOSDistance of alg/gdalcutline.cpp:186, vectorized over
    pixels per segment — the segment count is the small axis)."""
    a = segs[:, 0]
    ab = segs[:, 1] - a
    ab2 = (ab ** 2).sum(axis=1)
    ab2 = np.where(ab2 == 0.0, 1.0, ab2)
    best = np.full(xs.shape, np.inf)
    for s in range(segs.shape[0]):
        apx = xs - a[s, 0]
        apy = ys - a[s, 1]
        t = np.clip((apx * ab[s, 0] + apy * ab[s, 1]) / ab2[s], 0.0, 1.0)
        dx = apx - t * ab[s, 0]
        dy = apy - t * ab[s, 1]
        d2 = dx * dx + dy * dy
        np.minimum(best, d2, out=best)
    return np.sqrt(best)


def cutline_blend_ratio(
    lon: np.ndarray, lat: np.ndarray, inside: np.ndarray,
    cutline_wkb: bytes, blend_px: float, deg_per_px: float,
) -> np.ndarray:
    """Per-pixel validity ratio of the gdalwarp CUTLINE_BLEND_DIST mask
    (alg/gdalcutline.cpp BlendMaskGenerator:148-210, apps/gdalwarp.cpp
    -cblend): pixels farther than ``blend_px`` from the cutline boundary
    keep their hard mask (1 inside / 0 outside); within the blend band the
    ratio ramps 0.5 ± (dist/blend)·0.5 — inside rises toward 1, outside
    falls toward 0, meeting at 0.5 ON the boundary.  Distances are
    measured in destination pixel units (the geodetic grid is linear in
    degrees, so pixel distance = degree distance / ``deg_per_px``)."""
    px = (180.0 + lon) / deg_per_px
    py = (90.0 + lat) / deg_per_px
    segs = _cutline_boundary_segments(cutline_wkb)
    segs_px = np.empty_like(segs)
    segs_px[:, :, 0] = (180.0 + segs[:, :, 0]) / deg_per_px
    segs_px[:, :, 1] = (90.0 + segs[:, :, 1]) / deg_per_px
    dist = _dist_to_segments(px, py, segs_px)
    far = dist > blend_px
    ramp = np.where(inside, 0.5 + (dist / blend_px) * 0.5, 0.5 - (dist / blend_px) * 0.5)
    return np.where(far, inside.astype(np.float64), ramp)


def warp_mercator_to_geodetic(
    spark: SparkSession, src_tiles: DataFrame, src_zoom: int, dst_zoom: int,
    resampling: str = "nearest", cutline_wkb: bytes | None = None,
    cutline_blend_dist: float = 0.0,
) -> DataFrame:
    """Mercator (TMS) density-tile table at src_zoom → geodetic (TMS
    tmscompatible) tile table at dst_zoom; ``resampling`` ∈ nearest /
    bilinear / cubic / cubicspline / lanczos / average / mode (the GRA_*
    kernel set of alg/gdalwarpkernel.cpp:424-425 — average and mode are
    forward-scatter aggregates over contributing source pixel centers);
    ``cutline_wkb`` masks output pixels
    whose centers fall outside the polygon to 0 (the gdalwarp -cutline
    validity mask, alg/gdalcutline.cpp — rasterized here as an exact
    prepared-geometry PIP test per destination pixel instead of a scanline
    burn).  ``cutline_blend_dist`` > 0 (destination pixels) enables the
    CUTLINE_BLEND_DIST ramp (apps/gdalwarp.cpp -cblend,
    alg/gdalcutline.cpp BlendMaskGenerator): within that distance of the
    cutline boundary the value scales by 0.5 ± (dist/blend)·0.5 (inside +
    / outside −, exactly 0.5 on the line), rounded half-up to the integer
    band — the hard edge becomes a linear feather.

    Plan: source extent (one tiny agg) → destination tile list (driver
    arithmetic, ≤ #dst tiles rows) → explode each dst tile to covering src
    tiles (pure arithmetic, widened one tile for the 4×4 cubic support) →
    equi-join the src tile table → grouped-map warp kernel per dst tile
    assembling a local source mosaic.
    """
    ext = src_tiles.agg(
        F.min("tx").alias("x0"), F.min("ty").alias("y0"),
        F.max("tx").alias("x1"), F.max("ty").alias("y1"),
    ).collect()[0]
    if ext.x0 is None:  # empty source → empty destination
        return src_tiles.select(
            F.col("zoom").cast("int"), "tx", "ty", "data"
        ).limit(0)
    minlon, minlat, _, _ = (float(v) for v in tiles.tile_lonlat_bounds(ext.x0, ext.y0, src_zoom))
    _, _, maxlon, maxlat = (float(v) for v in tiles.tile_lonlat_bounds(ext.x1, ext.y1, src_zoom))
    tx0, ty0, tx1, ty1 = _dst_tile_range((minlon, minlat, maxlon, maxlat), dst_zoom)

    # destination chunk list (CollectChunkList analog): generated as a
    # DataFrame range, NOT a driver loop — at dst_zoom ≥ 12 the tile
    # rectangle is millions of rows and must never materialize driver-side.
    # Per-dst-tile source windows computed batch-vectorized with the exact
    # same numpy tile math the driver loop used (bit parity preserved).
    res = tiles.geodetic_resolution(dst_zoom)
    lat_lim = tiles.MERCATOR_LAT_MAX
    # pad widens the source window for interpolation support (bilinear 1 px,
    # cubic/bspline 2 px, lanczos 3 px — 1 src tile covers all); nearest and
    # the forward-scatter kernels (average/mode) need the exact window only
    pad = 0 if resampling in ("nearest", "average", "mode") else 1
    ntx = tx1 - tx0 + 1
    dst = spark.range((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).select(
        (F.lit(tx0) + (F.col("id") % ntx)).cast("int").alias("dtx"),
        (F.lit(ty0) + F.floor(F.col("id") / ntx)).cast("int").alias("dty"),
    )

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dtx_a = pdf["dtx"].to_numpy(np.int64)
            dty_a = pdf["dty"].to_numpy(np.int64)
            dminlon = dtx_a * TILE_SIZE * res - 180.0
            dmaxlon = (dtx_a + 1) * TILE_SIZE * res - 180.0
            cminlat = np.clip(dty_a * TILE_SIZE * res - 90.0, -lat_lim, lat_lim)
            cmaxlat = np.clip((dty_a + 1) * TILE_SIZE * res - 90.0, -lat_lim, lat_lim)
            sx0, sy0 = tiles.lonlat_to_tile(dminlon + 1e-12, cminlat + 1e-12, src_zoom)
            sx1, sy1 = tiles.lonlat_to_tile(dmaxlon - 1e-12, cmaxlat - 1e-12, src_zoom)
            # widen by one src tile: bilinear needs 1 px, cubic 2 px support
            # beyond the window (GDAL's nResWinSize source-window padding)
            yield pd.DataFrame(
                {
                    "dtx": pdf["dtx"], "dty": pdf["dty"],
                    "wx0": sx0 - pad, "wy0": sy0 - pad,
                    "wx1": sx1 + pad, "wy1": sy1 + pad,
                }
            )

    cover = (
        dst.mapInPandas(_windows, "dtx int, dty int, wx0 long, wy0 long, wx1 long, wy1 long")
        .withColumn("tx", F.explode(F.sequence("wx0", "wx1")))
        .withColumn("ty", F.explode(F.sequence("wy0", "wy1")))
    )

    joined = cover.join(src_tiles.select("tx", "ty", "data"), on=["tx", "ty"], how="inner")

    def _warp(pdf: pd.DataFrame) -> pd.DataFrame:
        dtx = int(pdf["dtx"].iat[0])
        dty = int(pdf["dty"].iat[0])
        srcs = {(int(r.tx), int(r.ty)): bytes_to_tile(r.data) for r in pdf.itertuples()}
        # output pixel centers in lon/lat (geodetic pixel grid, TMS origin
        # bottom-left; array row 0 = top)
        cols = np.arange(TILE_SIZE)
        lon = (dtx * TILE_SIZE + cols + 0.5) * res - 180.0
        rows_i = np.arange(TILE_SIZE)
        lat = ((dty + 1) * TILE_SIZE - rows_i - 0.5) * res - 90.0  # row 0 = top
        lon_g, lat_g = np.meshgrid(lon, lat)
        lat_c = np.clip(lat_g, -lat_lim, lat_lim)
        px, py = tiles.lonlat_to_pixels(lon_g.ravel(), lat_c.ravel(), src_zoom)
        if resampling == "nearest":
            stx, sty = tiles.pixels_to_tile(px, py)
            ix = np.clip(np.floor(px).astype(np.int64) - stx * TILE_SIZE, 0, TILE_SIZE - 1)
            iy = np.clip(np.floor(py).astype(np.int64) - sty * TILE_SIZE, 0, TILE_SIZE - 1)
            srow = TILE_SIZE - 1 - iy
            out = np.zeros(stx.shape[0], dtype=np.int64)
            # group output pixels by their source tile; sample each group in
            # one vectorized gather (per-thread transformer clone analog —
            # state is per dst tile, alg/gdalwarpkernel.cpp:255-260)
            key = stx * np.int64(1 << 32) + sty
            order = np.argsort(key, kind="stable")
            uk, starts = np.unique(key[order], return_index=True)
            bounds = np.append(starts, key.shape[0])
            for gi in range(uk.shape[0]):
                s, e = bounds[gi], bounds[gi + 1]
                rows_sel = order[s:e]
                tk = (int(stx[rows_sel[0]]), int(sty[rows_sel[0]]))
                g = srcs.get(tk)
                if g is not None:
                    out[rows_sel] = g[srow[rows_sel], ix[rows_sel]]
        elif resampling in ("average", "mode"):
            # GRA_Average / GRA_Mode (alg/gdalwarpkernel.cpp:424-425):
            # contributing source pixels are those whose CENTERS map into
            # the destination pixel footprint.  The transform is exact and
            # invertible, so this is a forward scatter: every present
            # source pixel center → dst geodetic pixel, then a grouped
            # aggregate (absent source tiles contribute nothing = nodata).
            T2 = TILE_SIZE
            sums = np.zeros(T2 * T2, dtype=np.float64)
            cnts = np.zeros(T2 * T2, dtype=np.int64)
            pairs = []
            jj, ii = np.meshgrid(np.arange(T2), np.arange(T2))
            for (sx, sy), g in srcs.items():
                pxc = (sx * T2 + jj + 0.5).ravel()
                pyc = ((sy + 1) * T2 - ii - 0.5).ravel()
                mx2, my2 = tiles.pixels_to_meters(pxc, pyc, src_zoom)
                lon2, lat2 = tiles.meters_to_lonlat(mx2, my2)
                gpx = (180.0 + lon2) / res
                gpy = (90.0 + lat2) / res
                cx2 = np.floor(gpx).astype(np.int64) - dtx * T2
                cy2 = np.floor(gpy).astype(np.int64) - dty * T2
                sel = (cx2 >= 0) & (cx2 < T2) & (cy2 >= 0) & (cy2 < T2)
                idx = (T2 - 1 - cy2[sel]) * T2 + cx2[sel]
                v = g.ravel()[sel]
                if resampling == "average":
                    np.add.at(sums, idx, v.astype(np.float64))
                    np.add.at(cnts, idx, 1)
                else:
                    pairs.append(np.stack([idx, v], axis=1))
            out = np.zeros(T2 * T2, dtype=np.int64)
            if resampling == "average":
                nz2 = cnts > 0
                out[nz2] = np.floor(sums[nz2] / cnts[nz2] + 0.5).astype(np.int64)
            elif pairs:
                allp = np.concatenate(pairs)
                uniq, counts = np.unique(allp, axis=0, return_counts=True)
                # per dst pixel: max count wins, ties → smallest value
                order = np.lexsort((uniq[:, 1], -counts, uniq[:, 0]))
                u = uniq[order]
                first = np.ones(u.shape[0], dtype=bool)
                first[1:] = u[1:, 0] != u[:-1, 0]
                out[u[first, 0]] = u[first, 1]
        else:
            # local source mosaic sized by the COVER WINDOW (incl. the pad
            # tiles), not just the present tiles: absent regions stay 0, so
            # edge pixels sample nodata-as-0 like the nearest branch instead
            # of replicating the nearest present-tile edge (extrapolation)
            SX0 = int(pdf["wx0"].iat[0])
            SX1 = int(pdf["wx1"].iat[0])
            SY0 = int(pdf["wy0"].iat[0])
            SY1 = int(pdf["wy1"].iat[0])
            # fast path: a fully-present cover window needs no zero-fill
            # (every byte is overwritten by a source tile below)
            n_win = (SY1 - SY0 + 1) * (SX1 - SX0 + 1)
            alloc = np.empty if len(srcs) == n_win else np.zeros
            mos = alloc(((SY1 - SY0 + 1) * TILE_SIZE, (SX1 - SX0 + 1) * TILE_SIZE), dtype=np.int64)
            for (sx, sy), g in srcs.items():
                r0 = (SY1 - sy) * TILE_SIZE
                mos[r0 : r0 + TILE_SIZE, (sx - SX0) * TILE_SIZE : (sx - SX0 + 1) * TILE_SIZE] = g
            ax = px - SX0 * TILE_SIZE
            ay = (SY1 + 1) * TILE_SIZE - py  # array rows grow southward
            val = _sample_mosaic(mos, ax, ay, resampling)
            out = np.floor(val + 0.5).astype(np.int64)  # round-half-up to int band
        if cutline_wkb is not None:
            from .geom import PreparedPolygon

            prep = PreparedPolygon(cutline_wkb)
            inside = prep.contains(lon_g.ravel(), lat_g.ravel())
            if cutline_blend_dist > 0.0:
                ratio = cutline_blend_ratio(
                    lon_g.ravel(), lat_g.ravel(), inside,
                    cutline_wkb, float(cutline_blend_dist), res,
                )
                out = np.floor(out * ratio + 0.5).astype(np.int64)
            else:
                out[~inside] = 0
        return pd.DataFrame(
            {
                "zoom": [np.int32(dst_zoom)],
                "tx": [dtx],
                "ty": [dty],
                "data": [tile_to_bytes(out.reshape(TILE_SIZE, TILE_SIZE))],
            }
        )

    nparts = spark.sparkContext.defaultParallelism
    return joined.repartition(nparts, "dtx", "dty").groupBy("dtx", "dty").applyInPandas(_warp, TILE_SCHEMA)


def warp_custom(
    spark: SparkSession,
    src_tiles: DataFrame,
    src_zoom: int,
    dst_tiles,
    inv_fn,
    dst_zoom: int | None = None,
    resampling: str = "nearest",
) -> DataFrame:
    """Arbitrary-transformer warp: the GDALCreateGenImgProjTransformer
    chain (alg/gdaltransformer.cpp:974) with a pluggable dst→src map.

    ``inv_fn(dpx, dpy) -> (spx, spy)``: vectorized numpy closure mapping
    DESTINATION global pixel coords to SOURCE global mercator pixel coords
    at ``src_zoom`` — e.g. a fitted :class:`engine.transformer.
    GCPPolynomialTransformer`'s ``.forward``, a TPS, or any composed
    chain.  ``dst_tiles``: explicit [(dtx, dty)] output tile list (the
    caller's SuggestedWarpOutput).  Source windows are estimated per dst
    tile from a 9×9 sample grid (the reference samples edge points the
    same way) plus the kernel pad; absent source regions read 0.
    """
    T = TILE_SIZE
    pad = 0 if resampling == "nearest" else 1
    # dst_tiles: a small python list OR a DataFrame (dtx, dty) — pass a
    # DataFrame (e.g. spark.range arithmetic) when the destination
    # rectangle is deep-zoom large; a driver list would be
    # tile-count-proportional (the CollectChunkList anti-pattern)
    if isinstance(dst_tiles, DataFrame):
        dst = dst_tiles.select(
            F.col("dtx").cast("int").alias("dtx"), F.col("dty").cast("int").alias("dty")
        )
    else:
        dst = spark.createDataFrame(pd.DataFrame(dst_tiles, columns=["dtx", "dty"]))

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            g = np.linspace(0.0, T, 9)
            gx, gy = np.meshgrid(g, g)
            for r in pdf.itertuples():
                dpx = r.dtx * T + gx.ravel()
                dpy = r.dty * T + gy.ravel()
                spx, spy = inv_fn(dpx, dpy)
                wx0 = int(np.floor(spx.min() / T)) - pad
                wx1 = int(np.floor(spx.max() / T)) + pad
                wy0 = int(np.floor(spy.min() / T)) - pad
                wy1 = int(np.floor(spy.max() / T)) + pad
                rows.append((int(r.dtx), int(r.dty), wx0, wy0, wx1, wy1))
            yield pd.DataFrame(rows, columns=["dtx", "dty", "wx0", "wy0", "wx1", "wy1"])

    cover = (
        dst.mapInPandas(_windows, "dtx int, dty int, wx0 long, wy0 long, wx1 long, wy1 long")
        .withColumn("tx", F.explode(F.sequence("wx0", "wx1")))
        .withColumn("ty", F.explode(F.sequence("wy0", "wy1")))
    )
    joined = cover.join(src_tiles.select("tx", "ty", "data"), on=["tx", "ty"], how="inner")
    out_zoom = src_zoom if dst_zoom is None else dst_zoom

    def _warp(pdf: pd.DataFrame) -> pd.DataFrame:
        dtx = int(pdf["dtx"].iat[0])
        dty = int(pdf["dty"].iat[0])
        srcs = {(int(r.tx), int(r.ty)): bytes_to_tile(r.data) for r in pdf.itertuples()}
        SX0 = int(pdf["wx0"].iat[0])
        SX1 = int(pdf["wx1"].iat[0])
        SY0 = int(pdf["wy0"].iat[0])
        SY1 = int(pdf["wy1"].iat[0])
        # fully-present window → no zero-fill (every byte overwritten)
        alloc = np.empty if len(srcs) == (SY1 - SY0 + 1) * (SX1 - SX0 + 1) else np.zeros
        mos = alloc(((SY1 - SY0 + 1) * T, (SX1 - SX0 + 1) * T), dtype=np.int64)
        for (sx, sy), g in srcs.items():
            if SX0 <= sx <= SX1 and SY0 <= sy <= SY1:
                r0 = (SY1 - sy) * T
                mos[r0 : r0 + T, (sx - SX0) * T : (sx - SX0 + 1) * T] = g
        cols = np.arange(T)
        rows_i = np.arange(T)
        cg, rg = np.meshgrid(cols, rows_i)
        dpx = (dtx * T + cg + 0.5).ravel()
        dpy = ((dty + 1) * T - rg - 0.5).ravel()
        spx, spy = inv_fn(dpx, dpy)
        ax = spx - SX0 * T
        ay = (SY1 + 1) * T - spy
        val = _sample_mosaic(mos, ax, ay, resampling)
        out = val.astype(np.int64) if resampling == "nearest" else np.floor(val + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "zoom": [np.int32(out_zoom)],
                "tx": [dtx],
                "ty": [dty],
                "data": [tile_to_bytes(out.reshape(T, T))],
            }
        )

    nparts = spark.sparkContext.defaultParallelism
    return joined.repartition(nparts, "dtx", "dty").groupBy("dtx", "dty").applyInPandas(_warp, TILE_SCHEMA)


def raster_calc(tile_tables: dict, expr) -> DataFrame:
    """gdal_calc.py analog (swig/python/scripts/gdal_calc.py:86-94): numpy
    expression over aligned bands.  ``tile_tables``: {name: DataFrame} with
    identical (zoom, tx, ty) keys; ``expr``: callable(dict of numpy arrays)
    → numpy array.  Missing band for a tile key → zeros (gdal_calc treats
    missing as nodata).  Plan: full outer equi-join on the tile key, one
    grouped UDF — band alignment is an equi-join, not an iteration."""
    names = list(tile_tables)
    joined = None
    for name, df in tile_tables.items():
        d = df.select("zoom", "tx", "ty", F.col("data").alias(f"data_{name}"))
        joined = d if joined is None else joined.join(d, on=["zoom", "tx", "ty"], how="full_outer")

    def _calc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for r in pdf.itertuples():
                bands = {}
                for name in names:
                    b = getattr(r, f"data_{name}")
                    bands[name] = bytes_to_tile(b) if b is not None else np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.int64)
                res_arr = np.asarray(expr(bands), dtype=np.int64)
                out_rows.append((int(r.zoom), int(r.tx), int(r.ty), tile_to_bytes(res_arr)))
            yield pd.DataFrame(out_rows, columns=["zoom", "tx", "ty", "data"])

    return joined.mapInPandas(_calc, TILE_SCHEMA)
