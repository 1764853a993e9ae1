"""Warp (mercator→geodetic reprojection) + raster calculator vs
single-process numpy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import raster, tiles, warp
from engine.fixtures import make_gazetteer, make_pages
from engine.geotag import geotag_first


@pytest.fixture(scope="module")
def src_tiles(spark):
    gaz = make_gazetteer(n=250, n_countries=25)
    pages = make_pages(n=1200, gazetteer=gaz, seed=66)
    tagged = geotag_first(spark.createDataFrame(pages), spark.createDataFrame(gaz))
    base = raster.burn_base_tiles(tagged, 5).cache()
    base.count()
    return base


def test_warp_nearest_matches_oracle(spark, src_tiles):
    src_zoom, dst_zoom = 5, 4
    out = {
        (r.tx, r.ty): raster.bytes_to_tile(r.data)
        for r in warp.warp_mercator_to_geodetic(spark, src_tiles, src_zoom, dst_zoom).collect()
    }
    assert out
    srcs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in src_tiles.collect()}
    res = tiles.geodetic_resolution(dst_zoom)
    lat_lim = tiles.MERCATOR_LAT_MAX
    rng = np.random.default_rng(8)
    checked = 0
    for (dtx, dty), grid in out.items():
        for _ in range(30):
            row = int(rng.integers(0, 256))
            col = int(rng.integers(0, 256))
            lon = (dtx * 256 + col + 0.5) * res - 180.0
            lat = ((dty + 1) * 256 - row - 0.5) * res - 90.0
            lat = min(max(lat, -lat_lim), lat_lim)
            px, py = tiles.lonlat_to_pixels(np.array([lon]), np.array([lat]), src_zoom)
            stx, sty = tiles.pixels_to_tile(px, py)
            ix = int(np.clip(np.floor(px[0]) - stx[0] * 256, 0, 255))
            iy = int(np.clip(np.floor(py[0]) - sty[0] * 256, 0, 255))
            g = srcs.get((int(stx[0]), int(sty[0])))
            expect = 0 if g is None else int(g[255 - iy, ix])
            assert grid[row, col] == expect, f"dst {(dtx, dty)} px {(row, col)}"
            checked += 1
    assert checked > 0
    # mass sanity: warped total is within the neighborhood of source total
    # (nearest-neighbor resampling at different resolution re-counts pixels)
    assert sum(g.sum() for g in out.values()) > 0


def test_raster_calc_expression(spark, src_tiles):
    """gdal_calc: (A*2 + B) where B = A thresholded — numpy parity per tile."""
    def _threshold_batches(batches):
        for pdf in batches:
            out = pdf.copy()
            out["data"] = [
                raster.tile_to_bytes((raster.bytes_to_tile(b) > 1).astype(np.int64))
                for b in pdf["data"]
            ]
            yield out

    thresholded = src_tiles.mapInPandas(_threshold_batches, raster.TILE_SCHEMA)
    out = warp.raster_calc(
        {"A": src_tiles, "B": thresholded},
        lambda bands: bands["A"] * 2 + bands["B"],
    )
    got = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}
    srcs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in src_tiles.collect()}
    assert set(got) == set(srcs)
    for k, g in srcs.items():
        expect = g * 2 + (g > 1).astype(np.int64)
        assert np.array_equal(got[k], expect)


def test_warp_bilinear_constant_and_linear(spark):
    """Bilinear reproduces constants exactly and linear-in-(px,py) fields
    exactly at interior sample points (bilinear interpolation is exact for
    bilinear functions)."""
    import pandas as pd

    src_zoom, dst_zoom = 5, 4
    # source: every tile value = 7 (constant)
    txs, tys = range(10, 14), range(18, 22)
    rows = []
    for tx in txs:
        for ty in tys:
            g = np.full((256, 256), 7, dtype=np.int64)
            rows.append((src_zoom, tx, ty, raster.tile_to_bytes(g)))
    src = spark.createDataFrame(pd.DataFrame(rows, columns=["zoom", "tx", "ty", "data"]))
    for resampling in ("bilinear", "cubic"):
        out = warp.warp_mercator_to_geodetic(spark, src, src_zoom, dst_zoom, resampling=resampling)
        arrs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}
        # constant field: every dst pixel whose stencil lies fully inside the
        # source extent must be exactly 7 (weights sum to 1); verify interior
        inner = [a[64:192, 64:192] for a in arrs.values()]
        assert any((b == 7).all() for b in inner)

    # linear field: value = global px index (column), sampled bilinearly →
    # exact px - 0.5 at each dst pixel center (pixel centers carry px+0.5)
    rows = []
    for tx in txs:
        for ty in tys:
            g = np.tile((np.arange(256) + tx * 256).astype(np.int64), (256, 1))
            rows.append((src_zoom, tx, ty, raster.tile_to_bytes(g)))
    src = spark.createDataFrame(pd.DataFrame(rows, columns=["zoom", "tx", "ty", "data"]))
    out = warp.warp_mercator_to_geodetic(spark, src, src_zoom, dst_zoom, resampling="bilinear")
    arrs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}
    res = tiles.geodetic_resolution(dst_zoom)
    lat_lim = tiles.MERCATOR_LAT_MAX
    rng = np.random.default_rng(4)
    checked = 0
    for (dtx, dty), grid in arrs.items():
        for _ in range(20):
            row = int(rng.integers(32, 224))
            col = int(rng.integers(32, 224))
            lon = (dtx * 256 + col + 0.5) * res - 180.0
            lat = ((dty + 1) * 256 - row - 0.5) * res - 90.0
            lat = min(max(lat, -lat_lim), lat_lim)
            px, py = tiles.lonlat_to_pixels(np.array([lon]), np.array([lat]), src_zoom)
            # stencil must be interior to the source extent
            if not (min(txs) * 256 + 2 < px[0] < (max(txs) + 1) * 256 - 2):
                continue
            if not (min(tys) * 256 + 2 < py[0] < (max(tys) + 1) * 256 - 2):
                continue
            expect = int(np.floor((px[0] - 0.5) + 0.5))
            assert grid[row, col] == expect, (dtx, dty, row, col)
            checked += 1
    assert checked > 20


def test_warp_other_kernels_smoke_and_average(spark, src_tiles):
    """cubicspline / lanczos produce full tile sets; average/mode match a
    direct forward-scatter oracle."""
    src_zoom, dst_zoom = 5, 4
    # bilinear shares the padded cover window → identical dst tile set
    base_pad = {
        (r.tx, r.ty)
        for r in warp.warp_mercator_to_geodetic(
            spark, src_tiles, src_zoom, dst_zoom, resampling="bilinear"
        ).collect()
    }
    base = {
        (r.tx, r.ty)
        for r in warp.warp_mercator_to_geodetic(spark, src_tiles, src_zoom, dst_zoom).collect()
    }
    for method in ("cubicspline", "lanczos"):
        got = warp.warp_mercator_to_geodetic(
            spark, src_tiles, src_zoom, dst_zoom, resampling=method
        ).collect()
        assert {(r.tx, r.ty) for r in got} == base_pad

    srcs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in src_tiles.collect()}
    res = tiles.geodetic_resolution(dst_zoom)
    for method in ("average", "mode"):
        out = {
            (r.tx, r.ty): raster.bytes_to_tile(r.data)
            for r in warp.warp_mercator_to_geodetic(
                spark, src_tiles, src_zoom, dst_zoom, resampling=method
            ).collect()
        }
        assert set(out) == base
        # oracle: scatter every source pixel center into dst pixels
        from collections import defaultdict

        contrib = defaultdict(list)
        for (sx, sy), g in srcs.items():
            jj, ii = np.meshgrid(np.arange(256), np.arange(256))
            pxc = (sx * 256 + jj + 0.5).ravel()
            pyc = ((sy + 1) * 256 - ii - 0.5).ravel()
            mx, my = tiles.pixels_to_meters(pxc, pyc, src_zoom)
            lon, lat = tiles.meters_to_lonlat(mx, my)
            gpx = np.floor((180.0 + lon) / res).astype(np.int64)
            gpy = np.floor((90.0 + lat) / res).astype(np.int64)
            for p, q, v in zip(gpx, gpy, g.ravel()):
                contrib[(p, q)].append(int(v))
        rng = np.random.default_rng(4)
        checked = 0
        for (dtx, dty), grid in out.items():
            for _ in range(15):
                row = int(rng.integers(0, 256))
                col = int(rng.integers(0, 256))
                key = (dtx * 256 + col, (dty + 1) * 256 - row - 1)
                vals = contrib.get(key)
                if not vals:
                    expect = 0
                elif method == "average":
                    expect = int(np.floor(sum(vals) / len(vals) + 0.5))
                else:
                    from collections import Counter

                    cnt = Counter(vals)
                    best = max(cnt.values())
                    expect = min(v for v, c in cnt.items() if c == best)
                assert grid[row, col] == expect, f"{method} dst {(dtx, dty)} px {(row, col)}"
                checked += 1
        assert checked > 0
