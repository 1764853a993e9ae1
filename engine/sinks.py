"""Alternative tile-table serializers: the KML superoverlay sink.

Reference: ``frmts/kmlsuperoverlay/`` — a hierarchical KML tree where each
tile document carries its geographic Region (LatLonAltBox + LOD pixel
range), a GroundOverlay pointing at the tile image, and NetworkLinks to
its ≤4 children whose Regions gate their loading (the superoverlay
level-of-detail scheme).  The engine keeps ONE canonical tile table
(MBTiles layout, SURVEY.md §2.1) and derives sinks from it; this
serializer is a pure per-row map — no shuffle.

Output: (path string, kml string) rows, one per tile, path = z/x/y.kml;
the GroundOverlay href is z/x/y.png alongside.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from . import tiles

_KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document>
  <Region>
    <LatLonAltBox><north>{n:.14f}</north><south>{s:.14f}</south><east>{e:.14f}</east><west>{w:.14f}</west></LatLonAltBox>
    <Lod><minLodPixels>128</minLodPixels><maxLodPixels>{maxlod}</maxLodPixels></Lod>
  </Region>
  <GroundOverlay>
    <Icon><href>{z}/{x}/{y}.png</href></Icon>
    <LatLonBox><north>{n:.14f}</north><south>{s:.14f}</south><east>{e:.14f}</east><west>{w:.14f}</west></LatLonBox>
  </GroundOverlay>
{links}</Document>
</kml>
"""

_LINK = """  <NetworkLink>
    <Region>
      <LatLonAltBox><north>{n:.14f}</north><south>{s:.14f}</south><east>{e:.14f}</east><west>{w:.14f}</west></LatLonAltBox>
      <Lod><minLodPixels>128</minLodPixels><maxLodPixels>-1</maxLodPixels></Lod>
    </Region>
    <Link><href>{z}/{x}/{y}.kml</href><viewRefreshMode>onRegion</viewRefreshMode></Link>
  </NetworkLink>
"""


def kml_superoverlay(tile_df: DataFrame, max_zoom: int | None = None) -> DataFrame:
    """Serialize every tile of a (zoom, tx, ty, data) table to its
    superoverlay KML document; children links included when the child tile
    level is at or below ``max_zoom`` (None → links always emitted; the
    viewer simply 404s absent children, as the reference's tree does for
    partial pyramids)."""

    def _ser(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, docs = [], []
            for r in pdf.itertuples():
                z, x, y = int(r.zoom), int(r.tx), int(r.ty)
                w, s, e, n = (float(v) for v in tiles.tile_lonlat_bounds(x, y, z))
                links = []
                if max_zoom is None or z + 1 <= max_zoom:
                    for cx in (2 * x, 2 * x + 1):
                        for cy in (2 * y, 2 * y + 1):
                            cw, cs, ce, cn = (float(v) for v in tiles.tile_lonlat_bounds(cx, cy, z + 1))
                            links.append(_LINK.format(n=cn, s=cs, e=ce, w=cw, z=z + 1, x=cx, y=cy))
                # leaf tiles render at any zoom-in (maxLod -1 = unbounded)
                maxlod = 2048 if links else -1
                docs.append(
                    _KML.format(n=n, s=s, e=e, w=w, z=z, x=x, y=y, maxlod=maxlod, links="".join(links))
                )
                paths.append(f"{z}/{x}/{y}.kml")
            yield pd.DataFrame({"path": paths, "kml": docs})

    return tile_df.select("zoom", "tx", "ty").mapInPandas(_ser, "path string, kml string")


def png_tiles(tile_df: DataFrame, ramp: list | None = None,
              tile_format: str = "png") -> DataFrame:
    """Render the tile table into the z/x/y.png images the superoverlay
    (and any gdal2tiles-layout viewer) references — the tile-render step
    of swig/python/scripts/gdal2tiles.py (its per-tile gdal_translate →
    PNG path), which :func:`kml_superoverlay` assumes exists.

    With ``ramp`` (list of (value, r, g, b)), colors come from
    engine.focal.color_relief (the gdaldem interpolation, quirks
    included); without, a grayscale clamp min(value, 255).  Alpha is the
    gdal2tiles nodata transparency: 0 where the SOURCE pixel is 0, else
    255.  Relief tiles co-join back to their source tile on (zoom,tx,ty)
    — a co-partitioned equi-join, no wide shuffle at scale.

    ``tile_format``: "png" (RGBA) or "jpeg" (RGB — gdal2tiles
    --tile-format jpeg; JPEG has no alpha so nodata renders black).

    Output: (path string 'z/x/y.png', png binary) — engine.png/jpeg
    encode, so the sink is PIL-free like the rest of the media layer."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType)

    from . import png as _png
    from .raster import bytes_to_tile

    if ramp is not None:
        # color_relief keeps (tx, ty, data) of a single-zoom table; join the
        # packed-RGB tiles back to the source on the tile key
        from .focal import color_relief

        colored = color_relief(tile_df, ramp).select(
            "tx", "ty", F.col("data").alias("rgb"))
        src = tile_df.join(colored, on=["tx", "ty"])
    else:
        src = tile_df.withColumn("rgb", F.lit(None).cast("binary"))

    out_schema = StructType([
        StructField("path", StringType()),
        StructField("png", BinaryType()),
    ])

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            paths, blobs = [], []
            for r in pdf.itertuples():
                grid = bytes_to_tile(r.data)
                rgba = np.zeros(grid.shape + (4,), dtype=np.uint8)
                if r.rgb is not None:
                    packed = bytes_to_tile(r.rgb)
                    rgba[:, :, 0] = (packed >> 16) & 0xFF
                    rgba[:, :, 1] = (packed >> 8) & 0xFF
                    rgba[:, :, 2] = packed & 0xFF
                else:
                    g = np.minimum(grid, 255).astype(np.uint8)
                    rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = g
                rgba[:, :, 3] = np.where(grid != 0, 255, 0)
                z, x, y = int(r.zoom), int(r.tx), int(r.ty)
                if tile_format == "jpeg":
                    from . import jpeg as _jpeg

                    paths.append(f"{z}/{x}/{y}.jpg")
                    blobs.append(_jpeg.encode_jpeg(
                        np.ascontiguousarray(rgba[:, :, :3]), quality=90))
                else:
                    paths.append(f"{z}/{x}/{y}.png")
                    blobs.append(_png.encode_png(rgba))
            yield pd.DataFrame({"path": paths, "png": blobs})

    return src.mapInPandas(_render, out_schema)


def write_tile_directory(img_df: DataFrame, root: str) -> int:
    """Materialize (path, bytes) rows — :func:`png_tiles` or
    :func:`kml_superoverlay` output — into a gdal2tiles-style z/x/y
    directory tree under ``root``.  Executor-side writes (foreachPartition
    against a shared filesystem, the gdal2tiles output layout); returns
    the row count.  Paths must be relative."""
    import os

    cols = img_df.columns
    data_col = [c for c in cols if c != "path"][0]
    acc = img_df.sparkSession.sparkContext.accumulator(0)

    def _write(rows) -> None:
        for r in rows:
            rel = r["path"]
            if os.path.isabs(rel) or ".." in rel.split("/"):
                raise ValueError(f"write_tile_directory: unsafe path {rel!r}")
            dst = os.path.join(root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            payload = r[data_col]
            mode = "wb" if isinstance(payload, (bytes, bytearray)) else "w"
            with open(dst, mode) as f:
                f.write(payload)
            acc.add(1)

    img_df.foreachPartition(_write)      # one pass: render + write + count
    return acc.value
