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
