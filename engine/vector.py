"""Vector-layer operators: the ogr2ogr / OGRLayer operational surface.

* :func:`spatial_filter_rect` / :func:`spatial_filter_geom` — SetSpatialFilter
  (ogr/ogrsf_frmts/generic/ogrlayer.cpp:1055,1296-1405): two-phase bbox
  prefilter (JVM-side, codegen) + exact prepared-geometry test (pandas UDF),
  exactly the reference's FilterGeometry cascade.
* :func:`layer_extent` — GetExtent/GetFeatureCount fast-path aggregates
  (ogrlayer.cpp:171,212-330) per coarse cell → the partition manifest.
* :func:`pip_semi_join` / :func:`pip_anti_join` — the geometric semi/anti
  analogs of Clip/Erase for point layers (ogrlayer.cpp:3424 Clip, :3660
  Erase): points with ≥1 / zero polygon matches.
* :func:`dissolve` — UnionCascaded-style geometric aggregate
  (ogr/ogrgeometry.cpp:2657) for DISJOINT inputs: group polygons into
  MultiPolygon + aggregate area.  (True overlapping-union needs a full
  polygon-clipping kernel; the engine's fixtures and tiling layers are
  non-overlapping by construction, and the limitation is documented.)
* :func:`shoelace_area` — planar polygon area (holes negative), the
  OGR_GEOM_AREA special field (ogr/ogr_p.h:104-111).
* :func:`split_list_fields` — ogr2ogr -splitlistfields (apps/ogr2ogr.cpp:1299):
  explode array columns into scalar columns.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from . import geom


def spatial_filter_rect(
    df: DataFrame, minx: float, miny: float, maxx: float, maxy: float,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """Rectangle spatial filter: pure JVM predicate (the bbox-only fast path,
    SetSpatialFilterRect ogrlayer.cpp:1435)."""
    return df.where(
        (F.col(lon_col) >= minx) & (F.col(lon_col) <= maxx)
        & (F.col(lat_col) >= miny) & (F.col(lat_col) <= maxy)
    )


def spatial_filter_geom(
    df: DataFrame, wkb: bytes, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Polygon spatial filter: bbox prefilter pushed into the scan, then the
    exact prepared-geometry test in a vectorized UDF (FilterGeometry,
    ogrlayer.cpp:1296-1405; boundary counts as match)."""
    minx, miny, maxx, maxy = geom.envelope(wkb)
    pre = spatial_filter_rect(df, minx, miny, maxx, maxy, lon_col, lat_col)

    @F.pandas_udf("boolean")
    def _hit(lon: pd.Series, lat: pd.Series) -> pd.Series:
        prep = geom.PreparedPolygon(wkb)
        return pd.Series(prep.contains(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))

    return pre.where(_hit(F.col(lon_col), F.col(lat_col)))


def layer_extent(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", group: list | None = None) -> DataFrame:
    """GetExtent + GetFeatureCount aggregate (per group when given) — the
    per-partition lineage/metrics row (gdaltindex manifest analog)."""
    aggs = [
        F.count(F.lit(1)).alias("feature_count"),
        F.min(lon_col).alias("minx"),
        F.min(lat_col).alias("miny"),
        F.max(lon_col).alias("maxx"),
        F.max(lat_col).alias("maxy"),
    ]
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


def pip_semi_join(points: DataFrame, polygons_pdf, lon_col="lon", lat_col="lat", keep_cols=("url",)) -> DataFrame:
    """Points intersecting ≥1 polygon, each emitted once (Clip for points,
    ogrlayer.cpp:3424)."""
    from .joins import pip_join_broadcast

    matched = pip_join_broadcast(points, polygons_pdf, lon_col, lat_col, keep_cols).select(*keep_cols).distinct()
    return points.join(matched, on=list(keep_cols), how="left_semi")


def pip_anti_join(points: DataFrame, polygons_pdf, lon_col="lon", lat_col="lat", keep_cols=("url",)) -> DataFrame:
    """Points intersecting NO polygon (Erase for points, ogrlayer.cpp:3660)."""
    from .joins import pip_join_broadcast

    matched = pip_join_broadcast(points, polygons_pdf, lon_col, lat_col, keep_cols).select(*keep_cols).distinct()
    return points.join(matched, on=list(keep_cols), how="left_anti")


def shoelace_area_py(wkb: bytes) -> float:
    """Planar area: |shoelace| of exterior minus holes — but even-odd over a
    flat ring list gives exterior − holes automatically when holes wind
    opposite; robust form: sum of signed ring areas with |exterior| sign."""
    kind, body = geom.wkb_loads(wkb)
    polys = [body] if kind == "Polygon" else [b for _, b in body]
    total = 0.0
    for rings in polys:
        for i, ring in enumerate(rings):
            r = np.asarray(ring, dtype=np.float64)
            x, y = r[:, 0], r[:, 1]
            a = 0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
            total += abs(a) if i == 0 else -abs(a)
    return float(total)


@F.pandas_udf(DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    """OGR_GEOM_AREA / ST_Area (ogr/ogr_p.h:110; OGRGeometry::get_Area)."""
    return wkb.map(lambda b: shoelace_area_py(b) if b is not None else None)


def dissolve(polygons: DataFrame, group_col: str, wkb_col: str = "geom_wkb") -> DataFrame:
    """Disjoint-union dissolve: per group collect member polygons into one
    MultiPolygon + aggregate area/count (UnionCascaded for non-overlapping
    inputs, ogr/ogrgeometry.cpp:2657).  groupBy + grouped-map UDF = the
    geometric UDAF pattern (SURVEY.md §2.4)."""
    out_schema = (
        f"{group_col} int, n_parts long, area double, geom_wkb binary"
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = []
        area = 0.0
        for b in pdf[wkb_col]:
            kind, body = geom.wkb_loads(b)
            if kind == "Polygon":
                polys.append([np.asarray(r) for r in body])
            else:
                polys.extend([[np.asarray(r) for r in rings] for _, rings in body])
            area += shoelace_area_py(b)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iat[0]],
                "n_parts": [len(polys)],
                "area": [area],
                "geom_wkb": [geom.wkb_multipolygon(polys)],
            }
        )

    return polygons.groupBy(group_col).applyInPandas(_merge, out_schema)


def dissolve_union(polygons: DataFrame, group_col: str, wkb_col: str = "geom_wkb") -> DataFrame:
    """TRUE overlapping-union dissolve (UnionCascaded,
    ogr/ogrgeometry.cpp:2657): per group, polygons fold left through the
    exact overlay kernel — each member contributes only the pieces outside
    the union-so-far (``clip.erase_pieces``), so overlap never double-
    counts and the output is an exact-cover convex dissection of the true
    union.  Members fold in ascending scan order for determinism.

    Output: (group, n_members, n_pieces, area, geom_wkb MultiPolygon)."""
    from . import clip

    out_schema = f"{group_col} int, n_members long, n_pieces long, area double, geom_wkb binary"

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # fold order must not depend on shuffle arrival: sort by the wkb
        # bytes so piece structure (not just area) is run-reproducible
        pdf = pdf.sort_values(wkb_col, kind="stable", key=lambda s: s.map(bytes))
        members = [geom.polygon_parts(b) for b in pdf[wkb_col]]
        pieces: list = []
        prior: list = []
        for parts in members:
            for part in parts:
                pieces.extend(clip.erase_pieces(part, prior))
                prior.append(part)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iat[0]],
                "n_members": [len(members)],
                "n_pieces": [len(pieces)],
                "area": [clip.pieces_area(pieces)],
                "geom_wkb": [geom.wkb_multipolygon([[p] for p in pieces]) if pieces else None],
            }
        )

    return polygons.groupBy(group_col).applyInPandas(_merge, out_schema)


def split_list_fields(df: DataFrame, list_cols: list, max_elems: int = 4) -> DataFrame:
    """-splitlistfields (apps/ogr2ogr.cpp:1299): each array column becomes
    max_elems scalar columns col_1..col_N (OGR names them field1, field2...)."""
    out = df
    for c in list_cols:
        for i in range(max_elems):
            out = out.withColumn(f"{c}{i + 1}", F.get(F.col(c), i))  # NULL when absent (ANSI-safe)
        out = out.drop(c)
    return out


def _frange_count(start: float, stop: float, step: float) -> int:
    """Element count of mkgraticule's float_range
    (swig/python/scripts/mkgraticule.py:42-61): (stop-start)/step, bumped
    by one when fractional — values are i*step+start."""
    steps = (stop - start) / step
    if steps != int(steps):
        steps = steps + 1.0
    return max(int(steps), 0)


def graticule(
    spark,
    xmin: float = -180.0,
    ymin: float = -90.0,
    xmax: float = 180.0,
    ymax: float = 90.0,
    step: float = 5.0,
    substep: float = 5.0,
    connected: bool = False,
    transform_fn=None,
) -> DataFrame:
    """mkgraticule analog (swig/python/scripts/mkgraticule.py:158-235):
    generate a graticule as a DataFrame, fully declaratively
    (``spark.range`` x ``sequence``/``explode`` — no driver loops, so a
    planet-wide 0.001-degree graticule is still a distributed plan).

    Unconnected (default, reference's reprojection-resilient form): one
    row per segment, ``(kind, x0, y0, x1, y1)`` — latitude rows sweep
    ``float_range(ymin, ymax+step/2, step)`` with segments at
    ``float_range(xmin, xmax-substep/2, substep)``, longitude rows the
    transpose, exactly the reference's loop bounds.  Connected: one row
    per complete parallel/meridian with a ``points`` array of
    ``struct<x,y>`` vertices at ``float_range(..., max+substep/2, substep)``.

    ``transform_fn`` (np arrays x, y -> X, Y) reprojects vertices like the
    reference's optional ``-t_srs`` CoordinateTransformation; rows with
    non-finite transformed coordinates are dropped (the analog of the
    reference skipping features whose Transform() errors).  Substeps larger
    than the step clamp to it, as in the reference."""
    if substep > step:
        substep = step

    if not connected:
        n_lat = _frange_count(ymin, ymax + step / 2, step)
        n_lat_seg = _frange_count(xmin, xmax - substep / 2, substep)
        n_lon = _frange_count(xmin, xmax + step / 2, step)
        n_lon_seg = _frange_count(ymin, ymax - substep / 2, substep)
        lat = (
            spark.range(n_lat)
            .select((F.col("id") * step + ymin).alias("y0"))
            .select("y0", F.explode(F.sequence(F.lit(0), F.lit(n_lat_seg - 1))).alias("j"))
            .select(
                F.lit("lat").alias("kind"),
                (F.col("j") * substep + xmin).alias("x0"),
                F.col("y0"),
                (F.col("j") * substep + xmin + substep).alias("x1"),
                F.col("y0").alias("y1"),
            )
        )
        lon = (
            spark.range(n_lon)
            .select((F.col("id") * step + xmin).alias("x0"))
            .select("x0", F.explode(F.sequence(F.lit(0), F.lit(n_lon_seg - 1))).alias("j"))
            .select(
                F.lit("lon").alias("kind"),
                F.col("x0"),
                (F.col("j") * substep + ymin).alias("y0"),
                F.col("x0").alias("x1"),
                (F.col("j") * substep + ymin + substep).alias("y1"),
            )
        )
        out = lat.unionByName(lon).select("kind", "x0", "y0", "x1", "y1")
        if transform_fn is not None:
            def _tr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    X0, Y0 = transform_fn(pdf.x0.to_numpy(), pdf.y0.to_numpy())
                    X1, Y1 = transform_fn(pdf.x1.to_numpy(), pdf.y1.to_numpy())
                    res = pd.DataFrame(
                        {"kind": pdf.kind, "x0": X0, "y0": Y0, "x1": X1, "y1": Y1}
                    )
                    fin = np.isfinite(res[["x0", "y0", "x1", "y1"]].to_numpy()).all(axis=1)
                    yield res[fin]

            out = out.mapInPandas(_tr, out.schema)
        return out

    n_lat = _frange_count(ymin, ymax + step / 2, step)
    n_lat_v = _frange_count(xmin, xmax + substep / 2, substep)
    n_lon = _frange_count(xmin, xmax + step / 2, step)
    n_lon_v = _frange_count(ymin, ymax + substep / 2, substep)
    lat = (
        spark.range(n_lat)
        .select(
            F.lit("lat").alias("kind"),
            (F.col("id") * step + ymin).alias("c"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_lat_v - 1)),
                lambda j: F.struct(
                    (j * substep + xmin).alias("x"), (F.col("id") * step + ymin).alias("y")
                ),
            ).alias("points"),
        )
    )
    lon = (
        spark.range(n_lon)
        .select(
            F.lit("lon").alias("kind"),
            (F.col("id") * step + xmin).alias("c"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_lon_v - 1)),
                lambda j: F.struct(
                    (F.col("id") * step + xmin).alias("x"), (j * substep + ymin).alias("y")
                ),
            ).alias("points"),
        )
    )
    out = lat.unionByName(lon).select("kind", "c", "points")
    if transform_fn is not None:
        def _trc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                keep, pts_out = [], []
                for pts in pdf.points:
                    xs = np.array([p["x"] for p in pts])
                    ys = np.array([p["y"] for p in pts])
                    X, Y = transform_fn(xs, ys)
                    good = bool(np.isfinite(X).all() and np.isfinite(Y).all())
                    keep.append(good)
                    pts_out.append(
                        [{"x": float(x), "y": float(y)} for x, y in zip(X, Y)] if good else None
                    )
                res = pd.DataFrame({"kind": pdf.kind, "c": pdf.c, "points": pts_out})
                yield res[np.array(keep, dtype=bool)]

        out = out.mapInPandas(_trc, out.schema)
    return out


def layer_info(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """ogrinfo -so analog (apps/ogrinfo.cpp ReportOnLayer): the per-layer
    summary block as a one-row DataFrame — feature count, extent, and the
    field inventory (name:type pairs, declaration order) the reference
    prints.  Pure aggregate + driver-side schema introspection (the schema
    is metadata, not data — no extra scan)."""
    fields = ", ".join(f"{f.name}: {f.dataType.simpleString()}" for f in df.schema.fields)
    ext = layer_extent(df, lon_col, lat_col) if lon_col in df.columns else df.agg(
        F.count(F.lit(1)).alias("feature_count"),
        F.lit(None).cast("double").alias("minx"),
        F.lit(None).cast("double").alias("miny"),
        F.lit(None).cast("double").alias("maxx"),
        F.lit(None).cast("double").alias("maxy"),
    )
    return ext.select(
        F.lit(len(df.schema.fields)).cast("int").alias("n_fields"),
        F.lit(fields).alias("fields"),
        "feature_count", "minx", "miny", "maxx", "maxy",
    )


def layer_tile_index(layers: dict, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """ogrtindex analog (apps/ogrtindex.cpp): one row per input layer with
    its name, feature count, extent, and the extent's bbox polygon as WKB —
    the vector-layer counterpart of the gdaltindex manifest.  One extent
    aggregation per layer; rows union driver-side (layer count is small by
    definition of a tile index)."""
    from . import geom as _geom

    if not layers:
        raise ValueError("layer_tile_index needs at least one layer")
    out = None
    for name, df in layers.items():
        ext = layer_extent(df, lon_col, lat_col).withColumn(
            "location", F.lit(name)
        )
        out = ext if out is None else out.unionByName(ext)

    @F.pandas_udf("binary")
    def _bbox(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _geom.wkb_polygon(
                    [[(a, b), (c, b), (c, d), (a, d), (a, b)]]
                )
                for a, b, c, d in zip(minx, miny, maxx, maxy)
            ]
        )

    return out.select(
        "location",
        "feature_count",
        "minx",
        "miny",
        "maxx",
        "maxy",
        _bbox(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")).alias(
            "geom_wkb"
        ),
    )
