"""Registered SQL geometry functions: the ST_* surface of SURVEY.md §2.8.

The reference registers its geometry functions into the SQLite dialect
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1143-1174: ST_Area,
ST_Intersects, ST_Within, ...).  Here the same kernels (engine.geom /
engine.clip / engine.predicates / engine.geomops) register into the Spark
session catalog, so ``spark.sql("SELECT ST_Area(geom_wkb) ...")`` works on
any table carrying WKB columns.

All are vectorized pandas UDFs over WKB bytes; the polygon×polygon
predicates evaluate the overlay-kernel relate per row (suitable for
dimension-table expressions — the scalable join forms live in
engine.algebra / engine.predicates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType


def register_sql_udfs(spark: SparkSession) -> None:
    """Install ST_Area / ST_Centroid_X / ST_Centroid_Y / ST_Intersects /
    ST_Contains / ST_Within / ST_Relate / ST_ConvexHull_Area /
    ST_Simplify_NPoints into the session catalog."""
    from . import geom, geomops, predicates
    from .vector import st_area  # the one shoelace UDF (exterior − holes)

    def _cen(i):
        def one(b):
            if b is None:
                return None
            # area-weighted over ALL parts, holes negative (parts-aware)
            num = 0.0
            den = 0.0
            for part in geom.polygon_parts(b):
                for k, ring in enumerate(part):
                    a, cx, cy = geomops.polygon_area_centroid(np.asarray(ring, dtype=np.float64))
                    w = abs(a) if k == 0 else -abs(a)
                    num += w * (cx if i == 1 else cy)
                    den += w
            return num / den if den else None

        return one

    @F.pandas_udf(DoubleType())
    def st_centroid_x(wkb: pd.Series) -> pd.Series:
        return wkb.map(_cen(1))

    @F.pandas_udf(DoubleType())
    def st_centroid_y(wkb: pd.Series) -> pd.Series:
        return wkb.map(_cen(2))

    def _relate_series(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                return None
            return predicates.relate(geom.polygon_parts(x), geom.polygon_parts(y))

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    @F.pandas_udf(StringType())
    def st_relate(a: pd.Series, b: pd.Series) -> pd.Series:
        return _relate_series(a, b)

    def _pred(accepted):
        @F.pandas_udf(BooleanType())
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            return _relate_series(a, b).map(lambda r: None if r is None else r in accepted)

        return f

    @F.pandas_udf(DoubleType())
    def st_convex_hull_area(wkb: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            pts = np.vstack([np.asarray(r, dtype=np.float64) for r in geom.polygon_rings(b)])
            h = geomops.convex_hull(pts)
            if h.shape[0] < 3:
                return 0.0
            x, y = h[:, 0], h[:, 1]
            return float(abs(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))

        return wkb.map(one)

    @F.pandas_udf(DoubleType())
    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else geomops.geometry_distance(x, y)
                for x, y in zip(a, b)
            ]
        )

    @F.pandas_udf(BooleanType())
    def st_is_valid(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.geometry_is_valid(b))

    @F.pandas_udf("binary")
    def st_boundary(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.geometry_boundary(b))

    @F.pandas_udf("binary")
    def st_simplify_preserve_topology(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        def one(b, t):
            if b is None:
                return None
            kind, body = geom.wkb_loads(bytes(b))
            if kind == "LineString":
                return geom.wkb_linestring(
                    geomops.simplify_preserve_topology(np.asarray(body, dtype=np.float64), float(t))
                )
            if kind == "Polygon":
                return geom.wkb_polygon(
                    [geomops.simplify_preserve_topology(np.asarray(r, dtype=np.float64), float(t)) for r in body]
                )
            raise ValueError(f"ST_SimplifyPreserveTopology: unsupported {kind}")

        return pd.Series([one(b, t) for b, t in zip(wkb, tol)])

    @F.pandas_udf("binary")
    def st_force_polygon(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.force_polygon(b))

    @F.pandas_udf("binary")
    def st_force_multipolygon(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.force_multipolygon(b))

    @F.pandas_udf("binary")
    def st_multi_point(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.force_multipoint(b))

    @F.pandas_udf("binary")
    def st_multi_linestring(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else geomops.force_multilinestring(b))

    spark.udf.register("ST_Area", st_area)  # vector.st_area, parts/hole-correct
    spark.udf.register("ST_Centroid_X", st_centroid_x)
    spark.udf.register("ST_Centroid_Y", st_centroid_y)
    spark.udf.register("ST_Relate", st_relate)
    # intersects = any relation except disjoint (GEOS Intersects)
    spark.udf.register(
        "ST_Intersects", _pred({"touches", "overlaps", "contains", "within", "equals"})
    )
    spark.udf.register("ST_Contains", _pred({"contains", "equals"}))
    spark.udf.register("ST_Within", _pred({"within", "equals"}))
    spark.udf.register("ST_ConvexHull_Area", st_convex_hull_area)
    spark.udf.register("ST_Distance", st_distance)  # ogrgeometry.cpp:2039
    spark.udf.register("ST_IsValid", st_is_valid)  # :1361
    spark.udf.register("ST_Boundary", st_boundary)  # :2227
    spark.udf.register("ST_SimplifyPreserveTopology", st_simplify_preserve_topology)  # :3833
    # forceToMultiPoint / forceToMultiLineString (ogrgeometryfactory.cpp:678,783)
    spark.udf.register("ST_ForceToPolygon", st_force_polygon)
    spark.udf.register("ST_ForceToMultiPolygon", st_force_multipolygon)
    spark.udf.register("ST_ForceToMultiPoint", st_multi_point)
    spark.udf.register("ST_ForceToMultiLineString", st_multi_linestring)
