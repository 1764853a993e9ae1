"""Small-tool analogs: PROJ.4 registry (gdalsrsinfo / gdalwarp -t_srs),
gcps2vec, gdalmove, ogrtindex."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine import geom, matching, srs, vector  # noqa: E402


# ----------------------------------------------------------------- PROJ.4


@pytest.mark.parametrize(
    "p4",
    [
        "+proj=utm +zone=33 +south",
        "+proj=tmerc +lon_0=9 +k=1.0 +x_0=3500000",
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96",
        "+proj=merc +lon_0=0 +lat_ts=0",
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0",
        "+proj=sinu +lon_0=0",
        "+proj=eqc +lat_ts=30",
        "+proj=longlat",
    ],
)
def test_proj4_roundtrip(p4):
    tr = srs.make_transformer(p4)
    lon = np.array([-70.0, 3.0, 18.5])
    lat = np.array([-45.0, 46.0, 12.0])
    if "stere" in p4:
        lat = np.array([-80.0, -70.0, -60.0])
    if "utm" in p4 or "tmerc" in p4:
        # transverse Mercator series are valid near the central meridian
        lon0 = 15.0 if "utm" in p4 else 9.0
        lon = lon0 + np.array([-4.0, 0.5, 3.0])
    x, y = tr.forward(lon, lat)
    lon2, lat2 = tr.inverse(x, y)
    assert np.allclose(lon2, lon, atol=1e-8) and np.allclose(lat2, lat, atol=1e-8)
    info = srs.srs_info(p4)
    assert info["supported"] and info["proj"] == p4.split()[0].split("=")[1]


def test_proj4_datum_chain_and_errors():
    d = srs.make_transformer(
        "+proj=lcc +lat_1=49 +lat_0=46.5 +lon_0=3 +ellps=clrk66 +towgs84=-8,160,176"
    )
    x, y = d.forward(2.0, 48.0)
    lon, lat = d.inverse(x, y)
    # geocentric round trip via iterative geodetic recovery: ~1e-7 deg
    assert abs(float(lon[0]) - 2.0) < 1e-6 and abs(float(lat[0]) - 48.0) < 1e-6
    assert not srs.srs_info("+proj=robin")["supported"]
    with pytest.raises(ValueError):
        srs.parse_proj4("no_plus_prefix")
    # oblique stereographic is supported now (round-4); robin still is not
    assert srs.srs_info("+proj=stere +lat_0=45")["supported"]


def test_proj4_matches_direct_class():
    via_p4 = srs.make_transformer("+proj=utm +zone=31")
    direct = srs.UTMTransformer(31)
    lon, lat = np.array([2.3, 3.0]), np.array([48.8, 0.0])
    assert np.array_equal(via_p4.forward(lon, lat), direct.forward(lon, lat))


# ----------------------------------------------------------- gcps2vec/move


def test_gcps_to_vector(spark):
    pdf = pd.DataFrame(
        {
            "gcp_pixel": [0.0, 100.0],
            "gcp_line": [0.0, 50.0],
            "gcp_x": [10.0, 11.0],
            "gcp_y": [45.0, 45.5],
        }
    )
    df = spark.createDataFrame(pdf)
    pts = matching.gcps_to_vector(df).toPandas()
    assert geom.wkb_geometry_name(bytes(pts["geom_wkb"][0])) == "POINT"
    x, y = geom.wkb_loads(bytes(pts.sort_values("gcp_x")["geom_wkb"].iloc[0]))[1]
    assert (x, y) == (10.0, 45.0)
    links = matching.gcps_to_vector(df, links=True).toPandas()
    assert geom.wkb_geometry_name(bytes(links["geom_wkb"][0])) == "LINESTRING"


def test_move_geotransform():
    gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
    ident = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    assert matching.move_geotransform(gt, ident) == gt
    shift = (10.0, 1.0, 0.0, -5.0, 0.0, 1.0)
    g2 = matching.move_geotransform(gt, shift)
    assert g2 == (110.0, 0.5, 0.0, 195.0, 0.0, -0.5)
    # pixel (2,3) maps consistently: affine(gt(px)) == gt'(px)
    px, ln = 2.0, 3.0
    x = gt[0] + px * gt[1] + ln * gt[2]
    y = gt[3] + px * gt[4] + ln * gt[5]
    xs, ys = shift[0] + shift[1] * x + shift[2] * y, shift[3] + shift[4] * x + shift[5] * y
    assert xs == g2[0] + px * g2[1] + ln * g2[2]
    assert ys == g2[3] + px * g2[4] + ln * g2[5]


def test_layer_tile_index(spark):
    a = spark.createDataFrame(pd.DataFrame({"lon": [0.0, 2.0], "lat": [1.0, 3.0]}))
    b = spark.createDataFrame(pd.DataFrame({"lon": [-10.0], "lat": [-20.0]}))
    idx = vector.layer_tile_index({"layer_a": a, "layer_b": b}).toPandas()
    idx = idx.set_index("location").sort_index()
    assert idx.loc["layer_a", "feature_count"] == 2
    assert idx.loc["layer_a", "minx"] == 0.0 and idx.loc["layer_a", "maxy"] == 3.0
    name = geom.wkb_geometry_name(bytes(idx.loc["layer_b", "geom_wkb"]))
    assert name == "POLYGON"


# ------------------------------------------------- gdalflattenmask / gdal2ogr


def test_flatten_mask_modes(spark):
    """gdalflattenmask (apps/gdalflattenmask.c): mask-zero pixels become
    nodata, or an alpha band is added; tiles without a mask row stay
    all-valid."""
    from engine import raster

    rng = np.random.default_rng(21)
    g = rng.integers(1, 50, (256, 256))
    m = (rng.random((256, 256)) < 0.6).astype(np.int64)
    data = spark.createDataFrame(pd.DataFrame(
        {"zoom": [0, 0], "tx": [0, 1], "ty": [0, 0],
         "data": [raster.tile_to_bytes(g), raster.tile_to_bytes(g + 1)]}))
    mask = spark.createDataFrame(pd.DataFrame(
        {"zoom": [0], "tx": [0], "ty": [0], "data": [raster.tile_to_bytes(m)]}))
    out = {(r.tx, r.ty): raster.bytes_to_tile(r.data)
           for r in raster.flatten_mask(data, mask, nodata=-1).collect()}
    assert np.array_equal(out[(0, 0)], np.where(m != 0, g, -1))
    assert np.array_equal(out[(1, 0)], g + 1)  # no mask row → all valid
    al = {(r.tx, r.ty): (raster.bytes_to_tile(r.data), raster.bytes_to_tile(r.alpha))
          for r in raster.flatten_mask(data, mask, set_alpha=True).collect()}
    assert np.array_equal(al[(0, 0)][0], g)
    assert np.array_equal(al[(0, 0)][1], np.where(m != 0, 255, 0))
    assert np.array_equal(al[(1, 0)][1], np.full_like(g, 255))


def test_to_ogr_points_matches_xyz(spark):
    """gdal2ogr (apps/gdal2ogr.c): point features carry exactly to_xyz's
    coordinates as WKB point geometry."""
    from engine import geom, raster

    g = np.zeros((256, 256), dtype=np.int64)
    g[3, 7] = 9
    df = spark.createDataFrame(pd.DataFrame(
        {"zoom": [2], "tx": [1], "ty": [1], "data": [raster.tile_to_bytes(g)]}))
    rows = raster.to_ogr_points(df, skip_zero=True).collect()
    assert len(rows) == 1
    kind, pts = geom.wkb_loads(rows[0].geom_wkb)
    assert kind == "Point"
    assert pts == (rows[0].lon, rows[0].lat)
    assert rows[0].value == 9


# --------------------------------------------------------------- gdal_edit


def test_edit_metadata_latest_wins(spark, tmp_path):
    """gdal_edit.py: header edits are append-only manifest records; the
    merged view folds them latest-wins without touching data bytes."""
    from engine import pipeline

    base = str(tmp_path / "ds")
    os.makedirs(base, exist_ok=True)
    md = pipeline.edit_metadata(spark, base, srs="+proj=merc", nodata=0)
    assert md == {"srs": "+proj=merc", "nodata": 0}
    md = pipeline.edit_metadata(spark, base, nodata=-9999, title="density v2")
    assert md["srs"] == "+proj=merc" and md["nodata"] == -9999 and md["title"] == "density v2"


def test_flatten_mask_multizoom_joins_per_level(spark):
    """A 2-level pyramid has the SAME (tx, ty) at every level: the mask
    join must key on (zoom, tx, ty) or it cross-matches levels and emits
    duplicate tiles."""
    from engine import raster

    g4 = np.full((256, 256), 7, dtype=np.int64)
    g5 = np.full((256, 256), 9, dtype=np.int64)
    m4 = np.zeros((256, 256), dtype=np.int64)   # level-4 mask: all invalid
    m5 = np.ones((256, 256), dtype=np.int64)    # level-5 mask: all valid
    data = spark.createDataFrame(pd.DataFrame(
        {"zoom": [4, 5], "tx": [0, 0], "ty": [0, 0],
         "data": [raster.tile_to_bytes(g4), raster.tile_to_bytes(g5)]}))
    mask = spark.createDataFrame(pd.DataFrame(
        {"zoom": [4, 5], "tx": [0, 0], "ty": [0, 0],
         "data": [raster.tile_to_bytes(m4), raster.tile_to_bytes(m5)]}))
    rows = raster.flatten_mask(data, mask, nodata=-1).collect()
    assert len(rows) == 2  # one output tile per input tile, no cross-match
    out = {r.zoom: raster.bytes_to_tile(r.data) for r in rows}
    assert np.all(out[4] == -1)   # level-4 mask applied to level 4 only
    assert np.all(out[5] == 9)


def test_flatten_mask_mismatched_zoom_schema_rejected(spark):
    from engine import raster

    g = np.ones((256, 256), dtype=np.int64)
    with_zoom = spark.createDataFrame(pd.DataFrame(
        {"zoom": [4], "tx": [0], "ty": [0], "data": [raster.tile_to_bytes(g)]}))
    without = spark.createDataFrame(pd.DataFrame(
        {"tx": [0], "ty": [0], "data": [raster.tile_to_bytes(g)]}))
    with pytest.raises(ValueError, match="zoom"):
        raster.flatten_mask(with_zoom, without)


def test_edit_metadata_reserved_keys_rejected(spark, tmp_path):
    """A user -mo zoom=7 must not forge a level-commit record: resume would
    then SKIP building pyramid level 7."""
    from engine import pipeline

    base = str(tmp_path / "ds")
    os.makedirs(base, exist_ok=True)
    for key in ("zoom", "stage", "ts"):
        with pytest.raises(ValueError, match="reserved"):
            pipeline.edit_metadata(spark, base, **{key: 7})


def test_completed_levels_ignore_edit_records(spark, tmp_path):
    """Metadata edits share the manifest commit log with level commits but
    must never mark a level as built."""
    import json as _json
    import time as _time

    from engine import pipeline

    base = str(tmp_path / "ds")
    man = os.path.join(base, "_manifest")
    os.makedirs(man, exist_ok=True)
    with open(os.path.join(man, "zoom_5_1.json"), "w") as f:
        f.write(_json.dumps({"zoom": 5, "ts": _time.time()}) + "\n")
    pipeline.edit_metadata(spark, base, srs="+proj=merc")
    assert pipeline.completed_levels(spark, base) == {5}
