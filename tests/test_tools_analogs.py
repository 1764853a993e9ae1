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
