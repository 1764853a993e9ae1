"""GCP polynomial / TPS / approximate transformers and the
arbitrary-transformer warp."""

import numpy as np
import pandas as pd
import pytest

from engine import raster, transformer, warp

T = raster.TILE_SIZE


def test_gcp_polynomial_recovers_affine():
    rng = np.random.default_rng(1)
    # true affine: x' = 2x + 0.5y + 10 ; y' = -0.25x + 1.5y - 3
    px = rng.uniform(0, 100, 12)
    py = rng.uniform(0, 100, 12)
    gx = 2 * px + 0.5 * py + 10
    gy = -0.25 * px + 1.5 * py - 3
    t = transformer.GCPPolynomialTransformer(zip(px, py, gx, gy), order=1)
    fx, fy = t.forward(px, py)
    assert np.abs(fx - gx).max() < 1e-9 and np.abs(fy - gy).max() < 1e-9
    ix, iy = t.inverse(gx, gy)
    assert np.abs(ix - px).max() < 1e-9 and np.abs(iy - py).max() < 1e-9


def test_gcp_polynomial_order2_exact_on_quadratic():
    rng = np.random.default_rng(2)
    px = rng.uniform(-5, 5, 20)
    py = rng.uniform(-5, 5, 20)
    gx = 1 + px + 0.1 * px * py + 0.05 * py * py
    gy = 2 - py + 0.2 * px * px
    t = transformer.GCPPolynomialTransformer(zip(px, py, gx, gy), order=2)
    fx, fy = t.forward(px, py)
    assert np.abs(fx - gx).max() < 1e-8 and np.abs(fy - gy).max() < 1e-8
    # order-1 fit on the same data must NOT be exact (sanity)
    t1 = transformer.GCPPolynomialTransformer(zip(px, py, gx, gy), order=1)
    fx1, _ = t1.forward(px, py)
    assert np.abs(fx1 - gx).max() > 1e-3


def test_gcp_needs_enough_points():
    with pytest.raises(ValueError):
        transformer.GCPPolynomialTransformer([(0, 0, 0, 0), (1, 1, 1, 1)], order=2)


def test_tps_interpolates_gcps_exactly():
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 50, 15)
    py = rng.uniform(0, 50, 15)
    gx = px + 3 * np.sin(px / 10)
    gy = py + 2 * np.cos(py / 7)
    t = transformer.TPSTransformer(zip(px, py, gx, gy))
    fx, fy = t.forward(px, py)
    assert np.abs(fx - gx).max() < 1e-6 and np.abs(fy - gy).max() < 1e-6
    # smooth between knots: midpoint of two close GCPs lands between them
    mx, my = t.forward(np.array([(px[0] + px[1]) / 2]), np.array([(py[0] + py[1]) / 2]))
    assert np.isfinite(mx[0]) and np.isfinite(my[0])


def test_approx_transform_error_bound():
    def exact(x, y):
        return x + 5 * np.sin(x / 40.0), y * 1.0

    x = np.arange(0.0, 513.0)
    y = np.zeros_like(x)
    ax, ay = transformer.approx_transform(exact, x, y, max_error=0.125)
    ex, ey = exact(x, y)
    # the acceptance rule checks midpoints, so the practical bound is a
    # small multiple of max_error
    assert np.abs(ax - ex).max() < 0.5
    assert np.array_equal(ay, ey)


def test_warp_custom_identity_and_shift(spark):
    rng = np.random.default_rng(5)
    g = rng.integers(0, 50, (T, T)).astype(np.int64)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [5], "tx": [3], "ty": [4], "data": [raster.tile_to_bytes(g)]})
    )
    ident = lambda px, py: (px, py)
    out = warp.warp_custom(spark, src, 5, [(3, 4)], ident).collect()
    assert len(out) == 1
    assert np.array_equal(raster.bytes_to_tile(out[0].data), g)
    # affine GCP transformer: dst tile (0,0) maps onto src tile (3,4)
    gcps = [(0, 0, 3 * T, 4 * T), (T, 0, 4 * T, 4 * T), (0, T, 3 * T, 5 * T), (T, T, 4 * T, 5 * T)]
    tr = transformer.GCPPolynomialTransformer(gcps, order=1)
    out2 = warp.warp_custom(spark, src, 5, [(0, 0)], tr.forward).collect()
    assert len(out2) == 1 and (out2[0].tx, out2[0].ty) == (0, 0)
    assert np.array_equal(raster.bytes_to_tile(out2[0].data), g)


def test_warp_custom_tps_matches_polynomial_on_affine(spark):
    # an affine mapping expressed as TPS must warp identically to the
    # polynomial transformer (both exact on affine data)
    rng = np.random.default_rng(6)
    g = rng.integers(0, 90, (T, T)).astype(np.int64)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [5], "tx": [1], "ty": [1], "data": [raster.tile_to_bytes(g)]})
    )
    gcps = [(0, 0, T, T), (T, 0, 2 * T, T), (0, T, T, 2 * T), (T, T, 2 * T, 2 * T), (T / 2, T / 2, 1.5 * T, 1.5 * T)]
    p = transformer.GCPPolynomialTransformer(gcps, order=1)
    t = transformer.TPSTransformer(gcps)
    a = warp.warp_custom(spark, src, 5, [(0, 0)], p.forward).collect()[0]
    b = warp.warp_custom(spark, src, 5, [(0, 0)], t.forward).collect()[0]
    assert np.array_equal(raster.bytes_to_tile(a.data), raster.bytes_to_tile(b.data))


def test_rpc_transformer_roundtrip():
    # synthetic RPC resembling an affine sensor model with a mild cubic
    # perturbation: forward/inverse must round-trip to sub-1e-6 pixels
    z20 = [0.0] * 20
    num_s = list(z20); num_s[0] = 0.002; num_s[1] = 1.0; num_s[2] = 0.01; num_s[3] = 0.05; num_s[11] = 1e-4
    den = list(z20); den[0] = 1.0; den[2] = 1e-5
    num_l = list(z20); num_l[0] = -0.001; num_l[2] = -1.0; num_l[1] = 0.02; num_l[15] = -2e-4
    rpc = {
        "LINE_OFF": 5000.0, "LINE_SCALE": 5000.0,
        "SAMP_OFF": 6000.0, "SAMP_SCALE": 6000.0,
        "LAT_OFF": 45.0, "LAT_SCALE": 0.5,
        "LONG_OFF": 7.0, "LONG_SCALE": 0.5,
        "HEIGHT_OFF": 500.0, "HEIGHT_SCALE": 500.0,
        "SAMP_NUM_COEFF": num_s, "SAMP_DEN_COEFF": den,
        "LINE_NUM_COEFF": num_l, "LINE_DEN_COEFF": den,
    }
    t = transformer.RPCTransformer(rpc)
    rng = np.random.default_rng(9)
    lon = rng.uniform(6.6, 7.4, 500)
    lat = rng.uniform(44.6, 45.4, 500)
    s, l = t.forward(lon, lat)
    lon2, lat2 = t.inverse(s, l)
    s2, l2 = t.forward(lon2, lat2)
    assert np.abs(s2 - s).max() < 1e-6 and np.abs(l2 - l).max() < 1e-6
    assert np.abs(lon2 - lon).max() < 1e-8 and np.abs(lat2 - lat).max() < 1e-8
    # height term participates
    s_h, l_h = t.forward(lon, lat, height=800.0)
    assert not np.allclose(s_h, s)


def test_rpc_affine_center():
    # at the offsets (normalized coords 0) the model returns the offsets
    z20 = [0.0] * 20
    num = list(z20); num[1] = 1.0
    den = list(z20); den[0] = 1.0
    numl = list(z20); numl[2] = 1.0
    rpc = {
        "LINE_OFF": 100.0, "LINE_SCALE": 50.0, "SAMP_OFF": 200.0, "SAMP_SCALE": 80.0,
        "LAT_OFF": 10.0, "LAT_SCALE": 1.0, "LONG_OFF": 20.0, "LONG_SCALE": 1.0,
        "HEIGHT_OFF": 0.0, "HEIGHT_SCALE": 1.0,
        "SAMP_NUM_COEFF": num, "SAMP_DEN_COEFF": den,
        "LINE_NUM_COEFF": numl, "LINE_DEN_COEFF": den,
    }
    t = transformer.RPCTransformer(rpc)
    s, l = t.forward(np.array([20.0]), np.array([10.0]))
    assert abs(s[0] - 200.0) < 1e-12 and abs(l[0] - 100.0) < 1e-12
    # one L-unit east → one SAMP_SCALE of pixels
    s1, _ = t.forward(np.array([21.0]), np.array([10.0]))
    assert abs(s1[0] - 280.0) < 1e-9


def test_warp_custom_accepts_dataframe_dst(spark):
    """dst tiles can arrive as a DataFrame (spark.range arithmetic) so a
    deep-zoom destination rectangle never materializes on the driver;
    output must equal the list form."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from engine import raster, warp

    T = raster.TILE_SIZE
    g = (np.arange(T * T, dtype=np.int64) % 251).reshape(T, T)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [4], "tx": [3], "ty": [5], "data": [raster.tile_to_bytes(g)]})
    )

    def inv_fn(dpx, dpy):  # identity into the source tile's pixel space
        return np.asarray(dpx) + 3 * T, np.asarray(dpy) + 5 * T

    lst = {(r.tx, r.ty): bytes(r.data) for r in warp.warp_custom(spark, src, 4, [(0, 0)], inv_fn).collect()}
    dfd = spark.range(1).select(F.lit(0).alias("dtx"), F.lit(0).alias("dty"))
    dfo = {(r.tx, r.ty): bytes(r.data) for r in warp.warp_custom(spark, src, 4, dfd, inv_fn).collect()}
    assert lst == dfo and lst


def test_geoloc_forward_matches_bilinear_patch():
    """Forward interpolation agrees with the closed form on an affine
    swath (bilinear is exact there) including PIXEL/LINE offset+step
    metadata (alg/gdalgeoloc.cpp:940-1006 semantics)."""
    H, W = 12, 18
    line, pix = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = 10.0 + 0.05 * pix + 0.01 * line
    gy = 50.0 - 0.04 * line + 0.002 * pix
    # geoloc row g covers raster pixel 1 + 2g (subsampled geoloc array)
    t = transformer.GeolocArrayTransformer(
        gx, gy, pixel_offset=1.0, line_offset=1.0, pixel_step=2.0, line_step=2.0
    )
    px = np.array([1.0, 5.0, 8.4, 30.2])
    py = np.array([1.0, 3.0, 12.6, 20.0])
    X, Y = t.forward(px, py)
    gp = (px - 1.0) / 2.0
    gl = (py - 1.0) / 2.0
    assert np.allclose(X, 10.0 + 0.05 * gp + 0.01 * gl, atol=1e-12)
    assert np.allclose(Y, 50.0 - 0.04 * gl + 0.002 * gp, atol=1e-12)


def test_geoloc_inverse_roundtrip_curved_swath():
    """Newton-refined inverse round-trips a genuinely curved (non-affine)
    swath to sub-1e-6 pixels — tighter than the reference's 2.0-era
    backmap, which quantizes to backmap cells."""
    H, W = 40, 60
    line, pix = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = -100.0 + 0.02 * pix + 0.004 * line + 2e-4 * pix * line + 1e-4 * line ** 2
    gy = 35.0 - 0.018 * line + 0.003 * pix - 1.5e-4 * pix * line
    t = transformer.GeolocArrayTransformer(gx, gy)
    rng = np.random.default_rng(11)
    px = rng.uniform(1, W - 2, 200)
    py = rng.uniform(1, H - 2, 200)
    X, Y = t.forward(px, py)
    ipx, ipy = t.inverse(X, Y)
    assert np.abs(ipx - px).max() < 1e-6
    assert np.abs(ipy - py).max() < 1e-6


def test_geoloc_nodata_propagates_nan():
    H, W = 8, 8
    line, pix = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = pix * 1.0
    gy = line * 1.0
    gx[3, 3] = -999.0
    t = transformer.GeolocArrayTransformer(gx, gy, nodata=-999.0)
    X, _ = t.forward(np.array([2.5, 6.0]), np.array([2.5, 6.0]))
    assert np.isnan(X[0]) and np.isfinite(X[1])


def test_warp_custom_geoloc_matches_polynomial_on_affine(spark):
    """A geoloc-array transformer built by sampling an affine map warps
    bit-identically to the equivalent GCP polynomial transformer (both
    exact on affine data) — the gdaltransformer.cpp:974 chain with a
    geolocation source."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 90, (T, T)).astype(np.int64)
    src = spark.createDataFrame(
        pd.DataFrame({"zoom": [5], "tx": [1], "ty": [1], "data": [raster.tile_to_bytes(g)]})
    )
    # dst pixel (dpx,dpy) -> src pixel (T + dpx, T + dpy), sampled on a
    # subsampled geoloc grid (step 16) over the dst tile
    step = 16
    n = T // step + 2
    line, pix = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    glx = T + pix * float(step)
    gly = T + line * float(step)
    geo = transformer.GeolocArrayTransformer(glx, gly, pixel_step=step, line_step=step)
    gcps = [(0, 0, T, T), (T, 0, 2 * T, T), (0, T, T, 2 * T), (T, T, 2 * T, 2 * T)]
    p = transformer.GCPPolynomialTransformer(gcps, order=1)
    a = warp.warp_custom(spark, src, 5, [(0, 0)], p.forward).collect()[0]
    b = warp.warp_custom(spark, src, 5, [(0, 0)], geo.forward).collect()[0]
    assert np.array_equal(raster.bytes_to_tile(a.data), raster.bytes_to_tile(b.data))


# -- transform_points_df (gdaltransform analog) ------------------------------


def test_transform_points_df_gcp_chain(spark):
    """Point table through a fitted GCP polynomial == direct numpy apply;
    inverse direction roundtrips."""
    rng = np.random.RandomState(5)
    # affine ground truth: x' = 2x - y + 3 ; y' = x + 0.5y - 1
    px, py = rng.uniform(0, 100, 12), rng.uniform(0, 100, 12)
    gx, gy = 2 * px - py + 3, px + 0.5 * py - 1
    t = transformer.GCPPolynomialTransformer(zip(px, py, gx, gy), order=1)

    pts = pd.DataFrame({"pid": range(50),
                        "x": rng.uniform(0, 100, 50), "y": rng.uniform(0, 100, 50)})
    df = spark.createDataFrame(pts)
    out = (
        transformer.transform_points_df(df, t, x_col="x", y_col="y")
        .orderBy("pid").toPandas()
    )
    ex, ey = t.forward(pts["x"].to_numpy(), pts["y"].to_numpy())
    np.testing.assert_allclose(out["x_out"], ex, rtol=0, atol=1e-9)
    np.testing.assert_allclose(out["y_out"], ey, rtol=0, atol=1e-9)

    back = (
        transformer.transform_points_df(
            spark.createDataFrame(out[["pid", "x_out", "y_out"]]),
            t, x_col="x_out", y_col="y_out", inverse=True)
        .orderBy("pid").toPandas()
    )
    np.testing.assert_allclose(back["x_out"], pts["x"], atol=1e-6)
    np.testing.assert_allclose(back["y_out"], pts["y"], atol=1e-6)


def test_transform_points_df_plain_callable_and_nan(spark):
    """A bare (x,y)->(x',y') closure works; non-finite inputs propagate NaN;
    inverse=True on a bare closure raises."""
    from engine import srs

    pdf = pd.DataFrame({"pid": [0, 1, 2], "x": [0.0, 3.0, np.nan], "y": [0.0, 45.0, 10.0]})
    df = spark.createDataFrame(pdf)
    out = (
        transformer.transform_points_df(
            df, lambda lon, lat: srs.tmerc_forward(lon, lat, lon0=3.0))
        .orderBy("pid").toPandas()
    )
    ex, ey = srs.tmerc_forward(pdf["x"].to_numpy(), pdf["y"].to_numpy(), lon0=3.0)
    np.testing.assert_allclose(out["x_out"], ex, equal_nan=True)
    np.testing.assert_allclose(out["y_out"], ey, equal_nan=True)
    assert np.isnan(out["x_out"].iloc[2])

    with pytest.raises(ValueError):
        transformer.transform_points_df(df, lambda x, y: (x, y), inverse=True)


def test_transform_geoloc_bands_matches_scalar(spark):
    """GDALTransformGeolocations analog: band VALUES are transformed and
    written back; Z carried through for 2-D transformers; no shuffle
    (single-stage plan)."""
    import numpy as np
    from engine.srs import LCCTransformer
    from engine.transformer import transform_geoloc_bands

    lcc = LCCTransformer(lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(6):
        lon = rng.uniform(-120, -70, 64)
        lat = rng.uniform(25, 50, 64)
        zz = rng.uniform(0, 100, 64)
        rows.append((0, i, 0, lon.tobytes(), lat.tobytes(), zz.tobytes()))
    df = spark.createDataFrame(
        rows, "zoom int, tx long, ty long, xdata binary, ydata binary, zdata binary"
    )
    got = {r["tx"]: r for r in transform_geoloc_bands(df, lcc).collect()}
    assert len(got) == 6
    for zoom, tx, ty, xb, yb, zb in rows:
        ex, ey = lcc.forward(np.frombuffer(xb), np.frombuffer(yb))
        np.testing.assert_allclose(np.frombuffer(got[tx]["xdata"]), ex, rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.frombuffer(got[tx]["ydata"]), ey, rtol=0, atol=1e-9)
        assert got[tx]["zdata"] == zb  # Z unchanged for 2-D transformer
    # inverse round-trips
    back = transform_geoloc_bands(
        spark.createDataFrame(list(got.values()), df.schema), lcc, inverse=True
    ).collect()
    for r in back:
        orig = [x for x in rows if x[1] == r["tx"]][0]
        np.testing.assert_allclose(
            np.frombuffer(r["xdata"]), np.frombuffer(orig[3]), rtol=0, atol=1e-8
        )
