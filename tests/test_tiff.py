"""TIFF / GeoTIFF codec (engine/tiff.py) — the reference's flagship raster
format (frmts/gtiff/geotiff.cpp delegates to libtiff/libgeotiff; here the
needed subset is re-implemented from the public TIFF 6.0 / TechNote 3 /
OGC GeoTIFF specs).

Oracles are independent of the encoder wherever possible: hand-crafted
byte-literal files (both endians), the TIFF 6.0 §9 PackBits worked example,
and an LZW stream bit-packed directly from a hand-derived code list.
"""

import math
import struct

import numpy as np
import pytest

from engine import tiff


# ---------------------------------------------------------------------------
# independent decode oracles
# ---------------------------------------------------------------------------

def _entry(bo, tag, typ, cnt, val_bytes):
    ent = struct.pack(bo + "HHI", tag, typ, cnt)
    return ent + val_bytes.ljust(4, b"\0")


def _handmade(bo, pixel_bytes, entries):
    """Minimal single-IFD TIFF assembled by hand (data at offset 8,
    IFD after the data)."""
    ifd_off = 8 + len(pixel_bytes)
    head = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + struct.pack(bo + "I", 0)
    return head + pixel_bytes + ifd


def test_handmade_little_endian_gray():
    # 3x2 uint8, one uncompressed strip, data = [[1,2,3],[4,250,0]]
    bo = "<"
    data = bytes([1, 2, 3, 4, 250, 0])
    entries = [
        _entry(bo, 256, 3, 1, struct.pack(bo + "H", 3)),    # width
        _entry(bo, 257, 3, 1, struct.pack(bo + "H", 2)),    # height
        _entry(bo, 258, 3, 1, struct.pack(bo + "H", 8)),    # bits
        _entry(bo, 259, 3, 1, struct.pack(bo + "H", 1)),    # no compression
        _entry(bo, 273, 4, 1, struct.pack(bo + "I", 8)),    # strip offset
        _entry(bo, 278, 3, 1, struct.pack(bo + "H", 2)),    # rows/strip
        _entry(bo, 279, 4, 1, struct.pack(bo + "I", 6)),    # strip bytes
    ]
    out = tiff.decode_tiff(_handmade(bo, data, entries))
    assert out.dtype == np.uint8
    assert np.array_equal(out, np.array([[1, 2, 3], [4, 250, 0]], dtype=np.uint8))


def test_handmade_big_endian_uint16_predictor2():
    # MM byte order, 4x1 uint16 strip, horizontal predictor:
    # stored deltas (BE) 1000, +23, -5, +70000 wraps → values below
    bo = ">"
    vals = np.array([1000, 1023, 1018, 2554], dtype=np.uint16)
    deltas = np.array([1000, 23, 65531, 1536], dtype=np.uint16)  # mod-2^16 diffs
    assert np.array_equal(np.cumsum(deltas, dtype=np.uint16), vals)
    data = deltas.astype(">u2").tobytes()
    entries = [
        _entry(bo, 256, 3, 1, struct.pack(bo + "H", 4)),
        _entry(bo, 257, 3, 1, struct.pack(bo + "H", 1)),
        _entry(bo, 258, 3, 1, struct.pack(bo + "H", 16)),
        _entry(bo, 259, 3, 1, struct.pack(bo + "H", 1)),
        _entry(bo, 273, 4, 1, struct.pack(bo + "I", 8)),
        _entry(bo, 279, 4, 1, struct.pack(bo + "I", 8)),
        _entry(bo, 317, 3, 1, struct.pack(bo + "H", 2)),    # predictor 2
    ]
    out = tiff.decode_tiff(_handmade(bo, data, entries))
    assert out.dtype == np.uint16
    assert np.array_equal(out, vals[None, :])


def test_packbits_spec_example():
    # TIFF 6.0 §9 worked example (packed → unpacked)
    packed = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    assert tiff._packbits_decode(packed) == unpacked
    # and our encoder's output must decode to the same bytes
    assert tiff._packbits_decode(tiff._packbits_encode(unpacked)) == unpacked


def test_lzw_decode_hand_packed_codes():
    """Bit-pack a hand-derived TIFF-LZW code sequence for b'ABABABA' and
    check the decoder reconstructs it.  Derivation: CLEAR; 'A'(65);
    'B'(66) adds AB=258; 'AB'(258) adds BA=259; then w='AB'+'A' misses →
    ABA=260 is added and immediately needed — code 260 arrives while the
    decoder's table has 260 entries, the KwKwK case; EOI.
    Codes: 256, 65, 66, 258, 260, 257 → 'A'+'B'+'AB'+'ABA'."""
    codes = [256, 65, 66, 258, 260, 257]
    acc = accbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        accbits += 9
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    assert tiff._lzw_decode(bytes(out)) == b"ABABABA"
    # encoder must produce exactly this canonical stream
    assert tiff._lzw_encode(b"ABABABA") == bytes(out)


def test_lzw_table_reset_and_width_growth():
    rng = np.random.default_rng(3)
    # low-entropy stream long enough to cross 9→10→11→12 bit widths and
    # force at least one table reset at 4094 entries
    data = rng.integers(0, 5, 200_000, dtype=np.uint8).tobytes()
    enc = tiff._lzw_encode(data)
    assert tiff._lzw_decode(enc) == data
    assert len(enc) < len(data)


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------

_ARRAYS = {
    "gray_u8": np.random.default_rng(1).integers(0, 256, (33, 47), dtype=np.uint8),
    "rgb_u8": np.random.default_rng(2).integers(0, 256, (40, 31, 3), dtype=np.uint8),
    "u16": np.random.default_rng(3).integers(0, 65536, (21, 40), dtype=np.uint16),
    "i32": np.random.default_rng(4).integers(-2**31, 2**31, (17, 19), dtype=np.int32),
    "f32": np.random.default_rng(5).normal(size=(25, 30)).astype(np.float32),
    "f64_rgba": np.random.default_rng(6).normal(size=(12, 13, 4)),
}


@pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_matrix(comp, tiled, predictor):
    for planar in (False, True):
        for name, arr in _ARRAYS.items():
            buf = tiff.encode_tiff(arr, compression=comp, tiled=tiled,
                                   predictor=predictor, planar=planar,
                                   tile_size=16, rows_per_strip=10)
            out = tiff.decode_tiff(buf)
            assert out.shape == arr.shape and out.dtype == arr.dtype, name
            assert np.array_equal(out, arr), (name, comp, tiled, predictor, planar)


def test_multi_ifd_overview_chain():
    base = _ARRAYS["rgb_u8"]
    ovr1, ovr2 = base[::2, ::2], base[::4, ::4]
    buf = tiff.encode_tiff_multi([base, ovr1, ovr2], compression="deflate")
    outs = tiff.decode_tiff_all(buf)
    assert len(outs) == 3
    for got, want in zip(outs, [base, ovr1, ovr2]):
        assert np.array_equal(got, want)
    info = tiff.tiff_info(buf)
    assert info["overviews"] == [(16, 20), (8, 10)]


def test_float_predictor_is_byte_split():
    """Predictor 3's on-disk layout is the TechNote-3 byte split: the
    first n bytes of a differenced row must be the big-endian MSBs."""
    row = np.array([[1.0, 1.0, 1.0]], dtype=np.float32)[:, :, None]
    raw = tiff._apply_predictor(row, 3)
    be = row.astype(">f4").tobytes()
    # undiff manually: cumsum of the emitted bytes
    acc = np.cumsum(np.frombuffer(raw.tobytes(), np.uint8), dtype=np.uint8)
    planes = acc.reshape(4, 3)
    rebuilt = bytes(planes.T.reshape(-1))
    assert rebuilt == be


# ---------------------------------------------------------------------------
# GeoTIFF tags
# ---------------------------------------------------------------------------

def test_geotiff_tags_roundtrip_projected():
    geo = {"pixel_scale": (30.0, 30.0),
           "tiepoint": (0, 0, 0, 600000.0, 5100000.0, 0),
           "epsg": 32632, "model_type": 1,
           "citation": "WGS 84 / UTM zone 32N"}
    buf = tiff.encode_tiff(_ARRAYS["u16"], geo=geo, compression="deflate")
    info = tiff.tiff_info(buf)
    assert info["geotransform"] == (600000.0, 30.0, 0.0, 5100000.0, 0.0, -30.0)
    assert info["epsg"] == 32632
    assert info["proj4"] == "+proj=utm +zone=32 +ellps=WGS84"
    assert info["wkt"].startswith("PROJCS[")
    assert info["geokeys"][tiff.GK_MODEL_TYPE] == 1
    assert info["geokeys"][tiff.GK_RASTER_TYPE] == 1
    assert info["geokeys"][tiff.GK_CITATION] == "WGS 84 / UTM zone 32N"


def test_geotiff_tags_roundtrip_geographic():
    geo = {"pixel_scale": (0.05, 0.05), "tiepoint": (0, 0, 0, -180.0, 90.0, 0),
           "epsg": 4326, "model_type": 2}
    buf = tiff.encode_tiff(_ARRAYS["gray_u8"], geo=geo)
    info = tiff.tiff_info(buf)
    assert info["epsg"] == 4326
    assert info["geokeys"][tiff.GK_GEOGRAPHIC_TYPE] == 4326
    assert tiff.GK_PROJECTED_TYPE not in info["geokeys"]
    assert info["proj4"] == "+proj=longlat +ellps=WGS84"
    assert info["geotransform"][0] == -180.0 and info["geotransform"][3] == 90.0


def test_web_mercator_epsg_resolves_to_tile_math():
    from engine import srs, tiles

    tr = srs.make_transformer(srs.EPSG_PROJ4[3857])
    lon = np.array([-179.9, -77.03, 0.0, 12.5, 151.2])
    lat = np.array([-84.9, 38.9, 0.0, 41.9, -33.87])
    x, y = tr.forward(lon, lat)
    mx, my = tiles.lonlat_to_meters(lon, lat)
    assert np.allclose(x, mx, atol=1e-6) and np.allclose(y, my, atol=1e-6)
    lo, la = tr.inverse(x, y)
    assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat, atol=1e-9)
    # WKT1 writes the sphere as inverse-flattening 0 and round-trips
    w = srs.epsg_to_wkt1(3857)
    assert 'SPHEROID["Sphere (6378137)",6378137,0]' in w
    tr2 = srs.make_transformer(srs.wkt1_to_proj4(w))
    x2, y2 = tr2.forward(lon, lat)
    assert np.allclose(x2, x) and np.allclose(y2, y)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def _demo_tiles(spark, n=7, zoom=5):
    from engine import raster

    rng = np.random.default_rng(11)
    rows = []
    for k in range(n):
        grid = rng.integers(0, 1000, (256, 256), dtype=np.int32)
        rows.append((zoom, int(3 + k), int(9 + (k % 3)), raster.tile_to_bytes(grid)))
    return spark.createDataFrame(rows, raster.TILE_SCHEMA)


def test_tiles_to_geotiff_roundtrip(spark):
    from engine import raster

    src = _demo_tiles(spark)
    tiffs = tiff.tiles_to_geotiff(src, compression="deflate")
    rows = {(r.zoom, r.tx, r.ty): bytes(r.tiff) for r in tiffs.collect()}
    assert len(rows) == 7
    # every tile is a valid standalone GeoTIFF with mercator georeferencing
    info = tiff.tiff_info(rows[(5, 3, 9)])
    assert info["width"] == info["height"] == 256
    assert info["epsg"] == 3857 and info["dtype"] == "i4"
    from engine import tiles as tl

    minx, _, _, maxy = tl.tile_bounds(3, 9, 5)
    gt = info["geotransform"]
    assert math.isclose(gt[0], float(minx)) and math.isclose(gt[3], float(maxy))
    assert math.isclose(gt[1], tl.resolution(5))

    # ingest back — (zoom, tx, ty) derived from the embedded geo tags only
    back = tiff.geotiff_to_tiles(tiffs.select("tiff"))
    got = {(r.zoom, r.tx, r.ty): bytes(r.data) for r in back.collect()}
    want = {(r.zoom, r.tx, r.ty): bytes(r.data) for r in src.collect()}
    assert got == want


def test_geotiff_to_tiles_rejects_non_mercator(spark):
    import pandas as pd

    geo = {"pixel_scale": (30.0, 30.0), "tiepoint": (0, 0, 0, 0.0, 0.0, 0),
           "epsg": 32632, "model_type": 1}
    buf = tiff.encode_tiff(np.zeros((256, 256), np.int32), geo=geo)
    df = spark.createDataFrame(pd.DataFrame({"tiff": [buf]}))
    with pytest.raises(Exception, match="not web-mercator"):
        tiff.geotiff_to_tiles(df).collect()


def test_multimodal_decode_image_tiff():
    from engine import multimodal

    arr = _ARRAYS["rgb_u8"]
    out = multimodal.decode_image(tiff.encode_tiff(arr, compression="lzw"), None)
    assert np.array_equal(out, arr)
    gray = _ARRAYS["gray_u8"]
    out = multimodal.decode_image(tiff.encode_tiff(gray), None)
    assert out.shape == gray.shape + (1,)
    assert np.array_equal(out[:, :, 0], gray)


# ---------------------------------------------------------------------------
# COG path: streamed single-file sink + distributed byte-range ingest
# ---------------------------------------------------------------------------

def test_write_cog_and_range_ingest(tmp_path, spark):
    from engine import raster

    rng = np.random.default_rng(5)
    rows = []
    for tx in range(4, 9):
        for ty in range(10, 14):
            if (tx, ty) == (6, 12):      # hole → sparse entry
                continue
            rows.append((6, tx, ty, raster.tile_to_bytes(
                rng.integers(0, 5000, (256, 256), dtype=np.int32))))
    src = spark.createDataFrame(rows, raster.TILE_SCHEMA)
    path = str(tmp_path / "mosaic.tif")
    man = tiff.write_cog(src, path, overview_levels=1)
    assert man["levels"][0] == {"zoom": 6, "grid": (5, 4), "tiles": 19}

    # the driver-side parse must touch only header/IFD ranges, not the file
    import os

    hdr = tiff.cog_ifd(path)
    assert hdr["bytes_read"] < 4096 < os.path.getsize(path)

    # distributed ingest: every tile comes back bit-identical, the hole
    # yields no row
    back = tiff.cog_to_tiles(spark, path)
    got = {(r.zoom, r.tx, r.ty): bytes(r.data) for r in back.collect()}
    want = {(r.zoom, r.tx, r.ty): bytes(r.data) for r in src.collect()}
    assert got == want

    # whole-file decode sees the mosaic with the hole zero-filled, and the
    # overview IFD equals pyramid_reduce of the source
    full = open(path, "rb").read()
    imgs = tiff.decode_tiff_all(full)
    assert [im.shape for im in imgs] == [(1024, 1280), (512, 768)]
    assert np.array_equal(imgs[0][:256, :256], raster.bytes_to_tile(want[(6, 4, 13)]))
    assert not imgs[0][256:512, 512:768].any()
    ovr = {(r.tx, r.ty): raster.bytes_to_tile(bytes(r.data))
           for r in raster.pyramid_reduce(src).collect()}
    assert np.array_equal(imgs[1][:256, :256], ovr[(2, 6)])
    info = tiff.tiff_info(full)
    assert info["epsg"] == 3857 and info["overviews"] == [(768, 512)]


def test_cog_to_tiles_rejects_stripped(tmp_path, spark):
    path = str(tmp_path / "stripped.tif")
    geo = {"pixel_scale": (2445.98490512564, 2445.98490512564),
           "tiepoint": (0, 0, 0, 0.0, 0.0, 0), "epsg": 3857, "model_type": 1}
    open(path, "wb").write(tiff.encode_tiff(np.zeros((256, 256), np.int32), geo=geo))
    with pytest.raises(ValueError, match="not a tiled TIFF"):
        tiff.cog_to_tiles(spark, path)


# ---------------------------------------------------------------------------
# review-pass regressions: validation gaps, alignment, palette, cycle guard
# ---------------------------------------------------------------------------

def _z5_geo(tx=3, ty=9, res_scale=1.0, origin_shift=0.0):
    from engine import tiles

    res = tiles.resolution(5)
    minx, _, _, maxy = tiles.tile_bounds(tx, ty, 5)
    return {"pixel_scale": (res, res * res_scale),
            "tiepoint": (0, 0, 0, float(minx) + origin_shift, float(maxy), 0),
            "epsg": 3857, "model_type": 1}


def test_geotiff_to_tiles_rejects_misaligned_origin(spark):
    import pandas as pd
    from engine import tiles

    span = tiles.resolution(5) * 256
    buf = tiff.encode_tiff(np.zeros((256, 256), np.int32),
                           geo=_z5_geo(origin_shift=0.4 * span))
    df = spark.createDataFrame(pd.DataFrame({"tiff": [buf]}))
    with pytest.raises(Exception, match="not tile-grid aligned"):
        tiff.geotiff_to_tiles(df).collect()


def test_geotiff_to_tiles_rejects_non_square_pixels(spark):
    import pandas as pd

    buf = tiff.encode_tiff(np.zeros((256, 256), np.int32),
                           geo=_z5_geo(res_scale=2.0))
    df = spark.createDataFrame(pd.DataFrame({"tiff": [buf]}))
    with pytest.raises(Exception, match="non-square pixels"):
        tiff.geotiff_to_tiles(df).collect()


def test_geotiff_to_tiles_rejects_float_and_missing_geo(spark):
    import pandas as pd

    fbuf = tiff.encode_tiff(np.zeros((256, 256), np.float32), geo=_z5_geo())
    df = spark.createDataFrame(pd.DataFrame({"tiff": [fbuf]}))
    with pytest.raises(Exception, match="would truncate"):
        tiff.geotiff_to_tiles(df).collect()
    nogeo = tiff.encode_tiff(np.zeros((256, 256), np.int32),
                             geo={"epsg": 3857, "model_type": 1})
    df = spark.createDataFrame(pd.DataFrame({"tiff": [nogeo]}))
    with pytest.raises(Exception, match="no georeferencing tags"):
        tiff.geotiff_to_tiles(df).collect()


def test_ifd_pointer_cycle_rejected():
    buf = bytearray(tiff.encode_tiff(np.zeros((4, 4), np.uint8)))
    # patch the header's first-IFD pointer chain into a self-loop: point the
    # next-IFD pointer of IFD 0 back at IFD 0
    (ifd_off,) = struct.unpack("<I", bytes(buf[4:8]))
    (n,) = struct.unpack("<H", bytes(buf[ifd_off : ifd_off + 2]))
    p = ifd_off + 2 + 12 * n
    buf[p : p + 4] = struct.pack("<I", ifd_off)
    with pytest.raises(ValueError, match="cycle"):
        tiff.decode_tiff(bytes(buf))


def test_word_alignment_of_ifds_and_values():
    # odd-sized image + compression makes odd segment lengths likely;
    # every IFD offset and out-of-line value offset must be even
    arr = np.random.default_rng(9).integers(0, 256, (33, 33), dtype=np.uint8)
    buf = tiff.encode_tiff_multi([arr, arr[::2, ::2]], compression="packbits",
                                 geo=_z5_geo(), rows_per_strip=7)
    bo = "<"
    (off,) = struct.unpack(bo + "I", buf[4:8])
    while off:
        assert off % 2 == 0
        (n,) = struct.unpack(bo + "H", buf[off : off + 2])
        for i in range(n):
            ent = buf[off + 2 + 12 * i : off + 14 + 12 * i]
            tag, typ, cnt = struct.unpack(bo + "HHI", ent[:8])
            size = tiff._TYPE_SIZE.get(typ, 1) * cnt
            if size > 4:
                (voff,) = struct.unpack(bo + "I", ent[8:12])
                assert voff % 2 == 0, (tag, voff)
        (off,) = struct.unpack(bo + "I", buf[off + 2 + 12 * n : off + 6 + 12 * n])
    # decodes identically despite padding
    assert np.array_equal(tiff.decode_tiff(buf), arr)


def test_palette_expansion():
    # hand-build a palette TIFF: 2x2 indices {0,1,2,3}, ColorMap maps each
    # index to a distinct primary
    bo = "<"
    data = bytes([0, 1, 2, 3])
    n = 256
    cmap = np.zeros((3, n), dtype=np.uint16)
    cmap[0, 1] = 0xFFFF        # index 1 → red
    cmap[1, 2] = 0xFFFF        # index 2 → green
    cmap[2, 3] = 0xFFFF        # index 3 → blue
    cmap_bytes = cmap.astype("<u2").tobytes()
    entries = [
        _entry(bo, 256, 3, 1, struct.pack(bo + "H", 2)),
        _entry(bo, 257, 3, 1, struct.pack(bo + "H", 2)),
        _entry(bo, 258, 3, 1, struct.pack(bo + "H", 8)),
        _entry(bo, 259, 3, 1, struct.pack(bo + "H", 1)),
        _entry(bo, 262, 3, 1, struct.pack(bo + "H", 3)),   # palette photometric
        _entry(bo, 273, 4, 1, struct.pack(bo + "I", 8)),
        _entry(bo, 279, 4, 1, struct.pack(bo + "I", 4)),
        _entry(bo, 320, 3, 3 * n, struct.pack(bo + "I", 12 + 2 + 8 * 12 + 4)),
    ]
    head = struct.pack(bo + "2sHI", b"II", 42, 12)
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + struct.pack(bo + "I", 0)
    buf = head + data + ifd + cmap_bytes
    raw = tiff.decode_tiff(buf)
    assert np.array_equal(raw, np.array([[0, 1], [2, 3]], dtype=np.uint8))
    assert tiff.tiff_info(buf)["photometric"] == 3
    rgb = tiff.decode_tiff(buf, expand_palette=True)
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 1]) == (255, 0, 0)
    assert tuple(rgb[1, 0]) == (0, 255, 0)
    assert tuple(rgb[1, 1]) == (0, 0, 255)
    # multimodal decode path uses the expanded form
    from engine import multimodal

    assert multimodal.decode_image(buf, None).shape == (2, 2, 3)


# ---------------------------------------------------------------------------
# BigTIFF (magic 43, 8-byte offsets — the >4 GiB layout)
# ---------------------------------------------------------------------------

def test_bigtiff_handmade_decode():
    """Hand-assembled BigTIFF per the public spec: 16-byte header
    (II, 43, offsetsize 8, pad 0, first-IFD u64), u64 entry counts,
    20-byte entries with 8-byte inline values, LONG8 strip offsets."""
    bo = "<"
    data = bytes([7, 8, 9, 10])
    ifd_off = 16 + len(data)

    def ent(tag, typ, cnt, val8):
        return struct.pack(bo + "HHQ", tag, typ, cnt) + val8.ljust(8, b"\0")

    entries = [
        ent(256, 3, 1, struct.pack(bo + "H", 4)),
        ent(257, 3, 1, struct.pack(bo + "H", 1)),
        ent(258, 3, 1, struct.pack(bo + "H", 8)),
        ent(259, 3, 1, struct.pack(bo + "H", 1)),
        ent(273, 16, 1, struct.pack(bo + "Q", 16)),   # LONG8 strip offset
        ent(279, 16, 1, struct.pack(bo + "Q", 4)),
    ]
    head = struct.pack(bo + "2sHHHQ", b"II", 43, 8, 0, ifd_off)
    ifd = struct.pack(bo + "Q", len(entries)) + b"".join(entries) + struct.pack(bo + "Q", 0)
    out = tiff.decode_tiff(head + data + ifd)
    assert np.array_equal(out, np.array([[7, 8, 9, 10]], dtype=np.uint8))


def test_write_cog_bigtiff_roundtrip(tmp_path, spark):
    from engine import raster

    rng = np.random.default_rng(8)
    rows = [(4, 2 + k, 7, raster.tile_to_bytes(
        rng.integers(0, 99, (256, 256), dtype=np.int32))) for k in range(3)]
    src = spark.createDataFrame(rows, raster.TILE_SCHEMA)
    path = str(tmp_path / "big.tif")
    man = tiff.write_cog(src, path, bigtiff=True)
    assert man["bigtiff"] is True
    raw = open(path, "rb").read()
    assert struct.unpack("<H", raw[2:4])[0] == 43
    got = {(r.tx, r.ty): bytes(r.data) for r in tiff.cog_to_tiles(spark, path).collect()}
    want = {(r.tx, r.ty): bytes(r.data) for r in src.collect()}
    assert got == want
    # auto on a small file stays classic and yields the identical tile set
    path2 = str(tmp_path / "classic.tif")
    man2 = tiff.write_cog(src, path2)
    assert man2["bigtiff"] is False
    raw2 = open(path2, "rb").read()
    assert struct.unpack("<H", raw2[2:4])[0] == 42
    got2 = {(r.tx, r.ty): bytes(r.data) for r in tiff.cog_to_tiles(spark, path2).collect()}
    assert got2 == want


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7 + JPEGTables, frmts/gtiff JPEG profile)
# ---------------------------------------------------------------------------

def _smooth_rgb():
    x = np.linspace(0, 4 * np.pi, 96)
    img = (127 + 100 * np.sin(x)[None, :] * np.cos(x)[:, None]).astype(np.uint8)
    return np.stack([img, img[::-1], np.full_like(img, 60)], axis=2)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("shared", [True, False])
def test_jpeg_in_tiff_roundtrip(tiled, shared):
    rgb = _smooth_rgb()
    gray = rgb[:, :, 0]
    for arr in (gray, rgb):
        buf = tiff.encode_tiff(arr, compression="jpeg", tiled=tiled,
                               tile_size=32, rows_per_strip=24,
                               jpeg_quality=92, jpeg_shared_tables=shared)
        info = tiff.tiff_info(buf)
        assert info["compression"] == 7
        assert info["photometric"] == (6 if arr.ndim == 3 else 1)
        out = tiff.decode_tiff(buf)
        assert out.shape == arr.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 12


def test_jpeg_in_tiff_single_tile_matches_raw_codec():
    """With one 96×96 tile the segment IS a full JPEG of the image — the
    TIFF wrapper must decode bit-identically to engine.jpeg itself."""
    from engine import jpeg

    rgb = _smooth_rgb()
    buf = tiff.encode_tiff(rgb, compression="jpeg", tiled=True, tile_size=96,
                           jpeg_quality=92, jpeg_shared_tables=True)
    direct = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=92))
    assert np.array_equal(tiff.decode_tiff(buf), direct)


def test_jpeg_tables_actually_shared():
    rgb = _smooth_rgb()
    shared = tiff.encode_tiff(rgb, compression="jpeg", tiled=True, tile_size=32,
                              jpeg_shared_tables=True)
    inline = tiff.encode_tiff(rgb, compression="jpeg", tiled=True, tile_size=32,
                              jpeg_shared_tables=False)
    assert len(shared) < len(inline)          # DQT/DHT deduplicated
    bo, ifds = tiff._read_ifds(shared)
    tables = ifds[0][tiff.T_JPEG_TABLES]
    assert tables[:2] == b"\xFF\xD8" and tables[-2:] == b"\xFF\xD9"
    assert b"\xFF\xDB" in tables              # DQT lives in the shared stream
    bo, ifds = tiff._read_ifds(inline)
    assert tiff.T_JPEG_TABLES not in ifds[0]


def test_jpeg_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="chunky uint8"):
        tiff.encode_tiff(np.zeros((16, 16), np.uint16), compression="jpeg")
    with pytest.raises(ValueError, match="chunky uint8"):
        tiff.encode_tiff(np.zeros((16, 16, 3), np.uint8), compression="jpeg",
                         planar=True)


def test_cog_overview_level_ingest(tmp_path, spark):
    """cog_to_tiles(level=1) ingests the overview IFD standalone and
    matches pyramid_reduce of the source exactly (gdaladdo read path)."""
    from engine import raster

    rng = np.random.default_rng(13)
    rows = [(6, 8 + k, 20 + (k % 2), raster.tile_to_bytes(
        rng.integers(0, 400, (256, 256), dtype=np.int32))) for k in range(6)]
    src = spark.createDataFrame(rows, raster.TILE_SCHEMA)
    path = str(tmp_path / "ovr.tif")
    tiff.write_cog(src, path, overview_levels=1)
    got = {(r.zoom, r.tx, r.ty): bytes(r.data)
           for r in tiff.cog_to_tiles(spark, path, level=1).collect()}
    want = {(r.zoom, r.tx, r.ty): bytes(r.data)
            for r in raster.pyramid_reduce(src).collect()}
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="level 5 of"):
        tiff.cog_to_tiles(spark, path, level=5)


# ---------------------------------------------------------------------------
# property-based fuzz (mirrors tests/test_properties.py's strategy style)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as hst


@settings(max_examples=60, deadline=None)
@given(
    h=hst.integers(1, 40),
    w=hst.integers(1, 40),
    spp=hst.sampled_from([1, 3, 4]),
    dt=hst.sampled_from(["u1", "u2", "i2", "u4", "i4", "f4", "f8"]),
    comp=hst.sampled_from(["none", "deflate", "lzw", "packbits"]),
    tiled=hst.booleans(),
    predictor=hst.booleans(),
    planar=hst.booleans(),
    seed=hst.integers(0, 2**31 - 1),
)
def test_property_roundtrip(h, w, spp, dt, comp, tiled, predictor, planar, seed):
    rng = np.random.default_rng(seed)
    dtype = np.dtype(dt)
    shape = (h, w) if spp == 1 else (h, w, spp)
    if dtype.kind == "f":
        arr = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, int(info.max) + 1, shape, dtype=dtype)
    buf = tiff.encode_tiff(arr, compression=comp, tiled=tiled,
                           predictor=predictor, planar=planar,
                           tile_size=16, rows_per_strip=7)
    out = tiff.decode_tiff(buf)
    assert out.shape == arr.shape and out.dtype == arr.dtype
    assert np.array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(data=hst.binary(min_size=0, max_size=5000))
def test_property_lzw_packbits_lossless(data):
    assert tiff._lzw_decode(tiff._lzw_encode(data)) == data
    assert tiff._packbits_decode(tiff._packbits_encode(data)) == data


# ---------------------------------------------------------------------------
# second review pass regressions
# ---------------------------------------------------------------------------

def test_jpeg_cog_external_ingest(tmp_path, spark):
    """An external single-band uint8 JPEG-compressed tiled web-mercator
    GeoTIFF ingests through the byte-range path, JPEGTables included."""
    from engine import tiles

    x = np.linspace(0, 6 * np.pi, 256)
    grid = (120 + 90 * np.sin(x)[None, :] * np.cos(x)[:, None]).astype(np.uint8)
    buf = tiff.encode_tiff(grid, compression="jpeg", tiled=True, tile_size=256,
                           jpeg_quality=95, geo=_z5_geo(tx=4, ty=11))
    path = str(tmp_path / "jpeg_cog.tif")
    open(path, "wb").write(buf)
    out = tiff.cog_to_tiles(spark, path).collect()
    assert len(out) == 1 and (out[0].zoom, out[0].tx, out[0].ty) == (5, 4, 11)
    from engine import raster

    got = raster.bytes_to_tile(bytes(out[0].data))
    # lossy codec: values near, not equal
    assert np.abs(got - grid.astype(np.int64)).max() <= 12
    # and identical to what decode_tiff itself produces
    assert np.array_equal(got, tiff.decode_tiff(buf).astype(np.int32))


def test_write_cog_rejects_jpeg_and_bad_bigtiff(tmp_path, spark):
    from engine import raster

    src = spark.createDataFrame(
        [(4, 1, 1, raster.tile_to_bytes(np.zeros((256, 256), np.int32)))],
        raster.TILE_SCHEMA)
    with pytest.raises(ValueError, match="cannot be JPEG"):
        tiff.write_cog(src, str(tmp_path / "x.tif"), compression="jpeg")
    with pytest.raises(ValueError, match="bigtiff must be"):
        tiff.write_cog(src, str(tmp_path / "x.tif"), bigtiff="Auto")
    with pytest.raises(ValueError, match="cannot be JPEG"):
        tiff.tiles_to_geotiff(src, compression="jpeg")


def test_jpeg_int8_sample_format_rejected():
    buf = bytearray(tiff.encode_tiff(
        np.zeros((16, 16), np.uint8), compression="jpeg", jpeg_shared_tables=False))
    # patch SampleFormat (339) from 1 (unsigned) to 2 (signed) in place
    bo, ifds = tiff._read_ifds(bytes(buf))
    (ifd_off,) = struct.unpack("<I", bytes(buf[4:8]))
    (n,) = struct.unpack("<H", bytes(buf[ifd_off:ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack("<HHI", bytes(buf[e:e + 8]))
        if tag == 339:
            buf[e + 8:e + 10] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="chunky uint8"):
        tiff.decode_tiff(bytes(buf))


def test_palette_write_roundtrip_with_quantize():
    """rgb2pct → palette GeoTIFF: median-cut palette + index grid written
    as Photometric=3 + 16-bit ColorMap, read back raw and expanded."""
    from engine import quantize

    rng = np.random.default_rng(21)
    # few distinct colors so the median-cut palette is exact
    colors = np.array([[250, 10, 10], [10, 250, 10], [10, 10, 250], [200, 200, 0]],
                      dtype=np.uint8)
    idx = rng.integers(0, 4, (40, 50)).astype(np.uint8)
    buf = tiff.encode_tiff(idx, compression="lzw", colormap=colors)
    info = tiff.tiff_info(buf)
    assert info["photometric"] == 3
    raw = tiff.decode_tiff(buf)
    assert np.array_equal(raw, idx)                    # GDAL: index band
    rgb = tiff.decode_tiff(buf, expand_palette=True)
    assert np.array_equal(rgb, colors[idx])            # 257-scale survives >>8
    # median_cut output plugs in directly
    hist = sorted([(int(r) // 8 * 1024 + int(g) // 8 * 32 + int(b) // 8, 10)
                   for r, g, b in colors])
    pal = quantize.median_cut(hist, 4)
    buf2 = tiff.encode_tiff(idx, colormap=pal)
    assert tiff.tiff_info(buf2)["photometric"] == 3
    with pytest.raises(ValueError, match="single-band uint8"):
        tiff.encode_tiff(np.zeros((8, 8, 3), np.uint8), colormap=colors)
