"""Image matching (GDAL correlator analog, engine/matching.py).

The oracle here is a direct scalar-loop transcription of the reference
semantics (alg/gdal_octave.cpp, alg/gdal_simplesurf.cpp) — same integral
matrix, same clamped box sums, same layer/extremum/descriptor rules — so
the vectorized engine kernels are checked operation-for-operation."""

import math

import numpy as np
import pandas as pd
import pytest

from engine import matching as M


# ---------------------------------------------------------------- oracle

def _rect_sum_scalar(S, row, col, width, height):
    H, W = S.shape
    w, h = width - 1, height - 1
    lt_row = row - 1 if row <= H else -1
    lt_col = col - 1 if col <= W else -1
    rb_row = row + h if row + h < H else H - 1
    rb_col = col + w if col + w < W else W - 1

    def val(r, c):
        return S[r, c] if 0 <= r < H and 0 <= c < W else 0.0

    res = val(lt_row, lt_col) + val(rb_row, rb_col) - val(lt_row, rb_col) - val(rb_row, lt_col)
    return res if res > 0 else 0.0


def _layer_scalar(S, octave, interval):
    H, W = S.shape
    fs = 3 * ((1 << octave) * interval + 1)
    radius = (fs - 1) // 2
    lobe = fs // 3
    long_part = 2 * lobe - 1
    norm = float(fs * fs)
    det = np.zeros((H, W))
    signs = np.zeros((H, W), dtype=np.int8)
    for r in range(radius, H - radius + 1):
        for c in range(radius, W - radius + 1):
            dxx = (_rect_sum_scalar(S, r - lobe + 1, c - radius, fs, long_part)
                   - 3 * _rect_sum_scalar(S, r - lobe + 1, c - (lobe - 1) // 2, lobe, long_part)) / norm
            dyy = (_rect_sum_scalar(S, r - radius, c - lobe - 1, long_part, fs)
                   - 3 * _rect_sum_scalar(S, r - lobe + 1, c - lobe + 1, long_part, lobe)) / norm
            dxy = (_rect_sum_scalar(S, r - lobe, c - lobe, lobe, lobe)
                   + _rect_sum_scalar(S, r + 1, c + 1, lobe, lobe)
                   - _rect_sum_scalar(S, r - lobe, c + 1, lobe, lobe)
                   - _rect_sum_scalar(S, r + 1, c - lobe, lobe, lobe)) / norm
            det[r, c] = dxx * dyy - 0.9 * 0.9 * dxy * dxy
            signs[r, c] = 1 if dxx + dyy >= 0 else -1
    return det, signs, radius, (1 << octave)


def _descriptor_scalar(S, x, y, scale):
    haar = 2 * scale
    desc_side = 20 * scale
    quad = desc_side // 4
    sub = quad // 5
    lt_row = y - desc_side // 2
    lt_col = x - desc_side // 2
    out = []
    for r in range(lt_row, lt_row + desc_side, quad):
        for c in range(lt_col, lt_col + desc_side, quad):
            dx = dy = adx = ady = 0.0
            for sr in range(r, r + quad, sub):
                for sc in range(c, c + quad, sub):
                    cur_r = sr + sub // 2 - haar // 2
                    cur_c = sc + sub // 2 - haar // 2
                    cdx = (_rect_sum_scalar(S, cur_r, cur_c + haar // 2, haar // 2, haar)
                           - _rect_sum_scalar(S, cur_r, cur_c, haar // 2, haar))
                    cdy = (_rect_sum_scalar(S, cur_r + haar // 2, cur_c, haar, haar // 2)
                           - _rect_sum_scalar(S, cur_r, cur_c, haar, haar // 2))
                    dx += cdx
                    dy += cdy
                    adx += abs(cdx)
                    ady += abs(cdy)
            out.extend([dx, dy, adx, ady])
    return out


def _extract_scalar(img, octave_start, octave_end, threshold):
    H, W = img.shape
    S = M.integral_image(img)
    pts = []
    for octave in range(octave_start, octave_end + 1):
        layers = [_layer_scalar(S, octave, i) for i in (1, 2, 3, 4)]
        for k in range(2):
            bot, mid, top = layers[k], layers[k + 1], layers[k + 2]
            tr = top[2]
            for i in range(H):
                for j in range(W):
                    if i <= tr or j <= tr or i + tr >= H or j + tr >= W:
                        continue
                    cur = mid[0][i, j]
                    if cur < threshold:
                        continue
                    ok = True
                    for di in (-1, 0, 1):
                        for dj in (-1, 0, 1):
                            if top[0][i + di, j + dj] >= cur or bot[0][i + di, j + dj] >= cur:
                                ok = False
                            if (di or dj) and mid[0][i + di, j + dj] >= cur:
                                ok = False
                    if ok:
                        pts.append({
                            "x": j, "y": i, "scale": mid[3],
                            "sign": int(mid[1][i, j]),
                            "desc": _descriptor_scalar(S, j, i, mid[3]),
                        })
    return pts


def _bumpy_image(h, w, seed, nblobs=12):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(nblobs):
        cy = rng.integers(h // 4, 3 * h // 4)
        cx = rng.integers(w // 4, 3 * w // 4)
        s = rng.uniform(1.5, 4.0)
        a = rng.uniform(0.5, 1.0) * rng.choice([-1, 1])
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img


# ----------------------------------------------------------------- tests

def test_rect_sum_matches_scalar_everywhere():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, size=(17, 13))
    S = M.integral_image(img)
    rows = np.arange(-5, 22)
    for w, h in [(1, 1), (3, 2), (9, 30), (13, 13)]:
        for col in range(-5, 18):
            got = M.rect_sum(S, rows, np.full_like(rows, col), w, h)
            exp = [_rect_sum_scalar(S, int(r), col, w, h) for r in rows]
            assert np.array_equal(got, np.array(exp))


def test_integral_image_brute_force():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 2, size=(9, 11))
    S = M.integral_image(img)
    for r, c, w, h in [(0, 0, 11, 9), (2, 3, 4, 5), (8, 10, 1, 1), (5, 5, 3, 1)]:
        exp = img[r:r + h, c:c + w].sum()
        got = M.rect_sum(S, np.array([r]), np.array([c]), w, h)[0]
        assert got == pytest.approx(exp, rel=1e-12)


def test_hessian_layer_matches_scalar():
    img = _bumpy_image(40, 36, seed=11)
    S = M.integral_image(img)
    layer = M._Layer(S, 1, 2)
    det, signs, radius, scale = _layer_scalar(S, 1, 2)
    assert layer.radius == radius and layer.scale == scale
    assert np.array_equal(layer.det, det)
    assert np.array_equal(layer.signs, signs)


def test_extract_matches_scalar_oracle():
    img = _bumpy_image(52, 48, seed=5)
    got = M.extract_feature_points(img, 1, 1, threshold=1e-8)
    exp = _extract_scalar(img, 1, 1, threshold=1e-8)
    assert got["x"].size == len(exp) > 0
    for i, p in enumerate(exp):
        assert got["x"][i] == p["x"] and got["y"][i] == p["y"]
        assert got["scale"][i] == p["scale"]
        assert got["sign"][i] == p["sign"]
        assert np.allclose(got["desc"][i], p["desc"], rtol=1e-12, atol=1e-12)


def test_translation_recovered():
    # image2 = image1 shifted by (dy=6, dx=4): every matched GCP must map
    # (x1, y1) -> (x1 - 4, y1 - 6) exactly (integer keypoint grid).
    dy, dx = 6, 4
    base = _bumpy_image(120, 120, seed=23, nblobs=40)
    img1 = base[dy:dy + 100, dx:dx + 100]
    img2 = base[0:100, 0:100]
    g = M.compute_matching_points(img1, img2, 1, 1, 1e-7, matching_threshold=1.0)
    assert len(g) >= 3
    assert np.array_equal(g[:, 2], g[:, 0] + dx)
    assert np.array_equal(g[:, 3], g[:, 1] + dy)


def test_match_empty_and_identity():
    flat = np.zeros((40, 40))
    kp = M.extract_feature_points(flat, 1, 1)
    assert kp["x"].size == 0
    assert M.match_feature_points(kp, kp) == []
    img = _bumpy_image(56, 56, seed=9)
    kp1 = M.extract_feature_points(img, 1, 1, 1e-7)
    matches = M.match_feature_points(kp1, kp1, matching_threshold=1.0)
    # Reference quirk (alg/gdal_simplesurf.cpp:460-474): the driving point
    # scans its own 0-distance first, pinning the running 2nd-nearest at 0,
    # so the FIRST point never passes `bestDist_2 > 0`; the other n-1 all
    # self-match at distance 0.
    assert len(matches) == kp1["x"].size - 1 > 0
    assert all(i == j and d == 0.0 for i, j, d in matches)


def test_geotransform_output():
    dyv, dxv = 6, 4
    base = _bumpy_image(72, 72, seed=23, nblobs=16)
    img1 = base[dyv:dyv + 56, dxv:dxv + 56]
    img2 = base[0:56, 0:56]
    gt = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    g = M.compute_matching_points(img1, img2, 1, 1, 1e-7, 1.0, geotransform2=gt)
    raw = M.compute_matching_points(img1, img2, 1, 1, 1e-7, 1.0)
    assert np.allclose(g[:, 2], 100.0 + 2.0 * raw[:, 2])
    assert np.allclose(g[:, 3], 500.0 - 2.0 * raw[:, 3])


def test_match_image_pairs_spark(spark):
    dy, dx = 6, 4
    base = _bumpy_image(72, 72, seed=23, nblobs=16)
    img1 = np.ascontiguousarray(base[dy:dy + 56, dx:dx + 56])
    img2 = np.ascontiguousarray(base[0:56, 0:56])
    rows = []
    for pid in (1, 2):
        rows.append((pid, 56, 56, img1.astype("<f8").tobytes(),
                     56, 56, img2.astype("<f8").tobytes()))
    df = spark.createDataFrame(rows, M.PAIR_SCHEMA)
    got = (
        M.match_image_pairs(df, 1, 1, 1e-7, 1.0)
        .orderBy("pair_id", "gcp_line", "gcp_pixel")
        .toPandas()
    )
    local = M.compute_matching_points(img1, img2, 1, 1, 1e-7, 1.0)
    assert len(got) == 2 * len(local) > 0
    one = got[got.pair_id == 1].reset_index(drop=True)
    exp = pd.DataFrame(local, columns=["gcp_pixel", "gcp_line", "gcp_x", "gcp_y", "dist"])
    exp = exp.sort_values(["gcp_line", "gcp_pixel"]).reset_index(drop=True)
    assert np.allclose(one[exp.columns].to_numpy(), exp.to_numpy())


def test_fit_pair_transforms(spark):
    """Registration pipeline: matched GCPs -> per-pair least-squares affine
    (gcps2wld analog).  A pure-shift pair must fit gt=(dx,1,0,dy,0,1) with
    zero residual; a scaled+shifted synthetic GCP set recovers its exact
    affine."""
    rows = []
    # pair 1: pure shift (+4, +6) — 5 GCPs
    for px, ln in [(10, 10), (30, 12), (18, 40), (44, 44), (25, 25)]:
        rows.append((1, float(px), float(ln), float(px + 4), float(ln + 6), 0.0))
    # pair 2: x' = 100 + 2 px - 0.5 ln ; y' = 50 + 0.25 px + 3 ln
    for px, ln in [(0, 0), (10, 0), (0, 10), (7, 13), (21, 5)]:
        rows.append((2, float(px), float(ln),
                     100 + 2 * px - 0.5 * ln, 50 + 0.25 * px + 3 * ln, 0.0))
    # pair 3: too few points — dropped
    rows.append((3, 1.0, 1.0, 2.0, 2.0, 0.0))
    gcps = spark.createDataFrame(
        rows, "pair_id long, gcp_pixel double, gcp_line double, gcp_x double, gcp_y double, dist double"
    )
    got = M.fit_pair_transforms(gcps).orderBy("pair_id").toPandas()
    assert got.pair_id.tolist() == [1, 2]
    p1 = got.iloc[0]
    assert np.allclose([p1.gt0, p1.gt1, p1.gt2, p1.gt3, p1.gt4, p1.gt5],
                       [4, 1, 0, 6, 0, 1], atol=1e-9)
    assert p1.rms < 1e-9 and p1.n_gcps == 5
    p2 = got.iloc[1]
    assert np.allclose([p2.gt0, p2.gt1, p2.gt2, p2.gt3, p2.gt4, p2.gt5],
                       [100, 2, -0.5, 50, 0.25, 3], atol=1e-8)
    assert p2.rms < 1e-8


def test_match_then_fit_end_to_end(spark):
    """correlate -> fit: the fitted affine of a shifted image pair is the
    translation itself."""
    dy, dx = 6, 4
    # 8-bit-style integer-valued image (the reference only allows eightbit
    # input, gdalmatching.cpp:214): box sums are then exact in float64, so
    # true matches have distance exactly 0 and survive the reference's
    # default 0.015 normalized-distance prune.
    base = np.round(_bumpy_image(120, 120, seed=23, nblobs=40) * 100)
    img1 = np.ascontiguousarray(base[dy:dy + 100, dx:dx + 100])
    img2 = np.ascontiguousarray(base[0:100, 0:100])
    df = spark.createDataFrame(
        [(1, 100, 100, img1.astype("<f8").tobytes(), 100, 100, img2.astype("<f8").tobytes())],
        M.PAIR_SCHEMA,
    )
    fit = M.fit_pair_transforms(M.match_image_pairs(df, 1, 1, 2e-4, 0.015)).toPandas()
    assert len(fit) == 1
    f = fit.iloc[0]
    assert np.allclose([f.gt0, f.gt1, f.gt2, f.gt3, f.gt4, f.gt5],
                       [dx, 1, 0, dy, 0, 1], atol=1e-8)
