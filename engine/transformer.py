"""Coordinate transformer chain: GCP polynomial / TPS / approximate.

The reference's transformer stack (alg/gdaltransformer.cpp:974
GDALCreateGenImgProjTransformer — chains src→georef→dst;
:1262-1283 GCP polynomial order 1/2/3 via CRS_compute_georef_equations
(alg/gdal_crs.c), thin-plate-spline via VizGeorefSpline2D
(alg/gdal_tps.cpp), and the approximate transformer
GDALApproxTransform (:2584) that replaces exact per-pixel evaluation
with recursive scanline subdivision + linear interpolation under an
error bound).

Engine form: transformers are FIT ON THE DRIVER (GCP lists are tiny) and
applied as vectorized numpy closures on executors — a fitted transformer
is a broadcastable pure function (px, py arrays → x, y arrays), pluggable
into :func:`engine.warp.warp_custom` as the dst→src inverse map.

All solves are plain least squares / linear systems (numpy.linalg) — the
polynomial basis and TPS kernel (r²·ln r) match the reference's.
"""

from __future__ import annotations

import math

import numpy as np


def _poly_terms(order: int):
    """Exponent pairs of the 2-D polynomial basis for ``order`` 1..3 —
    the CRS_georef term sets (alg/gdal_crs.c): 3 / 6 / 10 coefficients."""
    if order not in (1, 2, 3):
        raise ValueError("GCP polynomial order must be 1, 2 or 3")
    return [(i, j) for s in range(order + 1) for i in range(s + 1) for j in (s - i,)]


def _poly_design(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    return np.stack([(x ** i) * (y ** j) for i, j in _poly_terms(order)], axis=1)


class GCPPolynomialTransformer:
    """GDALCreateGCPTransformer (alg/gdaltransformer.cpp:1262;
    alg/gdal_crs.c): least-squares polynomial fit of GCPs
    (pixel, line) ↔ (x, y), order 1 (affine), 2 or 3.  Both directions
    fitted, like the reference's forward+reverse equation sets."""

    def __init__(self, gcps, order: int = 1):
        """``gcps``: iterable of (pixel, line, x, y)."""
        g = np.asarray(list(gcps), dtype=np.float64)
        need = len(_poly_terms(order))
        if g.shape[0] < need:
            raise ValueError(f"order {order} needs ≥ {need} GCPs, got {g.shape[0]}")
        self.order = order
        A = _poly_design(g[:, 0], g[:, 1], order)
        self.fwd_x, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
        self.fwd_y, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
        B = _poly_design(g[:, 2], g[:, 3], order)
        self.inv_x, *_ = np.linalg.lstsq(B, g[:, 0], rcond=None)
        self.inv_y, *_ = np.linalg.lstsq(B, g[:, 1], rcond=None)

    def forward(self, px, py):
        A = _poly_design(np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64), self.order)
        return A @ self.fwd_x, A @ self.fwd_y

    def inverse(self, x, y):
        B = _poly_design(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64), self.order)
        return B @ self.inv_x, B @ self.inv_y


class TPSTransformer:
    """Thin-plate-spline GCP transformer (GDALCreateTPSTransformer,
    alg/gdal_tps.cpp / VizGeorefSpline2D): kernel U(r) = r²·ln(r²),
    exact interpolation at every GCP, affine + radial terms.  Both
    directions fitted."""

    def __init__(self, gcps):
        g = np.asarray(list(gcps), dtype=np.float64)
        if g.shape[0] < 3:
            raise ValueError("TPS needs ≥ 3 GCPs")
        self._fwd = self._fit(g[:, 0], g[:, 1], g[:, 2], g[:, 3])
        self._inv = self._fit(g[:, 2], g[:, 3], g[:, 0], g[:, 1])

    @staticmethod
    def _kernel(d2: np.ndarray) -> np.ndarray:
        # U(r) = r² ln r² (VizGeorefSpline2D base_func), U(0) = 0
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(d2 > 0, d2 * np.log(d2), 0.0)

    @classmethod
    def _fit(cls, sx, sy, tx, ty):
        n = sx.shape[0]
        d2 = (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
        K = cls._kernel(d2)
        P = np.stack([np.ones(n), sx, sy], axis=1)
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n, 0] = tx
        rhs[:n, 1] = ty
        coef, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        return (sx.copy(), sy.copy(), coef)

    @staticmethod
    def _apply(fit, x, y):
        sx, sy, coef = fit
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        d2 = (x[:, None] - sx[None, :]) ** 2 + (y[:, None] - sy[None, :]) ** 2
        K = TPSTransformer._kernel(d2)
        n = sx.shape[0]
        out = K @ coef[:n] + coef[n] + np.outer(x, coef[n + 1]) + np.outer(y, coef[n + 2])
        return out[:, 0], out[:, 1]

    def forward(self, px, py):
        return self._apply(self._fwd, px, py)

    def inverse(self, x, y):
        return self._apply(self._inv, x, y)


def _rpc_poly(coef, P, L, H):
    """RPC00B 20-term cubic polynomial (the standard NITF/GDAL ordering,
    alg/gdal_rpc.cpp RPCEvaluate): 1, L, P, H, LP, LH, PH, L², P², H²,
    PLH, L³, LP², LH², L²P, P³, PH², L²H, P²H, H³."""
    c = coef
    return (
        c[0] + c[1] * L + c[2] * P + c[3] * H + c[4] * L * P + c[5] * L * H
        + c[6] * P * H + c[7] * L * L + c[8] * P * P + c[9] * H * H
        + c[10] * P * L * H + c[11] * L ** 3 + c[12] * L * P * P + c[13] * L * H * H
        + c[14] * L * L * P + c[15] * P ** 3 + c[16] * P * H * H + c[17] * L * L * H
        + c[18] * P * P * H + c[19] * H ** 3
    )


class RPCTransformer:
    """Rational Polynomial Coefficient transformer
    (GDALCreateRPCTransformer, alg/gdal_rpc.cpp): forward maps
    (lon, lat, height) → (pixel, line) via the normalized 20-term rational
    polynomials; inverse iterates the forward model (the reference's
    RPCTransformPoint reverse iteration) until the pixel residual drops
    below ``tol`` or ``max_iter``.

    ``rpc``: dict with the standard keys LINE_OFF/LINE_SCALE, SAMP_OFF/
    SAMP_SCALE, LAT_OFF/LAT_SCALE, LONG_OFF/LONG_SCALE, HEIGHT_OFF/
    HEIGHT_SCALE and the four 20-float lists LINE_NUM_COEFF,
    LINE_DEN_COEFF, SAMP_NUM_COEFF, SAMP_DEN_COEFF.
    """

    def __init__(self, rpc: dict, tol: float = 1e-10, max_iter: int = 20):
        self.r = {k: (np.asarray(v, dtype=np.float64) if isinstance(v, (list, tuple)) else float(v))
                  for k, v in rpc.items()}
        self.tol = tol
        self.max_iter = max_iter

    def forward(self, lon, lat, height=0.0):
        r = self.r
        P = (np.asarray(lat, dtype=np.float64) - r["LAT_OFF"]) / r["LAT_SCALE"]
        L = (np.asarray(lon, dtype=np.float64) - r["LONG_OFF"]) / r["LONG_SCALE"]
        H = (np.asarray(height, dtype=np.float64) - r["HEIGHT_OFF"]) / r["HEIGHT_SCALE"]
        samp = _rpc_poly(r["SAMP_NUM_COEFF"], P, L, H) / _rpc_poly(r["SAMP_DEN_COEFF"], P, L, H)
        line = _rpc_poly(r["LINE_NUM_COEFF"], P, L, H) / _rpc_poly(r["LINE_DEN_COEFF"], P, L, H)
        return samp * r["SAMP_SCALE"] + r["SAMP_OFF"], line * r["LINE_SCALE"] + r["LINE_OFF"]

    def inverse(self, samp, line, height=0.0):
        """(pixel, line) → (lon, lat) by Newton-ish iteration with a
        numerically estimated local Jacobian (alg/gdal_rpc.cpp reverse)."""
        r = self.r
        samp = np.asarray(samp, dtype=np.float64)
        line = np.asarray(line, dtype=np.float64)
        lon = np.full(samp.shape, r["LONG_OFF"])
        lat = np.full(samp.shape, r["LAT_OFF"])
        dl = 1e-6 * max(abs(r["LONG_SCALE"]), 1e-9)
        dp = 1e-6 * max(abs(r["LAT_SCALE"]), 1e-9)
        for _ in range(self.max_iter):
            s0, l0 = self.forward(lon, lat, height)
            rs = samp - s0
            rl = line - l0
            if max(np.abs(rs).max(initial=0), np.abs(rl).max(initial=0)) < self.tol:
                break
            s_dl, l_dl = self.forward(lon + dl, lat, height)
            s_dp, l_dp = self.forward(lon, lat + dp, height)
            j00 = (s_dl - s0) / dl   # ∂samp/∂lon
            j01 = (s_dp - s0) / dp   # ∂samp/∂lat
            j10 = (l_dl - l0) / dl
            j11 = (l_dp - l0) / dp
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            lon = lon + (rs * j11 - rl * j01) / det
            lat = lat + (rl * j00 - rs * j10) / det
        return lon, lat


def approx_transform(exact_fn, x: np.ndarray, y: np.ndarray, max_error: float = 0.125):
    """GDALApproxTransform (alg/gdaltransformer.cpp:2584) over one
    scanline-like point run: transform the two endpoints (and midpoint)
    exactly; if the midpoint's linear interpolation errs beyond
    ``max_error``, recurse on each half, else interpolate the span.
    Vectorized per span; exact-call count is O(log) in the usual smooth
    case — the same contract the reference's warper relies on."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.shape[0]
    ox = np.empty(n)
    oy = np.empty(n)
    done = np.zeros(n, dtype=bool)

    def solve(i0: int, i1: int, fx0, fy0, fx1, fy1):
        # endpoints already transformed
        ox[i0], oy[i0] = fx0, fy0
        ox[i1], oy[i1] = fx1, fy1
        done[i0] = done[i1] = True
        if i1 - i0 < 2:
            return
        im = (i0 + i1) // 2
        fxm, fym = exact_fn(x[im : im + 1], y[im : im + 1])
        fxm, fym = float(fxm[0]), float(fym[0])
        # probe the midpoint AND both quarter points (the reference checks
        # the middle sample; the extra probes guard against periodic
        # transforms aliasing the single check)
        probes = sorted({im, (i0 + im) // 2, (im + i1) // 2} - {i0, i1})
        pex, pey = exact_fn(x[probes], y[probes])
        tt = (np.asarray(probes) - i0) / (i1 - i0)
        lx = fx0 + tt * (fx1 - fx0)
        ly = fy0 + tt * (fy1 - fy0)
        if max(np.abs(lx - pex).max(), np.abs(ly - pey).max()) > max_error:
            solve(i0, im, fx0, fy0, fxm, fym)
            solve(im, i1, fxm, fym, fx1, fy1)
        else:
            # whole span linear (probe checks passed — the acceptance rule
            # of gdaltransformer.cpp ApproxTransform, hardened)
            idx = np.arange(i0 + 1, i1)
            tt = (idx - i0) / (i1 - i0)
            ox[idx] = fx0 + tt * (fx1 - fx0)
            oy[idx] = fy0 + tt * (fy1 - fy0)
            for k, p in enumerate(probes):
                ox[p], oy[p] = float(pex[k]), float(pey[k])
            done[i0 + 1 : i1] = True

    if n == 1:
        fx, fy = exact_fn(x, y)
        return np.asarray(fx), np.asarray(fy)
    fx0, fy0 = exact_fn(x[:1], y[:1])
    fx1, fy1 = exact_fn(x[-1:], y[-1:])
    solve(0, n - 1, float(fx0[0]), float(fy0[0]), float(fx1[0]), float(fy1[0]))
    assert done.all()
    return ox, oy


class GeolocArrayTransformer:
    """Geolocation-array (swath) transformer — the GDALCreateGeoLocTransformer
    analog (alg/gdalgeoloc.cpp; registered in the alg/gdaltransformer.cpp:974
    chain).  Per-cell longitude/latitude arrays define pixel→georef.

    Forward is the reference's clamped-anchor bilinear over the geoloc
    arrays (alg/gdalgeoloc.cpp:940-1006) with linear extrapolation past the
    borders (the reference degrades to 1-D interpolation on the far edges;
    inside the grid the two agree exactly).  The inverse re-expresses the
    reference's scatter + 8-neighbor hole-fill backmap (:209) as a numpy
    grid seed followed by Newton refinement against the bilinear forward —
    sub-pixel exact for smooth swaths where the reference's 2.0-era backmap
    answer is quantized to backmap-cell resolution.  Any nodata corner in
    the interpolation patch propagates NaN (the reference's HUGE_VAL
    failure flag).

    ``geo_x``/``geo_y``: 2-D arrays (line, pixel) of georef coordinates.
    ``pixel_offset``/``line_offset``/``pixel_step``/``line_step``: the
    PIXEL_OFFSET/LINE_OFFSET/PIXEL_STEP/LINE_STEP geolocation metadata
    (geoloc row/col ``g`` covers raster pixel ``offset + g*step``).
    """

    def __init__(self, geo_x, geo_y, pixel_offset: float = 0.0,
                 line_offset: float = 0.0, pixel_step: float = 1.0,
                 line_step: float = 1.0, nodata: float | None = None,
                 oversample: float = 1.3, fill_iters: int = 3,
                 newton_iters: int = 8):
        gx = np.asarray(geo_x, dtype=np.float64)
        gy = np.asarray(geo_y, dtype=np.float64)
        if gx.shape != gy.shape or gx.ndim != 2 or min(gx.shape) < 2:
            raise ValueError("geo_x/geo_y must be equal-shape 2-D arrays, >=2 per axis")
        if nodata is not None:
            bad = gx == nodata
            gx = np.where(bad, np.nan, gx)
            gy = np.where(bad, np.nan, gy)
        self.gx, self.gy = gx, gy
        self.po, self.lo = float(pixel_offset), float(line_offset)
        self.ps, self.ls = float(pixel_step), float(line_step)
        self.newton_iters = int(newton_iters)
        self._build_backmap(float(oversample), int(fill_iters))

    # -- forward: raster pixel -> georef ---------------------------------
    def _bilinear(self, gp: np.ndarray, gl: np.ndarray):
        h, w = self.gx.shape
        ix = np.clip(np.floor(gp).astype(np.int64), 0, w - 2)
        iy = np.clip(np.floor(gl).astype(np.int64), 0, h - 2)
        fx = gp - ix
        fy = gl - iy
        out = []
        for a in (self.gx, self.gy):
            a00 = a[iy, ix]
            a01 = a[iy, ix + 1]
            a10 = a[iy + 1, ix]
            a11 = a[iy + 1, ix + 1]
            top = a00 + fx * (a01 - a00)
            bot = a10 + fx * (a11 - a10)
            out.append(top + fy * (bot - top))
        return out[0], out[1]

    def forward(self, px, py):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gp = (px - self.po) / self.ps
        gl = (py - self.lo) / self.ls
        return self._bilinear(gp, gl)

    # -- backmap seed grid (vectorized scatter + hole fill) --------------
    def _build_backmap(self, oversample: float, fill_iters: int) -> None:
        h, w = self.gx.shape
        valid = ~(np.isnan(self.gx) | np.isnan(self.gy))
        if not valid.any():
            raise ValueError("geolocation arrays are entirely nodata")
        vx, vy = self.gx[valid], self.gy[valid]
        minx, maxx = float(vx.min()), float(vx.max())
        miny, maxy = float(vy.min()), float(vy.max())
        span = max((maxx - minx) * (maxy - miny), 1e-300)
        psz = math.sqrt(span / (w * h * oversample))
        psz = max(psz, 1e-12)
        bw = int((maxx - minx) / psz + 1) + 1
        bh = int((maxy - miny) / psz + 1) + 1
        self._bm_minx = minx - psz / 2.0
        self._bm_maxy = maxy + psz / 2.0
        self._bm_psz = psz
        bmx = np.full((bh, bw), np.nan)
        bmy = np.full((bh, bw), np.nan)
        gl, gp = np.nonzero(valid)
        cx = ((self.gx[gl, gp] - self._bm_minx) / psz).astype(np.int64)
        cy = ((self._bm_maxy - self.gy[gl, gp]) / psz).astype(np.int64)
        keep = (cx >= 0) & (cy >= 0) & (cx < bw) & (cy < bh)
        bmx[cy[keep], cx[keep]] = self.po + gp[keep] * self.ps
        bmy[cy[keep], cx[keep]] = self.lo + gl[keep] * self.ls
        for _ in range(fill_iters):
            hole = np.isnan(bmx)
            if not hole.any():
                break
            sx = np.zeros_like(bmx)
            sy = np.zeros_like(bmy)
            cnt = np.zeros_like(bmx)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    shx = np.full_like(bmx, np.nan)
                    ys = slice(max(dy, 0), bh + min(dy, 0))
                    yd = slice(max(-dy, 0), bh + min(-dy, 0))
                    xs = slice(max(dx, 0), bw + min(dx, 0))
                    xd = slice(max(-dx, 0), bw + min(-dx, 0))
                    shx[yd, xd] = bmx[ys, xs]
                    shy = np.full_like(bmy, np.nan)
                    shy[yd, xd] = bmy[ys, xs]
                    ok = ~np.isnan(shx)
                    sx[ok] += shx[ok]
                    sy[ok] += shy[ok]
                    cnt[ok] += 1.0
            fill = hole & (cnt > 0)
            bmx[fill] = sx[fill] / cnt[fill]
            bmy[fill] = sy[fill] / cnt[fill]
        self._bmx, self._bmy = bmx, bmy

    # -- inverse: georef -> raster pixel ---------------------------------
    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        bh, bw = self._bmx.shape
        cx = np.clip(((x - self._bm_minx) / self._bm_psz).astype(np.int64), 0, bw - 1)
        cy = np.clip(((self._bm_maxy - y) / self._bm_psz).astype(np.int64), 0, bh - 1)
        px = self._bmx[cy, cx]
        py = self._bmy[cy, cx]
        ok = ~(np.isnan(px) | np.isnan(py) | np.isnan(x) | np.isnan(y))
        px = np.where(ok, px, np.nan)
        py = np.where(ok, py, np.nan)
        # Newton refinement on the bilinear forward; Jacobian by central
        # differences at half-step (exact for the piecewise-bilinear map
        # away from cell seams, ample inside them)
        hx = 0.5 * abs(self.ps)
        hy = 0.5 * abs(self.ls)
        for _ in range(self.newton_iters):
            fx, fy = self.forward(px, py)
            ex = fx - x
            ey = fy - y
            fxp, fyp = self.forward(px + hx, py)
            fxm, fym = self.forward(px - hx, py)
            a = (fxp - fxm) / (2 * hx)
            c = (fyp - fym) / (2 * hx)
            fxp, fyp = self.forward(px, py + hy)
            fxm, fym = self.forward(px, py - hy)
            b = (fxp - fxm) / (2 * hy)
            d = (fyp - fym) / (2 * hy)
            det = a * d - b * c
            with np.errstate(divide="ignore", invalid="ignore"):
                dx = np.where(np.abs(det) > 1e-300, (d * ex - b * ey) / det, 0.0)
                dy = np.where(np.abs(det) > 1e-300, (a * ey - c * ex) / det, 0.0)
            px = px - dx
            py = py - dy
        return px, py


# ---------------------------------------------------------------------------
# gdaltransform analog: DataFrame-level point transform
# ---------------------------------------------------------------------------


def transform_points_df(df, fn, x_col="x", y_col="y",
                        out_x="x_out", out_y="y_out", inverse=False):
    """The ``gdaltransform`` CLI analog (apps/gdaltransform.cpp): push a
    point table through any fitted transformer chain.

    ``fn`` is either a vectorized callable ``(x, y) -> (x', y')`` (a
    closure from this module, :mod:`engine.srs`, or
    :func:`approx_transform` partials) or an object with
    ``forward``/``inverse`` methods (LCC/Albers/GCP/TPS/RPC/geoloc
    transformers); ``inverse=True`` selects the inverse direction, the
    CLI's ``-i`` flag.  The fitted transformer is a small pure closure
    captured in the UDF (the reference clones transformers per thread,
    alg/gdalwarpkernel.cpp:255-260 — per-Arrow-batch application is the
    executor-side equivalent), so the op is a shuffle-free mapInPandas:
    scales as a pure map at any row count.  Input rows with non-finite
    coordinates propagate NaN, matching the reference's failed-transform
    marker semantics.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if hasattr(fn, "forward"):
        call = fn.inverse if inverse else fn.forward
    elif inverse:
        raise ValueError("inverse=True needs an object with an .inverse method")
    else:
        call = fn

    # out columns replace same-named input columns rather than duplicating
    in_fields = [f for f in df.schema.fields if f.name not in (out_x, out_y)]
    schema = StructType(
        in_fields + [StructField(out_x, DoubleType()), StructField(out_y, DoubleType())]
    )
    names = [f.name for f in in_fields]

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            if len(xs):
                ox, oy = call(xs, ys)
            else:
                ox, oy = xs, ys
            out = pdf[names].copy()
            out[out_x] = np.asarray(ox, dtype=np.float64)
            out[out_y] = np.asarray(oy, dtype=np.float64)
            yield out

    return df.mapInPandas(_apply, schema)


def transform_geoloc_bands(df, fn, inverse: bool = False):
    """GDALTransformGeolocations analog (alg/gdaltransformgeolocs.cpp:63-150):
    run a spatial transformer over the VALUES of X/Y(/Z) geolocation bands
    and write the transformed values back — the reference reads each row of
    the X/Y(/Z) bands as float64, calls the transformer once per row, and
    writes results back unconditionally (per-point success flags are not
    consulted for the write, :125-137).

    Tile-table form: ``df`` has (zoom, tx, ty, xdata, ydata[, zdata]) with
    little-endian float64 payloads; the transform is a pure per-tile map
    (mapInPandas, no shuffle — each tile is the distributed analog of the
    reference's row loop).  ``fn`` is any engine transformer (object with
    forward/inverse) or a callable (x, y) -> (x, y); Z, when present, is
    passed to 3-ary callables and otherwise carried through unchanged
    (closed-form engine transformers are 2-D; the reference zeroes a
    missing Z buffer, :121-123).
    """
    import inspect
    import pandas as pd
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StructField, StructType

    has_z = "zdata" in df.columns
    if hasattr(fn, "forward"):
        call = fn.inverse if inverse else fn.forward
    else:
        call = fn
    try:
        three_ary = len(inspect.signature(call).parameters) >= 3
    except (TypeError, ValueError):
        three_ary = False

    fields = [
        StructField("zoom", IntegerType()),
        StructField("tx", LongType()),
        StructField("ty", LongType()),
        StructField("xdata", BinaryType()),
        StructField("ydata", BinaryType()),
    ]
    if has_z:
        fields.append(StructField("zdata", BinaryType()))
    schema = StructType(fields)
    cols = [f.name for f in fields]

    def _tr(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                x = np.frombuffer(r.xdata, dtype="<f8").astype(np.float64)
                y = np.frombuffer(r.ydata, dtype="<f8").astype(np.float64)
                z = (
                    np.frombuffer(r.zdata, dtype="<f8").astype(np.float64)
                    if has_z
                    else np.zeros_like(x)
                )
                if three_ary:
                    res = call(x, y, z)
                    nx, ny = res[0], res[1]
                    nz = res[2] if len(res) > 2 else z
                else:
                    nx, ny = call(x, y)
                    nz = z
                row = [
                    int(r.zoom),
                    int(r.tx),
                    int(r.ty),
                    np.asarray(nx, dtype="<f8").tobytes(),
                    np.asarray(ny, dtype="<f8").tobytes(),
                ]
                if has_z:
                    row.append(np.asarray(nz, dtype="<f8").tobytes())
                out.append(tuple(row))
            yield pd.DataFrame(out, columns=cols)

    return df.select(*cols).mapInPandas(_tr, schema)
