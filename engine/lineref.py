"""Linear referencing: the ogrlineref operator family (apps/ogrlineref.cpp:54-87).

Reference operations (GEOS/OGR project/interpolate based):
* **create** — mileposts every ``step`` along a line (OGRLineString +
  Project/Value);
* **get_pos / locate** — point → (measure along line, offset distance)
  (``Project``);
* **get_subline** — extract the part between two measures.

Pure-numpy polyline kernels (shapely-free), written operation-for-operation
so a SQL transcription over the segment table produces bit-identical
doubles: per segment ``t = clamp(((px-x1)·dx + (py-y1)·dy) / (dx²+dy²))``,
closest point ``(x1+t·dx, y1+t·dy)``, squared distance, argmin by
``(d², segment index)``, measure ``cum + t·seglen``.

Distributed form: the line is tiny (broadcast closure); points are the big
table → one vectorized pandas UDF, no shuffle.  Candidate pruning for very
long lines (many segments) would bucket segments by cell and cell-join —
same pattern as the kNN ring join; unnecessary below ~10⁴ segments because
the kernel is O(points × segments) vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Polyline:
    """Pre-computed segment arrays of an open polyline [(x,y), ...]."""

    def __init__(self, pts):
        p = np.asarray(pts, dtype=np.float64)
        if p.ndim != 2 or p.shape[0] < 2:
            raise ValueError("polyline needs >= 2 points")
        self.x1, self.y1 = p[:-1, 0], p[:-1, 1]
        self.dx, self.dy = np.diff(p[:, 0]), np.diff(p[:, 1])
        self.len2 = self.dx * self.dx + self.dy * self.dy
        self.seglen = np.sqrt(self.len2)
        self.cum = np.concatenate([[0.0], np.cumsum(self.seglen)])
        self.pts = p

    @property
    def length(self) -> float:
        return float(self.cum[-1])

    def project(self, px: np.ndarray, py: np.ndarray):
        """Vectorized many-points project → (measure, distance).
        Argmin over segments by (squared distance, segment index) — the
        deterministic tie rule a SQL transcription reproduces."""
        px = np.asarray(px, dtype=np.float64)[:, None]
        py = np.asarray(py, dtype=np.float64)[:, None]
        # zero-length segments (repeated consecutive vertices, common in
        # real GPS traces) would yield 0/0 = NaN and poison argmin — treat
        # them as their start point (t = 0)
        safe_len2 = np.where(self.len2 > 0, self.len2, 1.0)
        t = ((px - self.x1[None, :]) * self.dx[None, :] + (py - self.y1[None, :]) * self.dy[None, :]) / safe_len2[None, :]
        t = np.where(self.len2[None, :] > 0, np.clip(t, 0.0, 1.0), 0.0)
        cx = self.x1[None, :] + t * self.dx[None, :]
        cy = self.y1[None, :] + t * self.dy[None, :]
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        best = np.argmin(d2, axis=1)  # first minimum = smallest segment index
        rows = np.arange(px.shape[0])
        measure = self.cum[best] + t[rows, best] * self.seglen[best]
        return measure, np.sqrt(d2[rows, best])

    def interpolate(self, m: np.ndarray):
        """Measure(s) → point(s) on the line (clamped to [0, length]) —
        OGRLineString::Value."""
        m = np.clip(np.asarray(m, dtype=np.float64), 0.0, self.length)
        seg = np.clip(np.searchsorted(self.cum, m, side="right") - 1, 0, self.seglen.shape[0] - 1)
        t = np.where(self.seglen[seg] > 0, (m - self.cum[seg]) / np.where(self.seglen[seg] > 0, self.seglen[seg], 1.0), 0.0)
        return self.x1[seg] + t * self.dx[seg], self.y1[seg] + t * self.dy[seg]

    def substring(self, m0: float, m1: float) -> np.ndarray:
        """Sub-polyline between measures (ogrlineref get_subline)."""
        m0, m1 = sorted((max(0.0, m0), min(self.length, m1)))
        x0, y0 = self.interpolate(np.array([m0]))
        x1_, y1_ = self.interpolate(np.array([m1]))
        inner = (self.cum[1:-1] > m0) & (self.cum[1:-1] < m1)
        mids = self.pts[1:-1][inner]
        return np.vstack([[x0[0], y0[0]], mids, [x1_[0], y1_[0]]])

    def mileposts(self, step: float) -> np.ndarray:
        """Points every ``step`` from 0 to length inclusive (ogrlineref
        create)."""
        ms = np.arange(0.0, self.length + 1e-9, step)
        xs, ys = self.interpolate(ms)
        return np.stack([ms, xs, ys], axis=1)


def locate_points(points: DataFrame, line_pts, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Project every point onto the (broadcast) polyline → adds
    (measure, offset) columns.  One Arrow-vectorized UDF, no shuffle."""
    coords = [tuple(map(float, p)) for p in line_pts]

    @F.pandas_udf("measure double, offset double")
    def _proj(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        pl = Polyline(coords)
        m, d = pl.project(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
        return pd.DataFrame({"measure": m, "offset": d})

    return points.withColumn("_lr", _proj(F.col(lon_col), F.col(lat_col))).select("*", "_lr.*").drop("_lr")
