"""Distributed layer algebra: Intersection / Union / SymDifference /
Identity / Update / Clip / Erase over polygon layers.

Reference: the OGRLayer algebra family (ogr/ogrsf_frmts/generic/
ogrlayer.cpp:1954 Intersection, :2220 Union, :2564 SymDifference, :2875
Identity, :3149 Update, :3424 Clip, :3660 Erase).  The reference runs an
index-nested-loop per input feature with an envelope prefilter and a GEOS
overlay per candidate pair.  Distributed re-expression:

1. **candidate generation** — both layers explode their bboxes to covering
   coarse lon/lat grid cells (``res`` degrees) → equi-join on ``cell``
   (the cell-keyed spatial join of SURVEY.md §4.5);
2. **owner-cell dedup** — a pair spanning k cells appears k times; the pair
   is kept only in the cell containing the lower-left corner of the bbox
   intersection, so no ``distinct`` shuffle is needed;
3. **refine** — the exact overlay kernel (:mod:`engine.clip`) runs per pair
   inside ``mapInPandas`` (pairwise ops) or grouped by input feature inside
   ``applyInPandas`` (Erase/Clip need all method matches of one input
   together — the same grouping the reference achieves by its per-input
   inner loop, :2028-2054).

Result schema follows the reference: concat of both layers' id fields;
non-empty, dimension-preserving results only (area > 0, ogrlayer.cpp:
2038-2054).  Geometry out is an exact-cover convex dissection
(see engine/clip.py module doc) serialized as WKB MultiPolygon.

Layer input contract: DataFrame (id_col int, geom_wkb binary) — bbox
columns are derived if absent.  Polygons may carry interior rings (holes
bridge-cut into the exterior before triangulation).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from . import clip, geom

WORLD_X0, WORLD_Y0 = -180.0, -90.0


def _parts(wkb: bytes):
    """WKB → list of polygon parts, each [exterior, hole, ...] — holes via
    bridge-cut triangulation, MultiPolygon members as disjoint parts."""
    return geom.polygon_parts(wkb)


_TRIS_CACHE: dict = {}


def _parts_tris(wkb: bytes) -> list:
    """Memoized per-executor triangulation of a polygon WKB → list of
    PreTriangulated covers (one per MultiPolygon part).  Method-layer
    polygons repeat across thousands of candidate pairs; re-triangulating
    per pair dominated the overlay refine profile."""
    key = bytes(wkb)
    hit = _TRIS_CACHE.get(key)
    if hit is not None:
        return hit
    out = [clip.PreTriangulated(clip._tris(part)) for part in _parts(key)]
    if len(_TRIS_CACHE) < 4096:
        _TRIS_CACHE[key] = out
    return out


def with_bbox(df: DataFrame, wkb_col: str = "geom_wkb") -> DataFrame:
    """Attach (minx,miny,maxx,maxy) sidecar columns (OGRGeometry::getEnvelope)."""
    if "minx" in df.columns:
        return df

    @F.pandas_udf("minx double, miny double, maxx double, maxy double")
    def _env(wkb: pd.Series) -> pd.DataFrame:
        rows = [geom.envelope(b) for b in wkb]
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

    return df.withColumn("_bb", _env(F.col(wkb_col))).select("*", "_bb.*").drop("_bb")


def _cover_cells(df: DataFrame, res: float, prefix: str) -> DataFrame:
    """Explode each row to the coarse grid cells covering its
    (``prefix``-named) bbox: cell = cx * 100000 + cy at ``res`` degrees."""
    cx0 = F.floor((F.col(f"{prefix}minx") - F.lit(WORLD_X0)) / F.lit(res)).cast("long")
    cx1 = F.floor((F.col(f"{prefix}maxx") - F.lit(WORLD_X0)) / F.lit(res)).cast("long")
    cy0 = F.floor((F.col(f"{prefix}miny") - F.lit(WORLD_Y0)) / F.lit(res)).cast("long")
    cy1 = F.floor((F.col(f"{prefix}maxy") - F.lit(WORLD_Y0)) / F.lit(res)).cast("long")
    return (
        df.withColumn("_cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("_cy", F.explode(F.sequence(cy0, cy1)))
        .withColumn("cell", F.col("_cx") * 100000 + F.col("_cy"))
        .drop("_cx", "_cy")
    )


def _prefixed(layer: DataFrame, id_out: str, wkb_out: str, prefix: str) -> DataFrame:
    return with_bbox(layer).select(
        F.col(layer.columns[0]).cast("int").alias(id_out),
        F.col("geom_wkb").alias(wkb_out),
        F.col("minx").alias(f"{prefix}minx"), F.col("miny").alias(f"{prefix}miny"),
        F.col("maxx").alias(f"{prefix}maxx"), F.col("maxy").alias(f"{prefix}maxy"),
    )


def pair_candidates(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """Candidate (input, method) pairs whose bboxes overlap, each pair
    exactly once (owner-cell rule).  Columns: (a_id, a_wkb, b_id, b_wkb)."""
    ae = _cover_cells(_prefixed(inp, "a_id", "a_wkb", "a_"), res, "a_")
    be = _cover_cells(_prefixed(method, "b_id", "b_wkb", "b_"), res, "b_")
    j = ae.join(be, on="cell")
    overlap = (
        (F.col("a_minx") <= F.col("b_maxx")) & (F.col("b_minx") <= F.col("a_maxx"))
        & (F.col("a_miny") <= F.col("b_maxy")) & (F.col("b_miny") <= F.col("a_maxy"))
    )
    # owner cell = cell of the bbox-intersection lower-left corner → a pair
    # spanning k cells is emitted exactly once, no distinct shuffle needed
    ox = F.greatest(F.col("a_minx"), F.col("b_minx"))
    oy = F.greatest(F.col("a_miny"), F.col("b_miny"))
    owner = (
        F.floor((ox - F.lit(WORLD_X0)) / F.lit(res)).cast("long") * 100000
        + F.floor((oy - F.lit(WORLD_Y0)) / F.lit(res)).cast("long")
    )
    return j.where(overlap & (F.col("cell") == owner)).select("a_id", "a_wkb", "b_id", "b_wkb")


_PAIR_SCHEMA = "a_id int, b_id int, n_pieces long, area double, geom_wkb binary"


def _overlay_pairs(pairs: DataFrame, op: str) -> DataFrame:
    """Pairwise intersection via mapInPandas — each candidate pair is
    independent, no further shuffle.

    MultiPolygon semantics: intersection sums over part pairs (parts are
    disjoint, so pieces can't overlap)."""
    assert op == "intersection"

    def _refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("a_id", "b_id", "n_pieces", "area", "geom_wkb")}
            for i in range(len(pdf)):
                a_parts = _parts(pdf["a_wkb"].iat[i])
                b_parts = _parts_tris(pdf["b_wkb"].iat[i])
                pieces = []
                for pa in a_parts:
                    for pb in b_parts:
                        pieces.extend(clip.intersection_pieces(pa, pb))
                if not pieces:
                    continue  # dimension-preserving only (ogrlayer.cpp:2038-2054)
                out["a_id"].append(pdf["a_id"].iat[i])
                out["b_id"].append(pdf["b_id"].iat[i])
                out["n_pieces"].append(len(pieces))
                out["area"].append(clip.pieces_area(pieces))
                out["geom_wkb"].append(geom.wkb_multipolygon([[p] for p in pieces]))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(_refine, _PAIR_SCHEMA)


def layer_intersection(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Intersection (ogrlayer.cpp:1954): one row per intersecting
    pair with the overlay geometry + area."""
    return _overlay_pairs(pair_candidates(inp, method, res), "intersection")


def layer_sym_difference(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::SymDifference (ogrlayer.cpp:2564): one row per input
    feature = that input minus ALL intersecting method features (b_id
    NULL), plus the symmetric method-side rows (a_id NULL) — the
    reference's per-feature difference loop, not a pairwise A△B.  Features
    intersecting nothing pass through whole (the loop is a no-op for
    them).  Reuses the Erase grouping in both directions."""
    left = layer_erase(inp, method, res).select(
        "a_id", F.lit(None).cast("int").alias("b_id"), "n_pieces", "area", "geom_wkb"
    )
    right = layer_erase(method, inp, res).select(
        F.lit(None).cast("int").alias("a_id"), F.col("a_id").alias("b_id"),
        "n_pieces", "area", "geom_wkb",
    )
    return left.unionByName(right)


_GROUP_SCHEMA = "a_id int, n_pieces long, area double, geom_wkb binary"


def _grouped_overlay(inp: DataFrame, method: DataFrame, res: float, op: str, keep_unmatched: bool) -> DataFrame:
    """Erase/Clip: every method match of one input must be subtracted from /
    intersected with that input *jointly* → group candidate pairs by input id
    (the reference's per-input inner loop, ogrlayer.cpp:3424,3660)."""
    fn = {"erase": clip.erase_pieces, "clip": clip.clip_pieces}[op]
    id_col = inp.columns[0]
    pairs = pair_candidates(inp, method, res)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        b_polys = [part for b in pdf["b_wkb"] for part in _parts_tris(b)]
        pieces = []
        for pa in _parts(pdf["a_wkb"].iat[0]):
            pieces.extend(fn(pa, b_polys))
        if not pieces:
            return pd.DataFrame({k: [] for k in ("a_id", "n_pieces", "area", "geom_wkb")})
        return pd.DataFrame(
            {
                "a_id": [pdf["a_id"].iat[0]],
                "n_pieces": [len(pieces)],
                "area": [clip.pieces_area(pieces)],
                "geom_wkb": [geom.wkb_multipolygon([[p] for p in pieces])],
            }
        )

    # explicit partition count: the overlay refine is Python-CPU-bound per
    # input feature; AQE's size coalesce would serialize it
    nparts = inp.sparkSession.sparkContext.defaultParallelism
    matched = pairs.repartition(nparts, "a_id").groupBy("a_id").applyInPandas(_apply, _GROUP_SCHEMA)
    if not keep_unmatched:
        return matched
    # inputs with no bbox-overlapping method feature pass through whole
    # (Erase emits them unchanged, ogrlayer.cpp:3700-3720 result copy)
    untouched = (
        inp.join(pairs.select(F.col("a_id").alias(id_col)).distinct(), on=id_col, how="left_anti")
        .select(
            F.col(id_col).cast("int").alias("a_id"),
            F.lit(1).cast("long").alias("n_pieces"),
            vector_area(F.col("geom_wkb")).alias("area"),
            F.col("geom_wkb"),
        )
    )
    return matched.unionByName(untouched)


def layer_erase(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Erase (ogrlayer.cpp:3660): input minus union of methods."""
    return _grouped_overlay(inp, method, res, "erase", keep_unmatched=True)


def layer_clip(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Clip (ogrlayer.cpp:3424): input ∩ union of methods; inputs
    outside every method polygon vanish."""
    return _grouped_overlay(inp, method, res, "clip", keep_unmatched=False)


def layer_identity(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Identity (ogrlayer.cpp:2875): intersection pairs + the
    leftover parts of inputs (method id NULL)."""
    inter = layer_intersection(inp, method, res)
    leftover = layer_erase(inp, method, res).select(
        "a_id", F.lit(None).cast("int").alias("b_id"), "n_pieces", "area", "geom_wkb"
    )
    return inter.unionByName(leftover)


def layer_union(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Union (ogrlayer.cpp:2220): intersection pairs + input
    leftovers (b_id NULL) + method leftovers (a_id NULL)."""
    inter = layer_intersection(inp, method, res)
    left = layer_erase(inp, method, res).select(
        "a_id", F.lit(None).cast("int").alias("b_id"), "n_pieces", "area", "geom_wkb"
    )
    right = layer_erase(method, inp, res).select(
        F.lit(None).cast("int").alias("a_id"), F.col("a_id").alias("b_id"),
        "n_pieces", "area", "geom_wkb",
    )
    return inter.unionByName(left).unionByName(right)


def layer_update(inp: DataFrame, method: DataFrame, res: float = 10.0) -> DataFrame:
    """OGRLayer::Update (ogrlayer.cpp:3149): method features whole + input
    leftovers outside the methods."""
    whole = method.select(
        F.lit(None).cast("int").alias("a_id"),
        F.col(method.columns[0]).cast("int").alias("b_id"),
        F.lit(1).cast("long").alias("n_pieces"),
        vector_area(F.col("geom_wkb")).alias("area"),
        F.col("geom_wkb"),
    )
    left = layer_erase(inp, method, res).select(
        "a_id", F.lit(None).cast("int").alias("b_id"), "n_pieces", "area", "geom_wkb"
    )
    return whole.unionByName(left)


@F.pandas_udf(DoubleType())
def vector_area(wkb: pd.Series) -> pd.Series:
    from .vector import shoelace_area_py

    return wkb.map(lambda b: shoelace_area_py(b) if b is not None else None)
