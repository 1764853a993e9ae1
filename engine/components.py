"""Connected components over tile tables: the polygonize/sieve foundation.

GDAL's polygonize (alg/polygonize.cpp:495) and sieve filter
(alg/gdalsievefilter.cpp:133-185) both start from connected-component
labeling of equal-valued pixels (4-connectivity).  Distributed form:

1. **per-tile labeling** — pure-numpy two-pass row-run union-find inside a
   grouped UDF (no scipy in the runtime);
2. **cross-tile merge** — every tile emits its 4 boundary strips (value +
   local label per edge pixel, ~1.5% of tile bytes); the driver unions
   touching equal-valued labels across adjacent tiles (a tiny union-find
   over strip data) and broadcasts the local→global map;
3. **relabel + stats** — a second pass maps local labels to global
   component ids and aggregates per-component pixel counts and bounds.

Output: (component_id, value, pixel_count, min_gx, min_gy, max_gx, max_gy)
with deterministic component ids (the lexicographically smallest
(ty, tx, local_label) member).  Ring tracing to WKB polygons is the
documented next step (COVERAGE.md); counts/bounds already pin the
component structure exactly against a single-process oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .raster import TILE_SIZE, bytes_to_tile


class _UF:
    __slots__ = ("p",)

    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        root = x
        while p.setdefault(root, root) != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller tuple wins as root
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def label_tile(grid: np.ndarray, background: int = 0) -> np.ndarray:
    """4-connected labeling of equal-valued non-background pixels.

    Vectorized run-based union-find: every row-run gets a scan-ordered id
    (one ``cumsum``), vertical same-value pixel adjacencies reduce to
    unique run-id pairs (one boolean mask + ``np.unique``), a small
    union-find merges the pairs, and pointer-jumping compresses all runs
    to roots.  Labels are dense-ranked by root run id = first-appearance
    scan order — the same label assignment the original per-run python
    loop produced (pinned by test_label_vectorized_matches_reference),
    ~30× faster on dense tiles because no python executes per run.
    Returns int32 labels (0 = background).
    """
    H, W = grid.shape
    run_start = np.ones((H, W), dtype=bool)
    run_start[:, 1:] = grid[:, 1:] != grid[:, :-1]
    run_id = run_start.ravel().cumsum().reshape(H, W) - 1  # scan-ordered, row-unique
    R = int(run_id[-1, -1]) + 1
    nonbg = grid != background
    if not nonbg.any():
        return np.zeros((H, W), dtype=np.int32)
    vsame = (grid[1:, :] == grid[:-1, :]) & nonbg[1:, :] & nonbg[:-1, :]
    parent = np.arange(R, dtype=np.int64)
    if vsame.any():
        pairs = np.unique(
            np.stack([run_id[:-1, :][vsame], run_id[1:, :][vsame]], axis=1), axis=0
        )

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    # full compression by pointer jumping (O(log depth) vector passes)
    roots = parent
    while True:
        nxt = roots[roots]
        if np.array_equal(nxt, roots):
            break
        roots = nxt
    px_roots = roots[run_id[nonbg]]
    _, dense = np.unique(px_roots, return_inverse=True)
    labels = np.zeros((H, W), dtype=np.int32)
    labels[nonbg] = (dense + 1).astype(np.int32)
    return labels


_STRIP_SCHEMA = "tx long, ty long, side string, pos int, value long, label int"


def _strips_factory(background: int):
    """mapInPandas UDF emitting the 4 boundary strips (value + local label
    per edge pixel) of every tile — the cross-tile merge input (~1.5% of
    tile bytes)."""

    def _strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                g = bytes_to_tile(r.data)
                lab = label_tile(g, background)
                for side, vals, labs in (
                    ("top", g[0, :], lab[0, :]),        # faces tile ty+1 (its bottom row)
                    ("bottom", g[-1, :], lab[-1, :]),   # faces ty-1
                    ("left", g[:, 0], lab[:, 0]),
                    ("right", g[:, -1], lab[:, -1]),
                ):
                    nz = np.nonzero(labs)[0]
                    for p in nz:
                        rows.append((int(r.tx), int(r.ty), side, int(p), int(vals[p]), int(labs[p])))
            yield pd.DataFrame(rows, columns=["tx", "ty", "side", "pos", "value", "label"])

    return _strips


def _seam_uf_from_strips(strips: list):
    """(uf, by_edge) from collected boundary-strip rows: unions
    (ty, tx, local_label) keys of equal-valued touching pixels across tile
    seams.  THE single definition of the seam merge — shared by
    connected_components / sieve_filter / polygonize."""
    uf = _UF()
    by_edge: dict = {}
    for s in strips:
        by_edge.setdefault((s.tx, s.ty, s.side), {})[s.pos] = (s.value, s.label)
    for (tx, ty, side), cells in by_edge.items():
        if side == "top":
            other = by_edge.get((tx, ty + 1, "bottom"), {})
        elif side == "left":
            other = by_edge.get((tx - 1, ty, "right"), {})
        else:
            continue  # each seam processed once from one side
        for pos, (v, l) in cells.items():
            o = other.get(pos)
            if o and o[0] == v:
                uf.union((ty, tx, l), (ty + 1, tx, o[1]) if side == "top" else (ty, tx - 1, o[1]))
    for s in strips:
        uf.find((s.ty, s.tx, s.label))  # path-compress all strip keys
    return uf, by_edge


def build_seam_uf(src: DataFrame, background: int = 0) -> "_UF":
    """One-call form: collect strips (one scan) and build the union-find."""
    strips = src.mapInPandas(_strips_factory(background), _STRIP_SCHEMA).collect()
    return _seam_uf_from_strips(strips)[0]


def connected_components(tile_df: DataFrame, background: int = 0) -> DataFrame:
    """Distributed connected components over a (zoom, tx, ty, data) table.

    Returns (component_id string, value long, pixel_count long,
    min_gx, min_gy, max_gx, max_gy) in GLOBAL pixel coordinates
    (gx = tx*256+col, gy = raster row within the world grid, top-origin
    per-tile rows mapped via ty).
    """
    # pass 1: per-tile labeling + per-(tile,label) partial stats + strips
    stats_schema = (
        "tx long, ty long, label int, value long, pixel_count long, "
        "min_gx long, min_gy long, max_gx long, max_gy long"
    )

    def _label_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                g = bytes_to_tile(r.data)
                lab = label_tile(g, background)
                if lab.max() == 0:
                    continue
                flat_l = lab.ravel()
                nz = np.nonzero(flat_l)[0]
                ls = flat_l[nz]
                vals = g.ravel()[nz]
                rr, cc = np.divmod(nz, TILE_SIZE)
                gx = int(r.tx) * TILE_SIZE + cc
                # global y: row 0 of the tile is its TOP; larger ty = north
                gy = -(int(r.ty) * TILE_SIZE) + rr
                order = np.argsort(ls, kind="stable")
                uls, starts = np.unique(ls[order], return_index=True)
                bounds = np.append(starts, ls.shape[0])
                for gi in range(uls.shape[0]):
                    sel = order[starts[gi] : bounds[gi + 1]]
                    rows.append(
                        (
                            int(r.tx), int(r.ty), int(uls[gi]), int(vals[sel[0]]),
                            int(sel.size),
                            int(gx[sel].min()), int(gy[sel].min()),
                            int(gx[sel].max()), int(gy[sel].max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "tx", "ty", "label", "value", "pixel_count",
                    "min_gx", "min_gy", "max_gx", "max_gy",
                ],
            )

    src = tile_df.select("tx", "ty", "data")
    stats = src.mapInPandas(_label_stats, stats_schema)
    strips = src.mapInPandas(_strips_factory(background), _STRIP_SCHEMA).collect()  # small: edges only

    # driver-side union-find across tile seams
    uf, _ = _seam_uf_from_strips(strips)

    mapping = {}
    for s in strips:
        key = (s.ty, s.tx, s.label)
        root = uf.find(key)
        mapping[(s.tx, s.ty, s.label)] = f"{root[0]}_{root[1]}_{root[2]}"
    bc = tile_df.sparkSession.sparkContext.broadcast(mapping)

    @F.udf("string")
    def _global_id(tx, ty, label):
        return bc.value.get((tx, ty, label), f"{ty}_{tx}_{label}")

    return (
        stats.withColumn("component_id", _global_id("tx", "ty", "label"))
        .groupBy("component_id", "value")
        .agg(
            F.sum("pixel_count").alias("pixel_count"),
            F.min("min_gx").alias("min_gx"),
            F.min("min_gy").alias("min_gy"),
            F.max("max_gx").alias("max_gx"),
            F.max("max_gy").alias("max_gy"),
        )
    )


def sieve_components(tile_df: DataFrame, min_pixels: int, background: int = 0) -> DataFrame:
    """Sieve filter analog (alg/gdalsievefilter.cpp): report components
    smaller than ``min_pixels`` (the ones GDAL would merge into their largest
    neighbor).  Returns the small-component table; :func:`sieve_filter`
    applies the merge to pixel data."""
    comps = connected_components(tile_df, background)
    return comps.where(F.col("pixel_count") < min_pixels)


def merge_small_components(sizes: dict, values: dict, adj: dict, min_pixels: int) -> dict:
    """Driver-side sieve merge loop (GDALSieveFilter's polygon-merge,
    alg/gdalsievefilter.cpp:133-185): repeatedly merge each component
    smaller than ``min_pixels`` into its largest neighbor (ties → smallest
    component id) until stable.  Deterministic: small components processed
    ascending (size, id).  Returns {component_id: final_value}.

    This graph is tiny relative to pixel data (components ≪ pixels); at
    extreme component counts the same loop tree-reduces per tile-block first.
    """
    parent = {c: c for c in sizes}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    changed = True
    while changed:
        changed = False
        order = sorted((c for c in sizes if parent[c] == c and sizes[c] < min_pixels),
                       key=lambda c: (sizes[c], c))
        for c in order:
            if parent[c] != c or sizes[c] >= min_pixels:
                continue
            neigh = {find(n) for n in adj.get(c, ())} - {c}
            if not neigh:
                continue
            target = max(neigh, key=lambda n: (sizes[n], tuple(-x for x in _idnum(n))))
            parent[c] = target
            sizes[target] += sizes.pop(c)
            # fold adjacency of c into target
            a = adj.setdefault(target, set())
            a.update(adj.pop(c, ()))
            for n in list(a):
                rn = find(n)
                if rn == target:
                    a.discard(n)
                else:
                    adj.setdefault(rn, set()).add(target)
            changed = True
    return {c: values[find(c)] for c in values}


def _idnum(cid):
    """Sortable numeric form of a component id string 'ty_tx_label'."""
    return tuple(int(x) for x in cid.split("_"))


def sieve_filter(tile_df: DataFrame, min_pixels: int, background: int = 0) -> DataFrame:
    """GDALSieveFilter (alg/gdalsievefilter.cpp:133-185), full pixel rewrite:
    connected components below ``min_pixels`` take the value of their largest
    neighboring component (4-connect); background pixels are never rewritten
    and never absorb.  Returns a new (tx, ty, data) tile table.

    Plan: one labeling pass emits per-component stats + seam strips +
    within-tile adjacency; the driver merges the (small) component graph and
    broadcasts only the labels whose value changes; a second pass rewrites
    pixels.  Two mapInPandas scans + one broadcast — no pixel shuffle.
    """
    src = tile_df.select("tx", "ty", "data")
    adj_schema = "tx long, ty long, la int, lb int"

    def _adj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                g = bytes_to_tile(r.data)
                lab = label_tile(g, background)
                for a, b in ((lab[:, :-1], lab[:, 1:]), (lab[:-1, :], lab[1:, :])):
                    m = (a != b) & (a != 0) & (b != 0)
                    if m.any():
                        pairs = np.unique(
                            np.stack([np.minimum(a[m], b[m]), np.maximum(a[m], b[m])], axis=1), axis=0
                        )
                        rows.extend((int(r.tx), int(r.ty), int(x), int(y)) for x, y in pairs)
            yield pd.DataFrame(rows, columns=["tx", "ty", "la", "lb"])

    # component stats with global ids (reuses the seam union-find)
    comps = connected_components(tile_df, background).collect()
    sizes = {c.component_id: int(c.pixel_count) for c in comps}
    values = {c.component_id: int(c.value) for c in comps}

    # rebuild the local→global map exactly as connected_components did
    strip_rows = src.mapInPandas(_strips_factory(background), _STRIP_SCHEMA).collect()
    uf, by_edge = _seam_uf_from_strips(strip_rows)

    def gid(tx, ty, label):
        r = uf.find((ty, tx, label))
        return f"{r[0]}_{r[1]}_{r[2]}"

    # adjacency: within-tile pairs + cross-seam differing-value pairs
    adj: dict = {}

    def _edge(a, b):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

    for r in src.mapInPandas(_adj, adj_schema).collect():
        _edge(gid(r.tx, r.ty, r.la), gid(r.tx, r.ty, r.lb))
    for (tx, ty, side), cells in by_edge.items():
        if side == "top":
            other, om = by_edge.get((tx, ty + 1, "bottom"), {}), (tx, ty + 1)
        elif side == "left":
            other, om = by_edge.get((tx - 1, ty, "right"), {}), (tx - 1, ty)
        else:
            continue
        for pos, (v, l) in cells.items():
            o = other.get(pos)
            if o and o[0] != v:
                _edge(gid(tx, ty, l), gid(om[0], om[1], o[1]))

    final_value = merge_small_components(sizes, values, adj, min_pixels)
    # broadcast only the components whose value changes + the seam union-find
    # parents (labels are re-derived per tile at rewrite time)
    bc_final = tile_df.sparkSession.sparkContext.broadcast(
        ({k: v for k, v in final_value.items() if values.get(k) != v}, dict(uf.p))
    )

    def _rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        changed_vals, parents = bc_final.value

        def find(key):
            seen = []
            while parents.get(key, key) != key:
                seen.append(key)
                key = parents[key]
            return key

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                g = bytes_to_tile(r.data).copy()
                lab = label_tile(g, background)
                for ll in np.unique(lab[lab != 0]):
                    root = find((int(r.ty), int(r.tx), int(ll)))
                    cid = f"{root[0]}_{root[1]}_{root[2]}"
                    nv = changed_vals.get(cid)
                    if nv is not None:
                        g[lab == ll] = nv
                out.append((int(r.tx), int(r.ty), g.astype("<i4").tobytes()))
            yield pd.DataFrame(out, columns=["tx", "ty", "data"])

    return src.mapInPandas(_rewrite, "tx long, ty long, data binary")
