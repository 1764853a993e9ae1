"""Proximity (exact EDT), focal fill, and sieve pixel rewrite: distributed
3×3-gather results must equal the same kernel run on the mosaicked raster
(seam-exactness), and the EDT kernel must match brute force."""

import numpy as np
import pandas as pd
import pytest

from engine import components, proximity, raster

T = raster.TILE_SIZE


def _brute_edt(targets: np.ndarray, maxdist: float) -> np.ndarray:
    H, W = targets.shape
    ty, tx = np.nonzero(targets)
    out = np.full((H, W), np.inf)
    if ty.size:
        rr, cc = np.mgrid[0:H, 0:W]
        for y, x in zip(ty, tx):
            np.minimum(out, np.hypot(rr - y, cc - x), out=out)
    out[out > maxdist] = np.inf
    return out


def test_edt_matches_brute_force():
    rng = np.random.default_rng(5)
    for _ in range(4):
        targets = rng.random((60, 80)) < 0.01
        got = proximity.edt(targets, maxdist=25.0)
        exp = _brute_edt(targets, 25.0)
        assert np.allclose(np.nan_to_num(got, posinf=-1), np.nan_to_num(exp, posinf=-1))


def _tile_table(spark, grids: dict):
    """grids: {(tx, ty): 256x256 int array} → tile DataFrame."""
    pdf = pd.DataFrame(
        {
            "zoom": [3] * len(grids),
            "tx": [k[0] for k in grids],
            "ty": [k[1] for k in grids],
            "data": [raster.tile_to_bytes(g) for g in grids.values()],
        }
    )
    return spark.createDataFrame(pdf)


def _mosaic(grids: dict):
    txs = [k[0] for k in grids]
    tys = [k[1] for k in grids]
    tx0, ty1 = min(txs), max(tys)
    W = (max(txs) - tx0 + 1) * T
    H = (ty1 - min(tys) + 1) * T
    big = np.zeros((H, W), dtype=np.int64)
    for (tx, ty), g in grids.items():
        big[(ty1 - ty) * T : (ty1 - ty + 1) * T, (tx - tx0) * T : (tx - tx0 + 1) * T] = g
    return big, tx0, ty1


@pytest.fixture(scope="module")
def sparse_grids():
    rng = np.random.default_rng(17)
    grids = {}
    for tx in (4, 5):
        for ty in (2, 3):
            g = np.zeros((T, T), dtype=np.int64)
            pts = rng.integers(0, T, (12, 2))
            g[pts[:, 0], pts[:, 1]] = 7
            grids[(tx, ty)] = g
    return grids


def test_proximity_distributed_matches_mosaic(spark, sparse_grids):
    grids = sparse_grids
    out = proximity.proximity(_tile_table(spark, grids), target_values=(7,), maxdist=40.0, nodata=-1.0)
    got = {(r.tx, r.ty): np.frombuffer(r.data, dtype="<f8").reshape(T, T) for r in out.collect()}
    assert set(got) == set(grids)
    big, tx0, ty1 = _mosaic(grids)
    exp_big = proximity.edt(big == 7, 40.0)
    exp_big[np.isinf(exp_big)] = -1.0
    for (tx, ty), arr in got.items():
        r0, c0 = (ty1 - ty) * T, (tx - tx0) * T
        exp = exp_big[r0 : r0 + T, c0 : c0 + T]
        assert np.allclose(arr, exp), (tx, ty)


def test_fill_nodata_distributed_matches_mosaic(spark):
    rng = np.random.default_rng(23)
    NODATA = -9999
    grids = {}
    for tx in (1, 2):
        for ty in (1, 2):
            g = rng.integers(1, 100, (T, T)).astype(np.int64)
            # nodata blobs, including one hugging the seam
            for _ in range(4):
                r, c = rng.integers(0, T - 12, 2)
                g[r : r + 12, c : c + 12] = NODATA
            g[:8, -8:] = NODATA  # corner blob crossing into neighbors
            grids[(tx, ty)] = g
    out = proximity.fill_nodata(_tile_table(spark, grids), nodata=NODATA, maxdist=16.0, smoothing=1)
    got = {(r.tx, r.ty): np.frombuffer(r.data, dtype="<f8").reshape(T, T) for r in out.collect()}
    big, tx0, ty1 = _mosaic(grids)
    # mosaic oracle: same kernel, whole raster (pad by nodata ≙ world edge)
    exp_big = proximity.fill_kernel(big, NODATA, 16.0, smoothing=1)
    for (tx, ty), arr in got.items():
        r0, c0 = (ty1 - ty) * T, (tx - tx0) * T
        exp = exp_big[r0 : r0 + T, c0 : c0 + T]
        assert np.allclose(arr, exp), (tx, ty)
    # every fillable pixel actually filled
    center = got[(1, 2)]
    assert (center == NODATA).sum() == 0


def test_sieve_filter_rewrites_small_components(spark):
    # one tile: 3-px blob (value 5) beside a 60-px bar (value 8) touching it,
    # plus an isolated small blob with only background neighbors (stays)
    g = np.zeros((T, T), dtype=np.int64)
    g[10, 0:60] = 8
    g[11, 0:3] = 5      # adjacent to the bar → absorbed into value 8
    g[100, 100:104] = 9  # isolated small blob, no non-background neighbor → stays
    df = _tile_table(spark, {(1, 1): g})
    out = proximity if False else components.sieve_filter(df, min_pixels=10)
    arr = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}[(1, 1)]
    assert (arr[11, 0:3] == 8).all()
    assert (arr[10, 0:60] == 8).all()
    assert (arr[100, 100:104] == 9).all()
    assert (arr == 5).sum() == 0


def test_sieve_filter_seam_component_survives(spark):
    # a component crossing the tile seam has total size 70 (> threshold) even
    # though each half is 35 — naive per-tile sieve would wrongly remove it
    a = np.zeros((T, T), dtype=np.int64)
    b = np.zeros((T, T), dtype=np.int64)
    a[50, T - 35 :] = 4
    b[50, :35] = 4
    # plus a genuinely small blob adjacent to a big one, crossing the seam
    a[200, T - 3 :] = 6   # 3 px at right edge of (1,1)
    b[200, :2] = 6        # 2 px at left edge of (2,1) → component size 5
    b[201, :60] = 2       # 60-px bar adjacent below in (2,1)
    df = _tile_table(spark, {(1, 1): a, (2, 1): b})
    out = components.sieve_filter(df, min_pixels=40)
    arrs = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}
    # the 70-px seam component survives with value 4
    assert (arrs[(1, 1)][50, T - 35 :] == 4).all()
    assert (arrs[(2, 1)][50, :35] == 4).all()
    # the 5-px value-6 seam component is absorbed by the 60-px value-2 bar
    assert (arrs[(1, 1)][200, T - 3 :] == 2).all()
    assert (arrs[(2, 1)][200, :2] == 2).all()


def test_sieve_filter_matches_mosaic_oracle(spark):
    """Distributed sieve == same merge semantics on the mosaic (random grid,
    distinct component sizes so tie-order can't diverge)."""
    # deterministic: 40 (big bar, small bar) couples, each small bar touching
    # exactly its own big bar, so merges are independent of processing order;
    # many bars cross the tile seam at column 256
    a = np.zeros((T, T), dtype=np.int64)
    b = np.zeros((T, T), dtype=np.int64)

    def _hbar(row, col0, length, val):
        c_end = col0 + length
        a[row, col0 : min(c_end, T)] = val
        if c_end > T:
            b[row, : c_end - T] = val

    for i in range(40):
        row = 6 * i + 2
        _hbar(row, 230, 26 + i, 1 + i % 5)       # big bar, length 26+i ≥ min_pixels
        _hbar(row + 1, 233, 1 + i % 8, 6 + i % 3)  # small bar under it, absorbed
    grids = {(0, 0): a, (1, 0): b}
    df = _tile_table(spark, grids)
    out = components.sieve_filter(df, min_pixels=25)
    got = {(r.tx, r.ty): raster.bytes_to_tile(r.data) for r in out.collect()}

    big, tx0, ty1 = _mosaic(grids)
    lab = components.label_tile(big)
    sizes, values, adj = {}, {}, {}
    for l in np.unique(lab[lab != 0]):
        cid = f"0_0_{l}"
        sizes[cid] = int((lab == l).sum())
        values[cid] = int(big[lab == l][0])
    for a_, b_ in ((lab[:, :-1], lab[:, 1:]), (lab[:-1, :], lab[1:, :])):
        m = (a_ != b_) & (a_ != 0) & (b_ != 0)
        for x, y in np.unique(np.stack([a_[m], b_[m]], axis=1), axis=0):
            adj.setdefault(f"0_0_{x}", set()).add(f"0_0_{y}")
            adj.setdefault(f"0_0_{y}", set()).add(f"0_0_{x}")
    final = components.merge_small_components(sizes, values, adj, 25)
    exp_big = big.copy()
    for l in np.unique(lab[lab != 0]):
        exp_big[lab == l] = final[f"0_0_{l}"]
    for (tx, ty), arr in got.items():
        r0, c0 = (ty1 - ty) * T, (tx - tx0) * T
        assert (arr == exp_big[r0 : r0 + T, c0 : c0 + T]).all(), (tx, ty)


def test_proximity_ring2_matches_mosaic(spark):
    """maxdist > TILE_SIZE: the ring-2 gather must still equal the
    whole-mosaic EDT (targets reachable across two tile boundaries)."""
    grids = {}
    for tx in (0, 1, 2):
        for ty in (0, 1, 2):
            g = np.zeros((T, T), dtype=np.int64)
            grids[(tx, ty)] = g
    # single target in the center tile: distances in corner tiles exceed T
    grids[(1, 1)][128, 128] = 7
    md = 1.5 * T
    out = proximity.proximity(_tile_table(spark, grids), (7,), maxdist=md, nodata=-1.0)
    got = {(r.tx, r.ty): np.frombuffer(r.data, dtype="<f8").reshape(T, T) for r in out.collect()}
    big, tx0, ty1 = _mosaic(grids)
    exp_big = proximity.edt(big == 7, md)
    exp_big[np.isinf(exp_big)] = -1.0
    for (tx, ty), arr in got.items():
        r0, c0 = (ty1 - ty) * T, (tx - tx0) * T
        assert np.allclose(arr, exp_big[r0 : r0 + T, c0 : c0 + T]), (tx, ty)
    # sanity: a corner-tile pixel farther than T from the target is resolved
    corner = got[(0, 0)]
    assert corner[40, 40] > T or corner[40, 40] == -1.0
