"""S2 cell index (engine/s2cells.py).

No S2 library exists in this runtime, so correctness rests on structural
properties that pin the public scheme: face anchors, leaf round-trips,
Hilbert-curve continuity (any sub-cell-table error breaks adjacency),
hierarchy/range nesting, and cross-parallelism determinism via Spark."""

import numpy as np
import pytest

from engine import s2cells
from engine import s2cells as S2


def _rand_lonlat(n, seed):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    # sample uniformly on the sphere so poles aren't over-weighted
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat


def test_face_center_anchors():
    # face centers: +x -> (0,0), +y -> (90,0), +z -> north pole,
    # -x -> (180,0), -y -> (-90,0), -z -> south pole
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = S2.lonlat_to_cell(lons, lats, level=0)
    faces = (ids >> np.uint64(61)).astype(int)
    assert faces.tolist() == [0, 1, 2, 3, 4, 5]
    # level-0 cell id is face<<61 | 1<<60
    exp = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | (np.uint64(1) << np.uint64(60))
    assert np.array_equal(ids, exp)


def test_leaf_roundtrip_accuracy():
    lon, lat = _rand_lonlat(20000, seed=1)
    leaf = S2.lonlat_to_cell(lon, lat, level=30)
    clon, clat = S2.cell_to_lonlat_center(leaf)
    # leaf cells are ~1e-7 deg; allow a few cells of slack plus lon wrap
    dlat = np.abs(clat - lat)
    dlon = np.abs((clon - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlat.max() < 1e-5
    assert dlon.max() < 1e-5


def test_leaf_ids_all_have_sentinel_and_level():
    lon, lat = _rand_lonlat(1000, seed=2)
    leaf = S2.lonlat_to_cell(lon, lat, 30)
    assert np.all((leaf & np.uint64(1)) == 1)
    assert np.all(S2.cell_level(leaf) == 30)
    p9 = S2.cell_parent(leaf, 9)
    assert np.all(S2.cell_level(p9) == 9)


def test_hilbert_continuity_within_face():
    """Consecutive leaf positions along the curve are ij-adjacent — the
    defining Hilbert property; any error in the orientation tables or the
    walk breaks it immediately."""
    rng = np.random.default_rng(3)
    # take random leaf cells, step to the next leaf id (+2), compare ij
    lon, lat = _rand_lonlat(4000, seed=4)
    leaf = S2.lonlat_to_cell(lon, lat, 30)
    nxt = leaf + np.uint64(2)
    # stay within the same face (skip the last cell of a face)
    same_face = (leaf >> np.uint64(61)) == (nxt >> np.uint64(61))
    f1, i1, j1 = S2._cell_to_face_ij(leaf[same_face])
    f2, i2, j2 = S2._cell_to_face_ij(nxt[same_face])
    di = np.abs(i1.astype(np.int64) - i2.astype(np.int64))
    dj = np.abs(j1.astype(np.int64) - j2.astype(np.int64))
    assert np.all(di + dj == 1), "curve must move one ij step per position"


def test_parent_containment_and_ranges():
    lon, lat = _rand_lonlat(5000, seed=5)
    leaf = S2.lonlat_to_cell(lon, lat, 30)
    for level in (4, 10, 16, 24):
        par = S2.cell_parent(leaf, level)
        lo, hi = S2.cell_range(par)
        assert np.all((leaf >= lo) & (leaf <= hi))
        # encoding directly at `level` equals the parent of the leaf
        direct = S2.lonlat_to_cell(lon, lat, level)
        assert np.array_equal(direct, par)
        # nested: parent's range contains the child's range
        chi = S2.cell_parent(leaf, level + 3)
        clo, chi_hi = S2.cell_range(chi)
        assert np.all((clo >= lo) & (chi_hi <= hi))


def test_level_cell_center_reencodes_into_itself():
    lon, lat = _rand_lonlat(3000, seed=6)
    for level in (8, 16):
        cell = S2.lonlat_to_cell(lon, lat, level)
        # cell+1 is a central leaf of the cell's range (the id sits exactly
        # mid-range with zeros below the sentinel); its center must
        # re-encode to the same cell
        clon, clat = S2.cell_to_lonlat_center(cell + np.uint64(1))
        again = S2.lonlat_to_cell(clon, clat, level)
        assert np.array_equal(again, cell)


def test_equal_cell_implies_proximity():
    """Two points in the same level-16 cell are close (cell diameter at
    level 16 is ~600 m); two far-apart points never share one."""
    lon, lat = _rand_lonlat(2000, seed=7)
    cell = S2.lonlat_to_cell(lon, lat, 16)
    order = np.argsort(cell, kind="stable")
    c = cell[order]
    lo_, la_ = lon[order], lat[order]
    same = c[1:] == c[:-1]
    if same.any():
        dlat = np.abs(la_[1:][same] - la_[:-1][same])
        dlon = np.abs((lo_[1:][same] - lo_[:-1][same] + 180) % 360 - 180)
        approx_km = np.hypot(dlat * 111.0, dlon * 111.0 * np.cos(np.radians(la_[1:][same])))
        assert approx_km.max() < 2.0


def test_with_s2_cell_spark(spark):
    import pandas as pd

    lon, lat = _rand_lonlat(500, seed=8)
    df = spark.createDataFrame(pd.DataFrame({"pid": np.arange(500), "lon": lon, "lat": lat}))
    out = S2.with_s2_cell(df, level=12).orderBy("pid").toPandas()
    leaf = S2.lonlat_to_cell(lon, lat, 30)
    cell = S2.cell_parent(leaf, 12)
    assert np.array_equal(out.s2_cell.to_numpy().view(np.uint64), cell)
    assert np.array_equal(out.s2_cell_leaf.to_numpy().view(np.uint64), leaf)
    # determinism across parallelism
    out4 = S2.with_s2_cell(df.repartition(4), level=12).orderBy("pid").toPandas()
    assert np.array_equal(out4.s2_cell.to_numpy(), out.s2_cell.to_numpy())


def _xyz(lon, lat):
    phi, th = np.radians(lat), np.radians(lon)
    return np.stack([np.cos(th) * np.cos(phi), np.sin(th) * np.cos(phi), np.sin(phi)], axis=-1)


def _offset_on_sphere(lon, lat, theta, seed):
    """Move each point ``theta`` radians along a random great-circle."""
    rng = np.random.default_rng(seed)
    p = _xyz(lon, lat)
    r = rng.normal(size=p.shape)
    t = r - (r * p).sum(-1, keepdims=True) * p
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    q = p * np.cos(theta) + t * np.sin(theta)
    return np.degrees(np.arctan2(q[:, 1], q[:, 0])), np.degrees(np.arcsin(np.clip(q[:, 2], -1, 1)))


def test_neighbor_closure_within_min_width():
    """Any point within min-cell-width of p lies in p's cell or one of its
    8 neighbors — the exact-candidate guarantee of the radius join.  Mixes
    uniform points with face-edge / pole / dateline hot spots so the
    cross-face wrap path is exercised."""
    level = 12
    width = S2.MIN_WIDTH_RAD / (1 << level)
    lon_u, lat_u = _rand_lonlat(4000, seed=10)
    hot_lon = np.concatenate([np.full(300, 179.9999), np.full(300, -135.0), np.full(300, 45.0)])
    hot_lat = np.concatenate([np.full(300, 0.0), np.full(300, 0.001), np.full(300, 89.99)])
    lon = np.concatenate([lon_u, hot_lon])
    lat = np.concatenate([lat_u, hot_lat])
    for frac, seed in ((0.999, 11), (0.5, 12), (0.05, 13)):
        qlon, qlat = _offset_on_sphere(lon, lat, width * frac, seed)
        c_p = S2.lonlat_to_cell(lon, lat, level)
        c_q = S2.lonlat_to_cell(qlon, qlat, level)
        allowed = np.concatenate([c_p[:, None], S2.cell_neighbors(c_p, level)], axis=1)
        ok = (allowed == c_q[:, None]).any(axis=1)
        assert ok.all(), f"frac={frac}: {np.count_nonzero(~ok)} escapes"


def test_neighbors_level_and_distinct_from_self():
    lon, lat = _rand_lonlat(2000, seed=14)
    for level in (4, 12, 20):
        cells = S2.lonlat_to_cell(lon, lat, level)
        nb = S2.cell_neighbors(cells, level)
        assert np.all(S2.cell_level(nb.ravel()) == level)
        assert np.all(nb != cells[:, None])
        # the 4 edge neighbors (offset columns 1,3,4,6) are pairwise distinct
        edge = nb[:, [1, 3, 4, 6]]
        se = np.sort(edge, axis=1)
        assert np.all(se[:, 1:] != se[:, :-1])


def test_radius_join_matches_bruteforce(spark):
    import pandas as pd

    rng = np.random.default_rng(15)
    # clusters straddling the dateline and the north pole + uniform noise:
    # exactly the points the planar quadkey path mis-joins without a seam split
    def mk(n, seed):
        lon_u, lat_u = _rand_lonlat(n, seed=seed)
        lon_d = rng.uniform(-180, -179.9, n // 4).tolist() + rng.uniform(179.9, 180, n // 4).tolist()
        lat_d = rng.uniform(-1, 1, n // 2)
        lon_p = rng.uniform(-180, 180, n // 4)
        lat_p = rng.uniform(89.9, 90, n // 4)
        return (
            np.concatenate([lon_u, np.array(lon_d), lon_p]),
            np.concatenate([lat_u, lat_d, lat_p]),
        )

    llon, llat = mk(400, 16)
    rlon, rlat = mk(400, 17)
    radius = 0.002  # rad (~12.7 km): pairs inside each hot spot
    left = spark.createDataFrame(
        pd.DataFrame({"lid": np.arange(llon.size), "lon": llon, "lat": llat})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"rid": np.arange(rlon.size), "lon": rlon, "lat": rlat})
    )
    got = S2.s2_radius_join(left, right, radius).select("lid", "rid_r").toPandas()
    got_pairs = set(zip(got.lid.tolist(), got.rid_r.tolist()))

    lp, rp = _xyz(llon, llat), _xyz(rlon, rlat)
    cosd = np.clip(lp @ rp.T, -1, 1)
    li, ri = np.nonzero(np.arccos(cosd) <= radius)
    exp_pairs = set(zip(li.tolist(), ri.tolist()))
    assert len(exp_pairs) > 100  # non-vacuous: the hot spots generate pairs
    assert got_pairs == exp_pairs


def test_sphere_coverage_all_faces():
    lon, lat = _rand_lonlat(20000, seed=9)
    faces = (S2.lonlat_to_cell(lon, lat, 0) >> np.uint64(61)).astype(int)
    assert set(np.unique(faces)) == {0, 1, 2, 3, 4, 5}
    # roughly equal share per face (cube symmetry): each ~1/6 ± 3%
    frac = np.bincount(faces, minlength=6) / faces.size
    assert np.all(np.abs(frac - 1 / 6) < 0.03)


def test_s2_knn_join_exact_vs_bruteforce(spark):
    """Great-circle kNN (radius-doubling S2 join + sparse-tail fallback)
    must equal brute-force haversine top-k — including dateline-straddling
    and near-polar queries where the planar quadkey path distorts."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(77)
    n_r = 400
    right = pd.DataFrame(
        {
            "pid": np.arange(n_r),
            "lon": rng.uniform(-180, 180, n_r),
            "lat": rng.uniform(-85, 85, n_r),
        }
    )
    queries = pd.DataFrame(
        {
            "qid": np.arange(40),
            "lon": np.concatenate(
                [rng.uniform(-180, 180, 30), rng.uniform(179.5, 180, 5), rng.uniform(-180, -179.5, 5)]
            ),
            "lat": np.concatenate([rng.uniform(-85, 85, 30), rng.uniform(80, 85, 10)]),
        }
    )
    k = 5
    got = (
        s2cells.s2_knn_join(
            spark.createDataFrame(queries),
            spark.createDataFrame(right),
            k=k,
            query_key="qid",
            r0_rad=0.05,
            max_rounds=4,
        )
        .select("qid", "pid_r", "rank")
        .toPandas()
        .sort_values(["qid", "rank"])
    )

    def hav(lon1, lat1, lon2, lat2):
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dl = np.radians(lon2 - lon1)
        a = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
        return 2 * np.arcsin(np.sqrt(a))

    for qid in queries["qid"]:
        qlon = float(queries.loc[queries.qid == qid, "lon"].iloc[0])
        qlat = float(queries.loc[queries.qid == qid, "lat"].iloc[0])
        d = hav(qlon, qlat, right["lon"].to_numpy(), right["lat"].to_numpy())
        order = sorted(range(n_r), key=lambda i: (d[i], right["pid"][i]))
        expect = [right["pid"][i] for i in order[:k]]
        mine = got[got.qid == qid]["pid_r"].tolist()
        assert mine == expect, qid
    assert (got.groupby("qid").size() == k).all()


def test_s2_knn_join_sparse_fallback(spark):
    """Fewer right rows than k resolves through the brute-force tail."""
    import pandas as pd

    q = spark.createDataFrame(pd.DataFrame({"qid": [1], "lon": [0.0], "lat": [0.0]}))
    r = spark.createDataFrame(
        pd.DataFrame({"pid": [10, 11], "lon": [10.0, -170.0], "lat": [0.0, 0.0]})
    )
    got = (
        s2cells.s2_knn_join(q, r, k=5, query_key="qid", r0_rad=0.01, max_rounds=2)
        .toPandas()
        .sort_values("rank")
    )
    assert got["pid_r"].tolist() == [10, 11]


def test_s2_knn_tie_break_without_unique_first_column(spark):
    """Equidistant right rows whose FIRST column collides must still rank
    deterministically: default ties break on ALL suffixed right columns;
    an explicit right_key uses that column alone."""
    from engine.s2cells import s2_knn_join

    left = spark.createDataFrame([(1, 10.0, 10.0)], "qid int, lon double, lat double")
    # two right rows at the SAME location whose first column (lon) is equal;
    # only 'tag' distinguishes them
    right = spark.createDataFrame(
        [(10.2, 10.0, "b"), (10.2, 10.0, "a"), (11.0, 10.0, "c")],
        "lon double, lat double, tag string",
    )
    out1 = {r.rank: r.tag_r for r in s2_knn_join(left, right, 2, "qid").collect()}
    out2 = {r.rank: r.tag_r for r in s2_knn_join(left, right, 2, "qid").collect()}
    assert out1 == out2 == {1: "a", 2: "b"}  # full-column tie-break: 'a' first
    key = {r.rank: r.tag_r for r in s2_knn_join(left, right, 2, "qid", right_key="tag").collect()}
    assert key == {1: "a", 2: "b"}
    import pytest

    with pytest.raises(ValueError):
        s2_knn_join(left, right, 2, "qid", right_key="missing")
