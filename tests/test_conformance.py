"""Generic layer-conformance invariants — the engine's adoption of the
reference's driver harness ``apps/test_ogrsf.cpp`` (SURVEY §5.1):

* TestOGRLayerFeatureCount (:608) — iteration count == GetFeatureCount,
  under no filter, an attribute filter, and a spatial filter;
* TestOGRLayerRandomRead (:743) — GetFeature(fid) equals the scanned row;
* TestSpatialFilter (:1140) — a feature inside the filter rect IS
  returned, a disjoint rect returns nothing, inside+outside partition;
* TestAttributeFilter (:1580) — filter + complement partition the layer;
* TestGetExtent (:1914) — the layer extent tightly bounds all features;
* determinism-under-parallelism — the engine analog of the reference's
  multi-thread stress harnesses (multireadtest.cpp): identical rows at
  any repartitioning.

Run over multiple layer shapes (points from events, TPC-H attributes) so
the invariants are properties of the operators, not one fixture.
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from engine import vector

SF = "/root/testdata/sf0.01" if os.path.isdir("/root/testdata/sf0.01") else "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layers(spark):
    pts = entrymod._points(spark, SF).localCheckpoint(eager=True)
    part = entrymod._read(spark, SF, "part").localCheckpoint(eager=True)
    return {"points": (pts, "event_id"), "part": (part, "p_partkey")}


@pytest.mark.parametrize("name", ["points", "part"])
def test_feature_count_equals_iteration(layers, name):
    df, fid = layers[name]
    assert df.count() == len(df.collect())


def test_feature_count_under_filters(layers):
    pts, _ = layers["points"]
    flt = vector.spatial_filter_rect(pts, -179.0, -60.0, -172.0, 60.0)
    assert flt.count() == len(flt.collect())
    part, _ = layers["part"]
    af = part.where(F.col("p_size") > 25)
    assert af.count() == len(af.collect())


@pytest.mark.parametrize("name", ["points", "part"])
def test_random_read_matches_scan(layers, name):
    df, fid = layers[name]
    rows = {r[fid]: r for r in df.collect()}
    some = sorted(rows)[:: max(len(rows) // 7, 1)][:7]
    for k in some:
        got = df.where(F.col(fid) == k).collect()
        assert len(got) == 1 and got[0] == rows[k]


def test_spatial_filter_contract(layers):
    pts, _ = layers["points"]
    one = pts.limit(1).collect()[0]
    eps = 1e-6
    hit = vector.spatial_filter_rect(pts, one.lon - eps, one.lat - eps, one.lon + eps, one.lat + eps)
    assert any(r.event_id == one.event_id for r in hit.collect())
    # a rect disjoint from the layer extent returns nothing
    assert vector.spatial_filter_rect(pts, 500.0, 500.0, 501.0, 501.0).count() == 0
    # inside + outside partition the layer exactly
    inside = vector.spatial_filter_rect(pts, -179.0, -60.0, -172.0, 60.0)
    n_out = pts.where(
        ~((F.col("lon") >= -179.0) & (F.col("lon") <= -172.0)
          & (F.col("lat") >= -60.0) & (F.col("lat") <= 60.0))
    ).count()
    assert inside.count() + n_out == pts.count()


def test_attribute_filter_partition(layers):
    part, _ = layers["part"]
    cond = F.col("p_size") > 25
    a = part.where(cond).count()
    b = part.where(~cond | F.col("p_size").isNull()).count()
    assert a + b == part.count()


def test_extent_bounds_all_features(layers):
    pts, _ = layers["points"]
    ext = vector.layer_extent(pts).collect()[0]
    assert ext.feature_count == pts.count()
    out_of_bounds = pts.where(
        (F.col("lon") < ext.minx) | (F.col("lon") > ext.maxx)
        | (F.col("lat") < ext.miny) | (F.col("lat") > ext.maxy)
    ).count()
    assert out_of_bounds == 0
    # tight: the extremes are attained
    agg = pts.agg(
        F.min("lon").alias("a"), F.max("lon").alias("b"),
        F.min("lat").alias("c"), F.max("lat").alias("d"),
    ).collect()[0]
    assert (agg.a, agg.c, agg.b, agg.d) == (ext.minx, ext.miny, ext.maxx, ext.maxy)


def test_determinism_under_parallelism(layers):
    """multireadtest.cpp analog: the same filtered projection yields the
    identical row set at 1, 7 and 32 partitions."""
    pts, _ = layers["points"]
    def rows(df):
        return sorted(map(tuple, df.where(F.col("event_id") % 3 == 0)
                          .select("event_id", "lon", "lat").collect()))
    base = rows(pts)
    assert rows(pts.repartition(7)) == base
    assert rows(pts.coalesce(1)) == base
    assert rows(pts.repartition(32, "event_id")) == base
