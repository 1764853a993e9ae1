"""Bucketed co-located joins: same-bucket-spec tile tables must join with
zero Exchange in the physical plan; results identical to the plain join."""

import numpy as np
import pandas as pd
import pytest

from engine import bucketing, raster


@pytest.fixture()
def two_tile_tables(spark):
    rng = np.random.default_rng(1)
    rows_a, rows_b = [], []
    for tx in range(6):
        for ty in range(4):
            rows_a.append((3, tx, ty, raster.tile_to_bytes(rng.integers(0, 9, (256, 256)).astype(np.int64))))
            rows_b.append((3, tx, ty, raster.tile_to_bytes(rng.integers(0, 9, (256, 256)).astype(np.int64))))
    a = spark.createDataFrame(pd.DataFrame(rows_a, columns=["zoom", "tx", "ty", "data"]))
    b = spark.createDataFrame(pd.DataFrame(rows_b, columns=["zoom", "tx", "ty", "data"]))
    return a, b


def test_bucketed_join_elides_exchange(spark, two_tile_tables):
    a, b = two_tile_tables
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
    bucketing.write_bucketed_tiles(a, "bk_a", n_buckets=8)
    bucketing.write_bucketed_tiles(b, "bk_b", n_buckets=8)
    ta = bucketing.read_table(spark, "bk_a")
    tb = bucketing.read_table(spark, "bk_b").selectExpr("tx", "ty", "data as data_b")
    # force a non-broadcast join so the bucketed layout is what saves the
    # shuffle (at 100 TB neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        joined = ta.join(tb, on=["tx", "ty"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not bucketing.plan_has_shuffle(joined), plan
        assert "Bucketed: true" in plan
        # same rows as the unbucketed join
        plain = a.join(b.selectExpr("tx", "ty", "data as data_b"), on=["tx", "ty"])
        assert joined.count() == plain.count() == 24
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_vs_plain_join_has_exchange(spark, two_tile_tables):
    a, b = two_tile_tables
    # the control: joining two NON-bucketed frames shuffles
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        joined = a.join(b.selectExpr("tx", "ty", "data as data_b"), on=["tx", "ty"])
        assert bucketing.plan_has_shuffle(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cleanup_tables(spark):
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
