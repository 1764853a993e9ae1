"""Plan-quality assertions: the declarative formulations must actually
reach the scan — predicate pushdown (PushedFilters), column pruning
(ReadSchema), and broadcast of small sides.  These are the 100-TB levers
the engine's design claims (SURVEY §2.2, BENCH/BASELINE.md); asserting on
the formatted plan pins them against regressions."""

import contextlib
import io
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01" if os.path.isdir("/root/testdata/sf0.01") else "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    df = li.where(F.col("l_quantity") > 30).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "IsNotNull(l_quantity)" in plan and "GreaterThan(l_quantity,30" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    plan = _plan(li.select("l_orderkey", "l_quantity"))
    # ReadSchema must carry ONLY the two projected columns
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, plan
    assert "l_orderkey" in rs[0] and "l_quantity" in rs[0]
    assert "l_comment" not in rs[0] and "l_extendedprice" not in rs[0]


def test_pruning_survives_engine_point_derivation(spark):
    """The _points derivation (the geotag stage input) must prune the
    events scan to event_id only — dragging value/payload columns through
    would multiply scan bytes at 100 TB."""
    import __spark_entry__ as entrymod

    pts = entrymod._points(spark, SF)
    rs = [ln for ln in _plan(pts).splitlines() if "ReadSchema" in ln]
    assert rs and "event_id" in rs[0]
    assert "value" not in rs[0] and "payload" not in rs[0] and "event_type" not in rs[0]


def test_small_dimension_broadcast(spark):
    """first_match_left_join broadcasts the ranked small side (or AQE
    plans a broadcast hash join) — never a sort-merge over the big side
    for a dimension-sized right table."""
    import __spark_entry__ as entrymod

    out = entrymod._q_first_match_join(spark, SF)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
