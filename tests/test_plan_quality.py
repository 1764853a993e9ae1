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


def test_corpus_operators_stay_jvm_side(spark):
    """The corpus-curation hot paths must contain NO Python execution
    nodes (BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas) and
    must prune the documents scan to the columns they read."""
    from engine import corpus

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    for df in (
        corpus.gopher_quality_df(docs),
        corpus.dedup_spans_df(docs, k=10),
        corpus.pii_scrub_df(docs),
        corpus.chunk_tokens_df(docs, size=64),
        corpus.decontaminate_df(docs, docs.limit(2).select("text"), n=8),
    ):
        plan = _plan(df)
        assert "EvalPython" not in plan and "InPandas" not in plan, plan[:2000]
        rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert rs and all("html" not in ln for ln in rs), rs


def test_gopher_repetition_is_shuffle_free(spark):
    """Every repetition metric counts duplicates WITHIN a document, so the
    whole operator must plan as a projection: zero exchanges, zero
    aggregates — nothing leaves the row."""
    from engine import corpus

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plan = _plan(corpus.gopher_repetition_df(docs))
    assert "Exchange" not in plan and "HashAggregate" not in plan
    plan_q = _plan(corpus.gopher_quality_df(docs))
    assert "Exchange" not in plan_q and "Join" not in plan_q


def test_urlops_projection_only(spark):
    """URL parse/normalize/SURT are pure projections: no exchange, no
    Python nodes, single scan."""
    from engine import urlops
    from engine.fixtures import make_pages

    pages = spark.createDataFrame(make_pages(n=200))
    df = pages.select(
        urlops.url_normalize(F.col("url")).alias("n"),
        urlops.surt_key(F.col("url")).alias("s"),
    )
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_clustered_layout_prunes(spark, tmp_path):
    """write_clustered must produce parquet files with DISJOINT key ranges
    (footer min/max proves scan skipping works) and a prefix predicate
    must reach the scan as a pushed filter."""
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from engine import bucketing, joins

    pts = entrymod._points(spark, SF)
    tiled = joins.with_tile(pts, zoom=8).select("event_id", "quadkey")
    path = str(tmp_path / "clustered")
    bucketing.write_clustered(tiled, path, "quadkey", n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col = {md.schema.column(i).name: i for i in range(md.num_columns)}["quadkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # disjoint (boundaries may touch)

    back = spark.read.parquet(path).where(F.col("quadkey").startswith("121"))
    plan = _plan(back)
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_star_edges_plan_has_no_join(spark):
    """The 100-TB dedup edge generator must be a window over the band
    exchange — NO self-join anywhere in the plan (the all-pairs join is
    the quadratic formulation star edges exist to replace)."""
    from engine.textops import minhash_lsh_star_edges

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plan = _plan(minhash_lsh_star_edges(docs))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_pair_cap_materializes_once(spark):
    """The capped banded frame is checkpointed before the self-join: both
    join sides must read the materialized rows, not re-run the signature
    agg + cap window per side (which doubles the exchanges — measured)."""
    from engine.textops import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plan_uncapped = _plan(minhash_lsh_pairs(docs))
    plan_capped = _plan(minhash_lsh_pairs(docs, max_bucket=32))
    # checkpoint collapses the per-side subtrees: strictly fewer exchanges
    # than the uncapped self-join's duplicated signature pipelines
    assert plan_capped.count("Exchange") < plan_uncapped.count("Exchange")
    assert "CartesianProduct" not in plan_capped


def test_ngram_jaccard_row_has_no_cartesian_product(spark):
    """The registered ngram_jaccard row must run the banded scale path:
    equi-joins only — no CartesianProduct / nested-loop join anywhere in
    the plan (the brute-force crossJoin survives only as the pytest
    oracle)."""
    import __spark_entry__ as entrymod

    df = entrymod._q_ngram_jaccard(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fused_density_single_python_boundary(spark):
    """The fused density paths must run exactly ONE python-runner stage
    before the (tiny) partial-count aggregate — the worker-halving claim
    behind BENCH/BASELINE.md §1.  The composed with_pixel chain would show
    a second MapInArrow/ArrowEvalPython node feeding the aggregate."""
    import re

    import __spark_entry__ as entrymod
    from engine import raster

    pts = entrymod._points(spark, SF)

    def _python_nodes(plan: str) -> int:
        # per-row python boundaries feeding the count (the grouped-map tile
        # assembly at the end is shared by both formulations — exclude it);
        # count numbered plan nodes, not mentions (each node appears in the
        # tree AND in the detail section)
        return len(re.findall(r"\(\d+\) (?:MapInArrow|ArrowEvalPython|BatchEvalPython)\b", plan))

    plan_plain = _plan(raster.burn_base_tiles(pts, 5))
    # one mapInArrow kernel + one FlatMapGroupsInPandas assembly, nothing else
    assert _python_nodes(plan_plain) == 1, plan_plain
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas\b", plan_plain)) == 1

    plan_pip = _plan(
        raster.burn_base_tiles_pip(pts, entrymod._grid_polygons_pdf(), 5)
    )
    assert _python_nodes(plan_pip) == 1, plan_pip
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas\b", plan_pip)) == 1

    # the partial count must aggregate BELOW a hash aggregate (JVM sum of
    # the already-unique per-batch rows), not a per-row count
    assert "HashAggregate" in plan_plain and "sum" in plan_plain.lower()
