#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line to stdout:
  {"metric": "spatial_join_tiling_pages_per_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ..., ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect).  The flagship pipeline (geotag-style point derivation →
z8 tile assign → PIP join → density tiles + pyramid) defines pages/sec.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from engine import joins, raster  # noqa: E402
from engine.session import get_spark  # noqa: E402


def _force(df):
    df.write.format("noop").mode("overwrite").save()


# plan-metric context, configured in main(): wall time on this host has 2-3x
# run-to-run noise, so each query also records DETERMINISTIC plan metrics
# (shuffle bytes/rows, task and stage counts) from the AppStatusStore — a
# perf claim is falsifiable by diffing these across rounds, not the weather
_CTX: dict = {}


def _stage_rows(spark):
    """Snapshot all stages the AppStatusStore currently retains, keyed by
    (stageId, attemptId) — the same store that backs the UI/REST API, live
    even with spark.ui.enabled=false."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    quant = gw.new_array(gw.jvm.double, 0)
    out = {}
    stages = store.stageList(
        gw.jvm.java.util.ArrayList(), False, False, quant, gw.jvm.java.util.ArrayList()
    )
    for i in range(stages.size()):
        s = stages.apply(i)
        out[(s.stageId(), s.attemptId())] = (
            int(s.numCompleteTasks()),
            int(s.shuffleReadBytes()),
            int(s.shuffleWriteBytes()),
            int(s.shuffleWriteRecords()),
            int(s.executorRunTime()),
            int(s.jvmGcTime()),
        )
    return out


def _run(name, fn, timings):
    t0 = time.time()
    fn()
    timings[name] = round(time.time() - t0, 3)
    if _CTX:
        rows = _stage_rows(_CTX["spark"])
        seen = _CTX["seen"]
        new = [v for k, v in rows.items() if k not in seen]
        seen.update(rows.keys())
        _CTX["plan"][name] = {
            "stages": len(new),
            "tasks": sum(v[0] for v in new),
            "shuffle_read_bytes": sum(v[1] for v in new),
            "shuffle_write_bytes": sum(v[2] for v in new),
            "shuffle_write_rows": sum(v[3] for v in new),
            # wall time on this host is weather; executor CPU-seconds and the
            # GC share of them separate engine cost from JVM memory pressure
            "executor_run_ms": sum(v[4] for v in new),
            "jvm_gc_ms": sum(v[5] for v in new),
        }
    print(f"  {name}: {timings[name]}s", file=sys.stderr)
    # drop dangling python refs (kNN localCheckpoints, grouped-UDF buffers)
    # so the JVM context cleaner can release block-manager memory before the
    # next query — keeps per-query numbers independent
    import gc

    gc.collect()


def _split_input_dir(sf_dir: str, n: int) -> str:
    """The driver fixtures are single-row-group parquet files, so every
    initial scan is ONE Spark task: a pure-projection operator over the
    documents table ran fully serial (measured: corpus_gopher 7 executor
    core-s ≈ 9 s wall on 32 cores — parallelism 0.8; dedup_docs 0.7,
    simhash 0.5).  A real 100-TB corpus arrives as thousands of splits and
    the same scans parallelize by themselves, so the bench measures over a
    copy of the fixture dir whose text/embedding tables are split into n
    files (identical rows, identical order across file index) with every
    other table symlinked.  Built once, reused across runs."""
    try:
        import pyarrow.parquet as _pq

        # fingerprint the source tables so a cached split copy from an older
        # fixture generation can never be silently measured
        fp = ";".join(
            f"{fn}:{os.stat(os.path.join(sf_dir, fn)).st_size}"
            f":{os.stat(os.path.join(sf_dir, fn)).st_mtime_ns}"
            for fn in sorted(os.listdir(sf_dir))
            if fn.endswith(".parquet")
        )
        out = os.path.join(
            tempfile.gettempdir(),
            f"bench_split{n}_{os.path.basename(sf_dir.rstrip('/'))}",
        )
        marker = os.path.join(out, "_SPLIT_OK")
        if os.path.exists(marker) and open(marker).read() == fp:
            return out
        import shutil

        if os.path.exists(out):
            shutil.rmtree(out)
        os.makedirs(out)
        for fn in sorted(os.listdir(sf_dir)):
            if not fn.endswith(".parquet"):
                continue
            # abspath: a relative SPARK_GRAFT_SF_DIR would otherwise store a
            # relative symlink target that dangles from inside the tempdir
            src = os.path.abspath(os.path.join(sf_dir, fn))
            dst = os.path.join(out, fn)
            if fn[: -len(".parquet")] in ("documents", "embeddings"):
                t = _pq.read_table(src)
                os.makedirs(dst)
                step = max(1, (t.num_rows + n - 1) // n)
                for i in range(n):
                    sl = t.slice(i * step, step)
                    # always write part 0 so an empty table still yields a
                    # readable directory (schema present, 0 rows)
                    if sl.num_rows or i == 0:
                        _pq.write_table(sl, os.path.join(dst, f"part-{i:05d}.parquet"))
            else:
                os.symlink(src, dst)
        with open(marker, "w") as f:
            f.write(fp)
        return out
    except Exception as exc:  # never lose the bench to the split copy
        print(f"  split-input copy unavailable ({exc}); using {sf_dir}", file=sys.stderr)
        return sf_dir


def main():
    raw_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = raw_sf_dir.rstrip("/").split("sf")[-1]
    sf_dir = _split_input_dir(raw_sf_dir, cpus)
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict = {}
    q = entrymod.queries()

    # flagship pipeline: points → tile assign → PIP join → density + pyramid
    pts = entrymod._points(spark, sf_dir).cache()
    n_pages = pts.count()

    # pre-warm the input parquet through the page cache so per-query numbers
    # measure the engine, not the host's post-eviction disk state
    for t in ("events", "lineitem", "documents", "embeddings", "orders", "nation"):
        try:
            entrymod._read(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # plan metrics start AFTER the warm-up stages (seed `seen` with them)
    _CTX.update({"spark": spark, "seen": set(_stage_rows(spark)), "plan": {}})

    t0 = time.time()
    _run("pip_tile_join", lambda: _force(q["pip_tile_join"](spark, sf_dir)), timings)
    # base zoom sized to point density: world-scattered events at z5 keep
    # every 256x256 tile meaningfully filled (dense-tile parity path)
    _run(
        "tiling_pyramid",
        lambda: _force(
            raster.pyramid_reduce(raster.pyramid_reduce(raster.burn_base_tiles(pts, 5)))
        ),
        timings,
    )
    flagship_wall = time.time() - t0

    # fused single-Arrow-boundary PIP→density (engine/raster.py
    # burn_base_tiles_pip): the scaling-sweep flagship path.  Timed against
    # pip_tile_join + tiling_pyramid above, its plan metrics record ONE
    # python-runner stage where the composed chain runs two — the worker
    # halving behind the §1 sweep gain (BENCH/BASELINE.md).
    _run(
        "pip_density_fused",
        lambda: _force(
            raster.burn_base_tiles_pip(pts, entrymod._grid_polygons_pdf(), 5)
        ),
        timings,
    )

    _run("tile_assign", lambda: _force(q["tile_assign"](spark, sf_dir)), timings)
    # relational form: the registry row routes through the GeoTIFF codec
    # for the correctness gate; the codec is timed separately (geotiff_codec)
    _run("tile_density_z5", lambda: _force(
        entrymod._q_tile_density_relational(spark, sf_dir)), timings)
    _run("knn", lambda: _force(q["knn"](spark, sf_dir)), timings)
    _run("point_pixel_lookup", lambda: _force(q["point_pixel_lookup"](spark, sf_dir)), timings)
    _run("pip_shuffle_plan", lambda: _force(
        joins.pip_join_shuffle(
            pts,
            spark.createDataFrame(entrymod._grid_polygons_pdf()).selectExpr(
                "polygon_id", "geom_wkb",
                "double((polygon_id % 36) * 10 - 180) as minx",
                "double((polygon_id div 36) * 10 - 90) as miny",
                "double((polygon_id % 36) * 10 - 170) as maxx",
                "double((polygon_id div 36) * 10 - 80) as maxy",
            ),
            zoom=5,
            keep_cols=("event_id",),
        )
    ), timings)
    _run("summary_lineitem", lambda: _force(q["summary_lineitem"](spark, sf_dir)), timings)
    _run("first_match_join", lambda: _force(q["first_match_join"](spark, sf_dir)), timings)
    _run("dedup_docs", lambda: _force(q["dedup_docs"](spark, sf_dir)), timings)
    _run("doc_quality", lambda: _force(entrymod._q_doc_quality(spark, sf_dir)), timings)
    _run("embedding_topk", lambda: _force(q["embedding_topk"](spark, sf_dir)), timings)
    _run("minhash_lsh", lambda: _force(q["minhash_lsh"](spark, sf_dir)), timings)
    _run("ann_lsh", lambda: _force(q["ann_lsh"](spark, sf_dir)), timings)
    _run("ogrsql_exec", lambda: _force(q["ogrsql_where"](spark, sf_dir)), timings)

    # raster-op pipeline: burn z5 → hillshade (halo join) → components
    from engine import components as _components
    from engine import focal as _focal

    base = raster.burn_base_tiles(pts, 5).persist()
    base.count()
    _run("focal_hillshade", lambda: _force(_focal.focal(base, "hillshade")), timings)
    _run("focal_tpi", lambda: _force(_focal.focal(base, "tpi")), timings)
    _run("connected_components", lambda: _force(_components.connected_components(base)), timings)
    from engine import warp as _warp

    _run("warp_to_geodetic", lambda: _force(_warp.warp_mercator_to_geodetic(spark, base, 5, 4)), timings)

    # round-1 additions: overlay algebra, proximity, contour, polygonize,
    # grid metrics, linear referencing, distributed convex hull
    from engine import contour as _contour
    from engine import geomops as _geomops
    from engine import polygonize as _pz
    from engine import proximity as _prox

    binar = _warp.raster_calc({"d": base}, lambda b: (b["d"] > 0).astype("int64")).persist()
    binar.count()
    _run("layer_algebra", lambda: _force(entrymod._q_layer_intersection(spark, sf_dir)), timings)
    _run("proximity", lambda: _force(_prox.proximity(binar, (1,), maxdist=16.0)), timings)
    _run("contour", lambda: _force(_contour.contour_lengths(base, [2.5, 10.5])), timings)
    _run("polygonize", lambda: _force(_pz.polygonize(binar)), timings)
    _run("sieve", lambda: _force(_components.sieve_filter(binar, 4)), timings)
    _run("line_clip", lambda: _force(entrymod._q_layer_clip_lines(spark, sf_dir)), timings)
    _run("grid_metrics", lambda: _force(entrymod._q_grid_metrics(spark, sf_dir)), timings)
    _run("lineref_locate", lambda: _force(q["lineref_locate"](spark, sf_dir)), timings)
    _run(
        "convex_hull_groups",
        lambda: _force(
            _geomops.group_convex_hull(
                pts.withColumn("grp", (F.col("event_id") % 64).cast("int")), "grp"
            )
        ),
        timings,
    )
    # late round-5 addition: GeoTIFF egress + ingest over the persisted z5
    # raster — every tile becomes a standalone georeferenced GeoTIFF
    # (deflate + horizontal predictor), then is ingested back with
    # (zoom, tx, ty) re-derived from the embedded geo tags only; the
    # checksum-sum equality against the pre-computed reference pins
    # bit-identity (gdal_translate GTiff round-trip analog)
    from engine import tiff as _tiff

    _ck_ref = raster.tile_checksums(base).agg(
        F.sum("checksum").alias("s"), F.count("*").alias("n")
    ).collect()[0]

    def _geotiff():
        got = raster.tile_checksums(
            _tiff.geotiff_to_tiles(_tiff.tiles_to_geotiff(base).select("tiff"))
        ).agg(F.sum("checksum").alias("s"), F.count("*").alias("n")).collect()[0]
        assert (got.s, got.n) == (_ck_ref.s, _ck_ref.n), "GeoTIFF round-trip drift"

    _run("geotiff_codec", _geotiff, timings)

    binar.unpersist()
    base.unpersist()

    # round-3 additions: general-SRS LCC warp, antimeridian split, 64-bit
    # SimHash near-dup banding
    _run("warp_lcc", lambda: _force(q["warp_lcc"](spark, sf_dir)), timings)
    _run("dateline_split", lambda: _force(q["dateline_split"](spark, sf_dir)), timings)
    _run("simhash64_near", lambda: _force(q["simhash"](spark, sf_dir)), timings)

    # later round-3 additions: corpus line dedup, image-pair correlator
    from engine import matching as _matching
    from engine import textops as _textops

    # sf_dir is the split-layout copy (_split_input_dir), so this scan — and
    # every q[...] row that reads documents/embeddings — gets one task per
    # file instead of the fixture's single-row-group serial scan.
    docs = entrymod._read(spark, sf_dir, "documents")
    _run("line_dedup", lambda: _force(_textops.dedup_lines_df(docs)), timings)

    import numpy as np

    def _pair_rows(n_pairs=32, hw=128, nblobs=48):
        rows = []
        for pid in range(n_pairs):
            rng = np.random.default_rng(1000 + pid)
            img = np.zeros((hw + 16, hw + 16))
            yy, xx = np.mgrid[0:hw + 16, 0:hw + 16]
            for _ in range(nblobs):
                cy = rng.integers(20, hw - 4)
                cx = rng.integers(20, hw - 4)
                s = rng.uniform(1.5, 4.0)
                a = rng.uniform(0.5, 1.0) * rng.choice([-1, 1])
                img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
            img = np.round(img * 100)
            dy, dx = int(rng.integers(2, 9)), int(rng.integers(2, 9))
            i1 = np.ascontiguousarray(img[dy:dy + hw, dx:dx + hw])
            i2 = np.ascontiguousarray(img[0:hw, 0:hw])
            rows.append((pid, hw, hw, i1.astype("<f8").tobytes(),
                         hw, hw, i2.astype("<f8").tobytes()))
        return rows

    pair_df = spark.createDataFrame(_pair_rows(), _matching.PAIR_SCHEMA).persist()
    pair_df.count()
    _run(
        "image_matching",
        lambda: _force(
            _matching.fit_pair_transforms(
                _matching.match_image_pairs(pair_df, 1, 2, 2e-4, 0.015)
            )
        ),
        timings,
    )
    pair_df.unpersist()

    # product-quantization ANN: joint subspace Lloyd training (3 iters —
    # the per-iteration cost is what scales; convergence depth doesn't
    # change the plan), 8-byte codes, ADC scan + exact re-rank
    from engine import ann as _ann

    emb = entrymod._read(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )

    def _pq():
        cb = _ann.pq_train(emb, m=8, ksub=16, max_iters=3)
        codes = _ann.pq_encode(emb, cb)
        qv = emb.where("vec_id = 42").collect()[0]["embedding"]
        return _force(_ann.pq_topk(codes, cb, qv, k=10, rerank=emb, shortlist=100))

    _run("pq_ann", _pq, timings)

    # corpus-curation additions: Gopher quality+repetition scan, exact
    # duplicated-substring removal (both one-pass exploded aggregations)
    from engine import corpus as _corpus

    _run("corpus_gopher", lambda: _force(_corpus.gopher_quality_df(docs)), timings)
    _run("span_dedup", lambda: _force(_corpus.dedup_spans_df(docs, k=20)), timings)

    # round-4 additions: ALL_TOUCHED line rasterization, reverse geocoding
    # (broadcast exact kNN), bucketed sequence packing
    import pandas as pd

    from engine import geom as _geom
    from engine import raster as _raster
    from engine.geotag import geocode_reverse as _revgeo

    seg_pdf = pts.where(F.col("event_id") % 50 == 0).select("event_id", "lon", "lat").toPandas()
    seg_rows = [
        (int(r.event_id), _geom.wkb_linestring(
            [(max(-179.9, r.lon - 2.0), max(-79.9, r.lat - 1.3)),
             (min(179.9, r.lon + 2.0), min(79.9, r.lat + 1.3))]))
        for r in seg_pdf.itertuples()
    ]
    seg_df = spark.createDataFrame(
        pd.DataFrame(seg_rows, columns=["lid", "geom_wkb"])
    ).persist()
    seg_df.count()
    _run(
        "rasterize_lines_at",
        lambda: _force(_raster.rasterize_lines(seg_df, 6, all_touched=True)),
        timings,
    )
    seg_df.unpersist()

    rq = pts.where(F.col("event_id") % 200 == 0).select(
        F.col("event_id").alias("qid"), "lon", "lat"
    )
    gaz = pts.where(F.col("event_id") % 50 == 25).select(
        F.col("event_id").cast("string").alias("name"), "lon", "lat",
        (F.col("event_id") % 7).alias("country_id"),
    )
    _run("geocode_reverse", lambda: _force(_revgeo(rq, gaz)), timings)

    _run("pack_sequences", lambda: _force(_corpus.pack_sequences(docs, size=512)), timings)

    # hot-bucket dedup: 10^6 docs with a 10^5-doc boilerplate cluster — the
    # star-edge path must stay LINEAR in bucket size (10^5-1 edges, not
    # 5·10^9 pairs).  The plan metrics record the shuffle rows as evidence;
    # the asserts pin the exact cluster structure.  The synthetic corpus is
    # materialized OUTSIDE the timed region (every other query reads
    # pre-warmed parquet; timing 6×10^6 md5 synthesis calls as "dedup"
    # overstated this query by ~2×).
    n_total, n_hot = 1_000_000, 100_000
    hot_docs = spark.range(n_total).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.lit("the same boilerplate page text repeated across the crawl corpus"),
        ).otherwise(
            F.concat_ws(
                " ",
                *[F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string"))) for i in range(6)],
            )
        ).alias("text"),
    ).cache()
    hot_docs.count()

    def _hot_bucket():
        out = _textops.dedup_clusters_df(hot_docs)
        agg = out.agg(
            F.max("n_members").alias("mx"), F.countDistinct("cluster_id").alias("nc")
        ).collect()[0]
        assert agg.mx == n_hot, f"hot cluster size {agg.mx} != {n_hot}"
        # LSH is approximate: a handful of the 900k unique docs false-merge
        # (measured ~2e-5 rate from 32-bit shingle-hash birthday collisions)
        exp = n_total - n_hot + 1
        assert exp - 100 <= agg.nc <= exp, f"cluster count {agg.nc} vs {exp}"

    _run("dedup_hot_bucket", _hot_bucket, timings)
    hot_docs.unpersist()

    total = round(sum(timings.values()), 3)
    pages_per_sec = round(n_pages / flagship_wall, 1) if flagship_wall > 0 else None
    print(
        json.dumps(
            {
                "metric": "spatial_join_tiling_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "plan": _CTX["plan"],
                "sf": sf,
                "n_pages": n_pages,
                "pages_per_sec": pages_per_sec,
                "master": f"local[{cpus}]",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
