"""Stage runner: checkpointed tile pyramid with lineage/metrics + resume.

The engine's analog of gdal2tiles' base-then-overview generation with
``--resume`` (gdal2tiles.py:1154 generate_base_tiles, :1314
generate_overview_tiles, :1202-1207 resume skips existing tiles) and of
gdaltindex's per-file manifest (apps/gdaltindex.c:96-561): every stage writes

* its output as parquet partitioned by ``zoom`` (partition pruning on zoom =
  the overview-level selection of gcore/rasterio.cpp:2117), and
* a **manifest** row per completed zoom level with lineage + row-count
  metrics: stage name, input/output row counts, tile extents (the
  GetExtent fast path, ogrlayer.cpp:212), total page count, xor-of-checksums,
  wall seconds, and the spark conf that produced it.

``run_tiling(..., resume=True)`` consults the manifest and skips every level
already marked complete — re-running a killed job recomputes only missing
levels (FIXTURES.md §8 resume invariant).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import raster

MANIFEST_DIR = "_manifest"


def _manifest_path(base: str) -> str:
    return os.path.join(base, MANIFEST_DIR)


def read_manifest(spark: SparkSession, base: str) -> DataFrame | None:
    path = _manifest_path(base)
    try:
        return spark.read.json(path)
    except Exception:
        return None


def completed_levels(spark: SparkSession, base: str) -> set:
    mf = read_manifest(spark, base)
    if mf is None or "zoom" not in mf.columns:
        return set()
    # only level-commit records count toward resume: metadata-edit records
    # (stage="_edit") must never mark a pyramid level as built
    if "stage" in mf.columns:
        mf = mf.where((F.col("stage").isNull()) | (F.col("stage") != "_edit"))
    return {
        r.zoom
        for r in mf.select("zoom").distinct().collect()
        if r.zoom is not None
    }


def _append_manifest(spark: SparkSession, base: str, record: dict) -> None:
    path = _manifest_path(base)
    os.makedirs(path, exist_ok=True)
    # one json file per completed stage — append-only commit log; written
    # AFTER the level's parquet commit, so a crash between the two re-runs
    # the level (idempotent overwrite) rather than trusting a torn write
    key = f"zoom_{record['zoom']}" if "zoom" in record else f"stage_{record['stage']}"
    # microsecond resolution: two commits in the same wall second (e.g.
    # consecutive metadata edits) must not collapse into one log file
    fname = os.path.join(path, f"{key}_{int(record['ts'] * 1e6)}.json")
    with open(fname, "w") as f:
        f.write(json.dumps(record) + "\n")


def _level_stats(tile_df: DataFrame) -> dict:
    row = (
        raster.tile_checksums(tile_df)
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.min("tx").alias("min_tx"),
            F.max("tx").alias("max_tx"),
            F.min("ty").alias("min_ty"),
            F.max("ty").alias("max_ty"),
            F.sum("page_count").alias("total_count"),
            # order-insensitive combined checksum: xor fold
            F.expr("aggregate(collect_list(checksum), 0, (a, x) -> int(a ^ x))").alias("ck_xor"),
        )
        .collect()[0]
    )
    return {k: (int(v) if v is not None else None) for k, v in row.asDict().items()}


def run_tiling(
    spark: SparkSession,
    points: DataFrame,
    base: str,
    base_zoom: int,
    min_zoom: int,
    resume: bool = False,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Materialize the density-tile pyramid [min_zoom..base_zoom] under
    ``base`` with per-level manifest records; returns the full tile table.

    Levels are checkpointed bottom-up (base zoom first); each reduce reads
    the PERSISTED parquet of the level above, so resume restarts from the
    first missing level with no recomputation of completed ones.
    """
    done = completed_levels(spark, base) if resume else set()
    n_input = None

    for z in range(base_zoom, min_zoom - 1, -1):
        lvl_path = os.path.join(base, f"zoom={z}")
        if z in done:
            continue
        t0 = time.time()
        if z == base_zoom:
            if n_input is None:
                n_input = points.count()
            level = raster.burn_base_tiles(points, z, lon_col, lat_col)
            in_rows = n_input
            stage = "burn_base"
        else:
            parent_src = spark.read.parquet(os.path.join(base, f"zoom={z + 1}"))
            parent_src = parent_src.withColumn("zoom", F.lit(z + 1))
            in_rows = parent_src.count()
            level = raster.pyramid_reduce(parent_src)
            stage = "pyramid_reduce"
        level.drop("zoom").write.mode("overwrite").parquet(lvl_path)
        persisted = spark.read.parquet(lvl_path).withColumn("zoom", F.lit(z))
        stats = _level_stats(persisted)
        # per-PARTITION lineage sidecar: (partition id, tile count, page
        # count, checksum xor) — lets a resumed/audited run pin which scan
        # partitions contributed what, at file-partition granularity
        lineage = (
            raster.tile_checksums(persisted)
            .withColumn("part_id", F.spark_partition_id())
            .groupBy("part_id")
            .agg(
                F.count(F.lit(1)).alias("n_tiles"),
                F.sum("page_count").alias("page_count"),
                F.expr("aggregate(collect_list(checksum), 0, (a, x) -> int(a ^ x))").alias("ck_xor"),
            )
        )
        lineage.write.mode("overwrite").parquet(os.path.join(base, "_lineage", f"zoom={z}"))
        stats["n_partitions"] = lineage.count()
        _append_manifest(
            spark,
            base,
            {
                "zoom": z,
                "stage": stage,
                "in_rows": int(in_rows),
                "out_rows": stats["n_tiles"],
                "ts": time.time(),
                "wall_s": round(time.time() - t0, 3),
                "master": spark.sparkContext.master,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                **stats,
            },
        )

    parts = []
    for z in range(min_zoom, base_zoom + 1):
        parts.append(
            spark.read.parquet(os.path.join(base, f"zoom={z}")).withColumn("zoom", F.lit(z))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("zoom", "tx", "ty", "data")


def edit_metadata(spark: SparkSession, base: str, **updates) -> dict:
    """gdal_edit.py analog (swig/python/scripts/gdal_edit.py: -a_srs,
    -a_nodata, -a_ullr, -mo KEY=VALUE in-place header edits).

    The engine's datasets are IMMUTABLE parquet tile tables, so "in-place
    edit" becomes an append-only metadata record in the same manifest
    commit log the tiling stages write: each call appends one
    ``stage="_edit"`` record carrying the updated fields (srs, nodata,
    extent, arbitrary metadata keys); :func:`dataset_metadata` folds all
    edit records latest-wins over any level records.  Nothing rewrites
    data bytes — exactly the reference's contract (headers only).

    Returns the merged metadata after the edit."""
    import time as _time

    # gdal_edit takes arbitrary -mo KEY=VALUE pairs, but the manifest's own
    # bookkeeping fields must not be forgeable: a user 'zoom' would make
    # completed_levels() treat the edit as a finished pyramid level (resume
    # then SKIPS computing it), and 'stage'/'ts' would corrupt the record
    # itself (a string ts crashes the commit-log filename).
    reserved = {"zoom", "stage", "ts"} & set(updates)
    if reserved:
        raise ValueError(
            f"metadata keys {sorted(reserved)} are reserved manifest fields; "
            "store them under different names"
        )
    rec = {"stage": "_edit", "ts": _time.time()}
    rec.update(updates)
    _append_manifest(spark, base, rec)
    return dataset_metadata(spark, base)


def dataset_metadata(spark: SparkSession, base: str) -> dict:
    """Merged dataset metadata from the manifest commit log: all
    ``_edit`` records folded in timestamp order (latest wins per key)."""
    mf = read_manifest(spark, base)
    out: dict = {}
    if mf is None:
        return out
    if "stage" not in mf.columns:
        return out
    rows = [r.asDict() for r in mf.where(F.col("stage") == "_edit").collect()]
    for r in sorted(rows, key=lambda d: d.get("ts") or 0):
        for k, v in r.items():
            if k not in ("stage", "ts") and v is not None:
                out[k] = v
    return out


def completed_stages(spark: SparkSession, base: str) -> set:
    """Stage names with a manifest record (generic-stage analog of
    :func:`completed_levels`)."""
    m = read_manifest(spark, base)
    if m is None or "stage" not in m.columns:
        return set()
    return {r.stage for r in m.select("stage").distinct().collect()}


def run_stage(
    spark: SparkSession,
    stage: str,
    tile_df_fn,
    base: str,
    resume: bool = False,
) -> DataFrame:
    """Materialize ONE named tile-table stage under ``base/stage=<name>``
    with the same contract as :func:`run_tiling`: parquet persist, a
    manifest record (rows, checksum-xor, wall), a per-partition lineage
    sidecar, and resume (a completed stage is read back, its producer
    never re-invoked).  Generalizes checkpoint/resume to any operator
    producing a (zoom, tx, ty, data) table — rasterize_polygons/lines,
    warp outputs, sieve/proximity products.
    """
    path = os.path.join(base, f"stage={stage}")
    if resume and stage in completed_stages(spark, base):
        return spark.read.parquet(path)
    t0 = time.time()
    out = tile_df_fn()
    out.write.mode("overwrite").parquet(path)
    persisted = spark.read.parquet(path)
    stats = _level_stats(persisted)
    lineage = (
        raster.tile_checksums(persisted)
        .withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("page_count").alias("page_count"),
            F.expr("aggregate(collect_list(checksum), 0, (a, x) -> int(a ^ x))").alias("ck_xor"),
        )
    )
    lineage.write.mode("overwrite").parquet(os.path.join(base, "_lineage", f"stage={stage}"))
    stats["n_partitions"] = lineage.count()
    _append_manifest(
        spark,
        base,
        {
            "stage": stage,
            "ts": time.time(),
            "wall_s": round(time.time() - t0, 3),
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            **stats,
        },
    )
    return persisted


def run_doc_stage(
    spark: SparkSession,
    stage: str,
    df_fn,
    base: str,
    resume: bool = False,
) -> DataFrame:
    """:func:`run_stage` for DOCUMENT tables (any schema): parquet persist
    under ``base/stage=<name>``, per-partition lineage (row count + an
    order-independent xxhash64-XOR content checksum over every column), a
    manifest record, and resume (a completed stage reads back; its producer
    is never re-invoked).  This extends the checkpoint/lineage contract
    from the tile pipeline to the corpus pipeline — every curation stage
    (scrub -> filter -> dedup -> sample) restarts mid-pipeline."""
    path = os.path.join(base, f"stage={stage}")
    if resume and stage in completed_stages(spark, base):
        return spark.read.parquet(path)
    t0 = time.time()
    out = df_fn()
    out.write.mode("overwrite").parquet(path)
    persisted = spark.read.parquet(path)
    # content checksum: per-row hash over ALL columns folded with the
    # bit_xor AGGREGATE (constant state — never materializes a partition's
    # hashes) — invariant to row order and partitioning, so re-runs at any
    # parallelism must reproduce it bit-for-bit
    hashed = persisted.withColumn(
        "_h", F.xxhash64(*[F.col(c) for c in persisted.columns])
    ).withColumn("part_id", F.spark_partition_id())
    lineage = hashed.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("ck_xor"),
    )
    lpath = os.path.join(base, "_lineage", f"stage={stage}")
    lineage.write.mode("overwrite").parquet(lpath)
    # manifest scalars come from the tiny persisted lineage (no rescan of
    # the stage table)
    lsum = (
        spark.read.parquet(lpath)
        .agg(
            F.sum("n_rows").alias("n"),
            F.expr("bit_xor(ck_xor)").alias("ck"),
            F.count(F.lit(1)).alias("np"),
        )
        .collect()[0]
    )
    total, ck, n_parts = int(lsum["n"] or 0), lsum["ck"], int(lsum["np"])
    _append_manifest(
        spark,
        base,
        {
            "stage": stage,
            "ts": time.time(),
            "wall_s": round(time.time() - t0, 3),
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "n_rows": total,
            "content_ck": int(ck if ck is not None else 0),
            "n_partitions": n_parts,
        },
    )
    return persisted
