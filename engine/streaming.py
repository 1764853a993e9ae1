"""Structured Streaming seam (SURVEY.md §2.10).

The reference is strictly batch; its closest artifacts are the sequential
HTTP streaming reader (port/cpl_vsil_curl_streaming.cpp) and async tile
reads (gcore/gdaldefaultasync.cpp).  This module is the engine's designed
extension point: the SAME operators (geotag join, cell encode, density
aggregation) applied to a stream of pages with event time = ``warc_ts``:

* :func:`stream_pages` — file-source stream of page parquet.
* :func:`streaming_tile_counts` — watermarked tumbling-window density per
  tile: late pages beyond the watermark are dropped, in-window pages
  aggregate incrementally (the streaming form of MERGE_ALG=ADD).
* :func:`run_stream_to_tiles` — foreachBatch into the batch tile-burn path,
  so the streaming sink shares the tile-table layout and checksum
  verification with the batch pipeline.

Geotag is a stream-static join (static broadcast gazetteer) — no state; the
windowed count is the only stateful operator and is bounded by the
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import joins
from .geotag import geotag_all

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def streaming_tile_counts(
    pages_stream: DataFrame,
    gazetteer: DataFrame,
    zoom: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window page density per tile.

    (window_start, tx, ty, page_count) — the streaming analog of the batch
    tile_density operator; state is bounded by the watermark horizon.
    """
    tagged = geotag_all(pages_stream, gazetteer)
    tiled = joins.with_tile(tagged, zoom)
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tx", "ty")
        .agg(F.count(F.lit(1)).alias("page_count"))
        .select(F.col("w.start").alias("window_start"), "tx", "ty", "page_count")
    )


def run_stream_to_tiles(
    spark: SparkSession,
    src_dir: str,
    gazetteer: DataFrame,
    zoom: int,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """Drain the page stream into the batch tile-burn path via foreachBatch
    (trigger availableNow — processes the backlog then stops).  Each
    micro-batch geotags + burns and appends parquet tiles; the downstream
    pyramid/mosaic treats micro-batch outputs as mosaic inputs."""
    from . import raster

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tagged = geotag_all(batch_df, gazetteer)
        tiles = raster.burn_base_tiles(tagged, zoom)
        tiles.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    q = (
        stream_pages(spark, src_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_first_seen(
    pages_stream: DataFrame,
    timeout_minutes: int = 0,
) -> DataFrame:
    """Custom stateful operator: emit each url the FIRST time it appears in
    the stream (streaming exact dedup — the training-pipeline form of
    dedup_exact), implemented with ``applyInPandasWithState``.

    State per url-hash-group: the set of urls already emitted.  New urls in
    a micro-batch are emitted once with their first warc_ts; repeats are
    swallowed.  With ``timeout_minutes`` > 0 state expires after processing-
    time inactivity (bounded state for unbounded key domains — at 10¹²
    urls, state would instead bucket by url-hash partition + a bloom/exact
    spill table; the group-by-hash shape below is that design at small N).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd  # noqa: F811

    out_schema = "url string, first_ts timestamp"
    state_schema = "seen array<string>"

    def _dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # inactivity expiry: drop the seen-set (bounded state); a url
            # recurring after expiry re-emits, the documented trade-off
            state.remove()
            yield pd.DataFrame({"url": [], "first_ts": []})
            return
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("warc_ts")
            for url, ts in zip(pdf["url"], pdf["warc_ts"]):
                if url not in seen:
                    seen.add(url)
                    rows.append((url, ts))
        state.update((list(seen),))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(rows, columns=["url", "first_ts"])

    keyed = pages_stream.select(
        F.abs(F.hash("url") % 64).alias("bucket"), "url", "warc_ts"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_minutes else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup, out_schema, state_schema, "append", timeout
    )


def pyramid_current(out_dir: str) -> dict | None:
    """Read the committed snapshot pointer: {'batch_id': int, 'snapshot':
    str} or None when nothing has committed yet.  The pointer file is the
    single source of truth — orphan snapshot dirs without a pointer entry
    are crash garbage and are never read."""
    import json
    import os

    path = os.path.join(out_dir, "CURRENT")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def read_pyramid_level(spark: SparkSession, out_dir: str, zoom: int) -> DataFrame:
    """Committed tile table of one pyramid level (resolves the CURRENT
    pointer to its immutable snapshot dir)."""
    import os

    cur = pyramid_current(out_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed pyramid snapshot in {out_dir}")
    return spark.read.parquet(os.path.join(out_dir, cur["snapshot"], f"z={zoom}"))


def pyramid_snapshot_commit(out_dir: str, levels: dict, batch_id: int) -> str:
    """Write ``levels`` ({zoom: tile DataFrame}) as the immutable snapshot
    ``snap_<batch_id>`` and commit it by ATOMICALLY renaming the CURRENT
    pointer (write-tmp + os.replace — one filesystem operation is the
    entire commit).  A crash anywhere before the rename leaves the
    previous snapshot committed and this one as removable garbage; after
    a successful commit, older snapshots and orphans are pruned.  Returns
    the snapshot name."""
    import json
    import os
    import shutil

    snap = f"snap_{batch_id}"
    snap_dir = os.path.join(out_dir, snap)
    if os.path.isdir(snap_dir):  # leftover from a crashed earlier attempt
        shutil.rmtree(snap_dir)
    for z, df in levels.items():
        df.write.mode("overwrite").parquet(os.path.join(snap_dir, f"z={z}"))
    tmp = os.path.join(out_dir, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        json.dump({"batch_id": int(batch_id), "snapshot": snap}, fh)
    os.replace(tmp, os.path.join(out_dir, "CURRENT"))  # THE commit point
    for name in os.listdir(out_dir):
        if name.startswith("snap_") and name != snap:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    return snap


def run_stream_to_pyramid(
    spark: SparkSession,
    src_dir: str,
    gazetteer: DataFrame,
    base_zoom: int,
    min_zoom: int,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """Streaming pyramid MAINTENANCE: each micro-batch burns its pages and
    incrementally updates the persisted pyramid via
    :func:`engine.raster.pyramid_delta_update` — only ancestors of tiles
    the batch touched are recomputed, so steady-state cost per batch is
    O(batch log pyramid), independent of corpus size.

    Persistence is a TRANSACTIONAL SNAPSHOT layout (the plain-parquet
    analog of an Iceberg table): every batch writes a complete new
    immutable snapshot ``out_dir/snap_<batch_id>/z=<zoom>`` and then
    commits it with ONE atomic rename of the ``CURRENT`` pointer file.
    There is no multi-directory swap window — a crash at ANY point before
    the pointer rename leaves ``CURRENT`` naming the previous snapshot, so
    the replayed batch (foreachBatch is at-least-once, the sink is
    additive) rebuilds from exactly the pre-batch state; a crash after the
    rename is detected by the pointer's recorded batch id and the replay
    is skipped.  Orphan snapshot dirs from crashes are garbage, removed on
    the next successful commit.  Read committed levels via
    :func:`read_pyramid_level` (which resolves the pointer), never the
    snapshot dirs directly.
    """
    import os

    from . import raster

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cur = pyramid_current(out_dir)
        if cur is not None and cur["batch_id"] >= batch_id:
            return  # replayed batch (at-least-once delivery): already committed
        tagged = geotag_all(batch_df, gazetteer)
        delta = raster.burn_base_tiles(tagged, base_zoom)
        if cur is not None:
            existing = {
                z: read_pyramid_level(spark, out_dir, z)
                for z in range(min_zoom, base_zoom + 1)
            }
            updated, _ = raster.pyramid_delta_update(existing, delta)
        else:
            updated = {base_zoom: delta}
            for z in range(base_zoom, min_zoom, -1):
                updated[z - 1] = raster.pyramid_reduce(updated[z])
        pyramid_snapshot_commit(out_dir, updated, batch_id)

    q = (
        stream_pages(spark, src_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
