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
