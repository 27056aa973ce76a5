"""Structured Streaming ingest for the pages table.

The reference's temporal story is batch re-runs over osmupdate diffs
(/root/reference/POSMmanagement/osmdata.py:87-134, auto_update_osm.sh);
the engine's primary resume mechanism is therefore checkpointed batch
stages (lineage.py). This module adds the genuinely-streaming variant
for continuous crawl ingestion: readStream -> the SAME transformation
chain (extract -> geocode -> cell -> broadcast PIP) -> windowed tile
aggregation with watermarked late-data handling.

The batch and streaming paths share one transformation function
(transform_pages), so semantics are tested once in batch (the oracle
suite) and the streaming test only asserts plumbing: schema, watermark,
output mode, incremental tile updates via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posmspark import textx
from posmspark.joins import PreparedBoundaries, pip_join


def transform_pages(pages: DataFrame, prepared: PreparedBoundaries,
                    spark: SparkSession) -> DataFrame:
    """Shared batch/streaming transformation: pages -> assigned points.
    Identical semantics to pipeline.run_pipeline's ingest+assign stages.
    """
    ok = textx.with_ingest(pages).filter(F.col("text_ok")).drop("text_ok")
    pts = ok.filter(F.col("lat").isNotNull()).select(
        "url", "warc_ts", "lang", "lon", "lat", "cell"
    )
    return pip_join(pts, prepared, spark, keep_unmatched=False)


def streaming_tile_counts(pages_stream: DataFrame,
                          prepared: PreparedBoundaries,
                          spark: SparkSession,
                          watermark: str = "10 minutes",
                          window: str = "5 minutes") -> DataFrame:
    """Watermarked windowed tile aggregation over a pages stream.

    Late pages beyond the watermark are dropped (state is bounded);
    output rows: (window, cell, osm_id_l0, doc_count). Broadcast PIP
    keeps the stream map-only until this single stateful aggregation.
    """
    assigned = transform_pages(pages_stream, prepared, spark)
    return (
        assigned.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            "cell", "osm_id_l0",
        )
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "cell", "osm_id_l0", "doc_count",
        )
    )


def run_stream_once(pages_dir: str, out_dir: str, checkpoint_dir: str,
                    prepared: PreparedBoundaries, spark: SparkSession,
                    schema) -> None:
    """File-source stream processed with availableNow (drain-and-stop):
    the streaming-resume analog of the batch checkpoints — re-running
    with the same checkpoint_dir only processes NEW files."""
    stream = (
        spark.readStream.schema(schema).parquet(pages_dir)
    )
    tiles = streaming_tile_counts(stream, prepared, spark)
    q = (
        tiles.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
