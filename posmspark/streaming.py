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
    ok = textx.with_ingest_jvm(pages).filter(F.col("text_ok")).drop("text_ok")
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


DEDUP_OUT_SCHEMA = ("content_hash string, url string,"
                    " warc_ts timestamp, text string")


def dedup_stream(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: first-seen content dedup.

    A crawl stream re-delivers identical page content under refetches;
    this keeps exactly the FIRST occurrence of each content hash across
    the whole stream lifetime, implemented with applyInPandasWithState
    (GroupState per content_hash). State per key is one marker row, so
    the state store stays O(distinct contents) — the streaming analog
    of the batch exact-dedup groupBy.

    Within a batch, "first" is deterministic: min (warc_ts, url).
    """
    keyed = pages_stream.withColumn(
        "content_hash", F.sha2(F.col("text").cast("binary"), 256)
    ).select("content_hash", "url", "warc_ts", "text")

    def first_seen(key, pdf_iter, state):
        if state.exists:
            for _ in pdf_iter:  # drain: all rows are re-deliveries
                pass
            return
        best = None
        for pdf in pdf_iter:
            cand = pdf.sort_values(["warc_ts", "url"]).head(1)
            if best is None or (
                tuple(cand.iloc[0][["warc_ts", "url"]])
                < tuple(best.iloc[0][["warc_ts", "url"]])
            ):
                best = cand
        state.update((1,))
        yield best

    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("content_hash").applyInPandasWithState(
        first_seen,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream_once(pages_dir: str, out_dir: str,
                          checkpoint_dir: str, spark: SparkSession,
                          schema) -> None:
    """Drain-and-stop runner for dedup_stream; rerunning with the same
    checkpoint continues the SAME state store, so a content hash first
    seen in run 1 stays deduped in run 2 (tested)."""
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


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
