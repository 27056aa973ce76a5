"""Structured Streaming plumbing tests: availableNow drain, checkpoint
resume (only NEW files processed), watermarked windowed tile counts,
batch/stream semantic parity via the shared transform."""

import os

import pytest
from pyspark.sql import functions as F

from posmspark import streaming, synth
from posmspark.joins import prepare_boundaries


@pytest.fixture(scope="module")
def prepared():
    return prepare_boundaries(synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf())


def test_stream_drain_and_resume(spark, prepared, tmp_path):
    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "tiles_out")
    ckpt = str(tmp_path / "ckpt")

    pages1 = synth.pages_df(spark, 500)
    pages1.write.mode("overwrite").parquet(pages_dir)
    schema = pages1.schema

    streaming.run_stream_once(pages_dir, out_dir, ckpt, prepared, spark, schema)
    n1 = spark.read.parquet(out_dir).agg(F.sum("doc_count")).collect()[0][0]
    assert n1 and n1 > 0

    # batch parity: same transform in batch mode gives the same doc total
    batch = streaming.transform_pages(
        spark.read.parquet(pages_dir), prepared, spark)
    assert batch.count() == n1

    # append NEW files only; rerun with the same checkpoint
    extra = synth.pages_df(spark, 300).withColumn(
        "url", F.concat(F.lit("https://new.example/"), F.col("url")))
    extra.write.mode("append").parquet(pages_dir)
    streaming.run_stream_once(pages_dir, out_dir, ckpt, prepared, spark, schema)
    n2 = spark.read.parquet(out_dir).agg(F.sum("doc_count")).collect()[0][0]
    extra_assigned = streaming.transform_pages(extra, prepared, spark).count()
    # the second drain processed ONLY the new files
    assert n2 == n1 + extra_assigned


def test_windowed_schema(spark, prepared, tmp_path):
    pages_dir = str(tmp_path / "pages_in2")
    pages = synth.pages_df(spark, 200)
    pages.write.mode("overwrite").parquet(pages_dir)
    stream = spark.readStream.schema(pages.schema).parquet(pages_dir)
    tiles = streaming.streaming_tile_counts(stream, prepared, spark)
    assert tiles.isStreaming
    assert set(tiles.columns) == {
        "window_start", "window_end", "cell", "osm_id_l0", "doc_count"}
