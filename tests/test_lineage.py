"""Checkpoint/resume + per-partition lineage tests (SURVEY.md §2.8:
stage manifests; kill-and-resume semantics; north-rule lineage rows)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from posmspark import lineage, synth
from posmspark.pipeline import run_pipeline


def test_stage_writes_manifest_and_resumes(spark, tmp_path):
    out_dir = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    df1 = lineage.run_stage(spark, "s1", "fp-abc", out_dir, build)
    assert df1.count() == 100 and calls["n"] == 1

    man = lineage.read_manifest(out_dir)
    assert man["stage"] == "s1"
    assert man["input_fingerprint"] == "fp-abc"
    assert man["n_rows"] == 100
    assert sum(p["rows"] for p in man["partitions"]) == 100
    assert all("partition_id" in p for p in man["partitions"])

    # same fingerprint -> resume from checkpoint, no recompute
    df2 = lineage.run_stage(spark, "s1", "fp-abc", out_dir, build)
    assert df2.count() == 100 and calls["n"] == 1

    # changed input fingerprint -> recompute
    df3 = lineage.run_stage(spark, "s1", "fp-DIFFERENT", out_dir, build)
    assert df3.count() == 100 and calls["n"] == 2


def test_killed_stage_recomputes(spark, tmp_path):
    """A stage killed mid-write leaves parquet but no manifest -> the
    rerun recomputes instead of trusting a torn checkpoint."""
    out_dir = str(tmp_path / "stage2")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    lineage.run_stage(spark, "s2", "fp", out_dir, build)
    os.remove(os.path.join(out_dir, lineage.MANIFEST))  # simulate kill
    lineage.run_stage(spark, "s2", "fp", out_dir, build)
    assert calls["n"] == 2
    assert lineage.read_manifest(out_dir)["n_rows"] == 10


def test_pipeline_checkpoint_resume_identical(spark, tmp_path):
    """Full pipeline: second run resumes from checkpoints and the tile
    assignments are identical (north-rule resume invariant)."""
    pages = synth.pages_df(spark, 1000)
    fp = "pages-1000-v1"
    wd = str(tmp_path / "wd")

    out1 = run_pipeline(spark, pages, workdir=wd, input_fingerprint=fp)
    tiles1 = sorted(map(tuple, out1["tiles"].collect()))

    # manifests exist for every stage
    for st in ["stage_ingest", "stage_assign", "stage_tiles"]:
        man = lineage.read_manifest(os.path.join(wd, st))
        assert man is not None and man["input_fingerprint"] == fp

    # resume: stages must be read back, not recomputed — verify by
    # poisoning nothing but checking object identity via manifest mtimes
    mtimes = {
        st: os.path.getmtime(os.path.join(wd, st, lineage.MANIFEST))
        for st in ["stage_ingest", "stage_assign", "stage_tiles"]
    }
    out2 = run_pipeline(spark, pages, workdir=wd, input_fingerprint=fp)
    tiles2 = sorted(map(tuple, out2["tiles"].collect()))
    assert tiles1 == tiles2
    for st, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(wd, st, lineage.MANIFEST)) == mt


def test_fingerprint_df_order_insensitive(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 3)
    a = lineage.fingerprint_df(df)
    b = lineage.fingerprint_df(df.repartition(7))
    assert a == b
    c = lineage.fingerprint_df(df.withColumn("v", F.col("id") * 4))
    assert a != c
