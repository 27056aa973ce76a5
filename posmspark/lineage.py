"""Checkpoint-resumable stages with per-partition lineage metrics.

The reference's resilience story is per-feature try/except with
DELETE-and-continue plus a timing log table
(/root/reference/extractor/postgis_sql/proc_functions.sql:20,47-52,74-78)
and batch re-runs via osmupdate diffs (POSMmanagement/osmdata.py:87-134).
Our Spark restatement (SURVEY.md §2.8): every pipeline stage writes
Parquet + a _manifest.json carrying

  {stage, input_fingerprint, n_rows, n_partitions,
   partitions: [{partition_id, rows}...], wall_ms}

A rerun whose (stage, input_fingerprint) matches an existing manifest
skips the stage and reads the checkpoint — resume-from-any-stage. The
per-partition row counts are the north rule's lineage metrics; at
cluster scale they come from one cheap groupBy(spark_partition_id())
over the just-written output.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def read_manifest(out_dir: str) -> dict | None:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts of a materialized DataFrame."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": int(r["partition_id"]), "rows": int(r["count"])}
            for r in rows]


def run_stage(
    spark: SparkSession,
    stage: str,
    input_fingerprint: str,
    out_dir: str,
    build: "callable",
    force: bool = False,
) -> DataFrame:
    """Run (or resume) one checkpointed stage.

    build() -> DataFrame is only invoked on a cache miss. The stage is
    atomic: parquet lands first, the manifest last, so a killed run
    leaves no manifest and simply recomputes (kill-and-resume test).
    """
    man = read_manifest(out_dir)
    if not force and man and man.get("input_fingerprint") == input_fingerprint \
            and man.get("stage") == stage:
        return spark.read.parquet(out_dir)

    t0 = time.monotonic()
    df = build()
    df.write.mode("overwrite").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    lineage = partition_lineage(out)
    manifest = {
        "stage": stage,
        "input_fingerprint": input_fingerprint,
        "n_rows": sum(p["rows"] for p in lineage),
        "n_partitions": len(lineage),
        "partitions": lineage,
        "wall_ms": int((time.monotonic() - t0) * 1000),
    }
    with open(_manifest_path(out_dir), "w") as f:
        json.dump(manifest, f, indent=1)
    return out


def fingerprint_df(df: DataFrame, sample_cols: list[str] | None = None) -> str:
    """Cheap content fingerprint: row count + xor of value hashes.

    Used to decide stage-reuse; the xor aggregate is order-insensitive
    and distributes as one map-side-combinable aggregation.
    """
    cols = sample_cols or df.columns
    h = df.select(F.xxhash64(*[F.col(c) for c in cols]).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(h)").alias("s"),  # order-insensitive, overflow-free
    ).collect()[0]
    return f"{h['n']}:{h['s']}"
