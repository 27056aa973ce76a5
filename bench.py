#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "docs_per_sec": ..., "n_docs": ...}

The flagship number is spatial-join + tiling throughput in docs/sec
(BASELINE.json metric); scaling-efficiency evidence (same job at
local[8] vs local[32]) is produced by BENCH/scaling.py and recorded in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "600000"))


def main() -> None:
    from pyspark.sql import functions as F

    from posmspark import synth
    from posmspark.pipeline import run_pipeline
    from posmspark.relops import QUERIES
    from posmspark.session import get_spark

    spark = get_spark("posmspark-bench", cpus=CPUS)

    timings: dict[str, float] = {}

    # --- flagship: spatial-join + tiling over N_DOCS pages.
    # The pages table is materialized once (it models the pre-existing
    # Iceberg input table; generation is not part of the measured job),
    # then the pipeline runs scan -> extract -> geocode -> cell -> PIP
    # -> tiles as ONE action.
    import tempfile

    pages_path = os.path.join(tempfile.gettempdir(), f"bench_pages_{N_DOCS}")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        synth.pages_df(spark, N_DOCS, partitions=64).write.mode(
            "overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    # warmup: run the identical plan on a slice so JVM JIT / codegen /
    # Python worker pools are hot; the measured number is steady-state
    # throughput (what a long-running cluster job sees)
    warm = run_pipeline(spark, pages.limit(50_000))
    warm["tiles"].agg(F.count(F.lit(1))).collect()

    t0 = time.monotonic()
    out = run_pipeline(spark, pages)
    row = out["tiles"].agg(
        F.sum("doc_count").alias("n_assigned"),
        F.count(F.lit(1)).alias("n_tiles"),
    ).collect()[0]
    n_assigned, n_tiles = int(row["n_assigned"]), int(row["n_tiles"])
    wall = time.monotonic() - t0
    timings["pipeline_spatial_tiling"] = round(wall, 3)
    docs_per_sec = round(N_DOCS / wall, 1)

    # --- headline relational queries at SF_DIR
    # warm the input tables once (page cache + codegen), so per-query
    # numbers are steady-state throughput rather than first-touch I/O
    for t in ["documents", "embeddings", "orders", "customer", "lineitem",
              "events", "nation", "region", "supplier", "part"]:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    bench_queries = [
        "pricing_summary",
        "hierarchy_join",
        "window_running",
        "sessionize",
        "dedup_exact",
        "token_stats",
        "minhash_band_candidates",
        "ngram_jaccard_pairs",
        "ann_cosine_topk",
        "embedding_label_centroids",
    ]
    for name in bench_queries:
        fn, _sql = QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        # force full execution without driver materialization
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": docs_per_sec,
        "n_docs": N_DOCS,
        "n_assigned": n_assigned,
        "n_tiles": n_tiles,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
