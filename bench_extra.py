#!/usr/bin/env python
"""Per-stage isolation bench (guide §1.4: noop sink; §1.5: labeled jobs).

NOT part of the frozen driver contract — bench.py is the measured
entrypoint. This file exists to attribute time inside the expensive
queries and to A/B candidate rewrites.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [target]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, thunk):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    thunk()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:50s} {dt:7.3f}s", flush=True)
    return dt


def minhash_stages(spark):
    from pyspark.sql import functions as F

    from posmspark import dedup
    from posmspark.relops import NGRAM_MAX_SHINGLE_FREQ, _doc_shingles

    print("== minhash_band_candidates sub-stages (r06 grouped shape) ==")
    # warm input
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()

    sh = _doc_shingles(spark, SF_DIR)
    timed(spark, "shingles explode (spread scan)", lambda: noop(sh))

    grp = sh.groupBy("shingle").agg(
        F.slice(F.sort_array(F.collect_list("doc_id")), 1,
                NGRAM_MAX_SHINGLE_FREQ).alias("_ds"))
    timed(spark, "groupBy(shingle) capped doc lists", lambda: noop(grp))

    sigs = dedup.minhash_signatures(
        sh, n_bands=4, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ,
        portable_hash=True)
    timed(spark, "signatures (md5/distinct-shingle + doc min)",
          lambda: noop(sigs))

    cand = dedup.lsh_candidate_pairs(sigs)
    timed(spark, "full query (+bucket pair expand + distinct)",
          lambda: noop(cand))


def suite(spark):
    from pyspark.sql import functions as F

    from posmspark.relops import QUERIES
    from posmspark import session as _session

    for t in ["documents", "embeddings", "orders", "customer", "lineitem",
              "events", "nation", "region", "supplier", "part"]:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    names = sys.argv[2:] if len(sys.argv) > 2 else [
        "pricing_summary", "hierarchy_join", "window_running", "sessionize",
        "dedup_exact", "token_stats", "minhash_band_candidates",
        "ngram_jaccard_pairs", "ann_cosine_topk",
        "embedding_label_centroids"]
    print(f"== per-query (noop, {SF_DIR}) ==")
    for name in names:
        fn, _ = QUERIES[name]
        timed(spark, name, lambda: noop(fn(spark, SF_DIR)))


def main():
    from posmspark.session import get_spark

    spark = get_spark("posmspark-bench-extra", cpus=CPUS)
    target = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    if target == "minhash":
        minhash_stages(spark)
    elif target == "suite":
        suite(spark)


if __name__ == "__main__":
    main()
