#!/usr/bin/env python
"""Data-scaling evidence for the ANN family (VERDICT r04 item 4): run
lsh_topk / ivf_topk / cosine_near_pairs at 80k and 800k vectors (10x)
and report wall-time growth per op.

The plans claim bounded candidate generation (signature/cell equi-joins,
bucket-sized candidate sets, driver-bounded IVF training) — the dedup
family's equivalent bench (dedup_scaling.py) is what flushed out its
two real scale bugs (driver-broadcast OOM, uncapped buckets), so the
ANN ops get the same empirical check: 10x input must cost <= ~10x plus
a log factor, never ~100x.

Each size runs in a FRESH JVM on local[$SPARK_GRAFT_CPUS]; inputs are
materialized once (64-way split) and reused. --write-md appends the
growth table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Default 10x suite. `cosine_near_pairs` (exact grid-block) is
#: dispatchable via --ops but excluded from the default: its axis
#: projection stops pruning on high-dim near-isotropic embeddings
#: (measured 129s at just 8k vectors, ~quadratic — THE finding that
#: motivated ann.cosine_near_pairs_lsh, the scale path benched here).
OPS = ["lsh_topk", "ivf_topk", "ivf_probe_topk", "cosine_near_pairs_lsh"]

CHILD = r"""
import json, os, sys, time
import numpy as np
import pandas as pd
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from posmspark.session import get_spark
from posmspark import ann

n_vec = int(sys.argv[1])
ops = json.loads(sys.argv[2])
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("posmspark-ann-scaling", cpus=cpus)

DIM = 64
tbl = os.path.join("/tmp", "bench_emb_%%d" %% n_vec, "embeddings.parquet")
if not os.path.exists(os.path.join(tbl, "_SUCCESS")):
    # deterministic synthetic embeddings: 64 portable md5-ish draws per
    # vec_id via xxhash64 (JVM-side, no Python in the generator), plus
    # every 5th vector gets a perturbed near-dup twin so
    # cosine_near_pairs has real pairs to find at every size
    base = spark.range(n_vec).select(F.col("id").alias("vec_id"))
    emb = F.expr(
        "transform(sequence(1, %%d),"
        " i -> CAST(pmod(xxhash64(vec_id * 1000 + i), 2000) - 1000"
        "       AS DOUBLE) / CAST(1000 AS DOUBLE))" %% DIM)
    base = base.select("vec_id", emb.alias("embedding"))
    pert = base.filter(F.col("vec_id") %% 5 == 0).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.expr(
            "transform(sequence(1, size(embedding)),"
            " i -> element_at(embedding, i)"
            "      * (CAST(1.0 AS DOUBLE)"
            "         + CAST(0.0001 AS DOUBLE) * CAST(i %% 7 - 3 AS DOUBLE)))"
        ).alias("embedding"))
    base.unionByName(pert).repartition(64).write.mode(
        "overwrite").parquet(tbl)
vecs = spark.read.parquet(tbl)
vecs.count()  # warm page cache + codegen

qrows = vecs.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
queries = pd.DataFrame({
    "query_id": [str(r["vec_id"]) for r in qrows],
    "embedding": [np.array(r["embedding"], dtype=np.float64)
                  for r in qrows],
})

out = {}
for op in ops:
    t0 = time.monotonic()
    if op == "lsh_topk":
        df = ann.lsh_topk(vecs, queries, k=10, spark=spark, dim=DIM,
                          n_planes=12, n_tables=4)
    elif op == "ivf_topk":
        df = ann.ivf_topk(vecs, queries, k=10, spark=spark,
                          n_centroids=64, n_probe=8)
    elif op == "ivf_probe_topk":
        # the oracle-checked sibling: data-derived codebook baked into
        # one map-only argmax expression — 16 cells keeps the literal
        # expression tree bounded (the by-design regime; a trained
        # 64-cell codebook belongs to ivf_topk's broadcast path)
        df = ann.ivf_probe_topk_exact(vecs, spark, k=10, n_centroids=16,
                                      n_probe=4, query_lo=100,
                                      n_queries=8)
    elif op == "cosine_near_pairs_lsh":
        df = ann.cosine_near_pairs_lsh(
            vecs, threshold=0.99, spark=spark, dim=DIM,
            id_col="vec_id", emb_col="embedding",
            n_planes=None, n_tables=8)  # auto ~log2(n) signature width
    elif op == "cosine_near_pairs":
        df = ann.cosine_near_pairs(vecs, threshold=0.99,
                                   emb_col="embedding")
    else:
        # a typo'd --ops name must not silently fall through to the
        # quadratic exact path and report its timing under the typo
        raise ValueError("unknown op: %%r" %% op)
    df.write.format("noop").mode("overwrite").save()
    out[op] = round(time.monotonic() - t0, 2)
spark.catalog.clearCache()
print("RESULT " + json.dumps({"n_vec": n_vec, "queries": out,
                              "cpus": cpus}))
"""


def run_size(n_vec: int, ops: list[str], cpus: int | None = None) -> dict:
    code = CHILD % {"repo": REPO}
    env = dict(os.environ)
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
    p = subprocess.run(
        [sys.executable, "-c", code, str(n_vec), json.dumps(ops)],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-3000:])
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="80000,800000")
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--ops", default=None)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    ops = args.ops.split(",") if args.ops else OPS

    results = [run_size(n, ops) for n in sizes]
    for r in results:
        print(json.dumps(r), flush=True)
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        factor = hi["n_vec"] / lo["n_vec"]
        lines = [
            "",
            f"## ANN data scaling ({lo['n_vec']:,} -> {hi['n_vec']:,} "
            f"vectors (+20% perturbed twins), {factor:.0f}x, "
            f"local[{hi['cpus']}], fresh JVM per size)",
            "",
            "| op | t @ {:,} | t @ {:,} | growth (x) | linear would be |"
            .format(lo["n_vec"], hi["n_vec"]),
            "|---|---|---|---|---|",
        ]
        for op in ops:
            g = hi["queries"][op] / max(lo["queries"][op], 1e-9)
            lines.append(
                f"| {op} | {lo['queries'][op]:.2f}s | {hi['queries'][op]:.2f}s"
                f" | {g:.1f}x | {factor:.0f}x |")
        lines.append("")
        md = "\n".join(lines)
        print(md)
        if args.write_md:
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.write(md + "\n")


if __name__ == "__main__":
    main()
