#!/usr/bin/env python
"""Data-scaling evidence for the dedup/near-dup operators (VERDICT r02
item 6): run the shuffle-heavy document queries at 600k and 6M synthetic
docs (10x) and report the wall-time growth factor per query.

The plans claim near-linearity (every candidate generator is an
equi-join on a derived key, hot keys capped by K-smallest sampling) —
this script is the empirical check: a 10x input must cost <= ~10x plus
a log factor, never ~100x (the quadratic signature).

Each size runs in a FRESH JVM (subprocess) on local[$SPARK_GRAFT_CPUS];
inputs are materialized once with a fixed 64-way split (write-time
partition count caps later scan parallelism) and re-used across runs.
--write-md appends the result table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_exact",
    "token_stats",
    "minhash_band_candidates",
    "minhash_verified_dups",
    "ngram_jaccard_pairs",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from posmspark.session import get_spark
from posmspark import synth
from posmspark.relops import QUERIES

n_docs = int(sys.argv[1])
names = json.loads(sys.argv[2])
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("posmspark-dedup-scaling", cpus=cpus)

sf_dir = os.path.join("/tmp", "bench_docs_%%d" %% n_docs)
tbl = os.path.join(sf_dir, "documents.parquet")
if not os.path.exists(os.path.join(tbl, "_SUCCESS")):
    synth.documents_df(spark, n_docs, partitions=64).write.mode(
        "overwrite").parquet(tbl)
spark.read.parquet(tbl).count()  # warm page cache + codegen

out = {}
for name in names:
    fn, _sql = QUERIES[name]
    # warm the plan shape on a small slice? No: fresh-JVM steady state is
    # close enough at these sizes; measure one full noop-write execution.
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    out[name] = round(time.monotonic() - t0, 2)
spark.catalog.clearCache()
print("RESULT " + json.dumps({"n_docs": n_docs, "queries": out,
                              "cpus": cpus}))
"""


def run_size(n_docs: int, names: list[str],
             cpus: int | None = None) -> dict:
    code = CHILD % {"repo": REPO}
    env = dict(os.environ)
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
    p = subprocess.run(
        [sys.executable, "-c", code, str(n_docs), json.dumps(names)],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-3000:])
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def run_core_scaling(n_docs: int, lo: int, hi: int, reps: int,
                     write_md: bool, queries: list[str] | None = None) -> None:
    """N -> 4N core-scaling evidence for the dedup family (VERDICT r03
    item 7): the flagship job's efficiency table (BENCH/scaling.py)
    only covers the spatial pipeline; this runs the shuffle-heavy dedup
    suite at local[lo] vs local[hi] on the SAME input, alternated
    back-to-back in one window (same-window pairs, best-of-K per level
    — the only measurement protocol that survives this host's
    CPU-steal noise), and reports per-query scaling efficiency
    speedup / (hi/lo)."""
    queries = queries or QUERIES
    best: dict[int, dict[str, float]] = {lo: {}, hi: {}}
    for rep in range(reps):
        for cpus in (lo, hi):  # alternate inside the same window
            r = run_size(n_docs, queries, cpus=cpus)
            for q, t in r["queries"].items():
                cur = best[cpus].get(q)
                best[cpus][q] = t if cur is None else min(cur, t)
            print(json.dumps({"rep": rep, **r}), flush=True)
    factor = hi / lo
    lines = [
        "",
        f"## Dedup/near-dup core scaling (local[{lo}] -> local[{hi}], "
        f"{n_docs:,} docs, same-window alternated pairs, "
        f"best-of-{reps}, fresh JVM per run)",
        "",
        f"| query | t @ local[{lo}] | t @ local[{hi}] | speedup |"
        f" efficiency (>=0.8) |",
        "|---|---|---|---|---|",
    ]
    for q in queries:
        sp = best[lo][q] / max(best[hi][q], 1e-9)
        lines.append(
            f"| {q} | {best[lo][q]:.2f}s | {best[hi][q]:.2f}s"
            f" | {sp:.2f}x | {sp / factor:.3f} |")
    lines.append("")
    md = "\n".join(lines)
    print(md)
    if write_md:
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(md + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="600000,6000000")
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--core-pair", default=None,
                    help="'2,8': run the N->4N core-scaling mode at the "
                         "first --sizes entry instead of data scaling")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of the query list")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    names = args.queries.split(",") if args.queries else QUERIES
    if args.core_pair:
        lo, hi = (int(x) for x in args.core_pair.split(","))
        run_core_scaling(sizes[0], lo, hi, args.reps, args.write_md,
                         queries=names)
        return

    results = [run_size(n, names) for n in sizes]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        factor = hi["n_docs"] / lo["n_docs"]
        lines = [
            "",
            f"## Dedup/near-dup data scaling ({lo['n_docs']:,} -> "
            f"{hi['n_docs']:,} docs, {factor:.0f}x, "
            f"local[{hi['cpus']}], fresh JVM per size)",
            "",
            "| query | t @ {:,} | t @ {:,} | growth (x) | linear would be |"
            .format(lo["n_docs"], hi["n_docs"]),
            "|---|---|---|---|---|",
        ]
        for q in names:
            g = hi["queries"][q] / max(lo["queries"][q], 1e-9)
            lines.append(
                f"| {q} | {lo['queries'][q]:.2f}s | {hi['queries'][q]:.2f}s"
                f" | {g:.1f}x | {factor:.0f}x |")
        lines.append("")
        md = "\n".join(lines)
        print(md)
        if args.write_md:
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.write(md + "\n")


if __name__ == "__main__":
    main()
