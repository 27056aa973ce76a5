#!/usr/bin/env python
"""Same-window A/B of the headline bench: current tree vs a pinned
older commit (default: the round-4 final, d04ee33), alternated
old/new/old/new with best-of-K per side (VERDICT r04 item 8).

Cross-round BENCH_r{N}.json suite numbers on this host are confounded
by CPU steal (identical binaries swing up to 2.5x across windows —
BENCH/BASELINE.md "Noise disclosure"); the valid statistic is a pair
measured in the SAME window. This script produces that pair for the
whole headline suite so any r04->r05 delta can be attributed to code
vs host.

Usage: python BENCH/ab_headline.py [--old-tree /tmp/r04tree] [--reps 2]
Expects the old tree to be a git worktree of the pinned commit
(git worktree add /tmp/r04tree d04ee33). Each run is a FRESH JVM via
each tree's own bench.py; both trees share the same /tmp bench_pages
materialization and the same $SPARK_GRAFT_SF_DIR input.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True, text=True, timeout=3600,
        cwd=tree,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-3000:])
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-tree", default="/tmp/r04tree")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    runs: dict[str, list[dict]] = {"old": [], "new": []}
    for rep in range(args.reps):
        for side, tree in (("old", args.old_tree), ("new", REPO)):
            r = run_bench(tree)
            runs[side].append(r)
            print(f"{side} rep {rep}: total={r['value']}s "
                  f"docs/s={r['docs_per_sec']} "
                  f"n_assigned={r['n_assigned']} n_tiles={r['n_tiles']}",
                  flush=True)

    best = {s: min(runs[s], key=lambda r: r["value"]) for s in runs}
    # invariance gate: outputs must be identical across sides and reps
    invariant = len({(r["n_assigned"], r["n_tiles"])
                     for rs in runs.values() for r in rs}) == 1

    queries = sorted(best["new"]["queries"])
    lines = [
        "",
        f"### r05 headline A/B vs r04 binary (same window, alternated, "
        f"best-of-{args.reps}, fresh JVM per run, local[{best['new']['cpus']}],"
        f" sf{best['new']['sf']})",
        "",
        "| query | r04 (d04ee33) | r05 (this tree) | delta |",
        "|---|---|---|---|",
    ]
    for q in queries:
        o = best["old"]["queries"].get(q)
        n = best["new"]["queries"][q]
        d = f"{(n / o - 1) * 100:+.0f}%" if o else "new"
        o_s = f"{o:.2f}s" if o else "—"
        lines.append(f"| {q} | {o_s} | {n:.2f}s | {d} |")
    ot, nt = best["old"]["value"], best["new"]["value"]
    lines.append(f"| **suite total** | **{ot:.2f}s** | **{nt:.2f}s** | "
                 f"**{(nt / ot - 1) * 100:+.0f}%** |")
    lines.append("")
    lines.append(f"Result invariance across sides/reps: "
                 f"{'IDENTICAL' if invariant else 'MISMATCH (BUG)'} "
                 f"(n_assigned={best['new']['n_assigned']}, "
                 f"n_tiles={best['new']['n_tiles']}).")
    md = "\n".join(lines)
    print(md)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md + "\n")


if __name__ == "__main__":
    main()
