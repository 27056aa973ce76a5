"""10k-synthetic-boundary prepare_boundaries build benchmark.

VERDICT r01 item 8: the boundary build must survive planet scale
(~100k admin features). Round 1 used a per-candidate linear scan over
every parent polygon with full Python PIP per probe — O(candidates x
parents). Round 2 replaced it with the engine's own cell-cover
first-match index (FULL-cell winner + insert-order boundary
candidates), so a candidate costs one searchsorted probe plus exact
PIP only in boundary cells.

Usage: python BENCH/boundary_build.py [n_countries]
Generates a nested grid: n_countries countries x 16 states x 36
counties (~10.6k features for 20 countries), builds the hierarchy,
and prints one JSON line with wall seconds + feature counts.
"""

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from posmspark import geom  # noqa: E402
from posmspark.joins import prepare_boundaries  # noqa: E402
from posmspark.synth import rect  # noqa: E402


def gen_grid_boundaries(n_countries: int = 20) -> pd.DataFrame:
    """Nested rect grid: countries 8x8 deg, 4x4 states each, 6x6
    counties per state -> 1 + 16 + 576 features per country."""
    rows = []
    order = iter(range(10_000_000))

    def row(osm_id, tag, polys):
        return {
            "osm_id": osm_id, "name": osm_id, "name_en": osm_id,
            "admin_level": tag, "iso3166": None,
            "boundary": "administrative",
            "geom_wkb": geom.multipolygon_to_wkb(polys),
            "insert_order": next(order),
        }

    per_row = 18  # countries per lon row (18*8=144 deg of lon)
    for c in range(n_countries):
        cx = (c % per_row) * 10.0 - 90.0
        cy = (c // per_row) * 10.0 - 40.0
        rows.append(row(f"C{c}", "2", [[rect(cx, cy, cx + 8, cy + 8)]]))
        for s in range(16):
            sx = cx + (s % 4) * 2.0
            sy = cy + (s // 4) * 2.0
            rows.append(
                row(f"C{c}S{s}", "4", [[rect(sx, sy, sx + 2, sy + 2)]]))
            for k in range(36):
                kx = sx + (k % 6) * (2.0 / 6)
                ky = sy + (k // 6) * (2.0 / 6)
                rows.append(row(
                    f"C{c}S{s}K{k}", "6",
                    [[rect(kx, ky, kx + 2.0 / 6, ky + 2.0 / 6)]]))
    return pd.DataFrame(rows)


def main():
    n_countries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    bpdf = gen_grid_boundaries(n_countries)
    mapping = pd.DataFrame(
        [], columns=["country_osm_id", "admin_level_1", "admin_level_2"])
    t0 = time.perf_counter()
    prepared = prepare_boundaries(bpdf, mapping)
    dt = time.perf_counter() - t0
    counts = prepared.levels_pdf.groupby("adminlevel").size().to_dict()
    expected = {0: n_countries, 1: 16 * n_countries, 2: 576 * n_countries}
    assert {int(k): int(v) for k, v in counts.items()} == expected, (
        counts, expected)
    print(json.dumps({
        "metric": "boundary_build_wall_sec",
        "value": round(dt, 2),
        "unit": "sec",
        "n_features": int(len(bpdf)),
        "levels": {str(k): int(v) for k, v in counts.items()},
        "cover_cells": int(len(prepared.cover_pdf)),
    }))


if __name__ == "__main__":
    main()
