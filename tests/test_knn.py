"""kNN tests: cell-ring expansion join must return exactly the same
neighbors as the brute-force oracle (SURVEY.md O16)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from posmspark import geom, synth
from posmspark.joins import knn_bruteforce, knn_cellring, prepare_boundaries
from posmspark.textx import with_geocode


@pytest.fixture(scope="module")
def sites():
    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    return pd.DataFrame(
        [
            {"site_id": oid, "lon": lon, "lat": lat}
            for oid, (lon, lat) in (
                (oid, geom.representative_point(polys))
                for oid, polys in sorted(prepared.polys_by_id.items())
            )
        ]
    )


@pytest.fixture(scope="module")
def points(spark):
    pages = synth.pages_df(spark, 800)
    return (
        with_geocode(pages)
        .filter(F.col("lat").isNotNull())
        .select("url", "lon", "lat")
        .cache()
    )


def test_cellring_equals_bruteforce(spark, points, sites):
    k = 3
    brute = knn_bruteforce(points, sites, k, spark)
    ring = knn_cellring(points, sites, k, spark)
    b = {r["url"]: [(e["site_id"], round(e["dist_m"], 6)) for e in r["knn"]]
         for r in brute.collect()}
    g = {r["url"]: [(e["site_id"], round(e["dist_m"], 6)) for e in r["knn"]]
         for r in ring.collect()}
    assert set(b) == set(g)
    mismatches = {u: (b[u], g[u]) for u in b if b[u] != g[u]}
    assert not mismatches, list(mismatches.items())[:3]


def test_knn_distances_match_haversine(spark, points, sites):
    out = knn_bruteforce(points.limit(50), sites, 1, spark).collect()
    for r in out:
        nn = r["knn"][0]
        srow = sites[sites.site_id == nn["site_id"]].iloc[0]
        d = float(geom.haversine_m(r["lon"], r["lat"], srow.lon, srow.lat))
        assert nn["dist_m"] == pytest.approx(d, rel=1e-12)


def test_knn_k_larger_than_sites(spark, points, sites):
    k = len(sites) + 5
    out = knn_bruteforce(points.limit(10), sites, k, spark).collect()
    for r in out:
        assert len(r["knn"]) == len(sites)
