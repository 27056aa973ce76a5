"""Shapefile source tests (S3): .shp/.dbf/.zip round-trip of the full
boundary fixture, semantic equality of the prepared hierarchy, and
hole/orientation handling."""

import numpy as np
import pandas as pd

from posmspark import geom, shp, synth
from posmspark.joins import prepare_boundaries


def _fixture_zip(path: str) -> pd.DataFrame:
    bpdf = synth.gen_boundaries_pdf()
    polys_list = [geom.wkb_to_multipolygon(b) for b in bpdf.geom_wkb]
    attrs = pd.DataFrame({
        "OSM_ID": bpdf.osm_id,
        "NAME": bpdf.name,
        "NAME_EN": bpdf.name_en,
        "ADMIN_LVL": bpdf.admin_level,
        "ISO3166": bpdf.iso3166,
        "BOUNDARY": bpdf.boundary,
    })
    shp.write_shapefile_zip(path, polys_list, attrs)
    return bpdf


def test_shp_polygon_roundtrip_exact():
    """Valid polygons (incl. the holed R2100) round-trip ring-exact
    through .shp bytes."""
    bpdf = synth.gen_boundaries_pdf()
    keep = bpdf[bpdf.osm_id.isin(["R1000", "R2100", "R3000"])]
    polys_list = [geom.wkb_to_multipolygon(b) for b in keep.geom_wkb]
    data = shp.write_shp_polygons(polys_list)
    back = shp.read_shp_polygons(data)
    assert [r for r, _ in back] == [1, 2, 3]
    for (rec, got), exp in zip(back, polys_list):
        assert len(got) == len(exp)
        for gp, ep in zip(got, exp):
            assert len(gp) == len(ep)
            for gr, er in zip(gp, ep):
                assert np.array_equal(gr, er), rec


def test_dbf_roundtrip_unicode_and_nulls():
    pdf = pd.DataFrame({
        "OSM_ID": ["R1", "R2"],
        "NAME": ["नेपाल", None],
        "ADMIN_LVL": ["2", "4"],
    })
    back = shp.read_dbf(shp.write_dbf(pdf))
    assert list(back.OSM_ID) == ["R1", "R2"]
    assert back.NAME[0] == "नेपाल" and back.NAME[1] is None
    assert list(back.ADMIN_LVL) == ["2", "4"]


def test_shapefile_zip_prepares_identical_hierarchy(tmp_path):
    """The full fixture through the zip source must prepare the SAME
    hierarchy (levels, problems, geometry) as the in-memory fixture —
    extract_gadm.py:32-40 parity."""
    zp = str(tmp_path / "fixture.zip")
    bpdf = _fixture_zip(zp)
    back = shp.boundaries_from_shapefile_zip(zp)
    assert list(back.osm_id) == list(bpdf.osm_id)
    assert list(back.admin_level) == list(bpdf.admin_level)

    mapping = synth.gen_admin_mapping_pdf()
    pa = prepare_boundaries(bpdf, mapping, n_levels=4)
    pb = prepare_boundaries(back, mapping, n_levels=4)

    la = pa.levels_pdf.sort_values("osm_id").reset_index(drop=True)
    lb = pb.levels_pdf.sort_values("osm_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(la, lb)

    assert set(pa.problems_pdf.osm_id) == set(pb.problems_pdf.osm_id)
    assert set(pa.polys_by_id) == set(pb.polys_by_id)
    for oid, polys in pa.polys_by_id.items():
        got = pb.polys_by_id[oid]
        assert len(got) == len(polys)
        for gp, ep in zip(got, polys):
            for gr, er in zip(gp, ep):
                assert np.array_equal(gr, er), oid


def test_shp_roundtrip_random_fuzz():
    """r03 fuzz (bounded): random multi-part multipolygons with holes
    at irrational coords must survive the write->read round trip
    (200-seed external run clean; 30 pinned)."""
    from posmspark import geom

    def rand_ring(rng, cx, cy, r0, ccw):
        k = rng.integers(4, 10)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.3, 1.0, k) * r0
        ring = np.column_stack(
            [cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        if (geom.ring_area(ring) > 0) != ccw:
            ring = ring[::-1].copy()
        return ring

    def canon(ps):
        return sorted(
            tuple(map(tuple, np.round(r, 9))) for rr in ps for r in rr)

    for seed in range(30):
        rng = np.random.default_rng(seed)
        polys_list = []
        for _f in range(rng.integers(1, 4)):
            polys = []
            for _p in range(rng.integers(1, 3)):
                cx = rng.uniform(-170, 170)
                cy = rng.uniform(-80, 80)
                outer = rand_ring(rng, cx, cy,
                                  rng.uniform(1, 5) * np.pi / 3, ccw=True)
                rings = [outer]
                if rng.random() < 0.5:
                    rings.append(rand_ring(rng, cx, cy, 0.2, ccw=False))
                polys.append(rings)
            polys_list.append(polys)
        back = shp.read_shp_polygons(shp.write_shp_polygons(polys_list))
        assert len(back) == len(polys_list), seed
        for (_rid, polys), orig in zip(back, polys_list):
            assert canon(polys) == canon(orig), seed
