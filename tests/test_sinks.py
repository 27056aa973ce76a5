"""Sink tests: .poly byte-format golden (vs the layout of the reference
fixture poly files), GeoJSON feature rows, partitioned write fan-out."""

import json
import re

import numpy as np
import pytest

from posmspark import geom, sinks, synth
from posmspark.joins import prepare_boundaries

COORD_RE = re.compile(r"^   -?\d\.\d{6}E[+-]\d{2}   -?\d\.\d{6}E[+-]\d{2}$")


@pytest.fixture(scope="module")
def prepared():
    return prepare_boundaries(synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf())


def test_format_poly_layout():
    polys = [
        [synth.rect(0, 0, 10, 10),
         synth.rect(2, 2, 4, 4)[::-1].copy()],  # one hole
        [synth.rect(20, 0, 25, 5)],
    ]
    text = sinks.format_poly("AA_R1000", polys)
    lines = text.split("\n")
    assert lines[0] == "AA_R1000"
    assert lines[1] == "1"  # outer ring of polygon 1
    # 5 coord lines then END
    for ln in lines[2:7]:
        assert COORD_RE.match(ln), ln
    assert lines[7] == "END"
    assert lines[8] == "!2"  # hole ring
    assert lines[14] == "END"
    assert lines[15] == "1"  # polygon 2 outer restarts at 1
    assert lines[21] == "END"
    assert lines[22] == "END"  # final terminator
    assert lines[23] == "" and text.endswith("END\n")


def test_format_poly_exact_coordinate_bytes():
    """'%.6E' byte format (extract_poly.py:135): e.g. 79.92192 ->
    '7.992192E+01' exactly like the reference poly files."""
    ring = np.array([[79.92192, 28.83425], [80.0, 29.0],
                     [79.92192, 29.0], [79.92192, 28.83425]])
    text = sinks.format_poly("NP_TEST", [[ring]])
    assert "   7.992192E+01   2.883425E+01" in text
    assert "   8.000000E+01   2.900000E+01" in text


def test_prepare_outline_contains_original():
    """checkGeom invariant (extract_poly.py:51-69): the buffered+
    simplified outline must contain every original vertex."""
    theta = np.linspace(0, 2 * np.pi, 200)
    ring = np.stack([10 + 3 * np.cos(theta) + 0.3 * np.cos(7 * theta),
                     5 + 3 * np.sin(theta) + 0.3 * np.sin(5 * theta)], axis=1)
    ring[-1] = ring[0]
    out = sinks.prepare_outline([[ring]], 0.1, 0.05)
    pts = ring
    assert geom.points_in_rings(pts[:, 0], pts[:, 1], out[0]).all()
    # and it actually simplified
    assert len(out[0][0]) < len(ring)


def test_poly_export_df(spark, prepared):
    df = sinks.poly_export_df(spark, prepared, level=0)
    rows = {r["osm_id"]: r for r in df.collect()}
    assert set(rows) == {"R1000", "R2000", "R3000"}
    assert rows["R2000"]["poly_name"] == "NP_R2000"
    body = rows["R1000"]["poly_text"].split("\n")
    assert body[0] == "AA_R1000" and body[1] == "1"
    assert all(COORD_RE.match(l) for l in body[2:-3])
    assert body[-3] == "END" and body[-2] == "END"


def test_geojson_feature_df(spark, prepared):
    df = sinks.geojson_feature_df(spark, prepared)
    feats = [json.loads(r["feature_json"]) for r in df.collect()]
    by_id = {f["properties"]["osm_id"]: f for f in feats}
    assert by_id["R2000"]["properties"]["name"] == "नेपाल"
    assert by_id["R1100"]["properties"]["is_in"] == "R1000"
    g = by_id["R2100"]["geometry"]
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"][0]) == 2  # outer + hole


def test_partitioned_fanout(spark, prepared, tmp_path):
    """O10: one partitioned write replaces the reference's 10 passes."""
    df = prepared.levels_df(spark)
    sinks.write_partitioned(df, str(tmp_path / "levels"), "adminlevel")
    import os

    dirs = sorted(
        d for d in os.listdir(tmp_path / "levels") if d.startswith("adminlevel=")
    )
    assert dirs == ["adminlevel=0", "adminlevel=1", "adminlevel=2"]
    back = spark.read.parquet(str(tmp_path / "levels"))
    assert back.count() == len(prepared.levels_pdf)


def test_geojson_roundtrip_reader(spark, prepared):
    """S4 GeoJSON source: features written by geojson_feature_df parse
    back to the identical boundary rows (id/props/WKB)."""
    df = sinks.geojson_feature_df(spark, prepared)
    back = sinks.read_geojson_features(spark, df)
    assert set(back.osm_id) == set(prepared.levels_pdf.osm_id)
    for r in back.itertuples(index=False):
        orig = prepared.polys_by_id[r.osm_id]
        got = geom.wkb_to_multipolygon(r.geom_wkb)
        assert len(got) == len(orig)
        for a, b in zip(got, orig):
            for ra, rb in zip(a, b):
                np.testing.assert_allclose(ra, rb)


def test_dual_export_natural_and_simplified(spark):
    """VERDICT r01 item 7: dual natural+simplified export per feature
    (generate_geojson.py:203-221). Simplified borders must be watertight
    (shared chains identical across owners) and the natural variant must
    be byte-faithful to the prepared geometry."""
    import json

    from posmspark import dissolve, geom, synth
    from posmspark.joins import prepare_boundaries
    from posmspark.sinks import dual_geojson_feature_df

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    df = dual_geojson_feature_df(spark, prepared, tol=0.05)
    rows = df.collect()
    by_key = {(r["osm_id"], r["variant"]): r for r in rows}
    # every feature present in both variants
    ids = set(prepared.levels_pdf.osm_id)
    assert {(i, v) for i in ids for v in ("natural", "simplified")} == set(by_key)

    # natural geometry round-trips exactly
    feat = json.loads(by_key[("R1100", "natural")]["feature_json"])
    got = [
        [np.asarray(ring) for ring in poly]
        for poly in feat["geometry"]["coordinates"]
    ]
    exp = prepared.polys_by_id["R1100"]
    assert len(got) == len(exp)
    for gp, ep in zip(got, exp):
        for gr, er in zip(gp, ep):
            assert np.array_equal(gr, er)

    # watertight: the simplified level-1 mesh of Alphaland still
    # dissolves to one polygon covering the country rect
    simp = {}
    for oid in ["R1100", "R1200", "R1300"]:
        feat = json.loads(by_key[(oid, "simplified")]["feature_json"])
        simp[oid] = [
            [np.asarray(ring) for ring in poly]
            for poly in feat["geometry"]["coordinates"]
        ]
    u = dissolve.dissolve_union(simp)
    assert len(u) == 1
    assert geom.multipolygon_bbox(u) == (0.0, 0.0, 12.0, 10.0)

    # simplification never adds points and preserves signed area sign
    for i in ids:
        nat, sim = by_key[(i, "natural")], by_key[(i, "simplified")]
        assert sim["n_points"] <= nat["n_points"]
        assert (sim["area"] > 0) == (nat["area"] > 0)


def test_package_boundary_zips(spark, tmp_path):
    """S12: per-country zip packaging (generate_geojson.py:117-141
    analog) — one FeatureCollection per (level, variant), descendants
    resolved through the is_in chain."""
    import json
    import zipfile

    from posmspark import synth
    from posmspark.joins import prepare_boundaries
    from posmspark.sinks import package_boundary_zips

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(), n_levels=4
    )
    out = str(tmp_path / "zips")
    manifest = {(r["country"], r["file_name"]): r
                for r in package_boundary_zips(spark, prepared, out).collect()}

    import os
    assert sorted(os.listdir(out)) == ["R1000.zip", "R2000.zip", "R3000.zip"]
    with zipfile.ZipFile(os.path.join(out, "R1000.zip")) as zf:
        names = sorted(zf.namelist())
        # Alphaland has levels 0..3 -> 8 files (natural+simplified each)
        assert names == sorted(
            f"admin_level_{lv}_{v}.geojson"
            for lv in range(4) for v in ("natural", "simplified"))
        fc = json.loads(zf.read("admin_level_3_natural.geojson"))
        ids = {f["properties"]["osm_id"] for f in fc["features"]}
        assert ids == {"R1111", "R1112"}
        fc1 = json.loads(zf.read("admin_level_1_natural.geojson"))
        ids1 = {f["properties"]["osm_id"] for f in fc1["features"]}
        assert ids1 == {"R1100", "R1101", "R1200", "R1300"}
    # manifest rows agree with the zip contents
    assert manifest[("R1000", "admin_level_3_natural.geojson")]["n_features"] == 2
    assert all(r["n_bytes"] > 0 for r in manifest.values())
