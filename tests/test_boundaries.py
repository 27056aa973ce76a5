"""Golden tests for boundary hierarchy prep — re-expresses the posm
extract.py pass A/B/C semantics as DataFrame goldens (SURVEY.md §5.1):
validity routing, maritime filter, coalesce, uppercase, per-country
admin-level mapping, orphan drop, first-match tie-break."""

import pandas as pd
import pytest

from posmspark import synth
from posmspark.joins import prepare_boundaries


@pytest.fixture(scope="module")
def prepared():
    return prepare_boundaries(synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf())


def test_problems_routed_with_reason(prepared):
    probs = prepared.problems_pdf
    assert list(probs.osm_id) == ["R9001"]
    assert probs.reason.iloc[0] == "Self-intersection"
    assert probs.lon.iloc[0] == pytest.approx(61.0)


def test_level0_countries(prepared):
    l0 = prepared.levels_pdf.query("adminlevel == 0")
    assert sorted(l0.osm_id) == ["R1000", "R2000", "R3000"]
    # iso uppercased (extract.py:110-112)
    iso = dict(zip(l0.osm_id, l0.iso3166))
    assert iso == {"R1000": "AA", "R2000": "NP", "R3000": "GG"}
    # name_en coalesced to name (extract.py:100-108), incl. non-ASCII
    ne = dict(zip(l0.osm_id, l0.name_en))
    assert ne["R2000"] == "नेपाल"


def test_level1_hierarchy_and_mapping(prepared):
    l1 = prepared.levels_pdf.query("adminlevel == 1")
    got = dict(zip(l1.osm_id, l1.is_in))
    # R2x00 rows carry raw tag '3' and match only via the R2000 override
    assert got == {
        "R1100": "R1000", "R1200": "R1000", "R1300": "R1000",
        "R1101": "R1000",  # duplicate-coverage twin still a valid level-1
        "R2100": "R2000", "R2200": "R2000",
        "R3100": "R3000", "R3200": "R3000",
    }
    # orphan (R9002, no containing country) dropped; maritime (R8000) dropped
    assert "R9002" not in set(prepared.levels_pdf.osm_id)
    assert "R8000" not in set(prepared.levels_pdf.osm_id)


def test_level2_requires_state(prepared):
    l2 = prepared.levels_pdf.query("adminlevel == 2")
    got = dict(zip(l2.osm_id, l2.is_in))
    # first-match tie-break: level-2 children of the duplicated strip
    # resolve to R1100 (earlier insert_order), never R1101
    assert got["R1110"] == "R1100" and got["R1120"] == "R1100"
    assert got["R2110"] == "R2100" and got["R2220"] == "R2200"
    assert len(l2) == 13  # 6 alpha + 4 beta + 3 gamma


def test_check_file_diffs(prepared):
    """Missing/new id set differences (extract.py:27-61) as anti-joins."""
    expected = pd.DataFrame({"osm_id": ["R1000", "R2000", "R4000"]})
    actual = prepared.levels_pdf.query("adminlevel == 0")[["osm_id"]]
    missing = expected[~expected.osm_id.isin(actual.osm_id)]
    new = actual[~actual.osm_id.isin(expected.osm_id)]
    assert list(missing.osm_id) == ["R4000"]
    assert list(new.osm_id) == ["R3000"]


def test_cover_table_shape(prepared):
    cov = prepared.cover_pdf
    assert set(cov.columns) == {"cell", "osm_id", "adminlevel", "full",
                                "insert_order"}
    # every retained boundary contributes cover cells, most of them FULL
    assert set(prepared.levels_pdf.osm_id) <= set(cov.osm_id)
    assert cov.full.mean() > 0.5


def test_deep_hierarchy_six_levels(spark):
    """Reference fans out levels 1..10 (extract_all.py:92-121): a
    6-deep nested-rect chain must resolve each level's parent chain
    and the PIP join must assign all 6 columns."""
    import pandas as pd

    from posmspark import geom as G
    from posmspark import synth
    from posmspark.joins import pip_join, prepare_boundaries

    rows = []
    # nested squares: level k occupies [k, 20-k]^2, raw tags 2,4,6,8,10,12
    for k, tag in enumerate(["2", "4", "6", "8", "10", "12"]):
        rect = synth.rect(k, k, 20 - k, 20 - k)
        rows.append({
            "osm_id": f"L{k}", "name": f"L{k}", "name_en": f"L{k}",
            "admin_level": tag, "iso3166": None,
            "boundary": "administrative",
            "geom_wkb": G.multipolygon_to_wkb([[rect]]),
            "insert_order": k,
        })
    mapping = pd.DataFrame(
        [], columns=["country_osm_id", "admin_level_1", "admin_level_2"])
    # levels beyond the configured defaults follow the OSM 2,4,6,8,...
    # convention automatically (review regression: used to KeyError)
    prepared = prepare_boundaries(pd.DataFrame(rows), mapping, n_levels=6)
    lv = prepared.levels_pdf.sort_values("adminlevel")
    assert list(lv.adminlevel) == list(range(6))
    assert list(lv.is_in)[1:] == [f"L{k}" for k in range(5)]

    pts = spark.createDataFrame(
        [("center", 10.0, 10.0), ("ring2", 2.5, 10.0), ("outside", 25.0, 5.0)],
        "url string, lon double, lat double")
    out = {r["url"]: r for r in pip_join(pts, prepared, spark).collect()}
    assert [out["center"][f"osm_id_l{k}"] for k in range(6)] == \
        [f"L{k}" for k in range(6)]
    assert [out["ring2"][f"osm_id_l{k}"] for k in range(6)] == \
        ["L0", "L1", "L2", None, None, None]
    assert all(out["outside"][f"osm_id_l{k}"] is None for k in range(6))


def test_prepare_boundaries_no_countries(spark):
    """ADVICE r02: input with no admin_level=='2' rows used to crash
    pd.concat('No objects to concatenate'); it must yield an empty
    typed levels table instead."""
    bpdf = synth.gen_boundaries_pdf()
    no_l0 = bpdf[bpdf.admin_level != "2"].reset_index(drop=True)
    prepared = prepare_boundaries(no_l0, synth.gen_admin_mapping_pdf())
    assert len(prepared.levels_pdf) == 0
    assert list(prepared.levels_pdf.columns) == [
        "osm_id", "name", "name_en", "adminlevel", "iso3166", "is_in",
        "insert_order"]
    assert len(prepared.cover_pdf) == 0
