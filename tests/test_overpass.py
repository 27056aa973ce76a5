"""Overpass source tests (S5): XML parsing, multipolygon ring assembly
from unordered/reversed ways, subarea crawling, hierarchy parity."""

import numpy as np
import pytest

from posmspark import geom, overpass, synth
from posmspark.joins import prepare_boundaries


def _way(pts):
    return "".join(
        f'<nd lat="{p[1]}" lon="{p[0]}"/>' for p in pts
    )


def _relation_xml(rid, tags, outer_ways, inner_ways=(), subareas=()):
    members = []
    for w in outer_ways:
        members.append(f'<member type="way" ref="0" role="outer">{_way(w)}</member>')
    for w in inner_ways:
        members.append(f'<member type="way" ref="0" role="inner">{_way(w)}</member>')
    for s in subareas:
        members.append(f'<member type="relation" ref="{s}" role="subarea"/>')
    tag_xml = "".join(f'<tag k="{k}" v="{v}"/>' for k, v in tags.items())
    return (f'<osm version="0.6"><relation id="{rid}">'
            f'{"".join(members)}{tag_xml}</relation></osm>')


# country square [0,4]x[0,4] split into two outer ways, one reversed,
# plus a hole [1,2]x[1,2] as a single closed inner way
_COUNTRY_XML = _relation_xml(
    "100",
    {"name": "Testland", "name:en": "Testland", "admin_level": "2",
     "boundary": "administrative", "ISO3166-1": "TL"},
    outer_ways=[
        [(0, 0), (4, 0), (4, 4)],
        [(0, 4), (4, 4)][::-1],  # reversed fragment
        [(0, 4), (0, 0)],
    ],
    inner_ways=[[(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)]],
    subareas=["200", "201"],
)
_STATE_XML = {
    "200": _relation_xml(
        "200", {"name": "West", "name:en": "West", "admin_level": "4",
                "boundary": "administrative"},
        outer_ways=[[(0, 0), (2, 0), (2, 4), (0, 4), (0, 0)]]),
    "201": _relation_xml(
        "201", {"name": "East", "name:en": "East", "admin_level": "4",
                "boundary": "administrative"},
        outer_ways=[[(2, 0), (4, 0), (4, 4), (2, 4), (2, 0)]]),
}


def _fake_http(rid):
    if rid == "100":
        return _COUNTRY_XML
    return _STATE_XML[rid]


def test_assemble_rings_reversed_fragments():
    parsed = overpass.parse_overpass_xml(_COUNTRY_XML)
    rings = overpass.assemble_rings(parsed["outer_ways"])
    assert len(rings) == 1
    r = rings[0]
    assert np.array_equal(r[0], r[-1])
    assert abs(abs(geom.ring_area(r)) - 16.0) < 1e-12


def test_relation_to_multipolygon_hole_attached():
    parsed = overpass.parse_overpass_xml(_COUNTRY_XML)
    polys = overpass.relation_to_multipolygon(parsed)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert geom.ring_area(polys[0][0]) > 0   # CCW outer
    assert geom.ring_area(polys[0][1]) < 0   # CW hole
    area = geom.ring_area(polys[0][0]) + geom.ring_area(polys[0][1])
    assert abs(area - 15.0) < 1e-12


def test_fetch_requires_injected_transport():
    with pytest.raises(NotImplementedError, match="network"):
        overpass.fetch_relation("100")


def test_crawl_builds_hierarchy():
    bpdf = overpass.crawl_boundaries(["100"], _fake_http)
    assert list(bpdf.osm_id) == ["R100", "R200", "R201"]
    assert list(bpdf.admin_level) == ["2", "4", "4"]
    prepared = prepare_boundaries(bpdf, synth.gen_admin_mapping_pdf())
    lv = prepared.levels_pdf
    assert set(lv.query("adminlevel == 0").osm_id) == {"R100"}
    assert set(lv.query("adminlevel == 1").osm_id) == {"R200", "R201"}
    assert set(lv.query("adminlevel == 1").is_in) == {"R100"}
    assert lv.query("osm_id == 'R100'").iso3166.iloc[0] == "TL"


def test_open_ring_rejected():
    parsed = overpass.parse_overpass_xml(_relation_xml(
        "300", {"name": "Broken", "admin_level": "2"},
        outer_ways=[[(0, 0), (4, 0), (4, 4)]]))
    with pytest.raises(ValueError, match="open ring"):
        overpass.assemble_rings(parsed["outer_ways"])


def test_assemble_rings_random_fragment_fuzz():
    """r03 fuzz (bounded): random polygons cut into shuffled/reversed
    way fragments must reassemble to one ring with the original area
    (300-seed run clean; 40 pinned)."""
    import numpy as np

    from posmspark import geom

    for seed in range(40):
        rng = np.random.default_rng(seed)
        k = int(rng.integers(6, 20))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(1, 5, k)
        ring = np.column_stack(
            [10 + rad * np.cos(ang), 20 + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        nfrag = int(rng.integers(1, min(6, k)))
        cuts = np.sort(rng.choice(np.arange(k), size=nfrag, replace=False))
        closed = np.vstack([ring[:-1], ring[:1]])
        idx = list(cuts) + [cuts[0] + k]
        frags = [np.array([closed[i % k] for i in range(a, b + 1)])
                 for a, b in zip(idx[:-1], idx[1:])]
        frags = [f[::-1].copy() if rng.random() < 0.5 else f for f in frags]
        frags = [frags[i] for i in rng.permutation(len(frags))]
        rings = overpass.assemble_rings(
            [[(float(x), float(y)) for x, y in f] for f in frags])
        assert len(rings) == 1, seed
        got_area = abs(geom.ring_area(np.array(rings[0])))
        want_area = abs(geom.ring_area(ring))
        assert abs(got_area - want_area) <= 1e-9 * max(want_area, 1), seed
