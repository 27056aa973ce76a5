"""Overpass boundary source (S5) — parser + relation crawler.

The reference fetches each admin relation from the Overpass API with
`out geom`, discovers children through relation members with
role="subarea", converts the OSM XML to GeoJSON with the osmtogeojson
CLI, and feeds that to the extractor (extract_overpass.py:54-129).

This is the from-scratch Spark-side restatement: a pure-Python parser
for the `out geom` OSM XML (relation tags + member ways with inline
<nd lat lon> geometry), multipolygon ring ASSEMBLY from unordered,
possibly-reversed member ways (the real work osmtogeojson does), and a
recursive subarea crawler producing the engine's boundary input rows.

The HTTP fetch itself is out of scope in this sandbox (no network):
fetch_relation requires an injected `http_get(relation_id) -> xml str`
callable and raises otherwise — tests inject a fixture server. Every
other step is real and tested.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

from posmspark import geom

_SNAP = 1e-9


def _k(pt) -> tuple[int, int]:
    return (int(round(pt[0] / _SNAP)), int(round(pt[1] / _SNAP)))


def parse_overpass_xml(xml_str: str) -> dict:
    """Parse one `relation(<id>); out geom;` response.

    Returns {osm_id, tags, outer_ways, inner_ways, subarea_ids} where
    ways are (N,2) [lon,lat] arrays in document order.
    """
    root = ET.fromstring(xml_str)
    rel = root.find("./relation")
    if rel is None:
        raise ValueError("no <relation> element in Overpass response")
    tags = {t.get("k"): t.get("v") for t in rel.findall("./tag")}
    outer, inner, subareas = [], [], []
    for m in rel.findall("./member"):
        mtype, role = m.get("type"), m.get("role") or ""
        if mtype == "relation" and role == "subarea":
            subareas.append(m.get("ref"))
            continue
        if mtype != "way":
            continue
        nds = m.findall("./nd")
        if not nds:
            continue
        pts = np.array(
            [[float(n.get("lon")), float(n.get("lat"))] for n in nds],
            dtype=np.float64,
        )
        (outer if role in ("outer", "") else inner).append(pts)
    return {
        "osm_id": rel.get("id"),
        "tags": tags,
        "outer_ways": outer,
        "inner_ways": inner,
        "subarea_ids": subareas,
    }


def assemble_rings(ways: list[np.ndarray]) -> list[np.ndarray]:
    """Chain unordered (possibly reversed) member ways into closed
    rings by endpoint matching — the OSM multipolygon assembly step."""
    remaining = [np.asarray(w, dtype=np.float64) for w in ways if len(w) >= 2]
    rings = []
    while remaining:
        chain = remaining.pop(0)
        while _k(chain[0]) != _k(chain[-1]):
            end = _k(chain[-1])
            for i, w in enumerate(remaining):
                if _k(w[0]) == end:
                    chain = np.vstack([chain, w[1:]])
                    remaining.pop(i)
                    break
                if _k(w[-1]) == end:
                    chain = np.vstack([chain, w[::-1][1:]])
                    remaining.pop(i)
                    break
            else:
                raise ValueError(
                    "open ring: no way continues from endpoint "
                    f"{chain[-1].tolist()}")
        if len(chain) >= 4:
            rings.append(chain)
    return rings


def relation_to_multipolygon(parsed: dict) -> list[list[np.ndarray]]:
    """Assembled rings -> engine MultiPolygon (CCW outers, CW holes
    attached to their containing outer)."""
    outers = []
    for ring in assemble_rings(parsed["outer_ways"]):
        outers.append(ring if geom.ring_area(ring) > 0 else ring[::-1].copy())
    polys = [[o] for o in outers]
    for ring in assemble_rings(parsed["inner_ways"]):
        hole = ring if geom.ring_area(ring) < 0 else ring[::-1].copy()
        for p in polys:
            if geom.points_in_rings(hole[0, 0:1], hole[0, 1:2], [p[0]])[0]:
                p.append(hole)
                break
    return polys


def boundary_row(parsed: dict, insert_order: int) -> dict:
    """One engine boundary-input row from a parsed relation
    (name/name:en/admin_level/boundary tag semantics of the
    reference's feature_data tuples)."""
    tags = parsed["tags"]
    name = tags.get("name")
    name_en = tags.get("name:en") or name
    polys = relation_to_multipolygon(parsed)
    return {
        "osm_id": f"R{parsed['osm_id']}",
        "name": name,
        "name_en": name_en,
        "admin_level": tags.get("admin_level"),
        "iso3166": tags.get("ISO3166-1") or tags.get("ISO3166-2"),
        "boundary": tags.get("boundary", "administrative"),
        "geom_wkb": geom.multipolygon_to_wkb(polys),
        "insert_order": insert_order,
    }


def fetch_relation(relation_id: str, http_get=None) -> dict:
    """Fetch+parse one relation. The sandbox has no network: callers
    MUST inject http_get(relation_id) -> xml string (the reference uses
    a retrying requests session, extract_overpass.py:59-68)."""
    if http_get is None:
        raise NotImplementedError(
            "network access is out of scope here — inject "
            "http_get(relation_id) -> Overpass XML")
    return parse_overpass_xml(http_get(relation_id))


def crawl_boundaries(root_ids: list[str], http_get,
                     max_levels: int = 10) -> pd.DataFrame:
    """Recursive subarea crawl (download_from_overpass:54-129 analog):
    fetch each relation, follow role=subarea members level by level,
    and return all boundary rows as the engine's input DataFrame."""
    rows = []
    order = 0
    seen: set[str] = set()
    frontier = list(root_ids)
    for _lv in range(max_levels):
        if not frontier:
            break
        next_frontier: list[str] = []
        for rid in frontier:
            if rid in seen:
                continue
            seen.add(rid)
            parsed = fetch_relation(rid, http_get)
            rows.append(boundary_row(parsed, order))
            order += 1
            next_frontier.extend(parsed["subarea_ids"])
        frontier = next_frontier
    return pd.DataFrame(rows)
