"""Tests for geometric group aggregation: mesh dissolve (union),
residual-holes classification, shared-edge consistent simplification
(SURVEY.md O18/O19/G13)."""

import numpy as np
import pytest

from posmspark import dissolve, geom, synth


def _rect(x0, y0, x1, y1):
    return synth.rect(x0, y0, x1, y1)


def test_dissolve_two_rects_sharing_edge():
    polys = {
        "A": [[_rect(0, 0, 2, 2)]],
        "B": [[_rect(2, 0, 4, 2)]],
    }
    out = dissolve.dissolve_union(polys)
    assert len(out) == 1 and len(out[0]) == 1
    ring = out[0][0]
    assert abs(abs(geom.ring_area(ring)) - 8.0) < 1e-9
    # dissolved boundary is the 4x2 envelope
    assert geom.multipolygon_bbox(out) == (0.0, 0.0, 4.0, 2.0)


def test_dissolve_partial_shared_edge():
    """Children whose shared borders have non-matching vertices (the
    conformal-split path): big rect left, two stacked small rects right."""
    polys = {
        "A": [[_rect(0, 0, 2, 4)]],
        "B": [[_rect(2, 0, 4, 2)]],
        "C": [[_rect(2, 2, 4, 4)]],
    }
    out = dissolve.dissolve_union(polys)
    assert len(out) == 1
    assert abs(abs(geom.ring_area(out[0][0])) - 16.0) < 1e-9
    assert geom.multipolygon_bbox(out) == (0.0, 0.0, 4.0, 4.0)


def test_dissolve_disjoint_produces_two_polys():
    polys = {
        "A": [[_rect(0, 0, 1, 1)]],
        "B": [[_rect(5, 5, 6, 6)]],
    }
    out = dissolve.dissolve_union(polys)
    assert len(out) == 2


def test_dissolve_ring_of_rects_with_hole():
    """Four rects forming a frame -> union is a square with a hole."""
    polys = {
        "S": [[_rect(0, 0, 3, 1)]],
        "N": [[_rect(0, 2, 3, 3)]],
        "W": [[_rect(0, 1, 1, 2)]],
        "E": [[_rect(2, 1, 3, 2)]],
    }
    out = dissolve.dissolve_union(polys)
    assert len(out) == 1
    rings = out[0]
    assert len(rings) == 2  # outer + hole
    areas = sorted(abs(geom.ring_area(r)) for r in rings)
    assert abs(areas[0] - 1.0) < 1e-9 and abs(areas[1] - 9.0) < 1e-9
    # hole interior (1.5, 1.5) must be outside the union
    assert not geom.points_in_rings(
        np.array([1.5]), np.array([1.5]), rings
    )[0]
    # frame interior must be inside
    assert geom.points_in_rings(np.array([0.5]), np.array([0.5]), rings)[0]


def test_residual_complete():
    parent = [[_rect(0, 0, 4, 4)]]
    children = {
        "A": [[_rect(0, 0, 4, 2)]],
        "B": [[_rect(0, 2, 4, 4)]],
    }
    status, residual = dissolve.residual_classify(parent, children)
    assert status == "complete" and residual == []


def test_residual_childless():
    status, residual = dissolve.residual_classify([[_rect(0, 0, 4, 4)]], {})
    assert status == "childless"


def test_residual_filler():
    """Children cover only part of the parent -> filler geometry with
    the uncovered area (proc_functions.sql:104-133 'xxx' rows)."""
    parent = [[_rect(0, 0, 4, 4)]]
    children = {"A": [[_rect(0, 0, 4, 2)]]}
    status, residual = dissolve.residual_classify(parent, children)
    assert status == "filler"
    total = sum(abs(geom.ring_area(p[0])) for p in residual)
    assert abs(total - 8.0) < 1e-9
    assert geom.multipolygon_bbox(residual) == (0.0, 2.0, 4.0, 4.0)


def test_shared_edge_simplify_watertight():
    """Two polygons sharing a wiggly border: after simplification both
    sides must carry the IDENTICAL simplified chain (no slivers)."""
    # shared border: x=2 with small zigzag
    zig = np.array(
        [[2.0, 0.0], [2.01, 0.5], [1.99, 1.0], [2.01, 1.5], [2.0, 2.0]]
    )
    left = np.vstack([zig, [[0.0, 2.0], [0.0, 0.0]], zig[:1]])
    right = np.vstack([zig, [[4.0, 2.0], [4.0, 0.0]], zig[:1]])
    # orient: left ring as built is CW (goes up at x=2 then left);
    # orientation doesn't matter for the mesh machinery
    polys = {"L": [[left]], "R": [[right]]}
    out = dissolve.shared_edge_simplify(polys, tol=0.05)
    lring = out["L"][0][0]
    rring = out["R"][0][0]
    # zigzag collapsed on both
    assert len(lring) < len(left)
    # the shared-chain points of both rings must be identical sets
    lpts = {tuple(np.round(p, 9)) for p in lring if abs(p[0] - 2.0) < 0.1}
    rpts = {tuple(np.round(p, 9)) for p in rring if abs(p[0] - 2.0) < 0.1}
    assert lpts == rpts and len(lpts) >= 2
    # union of simplified mesh still dissolves cleanly (watertight)
    u = dissolve.dissolve_union(out)
    assert len(u) == 1 and len(u[0]) == 1


def test_shared_edge_simplify_fixture_mesh():
    """Run on the synthetic level-1 mesh of one country: children must
    stay watertight (dissolve to one polygon == the country rect)."""
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    kids = {
        oid: prepared.polys_by_id[oid]
        for oid in ["R1100", "R1200", "R1300"]
    }
    simp = dissolve.shared_edge_simplify(kids, tol=0.01)
    u = dissolve.dissolve_union(simp)
    assert len(u) == 1
    assert geom.multipolygon_bbox(u) == (0.0, 0.0, 12.0, 10.0)


def test_dissolve_by_parent_spark(spark):
    """O18 as a distributed operator: every level-1 parent rebuilt from
    its level-2 children equals the parent's own geometry (mesh fixtures
    tile exactly)."""
    from posmspark.dissolve import dissolve_by_parent
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    out = {r["parent_osm_id"]: r
           for r in dissolve_by_parent(spark, prepared, child_level=2).collect()}
    # R1100's two children tile the 4x10 strip
    r = out["R1100"]
    assert r["n_children"] == 2 and r["n_polys"] == 1
    assert abs(r["area"] - 40.0) < 1e-9
    back = geom.wkb_to_multipolygon(bytes(r["geom_wkb"]))
    assert geom.multipolygon_bbox(back) == (0.0, 0.0, 4.0, 10.0)
    # Gamma-West has 3 strip children tiling 5x10
    assert abs(out["R3100"]["area"] - 50.0) < 1e-7


def test_residual_by_parent_spark(spark):
    """O19 as a distributed operator: complete parents, the holed parent
    (children tile the rect but the parent excludes its hole -> filler),
    and childless parents classified like proc_functions.sql:104-197."""
    from posmspark.dissolve import residual_by_parent
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    rows = residual_by_parent(spark, prepared, parent_level=1,
                              child_level=2).collect()
    by_parent = {}
    for r in rows:
        by_parent.setdefault(r["parent_osm_id"], []).append(r)
    assert by_parent["R1100"][0]["status"] == "complete"
    # R1101 (duplicate-coverage twin) has no children of its own
    assert by_parent["R1101"][0]["status"] == "childless"
    # R2100 has a hole its children cover -> residual = the hole area
    r2100 = by_parent["R2100"]
    assert r2100[0]["status"] == "filler"
    assert r2100[0]["filler_id"].startswith("xxx")
    assert abs(sum(x["residual_area"] for x in r2100) - 1.0) < 1e-9


def test_residual_by_parent_no_arrow(spark):
    """Driver regression: under a vanilla (Arrow-disabled) session,
    createDataFrame stringifies the left-merge NaN of childless parents
    to 'nan' unless sanitized to None first (CORRECTNESS_r01 KeyError)."""
    from posmspark.dissolve import residual_by_parent
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        rows = residual_by_parent(spark, prepared, parent_level=1,
                                  child_level=2).collect()
    finally:
        spark.conf.set(key, prev)
    by_parent = {r["parent_osm_id"]: r for r in rows}
    assert by_parent["R1101"]["status"] == "childless"
    assert by_parent["R1100"]["status"] == "complete"


def test_simplify_mesh_by_parent_distributed(spark):
    """Distributed per-parent shared-edge simplify: results equal the
    driver-side simplifier per group, and each parent's simplified
    child mesh still dissolves to the parent's own geometry."""
    from posmspark.dissolve import simplify_mesh_by_parent
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    rows = simplify_mesh_by_parent(spark, prepared, child_level=2,
                                   tol=0.05).collect()
    got = {r["osm_id"]: r for r in rows}

    kids = prepared.levels_pdf.query("adminlevel == 2")
    assert set(got) == set(kids.osm_id)
    for parent, group in kids.groupby("is_in"):
        mesh = {oid: prepared.polys_by_id[oid] for oid in group.osm_id}
        exp = dissolve.shared_edge_simplify(mesh, tol=0.05)
        back = {}
        for oid in group.osm_id:
            r = got[oid]
            assert r["parent_osm_id"] == parent
            assert r["n_points_after"] <= r["n_points_before"]
            back[oid] = geom.wkb_to_multipolygon(bytes(r["geom_wkb"]))
            for gp, ep in zip(back[oid], exp[oid]):
                for gr, er in zip(gp, ep):
                    assert np.array_equal(gr, er), oid
        # watertight: children still dissolve to one polygon
        u = dissolve.dissolve_union(back)
        assert len(u) == 1, parent


def test_shared_edge_simplify_enclave_watertight():
    """Review regression: an enclave (B exactly fills A's hole) shares
    a border that is a WHOLE closed ring with constant owner-set. Both
    owners must simplify it to the IDENTICAL point set regardless of
    each ring's rotation/direction."""
    # wiggly shared border so DP actually drops points
    t = np.linspace(0, 2 * np.pi, 41)
    r = 2.0 + 0.03 * np.sin(8 * t)
    inner_ccw = np.column_stack([5 + r * np.cos(t), 5 + r * np.sin(t)])
    inner_ccw[-1] = inner_ccw[0]
    outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.], [0., 0.]])
    hole_cw = inner_ccw[::-1].copy()
    # rotate B's ring start by 7 vertices relative to A's hole
    b_ring = np.vstack([inner_ccw[7:-1], inner_ccw[:7], inner_ccw[7:8]])
    polys = {"A": [[outer, hole_cw]], "B": [[b_ring]]}
    out = dissolve.shared_edge_simplify(polys, tol=0.05)
    a_hole = {tuple(np.round(p, 9)) for p in out["A"][0][1]}
    b_out = {tuple(np.round(p, 9)) for p in out["B"][0][0]}
    assert a_hole == b_out
    assert len(out["B"][0][0]) < len(b_ring)  # actually simplified
    # mesh still dissolves cleanly: A+B fills the outer rect exactly
    u = dissolve.dissolve_union(out)
    assert len(u) == 1 and len(u[0]) == 1
    assert geom.multipolygon_bbox(u) == (0.0, 0.0, 10.0, 10.0)


def test_simplify_dropped_shell_drops_whole_polygon(spark):
    """ADVICE r03: if a polygon's OUTER ring simplifies below 4 points
    while a hole survives, the hole must NOT be re-packed into shell
    position (inverted geometry) — the polygon drops entirely.

    Fixture: A is a thin straight sliver (its shell rebuilds to 3
    points: two junctions with neighbor N, both chains within tol of
    straight) containing a hole tiled by three enclaves, whose
    junctions pin 4+ points on the hole ring so the hole survives."""
    import types

    import pandas as pd

    def rect(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])

    polys = {
        "A": [[rect(0, 0, 10, 0.01),
               rect(1, 0.002, 9, 0.008)[::-1].copy()]],
        "N": [[rect(0, -1, 10, 0)]],
        "E1": [[rect(1, 0.002, 3, 0.008)]],
        "E2": [[rect(3, 0.002, 6, 0.008)]],
        "E3": [[rect(6, 0.002, 9, 0.008)]],
    }
    out = dissolve.shared_edge_simplify(polys, tol=0.05)
    assert out["A"] == []  # dropped, not hole-promoted-to-shell
    for oid in ("N", "E1", "E2", "E3"):
        for poly in out[oid]:
            assert len(poly) >= 1 and len(poly[0]) >= 4

    # distributed path must agree: A's row carries zero surviving points
    kids = pd.DataFrame({
        "osm_id": list(polys), "is_in": "P",
        "adminlevel": 2,
    })
    prepared = types.SimpleNamespace(levels_pdf=kids, polys_by_id=polys)
    from posmspark.dissolve import simplify_mesh_global

    rows = {r["osm_id"]: r
            for r in simplify_mesh_global(
                spark, prepared, child_level=2, tol=0.05).collect()}
    assert rows["A"]["n_points_after"] == 0
    for oid in ("N", "E1", "E2", "E3"):
        dr = {tuple(np.round(p, 9)) for poly in out[oid] for ring in poly
              for p in ring}
        wk = geom.wkb_to_multipolygon(rows[oid]["geom_wkb"])
        sp = {tuple(np.round(p, 9)) for poly in wk for ring in poly
              for p in ring}
        assert dr == sp, oid


def test_topology_enclave_shares_one_arc():
    """Same enclave through the TopoJSON builder: the border must be
    ONE arc referenced by both owners with opposite directions."""
    from posmspark import topo

    inner_ccw = np.array([[4., 4.], [6., 4.], [6., 6.], [4., 6.], [4., 4.]])
    outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.], [0., 0.]])
    b_ring = np.vstack([inner_ccw[2:-1], inner_ccw[:2], inner_ccw[2:3]])
    mesh = {"A": [[outer, inner_ccw[::-1].copy()]], "B": [[b_ring]]}
    t = topo.topology(mesh)
    refs = {}
    for g in t["objects"]["boundaries"]["geometries"]:
        for rings in g["arcs"]:
            for rr in rings:
                for ref in rr:
                    i = ~ref if ref < 0 else ref
                    refs.setdefault(i, []).append((g["id"], ref < 0))
    shared = {i: v for i, v in refs.items() if len(v) == 2}
    assert len(shared) == 1
    (owners,) = shared.values()
    assert {o for o, _ in owners} == {"A", "B"}
    assert {rev for _, rev in owners} == {True, False}


def test_residual_annular_island():
    """Review regression: a child strictly INSIDE the parent (annular
    residual) must classify as ONE filler polygon of outer-minus-island
    area — not two standalone polygons double-counting the island."""
    parent = [[_rect(0, 0, 10, 10)]]
    child = {"K": [[_rect(4, 4, 6, 6)]]}
    status, residual = dissolve.residual_classify(parent, child)
    assert status == "filler"
    assert len(residual) == 1
    polys = residual[0]
    assert len(polys) == 2  # outer + hole
    area = sum(geom.ring_area(r) for r in polys)
    assert abs(area - 96.0) < 1e-9


def test_simplify_mesh_global_equals_driver_union_mesh(spark):
    """Round-3 distributed+global simplify (VERDICT r02 item 4): the
    chain-extraction pipeline must reproduce the driver-side
    shared_edge_simplify over the UNION mesh of ALL parents' children
    array-for-array — which makes it cross-parent watertight by the
    same argument."""
    from posmspark.dissolve import simplify_mesh_global
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    rows = simplify_mesh_global(spark, prepared, child_level=2,
                                tol=0.05).collect()
    got = {r["osm_id"]: r for r in rows}

    kids = prepared.levels_pdf.query("adminlevel == 2")
    assert set(got) == set(kids.osm_id)
    union_mesh = {oid: prepared.polys_by_id[oid] for oid in kids.osm_id}
    exp = dissolve.shared_edge_simplify(union_mesh, tol=0.05)
    parent_of = dict(zip(kids.osm_id, kids.is_in))
    back = {}
    for oid in kids.osm_id:
        r = got[oid]
        assert r["parent_osm_id"] == parent_of[oid]
        back[oid] = geom.wkb_to_multipolygon(bytes(r["geom_wkb"]))
        exp_polys = [rings for rings in exp[oid] if rings]
        assert len(back[oid]) == len(exp_polys), oid
        for gp, ep in zip(back[oid], exp_polys):
            assert len(gp) == len(ep), oid
            for gr, er in zip(gp, ep):
                assert np.array_equal(gr, er), oid


def test_simplify_mesh_global_cross_parent_watertight(spark):
    """The explicit cross-parent check the per-parent grouping cannot
    pass: borders between children of DIFFERENT level-1 parents (e.g.
    across the R1100|R1200 line) must be traced identically by both
    owners, so the full simplified level-2 mesh of each country still
    dissolves with no interior slivers."""
    from posmspark.dissolve import simplify_mesh_global
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    rows = simplify_mesh_global(spark, prepared, child_level=2,
                                tol=0.05).collect()
    kids = prepared.levels_pdf.query("adminlevel == 2")
    parent_of = dict(zip(kids.osm_id, kids.is_in))
    country_of = {}
    l1 = prepared.levels_pdf.query("adminlevel == 1")
    l1_parent = dict(zip(l1.osm_id, l1.is_in))
    back_by_country: dict[str, dict] = {}
    for r in rows:
        c = l1_parent[parent_of[r["osm_id"]]]
        country_of[r["osm_id"]] = c
        back_by_country.setdefault(c, {})[r["osm_id"]] = (
            geom.wkb_to_multipolygon(bytes(r["geom_wkb"])))
    # Alphaland (R1000): its level-2 children span parents R1100,
    # R1200, R1300 — watertight across those parents means the union
    # of ALL of them cancels every interior (incl. cross-parent) border
    assert len(back_by_country["R1000"]) >= 6
    spans_parents = {parent_of[o] for o in back_by_country["R1000"]}
    assert len(spans_parents) >= 3
    u = dissolve.dissolve_union(back_by_country["R1000"])
    assert len(u) == 1


def _mp_rect(x0, y0, x1, y1):
    return [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                      dtype=np.float64)]]


def _grid_oracle_area(parent, children, residual, n=220):
    """Rasterized numpy oracle: dense grid over the parent bbox — the
    fraction of points in (parent minus union(children)) must match
    point-in-residual-polys, and the areas must agree."""
    x0, y0, x1, y1 = geom.multipolygon_bbox(parent)
    xs = np.linspace(x0 + 1e-4, x1 - 1e-4, n)
    ys = np.linspace(y0 + 1e-4, y1 - 1e-4, n)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    inp = geom.points_in_multipolygon(gx, gy, parent)
    inc = np.zeros(len(gx), dtype=bool)
    for ch in children.values():
        inc |= geom.points_in_multipolygon(gx, gy, ch)
    want = inp & ~inc
    got = np.zeros(len(gx), dtype=bool)
    for polys in residual:
        got |= geom.points_in_rings(gx, gy, polys)
    cell = ((x1 - x0) / n) * ((y1 - y0) / n)
    # boundary-adjacent grid points may flip either way; compare areas
    # and demand pointwise agreement away from edges (>=99.5%)
    assert np.mean(want == got) > 0.995
    return want.sum() * cell, got.sum() * cell


def test_residual_overlay_nonconformal_overhang():
    """G11 general difference (VERDICT r02 item 5): a child OVERLAPPING
    another child and sticking out past the parent boundary — the
    configuration exact cancellation cannot represent — must route
    through the intersection overlay and produce the right residual."""
    from posmspark.dissolve import (_collect_segments, _has_proper_crossing,
                                    residual_classify)

    parent = _mp_rect(0, 0, 4, 4)
    children = {
        "A": _mp_rect(0, 0, 2, 4),          # conformal left half
        "B": _mp_rect(1.5, 1, 3, 5),        # overlaps A, overhangs the top
    }
    segs = _collect_segments([parent] + list(children.values()))
    assert _has_proper_crossing(segs)
    status, residual = residual_classify(parent, children)
    assert status == "filler"
    area = sum(geom.ring_area(r) for polys in residual for r in polys)
    # parent 16 - (A 8 + B-inside 4.5 - overlap 1.5) = 5
    assert abs(area - 5.0) < 1e-9
    a_want, a_got = _grid_oracle_area(parent, children, residual)
    assert abs(a_want - a_got) < 0.05


def test_residual_overlay_matches_cancellation_on_conformal():
    """On a conformal input the overlay and the exact-cancellation path
    must agree (parity pin for the dispatch)."""
    from posmspark.dissolve import residual_classify, residual_overlay

    parent = _mp_rect(0, 0, 4, 4)
    children = {"A": _mp_rect(0, 0, 2, 4)}
    status, via_mesh = residual_classify(parent, children)
    assert status == "filler"
    via_overlay = residual_overlay(parent, children)
    a1 = sum(geom.ring_area(r) for polys in via_mesh for r in polys)
    a2 = sum(geom.ring_area(r) for polys in via_overlay for r in polys)
    assert abs(a1 - 8.0) < 1e-9 and abs(a2 - 8.0) < 1e-9
    assert len(via_mesh) == len(via_overlay) == 1


def test_residual_overlay_annular_hole():
    """Child strictly inside the parent: the overlay must return one
    outer ring with one hole (not two positive polygons)."""
    from posmspark.dissolve import residual_overlay

    parent = _mp_rect(0, 0, 4, 4)
    children = {"A": _mp_rect(1, 1, 2, 2)}
    residual = residual_overlay(parent, children)
    assert len(residual) == 1
    assert len(residual[0]) == 2  # outer + hole
    area = sum(geom.ring_area(r) for r in residual[0])
    assert abs(area - 15.0) < 1e-9


def test_residual_overlay_thin_sliver_exact():
    """VERDICT r03 item 6: a residual sliver FAR thinner than the old
    fixed probe offset (len*1e-5) must classify exactly. Side
    classification is now the exact symbolic-perturbation one-sided
    parity (r05 — no constructed probe point at all), so thickness can
    never be probed across — the old fixed offsets probed straight
    over this 1e-6-thick sliver and returned an empty residual."""
    from posmspark.dissolve import residual_overlay

    parent = _mp_rect(0, 0, 10, 1)
    children = {"A": _mp_rect(0, 0, 10, 1 - 1e-6)}
    residual = residual_overlay(parent, children)
    assert len(residual) == 1 and len(residual[0]) == 1
    area = sum(geom.ring_area(r) for r in residual[0])
    assert abs(area - 10 * 1e-6) < 1e-12

    # and the mirror case through the union: two rects overlapping in a
    # 1e-6-thin horizontal band must still union to ONE polygon of the
    # exact combined area (thin-overlap probes stay on the right side)
    from posmspark.dissolve import union_overlay

    u = union_overlay([_mp_rect(0, 0, 10, 1), _mp_rect(0, 1 - 1e-6, 10, 2)])
    assert len(u) == 1
    ua = sum(geom.ring_area(r) for polys in u for r in polys)
    assert abs(ua - 10 * 2) < 1e-12  # 10 + (10+1e-5) - 1e-5 overlap


def test_dispatch_detects_thin_overlap():
    """r04: the disjointness DISPATCH itself must catch an overlap band
    thinner than the old fixed probe offset — it used to route two
    rects overlapping in a 1e-6 band to exact cancellation, whose union
    classified the band OUTSIDE under even-odd (silent wrong). With
    clearance-bounded dispatch probes the pair routes through the exact
    overlay; a conformal mesh (duplicate shared border, clearance 0 on
    the carrier) must still dispatch to cancellation."""
    from posmspark.dissolve import (_collect_segments, _disjoint_interiors,
                                    dissolve_union)

    thin = [_mp_rect(0, 0, 10, 1), _mp_rect(0, 1 - 1e-6, 10, 2)]
    assert not _disjoint_interiors(thin, _collect_segments(thin))
    u = dissolve_union({"A": thin[0], "B": thin[1]})
    assert len(u) == 1
    band = geom.points_in_multipolygon(
        np.array([5.0]), np.array([1 - 5e-7]), u)
    assert bool(band[0])
    area = sum(geom.ring_area(r) for polys in u for r in polys)
    assert abs(area - 20.0) < 5e-8

    conformal = [_mp_rect(0, 0, 2, 2), _mp_rect(2, 0, 4, 2)]
    assert _disjoint_interiors(conformal, _collect_segments(conformal))


def test_dispatch_conformal_at_projected_scales():
    """r04 review: a T-junction vertex ON a segment midpoint gives
    clearance 0; with a fixed 1e-13 probe floor the probe rounded onto
    the boundary at projected-coordinate magnitudes (UTM ~1e5) and
    conformal meshes misrouted off the cancellation fast path. The
    scale-aware floor must keep them dispatching to cancellation while
    thin overlaps stay detected at the same scales."""
    from posmspark.dissolve import _collect_segments, _disjoint_interiors

    for s in (1.0, 1e4, 1e6):
        conformal = [
            _mp_rect(0, 0, 10 * s, s),
            _mp_rect(0, s, 5 * s, 2 * s),      # split at the midpoint
            _mp_rect(5 * s, s, 10 * s, 2 * s),  # -> T-junction at (5s, s)
        ]
        assert _disjoint_interiors(
            conformal, _collect_segments(conformal)), s
        thin = [_mp_rect(0, 0, 10 * s, s),
                _mp_rect(0, s * (1 - 1e-6), 10 * s, 2 * s)]
        assert not _disjoint_interiors(thin, _collect_segments(thin)), s


def test_residual_overlay_sliver_fuzz_bounded():
    """Bounded in-suite version of the r04 thin-sliver fuzz (500
    external seeds clean): random sliver thicknesses in [1e-7, 1e-5] —
    the exact regime the old fixed probes straddled. Area tolerance
    5e-8 covers SNAP(1e-9)-quantization noise along the ~20-unit
    perimeter; a misclassified sub-segment would err by >= ~1e-6."""
    from posmspark.dissolve import residual_overlay, union_overlay

    for seed in (2, 3, 14, 17, 31, 101, 202):
        rng = np.random.default_rng(seed)
        delta = 10 ** rng.uniform(-7, -5)
        x0 = round(rng.uniform(0, 3), 3)
        x1 = round(rng.uniform(7, 10), 3)
        parent = _mp_rect(0, 0, 10, 1)
        child = _mp_rect(x0, 0, x1, 1 - delta)
        res = residual_overlay(parent, {"A": child})
        want = 10.0 - (x1 - x0) * (1 - delta)
        got = sum(geom.ring_area(r) for polys in res for r in polys)
        assert abs(got - want) < 5e-8, (seed, want, got)
        u = union_overlay([parent, child])
        ua = sum(geom.ring_area(r) for polys in u for r in polys)
        assert abs(ua - 10.0) < 5e-8, (seed, ua)


def test_residual_crossing_detection_negative():
    """The conformal fixture meshes must NOT trip the crossing scan
    (they'd silently lose the exact-cancellation path)."""
    from posmspark.dissolve import _collect_segments, _has_proper_crossing
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf())
    lp = prepared.levels_pdf
    for parent in lp.query("adminlevel == 1").osm_id:
        kids = lp[(lp.adminlevel == 2) & (lp.is_in == parent)].osm_id
        if not len(kids):
            continue
        polys = [prepared.polys_by_id[parent]] + [
            prepared.polys_by_id[k] for k in kids]
        assert not _has_proper_crossing(_collect_segments(polys)), parent


def test_union_overlay_overlapping_rects():
    """G11 general union: two properly-overlapping rectangles (the case
    odd-segment cancellation cannot represent) must dispatch through
    the overlay and union to one polygon with the inclusion-exclusion
    area."""
    from posmspark.dissolve import (_collect_segments, _has_proper_crossing,
                                    dissolve_union)

    polys = {"A": _mp_rect(0, 0, 4, 4), "B": _mp_rect(2, 2, 6, 6)}
    assert _has_proper_crossing(_collect_segments(list(polys.values())))
    u = dissolve_union(polys)
    assert len(u) == 1
    area = sum(geom.ring_area(r) for r in u[0])
    assert abs(area - (16 + 16 - 4)) < 1e-9


def test_union_overlay_disjoint_plus_overlap():
    """Overlapping pair + a disjoint third polygon -> two output
    polygons; total area exact."""
    from posmspark.dissolve import dissolve_union

    polys = {
        "A": _mp_rect(0, 0, 4, 4),
        "B": _mp_rect(3, 0, 5, 2),   # overlaps A by 1x2
        "C": _mp_rect(10, 10, 12, 12),
    }
    u = dissolve_union(polys)
    assert len(u) == 2
    area = sum(geom.ring_area(r) for polys_ in u for r in polys_)
    assert abs(area - (16 + 4 - 2 + 4)) < 1e-9


def test_union_overlay_contained_polygon_absorbed():
    """A polygon strictly inside another contributes nothing to the
    union boundary (its edges are interior on both sides)."""
    from posmspark.dissolve import union_overlay

    u = union_overlay([_mp_rect(0, 0, 4, 4), _mp_rect(1, 1, 2, 2)])
    assert len(u) == 1
    assert len(u[0]) == 1  # no hole: the inner square is union interior
    assert abs(geom.ring_area(u[0][0]) - 16.0) < 1e-9


def test_union_dispatch_catches_containment_and_collinear_overlap():
    """Review r03 (critical): the crossing scan alone missed overlap
    configurations with NO interior-interior crossing — containment,
    collinear partial overlap, exact duplicates — silently producing
    wrong unions via parity cancellation. The disjoint-interiors probe
    must route all three to the overlay."""
    from posmspark.dissolve import dissolve_union

    # containment: B strictly inside A -> union is A (16), no hole
    u = dissolve_union({"A": _mp_rect(0, 0, 4, 4),
                        "B": _mp_rect(1, 1, 2, 2)})
    assert len(u) == 1 and len(u[0]) == 1
    assert abs(geom.ring_area(u[0][0]) - 16.0) < 1e-9

    # collinear partial overlap: crossings land on endpoints only
    u = dissolve_union({"A": _mp_rect(0, 0, 4, 4),
                        "B": _mp_rect(2, 0, 6, 4)})
    assert len(u) == 1 and len(u[0]) == 1
    assert abs(geom.ring_area(u[0][0]) - 24.0) < 1e-9

    # exact duplicate: parity cancellation would EMPTY the union
    u = dissolve_union({"A": _mp_rect(0, 0, 4, 4),
                        "B": _mp_rect(0, 0, 4, 4)})
    assert len(u) == 1
    assert abs(geom.ring_area(u[0][0]) - 16.0) < 1e-9


def test_residual_dispatch_catches_overlapping_children():
    """Review r03: overlapping children with no interior-interior
    crossing (B inside A, both children of the parent) must route to
    the overlay — cancellation double-counted the overlap (residual 12
    instead of 8)."""
    from posmspark.dissolve import residual_classify

    parent = _mp_rect(0, 0, 4, 4)
    children = {"A": _mp_rect(0, 0, 2, 4), "B": _mp_rect(0, 0, 1, 4)}
    status, residual = residual_classify(parent, children)
    assert status == "filler"
    area = sum(geom.ring_area(r) for polys in residual for r in polys)
    assert abs(area - 8.0) < 1e-9


def test_residual_dispatch_catches_out_of_parent_child():
    """A child disjoint from (outside) the parent must not leak its own
    outline into the residual via cancellation."""
    from posmspark.dissolve import residual_classify

    parent = _mp_rect(0, 0, 4, 4)
    children = {"A": _mp_rect(0, 0, 2, 4),   # left half, conformal
                "B": _mp_rect(10, 10, 12, 12)}  # fully outside
    status, residual = residual_classify(parent, children)
    assert status == "filler"
    area = sum(geom.ring_area(r) for polys in residual for r in polys)
    # residual = right half of the parent only (8), never B's outline
    assert abs(area - 8.0) < 1e-9


def test_union_dispatch_conformal_meshes_stay_exact():
    """The probe test must NOT misroute real conformal meshes (they
    keep the exact cancellation path and its bit-exact outputs)."""
    from posmspark.dissolve import (_collect_segments, _disjoint_interiors,
                                    dissolve_union)
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf())
    lp = prepared.levels_pdf
    for parent in lp.query("adminlevel == 1").osm_id:
        kids = lp[(lp.adminlevel == 2) & (lp.is_in == parent)].osm_id
        if not len(kids):
            continue
        mesh = {k: prepared.polys_by_id[k] for k in kids}
        assert _disjoint_interiors(
            list(mesh.values()), _collect_segments(list(mesh.values()))
        ), parent
        u = dissolve_union(mesh)
        assert len(u) >= 1


def test_simplify_mesh_global_empty_child_level(spark):
    """Review r03: the degenerate input prepare_boundaries now survives
    (no country rows) must flow through simplify_mesh_global as an
    empty typed result, not a createDataFrame schema-inference crash."""
    from posmspark.dissolve import simplify_mesh_global
    from posmspark.joins import prepare_boundaries

    bpdf = synth.gen_boundaries_pdf()
    no_l0 = bpdf[bpdf.admin_level != "2"].reset_index(drop=True)
    prepared = prepare_boundaries(no_l0, synth.gen_admin_mapping_pdf())
    out = simplify_mesh_global(spark, prepared, child_level=2, tol=0.05)
    assert out.count() == 0
    assert out.columns == ["osm_id", "parent_osm_id", "n_points_before",
                           "n_points_after", "geom_wkb"]


def _tri_mp(pts):
    a = np.vstack([np.asarray(pts, float), [pts[0]]])
    if geom.ring_area(a) < 0:
        a = a[::-1].copy()
    return [[a]]


def test_overlay_crossing_points_bit_identical():
    """Fuzz-found (r03): the two halves of one geometric crossing were
    split at floats derived from EACH segment's own parametrization;
    on this triangle configuration the coordinates quantized to
    snap keys ONE QUANTUM apart, leaving degree-1 vertices and a
    self-crossing 1.14-area 'union' of inputs covering ~7.5. Split
    points are now derived canonically (lower-index parametrization /
    endpoint coordinates), making both halves bit-identical."""
    from posmspark.dissolve import dissolve_union

    tris = {
        "p0": _tri_mp([[4.81, 6.05], [8.62, 0.65], [8.63, 1.65]]),
        "p1": _tri_mp([[6.71, 3.96], [4.94, 2.78], [9.39, 0.42]]),
        "p2": _tri_mp([[1.22, 2.75], [6.48, 3.88], [7.39, 4.72]]),
        "p3": _tri_mp([[2.92, 6.5], [2.84, 6.26], [5.0, 8.68]]),
    }
    u = dissolve_union(tris)
    # point-sampling oracle: result membership == any-input membership
    rng = np.random.default_rng(338)
    px = rng.uniform(-1, 11, 3000)
    py = rng.uniform(-1, 11, 3000)
    want = np.zeros(len(px), bool)
    for polys in tris.values():
        want |= geom.points_in_multipolygon(px, py, polys)
    got = geom.points_in_multipolygon(px, py, u)
    # tolerate only points within snap distance of an input edge
    assert (got != want).mean() < 0.003
    area = sum(geom.ring_area(r) for p in u for r in p)
    assert 7.0 < area < 8.5


def test_overlay_random_fuzz_vs_point_oracle():
    """Bounded in-suite version of the r03 overlay fuzz: random
    overlapping rectangles+triangles, union AND residual checked
    against a point-sampling oracle (fixed seeds incl. the three
    that originally failed: 119, 170, 338)."""
    from posmspark.dissolve import dissolve_union, residual_classify

    def rect_mp(x0, y0, x1, y1):
        return [[np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)]]

    def check(seed):
        rng = np.random.default_rng(seed)
        k = rng.integers(2, 6)
        inputs = {}
        for i in range(k):
            if rng.random() < 0.6:
                x0, y0 = rng.uniform(0, 8, 2)
                w, h = rng.uniform(0.5, 4, 2)
                inputs[f"p{i}"] = rect_mp(
                    round(x0, 2), round(y0, 2),
                    round(x0 + w, 2), round(y0 + h, 2))
            else:
                pts = np.round(rng.uniform(0, 10, (3, 2)), 2)
                g = _tri_mp(pts)
                if abs(geom.ring_area(g[0][0])) < 0.1:
                    continue
                inputs[f"p{i}"] = g
        if len(inputs) < 2:
            return
        prng = np.random.default_rng(seed + 10000)
        px = prng.uniform(-1, 11, 2500)
        py = prng.uniform(-1, 11, 2500)
        in_any = np.zeros(len(px), bool)
        for polys in inputs.values():
            in_any |= geom.points_in_multipolygon(px, py, polys)

        u = dissolve_union(inputs)
        got = geom.points_in_multipolygon(px, py, u)
        assert (got != in_any).mean() < 0.005, f"union seed={seed}"

        parent = rect_mp(0, 0, 10, 10)
        in_parent = geom.points_in_multipolygon(px, py, parent)
        _status, res = residual_classify(parent, inputs)
        got_r = (geom.points_in_multipolygon(px, py, res)
                 if res else np.zeros(len(px), bool))
        want_r = in_parent & ~in_any
        assert (got_r != want_r).mean() < 0.005, f"residual seed={seed}"

    # 1978: near-vertex crossing cluster producing a ~5e-5 micro-sub
    # whose own-carrier c0 is pure rounding noise — caught the r05
    # exact-filter's missing absolute error term (fuzz, 3000 seeds)
    for seed in [119, 170, 338, 1978, *range(24)]:
        check(seed)


def test_dissolve_random_bsp_mesh_fuzz():
    """Bounded in-suite version of the r03 BSP-mesh fuzz: random
    conformal tilings at irrational coordinates — union of all tiles
    must be exactly the parent rectangle (area + one outer polygon),
    and the residual of a random subset must equal the dropped tiles'
    area (exercises cancellation, hole grouping, and the
    disjoint-interiors dispatch on non-tiling subsets)."""
    from posmspark.dissolve import dissolve_union, residual_classify

    def bsp(x0, y0, x1, y1, rng, depth):
        if depth == 0 or rng.random() < 0.2:
            return [[np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]]
        if rng.random() < 0.5 and x1 - x0 > 0.5:
            xm = x0 + (x1 - x0) * rng.uniform(0.3, 0.7)
            return (bsp(x0, y0, xm, y1, rng, depth - 1)
                    + bsp(xm, y0, x1, y1, rng, depth - 1))
        elif y1 - y0 > 0.5:
            ym = y0 + (y1 - y0) * rng.uniform(0.3, 0.7)
            return (bsp(x0, y0, x1, ym, rng, depth - 1)
                    + bsp(x0, ym, x1, y1, rng, depth - 1))
        return [[np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]]

    for seed in range(12):
        rng = np.random.default_rng(seed)
        x0, y0 = rng.uniform(0, 1, 2) * np.pi / 3
        W, H = rng.uniform(5, 9, 2) * np.sqrt(2) / 1.3
        tiles = bsp(x0, y0, x0 + W, y0 + H, rng, 4)
        if len(tiles) < 3:
            continue
        children = {f"c{i}": [t] for i, t in enumerate(tiles)}

        u = dissolve_union(children)
        ua = sum(geom.ring_area(r) for p in u for r in p)
        assert abs(ua - W * H) < 1e-6 * W * H, seed
        assert len(u) == 1, seed

        parent = [[np.array([[x0, y0], [x0 + W, y0], [x0 + W, y0 + H],
                             [x0, y0 + H], [x0, y0]])]]
        keep = {k: v for k, v in children.items() if rng.random() < 0.7}
        if not keep or len(keep) == len(children):
            continue
        dropped = sum(geom.ring_area(t[0][0])
                      for k, t in children.items() if k not in keep)
        _status, res = residual_classify(parent, keep)
        ra = sum(geom.ring_area(r) for p in res for r in p)
        assert abs(ra - dropped) < 1e-6 * max(dropped, 1), seed


def test_shared_edge_simplify_random_mesh_watertight():
    """Bounded in-suite version of the r03 simplify fuzz: random BSP
    meshes, borders densified with deterministic noise, simplified with
    shared_edge_simplify — every interior segment of the result must
    appear exactly twice (watertight), and the union of the simplified
    children must still cancel to one single-ring outline with ~the
    original area."""
    from collections import Counter

    from posmspark.dissolve import _key, dissolve_union, shared_edge_simplify

    def bsp(x0, y0, x1, y1, rng, depth):
        if depth == 0 or rng.random() < 0.2:
            return [[np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]]
        if rng.random() < 0.5 and x1 - x0 > 0.5:
            xm = x0 + (x1 - x0) * rng.uniform(0.3, 0.7)
            return (bsp(x0, y0, xm, y1, rng, depth - 1)
                    + bsp(xm, y0, x1, y1, rng, depth - 1))
        elif y1 - y0 > 0.5:
            ym = y0 + (y1 - y0) * rng.uniform(0.3, 0.7)
            return (bsp(x0, y0, x1, ym, rng, depth - 1)
                    + bsp(x0, ym, x1, y1, rng, depth - 1))
        return [[np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]]

    def conformal_noisy_children(tiles):
        # r05 harness fix: the old per-edge densification sampled
        # DIFFERENT points on the two sides of a border with mismatched
        # BSP subdivision, so the per-point noise diverged and the raw
        # mesh itself had sliver gaps (external fuzz seeds 6321/6406
        # split the union through no fault of the engine). Subdivide at
        # T-junction vertices first and sample each subsegment in
        # canonical direction -> both owners compute bit-identical
        # polylines, a genuinely conformal wiggled mesh.
        verts = set()
        for t in tiles:
            for p in t[0][:-1]:
                verts.add((float(p[0]), float(p[1])))

        def noisy_edge(a, b):
            lo, hi = (a, b) if a <= b else (b, a)
            if a[0] == b[0]:
                mids = sorted(v for v in verts
                              if v[0] == a[0] and lo[1] < v[1] < hi[1])
            else:
                mids = sorted(v for v in verts
                              if v[1] == a[1] and lo[0] < v[0] < hi[0])
            nodes = [lo] + mids + [hi]
            pts = []
            for i in range(len(nodes) - 1):
                aa, bb = np.array(nodes[i]), np.array(nodes[i + 1])
                d = bb - aa
                ln = np.hypot(*d)
                for k in range(5):
                    p = aa + (k / 5) * d
                    if k > 0:
                        h = hash((round(p[0] / 1e-9),
                                  round(p[1] / 1e-9))) % 1000
                        p = p + np.array([-d[1], d[0]]) / ln * (
                            (h / 1000 - 0.5) * 0.02)
                    pts.append(p)
            pts.append(np.array(hi, dtype=float))
            if a != lo:
                pts = pts[::-1]
            return pts[:-1]

        out = {}
        for i, t in enumerate(tiles):
            ring = t[0]
            pts = []
            for k in range(len(ring) - 1):
                a = (float(ring[k][0]), float(ring[k][1]))
                b = (float(ring[k + 1][0]), float(ring[k + 1][1]))
                pts.extend(noisy_edge(a, b))
            pts.append(pts[0].copy())
            out[f"c{i}"] = [[np.array(pts)]]
        return out

    # 6321/6406: the seeds whose non-conformal old-generator meshes
    # split the union in the r05 external campaign — pinned green here
    # under the fixed generator
    for seed in [*range(8), 6321, 6406]:
        rng = np.random.default_rng(seed)
        x0, y0 = rng.uniform(0, 1, 2) * np.pi / 3
        W, H = rng.uniform(5, 9, 2) * np.sqrt(2) / 1.3
        tiles = bsp(x0, y0, x0 + W, y0 + H, rng, 3)
        if len(tiles) < 3:
            continue
        children = conformal_noisy_children(tiles)
        # conformality sanity: the RAW union is one single-ring polygon
        u0 = dissolve_union(children)
        assert len(u0) == 1 and len(u0[0]) == 1, seed
        simp = shared_edge_simplify(children, tol=0.05)

        cnt = Counter()
        for polys in simp.values():
            for rings in polys:
                for ring in rings:
                    for i in range(len(ring) - 1):
                        a, b = _key(ring[i]), _key(ring[i + 1])
                        sk = (a, b) if a < b else (b, a)
                        cnt[sk] += 1
        assert all(c <= 2 for c in cnt.values()), seed

        u = dissolve_union(simp)
        assert len(u) == 1 and len(u[0]) == 1, seed
        ua = sum(geom.ring_area(r) for p in u for r in p)
        assert abs(ua - W * H) < 0.05 * W * H, seed


def test_split_near_endpoint_crossings_stay_connected():
    """Review r03: a crossing whose parameter on one segment falls in
    the (1e-12, 1e-9] band was treated as a T-junction by one side but
    split at a different float by the other — the thresholds now agree,
    so the union of a near-endpoint-crossing pair must produce closed
    rings (no degree-1 vertices / open chains)."""
    from posmspark.dissolve import dissolve_union

    # B starts a hair short of A's carrier so their crossing lands at
    # parameter ~5e-10 on B
    eps = 5e-10
    a = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0],
                  [0.0, 0.0]])
    b = np.array([[2.0, -eps], [6.0, -eps], [6.0, 1.0], [2.0 + eps, 1.0],
                  [2.0, -eps]])
    u = dissolve_union({"A": [[a]], "B": [[b]]})
    area = sum(geom.ring_area(r) for p in u for r in p)
    # union of the two overlapping boxes ~ 8 + 4 - 2 = 10
    assert abs(area - 10.0) < 1e-3
    for p in u:
        for r in p:
            assert (r[0] == r[-1]).all()  # closed rings only


def test_overlay_utm_magnitude_thin_bands_exact_probes():
    """VERDICT r04 item 6 + ADVICE r04: at UTM coordinate magnitudes
    (~1e7) the scale-aware probe floor is 1e-5 absolute, yet bands of
    absolute thickness 1e-7..1e-6 are perfectly representable (ulp
    ~2e-9). The float probe would step straight across them — those
    arranged sub-segments must re-classify through the exact rational
    probes, and the dispatches must refuse exact cancellation."""
    from posmspark.dissolve import (_collect_segments, _disjoint_interiors,
                                    residual_classify, residual_overlay,
                                    union_overlay)

    B = 1.0e7
    for seed in (3, 11, 29, 47):
        rng = np.random.default_rng(seed)
        delta = 10 ** rng.uniform(-7, -6)
        parent = _mp_rect(B, B, B + 10, B + 1)
        child = _mp_rect(B + 2, B, B + 8, B + 1 - delta)

        # dispatch: the thin overlap band between two near-duplicate
        # rects must NOT be routed to exact cancellation
        thin = [_mp_rect(B, B, B + 10, B + 1),
                _mp_rect(B, B + 1 - delta, B + 10, B + 2)]
        assert not _disjoint_interiors(thin, _collect_segments(thin)), seed

        # residual: a point INSIDE the band is residual, a point just
        # below it (inside the child) is not — area asserts are
        # meaningless at this magnitude (shoelace noise ~0.05 >> band
        # area), membership is the exact observable
        res = residual_overlay(parent, {"A": child})
        assert res, seed
        bx = np.array([B + 5.0])
        in_band = geom.points_in_multipolygon(
            bx, np.array([B + 1 - delta / 2]), res)
        below = geom.points_in_multipolygon(
            bx, np.array([B + 0.5]), res)
        assert bool(in_band[0]), (seed, delta)
        assert not bool(below[0]), (seed, delta)
        # the wide side strips ARE residual
        side = geom.points_in_multipolygon(
            np.array([B + 1.0]), np.array([B + 0.5]), res)
        assert bool(side[0]), seed

        # union of the two thin-overlap rects covers the band region
        u = union_overlay(thin)
        got = geom.points_in_multipolygon(
            bx, np.array([B + 1 - delta / 2]), u)
        assert bool(got[0]), seed

        # conformal meshes at the same magnitude still dispatch exact
        conformal = [_mp_rect(B, B, B + 5, B + 1),
                     _mp_rect(B + 5, B, B + 10, B + 1)]
        assert _disjoint_interiors(
            conformal, _collect_segments(conformal)), seed


def test_overlay_micro_degree_magnitude():
    """Micro-degree coordinates (~1e-6, VERDICT r04 item 6): features
    sit only 2-4 decades above the SNAP quantum (1e-9). Residual and
    union must stay correct with SNAP-scaled area tolerances."""
    from posmspark.dissolve import residual_overlay, union_overlay

    s = 1e-6
    for seed in (2, 7, 19):
        rng = np.random.default_rng(seed)
        delta = 10 ** rng.uniform(-7.3, -6.7) * s * 100  # 5e-6..2e-5 rel
        parent = _mp_rect(0, 0, 10 * s, s)
        child = _mp_rect(2 * s, 0, 8 * s, s - delta)
        res = residual_overlay(parent, {"A": child})
        want = 10 * s * s - 6 * s * (s - delta)
        got = sum(geom.ring_area(r) for p in res for r in p)
        # SNAP quantization moves each boundary vertex <= 1e-9; the
        # area error bound is perimeter * SNAP
        tol = 44 * s * 1e-9 + 1e-24
        assert abs(got - want) < tol, (seed, want, got)
        u = union_overlay([parent, child])
        ua = sum(geom.ring_area(r) for p in u for r in p)
        assert abs(ua - 10 * s * s) < tol, (seed, ua)


def test_bsp_area_conservation_invariant_across_magnitudes():
    """The residual+dissolve conservation law (VERDICT r04 item 6):
    for a conformal BSP tiling, area(kept children) + area(residual)
    must equal area(parent) at unit, UTM (1e7 offset), and milli
    (1e-3 scale) magnitudes, to an ulp/SNAP-scaled tolerance."""
    from posmspark.dissolve import dissolve_union, residual_classify

    def bsp(x0, y0, x1, y1, rng, depth):
        if depth == 0 or rng.random() < 0.25:
            return [[np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]]
        if rng.random() < 0.5:
            xm = x0 + (x1 - x0) * rng.uniform(0.3, 0.7)
            return (bsp(x0, y0, xm, y1, rng, depth - 1)
                    + bsp(xm, y0, x1, y1, rng, depth - 1))
        ym = y0 + (y1 - y0) * rng.uniform(0.3, 0.7)
        return (bsp(x0, y0, x1, ym, rng, depth - 1)
                + bsp(x0, ym, x1, y1, rng, depth - 1))

    for base, scale in ((0.0, 1.0), (1.0e7, 1.0), (0.0, 1e-3)):
        for seed in (0, 4, 8):
            rng = np.random.default_rng(seed)
            W, H = rng.uniform(4, 8, 2) * np.sqrt(2) * scale
            x0 = base + rng.uniform(0, 1) * scale
            y0 = base + rng.uniform(0, 1) * scale
            tiles = bsp(x0, y0, x0 + W, y0 + H, rng, 3)
            if len(tiles) < 3:
                continue
            children = {f"c{i}": [t] for i, t in enumerate(tiles)}
            parent = [[np.array(
                [[x0, y0], [x0 + W, y0], [x0 + W, y0 + H],
                 [x0, y0 + H], [x0, y0]])]]
            keep = {k: v for k, v in children.items()
                    if rng.random() < 0.7}
            if not keep or len(keep) == len(children):
                continue
            kept_area = sum(geom.ring_area(t[0][0]) for t in keep.values())
            _status, res = residual_classify(parent, keep)
            res_area = sum(geom.ring_area(r) for p in res for r in p)
            parent_area = W * H
            # shoelace terms are ~(base+span)^2; conservation must hold
            # to a few hundred ulps of that + SNAP-perimeter noise
            ulp = np.spacing((base + W + H) ** 2)
            tol = 512 * ulp * max(len(tiles) * 8, 1) \
                + 8 * (W + H) * 1e-9
            assert abs(kept_area + res_area - parent_area) < tol, (
                base, scale, seed, kept_area, res_area, parent_area)


def test_eps_side_parity_grid_mesh_pruned_path():
    """Review r05: _eps_side_parity gained horizontal-edge exclusion +
    y-bucket candidate pruning + the fused two-side exact evaluator.
    Pin the semantics on the adversarial input for all three: a
    grid-aligned mesh where every vertex y coincides exactly with the
    midpoints of the horizontal probe segments (the old amb1/Fraction
    hot path). For every edge of every cell, exactly ONE side must be
    inside its owning cell, and no side may be inside any other cell.
    """
    from posmspark.dissolve import _eps_side_parity

    parts = []
    for gx in range(6):
        for gy in range(6):
            x0, y0 = float(gx), float(gy)
            parts.append([np.array(
                [[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1],
                 [x0, y0 + 1], [x0, y0]])])
    ab, owner = [], []
    for p, rings in enumerate(parts):
        for ring in rings:
            for i in range(len(ring) - 1):
                ab.append((ring[i][0], ring[i][1],
                           ring[i + 1][0], ring[i + 1][1]))
                owner.append(p)
    ab = np.asarray(ab, dtype=np.float64)
    plus, minus = _eps_side_parity(ab, parts)
    owner = np.asarray(owner)
    own_plus = plus[np.arange(len(ab)), owner]
    own_minus = minus[np.arange(len(ab)), owner]
    assert (own_plus ^ own_minus).all()  # exactly one side in the owner
    # cells are disjoint: each side lies in at most one cell; an
    # interior (shared) edge has its other side in the neighbor cell,
    # a hull edge has exactly one covered side in total
    assert (plus.sum(axis=1) <= 1).all()
    assert (minus.sum(axis=1) <= 1).all()
    tot = plus.sum(axis=1) + minus.sum(axis=1)
    on_hull = ((np.isin(ab[:, 0], (0.0, 6.0)) & (ab[:, 0] == ab[:, 2]))
               | (np.isin(ab[:, 1], (0.0, 6.0)) & (ab[:, 1] == ab[:, 3])))
    assert (tot[on_hull] == 1).all()
    assert (tot[~on_hull] == 2).all()


def _crossing_repair_mesh():
    """Mesh where endpoint-pinned per-chain DP breaks topology: the
    A|B border dips to y=0.55 (max deviation 0.45 < tol 0.5, so DP
    alone would flatten it to the straight chord y=1), and C is a
    SUPER-tolerance square enclave of A (side 1.2 > tol, so its ring
    survives simplification) straddling that chord above the dip —
    the flattened border properly crosses C's surviving ring. The r05
    repair must detect the crossing and revert both chains."""
    br = [(0.0, 1.0), (1.0, 1.0), (1.2, 0.58), (1.5, 0.56), (2.0, 0.55),
          (2.5, 0.56), (2.8, 0.58), (3.0, 1.0), (4.0, 1.0)]
    c_ring = np.array([[1.4, 0.65], [2.6, 0.65], [2.6, 1.85], [1.4, 1.85],
                       [1.4, 0.65]])
    a_outer = np.array(br + [(4.0, 2.0), (0.0, 2.0), (0.0, 1.0)])
    b_ring = np.array([(0.0, 0.0), (4.0, 0.0)] + br[::-1] + [(0.0, 0.0)])
    return {"A": [[a_outer, c_ring[::-1].copy()]], "B": [[b_ring]],
            "C": [[c_ring]]}


def test_simplify_repair_reverts_crossing_chains():
    """r05 topology repair: DP flattening a deep dip across an enclave
    must be detected and reverted, leaving a crossing-free watertight
    mesh whose union is still the single parent outline."""
    from posmspark.dissolve import (_has_proper_crossing, dissolve_union,
                                    shared_edge_simplify)

    children = _crossing_repair_mesh()
    stats = {}
    simp = shared_edge_simplify(children, tol=0.5, _stats=stats)
    # the A|B dip chain and C's enclave chain collided -> both reverted
    assert stats["n_reverted"] == 2
    segs = np.concatenate([
        np.concatenate([r[:-1], r[1:]], axis=1)
        for polys in simp.values() for rings in polys for r in rings])
    assert not _has_proper_crossing(segs)
    u = dissolve_union(simp)
    assert len(u) == 1 and len(u[0]) == 1
    area = sum(geom.ring_area(r) for p in u for r in p)
    assert abs(area - 8.0) < 1e-9


def test_simplify_mesh_global_repair_matches_driver(spark):
    """The distributed path must apply the IDENTICAL repair: on the
    crossing-triggering mesh, simplify_mesh_global's output equals the
    driver-side shared_edge_simplify array-for-array."""
    import types

    import pandas as pd

    from posmspark.dissolve import shared_edge_simplify, simplify_mesh_global

    children = _crossing_repair_mesh()
    lp = pd.DataFrame({
        "osm_id": ["A", "B", "C"],
        "is_in": ["P", "P", "P"],
        "adminlevel": [2, 2, 2],
    })
    prepared = types.SimpleNamespace(levels_pdf=lp, polys_by_id=children)
    rows = {r["osm_id"]: r
            for r in simplify_mesh_global(spark, prepared, child_level=2,
                                          tol=0.5).collect()}
    exp = shared_edge_simplify(children, tol=0.5)
    assert set(rows) == {"A", "B", "C"}
    for oid, exp_polys in exp.items():
        got = geom.wkb_to_multipolygon(bytes(rows[oid]["geom_wkb"]))
        exp_polys = [rings for rings in exp_polys if rings]
        assert len(got) == len(exp_polys), oid
        for gp, ep in zip(got, exp_polys):
            assert len(gp) == len(ep), oid
            for gr, er in zip(gp, ep):
                assert np.array_equal(gr, er), oid


def test_registry_fixture_simplify_repair_free():
    """Pins the simplify_mesh_stats AND dual_export ORACLES' scope:
    their SQL mirrors pure per-chain DP (no repair modeling), which is
    exact because the registry fixtures' meshes trigger zero reverts —
    checked per adminlevel across the FULL n_levels=4 hierarchy
    dual_export simplifies, not just the level-2 mesh
    simplify_mesh_stats uses."""
    from posmspark.dissolve import shared_edge_simplify
    from posmspark.joins import prepare_boundaries

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(),
        n_levels=4)
    for lvl in sorted(prepared.levels_pdf.adminlevel.unique()):
        kids = prepared.levels_pdf.query(f"adminlevel == {lvl}")
        # UNGUARDED lookup, mirroring dual_geojson_feature_df's own
        # mesh construction (sinks.py) — a missing id must fail here
        # exactly like it would in the shipped oracle path
        mesh = {oid: prepared.polys_by_id[oid] for oid in kids.osm_id}
        stats = {}
        shared_edge_simplify(mesh, tol=0.05, _stats=stats)
        assert stats["n_reverted"] == 0, lvl


def test_simplify_repair_collinear_landing():
    """Collinear conflict class (review r05): a sub-tolerance spike's
    A|E border collapses to its chord, landing EXACTLY on the E|B
    chain below — never a proper crossing. The repair's conservative
    rule reverts both chains (the spike survives unsimplified rather
    than risking inconsistent coincident borders), and the union stays
    one single-ring outline with exact area."""
    from posmspark.dissolve import dissolve_union, shared_edge_simplify

    a_ring = np.array([(0.0, 1.0), (1.9, 1.0), (1.9, 1.4), (2.0, 1.4),
                       (2.1, 1.4), (2.1, 1.0), (4.0, 1.0), (4.0, 2.0),
                       (0.0, 2.0), (0.0, 1.0)])
    e_ring = np.array([(1.9, 1.0), (2.1, 1.0), (2.1, 1.4), (2.0, 1.4),
                       (1.9, 1.4), (1.9, 1.0)])
    b_ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (2.1, 1.0),
                       (1.9, 1.0), (0.0, 1.0), (0.0, 0.0)])
    children = {"A": [[a_ring]], "B": [[b_ring]], "E": [[e_ring]]}
    stats = {}
    simp = shared_edge_simplify(children, tol=0.5, _stats=stats)
    assert stats["n_reverted"] == 2
    # the spike survives at full resolution instead of overlapping
    assert [len(r) for p in simp["E"] for r in p] == [6]
    u = dissolve_union(simp)
    assert len(u) == 1 and len(u[0]) == 1
    area = sum(geom.ring_area(r) for p in u for r in p)
    assert abs(area - 8.0) < 1e-9


def test_simplify_mesh_global_all_empty_polys(spark):
    """Review r05: features present at child_level but with EMPTY
    polys lists pass the mesh_ids guard yet yield zero chains; the
    repaired chains frame must use an explicit schema so the empty
    createDataFrame doesn't raise a schema-inference error."""
    import types

    import pandas as pd

    from posmspark.dissolve import simplify_mesh_global

    lp = pd.DataFrame({
        "osm_id": ["X", "Y"],
        "is_in": ["P", "P"],
        "adminlevel": [2, 2],
    })
    prepared = types.SimpleNamespace(levels_pdf=lp,
                                     polys_by_id={"X": [], "Y": []})
    rows = simplify_mesh_global(spark, prepared, child_level=2,
                                tol=0.5).collect()
    assert rows == [] or all(r["n_points_after"] == 0 for r in rows)


def test_simplify_repair_ignores_input_inherent_overlap():
    """Review r05 (confirmed regression probe): a zero-width
    out-and-back spike TALLER than tol self-overlaps collinearly in
    the INPUT itself — reverting cannot fix that, so the repair must
    baseline it out: n_reverted stays 0 (the pure-DP oracle-scope
    invariant) and the chain still simplifies normally elsewhere."""
    from posmspark.dissolve import shared_edge_simplify

    a_ring = np.array([(0.0, 1.0), (4.0, 1.0), (4.0, 2.0), (2.0, 2.0),
                       (2.0, 3.5), (2.0, 2.0), (0.0, 2.0), (0.0, 1.0)])
    b_ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (0.0, 1.0),
                       (0.0, 0.0)])
    stats = {}
    simp = shared_edge_simplify({"A": [[a_ring]], "B": [[b_ring]]},
                                tol=0.5, _stats=stats)
    assert stats["n_reverted"] == 0
    # the spike itself (deviation 1.5 > tol) is kept by DP — the
    # chain is simplified, not reverted wholesale
    assert any((r == [2.0, 3.5]).all(axis=1).any()
               for p in simp["A"] for r in p)


def test_simplify_repair_baseline_is_class_granular():
    """Review r05 round 2: the inherent-conflict baseline is keyed by
    conflict CLASS — A's zero-width spike (inherent collinear
    self-overlap, kept by DP) must not mask the simplification-induced
    PROPER crossing of A's dip chain through C's surviving enclave.
    The dip still reverts; the spike neither reverts nor blocks."""
    from posmspark.dissolve import shared_edge_simplify

    br = [(0.0, 1.0), (1.0, 1.0), (1.2, 0.58), (1.5, 0.56), (2.0, 0.55),
          (2.5, 0.56), (2.8, 0.58), (3.0, 1.0), (4.0, 1.0)]
    c_ring = np.array([[1.4, 0.65], [2.6, 0.65], [2.6, 1.85], [1.4, 1.85],
                       [1.4, 0.65]])
    a_outer = np.array(br + [(4.0, 2.0), (3.5, 2.0), (3.5, 3.0),
                             (3.5, 2.0), (0.0, 2.0), (0.0, 1.0)])
    b_ring = np.array([(0.0, 0.0), (4.0, 0.0)] + br[::-1] + [(0.0, 0.0)])
    children = {"A": [[a_outer, c_ring[::-1].copy()]], "B": [[b_ring]],
                "C": [[c_ring]]}
    stats = {}
    simp = shared_edge_simplify(children, tol=0.5, _stats=stats)
    assert stats["n_reverted"] == 2
    apts = simp["A"][0][0]
    assert (apts == [3.5, 3.0]).all(axis=1).any()   # spike survives DP
    assert (apts == [2.0, 0.55]).all(axis=1).any()  # dip chain reverted


@pytest.mark.parametrize("seed", [13, 43, 51, 72, 0])
def test_simplify_repair_random_dip_fuzz_pinned(seed):
    """Bounded in-suite subset of the r05 repair-triggering fuzz
    (1,150 external seeds clean): random deep dips in a two-row mesh
    border (deviation < tol, so DP flattens them) with super-tolerance
    chord-straddling enclaves and optional zero-width hull spikes.
    Seeds 13/43/51/72 trigger the repair (2 reverts each); seed 0 is a
    conflict-free control. Output must be watertight, crossing-free,
    one single-ring outline with exact area."""
    from collections import Counter

    from posmspark.dissolve import (_has_proper_crossing, _key,
                                    dissolve_union, shared_edge_simplify)

    rng = np.random.default_rng(seed)
    W = rng.uniform(8.0, 14.0)
    ymid = rng.uniform(1.0, 2.0)
    ytop = ymid + rng.uniform(1.5, 3.0)
    tol = 0.5
    n_dips = rng.integers(1, 4)
    starts = np.sort(rng.uniform(0.5, W - 3.0, n_dips))
    if not all(starts[i + 1] - starts[i] > 2.8 for i in range(n_dips - 1)):
        return
    br = [(0.0, ymid)]
    enclaves = []
    for s in starts:
        wdip = rng.uniform(2.2, 2.8)
        depth = rng.uniform(0.28, 0.45)
        npts = rng.integers(4, 8)
        xs = np.linspace(s, s + wdip, npts + 2)[1:-1]
        dippts = [(s, ymid)]
        br.append((s, ymid))
        for x in xs:
            y = float(ymid - depth * np.sin(np.pi * (x - s) / wdip))
            br.append((float(x), y))
            dippts.append((float(x), y))
        br.append((s + wdip, ymid))
        dippts.append((s + wdip, ymid))
        if rng.random() < 0.75:
            side = rng.uniform(1.3, 1.9) * tol
            cx = s + wdip / 2 + rng.uniform(-0.1, 0.1)
            cy = ymid + rng.uniform(-0.05, 0.25)
            top, bot = cy + side / 2, cy - side / 2
            x0, x1 = cx - side / 2, cx + side / 2
            dx = np.array([p[0] for p in dippts])
            dy = np.array([p[1] for p in dippts])
            border_max = float(np.interp(np.linspace(x0, x1, 32),
                                         dx, dy).max())
            if (top < ytop - 0.2 and x0 > s + 0.15
                    and x1 < s + wdip - 0.15 and bot > border_max + 0.12):
                enclaves.append(np.array(
                    [[x0, bot], [x1, bot], [x1, top], [x0, top],
                     [x0, bot]]))
    br.append((W, ymid))
    a_hull = [(W, ytop)]
    if rng.random() < 0.4:
        sx = rng.uniform(1.0, W - 1.0)
        a_hull += [(sx, ytop), (sx, ytop + rng.uniform(0.8, 1.5)),
                   (sx, ytop)]
    a_hull += [(0.0, ytop), (0.0, ymid)]
    a_outer = np.array(br + a_hull)
    children = {"A": [[a_outer] + [e[::-1].copy() for e in enclaves]],
                "B": [[np.array([(0.0, 0.0), (W, 0.0)] + br[::-1]
                                + [(0.0, 0.0)])]]}
    for i, e in enumerate(enclaves):
        children[f"E{i}"] = [[e.copy()]]
    stats = {}
    simp = shared_edge_simplify(children, tol=tol, _stats=stats)
    if seed in (13, 43, 51, 72):
        assert stats["n_reverted"] == 2, seed
    cnt = Counter()
    segs_all = []
    for polys in simp.values():
        for rings in polys:
            for ring in rings:
                for i in range(len(ring) - 1):
                    a, b = _key(ring[i]), _key(ring[i + 1])
                    cnt[(a, b) if a < b else (b, a)] += 1
                segs_all.append(
                    np.concatenate([ring[:-1], ring[1:]], axis=1))
    assert all(c <= 2 for c in cnt.values()), seed
    assert not _has_proper_crossing(np.concatenate(segs_all)), seed
    u = dissolve_union(simp)
    assert len(u) == 1 and len(u[0]) == 1, seed
    area = sum(geom.ring_area(r) for p in u for r in p)
    assert abs(area - W * ytop) < 0.05 * W * ytop, seed
