"""TopoJSON-style quantized topology tests (S11): shared arcs stored
once, watertight by structure, quantization-bounded round trip."""

import numpy as np
import pytest

from posmspark import dissolve, geom, synth, topo
from posmspark.joins import prepare_boundaries


def _mesh(level):
    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf()
    )
    ids = prepared.levels_pdf.query("adminlevel == @level").osm_id
    return {oid: prepared.polys_by_id[oid] for oid in ids}


def test_topology_shared_arcs_stored_once():
    # drop the duplicate-coverage twin: it overlays R1100 exactly, so it
    # references the same arcs in the same direction (tested separately)
    mesh = {k: v for k, v in _mesh(1).items() if k != "R1101"}
    t = topo.topology(mesh)
    # R1100|R1200 share the x=4 border, R1200|R1300 share x=8 -> those
    # arcs are each referenced by exactly two objects
    stats = {r["osm_id"]: r for r in topo.arc_stats(t)}
    for oid in ["R1100", "R1200", "R1300"]:
        assert stats[oid]["n_shared_arcs"] >= 1, stats[oid]
    # arc-reference signs: every shared arc appears once forward and
    # once reversed (watertight winding)
    ref_signs: dict[int, list[int]] = {}
    for g in t["objects"]["boundaries"]["geometries"]:
        for rings in g["arcs"]:
            for refs in rings:
                for ref in refs:
                    i = ~ref if ref < 0 else ref
                    ref_signs.setdefault(i, []).append(
                        -1 if ref < 0 else 1)
    shared = {i: s for i, s in ref_signs.items() if len(s) == 2}
    assert shared
    assert all(sorted(s) == [-1, 1] for s in shared.values())


def test_topology_duplicate_polygon_shares_all_arcs():
    """R1101 duplicates R1100 exactly: both reference identical arc ids
    (same direction) — the artifact stores the shared outline once."""
    mesh = {k: v for k, v in _mesh(1).items() if k in ("R1100", "R1101")}
    t = topo.topology(mesh)
    refs = {
        g["id"]: [ref for rings in g["arcs"] for rr in rings for ref in rr]
        for g in t["objects"]["boundaries"]["geometries"]
    }
    assert refs["R1100"] == refs["R1101"]


def test_topology_roundtrip_within_quantum():
    mesh = _mesh(2)
    q = 100_000
    t = topo.topology(mesh, quantization=q)
    back = topo.decode(t)
    assert set(back) == set(mesh)
    kx, ky = t["transform"]["scale"]
    for oid, polys in mesh.items():
        got = back[oid]
        assert len(got) == len(polys)
        for gp, ep in zip(got, polys):
            # every original vertex is within one quantization step of
            # some decoded vertex of the same ring
            for gr, er in zip(gp, ep):
                for pt in er[:-1]:
                    d = np.abs(gr[:-1] - pt[None, :])
                    assert (d[:, 0].min() <= kx * 0.51) and (
                        np.abs(gr[:-1] - pt[None, :]).sum(axis=1).min()
                        <= (kx + ky) * 0.51), (oid, pt)


def test_topology_decoded_mesh_watertight():
    """Decoded borders are the SAME arc on both owners, so the decoded
    level-1 mesh of Alphaland still dissolves to one polygon."""
    mesh = {k: v for k, v in _mesh(1).items()
            if k in ("R1100", "R1200", "R1300")}
    t = topo.topology(mesh, quantization=1_000_000)
    back = topo.decode(t)
    u = dissolve.dissolve_union(back)
    assert len(u) == 1
    x0, y0, x1, y1 = geom.multipolygon_bbox(u)
    assert abs(x0 - 0) < 1e-4 and abs(y0 - 0) < 1e-4
    assert abs(x1 - 12) < 1e-4 and abs(y1 - 10) < 1e-4


def test_topology_holes_preserved():
    """R2100 carries a hole: ring counts and hole area survive."""
    mesh = _mesh(1)
    t = topo.topology(mesh, quantization=1_000_000)
    back = topo.decode(t)
    exp = mesh["R2100"]
    got = back["R2100"]
    assert [len(rings) for rings in got] == [len(rings) for rings in exp]
    a_exp = sum(geom.ring_area(r) for rings in exp for r in rings)
    a_got = sum(geom.ring_area(r) for rings in got for r in rings)
    assert abs(a_exp - a_got) < 1e-3


def test_topology_tree_by_parent_distributed(spark, tmp_path):
    """Round-3 distributed tile-tree build (VERDICT r02 item 3): the
    per-parent applyInPandas build must (a) fan out one artifact per
    parent directory like prepare_topojson.py:76-160, (b) produce arc
    stats identical to a direct driver-side topology() of the same
    group, and (c) decode-round-trip from the written JSON artifact."""
    import json
    import os

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(),
        n_levels=4)
    out = str(tmp_path / "topotree")
    rows = topo.topology_tree_by_parent(
        spark, prepared, out_dir=out).collect()
    assert rows, "no topology groups built"

    by_parent: dict[str, list] = {}
    for r in rows:
        by_parent.setdefault(r["parent_osm_id"], []).append(r)

    lp = prepared.levels_pdf
    for parent, members in by_parent.items():
        # the group is the parent (is_boundary) + its direct children
        ids = {m["osm_id"] for m in members}
        kids = set(lp[lp.is_in == parent].osm_id)
        assert ids == kids | {parent}
        flags = {m["osm_id"]: m["is_boundary"] for m in members}
        assert flags[parent] is True
        assert all(flags[k] is False for k in kids)

        # artifact on disk, decodable, stats match a direct build
        path = os.path.join(out, parent, "geometry.topojson.json")
        with open(path) as f:
            t = json.load(f)
        assert len(json.dumps(t, separators=(",", ":")).encode()) == \
            members[0]["artifact_bytes"]
        back = topo.decode(t)
        assert set(back) == ids
        direct = topo.topology(
            {oid: prepared.polys_by_id[oid] for oid in ids})
        want = {s["osm_id"]: s for s in topo.arc_stats(direct)}
        for m in members:
            s = want[m["osm_id"]]
            assert (m["n_arc_refs"], m["n_shared_arcs"],
                    m["n_quantized_points"]) == (
                s["n_arc_refs"], s["n_shared_arcs"],
                s["n_quantized_points"]), m["osm_id"]

    # every non-leaf feature at every level got a directory
    for lv in sorted(lp.adminlevel.unique()):
        for parent in lp[lp.adminlevel == lv].osm_id:
            has_kids = (lp.is_in == parent).any()
            assert os.path.isdir(os.path.join(out, parent)) == bool(
                has_kids), parent


def test_topology_tree_zero_groups_no_crash(spark, tmp_path):
    """ADVICE r03: a hierarchy with no (parent, children) pairs — e.g.
    only leaf features — used to crash createDataFrame schema inference
    on the all-object empty pandas frame. Must return an empty typed
    result and leave an empty (but present) artifact tree."""
    import os
    import types

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(),
        n_levels=4)
    lp = prepared.levels_pdf
    leaves_only = types.SimpleNamespace(
        levels_pdf=lp[lp.adminlevel == lp.adminlevel.max()],
        polys_by_id=prepared.polys_by_id)
    out = str(tmp_path / "topotree")
    rows = topo.topology_tree_by_parent(
        spark, leaves_only, out_dir=out).collect()
    assert rows == []
    assert os.path.isdir(out) and os.listdir(out) == []

    # and without an out_dir at all
    assert topo.topology_tree_by_parent(
        spark, leaves_only, out_dir=None).collect() == []


def test_topology_tree_swap_guarded_on_missing_artifacts(
        spark, tmp_path, monkeypatch):
    """ADVICE r03: the build/promote swap assumes executors share the
    driver's filesystem. If the reported parent artifacts did not land
    in build_dir (non-shared storage), the swap must raise and leave
    the previous good tree untouched instead of replacing it with an
    empty one."""
    import os
    import shutil

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(),
        n_levels=4)
    out = str(tmp_path / "topotree")
    topo.topology_tree_by_parent(spark, prepared, out_dir=out).collect()
    good = sorted(os.listdir(out))
    assert good

    # simulate executor-side writes invisible to the driver (non-shared
    # filesystem): empty build_dir right before the promote-time
    # verification by hooking the makedirs that runs just ahead of it
    real_makedirs = os.makedirs

    def wipe_build(path, *args, **kwargs):
        real_makedirs(path, *args, **kwargs)
        if str(path).endswith(".build"):
            for d in os.listdir(path):
                shutil.rmtree(os.path.join(path, d))

    monkeypatch.setattr(os, "makedirs", wipe_build)
    with pytest.raises(RuntimeError, match="share a filesystem"):
        topo.topology_tree_by_parent(spark, prepared, out_dir=out)
    # previous tree intact
    assert sorted(os.listdir(out)) == good


def test_topology_tree_rebuild_clears_stale_dirs(spark, tmp_path):
    """Review r03: out_dir is a per-run product — a rebuild must not
    leave directories from a previous run (e.g. a since-removed parent)
    mixed into the artifact tree."""
    import os

    prepared = prepare_boundaries(
        synth.gen_boundaries_pdf(), synth.gen_admin_mapping_pdf(),
        n_levels=4)
    out = str(tmp_path / "topotree")
    os.makedirs(os.path.join(out, "GONE_PARENT"))
    with open(os.path.join(out, "GONE_PARENT", "geometry.topojson.json"),
              "w") as f:
        f.write("{}")
    topo.topology_tree_by_parent(spark, prepared, out_dir=out).collect()
    assert not os.path.exists(os.path.join(out, "GONE_PARENT"))
    assert os.listdir(out), "rebuild wrote nothing"
