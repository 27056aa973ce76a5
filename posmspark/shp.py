"""Minimal ESRI shapefile polygon source (S3).

The reference ingests GADM boundary shapefile-zips through OGR
(extract_gadm.py:32-40; exposm/reader.py:90-93 opens the .shp layer).
This is a from-scratch numpy/struct reader for the polygon subset those
zips contain: .shp type-5 Polygon records + .dbf (dBase III) attribute
rows, optionally pulled straight from a .zip. No GDAL, no third-party
parsers.

Ring conventions: shapefiles store outer rings clockwise and holes
counter-clockwise; the engine uses CCW outers (ring_area > 0) with CW
holes, so rings are reoriented on read and holes are attached to the
outer ring containing their first vertex. A matching writer exists so
round-trips can be tested without external data (and doubles as a
shapefile sink).
"""

from __future__ import annotations

import io
import struct
import zipfile

import numpy as np
import pandas as pd

from posmspark import geom

_SHP_POLYGON = 5
_SHP_NULL = 0


def read_shp_polygons(shp_bytes: bytes) -> list[tuple[int, list]]:
    """Parse .shp bytes -> [(record_number, polys)] where polys is the
    engine's MultiPolygon shape: list of [outer_ring, *holes]."""
    mv = memoryview(shp_bytes)
    (file_code,) = struct.unpack_from(">i", mv, 0)
    if file_code != 9994:
        raise ValueError(f"not a shapefile (file code {file_code})")
    (file_len_words,) = struct.unpack_from(">i", mv, 24)
    version, shape_type = struct.unpack_from("<ii", mv, 28)
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    if shape_type not in (_SHP_POLYGON, _SHP_NULL):
        raise ValueError(f"only Polygon shapefiles supported, got "
                         f"type {shape_type}")
    end = file_len_words * 2
    off = 100
    out = []
    while off < end:
        rec_no, content_words = struct.unpack_from(">ii", mv, off)
        off += 8
        (rtype,) = struct.unpack_from("<i", mv, off)
        if rtype == _SHP_NULL:
            off += content_words * 2
            continue
        if rtype != _SHP_POLYGON:
            raise ValueError(f"record {rec_no}: unsupported shape {rtype}")
        # box (4 doubles) skipped; then numParts, numPoints
        n_parts, n_points = struct.unpack_from("<ii", mv, off + 36)
        parts = np.frombuffer(mv, dtype="<i4", count=n_parts,
                              offset=off + 44)
        pts = np.frombuffer(
            mv, dtype="<f8", count=n_points * 2,
            offset=off + 44 + 4 * n_parts,
        ).reshape(n_points, 2).copy()
        bounds = np.append(parts, n_points)
        rings = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
        out.append((rec_no, _group_rings(rings)))
        off += content_words * 2
    return out


def _group_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Shapefile parts -> polygons: CW parts are outers (reoriented to
    the engine's CCW), CCW parts are holes (reoriented CW) attached to
    the outer containing their first vertex."""
    outers, holes = [], []
    for ring in rings:
        if len(ring) and not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        if geom.ring_area(ring) < 0:  # shapefile outer (CW)
            outers.append(ring[::-1].copy())
        else:
            holes.append(ring[::-1].copy())
    if not outers:
        # degenerate file with holes only: treat them as outers
        return [[h[::-1].copy()] for h in holes]
    polys = [[o] for o in outers]
    for h in holes:
        for p in polys:
            if geom.points_in_rings(h[0, 0:1], h[0, 1:2], [p[0]])[0]:
                p.append(h)
                break
        else:
            polys[0].append(h)
    return polys


def write_shp_polygons(polys_list: list[list[list[np.ndarray]]]) -> bytes:
    """Engine MultiPolygons -> .shp bytes (the round-trip writer/sink)."""
    records = []
    allpts = []
    for rec_no, polys in enumerate(polys_list, start=1):
        rings = []
        for poly in polys:
            # outer first, engine-CCW -> shapefile-CW; holes -> CCW
            rings.append(poly[0][::-1])
            rings.extend(h[::-1] for h in poly[1:])
        pts = np.vstack(rings)
        allpts.append(pts)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        box = (pts[:, 0].min(), pts[:, 1].min(),
               pts[:, 0].max(), pts[:, 1].max())
        content = b"".join([
            struct.pack("<i", _SHP_POLYGON),
            struct.pack("<4d", *box),
            struct.pack("<ii", len(rings), len(pts)),
            parts.tobytes(),
            pts.astype("<f8").tobytes(),
        ])
        header = struct.pack(">ii", rec_no, len(content) // 2)
        records.append(header + content)
    body = b"".join(records)
    gp = np.vstack(allpts) if allpts else np.zeros((1, 2))
    file_len = (100 + len(body)) // 2
    head = b"".join([
        struct.pack(">i", 9994), b"\x00" * 20,
        struct.pack(">i", file_len),
        struct.pack("<ii", 1000, _SHP_POLYGON),
        struct.pack("<4d", gp[:, 0].min(), gp[:, 1].min(),
                    gp[:, 0].max(), gp[:, 1].max()),
        struct.pack("<4d", 0, 0, 0, 0),  # Z/M ranges unused
    ])
    return head + body


def read_dbf(dbf_bytes: bytes) -> pd.DataFrame:
    """Minimal dBase III attribute reader (C/N field types)."""
    mv = memoryview(dbf_bytes)
    n_records = struct.unpack_from("<I", mv, 4)[0]
    header_size, record_size = struct.unpack_from("<HH", mv, 8)
    fields = []
    off = 32
    while mv[off] != 0x0D:
        raw = bytes(mv[off:off + 11])
        name = raw.split(b"\x00", 1)[0].decode("ascii")
        ftype = chr(mv[off + 11])
        flen = mv[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    rows = []
    off = header_size
    for _ in range(n_records):
        if chr(mv[off]) == "*":  # deleted row
            off += record_size
            continue
        pos = off + 1
        row = {}
        for name, ftype, flen in fields:
            raw = bytes(mv[pos:pos + flen]).decode("utf-8",
                                                   "replace").strip()
            if ftype == "N" and raw:
                row[name] = float(raw) if "." in raw else int(raw)
            else:
                row[name] = raw or None
            pos += flen
        rows.append(row)
        off += record_size
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def write_dbf(pdf: pd.DataFrame) -> bytes:
    """Minimal dBase III writer (all fields as C strings; round-trip
    fixture support)."""
    cols = list(pdf.columns)
    widths = {
        c: max(1, int(pdf[c].astype(str).str.encode("utf-8").str.len()
                      .max() or 1))
        for c in cols
    }
    record_size = 1 + sum(widths[c] for c in cols)
    header_size = 32 + 32 * len(cols) + 1
    out = [struct.pack("<BBBBIHH", 3, 26, 1, 1, len(pdf),
                       header_size, record_size), b"\x00" * 20]
    for c in cols:
        out.append(bytes(c[:10], "ascii").ljust(11, b"\x00") + b"C"
                   + b"\x00" * 4 + bytes([widths[c]]) + b"\x00" * 15)
    out.append(b"\x0D")
    for _, row in pdf.iterrows():
        out.append(b" ")
        for c in cols:
            v = "" if pd.isna(row[c]) else str(row[c])
            out.append(v.encode("utf-8")[: widths[c]].ljust(widths[c], b" "))
    out.append(b"\x1A")
    return b"".join(out)


def read_shapefile_zip(zip_path: str) -> tuple[list, pd.DataFrame]:
    """GADM-style boundary zip -> ([(rec_no, polys)], attributes df)."""
    with zipfile.ZipFile(zip_path) as zf:
        shp_name = next(n for n in zf.namelist() if n.endswith(".shp"))
        dbf_name = next((n for n in zf.namelist() if n.endswith(".dbf")),
                        None)
        shapes = read_shp_polygons(zf.read(shp_name))
        attrs = read_dbf(zf.read(dbf_name)) if dbf_name else pd.DataFrame()
    return shapes, attrs


def boundaries_from_shapefile_zip(
    zip_path: str,
    field_map: dict[str, str] | None = None,
) -> pd.DataFrame:
    """Shapefile-zip -> the engine's boundary input shape
    (gen_boundaries_pdf columns), ready for prepare_boundaries.

    field_map maps boundary columns to dbf field names; defaults use
    the fixture writer's names.
    """
    fm = {"osm_id": "OSM_ID", "name": "NAME", "name_en": "NAME_EN",
          "admin_level": "ADMIN_LVL", "iso3166": "ISO3166",
          "boundary": "BOUNDARY"}
    fm.update(field_map or {})
    shapes, attrs = read_shapefile_zip(zip_path)
    rows = []
    for i, (rec_no, polys) in enumerate(shapes):
        a = attrs.iloc[rec_no - 1] if len(attrs) else {}
        rows.append({
            "osm_id": a.get(fm["osm_id"], f"SHP{rec_no}"),
            "name": a.get(fm["name"]),
            "name_en": a.get(fm["name_en"]),
            "admin_level": str(a.get(fm["admin_level"], "")),
            "iso3166": a.get(fm["iso3166"]),
            "boundary": a.get(fm["boundary"], "administrative"),
            "geom_wkb": geom.multipolygon_to_wkb(polys),
            "insert_order": i,
        })
    return pd.DataFrame(rows)


def write_shapefile_zip(zip_path: str, polys_list: list,
                        attrs: pd.DataFrame) -> None:
    """Bundle .shp + .dbf into a zip (fixture/export support)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("boundaries.shp", write_shp_polygons(polys_list))
        zf.writestr("boundaries.dbf", write_dbf(attrs))
    with open(zip_path, "wb") as f:
        f.write(buf.getvalue())


def shapefile_source_oracle_sql(n_levels: int = 4) -> str:
    """DuckDB twin of the `shapefile_source` registry query (S3 +
    O2/O4/O5/O8/O14): the RAW gen_boundaries attributes and ring
    vertices enter as VALUES, and SQL re-derives the whole boundary
    prep the Spark side performs AFTER the .shp zip round trip —
    name_en coalesce + empty-name drop, the administrative-boundary
    predicate, ring self-intersection validity (strict sign-flip
    proper-crossing test, the problems_routing rule), representative
    points (largest-|outer-area| part centroid; the fixture never
    needs the scan fallbacks — a future concave fixture would surface
    here as a missing row), first-match-by-insert-order PIP into the
    country and direct-parent levels with the points_in_rings
    expression tree, and the per-country admin-level mapping with
    overrides (tag_for). A write/parse corruption in the from-scratch
    shapefile codec shows up as a VALUES mismatch on any level row.
    Reference semantics: extract_gadm.py:32-40, extract.py:241-341.
    """
    import pandas as pd

    from posmspark import geom as _geom, synth
    from posmspark.synth import ADMIN_DEFAULTS

    bpdf = synth.gen_boundaries_pdf()
    mapping = synth.gen_admin_mapping_pdf()

    feat_rows, vert_rows = [], []
    for r in bpdf.itertuples(index=False):
        oid = str(r.osm_id).replace("'", "''")

        def q(v):
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return "NULL"
            return "'" + str(v).replace("'", "''") + "'"

        feat_rows.append(
            f"({q(r.osm_id)},{q(r.name)},{q(r.name_en)},"
            f"{q(str(r.admin_level))},{q(r.iso3166)},{q(r.boundary)},"
            f"{int(r.insert_order)})")
        polys = _geom.wkb_to_multipolygon(r.geom_wkb)
        for part, rings in enumerate(polys):
            for ri, ring in enumerate(rings):
                rr = np.asarray(ring, dtype=np.float64)
                a = rr[:-1] if np.allclose(rr[0], rr[-1]) else rr
                for s in range(len(a)):
                    vert_rows.append(
                        f"('{oid}',{part},{ri},{s},"
                        f"CAST({float(a[s, 0])!r} AS DOUBLE),"
                        f"CAST({float(a[s, 1])!r} AS DOUBLE))")
    map_rows = [
        f"('{str(m.country_osm_id)}',{int(m.admin_level_1)},"
        f"{int(m.admin_level_2)})"
        for m in mapping.itertuples(index=False)]
    d1, d2, d3 = (ADMIN_DEFAULTS["admin_level_1"],
                  ADMIN_DEFAULTS["admin_level_2"],
                  ADMIN_DEFAULTS["admin_level_3"])

    # one level-assignment stage: candidates not yet assigned, country
    # via level-0 first match, parent via the previous level
    def level_cte(lv, parent_rel):
        country_join = (
            "c.osm_id = w0.cand" if lv == 1
            else "c.osm_id = w0.cand")
        parent_expr = ("w0.winner" if lv == 1 else f"wp{lv}.winner")
        parent_join = (
            "" if lv == 1 else f"""
  LEFT JOIN (SELECT r.cand, min(f.ord) AS mo,
                    arg_min(r.owner, f.ord) AS winner
             FROM contain r JOIN feats f ON f.osm_id = r.owner
             WHERE r.owner IN (SELECT osm_id FROM {parent_rel})
             GROUP BY r.cand) wp{lv} ON wp{lv}.cand = c.osm_id""")
        return f""",
l{lv} AS (
  SELECT c.osm_id, c.nm, {lv} AS adminlevel, c.iso, {parent_expr} AS is_in
  FROM cands c
  LEFT JOIN (SELECT r.cand, arg_min(r.owner, f.ord) AS winner
             FROM contain r JOIN feats f ON f.osm_id = r.owner
             WHERE r.owner IN (SELECT osm_id FROM l0)
             GROUP BY r.cand) w0 ON {country_join}{parent_join}
  WHERE c.osm_id NOT IN (SELECT osm_id FROM assigned{lv - 1})
    AND w0.winner IS NOT NULL
    AND c.raw = (SELECT tag FROM tags t
                 WHERE t.country = w0.winner AND t.lv = {lv})
    AND {parent_expr} IS NOT NULL),
assigned{lv} AS (
  SELECT osm_id FROM assigned{lv - 1}
  UNION ALL SELECT osm_id FROM l{lv})"""

    stages = "".join(level_cte(lv, f"l{lv - 1}")
                     for lv in range(1, n_levels))
    unions = "\nUNION ALL\n".join(
        f"SELECT osm_id, nm AS name_en, adminlevel, iso AS iso3166, is_in"
        f" FROM l{lv}" for lv in range(n_levels))

    return f"""
WITH feats0(osm_id, name, name_en, raw, iso, bnd, ord) AS (VALUES
{",".join(feat_rows)}),
verts(osm_id, part, ring, seq, x, y) AS (VALUES
{",".join(vert_rows)}),
mapping(country, a1, a2) AS (VALUES
{",".join(map_rows)}),
-- tag_for(country, lv): override row else ADMIN_DEFAULTS
tags AS (
  SELECT f.osm_id AS country, lv.lv,
         CAST(CASE lv.lv
              WHEN 1 THEN coalesce(m.a1, {d1})
              WHEN 2 THEN coalesce(m.a2, {d2})
              WHEN 3 THEN CASE WHEN m.country IS NULL THEN {d3}
                               ELSE {d3} END
         END AS VARCHAR) AS tag
  FROM feats0 f
  CROSS JOIN (SELECT unnest(generate_series(1, {n_levels - 1})) AS lv) lv
  LEFT JOIN mapping m ON m.country = f.osm_id),
edges AS (
  SELECT v.osm_id, v.part, v.ring, v.seq, v.x AS x1, v.y AS y1,
         coalesce(lead(v.x) OVER wv, first_value(v.x) OVER wv) AS x2,
         coalesce(lead(v.y) OVER wv, first_value(v.y) OVER wv) AS y2
  FROM verts v
  WINDOW wv AS (PARTITION BY v.osm_id, v.part, v.ring ORDER BY v.seq)),
-- strict proper self-intersection per ring (Bowtie class)
selfx AS (
  SELECT DISTINCT a.osm_id
  FROM edges a JOIN edges b
    ON b.osm_id = a.osm_id AND b.part = a.part AND b.ring = a.ring
   AND b.seq > a.seq
  WHERE sign((a.x2 - a.x1) * (b.y1 - a.y1)
             - (a.y2 - a.y1) * (b.x1 - a.x1))
        * sign((a.x2 - a.x1) * (b.y2 - a.y1)
               - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0
    AND sign((b.x2 - b.x1) * (a.y1 - b.y1)
             - (b.y2 - b.y1) * (a.x1 - b.x1))
        * sign((b.x2 - b.x1) * (a.y2 - b.y1)
               - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0),
feats AS (
  SELECT osm_id,
         CASE WHEN name_en IS NOT NULL AND name_en <> '' THEN name_en
              ELSE name END AS nm,
         raw, upper(iso) AS iso, bnd, ord
  FROM feats0
  WHERE osm_id NOT IN (SELECT osm_id FROM selfx)
    AND bnd = 'administrative'
    AND (CASE WHEN name_en IS NOT NULL AND name_en <> '' THEN name_en
              ELSE name END) IS NOT NULL
    AND (CASE WHEN name_en IS NOT NULL AND name_en <> '' THEN name_en
              ELSE name END) <> ''),
cands AS (SELECT * FROM feats),
-- representative point: centroid of the largest-|outer-area| part
partarea AS (
  SELECT e.osm_id, e.part,
         abs(sum(e.x1 * e.y2 - e.x2 * e.y1)) / 2 AS a
  FROM edges e WHERE e.ring = 0
  GROUP BY e.osm_id, e.part),
bestpart AS (
  SELECT osm_id, part FROM (
    SELECT *, row_number() OVER (PARTITION BY osm_id
                                 ORDER BY a DESC, part) AS rn
    FROM partarea) WHERE rn = 1),
rep AS (
  SELECT v.osm_id, sum(v.x) / count(*) AS rx, sum(v.y) / count(*) AS ry
  FROM verts v JOIN bestpart b
    ON b.osm_id = v.osm_id AND b.part = v.part
  WHERE v.ring = 0
  GROUP BY v.osm_id),
-- containment of every candidate rep point in every OTHER feature
-- (even-odd parity per part, any part)
contain AS (
  SELECT p.osm_id AS cand, e.osm_id AS owner
  FROM rep p JOIN edges e ON e.osm_id <> p.osm_id
  GROUP BY p.osm_id, e.osm_id, e.part, p.rx, p.ry
  HAVING sum(CASE WHEN (e.y1 > p.ry) <> (e.y2 > p.ry)
                   AND p.rx < (e.x2 - e.x1) * (p.ry - e.y1)
                              / (e.y2 - e.y1) + e.x1
             THEN 1 ELSE 0 END) % 2 = 1),
l0 AS (
  SELECT osm_id, nm, 0 AS adminlevel, iso, CAST(NULL AS VARCHAR) AS is_in
  FROM feats WHERE raw = '2'),
assigned0 AS (SELECT osm_id FROM l0){stages}
{unions}
"""
