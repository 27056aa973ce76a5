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
