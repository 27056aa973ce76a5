"""Export sinks: .poly (Osmosis polygon-filter format), GeoJSON-shaped
rows, partitioned Parquet.

- .poly re-implements the byte-level golden layout of
  /root/reference/extractor/extract_poly.py:72-156: name header; per
  ring an index line (1-based within its polygon, '!'-prefixed for
  holes); coordinate rows formatted '   %.6E   %.6E'
  (extract_poly.py:135); 'END' per ring and a final 'END'.
- GeoJSON rows reproduce the field layout of
  generate_geojson.py:50-98 / exposm/utils.py:73-102 as
  to_json(struct(...)) columns (a distributed sink, not a driver loop).

Formatting runs distributed in applyInPandas over boundary groups; the
final text lands one row per feature so any executor count produces
identical bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from posmspark import geom


def format_poly(name: str, polys: list[list[np.ndarray]]) -> str:
    """Byte-exact .poly text for one multipolygon (extract_poly.py:116-137).

    Ring indexes are 1-based per polygon; holes prefixed '!'; coordinates
    '   %.6E   %.6E' (x=lon, y=lat); END per ring + final END.
    """
    lines = [name]
    for rings in polys:
        for i, ring in enumerate(rings):
            lines.append(str(i + 1) if i == 0 else f"!{i + 1}")
            for x, y in np.asarray(ring, dtype=np.float64):
                lines.append("   %.6E   %.6E" % (x, y))
            lines.append("END")
    lines.append("END")
    return "\n".join(lines) + "\n"


def prepare_outline(polys: list[list[np.ndarray]],
                    buffer_distance: float = 0.1,
                    simplify_distance: float = 0.01,
                    max_iter: int = 10) -> list[list[np.ndarray]]:
    """Buffer-then-simplify with the adaptive containment loop of
    extract_poly.py:51-69 (checkGeom): shrink the simplify tolerance 10%
    and grow the buffer 10% until the outline contains the original
    (vertex-containment check, vectorized)."""
    orig_pts = np.vstack([r for rings in polys for r in rings])
    buf, tol = buffer_distance, simplify_distance
    for _ in range(max_iter):
        out = []
        for rings in polys:
            outer = geom.buffer_ring(rings[0], buf)
            simp = geom.simplify_ring_closed(outer, tol)
            out.append([simp])
        contained = np.zeros(len(orig_pts), dtype=bool)
        for rings_out in out:
            contained |= geom.points_in_rings(
                orig_pts[:, 0], orig_pts[:, 1], rings_out)
        if contained.all():
            return out
        tol *= 0.9
        buf *= 1.1
    return out


def poly_export_df(spark: SparkSession, prepared, level: int = 0,
                   buffer_distance: float = 0.1,
                   simplify_distance: float = 0.01) -> DataFrame:
    """(osm_id, poly_name, poly_text) for every boundary at `level` —
    the distributed S10 sink. Formatting happens per group inside
    applyInPandas; polygons ship via broadcast."""
    bc = spark.sparkContext.broadcast(prepared.polys_by_id)

    rows = prepared.levels_pdf.query(f"adminlevel == {level}")[
        ["osm_id", "iso3166"]
    ]
    src = spark.createDataFrame(rows)

    schema = T.StructType([
        T.StructField("osm_id", T.StringType()),
        T.StructField("poly_name", T.StringType()),
        T.StructField("poly_text", T.StringType()),
    ])

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        polys_by_id = bc.value
        out = []
        for r in pdf.itertuples(index=False):
            name = (f"{r.iso3166}_{r.osm_id}"
                    if isinstance(r.iso3166, str) else r.osm_id)
            outline = prepare_outline(polys_by_id[r.osm_id],
                                      buffer_distance, simplify_distance)
            out.append((r.osm_id, name, format_poly(name, outline)))
        return pd.DataFrame(out, columns=["osm_id", "poly_name", "poly_text"])

    return src.groupBy("osm_id").applyInPandas(
        lambda key, pdf: emit(pdf), schema=schema
    )


def geojson_feature_df(spark: SparkSession, prepared) -> DataFrame:
    """One GeoJSON Feature JSON string per boundary (S9 sink shape:
    typed properties osm_id/name/name_en/adminlevel/is_in like
    exposm/utils.py:83-99, geometry as MultiPolygon coordinates)."""
    import json

    rows = []
    for r in prepared.levels_pdf.itertuples(index=False):
        polys = prepared.polys_by_id[r.osm_id]
        coords = [[ring.tolist() for ring in rings] for rings in polys]
        feat = {
            "type": "Feature",
            "properties": {
                "osm_id": r.osm_id,
                "name": r.name,
                "name_en": r.name_en,
                "adminlevel": int(r.adminlevel),
                "is_in": r.is_in,
            },
            "geometry": {"type": "MultiPolygon", "coordinates": coords},
        }
        rows.append((r.osm_id, int(r.adminlevel),
                     json.dumps(feat, ensure_ascii=False, sort_keys=True)))
    return spark.createDataFrame(
        rows, "osm_id string, adminlevel int, feature_json string"
    )


def dual_geojson_feature_df(spark: SparkSession, prepared,
                            tol: float = 0.05) -> DataFrame:
    """Natural + simplified geometry variant per boundary feature —
    the reference emits both per level (generate_geojson.py:203-221,
    8 files per country). The simplified variant comes from
    shared-edge-consistent simplification run over each level's mesh,
    so shared borders remain IDENTICAL polylines on both owners
    (watertight, like toTopoGeom + ST_Simplify(topo),
    proc_functions.sql:27-82,219).

    Output: (osm_id, adminlevel, variant, n_points, area, feature_json).
    """
    import json

    from posmspark import dissolve

    props_by_id = {
        r.osm_id: r for r in prepared.levels_pdf.itertuples(index=False)
    }
    rows = []
    for lv in sorted(prepared.levels_pdf.adminlevel.unique()):
        ids = list(
            prepared.levels_pdf.query("adminlevel == @lv")
            .sort_values("insert_order").osm_id
        )
        mesh = {oid: prepared.polys_by_id[oid] for oid in ids}
        simplified = dissolve.shared_edge_simplify(mesh, tol=tol)
        for variant, geoms in (("natural", mesh), ("simplified", simplified)):
            for oid in ids:
                polys = geoms[oid]
                r = props_by_id[oid]
                coords = [[ring.tolist() for ring in rings]
                          for rings in polys]
                feat = {
                    "type": "Feature",
                    "properties": {
                        "osm_id": oid,
                        "name": r.name,
                        "name_en": r.name_en,
                        "adminlevel": int(r.adminlevel),
                        "is_in": r.is_in,
                        "variant": variant,
                    },
                    "geometry": {"type": "MultiPolygon",
                                 "coordinates": coords},
                }
                area = sum(
                    geom.ring_area(rings[0])
                    + sum(geom.ring_area(h) for h in rings[1:])
                    for rings in polys
                )
                rows.append((
                    oid, int(r.adminlevel), variant,
                    int(sum(len(ring) for rings in polys for ring in rings)),
                    float(area),
                    json.dumps(feat, ensure_ascii=False, sort_keys=True),
                ))
    return spark.createDataFrame(
        rows,
        "osm_id string, adminlevel int, variant string, n_points long,"
        " area double, feature_json string",
    )


def package_boundary_zips(spark: SparkSession, prepared, out_dir: str,
                          tol: float = 0.05) -> DataFrame:
    """S12: per-country ZIP packaging of the exported GeoJSON artifacts
    (generate_geojson.py:117-141 runs `zip -j -r` over the per-country
    export dir; same artifact here without shelling out).

    Each country zip carries one FeatureCollection per (level, variant)
    — admin_level_<N>_<variant>.geojson, natural + simplified — holding
    the country's own feature at level 0 and its descendants below.
    Returns a manifest DataFrame (country, file_name, n_features,
    n_bytes) for lineage accounting.
    """
    import json
    import os
    import zipfile

    feats = dual_geojson_feature_df(spark, prepared, tol=tol).collect()
    by_id = {}
    for r in feats:
        by_id.setdefault(r["osm_id"], {})[r["variant"]] = r

    lv = prepared.levels_pdf
    country_of = {}
    for r in lv.itertuples(index=False):
        cur = r
        seen = set()
        while cur.is_in is not None and cur.osm_id not in seen:
            seen.add(cur.osm_id)
            parents = lv[lv.osm_id == cur.is_in]
            if not len(parents):
                break
            cur = next(parents.itertuples(index=False))
        country_of[r.osm_id] = cur.osm_id

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for country in sorted(lv.query("adminlevel == 0").osm_id):
        members = {}
        for r in lv.itertuples(index=False):
            if country_of[r.osm_id] != country:
                continue
            for variant in ("natural", "simplified"):
                name = f"admin_level_{int(r.adminlevel)}_{variant}.geojson"
                members.setdefault(name, []).append(
                    json.loads(by_id[r.osm_id][variant]["feature_json"]))
        zpath = os.path.join(out_dir, f"{country}.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for name in sorted(members):
                fc = {"type": "FeatureCollection", "features": members[name]}
                payload = json.dumps(fc, ensure_ascii=False, sort_keys=True)
                zf.writestr(name, payload)
                rows.append((country, name, len(members[name]),
                             len(payload.encode("utf-8"))))
    return spark.createDataFrame(
        rows, "country string, file_name string, n_features long,"
              " n_bytes long",
    ).orderBy("country", "file_name")


def read_geojson_features(spark: SparkSession, df: DataFrame) -> "pd.DataFrame":
    """GeoJSON source (S4, exposm/reader.py:95-97 analog): parse Feature
    JSON rows back into the boundary input shape (osm_id, name, name_en,
    adminlevel, is_in, rings) — round-trips geojson_feature_df."""
    import json

    rows = []
    for r in df.select("feature_json").collect():
        feat = json.loads(r["feature_json"])
        props = feat["properties"]
        polys = [
            [np.asarray(ring, dtype=np.float64) for ring in poly]
            for poly in feat["geometry"]["coordinates"]
        ]
        rows.append(
            {
                "osm_id": props["osm_id"],
                "name": props.get("name"),
                "name_en": props.get("name_en"),
                "adminlevel": props.get("adminlevel"),
                "is_in": props.get("is_in"),
                "geom_wkb": geom.multipolygon_to_wkb(polys),
            }
        )
    return pd.DataFrame(rows)


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """S8/O10 level fan-out as ONE partitioned write (no 10 passes)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Bucketed managed table (CLUSTERED BY) — the co-located-join
    layout for keys joined repeatedly at scale (SURVEY.md §4: bucketing
    for co-located joins). Two tables bucketed on the same key join
    WITHOUT a shuffle (verified by plan test)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
