"""Raster<->vector tile aggregation with explicit skew handling.

Re-expresses the reference's per-country/per-state tile trees
(/root/reference/extractor/prepare_topojson.py:87-162 and the GeoJSON
fan-out of generate_geojson.py:144-377) as distributed aggregations:

- raster side: per-cell document stats over the assigned pages table
- vector side: per-admin-polygon rollups (the reference's level 2->1->0
  re-aggregation, proc_functions.sql:104-197, as one rollup pass)
- tile assignment: cell stats joined back to covering polygons

Skew: dense urban cells concentrate documents (the mandated hot-cell
fixture). Exact distinct-url counts are computed with a SALTED two-phase
aggregation — partial distinct per (cell, salt) shard first, so no
single reducer owns a hot cell — plus AQE skew splitting for the final
exchange. Plain counts use Spark's built-in map-side partial agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def cell_tile_stats(assigned: DataFrame) -> DataFrame:
    """Per-cell doc_count + exact distinct_urls, skew-safe.

    Two-phase: (cell, url) dedup is salted implicitly by the url hash
    (the shuffle key is (cell, url), so a hot cell spreads over many
    reducers); the second phase aggregates tiny per-cell partials.
    """
    per_url = assigned.groupBy("cell", "url").agg(
        F.count(F.lit(1)).alias("dup_docs")
    )
    return per_url.groupBy("cell").agg(
        F.sum("dup_docs").alias("doc_count"),
        F.count(F.lit(1)).alias("distinct_urls"),
    )


def cell_admin_tile_stats(assigned: DataFrame) -> DataFrame:
    """Tile assignment: per (cell, admin polygon) stats — the join of the
    raster grid to the vector layer (SURVEY.md O22)."""
    return (
        assigned.filter(F.col("osm_id_l0").isNotNull())
        .groupBy("cell", "osm_id_l0", "osm_id_l1", "osm_id_l2")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
    )


def admin_rollup(assigned: DataFrame) -> DataFrame:
    """Hierarchy re-aggregation levels 2->1->0 as ONE rollup pass
    (replaces the reference's three sequential PL/pgSQL passes,
    proc_functions.sql:104-197)."""
    return (
        assigned.filter(F.col("osm_id_l0").isNotNull())
        .rollup("osm_id_l0", "osm_id_l1", "osm_id_l2")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct("url").alias("distinct_urls"),
        )
    )


def salted_exact_distinct(df: DataFrame, group_col: str, distinct_col: str,
                          salt: int = DEFAULT_SALT) -> DataFrame:
    """Generic salted exact count-distinct: explicit 2-stage plan for
    when the group key alone would put a hot key on one reducer.

    Stage 1 shuffles on (group, salt(hash(distinct_col)))  -> partial sets
    Stage 2 shuffles tiny partials on group                -> exact union
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt))
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.count_distinct(F.col(distinct_col)).alias("_pc")
    )
    # distinct values land in exactly one salt shard (hash-determined),
    # so summing partial distinct counts is exact
    return partial.groupBy(group_col).agg(F.sum("_pc").alias("distinct_count"))


def boundary_tile_areas(spark, prepared) -> DataFrame:
    """Vector side of the raster<->vector tile join made EXACT: the
    area of each boundary polygon inside each of its covering cells.

    FULL cells (entirely inside, cover classification) contribute the
    whole cell box without touching geometry; boundary cells clip the
    polygon to the cell window (Sutherland-Hodgman, geom.clip_*). The
    cover table distributes as ordinary rows, the polygons broadcast —
    same scale shape as the PIP join. Per polygon, the cell areas sum
    to the polygon's exact area (tested): the grid partitions it.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from posmspark import cells, geom

    bc = spark.sparkContext.broadcast(prepared.polys_by_id)

    @pandas_udf(T.DoubleType())
    def tile_area(cell: pd.Series, osm_id: pd.Series,
                  full: pd.Series) -> pd.Series:
        polys_by_id = bc.value
        c = cell.to_numpy(dtype=np.int64)
        x0, y0, x1, y1 = cells.cell_bounds(c)
        out = np.zeros(len(c), dtype=np.float64)
        for i in range(len(c)):
            if full.iloc[i]:
                out[i] = (x1[i] - x0[i]) * (y1[i] - y0[i])
            else:
                clipped = geom.clip_multipolygon_bbox(
                    polys_by_id[osm_id.iloc[i]],
                    (x0[i], y0[i], x1[i], y1[i]))
                out[i] = sum(geom.ring_area(r) for rings in clipped
                             for r in rings)
        return pd.Series(out)

    # the cover table carries one row per POLYGON PART; a multi-part
    # polygon (archipelago) can cover the same cell with several parts,
    # and clipping the whole multipolygon once per row would double-
    # count. Collapse to one row per (cell, osm_id): if ANY part covers
    # the cell fully the cell is entirely inside (parts are disjoint).
    cov = (
        prepared.cover_df(spark)
        .groupBy("cell", "osm_id", "adminlevel")
        .agg(F.max("full").alias("full"))
    )
    return cov.withColumn(
        "tile_area", tile_area(F.col("cell"), F.col("osm_id"),
                               F.col("full"))
    ).select("osm_id", "adminlevel", "cell", "full", "tile_area")
