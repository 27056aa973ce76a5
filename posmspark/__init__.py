"""posmspark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of nyaruka/posm
(reference at /root/reference, a single-threaded GDAL/OGR + PostGIS
pipeline) as an idiomatic Spark DataFrame engine:

- cell index (H3-res-7 / S2-level-12 analog) in pure numpy (cells.py)
- broadcast prepared-geometry point-in-polygon join (joins.py)
- cell-ring-expansion kNN (joins.py)
- dissolve / residual-holes / shared-edge simplify (dissolve.py)
- raster<->vector tile aggregation (tiles.py)
- checkpoint-resumable stages with per-partition lineage (lineage.py)
- byte-identical text extraction + geocoding (textx.py)
- training-data ops: dedup, ANN, text quality (dedup.py, ann.py, textstats.py)

All geometry is numpy over ring-coordinate arrays inside Arrow-batched
pandas UDFs — no shapely/GDAL, no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
