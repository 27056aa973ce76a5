"""SparkSession builder with scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every knob
here is the one you'd set on a 1000-executor job: AQE (runtime
re-planning + skew-join splitting), Arrow for all pandas-UDF traffic,
shuffle partitions sized to the parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "posmspark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    cpus defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("POSMSPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: persisted intermediates staged by the current query build — released
#: by the NEXT query that stages (review r03: repeated invocations in a
#: long driver session each pinned a fresh CacheManager entry; entries
#: are plan-keyed and never garbage-collected without an explicit
#: unpersist, unlike checkpoint RDDs)
_STAGED: list = []


def release_staged() -> None:
    """Unpersist every DataFrame staged by the previous query build.
    Safe while earlier results are still referenced — at worst a
    late consumer recomputes the sub-plan."""
    while _STAGED:
        try:
            _STAGED.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release


def stage_persist(df):
    """persist() a multi-consumer intermediate and register it for
    release by the next query build. Call release_staged() once at the
    start of a query that stages, THEN stage its intermediates."""
    df = df.persist()
    _STAGED.append(df)
    return df
