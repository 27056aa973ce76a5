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
    _prewarm_python_workers(spark, cpus)
    return spark


#: application ids whose Python worker pool has been prewarmed —
#: getOrCreate() hands back the same session repeatedly and the warmup
#: must run once per JVM, not once per get_spark() call
_PREWARMED: set = set()


def _prewarm_python_workers(spark: SparkSession, cpus: int) -> None:
    """Fork and import-warm one Arrow-UDF Python worker per core at
    session build time (guide §4.5: heavyweight init once, amortized).

    The first full-width pandas-UDF stage of a fresh session otherwise
    pays ~cores x (daemon fork + numpy/pandas/pyarrow import + Arrow
    serializer setup) INSIDE whatever query happens to run first —
    measured ~2.5s of the flagship pipeline's first 600k-doc run on
    local[32], because its 50k-row warmup slice only touches a few
    partitions and leaves most of the pool cold. One 1-row-per-core
    identity pandas UDF moves that cost into session init, where a
    long-running job pays it anyway. Data-independent (spark.range),
    skippable via POSMSPARK_PREWARM=0."""
    if os.environ.get("POSMSPARK_PREWARM", "1") == "0":
        return
    app_id = spark.sparkContext.applicationId
    if app_id in _PREWARMED:
        return
    _PREWARMED.add(app_id)
    try:
        import pandas as pd
        from pyspark.sql.functions import col, pandas_udf

        @pandas_udf("long")
        def _touch(s: pd.Series) -> pd.Series:
            import numpy  # noqa: F401  (pulled into the worker cache)
            return s

        spark.sparkContext.setJobDescription(
            "session init: python worker prewarm")
        (spark.range(0, cpus, 1, cpus).select(_touch(col("id")))
         .write.format("noop").mode("overwrite").save())
    except Exception:
        pass  # warmup is best-effort; the session itself is unaffected
    finally:
        try:
            spark.sparkContext.setJobDescription(None)
        except Exception:
            pass


def spread_input(df, min_parts: int | None = None):
    """Round-robin repartition an input whose SCAN cannot parallelize —
    the driver fixtures are single-row-group parquet files, so every
    downstream narrow operator (shingling, md5, regexp) would otherwise
    run in ONE task on a 32-core session (guide §2.5 "input skew: one
    huge unsplittable file ... otherwise repartition immediately after
    the read"). Scale-adaptive, not a local[32] constant: the target is
    the session's defaultParallelism, and when the scan already yields
    >= that many partitions (any production table with multiple row
    groups / files) this is a NO-OP — no exchange is added.

    The scan-partition probe (df.rdd) costs a driver-side planning pass
    (~100ms); a semanticHash-keyed memo was tried and measured a wash
    (the hash pays the same analysis the probe does), so the probe
    stays direct."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


#: persisted multi-consumer intermediates, most recent last. Bounded
#: LRU (review r03: CacheManager entries are plan-keyed and never
#: garbage-collected without an explicit unpersist, so an unbounded
#: session accumulates them) with sameResult REUSE so sibling queries
#: sharing a stage (the three dedup queries all stage the same shingle
#: table) hit one cache entry instead of rebuilding it.
_STAGED: list = []
_STAGED_MAX = 4


def release_staged() -> None:
    """Unpersist every staged DataFrame (explicit full flush, e.g.
    between bench suites). Safe while earlier results are still
    referenced — at worst a late consumer recomputes the sub-plan."""
    while _STAGED:
        try:
            _STAGED.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release


def stage_persist(df):
    """persist() a multi-consumer intermediate under the bounded LRU.
    If an already-staged DataFrame has the same analyzed plan
    (Catalyst sameResult), that entry is refreshed and returned —
    sibling queries share one cache entry; otherwise the new frame is
    persisted and the oldest entry beyond the cap is released."""
    # purge entries from other (possibly stopped) sessions first —
    # sameResult compares already-built JVM plans, so a stale entry
    # from a stopped session would otherwise be handed back and fail
    # only at execution time (review r03)
    for prev in list(_STAGED):
        try:
            same_session = prev.sparkSession is df.sparkSession
        except Exception:
            same_session = False
        if not same_session:
            _STAGED.remove(prev)
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass
    try:
        an = df._jdf.queryExecution().analyzed()
        for prev in _STAGED:
            if prev._jdf.queryExecution().analyzed().sameResult(an):
                _STAGED.remove(prev)
                _STAGED.append(prev)
                return prev
    except Exception:
        pass  # plan comparison is best-effort; fall through to persist
    df = df.persist()
    _STAGED.append(df)
    while len(_STAGED) > _STAGED_MAX:
        try:
            _STAGED.pop(0).unpersist(blocking=False)
        except Exception:
            pass
    return df
