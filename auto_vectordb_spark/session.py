"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[32], single JVM);
on a real cluster the same settings remain sane: AQE handles skew/coalesce at
runtime, Arrow speeds every pandas_udf, UTC pins timestamp semantics for
cross-engine (DuckDB-oracle) comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "auto_vectordb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to the core count — correct for local mode; on a
    1000-executor cluster you'd size this to ~2-3× total cores and let AQE
    coalesce down.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.ts is TIMESTAMP(NANOS) which Spark's reader rejects;
        # read as long and convert (floor-to-µs, matching DuckDB) in load_views
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # size-guarded limit-probes must scan in ONE parallel wave, not
        # CollectLimit's sequential 1, 4, 16... escalation (see
        # plans/parity.py ensure_session_confs)
        .config("spark.sql.limit.initialNumPartitions", "1024")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_materialized(df) -> None:
    """Free the storage blocks behind a materialized DataFrame, whichever
    way it was materialized:

    - ``persist()``/``cache()``: ``Dataset.unpersist`` drops the
      CacheManager entry and its blocks.
    - ``localCheckpoint()``: the blocks belong to the INTERNAL RDD the
      plan wraps (``LogicalRDD``). ``Dataset.unpersist`` does not touch
      them, and ``df.rdd.unpersist`` unpersists a fresh conversion RDD,
      not the materialized one — measured: storage unchanged. Unpersist
      the plan's RDD directly.

    Best-effort by design (wrong-shape plans are left to the async
    ContextCleaner, which eventually frees them once the Python proxy is
    collected): operators call this when a corpus-sized working set has
    served every consumer, so blocks never pile up across iterations or
    outlive the operator call.
    """
    try:
        df.unpersist(False)
    except Exception:  # noqa: BLE001 — release is best-effort hygiene
        pass
    try:
        node = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        if node.getClass().getSimpleName() == "LogicalRDD":
            node.rdd().unpersist(False)
    except Exception:  # noqa: BLE001
        pass
