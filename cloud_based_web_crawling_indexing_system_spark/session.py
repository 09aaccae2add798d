"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing (local[N]) but configured the way the job would run
on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
splitting), Arrow transfer on for every pandas UDF, shuffle partitions
sized to cores locally (cluster deploys would size to ~2-3x total
cores), UTC timezone pinned for oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    master: str | None = None,
    app_name: str = "cbwcis-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # parse local[N] for a sensible default; cluster mode would
        # size this to ~2x total executor cores
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = cpus if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # split parquet scans finer than the 128MB default so UDF-heavy
        # stages (parse/index) fan out across all cores even on
        # modest-sized corpora
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
