"""SparkSession factory with scale-oriented defaults.

Centralizes the physical-strategy knobs we own (SURVEY.md §4): AQE with
skew-join splitting, partition sizing, Arrow batch size for the
regex/format UDF stages.  Tests and bench share this so local runs
exercise the same configuration that a spark-submit deployment would.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "m3spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        # this sandbox oversubscribes vCPUs above ~16 threads (local[32]
        # is measurably SLOWER than local[16]); honor an explicit
        # SPARK_GRAFT_CPUS but default to at most 16
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else min(16, os.cpu_count() or 16)
    if shuffle_partitions is None:
        # scale shuffle width with cores (2x for scheduling overlap)
        shuffle_partitions = max(8, cores * 2)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app))
    java_opts = os.environ.get("M3SPARK_JAVA_OPTS")
    if java_opts:
        # e.g. GC selection for oversubscribed-host experiments
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
