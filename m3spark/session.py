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
              shuffle_partitions: int | None = None,
              executors: int | None = None,
              executor_mem_mb: int = 4096,
              ui: bool = False) -> SparkSession:
    """``executors=None`` → single-JVM ``local[cores]``.

    ``executors=E`` → ``local-cluster[E, cores, mem]``: E separate
    executor JVM processes with their own Python workers, shuffling
    through real block transfers — the in-sandbox analog of growing a
    real cluster from N to 4N executors (BASELINE.md scaling plan).
    The m3spark package ships to executors the same way a
    ``spark-submit --py-files m3spark.zip`` deployment would."""
    if cores is None:
        # this sandbox oversubscribes vCPUs above ~16 threads (local[32]
        # is measurably SLOWER than local[16]); honor an explicit
        # SPARK_GRAFT_CPUS but default to at most 16
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else min(16, os.cpu_count() or 16)
    if shuffle_partitions is None:
        # scale shuffle width with cores (2x for scheduling overlap)
        total = cores * (executors or 1)
        shuffle_partitions = max(8, total * 2)
    if executors is None:
        builder = (
            SparkSession.builder
            .master(f"local[{cores}]")
            .appName(app))
    else:
        from jobs.package import build as build_pyfiles

        builder = (
            SparkSession.builder
            .master(f"local-cluster[{executors},{cores},{executor_mem_mb}]")
            .appName(app)
            .config("spark.submit.pyFiles", build_pyfiles())
            .config("spark.executor.memory", f"{executor_mem_mb}m")
            # size each executor JVM's internal pools (GC, JIT, common
            # ForkJoin) for ITS core count, not the host's — E co-located
            # executors otherwise each spawn host-width service threads
            # and oversubscribe the box (real clusters set this via
            # container CPU limits)
            .config("spark.executor.extraJavaOptions",
                    f"-XX:ActiveProcessorCount={cores}"))
    java_opts = os.environ.get("M3SPARK_JAVA_OPTS")
    if java_opts:
        # e.g. GC selection for oversubscribed-host experiments
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # InferFiltersFromGenerate plants a `size(gen_input) > 0` filter
        # below every explode; predicate pushdown then substitutes the
        # FULL generator-input expression into that filter, so for the
        # violation queries (explode over a computed violations array)
        # the whole validation expression tree was evaluated TWICE per
        # row — and the filter copy ran outside whole-stage codegen
        # (variant/invoke exprs force interpreted eval).  The inferred
        # filter is purely an optimization (it never changes results);
        # excluding it measured -40..-75% on the five val_* queries at
        # sf1.0 and is scale-independent plan hygiene, not a local[32]
        # tune (the duplicated subtree grows with schema complexity,
        # not core count).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
