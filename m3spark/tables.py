"""Table-format layer: Iceberg when the runtime is present, partitioned
parquet otherwise (SURVEY.md §7 hard-part 6 — keep the format pluggable
so nothing else in the engine knows which one is underneath).

The north-star deployment reads an Iceberg table partitioned by
``days(warc_ts)`` with hidden partitioning; the parquet fallback
materializes the same layout explicitly (``warc_day`` partition column)
so partition pruning and per-partition checkpointing behave identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_pages(df: DataFrame, target: str,
                partition_expr: str = "to_date(warc_ts)",
                partition_col: str = "warc_day",
                mode: str = "overwrite") -> str:
    """Write a pages table partitioned by crawl day.

    ``target``: an Iceberg table name (``catalog.db.tbl``) when the
    Iceberg runtime is on the classpath, else a parquet directory path.
    Returns the partition column name actually used.
    """
    spark = df.sparkSession
    out = df.withColumn(partition_col, F.expr(partition_expr))
    if iceberg_available(spark) and "/" not in target:
        (out.writeTo(target).partitionedBy(F.col(partition_col))
            .using("iceberg").createOrReplace())
    else:
        (out.repartition(partition_col)
            .write.mode(mode).partitionBy(partition_col).parquet(target))
    return partition_col


def read_pages(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark) and "/" not in target:
        return spark.read.table(target)
    return spark.read.parquet(target)


def snapshot_id(spark: SparkSession, target: str) -> str:
    """Stable snapshot identifier for checkpoint lineage: the Iceberg
    snapshot id when available, else a digest of the parquet file listing
    (name+size+mtime) — changes iff the data changes."""
    if iceberg_available(spark) and "/" not in target:
        row = spark.sql(
            f"SELECT snapshot_id FROM {target}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").head()
        return str(row[0]) if row else "empty"
    import hashlib
    import os

    h = hashlib.md5()
    for root, _, files in sorted(os.walk(target)):
        for name in sorted(files):
            if name.endswith((".parquet", ".crc")) or name == "_SUCCESS":
                p = os.path.join(root, name)
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
