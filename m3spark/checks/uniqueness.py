"""Cross-row uniqueness (the distributed lift of m3's within-row
``uniqueItems`` — SURVEY.md §2.5 / §2.10).

Exact duplicate detection is a keyed count: one shuffle on the key with
map-side partial aggregation, so even heavily-skewed keys (hot crawl
domains) only ship one partial count per (key, input-partition).  For
pathological skew, ``salt_partitions`` forces an explicit two-phase
aggregation: counts are first combined per (key, salt) — spreading a hot
key over N reducers — then summed per key.  AQE skew-join mitigation is
enabled in the session factory (m3spark.session) as the adaptive backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str,
                   salt_partitions: int | None = None) -> DataFrame:
    """Keys appearing more than once, with their counts.

    Returns ``(key, dup_count)`` with ``dup_count > 1``.
    """
    if salt_partitions and salt_partitions > 1:
        # two-phase exact count: salt spreads a hot key across reducers
        salted = df.select(
            F.col(key),
            F.pmod(F.xxhash64(F.col(key), F.spark_partition_id()),
                   F.lit(salt_partitions)).alias("_salt"))
        phase1 = salted.groupBy(key, "_salt").agg(
            F.count(F.lit(1)).alias("_partial"))
        counts = phase1.groupBy(key).agg(F.sum("_partial").alias("dup_count"))
    else:
        counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("dup_count"))
    return counts.filter(F.col("dup_count") > 1)


def uniqueness_violations(df: DataFrame, key: str,
                          salt_partitions: int | None = None) -> DataFrame:
    """Violation rows in the north-star shape for duplicated keys."""
    dups = duplicate_keys(df, key, salt_partitions)
    return dups.select(
        F.col(key),
        F.lit("uniqueItems").alias("keyword"),
        F.lit("/uniqueItems").alias("schema_path"),
        F.lit("/" + key).alias("doc_path"),
        F.concat(F.lit("duplicate key: "), F.col("dup_count").cast("string"),
                 F.lit(" occurrences")).alias("message"),
        F.lit("error").alias("level"))
