"""Per-partition column statistics (null/min/max/distinct).

North-star operator (no single-row analog in the reference — SURVEY.md
§2.10).  One shuffle-free pass when grouped by a partition column that is
also the physical partitioning; otherwise one shuffle with map-side
partial aggregation.  Distinct counts use HLL sketches
(``hll_sketch_agg``, Spark 3.5+) or ``approx_count_distinct`` — exact
``count_distinct`` only for oracle cross-checks at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


_TEXT_PREFIX = 64  # min/max carry at most this many chars of a string


def _agg_exprs(cols: list[str], distinct: str, dtypes: dict | None = None):
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        col = F.col(c)
        # long text columns: full-value min/max would carry whole
        # documents through the aggregation buffers at scale — clamp
        # string stats to a prefix (order-compatible: the min/max of
        # prefixes is the prefix of min/max up to ties)
        if dtypes and isinstance(dtypes.get(c), StringType):
            stat_col = F.substring(col, 1, _TEXT_PREFIX)
        else:
            stat_col = col
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}_nulls"),
            F.min(stat_col).alias(f"{c}_min"),
            F.max(stat_col).alias(f"{c}_max"),
        ]
        if distinct == "exact":
            aggs.append(F.count_distinct(col).alias(f"{c}_distinct"))
        elif distinct == "hll":
            aggs.append(F.hll_sketch_estimate(
                F.hll_sketch_agg(col.cast("string"))).alias(f"{c}_distinct"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}_distinct"))
    return aggs


def column_stats(df: DataFrame, cols: list[str],
                 group_by: str | None = None,
                 distinct: str = "approx") -> DataFrame:
    """Stats per ``group_by`` value (or whole-table when None).

    ``distinct``: 'approx' (HLL++ via approx_count_distinct, default),
    'hll' (DataSketches HLL), or 'exact' (exact, small-scale/oracle only).
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    g = df.groupBy(group_by) if group_by else df.groupBy()
    return g.agg(*_agg_exprs(cols, distinct, dtypes))


def partition_stats(df: DataFrame, cols: list[str],
                    distinct: str = "approx") -> DataFrame:
    """Stats per *physical* partition (spark_partition_id) — zero shuffle:
    the groupBy key is the partition id itself, so partial aggregation
    completes map-side and only one row per partition moves."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    return (df.withColumn("partition_id", F.spark_partition_id())
              .groupBy("partition_id")
              .agg(*_agg_exprs(cols, distinct, dtypes)))
