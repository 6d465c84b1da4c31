"""Scale-adaptive parallelism floor for Python-boundary stages.

A parquet scan of a small table yields as few as 1-2 input splits, and
a mapInPandas / pandas_udf stage inherits that: the whole Arrow decode
runs on 1-2 cores while the rest of the cluster idles (guide §2.5
"input skew" / §6 input split sizing).  ``widen_partitions`` raises the
stage's parallelism to the session's default parallelism — and is a
strict NO-OP whenever the input already has at least that many
partitions, so at real scale (where scans produce hundreds of splits)
it never adds a shuffle.  The repartition that does fire moves only the
columns already projected for the Python stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
