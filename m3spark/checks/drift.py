"""Distribution-drift detection: KS statistic and PSI vs a baseline
snapshot (north-star operator, SURVEY.md §2.10).

The heavy part — histogramming — runs in Spark (one map-side-combinable
groupBy per column); only the tiny histogram (≤ a few hundred buckets)
is collected, and the KS/PSI math runs driver-side in NumPy.  This keeps
the cluster pass O(rows) with one shuffle of O(buckets) rows, identical
at 60k rows or 10^12.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_histogram(df: DataFrame, col: str) -> dict:
    """{value -> count}; NULL keyed as None."""
    rows = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    return {r[col]: r["cnt"] for r in rows}


def numeric_histogram(df: DataFrame, col: str, bins: int,
                      lo: float, hi: float) -> dict:
    """{bucket_index -> count} over fixed [lo, hi) buckets.  Fixed bounds
    (not data-dependent quantiles) so baseline and current snapshots bucket
    identically without a second pass."""
    c = F.expr(col)  # column name or SQL expression (e.g. "length(text)")
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)),
                       F.lit(float(hi)), F.lit(bins))
    rows = (df.where(c.isNotNull())
              .groupBy(b.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")).collect())
    return {r["bucket"]: r["cnt"] for r in rows}


def _normalize(hist: dict, keys) -> list[float]:
    total = sum(hist.get(k, 0) for k in keys) or 1
    return [hist.get(k, 0) / total for k in keys]


def psi(baseline: dict, current: dict, eps: float = 1e-6) -> float:
    """Population Stability Index: sum((p-q) * ln(p/q)) over buckets.
    <0.1 stable, 0.1-0.25 moderate shift, >0.25 major shift."""
    keys = sorted(set(baseline) | set(current), key=lambda k: (k is None, str(k)))
    p = _normalize(current, keys)
    q = _normalize(baseline, keys)
    out = 0.0
    for pi, qi in zip(p, q):
        pi = max(pi, eps)
        qi = max(qi, eps)
        out += (pi - qi) * math.log(pi / qi)
    return out


def ks_statistic(baseline: dict, current: dict) -> float:
    """Two-sample KS statistic from binned counts: max |ECDF_p - ECDF_q|
    over ordered buckets (exact for categorical-as-ordered; binned
    approximation for numeric)."""
    keys = sorted(set(baseline) | set(current),
                  key=lambda k: (k is None, k if isinstance(k, (int, float))
                                 else str(k)))
    p = _normalize(current, keys)
    q = _normalize(baseline, keys)
    cp = cq = 0.0
    worst = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        worst = max(worst, abs(cp - cq))
    return worst


# -- pure-DataFrame variants (the library scale path: no driver-side
# histogram collect; everything stays in Spark until the single metric
# row).  The driver-oracle queries delegate here. ---------------------------


def psi_from_counts(counts: DataFrame, a: str = "c_a", b: str = "c_b",
                    eps: float | None = None) -> DataFrame:
    """PSI from a bucket-count table with current (``a``) and baseline
    (``b``) count columns → one row (psi double).  ``eps`` clamps EVERY
    bucket proportion from below (needed when the two snapshots can have
    disjoint support).  ``eps=None`` keeps nonzero proportions exact
    (oracle-reproducible in plain SQL) but still floors exact-zero
    proportions at 1e-6 and clamps an all-empty side's total with
    greatest(total, 1) — a disjoint-support bucket therefore yields a
    large finite PSI term, not an unclamped/NULL sum."""
    # greatest(total, 1) mirrors the driver-side psi()'s `or 1` clamp so
    # an all-empty side yields a finite PSI, not NULL via 0-division
    tot = counts.agg(F.greatest(F.sum(a), F.lit(1)).alias("t_a"),
                     F.greatest(F.sum(b), F.lit(1)).alias("t_b"))
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col(a) / F.col("t_a")
    q = F.col(b) / F.col("t_b")
    if eps is not None:
        p = F.greatest(p, F.lit(eps))
        q = F.greatest(q, F.lit(eps))
    else:
        # keep nonzero proportions exact (oracle-reproducible in plain
        # SQL) but floor exact zeros at 1e-6, mirroring the driver-side
        # psi()'s eps clamp — a one-sided bucket yields a large finite
        # term instead of an ANSI divide-by-zero
        p = F.when(p <= 0, F.lit(1e-6)).otherwise(p)
        q = F.when(q <= 0, F.lit(1e-6)).otherwise(q)
    term = (p - q) * F.log(p / q)
    return j.agg(F.sum(term).alias("psi"))


def psi_split(df: DataFrame, group_col: str, split_pred) -> DataFrame:
    """PSI of the ``group_col`` mix between the two sides of a boolean
    Column predicate — one map-side-combinable groupBy, one broadcast of
    the 2-value totals row, one tiny aggregate."""
    counts = df.groupBy(group_col).agg(
        F.sum(split_pred.cast("long")).alias("c_a"),
        F.sum((~split_pred).cast("long")).alias("c_b"))
    return psi_from_counts(counts)


def ks_split(df: DataFrame, bucket_col, split_pred) -> DataFrame:
    """Binned two-sample KS between the two sides of a predicate:
    histogram in Spark, ECDFs via a window over the (tiny) bucket table,
    max |difference| — one row (ks double)."""
    from pyspark.sql import Window

    h = (df.groupBy(bucket_col.alias("bucket"))
           .agg(F.sum(split_pred.cast("long")).alias("c_a"),
                F.sum((~split_pred).cast("long")).alias("c_b")))
    tot = h.agg(F.greatest(F.sum("c_a"), F.lit(1)).alias("t_a"),
                F.greatest(F.sum("c_b"), F.lit(1)).alias("t_b"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = (h.crossJoin(F.broadcast(tot))
             .withColumn("cum_a", F.sum("c_a").over(w) / F.col("t_a"))
             .withColumn("cum_b", F.sum("c_b").over(w) / F.col("t_b")))
    return ecdf.agg(F.max(F.abs(F.col("cum_a") - F.col("cum_b")))
                    .alias("ks"))


def psi_vs_baseline(bucket_df: DataFrame, baseline: dict,
                    group_col: str = "window_start",
                    eps: float = 1e-6) -> DataFrame:
    """Per-group PSI of a (group, bucket, cnt) table against a fixed
    baseline histogram {bucket -> count} — the read side of the
    streaming drift operator (m3spark.streaming.streaming_drift_buckets)
    and of any batch bucket table.  The baseline ships as a broadcast
    literal; buckets missing on either side get ``eps`` mass, mirroring
    :func:`psi`."""
    spark = bucket_df.sparkSession
    t_q = float(sum(baseline.values())) or 1.0
    base = spark.createDataFrame(
        [(int(k), float(v)) for k, v in baseline.items()],
        "bucket int, qcnt double")
    # grid columns renamed: `groups` derives from bucket_df, and a
    # full-outer self-join on shared names hits conflicting-attribute
    # resolution; the join condition is explicit instead
    groups = (bucket_df.select(F.col(group_col).alias("_g"))
                       .distinct())
    grid = groups.crossJoin(base.withColumnRenamed("bucket", "_b"))
    cur = (grid.join(bucket_df,
                     (F.col("_g") == F.col(group_col))
                     & (F.col("_b") == F.col("bucket")), "full_outer")
               .select(F.coalesce(F.col("_g"), F.col(group_col))
                        .alias("_grp"),
                       F.coalesce("cnt", F.lit(0)).alias("cnt"),
                       F.coalesce("qcnt", F.lit(0.0)).alias("qcnt")))
    from pyspark.sql import Window

    tot = Window.partitionBy("_grp")
    p = F.greatest(F.col("cnt") / F.sum("cnt").over(tot), F.lit(eps))
    q = F.greatest(F.col("qcnt") / F.lit(t_q), F.lit(eps))
    term = (p - q) * F.log(p / q)
    return (cur.select("_grp", term.alias("term"))
               .groupBy("_grp")
               .agg(F.sum("term").alias("psi"))
               .withColumnRenamed("_grp", group_col))


def drift_report(df_baseline: DataFrame, df_current: DataFrame,
                 cat_cols: list[str] | None = None,
                 num_cols: list[tuple] | None = None) -> dict:
    """Per-column drift metrics.

    ``num_cols``: list of (col, bins, lo, hi) tuples (fixed buckets).
    Returns {col: {"psi": float, "ks": float}}.
    """
    out = {}
    for c in cat_cols or []:
        base = categorical_histogram(df_baseline, c)
        cur = categorical_histogram(df_current, c)
        out[c] = {"psi": psi(base, cur), "ks": ks_statistic(base, cur)}
    for c, bins, lo, hi in num_cols or []:
        base = numeric_histogram(df_baseline, c, bins, lo, hi)
        cur = numeric_histogram(df_current, c, bins, lo, hi)
        out[c] = {"psi": psi(base, cur), "ks": ks_statistic(base, cur)}
    return out
