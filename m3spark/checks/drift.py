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
