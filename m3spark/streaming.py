"""Structured-Streaming validation: the same compiled plan, incremental.

The reference is batch-only (SURVEY.md §2.11) — this module adds no new
keyword semantics, it lifts the SAME compiled columnar plan onto a
stream: ``readStream`` over an arriving pages directory (or Kafka/
Iceberg source in deployment) → per-row violations → windowed
per-watermark verdict aggregates.  Because the validation is a pure
stateless Project, it composes with any streaming sink/trigger; only
the verdict aggregation is stateful (watermarked window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3spark.columnar import ColumnarValidator
from m3spark.pages import PAGES_SCHEMA


def validate_stream(pages_stream: DataFrame, schema: dict | None = None,
                    ts_col: str = "warc_ts",
                    watermark: str = "1 hour",
                    window: str = "1 day",
                    format_assertion: bool = True) -> dict:
    """Attach validation to a streaming pages DataFrame.

    Returns lazy streaming DataFrames:
      - ``rows``: stream + violations + valid (stateless — append mode)
      - ``verdicts``: watermarked per-window pass/fail counts (update
        mode); late rows beyond ``watermark`` are dropped by Spark
    """
    schema = schema or PAGES_SCHEMA
    cv = ColumnarValidator(schema, format_assertion=format_assertion)
    rows = cv.apply(pages_stream)
    verdicts = (
        rows.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"))
            .agg(F.count(F.lit(1)).alias("rows_scanned"),
                 F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"))
            .select(F.col("w.start").alias("window_start"),
                    "rows_scanned", "invalid_rows",
                    (F.col("invalid_rows") == 0).alias("passed")))
    return {"rows": rows, "verdicts": verdicts, "validator": cv}


def streaming_drift_buckets(stream: DataFrame, value_expr: str,
                            ts_col: str = "warc_ts",
                            watermark: str = "1 hour",
                            window: str = "1 day",
                            slide: str | None = None,
                            bins: int = 20, lo: float = 0.0,
                            hi: float = 1.0) -> DataFrame:
    """Streaming side of windowed distribution-drift detection: a
    watermarked (sliding-)window histogram of ``value_expr`` — the ONLY
    stateful piece drift needs on a stream.  Emits
    (window_start, bucket, cnt) incrementally (update mode); feed the
    sink table to :func:`m3spark.checks.drift.psi_vs_baseline` for
    per-window PSI against a baseline snapshot.  State is one long per
    (window, bucket): bounded by bins x active windows, independent of
    row count — the same fixed-bucket design as the batch
    numeric_histogram (no data-dependent quantiles, so stream and batch
    bucket identically)."""
    c = F.expr(value_expr)
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)),
                       F.lit(float(hi)), F.lit(bins))
    w = (F.window(F.col(ts_col), window, slide) if slide
         else F.window(F.col(ts_col), window))
    return (stream.where(c.isNotNull())
                  .withWatermark(ts_col, watermark)
                  .groupBy(w.alias("w"), b.alias("bucket"))
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .select(F.col("w.start").alias("window_start"),
                          "bucket", "cnt"))


def streaming_unique_violations(stream: DataFrame,
                                key_col: str = "url") -> DataFrame:
    """Cross-micro-batch uniqueness — the streaming analog of
    checks/uniqueness.py, as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per-key state holds the running
    occurrence count across ALL batches seen so far; a key whose total
    passes 1 emits an updated (key, dup_count) violation row.

    State is one long per distinct key, partitioned by the grouping key
    — the same keyed layout the batch uniqueness shuffle uses, so skew
    handling (salting upstream) applies identically.  Arrow-batched per
    group; no per-row Python."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState, GroupStateTimeout,
    )

    def track(key, pdfs, state: GroupState):
        seen = sum(len(p) for p in pdfs)
        prev = state.get[0] if state.exists else 0
        total = prev + seen
        state.update((total,))
        if total > 1:
            yield pd.DataFrame({key_col: [key[0]],
                                "dup_count": [total]})

    return (stream.select(key_col)
                  .groupBy(key_col)
                  .applyInPandasWithState(
                      track,
                      outputStructType=f"{key_col} string, dup_count long",
                      stateStructType="count long",
                      outputMode="update",
                      timeoutConf=GroupStateTimeout.NoTimeout))
