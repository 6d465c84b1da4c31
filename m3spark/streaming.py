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
