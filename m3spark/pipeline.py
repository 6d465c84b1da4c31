"""End-to-end page-validation pipeline: the engine's flagship job.

compile(schema) → columnar predicates → per-row violations → per-partition
pass/fail verdicts + exploded violation table + table-scale checks
(uniqueness, stats, drift), sharing one cached scan across the jobs
(SURVEY.md §3 "Spark lifecycle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3spark.columnar import ColumnarValidator
from m3spark.checks.uniqueness import uniqueness_violations
from m3spark.pages import PAGES_SCHEMA


def validate_pages(pages: DataFrame, schema: dict | None = None,
                   key_col: str = "url",
                   partition_expr: str = "to_date(warc_ts)",
                   with_uniqueness: bool = True,
                   format_assertion: bool = True) -> dict:
    """Run the full validation over a pages table.

    Returns dict of lazy DataFrames:
      - ``rows``: input + violations + valid
      - ``violations``: exploded north-star violation table
      - ``partition_verdicts``: per-partition pass/fail + counts
    One validated scan feeds all three (cache ``rows`` for multi-action
    runs; callers decide persistence).
    """
    schema = schema or PAGES_SCHEMA
    cv = ColumnarValidator(schema, format_assertion=format_assertion)
    rows = cv.apply(pages)

    viol = (rows.select(F.col(key_col), F.explode("violations").alias("v"))
                .select(key_col,
                        F.col("v.keyword").alias("keyword"),
                        F.col("v.schema_path").alias("schema_path"),
                        F.col("v.doc_path").alias("doc_path"),
                        F.col("v.message").alias("message"),
                        F.col("v.level").alias("level")))
    if with_uniqueness:
        viol = viol.unionByName(uniqueness_violations(rows, key_col))

    part = F.expr(partition_expr).alias("partition_key")
    verdicts = (rows.groupBy(part)
                    .agg(F.count(F.lit(1)).alias("rows_scanned"),
                         F.sum((~F.col("valid")).cast("long"))
                          .alias("invalid_rows"),
                         F.sum(F.size(F.col("violations")))
                          .alias("violation_count"))
                    .withColumn("passed", F.col("invalid_rows") == 0))
    return {"rows": rows, "violations": viol,
            "partition_verdicts": verdicts, "validator": cv}
