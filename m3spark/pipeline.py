"""End-to-end page-validation pipeline: the engine's flagship job.

compile(schema) → columnar predicates → per-row violations → per-partition
pass/fail verdicts + exploded violation table + uniqueness, sharing one
validated scan (SURVEY.md §3 "Spark lifecycle").

The violation/verdict/uniqueness jobs are derived from a SLIM projection
(key, partition key, valid, violations) so a persisted intermediate
carries ~1% of the bytes of the full pages row (html stays out of cache
and out of every shuffle — at 100 TB the binary column must never move
past the first Project)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3spark.columnar import ColumnarValidator
from m3spark.pages import PAGES_SCHEMA


def validate_pages(pages: DataFrame, schema: dict | None = None,
                   key_col: str = "url",
                   partition_expr: str = "to_date(warc_ts)",
                   with_uniqueness: bool = True,
                   format_assertion: bool = True,
                   persist: bool = False) -> dict:
    """Run the full validation over a pages table.

    Returns dict of lazy DataFrames:
      - ``rows``: input + violations + valid (full width)
      - ``slim``: (key, partition_key, valid, violations) — the shared
        core of the downstream jobs; persisted when ``persist=True``
        (caller unpersists)
      - ``violations``: exploded north-star violation table
      - ``partition_verdicts``: per-partition pass/fail + counts
    """
    schema = schema or PAGES_SCHEMA
    cv = ColumnarValidator(schema, format_assertion=format_assertion)
    rows = cv.apply(pages)

    # r8: persist only the VIOLATING rows.  The r7 shape cached the full
    # slim projection (key, partition_key, valid, violations) — at 10M
    # rows the in-memory columnar cache build alone cost ~35% of the
    # flagship job, yet every downstream consumer except the
    # rows_scanned total only ever looks at rows that carry a
    # violation (~3% with the planted anomaly rates).  rows_scanned now
    # comes from a column-pruned count over the raw input (reads just
    # the partition column), left-joined to the per-partition violation
    # aggregate.  The violating rows are found by ONE Filter pass that
    # evaluates each check predicate once (violation_prefilter) — the
    # per-row violation-struct assembly then runs only on the ~3%
    # survivors.  A row with an empty violations array is always valid
    # (valid := no error-level violations), so the filter loses
    # nothing.
    try:
        bad = cv.violation_prefilter(pages)
    except ValueError:
        bad = pages
    slim = cv.apply(bad).select(
        F.col(key_col),
        F.expr(partition_expr).alias("partition_key"),
        "valid", "violations").where(F.size("violations") > 0)
    if persist:
        slim = slim.persist()

    viol = (slim.select(F.col(key_col), "partition_key",
                        F.explode("violations").alias("v"))
                .select(key_col, "partition_key",
                        F.col("v.keyword").alias("keyword"),
                        F.col("v.schema_path").alias("schema_path"),
                        F.col("v.doc_path").alias("doc_path"),
                        F.col("v.message").alias("message"),
                        F.col("v.level").alias("level"),
                        F.col("v.value").alias("value")))
    if with_uniqueness:
        dups = (pages.groupBy(F.col(key_col))
                     .agg(F.count(F.lit(1)).alias("dup_count"))
                     .filter(F.col("dup_count") > 1))
        # a key duplicated ACROSS partitions has no single partition_key
        # (filled null by allowMissingColumns)
        viol = viol.unionByName(dups.select(
            F.col(key_col),
            F.lit("uniqueItems").alias("keyword"),
            F.lit("/uniqueItems").alias("schema_path"),
            F.lit("/" + key_col).alias("doc_path"),
            F.concat(F.lit("duplicate key: "),
                     F.col("dup_count").cast("string"),
                     F.lit(" occurrences")).alias("message"),
            F.lit("error").alias("level")), allowMissingColumns=True)

    totals = (pages.groupBy(F.expr(partition_expr).alias("partition_key"))
                   .agg(F.count(F.lit(1)).alias("rows_scanned")))
    viol_agg = (slim.groupBy("partition_key")
                    .agg(F.sum((~F.col("valid")).cast("long"))
                          .alias("_invalid"),
                         F.sum(F.size(F.col("violations")))
                          .alias("_vcount")))
    verdicts = (totals.join(viol_agg, "partition_key", "left")
                      .select("partition_key", "rows_scanned",
                              F.coalesce("_invalid", F.lit(0))
                               .cast("long").alias("invalid_rows"),
                              F.coalesce("_vcount", F.lit(0))
                               .cast("long").alias("violation_count"))
                      .withColumn("passed", F.col("invalid_rows") == 0))
    return {"rows": rows, "slim": slim, "violations": viol,
            "partition_verdicts": verdicts, "validator": cv}
