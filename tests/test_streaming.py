"""Streaming validation: same plan, incremental over a file stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m3spark.pages import generate_pages
from m3spark.streaming import validate_stream


def test_stream_matches_batch(tmp_path, spark):
    src = str(tmp_path / "incoming")
    n = 5000
    pages = generate_pages(spark, n)
    pages.write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(pages.schema)
                   .option("maxFilesPerTrigger", 4).parquet(src))
    res = validate_stream(stream)
    q = (res["rows"]
         .select("valid")
         .writeStream.format("memory").queryName("stream_valid")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, sum(CASE WHEN valid THEN 0 ELSE 1 END) AS bad "
        "FROM stream_valid").head()
    assert got["n"] == n
    # batch ground truth
    from m3spark.pipeline import validate_pages

    batch_bad = validate_pages(pages)["rows"].where("not valid").count()
    assert got["bad"] == batch_bad


def test_stream_windowed_verdicts(tmp_path, spark):
    src = str(tmp_path / "incoming2")
    pages = generate_pages(spark, 3000)
    pages.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    res = validate_stream(stream, window="1 day")
    q = (res["verdicts"].writeStream.format("memory")
         .queryName("stream_verdicts").outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stream_verdicts").collect()
    assert len(rows) == 30  # 30 crawl days
    assert sum(r["rows_scanned"] for r in rows) == 3000
    # streaming verdicts equal the batch ground truth per window
    from m3spark.pipeline import validate_pages

    batch = {str(r["partition_key"]): r["invalid_rows"] for r in
             validate_pages(pages)["partition_verdicts"].collect()}
    got = {str(r["window_start"])[:10]: r["invalid_rows"] for r in rows}
    assert got == batch


def test_streaming_stateful_uniqueness(tmp_path, spark):
    """applyInPandasWithState cross-batch dedup: duplicate urls split
    ACROSS micro-batches are still flagged (keyed state carries the
    first batch's counts into the second), and the final per-key counts
    equal the batch ground truth."""
    from m3spark.streaming import streaming_unique_violations

    src = str(tmp_path / "incoming3")
    pages = generate_pages(spark, 4000)
    # many small files -> many micro-batches (maxFilesPerTrigger=1)
    pages.repartition(8).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(pages.schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
    dups = streaming_unique_violations(stream, "url")
    q = (dups.writeStream.format("memory").queryName("stream_dups")
             .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    # update mode re-emits growing counts; the max per key is the total
    got = {r["url"]: r["dup_count"] for r in spark.sql(
        "SELECT url, max(dup_count) AS dup_count FROM stream_dups "
        "GROUP BY url").collect()}

    batch = {r["url"]: r["dup_count"] for r in
             pages.groupBy("url").agg(F.count(F.lit(1)).alias("dup_count"))
                  .where("dup_count > 1").collect()}
    assert batch, "generator should plant duplicate urls"
    assert got == batch
