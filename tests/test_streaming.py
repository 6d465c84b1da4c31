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


def test_streaming_windowed_psi_matches_batch(tmp_path, spark):
    """Sliding-window drift on the stream: watermarked windowed
    histogram (the stateful piece) + pure-DataFrame PSI vs a baseline
    snapshot must equal, per window, the batch PSI computed with the
    driver-side numeric_histogram + psi() pair over the same rows."""
    from m3spark.checks.drift import numeric_histogram, psi, psi_vs_baseline
    from m3spark.streaming import streaming_drift_buckets

    src = str(tmp_path / "incoming4")
    pages = generate_pages(spark, 6000).cache()
    pages.repartition(6).write.mode("overwrite").parquet(src)
    bins, lo, hi = 16, 0.0, 400.0
    # baseline snapshot: the first crawl day's text-length histogram
    first_day = pages.where(F.expr("to_date(warc_ts) = '2024-01-01'"))
    baseline = numeric_histogram(first_day, "length(text)", bins, lo, hi)

    stream = (spark.readStream.schema(pages.schema)
                   .option("maxFilesPerTrigger", 2).parquet(src))
    buckets = streaming_drift_buckets(stream, "length(text)",
                                      ts_col="warc_ts", window="1 day",
                                      bins=bins, lo=lo, hi=hi)
    q = (buckets.writeStream.format("memory").queryName("stream_psi")
                .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {str(r["window_start"])[:10]: r["psi"] for r in
           psi_vs_baseline(spark.table("stream_psi"), baseline).collect()}

    # batch ground truth per day through the DRIVER-SIDE path
    days = [r[0] for r in pages.select(
        F.expr("to_date(warc_ts)").alias("d")).distinct().collect()]
    for d in days:
        cur = numeric_histogram(
            pages.where(F.expr(f"to_date(warc_ts) = '{d}'")),
            "length(text)", bins, lo, hi)
        assert abs(got[str(d)] - psi(baseline, cur)) < 1e-9, str(d)
    assert len(got) == len(days)
    pages.unpersist()
