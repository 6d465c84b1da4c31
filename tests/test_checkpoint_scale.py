"""Checkpoint store at high partition counts: appends are batched per
chunk (O(chunks) parquet files, not O(partitions)), missing partition
counts refuse to checkpoint, and compact() collapses the history."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from m3spark.checks import CheckpointStore, run_resumable_batched

N_PARTS = 1000
BATCH = 200


def _files(path):
    return glob.glob(f"{path}/part-*.parquet") + glob.glob(f"{path}/*.parquet")


def test_thousand_partitions_few_files(spark, tmp_path):
    path = str(tmp_path / "ckpt")
    df = (spark.range(N_PARTS * 3)
               .withColumn("pkey", (F.col("id") % N_PARTS).cast("int")))
    store = CheckpointStore(spark, path)

    def validate_batch(chunk_df):
        rows = chunk_df.groupBy("pkey").count().collect()
        return {r["pkey"]: (r["count"], 0) for r in rows}

    out = run_resumable_batched(df, "pkey", store, "snap-1",
                                validate_batch, batch_size=BATCH)
    assert len(out["validated"]) == N_PARTS
    n_files = len(set(_files(path)))
    assert n_files <= N_PARTS // BATCH + 1, (
        f"{n_files} files for {N_PARTS} partitions — appends not batched")

    # full resume: nothing re-validated, no new files
    out2 = run_resumable_batched(df, "pkey", store, "snap-1",
                                 validate_batch, batch_size=BATCH)
    assert len(out2["skipped"]) == N_PARTS and not out2["validated"]

    # lineage intact
    assert store.lineage().count() == N_PARTS

    store.compact()
    assert len(set(_files(path))) == 1
    assert store.lineage().count() == N_PARTS
    assert len(store.completed("snap-1")) == N_PARTS


def test_missing_partition_count_refused(spark, tmp_path):
    df = (spark.range(20)
               .withColumn("pkey", (F.col("id") % 4).cast("int")))
    store = CheckpointStore(spark, str(tmp_path / "ckpt2"))

    def broken_batch(chunk_df):
        return {}  # reports nothing

    with pytest.raises(KeyError, match="refusing to checkpoint"):
        run_resumable_batched(df, "pkey", store, "snap-x", broken_batch,
                              batch_size=2)
    # nothing was checkpointed as complete
    assert not store.completed("snap-x")
