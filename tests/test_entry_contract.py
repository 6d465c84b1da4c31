"""Driver-contract sanity: entry() runs, every oracle key has a query,
and a fast sample of oracle pairs hash-matches DuckDB at sf0.01
(the full sweep lives in tools/check_oracles.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, value_hash

SF = "/root/testdata/sf0.01"

# fast representative subset (one per operator family)
SAMPLE = ["val_documents", "uniqueness_documents", "stats_documents",
          "drift_events_psi", "sim_topk_embeddings",
          "text_tokens_documents", "fingerprint_documents"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "keyword", "schema_path", "value"]


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15
    assert all(callable(f) for f in qs.values())


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_parity(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracles[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert value_hash(srows, sdf.columns) == value_hash(drows, dcols)
