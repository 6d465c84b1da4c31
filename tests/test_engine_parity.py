"""End-to-end engine parity on the north-star schema: the columnar
engine and the Arrow interpreter must produce identical per-row verdicts
AND identical (keyword, doc_path) violation sets over the same pages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m3spark.columnar import ColumnarValidator
from m3spark.pages import PAGES_SCHEMA, generate_pages
from m3spark.sparkval import validate_json

N = 4000


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N).cache()
    df.count()
    yield df
    df.unpersist()


def test_pages_schema_engine_parity(spark, pages):
    cv = ColumnarValidator(PAGES_SCHEMA, format_assertion=True)
    col_rows = (cv.apply(pages)
                  .select("url", "valid", "violations").collect())
    col_verdicts = {}
    col_viols = {}
    for r in col_rows:
        col_verdicts[r["url"]] = r["valid"]
        # include the offending value: both engines must render the same
        # (string-typed violating fields here: url / text / lang)
        col_viols[r["url"]] = {(v["keyword"], v["doc_path"], v["value"])
                               for v in r["violations"]}

    # same rows as JSON documents through the interpreter (html is
    # binary → base64 text stands in; only presence matters to the schema)
    docs = pages.select(
        F.col("url").alias("key"),
        F.to_json(F.struct(
            F.col("url"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_ts"),
            F.base64("html").alias("html"),
            F.col("text"),
            F.col("lang"))).alias("doc"))
    out = validate_json(docs, PAGES_SCHEMA, format_assertion=True)
    interp_rows = out.select("key", "valid", "violations").collect()

    mismatch_verdict = []
    mismatch_viol = []
    for r in interp_rows:
        url = r["key"]
        if bool(r["valid"]) != bool(col_verdicts[url]):
            mismatch_verdict.append(url)
            continue
        got = {(v["keyword"], v["doc_path"], v["value"])
               for v in (r["violations"] or []) if v["level"] == "error"}
        if got != col_viols[url]:
            mismatch_viol.append((url, got, col_viols[url]))
    assert not mismatch_verdict, mismatch_verdict[:5]
    assert not mismatch_viol, mismatch_viol[:3]

    # sanity: the corpus actually exercises both verdicts
    n_bad = sum(1 for v in col_verdicts.values() if not v)
    assert 0 < n_bad < N
