"""Spark replay of the corpus through the Arrow-batched interpreter, and
agreement between the columnar and interpreter engines.

Mirrors the reference's suite runner design (m3:
test/cljc/m3/testsuite_test.cljc:130-201): each test group becomes a
one-column JSON DataFrame, verdicts compared to expectations — but here
the verdicts are computed cluster-side in Arrow batches.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from m3spark.sparkval import validate_json, violation_rows
from m3spark.columnar import ColumnarValidator

from corpus import CASES


def test_corpus_replay_through_spark(spark):
    """One DataFrame per ~all groups: rows carry (group_id, doc), each
    group's schema validates its own rows; verdict must equal expectation.
    Groups are batched into a single Spark job per draft to keep the test
    fast while still exercising the mapInPandas path."""
    failures = []
    for gi, (draft, desc, schema, tests) in enumerate(CASES):
        rows = [(i, json.dumps(data)) for i, (data, _) in enumerate(tests)]
        df = spark.createDataFrame(rows, "i int, doc string")
        out = validate_json(df, schema, draft=draft, format_assertion=True)
        got = {r["i"]: r["valid"] for r in out.select("i", "valid").collect()}
        for i, (data, expected) in enumerate(tests):
            if got[i] != expected:
                failures.append(f"[{draft}] {desc} #{i}: want {expected}")
    assert not failures, failures


def test_m3_fixtures_through_spark(spark):
    """The reference's own regression fixtures replayed CLUSTER-side:
    each test document becomes a row, verdicts computed in Arrow batches
    must match the fixtures, and invalid rows must emit violation rows
    in the north-star shape."""
    import os

    m3_dir = "/root/reference/test-resources/m3-tests"
    if not os.path.isdir(m3_dir):
        pytest.skip("reference fixtures not available")
    for fname in sorted(os.listdir(m3_dir)):
        with open(os.path.join(m3_dir, fname)) as f:
            groups = json.load(f)
        for g in groups:
            rows = [(i, json.dumps(t["data"])) for i, t in
                    enumerate(g["tests"])]
            df = spark.createDataFrame(rows, "i int, doc string")
            out = validate_json(df, g["schema"]).cache()
            got = {r["i"]: r["valid"] for r in out.collect()}
            for i, t in enumerate(g["tests"]):
                assert got[i] == t["valid"], (fname, g["description"],
                                              t["description"])
            viol = violation_rows(out, key_col="i")
            bad_keys = {r["i"] for r in viol
                        .where(F.col("level") == "error").collect()}
            expect_bad = {i for i, t in enumerate(g["tests"])
                          if not t["valid"]}
            assert bad_keys == expect_bad
            out.unpersist()


def test_violation_rows_shape(spark):
    df = spark.createDataFrame(
        [("u1", '{"a": 1}'), ("u2", '{"a": "x"}')], "url string, doc string")
    out = validate_json(df, {"properties": {"a": {"type": "integer"}}})
    rows = violation_rows(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["url"], r["keyword"], r["doc_path"]) == ("u2", "type", "/a")
    assert r["schema_path"] == "/properties/a/type"


FLAT_SCHEMA = {
    "type": "object",
    "required": ["url", "text"],
    "properties": {
        "url": {"type": "string", "pattern": "^https://", "maxLength": 50},
        "text": {"type": "string", "minLength": 2},
        "lang": {"enum": ["en", "de"]},
        "score": {"type": "number", "minimum": 0, "exclusiveMaximum": 10,
                  "multipleOf": 0.5},
        "n": {"type": "integer", "minimum": 1},
    },
}

FLAT_ROWS = [
    ("https://ok.com", "hello", "en", 3.5, 2),
    ("http://bad-scheme.com", "hi", "de", 0.0, 1),
    (None, "x", "fr", 10.0, 0),          # required, minLength, enum, exclMax, min
    ("https://ok2.com", None, None, 0.3, None),  # required text, multipleOf
    ("https://" + "a" * 60, "yo", "en", 9.5, 7),  # maxLength
]


def test_columnar_matches_interpreter(spark):
    """The JVM columnar engine and the Python interpreter must agree on
    per-row validity for flat typed rows (engines share semantics)."""
    df = spark.createDataFrame(
        FLAT_ROWS, "url string, text string, lang string, score double, n int")
    cv = ColumnarValidator(FLAT_SCHEMA, format_assertion=True)
    got_columnar = [r["valid"] for r in
                    cv.apply(df).select("valid").collect()]

    # same rows through the interpreter as JSON docs (NULL = missing)
    docs = []
    for url, text, lang, score, n in FLAT_ROWS:
        d = {k: v for k, v in
             [("url", url), ("text", text), ("lang", lang),
              ("score", score), ("n", n)] if v is not None}
        docs.append(json.dumps(d))
    df2 = spark.createDataFrame([(d,) for d in docs], "doc string")
    out = validate_json(df2, FLAT_SCHEMA, format_assertion=True)
    got_interp = [r["valid"] for r in out.select("valid").collect()]
    assert got_columnar == got_interp == [True, False, False, False, False]


def test_columnar_plan_stays_jvm_side(spark):
    """No shuffle and no Python stage in the columnar plan: a scan +
    project only (whole-stage-codegen-able)."""
    df = spark.range(100).select(
        F.concat(F.lit("https://x/"), F.col("id")).alias("url"),
        F.lit("text").alias("text"))
    cv = ColumnarValidator({"required": ["url"],
                            "properties": {"url": {"pattern": "^https://"},
                                           "text": {"minLength": 1}}})
    plan = cv.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_columnar_unsupported_raises(spark):
    # acyclic local $ref is inlined since r5 and productive recursion
    # unrolls since r6; an EXTERNAL ref still routes to the interpreter
    with pytest.raises(Exception) as ei:
        ColumnarValidator({"properties": {
            "a": {"$ref": "https://example.com/schema.json"}}})
    assert "$ref" in str(ei.value)


def test_validate_table_engine_selection(spark):
    """r6: validate_table picks columnar when the schema lowers and
    falls back to the Arrow interp both at compile time (dynamic ref)
    and at plan-build time (recursion deeper than the unroll) — same
    verdicts either way."""
    from m3spark.sparkval import validate_table

    rec = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": {"node": {
            "type": "object",
            "properties": {"v": {"maximum": 10},
                           "child": {"$ref": "#/$defs/node"}}}},
        "properties": {"t": {"$ref": "#/$defs/node"}},
    }
    shallow = spark.createDataFrame(
        [({"v": 5, "child": {"v": 20}},), ({"v": 5, "child": {"v": 3}},),
         (None,)],
        "t struct<v:int,child:struct<v:int>>")
    out = validate_table(shallow, rec)
    assert [r["valid"] for r in out.collect()] == [False, True, True]
    # shallow: pure JVM, no Python stages
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and plan.count("Python") == 0

    deep_ddl = "struct<v:int>"
    for _ in range(10):
        deep_ddl = f"struct<v:int,child:{deep_ddl}>"
    deep = spark.createDataFrame(
        [({"v": 20, "child": None},), ({"v": 1, "child": None},)],
        f"t {deep_ddl}")
    out2 = validate_table(deep, rec)
    assert [r["valid"] for r in out2.collect()] == [False, True]
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan2  # interp fallback route

    dyn = {"$schema": "https://json-schema.org/draft/2020-12/schema",
           "$defs": {"x": {"$dynamicAnchor": "it", "type": "string"}},
           "properties": {"a": {"$dynamicRef": "#it"}}}
    df = spark.createDataFrame([("ok",), (None,)], "a string")
    out3 = validate_table(df, dyn)
    assert [r["valid"] for r in out3.collect()] == [True, True]
