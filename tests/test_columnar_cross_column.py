"""Root-level cross-column applicators in the columnar engine
(if/then/else, anyOf/oneOf/not, dependentRequired over table columns) —
must agree with the interpreter row-for-row."""

from __future__ import annotations

import json

from m3spark.columnar import ColumnarValidator
from m3spark.sparkval import validate_json

SCHEMA = {
    "type": "object",
    "properties": {
        "lang": {"enum": ["en", "zh"]},
        "text": {"type": "string"},
        "score": {"type": "number"},
        "reviewer": {"type": "string"},
    },
    # conditional: zh docs need longer text
    "if": {"properties": {"lang": {"const": "zh"}}, "required": ["lang"]},
    "then": {"properties": {"text": {"minLength": 6}}},
    "else": {"properties": {"text": {"minLength": 2}}},
    # a reviewed row must carry a score
    "dependentRequired": {"reviewer": ["score"]},
    # cross-column alternative: either high score or a reviewer present
    "anyOf": [
        {"properties": {"score": {"minimum": 8}}, "required": ["score"]},
        {"required": ["reviewer"]},
    ],
}

ROWS = [
    ("en", "hello", 9.0, None),        # valid (else-branch, anyOf via score)
    ("zh", "short", 9.0, None),        # then-branch minLength 6 fails
    ("zh", "long enough", 9.0, None),  # valid
    ("en", "h", 9.0, None),            # else-branch minLength 2 fails
    ("en", "hello", 2.0, None),        # anyOf fails (low score, no reviewer)
    ("en", "hello", None, "bob"),      # dependentRequired fails
    ("en", "hello", 3.0, "bob"),       # valid via reviewer
]


def test_cross_column_matches_interpreter(spark):
    df = spark.createDataFrame(
        ROWS, "lang string, text string, score double, reviewer string")
    cv = ColumnarValidator(SCHEMA, format_assertion=True)
    got_col = [r["valid"] for r in cv.apply(df).select("valid").collect()]

    docs = []
    for lang, text, score, reviewer in ROWS:
        d = {k: v for k, v in zip(("lang", "text", "score", "reviewer"),
                                  (lang, text, score, reviewer))
             if v is not None}
        docs.append(json.dumps(d))
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"),
        SCHEMA, format_assertion=True)
    got_interp = [r["valid"] for r in out.select("valid").collect()]

    expected = [True, False, True, False, False, False, True]
    assert got_col == got_interp == expected


def test_root_allof_flattens(spark):
    df = spark.createDataFrame([(5,), (15,), (None,)], "x int")
    cv = ColumnarValidator({
        "allOf": [{"properties": {"x": {"minimum": 1}}},
                  {"properties": {"x": {"maximum": 10}}}]})
    rows = cv.apply(df).collect()
    assert [r["valid"] for r in rows] == [True, False, True]
    (bad,) = [r for r in rows if not r["valid"]]
    assert bad["violations"][0]["schema_path"] == \
        "/allOf/1/properties/x/maximum"


def test_root_oneof_and_not(spark):
    df = spark.createDataFrame(
        [(1, None), (None, "y"), (1, "y"), (None, None)],
        "a int, b string")
    cv = ColumnarValidator({
        "oneOf": [{"required": ["a"]}, {"required": ["b"]}],
        "not": {"required": ["a", "b"]}})
    got = [r["valid"] for r in cv.apply(df).collect()]
    # one of a/b present: ok; both: oneOf+not fail; neither: oneOf fails
    assert got == [True, True, False, False]


def test_root_dependencies_draft7_parity(spark):
    """Pre-2019 `dependencies` at root: array form (required keys) and
    schema form, columnar vs interp; ignored as unknown in 2019+."""
    from m3spark.schema.core import compile_schema

    D7 = "http://json-schema.org/draft-07/schema#"
    D20 = "https://json-schema.org/draft/2020-12/schema"
    schema = {"$schema": D7,
              "dependencies": {
                  "a": ["b"],
                  "c": {"properties": {"b": {"minLength": 2}},
                        "required": ["b"]}}}
    cv = ColumnarValidator(schema)
    docs = [
        (None, None, None), ("x", None, None), ("x", "yy", None),
        (None, None, "z"), (None, "yy", "z"), (None, "y", "z"),
        ("x", "yy", "z"),
    ]
    df = spark.createDataFrame(docs, "a string, b string, c string")
    got = cv.apply(df).collect()
    cs = compile_schema(schema)
    for (a, b, c), r in zip(docs, got):
        doc = {k: v for k, v in (("a", a), ("b", b), ("c", c))
               if v is not None}
        assert bool(r["valid"]) == cs.validate(doc).valid, (doc, r)

    # 2019+: dependencies is an unknown annotation in both engines
    schema20 = dict(schema, **{"$schema": D20})
    cv20 = ColumnarValidator(schema20)
    cs20 = compile_schema(schema20)
    r = cv20.apply(spark.createDataFrame([("x", None, None)],
                                         "a string, b string, c string")
                   ).collect()[0]
    assert bool(r["valid"]) and cs20.validate({"a": "x"}).valid
