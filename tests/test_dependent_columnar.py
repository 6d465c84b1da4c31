"""Property-level dependentRequired / dependentSchemas / pre-2019
`dependencies` over struct and map columns, and nested unevaluated*
claim lowering — columnar verdicts must match the Arrow interpreter
(interp: core.py c_dependencies / c_dependent_required /
c_dependent_schemas; reference property.cljc:812-874)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from m3spark.columnar import ColumnarValidator
from m3spark.sparkval import validate_json

D7 = "http://json-schema.org/draft-07/schema#"
D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"

_STRUCT = "obj struct<a: string, b: int, c: string>"
_MAP = T.StructType([T.StructField(
    "obj", T.MapType(T.StringType(), T.StringType()))])

_DOCS = [
    {"a": "x", "b": 1, "c": None},
    {"a": "x", "b": None, "c": None},
    {"a": None, "b": 2, "c": None},
    {"a": "x", "b": 1, "c": "y"},
    {"a": None, "b": None, "c": None},
]


def _parity_struct(spark, schema, expected=None, **kw):
    rows = [((d["a"], d["b"], d["c"]),) for d in _DOCS]
    df = spark.createDataFrame(rows, _STRUCT)
    cv = ColumnarValidator(schema, **kw)
    assert all(getattr(c.build, "_jvm", True) for c in cv.checks)
    got_col = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    docs = [json.dumps({"obj": {k: v for k, v in d.items()
                                if v is not None}}) for d in _DOCS]
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"),
        schema, **kw)
    got_interp = [r["valid"] for r in out.select("valid").collect()]
    assert got_col == got_interp
    if expected is not None:
        assert got_col == expected
    return got_col


def test_dependent_required_struct(spark):
    schema = {"$schema": D2019, "properties": {
        "obj": {"dependentRequired": {"a": ["b"]}}}}
    # a present -> b required
    _parity_struct(spark, schema,
                   [True, False, True, True, True])


def test_dependent_schemas_struct(spark):
    schema = {"$schema": D2019, "properties": {
        "obj": {"dependentSchemas": {
            "a": {"properties": {"b": {"minimum": 2}},
                  "required": ["b"]}}}}}
    # a present -> b >= 2 and present
    _parity_struct(spark, schema,
                   [False, False, True, False, True])


def test_dependencies_draft7_struct(spark):
    schema = {"$schema": D7, "properties": {
        "obj": {"dependencies": {
            "a": ["b"],
            "c": {"properties": {"b": {"maximum": 0}}}}}}}
    # a -> b present; c present -> b <= 0
    _parity_struct(spark, schema,
                   [True, False, True, False, True])


def test_dependencies_ignored_in_2019(spark):
    # `dependencies` is not a 2019-09 keyword: both engines ignore it
    schema = {"$schema": D2019, "properties": {
        "obj": {"dependencies": {"a": ["b"]}}}}
    _parity_struct(spark, schema, [True] * 5)


def test_dependent_required_map(spark):
    schema = {"$schema": D2019, "properties": {
        "obj": {"dependentRequired": {"k1": ["k2"]}}}}
    rows = [({"k1": "v"},), ({"k1": "v", "k2": "w"},), ({"k3": "z"},),
            (None,)]
    df = spark.createDataFrame(rows, _MAP)
    cv = ColumnarValidator(schema)
    got = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    assert got == [False, True, True, True]

    docs = [json.dumps({"obj": m}) if m is not None else json.dumps({})
            for (m,) in rows]
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"), schema)
    assert [r["valid"] for r in out.select("valid").collect()] == got


def test_dependent_schemas_map(spark):
    schema = {"$schema": D2019, "properties": {
        "obj": {"dependentSchemas": {
            "k1": {"properties": {"k2": {"minLength": 2}},
                   "required": ["k2"]}}}}}
    rows = [({"k1": "v", "k2": "ww"},), ({"k1": "v", "k2": "w"},),
            ({"k1": "v"},), ({"k2": "w"},)]
    df = spark.createDataFrame(rows, _MAP)
    cv = ColumnarValidator(schema)
    got = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    assert got == [True, False, False, True]

    docs = [json.dumps({"obj": m}) for (m,) in rows]
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"), schema)
    assert [r["valid"] for r in out.select("valid").collect()] == got


def test_dependent_schemas_claims_unevaluated(spark):
    """dependentSchemas claims feed unevaluatedProperties: the dependent
    schema's properties are evaluated when it triggers and succeeds."""
    schema = {"$schema": D2019, "properties": {
        "obj": {"properties": {"a": {}},
                "dependentSchemas": {"a": {"properties": {"b": {}}}},
                "unevaluatedProperties": False}}}
    # a triggers dep -> b claimed -> valid; without a, b unevaluated
    _parity_struct(spark, schema,
                   [True, True, False, False, True])
    # (doc3 has c which nothing claims; doc2 has b unclaimed w/o dep?
    #  doc2 = {b:2}: 'a' absent -> dep not triggered -> b unclaimed)


def test_nested_unevaluated_claims_all(spark):
    """A branch carrying its own unevaluatedProperties claims every key
    on success (it evaluated them all itself)."""
    schema = {"$schema": D2020, "properties": {
        "obj": {"anyOf": [{"properties": {"a": {"minLength": 1}},
                           "required": ["a"],
                           "unevaluatedProperties": {"type": ["integer",
                                                             "string"]}}],
                "unevaluatedProperties": False}}}
    # branch succeeds (a present, others int/string) -> claims ALL keys
    # -> outer uP never fires; branch fails only when a missing
    _parity_struct(spark, schema,
                   [True, True, False, True, False])


def test_nested_unevaluated_items_claims_all(spark):
    schema = {"$schema": D2020, "properties": {
        "arr": {"allOf": [{"prefixItems": [{"type": "integer"}],
                           "unevaluatedItems": {"maximum": 10}}],
                "unevaluatedItems": False}}}
    df = spark.createDataFrame(
        [([1, 2],), ([1, 99],)],
        T.StructType([T.StructField(
            "arr", T.ArrayType(T.IntegerType()))]))
    cv = ColumnarValidator(schema)
    got = [r["valid"] for r in cv.apply(df).select("valid").collect()]

    docs = [json.dumps({"arr": [1, 2]}), json.dumps({"arr": [1, 99]})]
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"), schema)
    got_i = [r["valid"] for r in out.select("valid").collect()]
    # inner branch: item 99 fails nested unevaluatedItems(max 10) ->
    # allOf fails -> invalid; [1,2]: branch ok, claims all -> valid
    assert got == got_i == [True, False]


def test_root_pattern_properties_flat(spark):
    schema = {"patternProperties": {"^x_": {"type": "string",
                                            "minLength": 2}}}
    df = spark.createDataFrame(
        [("ab", 1), ("a", 1), (None, 1)], "x_a string, other int")
    cv = ColumnarValidator(schema)
    got = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    assert got == [True, False, True]


def test_root_property_names_and_counts(spark):
    schema = {"propertyNames": {"pattern": "^[a-z]+$"},
              "minProperties": 1, "maxProperties": 2}
    df = spark.createDataFrame(
        [("v", "w", None), (None, None, None), ("v", "w", "z")],
        "ab string, cd string, Bad9 string")
    cv = ColumnarValidator(schema)
    got = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    # row1: names ok, 2 props; row2: 0 props < minProperties;
    # row3: Bad9 violates propertyNames AND 3 > maxProperties
    assert got == [True, False, False]


DNEXT = "draft-next"


def test_draft3_extends_columnar(spark):
    """draft-3 extends is conjunctive — lowered like allOf at root and
    property level (r5)."""
    schema = {"properties": {
        "obj": {"minimum": 1, "extends": [{"maximum": 5},
                                          {"divisibleBy": 2}]}}}
    df = spark.createDataFrame([(2.0,), (4.0,), (3.0,), (0.0,), (6.0,)],
                               "obj double")
    cv = ColumnarValidator(schema, draft="draft3")
    assert all(getattr(c.build, "_jvm", True) for c in cv.checks)
    got = [r["valid"] for r in cv.apply(df).collect()]
    assert got == [True, True, False, False, False]

    # root-level extends over the flat table
    root = {"properties": {"a": {"minimum": 1}},
            "extends": {"properties": {"a": {"maximum": 5}}}}
    df2 = spark.createDataFrame([(3.0,), (9.0,), (0.0,)], "a double")
    cv2 = ColumnarValidator(root, draft="draft3")
    got2 = [r["valid"] for r in cv2.apply(df2).collect()]
    assert got2 == [True, False, False]

    # any other draft ignores extends entirely (unknown keyword)
    cv3 = ColumnarValidator(schema, draft="draft7")
    got3 = [r["valid"] for r in cv3.apply(df).collect()]
    assert got3 == [True, True, True, False, True]  # only minimum binds


def test_property_dependencies_draft_next(spark):
    """draft-next propertyDependencies over struct columns and the flat
    root table, including its claims feeding unevaluatedProperties."""
    import json

    from m3spark.sparkval import validate_json

    schema = {"$schema":
              "https://json-schema.org/draft/next/schema",
              "properties": {"obj": {
                  "propertyDependencies": {
                      "kind": {"file": {"required": ["path"]},
                               "url": {"required": ["href"]}}}}}}
    rows = [(("file", "/x", None),), (("file", None, None),),
            (("url", None, "http://x"),), (("other", None, None),),
            ((None, None, None),)]
    df = spark.createDataFrame(
        rows, "obj struct<kind: string, path: string, href: string>")
    cv = ColumnarValidator(schema)
    assert all(getattr(c.build, "_jvm", True) for c in cv.checks)
    got = [r["valid"] for r in cv.apply(df).collect()]
    docs = [json.dumps({"obj": {k: v for k, v in
                                zip(("kind", "path", "href"), r[0])
                                if v is not None}}) for r in rows]
    interp = [r["valid"] for r in validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"),
        schema).collect()]
    assert got == interp == [True, False, True, True, True]

    # root-level + claims: triggered-and-successful dependent schema
    # claims its properties for unevaluatedProperties
    root = {"$schema": "https://json-schema.org/draft/next/schema",
            "properties": {"kind": {}},
            "propertyDependencies": {
                "kind": {"file": {"properties": {"path": {}}}}},
            "unevaluatedProperties": False}
    df2 = spark.createDataFrame(
        [("file", "/x"), ("url", "/x"), ("file", None)],
        "kind string, path string")
    cv2 = ColumnarValidator(root)
    got2 = [r["valid"] for r in cv2.apply(df2).collect()]
    docs2 = [json.dumps({k: v for k, v in zip(("kind", "path"), r)
                         if v is not None})
             for r in [("file", "/x"), ("url", "/x"), ("file", None)]]
    interp2 = [r["valid"] for r in validate_json(
        spark.createDataFrame([(x,) for x in docs2], "doc string"),
        root).collect()]
    # kind=file claims path; kind=url leaves path unevaluated
    assert got2 == interp2 == [True, False, True]
