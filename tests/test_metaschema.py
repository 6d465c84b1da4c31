"""validate-m2 (meta-schema validation of the schema itself) and
$vocabulary dialect selection — reference validate.cljc:354-403 and
vocabulary.cljc:131-139/588-597."""

from __future__ import annotations

import pytest

from m3spark.schema import compile_schema
from m3spark.schema.core import SchemaError

V20 = "https://json-schema.org/draft/2020-12/vocab/"


# ---------------------------------------------------------- validate-m2

META_INVALID = [
    ("type not a type name", {"type": 5}),
    ("type unknown name", {"type": "integerz"}),
    ("minLength negative", {"minLength": -1}),
    ("minLength not a number", {"minLength": "3"}),
    ("required not an array", {"required": "a"}),
    ("required entry not a string", {"required": [1]}),
    ("properties value not a schema", {"properties": {"x": "s"}}),
    ("multipleOf zero", {"multipleOf": 0}),
    ("multipleOf negative", {"multipleOf": -2}),
    ("enum not an array", {"enum": "abc"}),
    ("allOf not an array", {"allOf": {"type": "string"}}),
    ("allOf empty", {"allOf": []}),
    ("pattern not a string", {"pattern": 5}),
    ("maxItems not an integer", {"maxItems": 2.5}),
    ("$vocabulary value not boolean",
     {"$vocabulary": {"https://x": "yes"}}),
]


@pytest.mark.parametrize("desc,schema", META_INVALID,
                         ids=[d for d, _ in META_INVALID])
def test_meta_invalid_schema_rejects_all_documents(desc, schema):
    cs = compile_schema(schema)  # meta_validate defaults on
    r = cs.validate({"anything": 1})
    assert not r.valid
    assert any(e.keyword == "$schema" for e in r.errors), r.errors
    # same for any other document (reference: `constantly r`)
    assert not cs.validate(42).valid


META_VALID = [
    ("typical object schema",
     {"type": "object", "properties": {"a": {"type": "integer"}},
      "required": ["a"], "additionalProperties": False}),
    ("boolean subschemas", {"properties": {"a": True, "b": False}}),
    ("conditionals", {"if": {"type": "integer"}, "then": {"minimum": 0},
                      "else": {"maxLength": 3}}),
    ("refs and defs", {"$defs": {"s": {"type": "string"}},
                       "$ref": "#/$defs/s"}),
    ("numeric keywords", {"minimum": 0, "exclusiveMaximum": 10,
                          "multipleOf": 0.5}),
]


@pytest.mark.parametrize("desc,schema", META_VALID,
                         ids=[d for d, _ in META_VALID])
def test_meta_valid_schema_unchanged(desc, schema):
    cs = compile_schema(schema)
    assert cs._meta_errors is None


def test_meta_validate_opt_out():
    cs = compile_schema({"minLength": "3"}, meta_validate=False)
    # lenient compile: keyword is ignored rather than meta-rejected
    assert cs.validate("ab").valid


def test_draft4_dependency_rule():
    # exclusiveMinimum requires minimum in draft-4's meta-schema
    cs = compile_schema({"exclusiveMinimum": True}, draft="draft4")
    assert not cs.validate(0).valid
    cs2 = compile_schema({"minimum": 5, "exclusiveMinimum": True},
                         draft="draft4")
    assert cs2._meta_errors is None and not cs2.validate(5).valid


def test_draft7_format_assertion_in_meta():
    # draft-7 meta asserts format: regex on pattern; an ECMA-invalid
    # pattern makes the schema itself invalid (2020-12 treats format as
    # annotation, so the same schema passes meta there)
    bad7 = compile_schema({"pattern": "("}, draft="draft7")
    assert not bad7.validate("x").valid
    ok20 = compile_schema({"pattern": "("}, draft="draft2020-12")
    assert ok20._meta_errors is None


def test_flagship_schemas_meta_valid():
    from m3spark.pages import PAGES_SCHEMA
    assert compile_schema(PAGES_SCHEMA)._meta_errors is None


def test_columnar_meta_validation_parity(spark):
    """The columnar engine rejects the same meta-invalid schemas: every
    row flagged with the $schema meta-error (never silently-lenient
    compiled checks)."""
    from m3spark.columnar import ColumnarValidator
    df = spark.createDataFrame([(1,), (2,)], "x int")
    cv = ColumnarValidator({"properties": {"x": {"minLength": "3"}}})
    rows = cv.apply(df).collect()
    assert all(not r["valid"] for r in rows)
    assert rows[0]["violations"][0]["keyword"] == "$schema"
    # valid schema unaffected
    cv2 = ColumnarValidator({"properties": {"x": {"minimum": 2}}})
    got = [r["valid"] for r in cv2.apply(df).orderBy("x").collect()]
    assert got == [False, True]


# ----------------------------------------------------------- $vocabulary

def _registry_with_meta(vocab):
    meta_uri = "https://example.com/meta/custom"
    return meta_uri, {meta_uri: {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": meta_uri,
        "$vocabulary": vocab,
        "$dynamicAnchor": "meta",
        "type": ["object", "boolean"],
    }}


def test_vocabulary_restricts_keywords():
    # dialect with core+validation only: applicator keywords are inert
    meta_uri, registry = _registry_with_meta({
        V20 + "core": True, V20 + "validation": True})
    schema = {"$schema": meta_uri,
              "properties": {"a": {"type": "string"}},
              "minimum": 5}
    cs = compile_schema(schema, registry=registry)
    assert not cs.validate(3).valid          # validation vocab active
    assert cs.validate({"a": 1}).valid       # applicator vocab inert


def test_vocabulary_unknown_required_rejected():
    meta_uri, registry = _registry_with_meta({
        V20 + "core": True, "https://example.com/vocab/unknown": True})
    with pytest.raises(SchemaError):
        compile_schema({"$schema": meta_uri, "type": "integer"},
                       registry=registry)


def test_vocabulary_unknown_optional_ignored():
    meta_uri, registry = _registry_with_meta({
        V20 + "core": True, V20 + "validation": True,
        "https://example.com/vocab/unknown": False})
    cs = compile_schema({"$schema": meta_uri, "type": "integer"},
                        registry=registry)
    assert cs.validate(1).valid and not cs.validate("x").valid


def test_vocabulary_format_assertion():
    meta_uri, registry = _registry_with_meta({
        V20 + "core": True, V20 + "validation": True,
        V20 + "format-assertion": True})
    cs = compile_schema({"$schema": meta_uri, "format": "ipv4"},
                        registry=registry)
    assert cs.validate("1.2.3.4").valid
    assert not cs.validate("999.1.1.1").valid  # asserted, not annotated


def test_vocabulary_format_annotation_default():
    meta_uri, registry = _registry_with_meta({
        V20 + "core": True, V20 + "validation": True,
        V20 + "format-annotation": True})
    cs = compile_schema({"$schema": meta_uri, "format": "ipv4"},
                        registry=registry)
    r = cs.validate("999.1.1.1")
    assert r.valid and r.warnings
