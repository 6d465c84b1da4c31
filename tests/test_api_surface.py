"""Ports of the reference's json_schema_test.cljc (22 deftests — the
public API surface: draft aliasing, JSON-string schemas, registry,
error/warning/info shapes, malformed-schema robustness, recursive-$ref
regressions) and the SEMANTIC analogs of util_test.cljc (json-=
equality edges, presence sentinel semantics, error construction —
the Clojure-collection helpers themselves have no Python analog; what
they FEED, keyword ordering and equality, is what gets pinned)."""

from __future__ import annotations

import json

import pytest

from m3spark.schema.core import compile_schema, validate

D2020 = "https://json-schema.org/draft/2020-12/schema"
DRAFT_URIS = [
    "http://json-schema.org/draft-03/schema#",
    "http://json-schema.org/draft-04/schema#",
    "http://json-schema.org/draft-06/schema#",
    "http://json-schema.org/draft-07/schema#",
    "https://json-schema.org/draft/2019-09/schema",
    "https://json-schema.org/draft/2020-12/schema",
]


# -- test-latest-draft / test-latest-validator ------------------------------

def test_default_draft_is_2020():
    """No $schema/draft => latest (2020-12) semantics, byte-for-byte the
    same verdicts/errors as the explicit draft
    (json_schema_test.cljc test-latest-draft)."""
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name"]}
    for doc in ({"name": "Alice", "age": 30}, {"age": "not a number"}):
        r_default = validate(schema, doc)
        r_2020 = validate(dict(schema, **{"$schema": D2020}), doc)
        assert r_default.valid == r_2020.valid
        assert [(v.keyword, v.schema_path, v.doc_path)
                for v in r_default.errors] == \
            [(v.keyword, v.schema_path, v.doc_path)
             for v in r_2020.errors]


def test_compiled_validator_latest():
    v = compile_schema({"type": "string", "minLength": 1})
    v20 = compile_schema({"$schema": D2020, "type": "string",
                          "minLength": 1})
    assert v.is_valid("hello") and not v.is_valid("")
    assert v.is_valid("hello") == v20.is_valid("hello")
    assert v.is_valid("") == v20.is_valid("")


# -- test-validate-2-arity / json strings / drafts --------------------------

def test_validate_defaults():
    assert validate({"type": "string"}, "hello").valid
    assert not validate({"type": "string"}, 42).valid


def test_validate_json_string_schema():
    """JSON-string schemas parse before compile
    (test-validate-json-strings; reference json_schema.cljc:131-140)."""
    assert compile_schema('{"type":"string"}').is_valid("hello")
    assert not compile_schema('{"type":"number"}').is_valid("oops")
    assert compile_schema('{"type":"string"}').is_valid(
        json.loads('"hello"'))


def test_validate_every_draft():
    for uri in DRAFT_URIS:
        assert validate({"$schema": uri, "type": "string"},
                        "hello").valid, uri


# -- format annotation default + 1.0-is-integer -----------------------------

def test_format_annotation_only_in_2020():
    r = validate({"$schema": D2020, "type": "string",
                  "format": "email"}, "not-an-email")
    assert r.valid and len(r.warnings) == 1


def test_float_integral_is_integer():
    assert validate({"type": "integer"}, 1.0).valid


# -- test-validate-error-shape (make-error analog) --------------------------

def test_error_shape():
    r = validate({"type": "string"}, 42)
    assert not r.valid and r.errors
    e = r.errors[0]
    for field in ("keyword", "schema_path", "doc_path", "message",
                  "level", "value"):
        assert hasattr(e, field)
    assert isinstance(e.message, str)
    # make-error pins the offending document in the error (stringified
    # here: the violations TABLE column is a string at any type)
    assert e.value == "42"
    assert "42" in e.message or e.value == "42"


# -- test-validator-1-arity --------------------------------------------------

def test_compiled_validator_reuse():
    v = compile_schema({"type": "integer", "minimum": 0})
    assert v.is_valid(42)
    assert not v.is_valid(-1)
    assert not v.is_valid("hello")


# -- test-malformed-schemas-no-crash ----------------------------------------

@pytest.mark.parametrize("schema,doc", [
    ({"$schema": "http://json-schema.org/draft-03/schema",
      "type": "object", "required": True,
      "properties": {"name": {"type": "string", "required": True}}},
     {"name": "test"}),
    ({"$schema": "http://json-schema.org/draft-04/schema#",
      "properties": {"id": {"type": "string", "id": True}}},
     {"id": "test"}),
    ({"$schema": "http://json-schema.org/draft-04/schema#",
      "type": "object",
      "properties": {"x": {"type": "object",
                           "properties": {"$ref": "#/definitions/Foo"}}}},
     {}),
    ({"$schema": "http://json-schema.org/draft-04/schema#",
      "type": "object", "properties": {"x": "not-a-schema"}}, {}),
])
def test_malformed_schemas_no_crash(schema, doc):
    r = validate(schema, doc)
    assert r is not None and isinstance(r.valid, bool)


# -- test-recursive-ref-in-allOf (reference issue #49) ----------------------

def test_recursive_ref_in_allof_no_stackoverflow():
    schema = {"allOf": [{"$ref": "#"}],
              "properties": {"name": {"type": "string"}},
              "type": "object"}
    r = validate(schema, {"name": "Alice"})
    assert not r.valid and r.errors


def test_recursive_ref_in_properties_works():
    schema = {"type": "object",
              "properties": {"child": {"$ref": "#"}}}
    assert validate(schema, {"child": {"child": {}}}).valid
    assert not validate(schema, {"child": "not-object"}).valid


# -- test-registry-option ----------------------------------------------------

def test_registry_option():
    schema = {"$ref": "http://example.com/defs/name"}
    registry = {"http://example.com/defs/name":
                {"type": "string", "minLength": 1}}
    assert validate(schema, "Alice", registry=registry).valid
    assert not validate(schema, "", registry=registry).valid
    assert not validate(schema, 42, registry=registry).valid
    v = compile_schema({"$ref": "http://example.com/int"},
                       registry={"http://example.com/int":
                                 {"type": "integer"}})
    assert v.is_valid(42) and not v.is_valid("hello")


def test_validator_json_string_schema():
    v = compile_schema('{"type":"string","minLength":1}')
    assert v.is_valid("hello") and not v.is_valid("")


# -- warnings system (#52) ---------------------------------------------------

def test_warning_shape_matches_error_shape():
    r = validate({"$schema": D2020, "type": "string",
                  "format": "email"}, "not-an-email")
    assert r.valid and r.warnings and not r.errors
    w = r.warnings[0]
    e = validate({"type": "string"}, 42).errors[0]
    assert type(w) is type(e)  # same record shape
    assert w.level == "warning" and e.level == "error"


def test_valid_format_no_warning():
    r = validate({"$schema": D2020, "type": "string",
                  "format": "email"}, "alice@example.com")
    assert r.valid and not r.warnings


def test_deprecated_warning_persists():
    v = compile_schema({"type": "string", "deprecated": True})
    assert v.validate("hello").warnings
    assert v.validate("world").warnings  # persists across calls


def test_unknown_format_warns_or_passes():
    r = validate({"$schema": D2020, "type": "string",
                  "format": "foobar"}, "hello")
    assert r.valid  # unknown format must not assert


def test_no_warnings_when_clean():
    assert not validate({"type": "string"}, "hello").warnings
    r = validate({"type": "string"}, 42)
    assert not r.valid and not r.warnings


def test_content_annotation_warning():
    r = validate({"$schema": D2020, "type": "string",
                  "contentEncoding": "base64"}, "!!!")
    assert r.valid and r.warnings
    assert r.warnings[0].keyword == "contentEncoding"


def test_comment_info():
    r = validate({"type": "string", "$comment": "this is a note"},
                 "hello")
    assert r.valid and not r.warnings
    assert r.infos and "this is a note" in r.infos[0].message
    v = compile_schema({"type": "string", "$comment": "a note"})
    assert v.validate("hello").infos and v.validate("world").infos
    assert not validate({"type": "string"}, "hello").infos


def test_errors_and_warnings_together():
    r = validate({"$schema": D2020, "type": "string",
                  "format": "email", "minLength": 100}, "not-an-email")
    assert not r.valid and r.errors and r.warnings


def test_draft7_format_is_assertion():
    r = validate({"$schema": "http://json-schema.org/draft-07/schema#",
                  "type": "string", "format": "email"}, "not-an-email")
    assert not r.valid and r.errors and not r.warnings


# -- util_test.cljc semantic analogs ----------------------------------------

def test_json_eq_edges_in_engine():
    """json-= (util.cljc): numeric-kind-blind, boolean-distinct,
    structural — pinned through const/enum/uniqueItems."""
    assert validate({"const": 1}, 1.0).valid
    assert validate({"const": 1.0}, 1).valid
    assert not validate({"const": 1}, True).valid
    assert not validate({"const": 0}, False).valid
    assert not validate({"const": 1}, "1").valid
    assert validate({"const": [1, 2]}, [1.0, 2.0]).valid
    assert validate({"const": {"a": 1}}, {"a": 1.0}).valid
    assert not validate({"uniqueItems": True}, [1, 1.0]).valid
    assert validate({"uniqueItems": True}, [0, False, 1, True]).valid
    assert validate({"const": -0.0}, 0).valid


def test_presence_sentinel_semantics():
    """absent/present (util.cljc): a JSON null VALUE is present; only a
    MISSING key is absent — required distinguishes the two."""
    schema = {"type": "object", "required": ["a"]}
    assert validate(schema, {"a": None}).valid      # null is present
    assert not validate(schema, {}).valid            # missing is absent
    # type: "null" matches the present null, not the absent key
    s2 = {"properties": {"a": {"type": "null"}}}
    assert validate(s2, {"a": None}).valid
    assert validate(s2, {}).valid
    assert not validate(s2, {"a": 0}).valid


def test_keyword_evaluation_order_stable():
    """topo/stable-sort analog: evaluation order is the fixed
    _KEYWORD_ORDER, independent of schema-dict insertion order —
    unevaluatedProperties must run last either way."""
    base = {"$schema": D2020,
            "properties": {"a": {"type": "integer"}},
            "unevaluatedProperties": False}
    reversed_insert = dict(reversed(list(base.items())))
    doc_ok, doc_bad = {"a": 1}, {"a": 1, "b": 2}
    for schema in (base, reversed_insert):
        assert validate(schema, doc_ok).valid
        r = validate(schema, doc_bad)
        assert not r.valid
        assert any("unevaluated" in v.schema_path or
                   v.keyword.startswith("unevaluated")
                   for v in r.errors)
