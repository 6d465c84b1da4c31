"""Ports of the reference's own unit tests (m3, Clojure) to this engine.

Source files (cited per test):
- /root/reference/test/cljc/m3/json_schema_test.cljc (API + warnings)
- /root/reference/test/cljc/m3/ref_test.cljc (definition-key regressions)
- /root/reference/test/cljc/m3/format_test.cljc (draft-03 no-op formats,
  pattern regressions)

These are pure-Python interpreter tests (no Spark session needed), so
they run in milliseconds and guard the same regressions the reference's
suite guards.
"""

from __future__ import annotations

import json

import pytest

from m3spark.schema import compile_schema, validate
from m3spark.schema.core import SchemaError  # noqa: F401  (API surface)

D20 = "draft2020-12"


# --------------------------------------------------------- json_schema_test


def test_latest_draft_behaves_like_2020_12():
    # json_schema_test.cljc:21-32 (:latest == :draft2020-12)
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name"]}
    valid_doc = {"name": "Alice", "age": 30}
    invalid_doc = {"age": "not a number"}
    for doc in (valid_doc, invalid_doc):
        r_latest = validate(schema, doc)  # default draft == latest
        r_2020 = validate(schema, doc, draft=D20)
        assert r_latest.valid == r_2020.valid
        assert [(e.keyword, e.doc_path) for e in r_latest.errors] == \
               [(e.keyword, e.doc_path) for e in r_2020.errors]


def test_compiled_validator_reuse():
    # json_schema_test.cljc:34-41 (compile once, validate many)
    v = compile_schema({"type": "string", "minLength": 1})
    assert v.validate("hello").valid
    assert not v.validate("").valid
    assert v.validate("hello").valid  # unchanged on reuse


def test_validate_defaults():
    # json_schema_test.cljc:46-49
    assert validate({"type": "string"}, "hello").valid
    assert not validate({"type": "string"}, 42).valid


def test_validate_json_string_schema():
    # json_schema_test.cljc:54-59 (schema and document as JSON strings)
    assert validate('{"type":"string"}', json.loads('"hello"')).valid
    assert not validate('{"type":"number"}', json.loads('"oops"')).valid


@pytest.mark.parametrize("draft", [
    "draft3", "draft4", "draft6", "draft7", "draft2019-09",
    "draft2020-12", "draft-next",
])
def test_validate_all_drafts(draft):
    # json_schema_test.cljc:64-68
    assert validate({"type": "string"}, "hello", draft=draft).valid


def test_format_annotation_default_2020():
    # json_schema_test.cljc:73-77
    assert validate({"type": "string", "format": "email"},
                    "not-an-email").valid
    assert validate({"type": "integer"}, 1.0).valid


def test_error_shape_carries_value():
    # json_schema_test.cljc:82-91 (errors contain schema-path, message,
    # document) — the `document` analog here is Violation.value
    r = validate({"type": "string"}, 42)
    assert not r.valid and r.errors
    e = r.errors[0]
    assert e.schema_path is not None
    assert isinstance(e.message, str)
    assert e.value == "42"


def test_validator_minimum():
    # json_schema_test.cljc:96-101
    v = compile_schema({"type": "integer", "minimum": 0})
    assert v.validate(42).valid
    assert not v.validate(-1).valid
    assert not v.validate("hello").valid


def test_malformed_schemas_no_crash():
    # json_schema_test.cljc:106-130 (corpus stress-test regressions)
    r = validate({"$schema": "http://json-schema.org/draft-03/schema",
                  "type": "object", "required": True,
                  "properties": {"name": {"type": "string",
                                          "required": True}}},
                 {"name": "test"})
    assert r is not None
    r = validate({"$schema": "http://json-schema.org/draft-04/schema#",
                  "properties": {"id": {"type": "string", "id": True}}},
                 {"id": "test"})
    assert r is not None
    r = validate({"$schema": "http://json-schema.org/draft-04/schema#",
                  "type": "object",
                  "properties": {"x": {"type": "object",
                                       "properties": {
                                           "$ref": "#/definitions/Foo"}}}},
                 {})
    assert r is not None
    r = validate({"$schema": "http://json-schema.org/draft-04/schema#",
                  "type": "object",
                  "properties": {"x": "not-a-schema"}},
                 {})
    assert r is not None


def test_recursive_ref_in_allof_no_stackoverflow():
    # json_schema_test.cljc:135-147 (reference issue #49)
    schema = {"allOf": [{"$ref": "#"}],
              "properties": {"name": {"type": "string"}},
              "type": "object"}
    r = validate(schema, {"name": "Alice"})
    assert not r.valid and r.errors  # cycle -> error, not crash

    schema = {"type": "object", "properties": {"child": {"$ref": "#"}}}
    assert validate(schema, {"child": {"child": {}}}).valid
    assert not validate(schema, {"child": "not-object"}).valid


def test_registry_option():
    # json_schema_test.cljc:152-163
    schema = {"$ref": "http://example.com/defs/name"}
    registry = {"http://example.com/defs/name":
                {"type": "string", "minLength": 1}}
    assert validate(schema, "Alice", registry=registry).valid
    assert not validate(schema, "", registry=registry).valid
    assert not validate(schema, 42, registry=registry).valid
    v = compile_schema({"$ref": "http://example.com/int"},
                       registry={"http://example.com/int":
                                 {"type": "integer"}})
    assert v.validate(42).valid
    assert not v.validate("hello").valid


def test_validator_json_string_schema():
    # json_schema_test.cljc:168-172
    v = compile_schema('{"type":"string","minLength":1}')
    assert v.validate("hello").valid
    assert not v.validate("").valid


# ------------------------------------------------------- warnings (#52)


def test_warning_format_annotation_shape():
    # json_schema_test.cljc:177-193
    r = validate({"type": "string", "format": "email"}, "not-an-email")
    assert r.valid
    assert not r.errors
    assert r.warnings
    w = r.warnings[0]
    assert w.schema_path and w.doc_path is not None
    assert isinstance(w.message, str)
    assert w.value == "not-an-email"  # :document analog
    r = validate({"type": "string", "format": "email"}, "alice@example.com")
    assert r.valid and not r.warnings


def test_warning_deprecated_persists():
    # json_schema_test.cljc:195-210
    v = compile_schema({"type": "string", "deprecated": True})
    r1, r2 = v.validate("hello"), v.validate("world")
    for r in (r1, r2):
        assert r.valid and r.warnings
        w = r.warnings[0]
        assert w.schema_path is not None and isinstance(w.message, str)


def test_warning_unknown_format():
    # json_schema_test.cljc:212-220
    r = validate({"type": "string", "format": "foobar"}, "hello")
    assert r.valid and r.warnings
    assert r.warnings[0].schema_path is not None


def test_warnings_absent_when_clean():
    # json_schema_test.cljc:222-230
    r = validate({"type": "string"}, "hello")
    assert r.valid and not r.warnings
    r = validate({"type": "string"}, 42)
    assert not r.valid and not r.warnings


def test_warning_content_annotation():
    # json_schema_test.cljc:232-240 (contentEncoding non-strict)
    r = validate({"type": "string", "contentEncoding": "base64"}, "!!!")
    assert r.valid and r.warnings
    assert isinstance(r.warnings[0].message, str)


def test_info_comment_persists():
    # json_schema_test.cljc:242-259
    v = compile_schema({"type": "string", "$comment": "this is a note"})
    for doc in ("hello", "world"):
        r = v.validate(doc)
        assert r.valid and not r.warnings and r.infos
        assert "this is a note" in r.infos[0].message
    assert not validate({"type": "string"}, "hello").infos


def test_warnings_with_errors_and_draft7_assertion():
    # json_schema_test.cljc:261-272
    r = validate({"type": "string", "format": "email", "minLength": 100},
                 "not-an-email")
    assert not r.valid and r.errors and r.warnings
    r = validate({"type": "string", "format": "email"}, "not-an-email",
                 draft="draft7")
    assert not r.valid and r.errors and not r.warnings


def test_warnings_same_shape_as_errors():
    # json_schema_test.cljc:274-282
    w = validate({"type": "string", "format": "email"},
                 "not-an-email").warnings[0]
    e = validate({"type": "string"}, 42).errors[0]
    assert set(type(w).__dataclass_fields__) == \
           set(type(e).__dataclass_fields__)


# ------------------------------------------------------------- ref_test


def test_non_numeric_definition_keys():
    # ref_test.cljc:66-86 (hex hashes / version strings as definition keys)
    assert validate(
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "definitions": {"9bffe": {"type": "object",
                                   "properties": {"name":
                                                  {"type": "string"}}}},
         "$ref": "#/definitions/9bffe"},
        {"name": "test"}).valid
    assert validate(
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "definitions": {"1.0": {"type": "object",
                                 "properties": {"v": {"type": "string"}}}},
         "$ref": "#/definitions/1.0"},
        {"v": "hello"}).valid
    assert not validate(
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "definitions": {"9bffe": {"type": "string"}},
         "$ref": "#/definitions/9bffe"},
        42).valid


def test_digit_prefixed_definition_keys():
    # ref_test.cljc:49-60 (->int-or-string regression: "0ea16", "1edb")
    for key in ("0ea16", "1edb", "42x"):
        assert validate(
            {"$schema": "http://json-schema.org/draft-07/schema#",
             "definitions": {key: {"type": "integer"}},
             "$ref": f"#/definitions/{key}"},
            7).valid


# ----------------------------------------------------------- format_test


def test_draft3_noop_formats():
    # format_test.cljc:41-72 (style / phone / utc-millisec never assert)
    for fmt, good, bad in (("style", "color: red;", "not-really-css"),
                           ("phone", "+1-555-555-5555", "not-a-phone"),
                           ("utc-millisec", "1234567890123", "nope")):
        for doc in (good, bad):
            assert validate({"format": fmt}, doc, draft="draft3",
                            format_assertion=True).valid


def test_email_pattern_edges():
    # format_test.cljc:79-89
    from m3spark.schema.formats import check_email
    assert check_email("a@b.com") and check_email("x@example.org")
    assert not check_email(".a@b.com")
    assert not check_email("a.@b.com")
    assert not check_email("a..b@c.com")
    assert check_email("joe.bloggs@example.com")
    assert check_email("te~st@example.com")


def test_ipv6_case_and_shapes():
    # format_test.cljc:91-105
    from m3spark.schema.formats import check_ipv6
    for ok in ("::ABEF", "FE80::1", "2001:DB8::FF00:42:8329",
               "2001:db8::Ff00:42:8329", "::1", "::", "1:2:3:4:5:6:7:8"):
        assert check_ipv6(ok), ok
    for bad in ("12345::", "::laptop", "1::2::3"):
        assert not check_ipv6(bad), bad


def test_ipv4_edges():
    # format_test.cljc:107-117
    from m3spark.schema.formats import check_ipv4
    for ok in ("192.168.1.1", "0.0.0.0", "255.255.255.255"):
        assert check_ipv4(ok)
    for bad in ("256.0.0.0", "192.168.1.999", "192.168.1", "192.168.1.1.1"):
        assert not check_ipv4(bad)


def test_hostname_edges():
    # format_test.cljc:119-127
    from m3spark.schema.formats import check_hostname
    for ok in ("example.com", "sub.example.com", "a", "my-host.example.com"):
        assert check_hostname(ok)
    for bad in ("-starts-with-hyphen", "ends-with-hyphen-"):
        assert not check_hostname(bad)


def test_json_pointer_edges():
    # format_test.cljc:129-139
    from m3spark.schema.formats import check_json_pointer
    for ok in ("", "/foo", "/foo/bar", "/foo/0", "/~0", "/~1"):
        assert check_json_pointer(ok)
    for bad in ("foo", "/foo/bar~"):
        assert not check_json_pointer(bad)


def test_uuid_edges():
    # format_test.cljc:141-147
    from m3spark.schema.formats import check_uuid
    assert check_uuid("2eb8aa08-aa98-11ea-b4aa-73b441d16380")
    assert check_uuid("00000000-0000-0000-0000-000000000000")
    assert not check_uuid("2eb8aa08-aa98-11ea-b4aa-73b441d1638")
    assert not check_uuid("not-a-uuid")
