"""Remote schema loading (uri_dirs) and the `$format:` pattern extension
— reference validate.cljc:237-258 and property.cljc:705-710."""

from __future__ import annotations

import json

import pytest

from m3spark.schema import compile_schema
from m3spark.schema.core import SchemaError


@pytest.fixture()
def schema_dir(tmp_path):
    d = tmp_path / "schemas"
    (d / "defs").mkdir(parents=True)
    (d / "defs" / "name.json").write_text(json.dumps(
        {"type": "string", "minLength": 1}))
    (d / "defs" / "person.json").write_text(json.dumps(
        {"type": "object",
         "properties": {"name": {"$ref": "name.json"},
                        "age": {"type": "integer"}},
         "$id": "https://example.com/defs/person.json",
         "required": ["name"]}))
    return str(d)


def test_uri_dirs_loads_remote_schema(schema_dir):
    cs = compile_schema({"$ref": "https://example.com/defs/name.json"},
                        uri_dirs={"https://example.com": schema_dir})
    assert cs.validate("Alice").valid
    assert not cs.validate("").valid
    assert not cs.validate(42).valid


def test_uri_dirs_appends_json_suffix(schema_dir):
    # reference appends '.json' when the path lacks it
    cs = compile_schema({"$ref": "https://example.com/defs/name"},
                        uri_dirs={"https://example.com": schema_dir})
    assert cs.validate("x").valid and not cs.validate("").valid


def test_uri_dirs_nested_relative_ref(schema_dir):
    # person.json $refs name.json relative to its own $id
    cs = compile_schema({"$ref": "https://example.com/defs/person.json"},
                        uri_dirs={"https://example.com": schema_dir})
    assert cs.validate({"name": "A", "age": 3}).valid
    assert not cs.validate({"name": ""}).valid
    assert not cs.validate({"age": 3}).valid


def test_uri_dirs_missing_file_still_errors(schema_dir):
    with pytest.raises(SchemaError):
        compile_schema({"$ref": "https://example.com/defs/nope.json"},
                       uri_dirs={"https://example.com": schema_dir})


def test_ref_to_draft_meta_schema_validates():
    # $ref to a standard meta-schema resolves to the vendored copy
    cs = compile_schema({"$ref":
                         "http://json-schema.org/draft-07/schema#"},
                        draft="draft7")
    assert cs.validate({"type": "string"}).valid
    assert not cs.validate({"type": 5}).valid


# ------------------------------------------------------ $format: extension


def test_format_extension_in_pattern():
    cs = compile_schema({"pattern": "$format:ipv4"}, meta_validate=False)
    assert cs.validate("1.2.3.4").valid
    assert not cs.validate("999.1.1.1").valid
    assert cs.validate(123).valid  # non-strings ignored as usual


def test_format_extension_in_pattern_properties():
    cs = compile_schema(
        {"patternProperties": {"$format:ipv4": {"type": "integer"}}},
        meta_validate=False)
    assert cs.validate({"1.2.3.4": 1, "not-an-ip": "anything"}).valid
    assert not cs.validate({"1.2.3.4": "not-int"}).valid


def test_format_extension_with_additional_properties():
    cs = compile_schema(
        {"patternProperties": {"$format:uuid": True},
         "additionalProperties": False},
        meta_validate=False)
    assert cs.validate(
        {"123e4567-e89b-12d3-a456-426614174000": "x"}).valid
    assert not cs.validate({"plain": "x"}).valid


def test_format_extension_columnar(spark):
    from m3spark.columnar import ColumnarValidator
    df = spark.createDataFrame([("1.2.3.4",), ("999.1.1.1",)], "x string")
    cv = ColumnarValidator({"properties": {"x": {"pattern": "$format:ipv4"}}},
                           format_assertion=True)
    got = {r["x"]: r["valid"] for r in cv.apply(df).collect()}
    assert got["1.2.3.4"] is True and got["999.1.1.1"] is False
