"""Registry/remote refs, $schema mid-tree switching, degenerate cycles,
custom formats, and a hypothesis fuzz over random JSON values."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from m3spark.schema import SchemaError, compile_schema, validate


def test_registry_remote_ref():
    """User-supplied {uri: schema} registry, the reference's registry
    option (m3: json_schema.cljc:58-100)."""
    registry = {
        "https://remote.example/defs.json": {
            "$defs": {"port": {"type": "integer",
                               "minimum": 1, "maximum": 65535}}},
    }
    cs = compile_schema(
        {"properties": {"p": {
            "$ref": "https://remote.example/defs.json#/$defs/port"}}},
        registry=registry)
    assert cs.is_valid({"p": 8080})
    assert not cs.is_valid({"p": 0})
    assert not cs.is_valid({"p": "http"})


def test_registry_ref_chain_across_resources():
    registry = {
        "https://a.example/s": {"$ref": "https://b.example/s"},
        "https://b.example/s": {"type": "string"},
    }
    cs = compile_schema({"$ref": "https://a.example/s"}, registry=registry)
    assert cs.is_valid("x") and not cs.is_valid(1)


def test_unresolvable_ref_raises():
    with pytest.raises(SchemaError, match="unresolvable"):
        compile_schema({"$ref": "https://nowhere.example/missing"})


def test_schema_switch_mid_tree():
    """$schema switches draft+dialect mid-tree (m3:
    vocabulary.cljc:107-129): draft4 strict integer inside a 2020-12
    root with loose integer."""
    cs = compile_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "properties": {
            "loose": {"type": "integer"},
            "strict": {
                "$schema": "http://json-schema.org/draft-04/schema#",
                "type": "integer"},
        }})
    assert cs.is_valid({"loose": 2.0})
    assert not cs.is_valid({"strict": 2.0})
    assert cs.is_valid({"strict": 2})


def test_degenerate_ref_cycle_fails_cleanly():
    cs = compile_schema({"$ref": "#"})
    r = cs.validate(1)
    assert not r.valid
    assert "recursion" in r.errors[0].message


def test_custom_format_registry():
    """Custom format checkers, the reference's :check-format option
    (m3: json_schema.cljc:119,145)."""
    cs = compile_schema({"format": "even-length"},
                        formats={"even-length": lambda s: len(s) % 2 == 0},
                        format_assertion=True)
    assert cs.is_valid("ab") and not cs.is_valid("abc")


def test_structural_recursion_depth():
    """Recursive schemas descend as deep as the document (no unroll
    limit in the interpreter)."""
    cs = compile_schema({"$id": "https://x/n", "type": ["object", "null"],
                         "properties": {"next": {"$ref": "#"}}})
    doc = None
    for _ in range(200):
        doc = {"next": doc}
    assert cs.is_valid(doc)
    deep_bad = {"next": {"next": {"next": 5}}}
    assert not cs.is_valid(deep_bad)


# ---- fuzz: no input may crash the validator ----

json_values = st.recursive(
    st.none() | st.booleans() | st.integers(-10**18, 10**18)
    | st.floats(allow_nan=False, allow_infinity=False) | st.text(max_size=20),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=8), children, max_size=5),
    max_leaves=25)

FUZZ_SCHEMAS = [
    {"type": "object", "required": ["a"],
     "properties": {"a": {"type": "integer", "minimum": 0}},
     "additionalProperties": {"maxLength": 3}},
    {"anyOf": [{"type": "string", "pattern": "a+"},
               {"type": "array", "items": {"enum": [1, 2, None]},
                "uniqueItems": True}]},
    {"if": {"type": "number"}, "then": {"multipleOf": 0.5},
     "else": {"minProperties": 1}},
    {"$defs": {"n": {"type": ["integer", "object"],
                     "properties": {"k": {"$ref": "#/$defs/n"}},
                     "unevaluatedProperties": False}},
     "$ref": "#/$defs/n"},
    {"contains": {"const": 3}, "minContains": 0, "maxContains": 2,
     "format": "date-time"},
]

_COMPILED = [compile_schema(s, format_assertion=True) for s in FUZZ_SCHEMAS]


@settings(max_examples=300, deadline=None)
@given(value=json_values, idx=st.integers(0, len(FUZZ_SCHEMAS) - 1))
def test_fuzz_never_crashes(value, idx):
    r = _COMPILED[idx].validate(value)
    assert isinstance(r.valid, bool)
    # verdict must be deterministic
    assert _COMPILED[idx].is_valid(value) == r.valid


@settings(max_examples=150, deadline=None)
@given(value=json_values)
def test_fuzz_json_roundtrip_stable(value):
    """Verdict identical after a JSON round-trip (what the Spark
    interpreter path sees)."""
    cs = _COMPILED[0]
    rt = json.loads(json.dumps(value))
    assert cs.is_valid(value) == cs.is_valid(rt)
