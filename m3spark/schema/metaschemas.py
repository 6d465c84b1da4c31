"""Vendored draft meta-schemas for validate-m2 (reference:
validate.cljc:354-403 validates every schema against its draft's
meta-schema before compiling; an invalid schema yields a validator that
reports the meta-errors for every document instead of crashing).

Drafts 4/6/7 are transcriptions of the official single-file
meta-schemas.  2019-09 / 2020-12 are CONSOLIDATED: the official drafts
split keywords across vocabulary files ($ref'd from the root); the
object below is the same keyword surface folded into one schema (the
resolved semantics are identical for validation purposes — every
keyword constraint is present).  draft-next extends 2020-12 with
propertyDependencies.  Draft 3 is transcribed from
draft-zyp-json-schema-03 §5.

Written from the public specifications; keyword-for-keyword parity with
the official files.
"""

from __future__ import annotations


def _schema_ref():
    return {"$ref": "#"}


def _schema_array(min_items=1):
    out = {"type": "array", "items": {"$ref": "#"}}
    if min_items:
        out["minItems"] = min_items
    return out


_SIMPLE_TYPES = ["array", "boolean", "integer", "null", "number",
                 "object", "string"]

_TYPE_MODERN = {
    "anyOf": [
        {"enum": _SIMPLE_TYPES},
        {"type": "array", "items": {"enum": _SIMPLE_TYPES},
         "minItems": 1, "uniqueItems": True},
    ]
}

_NON_NEG_INT = {"type": "integer", "minimum": 0}
_STRING_ARRAY = {"type": "array", "items": {"type": "string"},
                 "uniqueItems": True}


META_DRAFT4 = {
    "id": "http://json-schema.org/draft-04/schema#",
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "$schema": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": {},
        "multipleOf": {"type": "number", "minimum": 0,
                       "exclusiveMinimum": True},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "boolean", "default": False},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "boolean", "default": False},
        "maxLength": _NON_NEG_INT,
        "minLength": _NON_NEG_INT,
        "pattern": {"type": "string", "format": "regex"},
        "additionalItems": {"anyOf": [{"type": "boolean"}, _schema_ref()]},
        "items": {"anyOf": [_schema_ref(), _schema_array()]},
        "maxItems": _NON_NEG_INT,
        "minItems": _NON_NEG_INT,
        "uniqueItems": {"type": "boolean", "default": False},
        "maxProperties": _NON_NEG_INT,
        "minProperties": _NON_NEG_INT,
        "required": dict(_STRING_ARRAY, minItems=1),
        "additionalProperties": {"anyOf": [{"type": "boolean"},
                                           _schema_ref()]},
        "definitions": {"type": "object",
                        "additionalProperties": _schema_ref()},
        "properties": {"type": "object",
                       "additionalProperties": _schema_ref()},
        "patternProperties": {"type": "object",
                              "additionalProperties": _schema_ref()},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [_schema_ref(), dict(_STRING_ARRAY, minItems=1)]}},
        "enum": {"type": "array", "minItems": 1, "uniqueItems": True},
        "type": _TYPE_MODERN,
        "format": {"type": "string"},
        "$ref": {"type": "string"},
        "allOf": _schema_array(),
        "anyOf": _schema_array(),
        "oneOf": _schema_array(),
        "not": _schema_ref(),
    },
    "dependencies": {
        "exclusiveMaximum": ["maximum"],
        "exclusiveMinimum": ["minimum"],
    },
    "default": {},
}


def _modern_common(draft_uri: str) -> dict:
    """Keywords shared by draft-06 and draft-07 meta-schemas."""
    return {
        "$id": draft_uri,
        "$schema": draft_uri,
        "type": ["object", "boolean"],
        "properties": {
            "$id": {"type": "string", "format": "uri-reference"},
            "$schema": {"type": "string", "format": "uri"},
            "$ref": {"type": "string", "format": "uri-reference"},
            "title": {"type": "string"},
            "description": {"type": "string"},
            "default": True,
            "examples": {"type": "array", "items": True},
            "multipleOf": {"type": "number", "exclusiveMinimum": 0},
            "maximum": {"type": "number"},
            "exclusiveMaximum": {"type": "number"},
            "minimum": {"type": "number"},
            "exclusiveMinimum": {"type": "number"},
            "maxLength": _NON_NEG_INT,
            "minLength": _NON_NEG_INT,
            "pattern": {"type": "string", "format": "regex"},
            "additionalItems": _schema_ref(),
            "items": {"anyOf": [_schema_ref(), _schema_array()]},
            "maxItems": _NON_NEG_INT,
            "minItems": _NON_NEG_INT,
            "uniqueItems": {"type": "boolean", "default": False},
            "contains": _schema_ref(),
            "maxProperties": _NON_NEG_INT,
            "minProperties": _NON_NEG_INT,
            "required": _STRING_ARRAY,
            "additionalProperties": _schema_ref(),
            "definitions": {"type": "object",
                            "additionalProperties": _schema_ref()},
            "properties": {"type": "object",
                           "additionalProperties": _schema_ref()},
            "patternProperties": {
                "type": "object",
                "additionalProperties": _schema_ref(),
                "propertyNames": {"format": "regex"}},
            "dependencies": {
                "type": "object",
                "additionalProperties": {
                    "anyOf": [_schema_ref(), _STRING_ARRAY]}},
            "propertyNames": _schema_ref(),
            "const": True,
            "enum": {"type": "array"},
            "type": _TYPE_MODERN,
            "format": {"type": "string"},
            "allOf": _schema_array(),
            "anyOf": _schema_array(),
            "oneOf": _schema_array(),
            "not": _schema_ref(),
        },
        "default": True,
    }


META_DRAFT6 = _modern_common("http://json-schema.org/draft-06/schema#")
# draft-06 enum requires at least one entry; draft-07 relaxed to bare array
META_DRAFT6["properties"]["enum"] = {"type": "array", "minItems": 1,
                                     "uniqueItems": True}

META_DRAFT7 = _modern_common("http://json-schema.org/draft-07/schema#")
META_DRAFT7["properties"].update({
    "$comment": {"type": "string"},
    "readOnly": {"type": "boolean", "default": False},
    "writeOnly": {"type": "boolean", "default": False},
    "contentMediaType": {"type": "string"},
    "contentEncoding": {"type": "string"},
    "if": _schema_ref(),
    "then": _schema_ref(),
    "else": _schema_ref(),
})


_ANCHOR_PATTERN = "^[A-Za-z_][-A-Za-z0-9._]*$"


def _meta_2019ish(draft_uri: str, *, dynamic: bool) -> dict:
    """Consolidated 2019-09 / 2020-12 meta-schema (all vocabularies
    folded into one object; `dynamic` picks $dynamic* over $recursive*)."""
    m = {
        "$id": draft_uri,
        "$schema": draft_uri,
        "type": ["object", "boolean"],
        "properties": {
            "$id": {"type": "string", "format": "uri-reference"},
            "$schema": {"type": "string", "format": "uri"},
            "$ref": {"type": "string", "format": "uri-reference"},
            "$anchor": {"type": "string", "pattern": _ANCHOR_PATTERN},
            "$vocabulary": {"type": "object",
                            "propertyNames": {"format": "uri"},
                            "additionalProperties": {"type": "boolean"}},
            "$comment": {"type": "string"},
            "$defs": {"type": "object",
                      "additionalProperties": _schema_ref()},
            "definitions": {"type": "object",
                            "additionalProperties": _schema_ref()},
            "title": {"type": "string"},
            "description": {"type": "string"},
            "default": True,
            "deprecated": {"type": "boolean", "default": False},
            "readOnly": {"type": "boolean", "default": False},
            "writeOnly": {"type": "boolean", "default": False},
            "examples": {"type": "array", "items": True},
            "multipleOf": {"type": "number", "exclusiveMinimum": 0},
            "maximum": {"type": "number"},
            "exclusiveMaximum": {"type": "number"},
            "minimum": {"type": "number"},
            "exclusiveMinimum": {"type": "number"},
            "maxLength": _NON_NEG_INT,
            "minLength": _NON_NEG_INT,
            "pattern": {"type": "string", "format": "regex"},
            "maxItems": _NON_NEG_INT,
            "minItems": _NON_NEG_INT,
            "uniqueItems": {"type": "boolean", "default": False},
            "maxContains": _NON_NEG_INT,
            "minContains": _NON_NEG_INT,
            "contains": _schema_ref(),
            "maxProperties": _NON_NEG_INT,
            "minProperties": _NON_NEG_INT,
            "required": _STRING_ARRAY,
            "dependentRequired": {
                "type": "object",
                "additionalProperties": _STRING_ARRAY},
            "dependentSchemas": {"type": "object",
                                 "additionalProperties": _schema_ref()},
            "additionalProperties": _schema_ref(),
            "properties": {"type": "object",
                           "additionalProperties": _schema_ref()},
            "patternProperties": {
                "type": "object",
                "additionalProperties": _schema_ref(),
                "propertyNames": {"format": "regex"}},
            "propertyNames": _schema_ref(),
            "const": True,
            "enum": {"type": "array"},
            "type": _TYPE_MODERN,
            "format": {"type": "string"},
            "contentMediaType": {"type": "string"},
            "contentEncoding": {"type": "string"},
            "contentSchema": _schema_ref(),
            "allOf": _schema_array(),
            "anyOf": _schema_array(),
            "oneOf": _schema_array(),
            "not": _schema_ref(),
            "if": _schema_ref(),
            "then": _schema_ref(),
            "else": _schema_ref(),
            "unevaluatedItems": _schema_ref(),
            "unevaluatedProperties": _schema_ref(),
        },
        "default": True,
    }
    if dynamic:  # 2020-12
        m["properties"].update({
            "$dynamicRef": {"type": "string", "format": "uri-reference"},
            "$dynamicAnchor": {"type": "string",
                               "pattern": _ANCHOR_PATTERN},
            "prefixItems": _schema_array(),
            "items": _schema_ref(),
        })
    else:  # 2019-09
        m["properties"].update({
            "$recursiveRef": {"type": "string", "format": "uri-reference"},
            "$recursiveAnchor": {"type": "boolean", "default": False},
            "items": {"anyOf": [_schema_ref(), _schema_array()]},
            "additionalItems": _schema_ref(),
        })
    return m


META_2019 = _meta_2019ish("https://json-schema.org/draft/2019-09/schema",
                          dynamic=False)
META_2020 = _meta_2019ish("https://json-schema.org/draft/2020-12/schema",
                          dynamic=True)

META_NEXT = _meta_2019ish("https://json-schema.org/draft/next/schema",
                          dynamic=True)
META_NEXT["properties"]["propertyDependencies"] = {
    "type": "object",
    "additionalProperties": {"type": "object",
                             "additionalProperties": _schema_ref()},
}

# draft-zyp-json-schema-03 §5 (transcribed; draft-3 self-describing schema)
_TYPE_D3 = {
    "anyOf": [
        {"enum": _SIMPLE_TYPES + ["any"]},
        {"type": "array",
         "items": {"anyOf": [{"enum": _SIMPLE_TYPES + ["any"]},
                             _schema_ref()]},
         "minItems": 1, "uniqueItems": True},
    ]
}

META_DRAFT3 = {
    "$schema": "http://json-schema.org/draft-03/schema#",
    "id": "http://json-schema.org/draft-03/schema#",
    "type": "object",
    "properties": {
        "type": _TYPE_D3,
        "disallow": _TYPE_D3,
        "properties": {"type": "object",
                       "additionalProperties": _schema_ref()},
        "patternProperties": {"type": "object",
                              "additionalProperties": _schema_ref()},
        "additionalProperties": {"anyOf": [_schema_ref(),
                                           {"type": "boolean"}]},
        "items": {"anyOf": [_schema_ref(), _schema_array(min_items=0)]},
        "additionalItems": {"anyOf": [_schema_ref(), {"type": "boolean"}]},
        "required": {"type": "boolean", "default": False},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"type": "string"},
                          {"type": "array", "items": {"type": "string"}},
                          _schema_ref()]}},
        "minimum": {"type": "number"},
        "maximum": {"type": "number"},
        "exclusiveMinimum": {"type": "boolean", "default": False},
        "exclusiveMaximum": {"type": "boolean", "default": False},
        "minItems": _NON_NEG_INT,
        "maxItems": _NON_NEG_INT,
        "uniqueItems": {"type": "boolean", "default": False},
        "pattern": {"type": "string", "format": "regex"},
        "minLength": _NON_NEG_INT,
        "maxLength": _NON_NEG_INT,
        "enum": {"type": "array", "minItems": 1, "uniqueItems": True},
        "default": {},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "format": {"type": "string"},
        "divisibleBy": {"type": "number", "minimum": 0,
                        "exclusiveMinimum": True, "default": 1},
        "extends": {"anyOf": [_schema_ref(), _schema_array(min_items=0)]},
        "id": {"type": "string"},
        "$ref": {"type": "string"},
        "$schema": {"type": "string"},
    },
    "default": {},
}


META_BY_DRAFT = {
    "draft3": META_DRAFT3,
    "draft4": META_DRAFT4,
    "draft6": META_DRAFT6,
    "draft7": META_DRAFT7,
    "draft2019-09": META_2019,
    "draft2020-12": META_2020,
    "draft-next": META_NEXT,
}
