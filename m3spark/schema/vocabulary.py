"""$vocabulary dialect selection (reference: vocabulary.cljc:131-139
unknown-vocab handling; :588-597 dialect built from the meta-schema's
$vocabulary map).

A schema whose ``$schema`` points at a meta-schema carrying
``$vocabulary`` gets a DIALECT: only keywords belonging to the listed
vocabularies are compiled (unlisted keyword sets degrade to ignored
annotations), and the format vocabulary choice decides
assertion-vs-annotation.  A vocabulary URI we don't know with value
``true`` (required) is a compile-time SchemaError; with ``false`` it is
skipped.
"""

from __future__ import annotations

_V19 = "https://json-schema.org/draft/2019-09/vocab/"
_V20 = "https://json-schema.org/draft/2020-12/vocab/"
_VNEXT = "https://json-schema.org/draft/next/vocab/"

_CORE = {"$id", "$schema", "$anchor", "$ref", "$vocabulary", "$comment",
         "$defs", "$recursiveRef", "$recursiveAnchor", "$dynamicRef",
         "$dynamicAnchor", "definitions"}

_VALIDATION = {
    "type", "enum", "const", "multipleOf", "maximum", "exclusiveMaximum",
    "minimum", "exclusiveMinimum", "maxLength", "minLength", "pattern",
    "maxItems", "minItems", "uniqueItems", "maxContains", "minContains",
    "maxProperties", "minProperties", "required", "dependentRequired",
}

_APPLICATOR_2019 = {
    "items", "additionalItems", "unevaluatedItems", "contains",
    "properties", "patternProperties", "additionalProperties",
    "unevaluatedProperties", "propertyNames", "if", "then", "else",
    "allOf", "anyOf", "oneOf", "not", "dependentSchemas",
}

_APPLICATOR_2020 = {
    "prefixItems", "items", "contains", "properties", "patternProperties",
    "additionalProperties", "propertyNames", "if", "then", "else",
    "allOf", "anyOf", "oneOf", "not", "dependentSchemas",
}

_UNEVALUATED = {"unevaluatedItems", "unevaluatedProperties"}
_META_DATA = {"title", "description", "default", "deprecated", "readOnly",
              "writeOnly", "examples"}
_CONTENT = {"contentEncoding", "contentMediaType", "contentSchema"}
_FORMAT = {"format"}

VOCAB_KEYWORDS: dict[str, set[str]] = {
    _V19 + "core": set(_CORE),
    _V19 + "applicator": set(_APPLICATOR_2019),
    _V19 + "validation": set(_VALIDATION),
    _V19 + "meta-data": set(_META_DATA),
    _V19 + "format": set(_FORMAT),
    _V19 + "content": set(_CONTENT),
    _V20 + "core": set(_CORE),
    _V20 + "applicator": set(_APPLICATOR_2020),
    _V20 + "unevaluated": set(_UNEVALUATED),
    _V20 + "validation": set(_VALIDATION),
    _V20 + "meta-data": set(_META_DATA),
    _V20 + "format-annotation": set(_FORMAT),
    _V20 + "format-assertion": set(_FORMAT),
    _V20 + "content": set(_CONTENT),
}
# draft-next re-uses the 2020 layout plus propertyDependencies
for _name, _kws in list(VOCAB_KEYWORDS.items()):
    if _name.startswith(_V20):
        VOCAB_KEYWORDS[_VNEXT + _name[len(_V20):]] = set(_kws)
VOCAB_KEYWORDS[_VNEXT + "applicator"].add("propertyDependencies")


def dialect_keywords(vocab_map: dict, draft: str):
    """Resolve a ``$vocabulary`` map to (allowed keyword set,
    format_assertion override or None).

    Raises SchemaError for an unknown vocabulary marked required=true
    (vocabulary.cljc:131-139)."""
    from m3spark.schema.core import SchemaError

    allowed = set(_CORE)  # the core vocabulary is always in force
    fmt_assert = None
    for uri, required in (vocab_map or {}).items():
        kws = VOCAB_KEYWORDS.get(uri)
        if kws is None:
            if required is True:
                raise SchemaError(
                    f"unknown required vocabulary {uri!r}")
            continue  # optional unknown vocabulary: ignored
        allowed |= kws
        if uri.endswith("/format-assertion"):
            fmt_assert = True
        elif uri.endswith("/format-annotation") and fmt_assert is not True:
            fmt_assert = False
        elif uri.endswith("/vocab/format") and fmt_assert is not True:
            # 2019-09 single format vocabulary: true => assertion
            fmt_assert = bool(required)
    return allowed, fmt_assert
