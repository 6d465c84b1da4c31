"""Seeded random-schema generator for compile-stress and engine-agreement
fuzzing — the in-repo analog of the reference's SchemaStore stress test
(schemastore_stress_test.clj:69-85 asserts zero compile errors over
hundreds of real-world schemas; those submodules are empty checkouts, so
we generate a comparable corpus deterministically instead).

Two families:
- ``tabular_schema``: top-level scalar properties only — everything the
  columnar compiler can lower — used for interp == columnar verdict- and
  violation-agreement over shared random rows.
- ``deep_schema``: the full keyword surface (nested objects/arrays,
  $defs/$ref, combinators, if/then/else, dependencies, unevaluated*,
  patternProperties, propertyNames, contains, content) — compile-stress
  for the interpreter (the columnar engine may route these to the
  interpreter via UnsupportedKeyword but must never crash otherwise).

Everything is a pure function of the seed: failures replay exactly.
"""

from __future__ import annotations

import random
import string

DRAFTS = [
    "http://json-schema.org/draft-03/schema#",
    "http://json-schema.org/draft-04/schema#",
    "http://json-schema.org/draft-06/schema#",
    "http://json-schema.org/draft-07/schema#",
    "https://json-schema.org/draft/2019-09/schema",
    "https://json-schema.org/draft/2020-12/schema",
]

# Java/ECMA-shared regexes only (the agreement family must not depend on
# engine-specific regex corners — those have their own battery in
# test_ecma.py)
_PATTERNS = ["^[a-z]+$", "^[A-Z][a-z]{1,8}$", "[0-9]{3}", "^a.b$",
             "^(foo|bar)+$", "x$"]
_FORMATS = ["date", "ipv4", "uuid"]  # pure-rlike formats, draft-stable


def _name(rng, taken):
    while True:
        n = "".join(rng.choice(string.ascii_lowercase) for _ in range(5))
        if n not in taken:
            taken.add(n)
            return n


def _scalar_property(rng, draft: str) -> tuple[dict, str]:
    """One scalar property subschema; returns (schema, kind) where kind
    drives value generation (int/num/str/bool)."""
    old = "draft-03" in draft or "draft-04" in draft
    kind = rng.choice(["int", "num", "str", "bool"])
    sub: dict = {}
    if rng.random() < 0.8:
        sub["type"] = {"int": "integer", "num": "number",
                       "str": "string", "bool": "boolean"}[kind]
    if kind in ("int", "num"):
        if rng.random() < 0.6:
            sub["minimum"] = rng.randint(-5, 5)
            if old and rng.random() < 0.4:
                sub["exclusiveMinimum"] = True
        if rng.random() < 0.6:
            sub["maximum"] = rng.randint(6, 20)
            if old and rng.random() < 0.4:
                sub["exclusiveMaximum"] = True
        if not old and rng.random() < 0.3:
            sub["exclusiveMaximum"] = rng.randint(6, 20)
        if rng.random() < 0.3:
            kw = "divisibleBy" if "draft-03" in draft else "multipleOf"
            sub[kw] = rng.choice([2, 3, 0.5, 0.25])
    elif kind == "str":
        if rng.random() < 0.5:
            sub["minLength"] = rng.randint(0, 3)
        if rng.random() < 0.5:
            sub["maxLength"] = rng.randint(4, 12)
        if rng.random() < 0.4:
            sub["pattern"] = rng.choice(_PATTERNS)
        if rng.random() < 0.2:
            sub["format"] = rng.choice(_FORMATS)
    if rng.random() < 0.2:
        # meta-schemas (draft-06+) require unique enum values
        vals, seen = [], set()
        for v in _values_of_kind(rng, kind, 4):
            if repr(v) not in seen:
                seen.add(repr(v))
                vals.append(v)
        sub["enum"] = vals
    elif rng.random() < 0.1:
        sub["const"] = _values_of_kind(rng, kind, 1)[0]
    if rng.random() < 0.15 and not old:
        # wrap part of the constraints in a combinator
        comb = rng.choice(["allOf", "anyOf", "oneOf"])
        keys = [k for k in sub if k != "type"]
        if len(keys) >= 2:
            k1, k2 = rng.sample(keys, 2)
            sub[comb] = [{k1: sub.pop(k1)}, {k2: sub.pop(k2)}]
    if rng.random() < 0.1:
        sub["not"] = {"const": _values_of_kind(rng, kind, 1)[0]}
    return sub, kind


def _values_of_kind(rng, kind, n):
    out = []
    for _ in range(n):
        if kind == "int":
            out.append(rng.randint(-10, 25))
        elif kind == "num":
            out.append(rng.choice(
                [rng.randint(-10, 25), rng.uniform(-10, 25)]))
        elif kind == "str":
            out.append("".join(rng.choice("abcXY019._ ")
                               for _ in range(rng.randint(0, 10))))
        else:
            out.append(rng.random() < 0.5)
    return out


def tabular_schema(seed: int) -> tuple[dict, dict]:
    """Returns (schema, kinds): a draft-stamped schema whose top-level
    properties are scalar columns, plus each property's value kind."""
    rng = random.Random(seed)
    draft = rng.choice(DRAFTS)
    taken: set = set()
    props, kinds = {}, {}
    for _ in range(rng.randint(1, 4)):
        name = _name(rng, taken)
        sub, kind = _scalar_property(rng, draft)
        props[name] = sub
        kinds[name] = kind
    schema = {"$schema": draft, "type": "object", "properties": props}
    old3 = "draft-03" in draft
    if not old3 and rng.random() < 0.5:
        k = rng.randint(1, len(props))
        schema["required"] = sorted(rng.sample(list(props), k))
    return schema, kinds


def row_for(seed: int, kinds: dict) -> dict:
    """One row of (column -> value or None) biased to hit both sides of
    every constraint: in-range, out-of-range, wrong absence."""
    rng = random.Random(seed)
    row = {}
    for name, kind in kinds.items():
        r = rng.random()
        if r < 0.15:
            row[name] = None            # missing property
        else:
            row[name] = _values_of_kind(rng, kind, 1)[0]
    return row


# ---------------------------------------------------------------------------
# deep family


def _deep_schema(rng, depth: int, defs: dict) -> dict:
    if depth <= 0:
        sub, _ = _scalar_property(rng, DRAFTS[-1])
        return sub
    choice = rng.random()
    if choice < 0.25:
        props = {_name(rng, set()): _deep_schema(rng, depth - 1, defs)
                 for _ in range(rng.randint(1, 3))}
        out = {"type": "object", "properties": props}
        if rng.random() < 0.4:
            out["required"] = sorted(rng.sample(list(props),
                                                rng.randint(1, len(props))))
        if rng.random() < 0.3:
            out["additionalProperties"] = rng.choice(
                [True, False, _deep_schema(rng, 0, defs)])
        if rng.random() < 0.2:
            out["patternProperties"] = {
                rng.choice(_PATTERNS): _deep_schema(rng, 0, defs)}
        if rng.random() < 0.15:
            out["propertyNames"] = {"maxLength": rng.randint(3, 30)}
        if rng.random() < 0.15:
            out["minProperties"] = rng.randint(0, 2)
        if rng.random() < 0.15:
            out["unevaluatedProperties"] = rng.choice([True, False])
        if rng.random() < 0.15:
            out["dependentRequired"] = {
                k: [rng.choice(list(props))] for k in
                rng.sample(list(props), 1)}
        return out
    if choice < 0.45:
        out = {"type": "array",
               "items": _deep_schema(rng, depth - 1, defs)}
        if rng.random() < 0.3:
            out["minItems"] = rng.randint(0, 2)
        if rng.random() < 0.3:
            out["maxItems"] = rng.randint(3, 8)
        if rng.random() < 0.3:
            out["uniqueItems"] = True
        if rng.random() < 0.3:
            out["contains"] = _deep_schema(rng, 0, defs)
            if rng.random() < 0.5:
                out["minContains"] = rng.randint(0, 2)
        if rng.random() < 0.2:
            out["prefixItems"] = [_deep_schema(rng, 0, defs)
                                  for _ in range(rng.randint(1, 2))]
        if rng.random() < 0.15:
            out["unevaluatedItems"] = rng.choice([True, False])
        return out
    if choice < 0.6:
        comb = rng.choice(["allOf", "anyOf", "oneOf"])
        return {comb: [_deep_schema(rng, depth - 1, defs)
                       for _ in range(rng.randint(1, 3))]}
    if choice < 0.7:
        return {"if": _deep_schema(rng, 0, defs),
                "then": _deep_schema(rng, depth - 1, defs),
                "else": _deep_schema(rng, 0, defs)}
    if choice < 0.8:
        return {"not": _deep_schema(rng, depth - 1, defs)}
    if choice < 0.9 and defs is not None:
        # reserve the slot BEFORE recursing: inner calls allocate fresh
        # indexes, so a later assignment can never overwrite a def an
        # inner subtree already references (that overwrite dropped
        # resource $ids and broke their absolute refs)
        name = f"d{len(defs)}"
        defs[name] = {}
        node = _deep_schema(rng, depth - 1, defs)
        if rng.random() < 0.35:
            # embedded RESOURCE (r6 bundle machinery): a $defs subtree
            # with its own absolute $id, optionally dynamic-anchored,
            # referenced by absolute URI or bookended $dynamicRef.
            # Only subtrees WITHOUT local pointer refs: "#/$defs/..."
            # inside a resource resolves against the resource base,
            # where the document root's $defs do not exist.
            import json as _json
            if isinstance(node, dict) and '"#/' not in _json.dumps(node):
                uri = f"https://fuzz.test/{name}"
                node = {"$id": uri, **node}
                if rng.random() < 0.4:
                    node["$dynamicAnchor"] = f"da{name}"
                defs[name] = node
                if "$dynamicAnchor" in node and rng.random() < 0.5:
                    return {"$dynamicRef": f"{uri}#da{name}"}
                return {"$ref": uri}
        defs[name] = node
        return {"$ref": f"#/$defs/{name}"}
    sub, _ = _scalar_property(rng, DRAFTS[-1])
    return sub


def deep_schema(seed: int) -> dict:
    """Full-surface 2020-12 schema with $defs/$ref, nesting, applicators,
    unevaluated*, dependencies — meta-valid by construction."""
    rng = random.Random(seed)
    defs: dict = {}
    schema = _deep_schema(rng, rng.randint(2, 4), defs)
    if not isinstance(schema, dict):
        schema = {"type": "object"}
    schema = dict(schema)
    schema["$schema"] = DRAFTS[-1]
    if defs:
        schema["$defs"] = defs
    return schema


def random_instance(seed: int, depth: int = 3):
    """Arbitrary JSON value — intentionally schema-agnostic so both the
    pass and fail paths of every checker run."""
    rng = random.Random(seed)
    return _rand_value(rng, depth)


def _rand_value(rng, depth):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        return rng.choice([
            None, True, False, rng.randint(-20, 30),
            rng.uniform(-20, 30),
            "".join(rng.choice("abcXY019._ ") for _ in
                    range(rng.randint(0, 12)))])
    if r < 0.7:
        return {_name(rng, set()): _rand_value(rng, depth - 1)
                for _ in range(rng.randint(0, 4))}
    return [_rand_value(rng, depth - 1) for _ in range(rng.randint(0, 5))]
