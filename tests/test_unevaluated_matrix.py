"""Exhaustive unevaluatedProperties / unevaluatedItems interaction
matrices — the hardest annotation-algebra interplay in the reference
(property.cljc:268-293, 1083-1095) — checked against an INDEPENDENT
mini-model of the 2019-09/2020-12 annotation rules implemented here from
the spec text (not from the engine): annotations flow from successful
in-place applicator branches ($ref, allOf, anyOf passing branches,
oneOf's single passing branch, a successful `if` plus its taken
then/else arm, triggered dependentSchemas), and unevaluated* applies to
whatever instance keys / indices remain unclaimed.

Every (schema shape x document) pair in the product is one assertion;
counts are reported by test_matrix_sizes so the corpus total is
auditable.
"""

from __future__ import annotations

import itertools
import re

import pytest

from m3spark.schema.core import compile_schema

D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"


# ---------------------------------------------------------------------------
# mini-model: object family


def _leaf_ok(leaf, value) -> bool:
    if leaf is True or leaf == {}:
        return True
    if leaf is False:
        return False
    t = leaf.get("type")
    if t == "string":
        return isinstance(value, str)
    if t == "integer":
        return isinstance(value, int) and not isinstance(value, bool)
    raise AssertionError(f"mini-model leaf {leaf}")


def _model_object(schema, doc, defs) -> tuple[bool, set]:
    """(valid, evaluated-keys) for the restricted object family."""
    if schema is True or schema == {}:
        return True, set()
    if schema is False:
        return False, set()
    valid = True
    evaluated: set = set()

    if "$ref" in schema:
        sub = defs[schema["$ref"].split("/")[-1]]
        ok, ev = _model_object(sub, doc, defs)
        valid &= ok
        if ok:
            evaluated |= ev

    matched: set = set()
    for k, leaf in schema.get("properties", {}).items():
        if k in doc:
            matched.add(k)
            evaluated.add(k)
            valid &= _leaf_ok(leaf, doc[k])
    for pat, leaf in schema.get("patternProperties", {}).items():
        for k in doc:
            if re.search(pat, k):
                matched.add(k)
                evaluated.add(k)
                valid &= _leaf_ok(leaf, doc[k])
    if "additionalProperties" in schema:
        ap = schema["additionalProperties"]
        own_matched = ({k for k in schema.get("properties", {}) if k in doc}
                       | {k for k in doc
                          for pat in schema.get("patternProperties", {})
                          if re.search(pat, k)})
        for k in doc:
            if k not in own_matched:
                evaluated.add(k)
                valid &= _leaf_ok(ap, doc[k])

    for k in schema.get("required", []):
        valid &= k in doc

    for branch_set, mode in (("allOf", "all"), ("anyOf", "any"),
                             ("oneOf", "one")):
        if branch_set in schema:
            results = [_model_object(b, doc, defs)
                       for b in schema[branch_set]]
            n_ok = sum(1 for ok, _ in results if ok)
            if mode == "all":
                valid &= n_ok == len(results)
            elif mode == "any":
                valid &= n_ok >= 1
            else:
                valid &= n_ok == 1
            for ok, ev in results:
                if ok:
                    evaluated |= ev

    if "if" in schema:
        ok_if, ev_if = _model_object(schema["if"], doc, defs)
        if ok_if:
            evaluated |= ev_if
            if "then" in schema:
                ok_t, ev_t = _model_object(schema["then"], doc, defs)
                valid &= ok_t
                if ok_t:
                    evaluated |= ev_t
        elif "else" in schema:
            ok_e, ev_e = _model_object(schema["else"], doc, defs)
            valid &= ok_e
            if ok_e:
                evaluated |= ev_e

    for trigger, sub in schema.get("dependentSchemas", {}).items():
        if trigger in doc:
            ok, ev = _model_object(sub, doc, defs)
            valid &= ok
            if ok:
                evaluated |= ev

    if "unevaluatedProperties" in schema:
        up = schema["unevaluatedProperties"]
        for k in doc:
            if k not in evaluated:
                evaluated.add(k)
                valid &= _leaf_ok(up, doc[k])

    return valid, evaluated


# the schema-shape alphabet: every combination of one "evaluator" layer
# with one unevaluatedProperties policy
_EVALUATORS = {
    "plain-props": {"properties": {"a": {}, "b": {"type": "string"}}},
    "pattern": {"patternProperties": {"^a": {}}},
    "props+pattern": {"properties": {"b": {}},
                      "patternProperties": {"^a": {"type": "string"}}},
    "props+ap": {"properties": {"a": {}},
                 "additionalProperties": {"type": "string"}},
    "allOf": {"allOf": [{"properties": {"a": {}}},
                        {"properties": {"b": {"type": "string"}}}]},
    "anyOf": {"anyOf": [{"properties": {"a": {"type": "integer"}},
                         "required": ["a"]},
                        {"properties": {"b": {}}, "required": ["b"]}]},
    "oneOf": {"oneOf": [{"properties": {"a": {}}, "required": ["a"]},
                        {"properties": {"b": {}}, "required": ["b"]}]},
    "if-then-else": {"if": {"properties": {"a": {"type": "integer"}},
                            "required": ["a"]},
                     "then": {"properties": {"b": {}}},
                     "else": {"properties": {"c": {}}}},
    "ref": {"$ref": "#/$defs/base"},
    "ref+props": {"$ref": "#/$defs/base", "properties": {"b": {}}},
    "dependent": {"dependentSchemas":
                  {"a": {"properties": {"b": {"type": "string"}}}}},
    "nested-combo": {"allOf": [{"anyOf": [
        {"properties": {"a": {}}, "required": ["a"]},
        {"properties": {"b": {}}, "required": ["b"]}]}],
        "properties": {"c": {"type": "integer"}}},
}

_DEFS = {"base": {"properties": {"a": {"type": "integer"}}}}

_POLICIES = {
    "false": False,
    "true": True,
    "typed": {"type": "string"},
}

# documents: all subsets of {a,b,c} x uniform value kinds, plus
# alternating mixed-kind docs for every multi-key subset (each key's
# leaf check must bind to ITS value, not the doc's)
_DOCS = []
for keys in itertools.chain.from_iterable(
        itertools.combinations("abc", n) for n in range(4)):
    for kind in ("str", "int"):
        _DOCS.append({k: ("s" if kind == "str" else 1) for k in keys})
    if len(keys) >= 2:
        for flip in (0, 1):
            _DOCS.append({k: ("s" if (i + flip) % 2 == 0 else 1)
                          for i, k in enumerate(keys)})


def _object_matrix():
    for ev_name, ev in _EVALUATORS.items():
        for pol_name, pol in _POLICIES.items():
            for draft in (D2019, D2020):
                schema = dict(ev)
                schema["unevaluatedProperties"] = pol
                schema["$defs"] = _DEFS
                schema["$schema"] = draft
                yield ev_name, pol_name, draft, schema


OBJECT_CASES = list(_object_matrix())


@pytest.mark.parametrize("ev_name,pol_name,draft,schema",
                         OBJECT_CASES,
                         ids=[f"{e}-{p}-{d[-18:-7]}" for e, p, d, _ in
                              OBJECT_CASES])
def test_unevaluated_properties_matrix(ev_name, pol_name, draft, schema):
    cs = compile_schema(schema)
    mism = []
    for doc in _DOCS:
        expected, _ = _model_object(
            {k: v for k, v in schema.items()
             if k not in ("$schema", "$defs")}, doc, _DEFS)
        got = cs.validate(doc).valid
        if bool(got) != bool(expected):
            mism.append(f"doc={doc}: interp={got} model={expected}")
    assert not mism, f"{ev_name}/{pol_name}:\n" + "\n".join(mism[:6])


# ---------------------------------------------------------------------------
# array family: unevaluatedItems x prefixItems/items/contains/allOf/$ref
# (2019-09 uses items:[...] tuple form; 2020-12 uses prefixItems)


def _model_array(schema, doc, defs, draft) -> tuple[bool, set]:
    if schema is True or schema == {}:
        return True, set()
    if schema is False:
        return False, set()
    valid = True
    evaluated: set = set()

    if "$ref" in schema:
        sub = defs[schema["$ref"].split("/")[-1]]
        ok, ev = _model_array(sub, doc, defs, draft)
        valid &= ok
        if ok:
            evaluated |= ev

    prefix = (schema.get("prefixItems") if draft == D2020
              else (schema.get("items")
                    if isinstance(schema.get("items"), list) else None))
    if prefix:
        for i, leaf in enumerate(prefix):
            if i < len(doc):
                evaluated.add(i)
                valid &= _leaf_ok(leaf, doc[i])
    rest_key = "items" if draft == D2020 else "additionalItems"
    rest = schema.get(rest_key)
    if draft == D2019 and isinstance(schema.get("items"), dict):
        # schema-form items evaluates everything
        rest, prefix = schema["items"], prefix or []
    if isinstance(rest, (dict, bool)) and (prefix is not None
                                           or draft == D2019
                                           or "items" in schema):
        for i in range(len(prefix or []), len(doc)):
            evaluated.add(i)
            valid &= _leaf_ok(rest, doc[i])

    if "minItems" in schema:
        valid &= len(doc) >= schema["minItems"]

    if "contains" in schema:
        matches = {i for i, v in enumerate(doc)
                   if _leaf_ok(schema["contains"], v)}
        valid &= len(matches) >= schema.get("minContains", 1)
        if "maxContains" in schema:
            valid &= len(matches) <= schema["maxContains"]
        if draft == D2020:
            evaluated |= matches  # 2020-12 counts contains-matches

    for branch_set, mode in (("allOf", "all"), ("anyOf", "any")):
        if branch_set in schema:
            results = [_model_array(b, doc, defs, draft)
                       for b in schema[branch_set]]
            n_ok = sum(1 for ok, _ in results if ok)
            valid &= (n_ok == len(results)) if mode == "all" else n_ok >= 1
            for ok, ev in results:
                if ok:
                    evaluated |= ev

    if "unevaluatedItems" in schema:
        ui = schema["unevaluatedItems"]
        for i in range(len(doc)):
            if i not in evaluated:
                evaluated.add(i)
                valid &= _leaf_ok(ui, doc[i])
    return valid, evaluated


def _arr(draft, **kw):
    """Draft-correct array schema: tuple prefix is `prefixItems` in
    2020-12 but tuple-form `items` (+additionalItems) in 2019-09."""
    out = {}
    if "prefix" in kw:
        out["prefixItems" if draft == D2020 else "items"] = kw["prefix"]
    if "rest" in kw:
        out["items" if draft == D2020 else "additionalItems"] = kw["rest"]
    for k in ("contains", "minContains", "maxContains", "allOf", "anyOf",
              "$ref"):
        if k in kw:
            out[k] = kw[k]
    return out


def _array_evaluators(draft):
    return {
        "prefix-only": _arr(draft, prefix=[{}, {"type": "string"}]),
        "prefix+rest": _arr(draft, prefix=[{}],
                            rest={"type": "integer"}),
        "contains": {"contains": {"type": "string"}},
        "contains+bounds": {"contains": {"type": "string"},
                            "minContains": 0, "maxContains": 2},
        "allOf-prefix": {"allOf": [_arr(draft, prefix=[{}]),
                                   _arr(draft,
                                        prefix=[{}, {"type": "integer"}])]},
        "anyOf-prefix": {"anyOf": [
            dict(_arr(draft, prefix=[{"type": "integer"}]),
                 minItems=1),
            dict(_arr(draft, prefix=[{"type": "string"},
                                     {"type": "string"}]),
                 minItems=2)]},
        "ref": {"$ref": "#/$defs/arrbase"},
    }


_ARR_DEFS = {"arrbase": {}}  # filled per draft below

_ARR_DOCS = [
    [], ["s"], [1], ["s", "s"], ["s", 1], [1, "s"], [1, 1],
    ["s", "s", "s"], ["s", 1, "s"], [1, 1, 1], ["s", "s", 1, 1],
    [1, "s", 1], ["s", 1, "s", 1], [1, 1, "s", "s", "s"],
]


def _array_matrix():
    for draft in (D2019, D2020):
        defs = {"arrbase": _arr(draft, prefix=[{"type": "string"}])}
        for ev_name, ev in _array_evaluators(draft).items():
            for pol_name, pol in _POLICIES.items():
                schema = dict(ev)
                schema["unevaluatedItems"] = pol
                schema["$defs"] = defs
                schema["$schema"] = draft
                yield ev_name, pol_name, draft, schema, defs


ARRAY_CASES = list(_array_matrix())


@pytest.mark.parametrize("ev_name,pol_name,draft,schema,defs",
                         ARRAY_CASES,
                         ids=[f"{e}-{p}-{d[-18:-7]}" for e, p, d, _, _ in
                              ARRAY_CASES])
def test_unevaluated_items_matrix(ev_name, pol_name, draft, schema, defs):
    cs = compile_schema(schema)
    mism = []
    for doc in _ARR_DOCS:
        expected, _ = _model_array(
            {k: v for k, v in schema.items()
             if k not in ("$schema", "$defs")}, doc, defs, draft)
        got = cs.validate(doc).valid
        if bool(got) != bool(expected):
            mism.append(f"doc={doc}: interp={got} model={expected}")
    assert not mism, f"{ev_name}/{pol_name}/{draft}:\n" + "\n".join(mism[:6])


def test_matrix_sizes():
    """Auditability: the matrices contribute this many (schema, doc)
    verdict assertions to the corpus."""
    n_obj = len(OBJECT_CASES) * len(_DOCS)
    n_arr = len(ARRAY_CASES) * len(_ARR_DOCS)
    assert n_obj >= 1100, n_obj
    assert n_arr >= 450, n_arr
