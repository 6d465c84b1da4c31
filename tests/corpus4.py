"""Corpus expansion (round 4): systematic keyword x value families with
INDEPENDENT expectations — every expected verdict comes from a trivial
spec-derived Python model written here (len/isinstance/Fraction), never
from the engine under test.  Same group shape as tests/corpus.py:
    (draft, description, schema, [(data, expected_valid), ...])

Families: numeric bounds (incl. draft-3/4 boolean exclusive forms),
codepoint string lengths, exact multipleOf (Fraction model), the full
type-name x value matrix per draft era, enum/const JSON-equality
products, array bounds (items/min/maxItems/min/maxContains/unique),
object bounds (required/min/maxProperties/dependentRequired), and a
combinator truth table — plus a hand-derived $dynamicRef x
unevaluatedProperties interaction set (the one cross the round-3
matrices did not cover; reference semantics core $dynamic* + annotation
flow, property.cljc:268-293)."""

from __future__ import annotations

from fractions import Fraction

D3 = "draft3"
D4 = "draft4"
D6 = "draft6"
D7 = "draft7"
D19 = "draft2019-09"
D20 = "draft2020-12"

CASES4 = []


def _is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


# ---------------------------------------------------------------------------
# 1. numeric bounds: minimum/maximum + exclusive forms per draft era

_NUM_VALUES = [-10, -1, -0.5, 0, 0.0, 0.5, 1, 4.999, 5, 5.0, 5.001, 6,
               10, 2**53, 2**53 + 2.0, float(10**100), True, "5", None,
               [5], {"v": 5}]
_BOUND = 5

for draft in (D4, D6, D20):
    for kw, ok in (("minimum", lambda v: v >= _BOUND),
                   ("maximum", lambda v: v <= _BOUND)):
        tests = [(v, (not _is_num(v)) or ok(v)) for v in _NUM_VALUES]
        CASES4.append((draft, f"{kw} {_BOUND} value sweep",
                       {kw: _BOUND}, tests))

# draft-4 boolean exclusive form: exclusiveMinimum: true tightens minimum
for kw, exkw, ok in (("minimum", "exclusiveMinimum", lambda v: v > _BOUND),
                     ("maximum", "exclusiveMaximum", lambda v: v < _BOUND)):
    tests = [(v, (not _is_num(v)) or ok(v)) for v in _NUM_VALUES]
    CASES4.append((D4, f"{kw} {_BOUND} + {exkw}:true (boolean form)",
                   {kw: _BOUND, exkw: True}, tests))
    # exclusive: false is a no-op
    tests_f = [(v, (not _is_num(v)) or (v >= _BOUND if kw == "minimum"
                                        else v <= _BOUND))
               for v in _NUM_VALUES]
    CASES4.append((D4, f"{kw} {_BOUND} + {exkw}:false (boolean form)",
                   {kw: _BOUND, exkw: False}, tests_f))

# draft-6+ numeric exclusive form
for draft in (D6, D19, D20):
    for exkw, ok in (("exclusiveMinimum", lambda v: v > _BOUND),
                     ("exclusiveMaximum", lambda v: v < _BOUND)):
        tests = [(v, (not _is_num(v)) or ok(v)) for v in _NUM_VALUES]
        CASES4.append((draft, f"{exkw} {_BOUND} numeric form",
                       {exkw: _BOUND}, tests))

# ---------------------------------------------------------------------------
# 2. codepoint-aware string lengths (emoji = 1 codepoint, not 2 UTF-16
# units — the reference counts codepoints)

_STRINGS = ["", "a", "ab", "abc", "abcd", "\U0001F600",
            "\U0001F600\U0001F600", "a\U0001F600b", "éé", "日本語",
            "Á"]  # A + combining acute = 2 codepoints

for draft in (D4, D7, D20):
    for n in (0, 1, 2, 3):
        CASES4.append((draft, f"minLength {n} codepoint sweep",
                       {"minLength": n},
                       [(s, len(s) >= n) for s in _STRINGS]
                       + [(42, True), (None, True), (True, True)]))
        CASES4.append((draft, f"maxLength {n} codepoint sweep",
                       {"maxLength": n},
                       [(s, len(s) <= n) for s in _STRINGS]
                       + [(42, True), ([1, 2], True)]))

# ---------------------------------------------------------------------------
# 3. exact multipleOf — independent Fraction model (never float modulo)


def _multiple_ok(v, d) -> bool:
    if not _is_num(v):
        return True
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return False
        fv = Fraction(str(repr(v) if "e" in repr(v).lower()
                          else repr(v)))
    else:
        fv = Fraction(v)
    fd = Fraction(str(d))
    return (fv / fd).denominator == 1


_MOF_CASES = [
    (2, [0, 2, 3, 4, -6, 7.0, 8.0, 2.5, True, "4"]),
    (0.5, [0, 0.5, 1, 1.25, 2.5, -1.5, 0.75]),
    (0.01, [0.02, 0.03, 0.05, 0.07, 0.1, 0.111, 1.13, 19.99, 0.001]),
    (3, [9, 10, 2**53, 2**53 + 2.0, 9.0 * 10**15, 3.0000000000001]),
    (1, [1, 2.0, 2.5, -7, 0]),
]

for draft in (D4, D6, D20):
    for d, vals in _MOF_CASES:
        CASES4.append((draft, f"multipleOf {d} exact sweep",
                       {"multipleOf": d},
                       [(v, _multiple_ok(v, d)) for v in vals]))

# draft-3 spells it divisibleBy
for d, vals in _MOF_CASES:
    CASES4.append((D3, f"divisibleBy {d} exact sweep",
                   {"divisibleBy": d},
                   [(v, _multiple_ok(v, d)) for v in vals]))

# ---------------------------------------------------------------------------
# 4. type-name x value matrix per draft era

_TYPE_VALUES = [None, True, False, 0, 1, -1, 2.0, 2.5, "", "x",
                [], [1], {}, {"a": 1}]


def _type_ok(tname, v, strict_int):
    if tname == "null":
        return v is None
    if tname == "boolean":
        return isinstance(v, bool)
    if tname == "string":
        return isinstance(v, str)
    if tname == "number":
        return _is_num(v)
    if tname == "integer":
        if isinstance(v, bool) or not _is_num(v):
            return False
        if isinstance(v, int):
            return True
        return (not strict_int) and v == int(v)
    if tname == "array":
        return isinstance(v, list)
    if tname == "object":
        return isinstance(v, dict)
    if tname == "any":
        return True
    return False


for draft, strict in ((D3, True), (D4, True), (D6, False), (D7, False),
                      (D20, False)):
    names = ["null", "boolean", "string", "number", "integer", "array",
             "object"]
    if draft == D3:
        names.append("any")
    for tname in names:
        CASES4.append((draft, f"type {tname} matrix",
                       {"type": tname},
                       [(v, _type_ok(tname, v, strict))
                        for v in _TYPE_VALUES]))
    # union types
    CASES4.append((draft, "type [integer, string] matrix",
                   {"type": ["integer", "string"]},
                   [(v, _type_ok("integer", v, strict)
                     or _type_ok("string", v, strict))
                    for v in _TYPE_VALUES]))

# ---------------------------------------------------------------------------
# 5. enum / const JSON-equality products (json-= semantics: 1 == 1.0,
# 1 != true, 0 != false, structural for arrays/objects)


def _json_eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if _is_num(a) and _is_num(b):
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_json_eq(x, y)
                                        for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_json_eq(v, b[k])
                                        for k, v in a.items())
    return type(a) is type(b) and a == b


_EQ_POOL = [0, 0.0, 1, 1.0, -0.0, 2, True, False, "1", "", None,
            [1, 2], [1.0, 2.0], [1, 2, 3], {"a": 1}, {"a": 1.0},
            {"a": 2}, {"b": 1}]

for draft in (D6, D20):
    for target in (1, 1.0, True, "1", None, [1, 2], {"a": 1}):
        CASES4.append((draft, f"const {target!r} json-eq product",
                       {"const": target},
                       [(v, _json_eq(v, target)) for v in _EQ_POOL]))
    enum = [1, "1", [1, 2], {"a": 1}, None]
    CASES4.append((draft, "enum mixed json-eq product",
                   {"enum": enum},
                   [(v, any(_json_eq(v, t) for t in enum))
                    for v in _EQ_POOL]))

# ---------------------------------------------------------------------------
# 6. array bounds + uniqueItems (json-= duplicate detection)

_ARRAYS = [[], [1], [1, 2], [1, 1], [1, 1.0], [1, True], [0, False],
           [1, 2, 3], ["a", "a"], ["a", "b"], [[1], [1.0]], [[1], [2]],
           [{"x": 1}, {"x": 1.0}], [{"x": 1}, {"x": 2}],
           [1, 2, 2, 3], [None, None]]


def _unique(arr) -> bool:
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if _json_eq(arr[i], arr[j]):
                return False
    return True


for draft in (D4, D7, D20):
    for n in (0, 1, 2, 3):
        CASES4.append((draft, f"minItems {n} sweep", {"minItems": n},
                       [(a, len(a) >= n) for a in _ARRAYS]
                       + [("nope", True), (7, True)]))
        CASES4.append((draft, f"maxItems {n} sweep", {"maxItems": n},
                       [(a, len(a) <= n) for a in _ARRAYS]))
    CASES4.append((draft, "uniqueItems json-eq sweep",
                   {"uniqueItems": True},
                   [(a, _unique(a)) for a in _ARRAYS]))

# contains + bounds (draft-6+; minContains/maxContains 2019+)
_C_ARRAYS = [[], [1], ["a"], [1, "a"], ["a", "b"], [1, 2, "a", "b", "c"],
             ["a", "b", "c", "d"], [1, 2, 3]]

for draft in (D6, D7):
    CASES4.append((draft, "contains string sweep",
                   {"contains": {"type": "string"}},
                   [(a, any(isinstance(x, str) for x in a))
                    for a in _C_ARRAYS]))
for draft in (D19, D20):
    for lo, hi in ((0, None), (1, None), (2, 3), (0, 1)):
        sch = {"contains": {"type": "string"}, "minContains": lo}
        if hi is not None:
            sch["maxContains"] = hi
        CASES4.append((
            draft, f"contains bounds [{lo},{hi}] sweep", sch,
            [(a, (lambda c: c >= lo and (hi is None or c <= hi))(
                sum(isinstance(x, str) for x in a))) for a in _C_ARRAYS]))

# ---------------------------------------------------------------------------
# 7. object bounds: required / min/maxProperties / dependentRequired

_OBJECTS = [{}, {"a": 1}, {"b": 2}, {"a": 1, "b": 2},
            {"a": None}, {"a": 1, "b": 2, "c": 3},
            {"c": 3}, {"a": 1, "c": 3}]

for draft in (D4, D7, D20):
    # required: [] is meta-INVALID in draft-4 (minItems 1) — only the
    # draft-6+ groups include it
    reqs = [["a"], ["a", "b"]] + ([[]] if draft != D4 else [])
    for req in reqs:
        CASES4.append((draft, f"required {req} sweep",
                       {"required": req} if req else
                       {"properties": {"a": {}}, "required": req},
                       [(o, all(k in o for k in req)) for o in _OBJECTS]
                       + [("str", True), ([1], True)]))
    for n in (0, 1, 2):
        CASES4.append((draft, f"minProperties {n} sweep",
                       {"minProperties": n},
                       [(o, len(o) >= n) for o in _OBJECTS]))
        CASES4.append((draft, f"maxProperties {n} sweep",
                       {"maxProperties": n},
                       [(o, len(o) <= n) for o in _OBJECTS]))

for draft in (D19, D20):
    CASES4.append((
        draft, "dependentRequired a->[b] sweep",
        {"dependentRequired": {"a": ["b"]}},
        [(o, ("a" not in o) or ("b" in o)) for o in _OBJECTS]))
# pre-2019 spelling: dependencies with array value
for draft in (D4, D7):
    CASES4.append((
        draft, "dependencies a->[b] sweep",
        {"dependencies": {"a": ["b"]}},
        [(o, ("a" not in o) or ("b" in o)) for o in _OBJECTS]))

# ---------------------------------------------------------------------------
# 8. combinator truth table: branches are simple type tests

_COMB_VALUES = [1, 2.5, "x", True, None, [1], {"a": 1}]
_BRANCHES = [{"type": "integer"}, {"type": "string"},
             {"type": "number"}]


def _branch_ok(b, v):
    return _type_ok(b["type"], v, False)


import itertools as _it

for draft in (D4, D7, D20):
    for combo in _it.combinations(range(3), 2):
        brs = [_BRANCHES[i] for i in combo]
        for comb, model in (
                ("allOf", lambda oks: all(oks)),
                ("anyOf", lambda oks: any(oks)),
                ("oneOf", lambda oks: sum(oks) == 1)):
            CASES4.append((
                draft,
                f"{comb} {[b['type'] for b in brs]} truth table",
                {comb: brs},
                [(v, model([_branch_ok(b, v) for b in brs]))
                 for v in _COMB_VALUES]))
    for b in _BRANCHES:
        CASES4.append((draft, f"not {b['type']} truth table",
                       {"not": b},
                       [(v, not _branch_ok(b, v))
                        for v in _COMB_VALUES]))

# if/then/else truth table (draft-7+)
for draft in (D7, D20):
    CASES4.append((
        draft, "if-integer/then-min/else-string table",
        {"if": {"type": "integer"}, "then": {"minimum": 5},
         "else": {"type": "string"}},
        [(v, (v >= 5 if _type_ok("integer", v, False)
              else isinstance(v, str))) for v in _COMB_VALUES + [7, 3]]))

# ---------------------------------------------------------------------------
# 9. $dynamicRef x unevaluatedProperties — the round-3 matrix gap.
# Hand-derived expectations (spec: a $dynamicRef to a $dynamicAnchor
# resolves through the DYNAMIC scope, so the extended schema's
# properties are evaluated inside the ref and count as claims for the
# referencing schema's unevaluatedProperties; annotations flow back
# from the successful ref — reference core.cljc $dynamic* + annotation
# threading property.cljc:268-293).

# The canonical extensible-content shape (2020-12 core's tree
# example): a "node" resource whose content slot is open via
# $dynamicAnchor; a referencing root may RE-BIND the anchor in its own
# resource, and the $dynamicRef inside the node resource resolves to
# the OUTERMOST in-scope anchor — so the extension's `extra` property
# is evaluated inside the ref and claimed for the node's
# unevaluatedProperties: false.

_NODE_RESOURCE = {
    "$id": "node",
    "$dynamicRef": "#content",
    "unevaluatedProperties": False,
    "$defs": {
        "default-content": {
            "$dynamicAnchor": "content",
            "properties": {"kind": {"type": "string"}},
        },
    },
}

# Case A: outer re-binding — extra becomes evaluated.
_DYN_A = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://dyn.example/a",
    "$ref": "node",
    "$defs": {
        "node": _NODE_RESOURCE,
        "extension": {
            "$dynamicAnchor": "content",
            "properties": {"kind": {"type": "string"},
                           "extra": {"type": "integer"}},
        },
    },
}
CASES4.append((D20, "$dynamicRef x unevaluatedProperties outer-bind",
               _DYN_A, [
                   ({"kind": "a"}, True),
                   ({"kind": "a", "extra": 1}, True),
                   ({"extra": 1}, True),
                   ({"kind": "a", "extra": "x"}, False),  # extra type
                   ({"kind": "a", "other": 1}, False),    # unevaluated
                   ({}, True),
               ]))

# Case B: NO outer re-binding — the $dynamicRef falls back to the
# node resource's own default-content anchor; `extra` stays
# unevaluated and uP: false rejects it.
_DYN_B = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://dyn.example/b",
    "$ref": "node",
    "$defs": {"node": _NODE_RESOURCE},
}
CASES4.append((D20, "$dynamicRef no re-binding: extra unevaluated",
               _DYN_B, [
                   ({"kind": "a"}, True),
                   ({"kind": "a", "extra": 1}, False),  # unevaluated
                   ({}, True),
               ]))

# Case C: static-$ref control — same shape with $ref instead of
# $dynamicRef never sees the outer extension even when it exists.
_DYN_C = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://dyn.example/c",
    "$ref": "nodec",
    "$defs": {
        "nodec": {
            "$id": "nodec",
            "$ref": "#/$defs/default-content",
            "unevaluatedProperties": False,
            "$defs": {
                "default-content": {
                    "$dynamicAnchor": "content",
                    "properties": {"kind": {"type": "string"}},
                },
            },
        },
        "extension": {
            "$dynamicAnchor": "content",
            "properties": {"kind": {"type": "string"},
                           "extra": {"type": "integer"}},
        },
    },
}
CASES4.append((D20, "static $ref control: extra stays unevaluated",
               _DYN_C, [
                   ({"kind": "a"}, True),
                   ({"kind": "a", "extra": 1}, False),  # unevaluated
                   ({}, True),
               ]))


# ---------------------------------------------------------------------------
# 10. boolean schemas, propertyNames, patternProperties, tuple items

_ANY_VALUES = [None, True, 0, 1.5, "x", [], [1], {}, {"a": 1}]

for draft in (D6, D20):
    CASES4.append((draft, "boolean schema true accepts all", True,
                   [(v, True) for v in _ANY_VALUES]))
    CASES4.append((draft, "boolean schema false rejects all", False,
                   [(v, False) for v in _ANY_VALUES]))
    CASES4.append((draft, "properties with false sub-schema",
                   {"properties": {"a": False}},
                   [(o, "a" not in o if isinstance(o, dict) else True)
                    for o in _OBJECTS + ["s", 5]]))
    CASES4.append((draft, "propertyNames maxLength 1",
                   {"propertyNames": {"maxLength": 1}},
                   [(o, all(len(k) <= 1 for k in o)
                     if isinstance(o, dict) else True)
                    for o in [{}, {"a": 1}, {"ab": 1}, {"a": 1, "b": 2},
                              {"a": 1, "bb": 2}, "str", 7]]))

_PP_OBJECTS = [{}, {"ax": 1}, {"ax": "s"}, {"bx": 1}, {"ax": 1, "ay": 2},
               {"ax": "s", "bx": "t"}, {"zz": None}]
for draft in (D4, D20):
    CASES4.append((
        draft, "patternProperties ^a integer sweep",
        {"patternProperties": {"^a": {"type": "integer"}}},
        [(o, all(isinstance(v, int) and not isinstance(v, bool)
                 for k, v in o.items() if k.startswith("a"))
          if isinstance(o, dict) else True)
         for o in _PP_OBJECTS + ["s"]]))
    CASES4.append((
        draft, "additionalProperties false with props+patterns",
        {"properties": {"zz": {}},
         "patternProperties": {"^a": {}},
         "additionalProperties": False},
        [(o, all(k == "zz" or k.startswith("a") for k in o)
          if isinstance(o, dict) else True)
         for o in _PP_OBJECTS + [{"ax": 1, "q": 2}]]))

# tuple items + additionalItems (<=2019) / prefixItems + items (2020)
_TUPLES = [[], [1], [1, "a"], [1, "a", 2], [1, "a", "b"], ["x"],
           [1, 2], [1, "a", 2, 3], [1, "a", 2, "b"]]


def _tuple_ok(arr, rest_int):
    if not isinstance(arr, list):
        return True
    for i, v in enumerate(arr):
        if i == 0:
            if not (isinstance(v, int) and not isinstance(v, bool)):
                return False
        elif i == 1:
            if not isinstance(v, str):
                return False
        elif rest_int and not (isinstance(v, int)
                               and not isinstance(v, bool)):
            return False
    return True


_T_PREFIX = [{"type": "integer"}, {"type": "string"}]
for draft, sch_rest, sch_norest in (
        (D4, {"items": _T_PREFIX, "additionalItems": {"type": "integer"}},
         {"items": _T_PREFIX}),
        (D19, {"items": _T_PREFIX, "additionalItems": {"type": "integer"}},
         {"items": _T_PREFIX}),
        (D20, {"prefixItems": _T_PREFIX, "items": {"type": "integer"}},
         {"prefixItems": _T_PREFIX})):
    CASES4.append((draft, "tuple prefix + integer rest", sch_rest,
                   [(a, _tuple_ok(a, True)) for a in _TUPLES]))
    CASES4.append((draft, "tuple prefix open rest", sch_norest,
                   [(a, _tuple_ok(a, False)) for a in _TUPLES]))

# unknown format never asserts, in any draft (annotation pass-through)
for draft in (D4, D7, D20):
    CASES4.append((draft, "unknown format passes",
                   {"format": "no-such-format"},
                   [("x", True), ("", True), (42, True), (None, True),
                    ([1], True), ({"a": 1}, True)]))
