"""Corpus expansion (round 5), part 2: closed-form keyword sweeps.

Every expected verdict is computed IN THIS FILE by an independent
mini-model of the spec rule (Decimal arithmetic for multipleOf,
Fraction-based json-= for enum/const/uniqueItems, codepoint counts for
lengths, plain combinatorics for presence keywords) — never by running
an engine.  The sweeps densify boundary coverage the hand-written
groups spot-check: representation boundaries (1 vs 1.0 vs 2^53),
draft-gated semantics (strict draft-3/4 integers, contains vs
minContains eras, items vs prefixItems eras), and applicator truth
tables.

Same group shape as tests/corpus.py:
    (draft, description, schema, [(data, expected_valid), ...])
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

D3, D4, D6, D7 = "draft3", "draft4", "draft6", "draft7"
D19, D20 = "draft2019-09", "draft2020-12"
ALL = (D3, D4, D6, D7, D19, D20)

CASES6 = []


def _num(x):
    """json number as an exact rational (json-= mini-model)."""
    if isinstance(x, bool):
        return None
    if isinstance(x, int):
        return Fraction(x)
    if isinstance(x, float):
        return Fraction(x)
    return None


def _json_eq(a, b):
    """Reference json-= : numbers compare mathematically (kind-blind),
    bool is distinct from 0/1, containers compare structurally."""
    na, nb = _num(a), _num(b)
    if na is not None and nb is not None:
        return na == nb
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if type(a) is not type(b) and not (
            isinstance(a, (list, dict)) and type(a) is type(b)):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(
            _json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(
            _json_eq(v, b[k]) for k, v in a.items())
    return a == b


# ---------------------------------------------------------------------------
# integer semantics per draft era

_INT_VALUES = [1, 0, -2, 1.0, -2.0, 0.0, 1.5, -0.5, 1e2, 2.0**53,
               True, False, "1", [1], None, 3.000000001]

for draft in ALL:
    tests = []
    for v in _INT_VALUES:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            ok = False
        elif isinstance(v, int):
            ok = True
        else:  # float: zero-fraction counts from draft-6 on
            ok = draft not in (D3, D4) and float(v).is_integer()
        tests.append((v, ok))
    CASES6.append((draft, "integer era sweep", {"type": "integer"},
                   tests))

# ---------------------------------------------------------------------------
# multipleOf / divisibleBy: BigDecimal-exact over decimal divisors

_MOF_DIVISORS = ["0.01", "0.1", "0.2", "2.5", "3", "7", "0.0001"]
_MOF_VALUES = [0.03, 0.05, 0.07, 1.0, 2.5, 7.5, 4.02, 0.0075, 33, 0.3,
               0.6, 1.07, 21, 0.021, 10]

for draft in (D3, D4, D20):
    kw = "divisibleBy" if draft == D3 else "multipleOf"
    for dstr in _MOF_DIVISORS:
        d = Decimal(dstr)
        tests = []
        for v in _MOF_VALUES:
            # reference semantics: Decimal(str(v)) — the shortest
            # round-trip decimal — modulo the literal divisor
            ok = (Decimal(str(v)) % d) == 0
            tests.append((v, bool(ok)))
        # non-numbers are never constrained
        tests.append(("0.03", True))
        tests.append((True, True))
        CASES6.append((draft, f"{kw} {dstr} exact sweep",
                       {kw: float(dstr) if "." in dstr else int(dstr)},
                       tests))

# ---------------------------------------------------------------------------
# length keywords: codepoint counts (incl. astral + combining)

_LEN_STRINGS = ["", "a", "ab", "abc", "\U0001F600",
                "\U0001F600\U0001F600", "é", "é", "abé"]

for draft in (D4, D20):
    for n in range(5):
        CASES6.append((
            draft, f"minLength {n} codepoint sweep", {"minLength": n},
            [(s, len(s) >= n) for s in _LEN_STRINGS] + [(5, True)]))
        CASES6.append((
            draft, f"maxLength {n} codepoint sweep", {"maxLength": n},
            [(s, len(s) <= n) for s in _LEN_STRINGS] + [([], True)]))

# ---------------------------------------------------------------------------
# numeric bounds at representation boundaries

_BOUND_SWEEP = [
    # (keyword, bound, values)
    ("minimum", 3, [3, 3.0, 2.999999, 4, 2, -3, 3.0000001]),
    ("maximum", 3, [3, 3.0, 3.000001, 2, 4, -4]),
    ("exclusiveMinimum", 3, [3, 3.0, 3.0000001, 4, 2]),
    ("exclusiveMaximum", 3, [3, 3.0, 2.9999999, 2, 4]),
    ("minimum", 1.5, [1.5, 1.49, 2, 1]),
    ("maximum", -2.5, [-2.5, -2.51, -2, -3]),
]

for draft in (D6, D20):
    for kw, bound, values in _BOUND_SWEEP:
        frac_b = Fraction(str(bound)) if isinstance(bound, float) \
            else Fraction(bound)
        tests = []
        for v in values:
            fv = _num(v)
            if kw == "minimum":
                ok = fv >= frac_b
            elif kw == "maximum":
                ok = fv <= frac_b
            elif kw == "exclusiveMinimum":
                ok = fv > frac_b
            else:
                ok = fv < frac_b
            tests.append((v, bool(ok)))
        tests.append(("str", True))
        CASES6.append((draft, f"{kw} {bound} boundary sweep",
                       {kw: bound}, tests))

# draft-3/4 boolean exclusive modifiers
for draft in (D3, D4):
    for excl in (False, True):
        tests = []
        for v in [3, 3.0, 2.999, 3.001, 4]:
            fv = _num(v)
            ok = fv > 3 if excl else fv >= 3
            tests.append((v, bool(ok)))
        CASES6.append((
            draft, f"minimum 3 exclusive={excl} (boolean form)",
            {"minimum": 3, "exclusiveMinimum": excl}, tests))

# ---------------------------------------------------------------------------
# enum / const across the int-float representation boundary

_EQ_PAIRS = [
    (1, 1.0), (0, -0.0), (0, False), (1, True),
    (2**53, 2.0**53), (10**20, 1e20),
    (2**63, float(2**63)), (2**63 + 1, float(2**63 + 1)),
    (2**53 + 1, float(2**53 + 1)),
    (0.1, 0.1), (0.5, Fraction(1, 2)),
    ([1, 2], [1.0, 2.0]), ({"a": 1}, {"a": 1.0}),
    ("1", 1), (1.25, 1.25),
]

for draft in (D6, D20):
    for lit, probe in _EQ_PAIRS:
        if isinstance(probe, Fraction):
            probe = float(probe)
        exp = _json_eq(lit, probe)
        CASES6.append((
            draft, f"const json-eq {lit!r} probe {probe!r}",
            {"const": lit}, [(probe, exp), (lit, True)]))
        CASES6.append((
            draft, f"enum json-eq {lit!r} probe {probe!r}",
            {"enum": [lit, "sentinel"]},
            [(probe, exp), ("sentinel", True), ("other", False)]))

# ---------------------------------------------------------------------------
# uniqueItems under json-=

_UNIQ_ARRAYS = [
    [1, 1.0], [1, 2], [True, 1], [False, 0], [0, -0.0],
    [[1], [1.0]], [{"a": 1}, {"a": 1.0}], [{"a": 1}, {"a": 2}],
    ["a", "a"], ["a", "b"], [None, None], [], [1],
    [1, 2, 1.0],
]

for draft in (D4, D20):
    tests = []
    for arr in _UNIQ_ARRAYS:
        dup = any(_json_eq(arr[i], arr[j])
                  for i in range(len(arr)) for j in range(i + 1, len(arr)))
        tests.append((arr, not dup))
    CASES6.append((draft, "uniqueItems json-eq sweep",
                   {"uniqueItems": True}, tests))

# ---------------------------------------------------------------------------
# contains / minContains / maxContains across the eras

_CONTAINS_ARRAYS = [[], [1], [1, 5], [5, 6], [1, 2, 5], [5, 5, 5],
                    [4, 4, 4, 4]]

for draft in (D6, D7, D19, D20):
    combos = [(None, None)]
    if draft in (D19, D20):
        combos += [(0, None), (1, None), (2, None), (None, 1), (2, 3),
                   (3, 2), (0, 0)]
    for mn, mx in combos:
        schema = {"contains": {"minimum": 4}}
        if mn is not None:
            schema["minContains"] = mn
        if mx is not None:
            schema["maxContains"] = mx
        tests = []
        for arr in _CONTAINS_ARRAYS:
            c = sum(1 for x in arr
                    if isinstance(x, (int, float))
                    and not isinstance(x, bool) and x >= 4)
            lo = mn if mn is not None else 1
            ok = c >= lo and (mx is None or c <= mx)
            tests.append((arr, ok))
        tests.append(("not-an-array", True))
        CASES6.append((draft,
                       f"contains min={mn} max={mx} era sweep",
                       schema, tests))

# ---------------------------------------------------------------------------
# required presence combinatorics (and draft-3 boolean form)

_KEYS = ("a", "b", "c")
_SUBSETS = [frozenset(s) for s in (
    (), ("a",), ("b",), ("c",), ("a", "b"), ("a", "c"), ("b", "c"),
    ("a", "b", "c"))]


def _doc_of(subset):
    return {k: 1 for k in sorted(subset)}


for draft in (D4, D20):
    for req in ([], ["a"], ["a", "b"], ["a", "b", "c"]):
        CASES6.append((
            draft, f"required {req} subset sweep",
            {"required": req} if req else {"properties": {"a": {}}},
            [(_doc_of(s), set(req) <= s) for s in _SUBSETS]))

# draft-3: required is a boolean INSIDE the property schema
CASES6.append((
    D3, "draft3 required:true property form",
    {"properties": {"a": {"required": True}, "b": {"required": False}}},
    [(_doc_of(s), "a" in s) for s in _SUBSETS]))

# dependentRequired (2019+) and dependencies array (pre-2019)
for draft, kw in ((D4, "dependencies"), (D7, "dependencies"),
                  (D19, "dependentRequired"), (D20, "dependentRequired")):
    CASES6.append((
        draft, f"{kw} a->[b,c] subset sweep",
        {kw: {"a": ["b", "c"]}},
        [(_doc_of(s), ("a" not in s) or {"b", "c"} <= s)
         for s in _SUBSETS]))

# min/maxProperties count sweep
for draft in (D4, D20):
    for kw, n in (("minProperties", 0), ("minProperties", 2),
                  ("maxProperties", 1), ("maxProperties", 2)):
        ok = ((lambda s, _n=n: len(s) >= _n) if kw == "minProperties"
              else (lambda s, _n=n: len(s) <= _n))
        CASES6.append((
            draft, f"{kw} {n} subset sweep", {kw: n},
            [(_doc_of(s), ok(s)) for s in _SUBSETS] + [([1, 2], True)]))

# ---------------------------------------------------------------------------
# tuple/array era matrix: items list + additionalItems (<=2019) vs
# prefixItems + items (2020)

_TUPLE_ARRAYS = [[], [1], [1, "x"], [1, "x", 2], [1, "x", 2, 3],
                 ["bad"], [1, 5]]
_PREFIX = [{"type": "integer"}, {"type": "string"}]


def _tuple_ok(arr, n_prefix, extra_policy):
    """extra_policy: None = anything allowed, False = none allowed,
    'int' = must be integers."""
    checks = [(lambda x: isinstance(x, int) and not isinstance(x, bool)),
              (lambda x: isinstance(x, str))]
    for i, x in enumerate(arr):
        if i < n_prefix:
            if not checks[i](x):
                return False
        else:
            if extra_policy is False:
                return False
            if extra_policy == "int" and not (
                    isinstance(x, int) and not isinstance(x, bool)):
                return False
    return True


for draft in (D4, D7, D19):
    for extra, ap in ((None, None), (False, False), ("int",
                                                     {"type": "integer"})):
        schema = {"items": list(_PREFIX)}
        if ap is not None:
            schema["additionalItems"] = ap
        CASES6.append((
            draft, f"tuple items additional={extra} era sweep", schema,
            [(arr, _tuple_ok(arr, 2, extra)) for arr in _TUPLE_ARRAYS]))

for extra, ap in ((None, None), (False, False), ("int",
                                                 {"type": "integer"})):
    schema = {"prefixItems": list(_PREFIX)}
    if ap is not None:
        schema["items"] = ap
    CASES6.append((
        D20, f"prefixItems items={extra} 2020 sweep", schema,
        [(arr, _tuple_ok(arr, 2, extra)) for arr in _TUPLE_ARRAYS]))

# 2020: additionalItems is dead — it must be IGNORED next to prefixItems
CASES6.append((
    D20, "additionalItems ignored in 2020",
    {"prefixItems": [{"type": "integer"}], "additionalItems": False},
    [([1, "extra", "extra2"], True), ([1], True), (["bad"], False)]))

# pre-2020: schema-form items applies to every element
for draft in (D4, D20):
    kw_schema = {"items": {"type": "integer"}}
    CASES6.append((
        draft, "schema-form items every element", kw_schema,
        [([], True), ([1, 2, 3], True), ([1, "x"], False),
         (["x"], False), ([True], False)]))

# min/maxItems sweep
for draft in (D3, D20):
    for kw, n in (("minItems", 0), ("minItems", 2), ("maxItems", 1),
                  ("maxItems", 3)):
        ok = ((lambda a, _n=n: len(a) >= _n) if kw == "minItems"
              else (lambda a, _n=n: len(a) <= _n))
        arrays = [[], [1], [1, 2], [1, 2, 3], [1, 2, 3, 4]]
        CASES6.append((
            draft, f"{kw} {n} sweep", {kw: n},
            [(a, ok(a)) for a in arrays] + [("str", True)]))

# ---------------------------------------------------------------------------
# combinator truth tables over bounds branches

_BRANCH_SETS = [
    [{"minimum": 2}, {"maximum": 4}],
    [{"minimum": 4}, {"maximum": 1}],
    [{"multipleOf": 2}, {"multipleOf": 3}],
    [{"minimum": 0}, {"minimum": 3}, {"maximum": 2}],
]
_COMB_VALUES = [0, 1, 2, 3, 4, 5, 6]


def _branch_ok(branch, v):
    for k, b in branch.items():
        if k == "minimum" and not v >= b:
            return False
        if k == "maximum" and not v <= b:
            return False
        if k == "multipleOf" and not v % b == 0:
            return False
    return True


for draft in (D4, D20):
    for branches in _BRANCH_SETS:
        oks = {v: [_branch_ok(b, v) for b in branches]
               for v in _COMB_VALUES}
        CASES6.append((
            draft, f"allOf truth table {branches}",
            {"allOf": branches},
            [(v, all(oks[v])) for v in _COMB_VALUES]))
        CASES6.append((
            draft, f"anyOf truth table {branches}",
            {"anyOf": branches},
            [(v, any(oks[v])) for v in _COMB_VALUES]))
        CASES6.append((
            draft, f"oneOf truth table {branches}",
            {"oneOf": branches},
            [(v, sum(oks[v]) == 1) for v in _COMB_VALUES]))
        CASES6.append((
            draft, f"not-allOf truth table {branches}",
            {"not": {"allOf": branches}},
            [(v, not all(oks[v])) for v in _COMB_VALUES]))

# if/then/else presence matrix: every subset of the three keywords
for draft in (D7, D19, D20):
    for has_then in (False, True):
        for has_else in (False, True):
            schema = {"if": {"minimum": 3}}
            if has_then:
                schema["then"] = {"multipleOf": 2}
            if has_else:
                schema["else"] = {"multipleOf": 5}
            tests = []
            for v in [0, 2, 3, 4, 5, 6, 10]:
                if v >= 3:
                    ok = (v % 2 == 0) if has_then else True
                else:
                    ok = (v % 5 == 0) if has_else else True
                tests.append((v, ok))
            CASES6.append((
                draft,
                f"if/then={has_then}/else={has_else} matrix",
                schema, tests))

# then/else without if are inert
for draft in (D7, D20):
    CASES6.append((
        draft, "then/else inert without if",
        {"then": {"multipleOf": 2}, "else": {"multipleOf": 5}},
        [(v, True) for v in [1, 2, 3, 7]]))

# if/then/else are UNKNOWN keywords before draft-7
for draft in (D4, D6):
    CASES6.append((
        draft, "if/then/else unknown pre-draft-7",
        {"if": {"minimum": 3}, "then": {"multipleOf": 2}},
        [(3, True), (5, True), (4, True), (0, True)]))

# ---------------------------------------------------------------------------
# draft-3 long tail: disallow, extends, union types with schemas, any

_D3_VALUES = [1, 1.5, "s", True, [1], {"a": 1}, None]


def _d3_type_ok(t, v):
    if t == "integer":
        return isinstance(v, int) and not isinstance(v, bool)
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "boolean":
        return isinstance(v, bool)
    if t == "array":
        return isinstance(v, list)
    if t == "object":
        return isinstance(v, dict)
    if t == "null":
        return v is None
    if t == "any":
        return True
    return False


for t in ("integer", "number", "string", "boolean", "array", "object",
          "null", "any"):
    CASES6.append((
        D3, f"draft3 type {t} matrix", {"type": t},
        [(v, _d3_type_ok(t, v)) for v in _D3_VALUES]))
    CASES6.append((
        D3, f"draft3 disallow {t} matrix", {"disallow": t},
        [(v, not _d3_type_ok(t, v)) for v in _D3_VALUES]))

# union type with an embedded schema (draft-3 only)
CASES6.append((
    D3, "draft3 union type with schema member",
    {"type": ["string", {"type": "number", "minimum": 3}]},
    [("s", True), (4, True), (2, False), (True, False), ([1], False)]))
CASES6.append((
    D3, "draft3 disallow union with schema member",
    {"disallow": ["string", {"type": "number", "minimum": 3}]},
    [("s", False), (4, False), (2, True), (True, True)]))

# extends: single and array (conjunctive)
CASES6.append((
    D3, "draft3 extends single",
    {"minimum": 1, "extends": {"maximum": 5}},
    [(3, True), (0, False), (6, False), (1, True), (5, True)]))
CASES6.append((
    D3, "draft3 extends array",
    {"extends": [{"minimum": 1}, {"maximum": 5}, {"divisibleBy": 2}]},
    [(2, True), (4, True), (3, False), (0, False), (6, False)]))

# draft-3 dependencies: string form
CASES6.append((
    D3, "draft3 dependencies string form",
    {"dependencies": {"a": "b"}},
    [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({"b": 2}, True),
     ({}, True)]))

# ---------------------------------------------------------------------------
# propertyNames era sweep (draft-6+)

for draft in (D6, D20):
    CASES6.append((
        draft, "propertyNames pattern sweep",
        {"propertyNames": {"pattern": "^[a-z]+$"}},
        [({"ab": 1}, True), ({"ab": 1, "cd": 2}, True),
         ({"Ab": 1}, False), ({"a1": 1}, False), ({}, True),
         ({"ab": 1, "C": 2}, False), ([1], True)]))
CASES6.append((
    D4, "propertyNames unknown pre-draft-6",
    {"propertyNames": {"pattern": "^[a-z]+$"}},
    [({"NOPE!": 1}, True), ({}, True)]))

# ---------------------------------------------------------------------------
# ECMA-262 pattern battery: unambiguous regex facts (search semantics,
# anchors, classes, quantifiers, lookaround, escapes) — expectations
# straight from the ECMA-262 pattern grammar, identical across engines

_PATTERN_VECTORS = [
    # (pattern, [(string, matches)])
    ("^abc$", [("abc", True), ("xabc", False), ("abcx", False)]),
    ("bc", [("abcd", True), ("bc", True), ("bd", False)]),  # search!
    ("\\d+", [("a1", True), ("123", True), ("abc", False)]),
    ("\\D", [("1a", True), ("12", False)]),
    ("\\w+", [("a_1", True), ("...", False)]),
    ("\\s", [("a b", True), ("ab", False)]),
    ("a{2,3}", [("aa", True), ("aaa", True), ("a", False),
                ("baab", True)]),
    ("a{2,}", [("aa", True), ("a", False)]),
    ("(?=ab)a", [("ab", True), ("ac", False)]),
    ("a(?!b)", [("ac", True), ("ab", False), ("aba", True)]),
    ("\\bword\\b", [("a word here", True), ("sword", False),
                    ("word", True), ("wordy", False)]),
    ("[A-Z]", [("aBc", True), ("abc", False)]),
    ("[^a-z]", [("abc1", True), ("abc", False)]),
    ("a.c", [("abc", True), ("a\nc", False), ("axc", True)]),  # . != \n
    ("(a)\\1", [("aa", True), ("ab", False)]),
    ("\\u0041+", [("AA", True), ("B", False)]),
    ("\\x41", [("A", True), ("B", False)]),
    ("a|bc", [("a", True), ("bc", True), ("c", False)]),
    ("colou?r", [("color", True), ("colour", True), ("colr", False)]),
    ("^$", [("", True), ("a", False)]),
    ("a+?b", [("aab", True), ("aa", False)]),   # lazy still must match
    ("[.]", [("a.b", True), ("ab", False)]),    # dot literal in class
    ("\\.", [("a.b", True), ("ab", False)]),
    ("(?:ab)+c", [("ababc", True), ("abc", True), ("ac", False)]),
    ("(?<y>[0-9]{4})-", [("2024-", True), ("202-", False)]),
]

for draft in (D4, D20):
    for pat, vectors in _PATTERN_VECTORS:
        CASES6.append((
            draft, f"ECMA pattern {pat!r}", {"pattern": pat},
            list(vectors) + [(7, True)]))  # non-strings unconstrained

# patternProperties x additionalProperties closed-form combos
_PP_DOCS = [{}, {"x_a": 1}, {"x_a": "s"}, {"other": 1},
            {"x_a": 1, "other": 1}, {"x_b": 2, "x_c": 3}]

for draft in (D4, D20):
    for ap in (None, False, {"type": "string"}):
        schema = {"patternProperties": {"^x_": {"type": "integer"}}}
        if ap is not None:
            schema["additionalProperties"] = ap
        tests = []
        for doc in _PP_DOCS:
            ok = True
            for k, v in doc.items():
                if k.startswith("x_"):
                    if not (isinstance(v, int)
                            and not isinstance(v, bool)):
                        ok = False
                else:
                    if ap is False:
                        ok = False
                    elif ap is not None and not isinstance(v, str):
                        ok = False
            tests.append((doc, ok))
        CASES6.append((
            draft, f"patternProperties x additional={ap!r}", schema,
            tests))
