"""Corpus expansion (round 2): official-suite-style groups written from
the JSON Schema specs, growing assertion coverage toward the reference's
10k-assertion bar (the official suite submodules are empty in the
reference checkout, so these are authored fresh; semantics cross-checked
against the reference's checker sources cited in SURVEY.md §2).

Same group shape as tests/corpus.py:
    (draft, description, schema, [(data, expected_valid), ...])
"""

from __future__ import annotations

D3, D4, D6, D7, D19, D20 = ("draft3", "draft4", "draft6", "draft7",
                            "draft2019-09", "draft2020-12")
DN = "draft-next"

# ---------------------------------------------------------------- type matrix

_TYPE_VALUES = [
    ("int", 0), ("float_frac", 1.5), ("float_whole", 3.0), ("str", "s"),
    ("empty_str", ""), ("bool", True), ("null", None), ("arr", []),
    ("obj", {}),
]

# which sample values each JSON type accepts (draft6+: whole floats are
# integers; draft4: not)
_TYPE_ACCEPT = {
    "integer": {"int", "float_whole"},
    "number": {"int", "float_frac", "float_whole"},
    "string": {"str", "empty_str"},
    "boolean": {"bool"},
    "null": {"null"},
    "array": {"arr"},
    "object": {"obj"},
}


def _type_matrix():
    groups = []
    for tname, accept in _TYPE_ACCEPT.items():
        tests20 = [(v, label in accept) for label, v in _TYPE_VALUES]
        groups.append((D20, f"type matrix {tname} (2020-12)",
                       {"type": tname}, tests20))
        accept4 = accept - ({"float_whole"} if tname == "integer" else set())
        tests4 = [(v, label in accept4) for label, v in _TYPE_VALUES]
        groups.append((D4, f"type matrix {tname} (draft4 strict int)",
                       {"type": tname}, tests4))
    return groups


CASES2 = _type_matrix() + [
    # ------------------------------------------------------------- numbers
    (D20, "minimum at negative zero", {"minimum": 0},
     [(-0.0, True), (0, True), (-1e-9, False)]),
    (D20, "maximum at negative zero", {"maximum": -0.0},
     [(0.0, True), (0, True), (1e-9, False), (-1, True)]),
    (D20, "minimum large int vs float precision", {"minimum": 2**53 + 1},
     [(2**53 + 1, True), (2**53, False), (2**53 + 2, True)]),
    (D20, "bounds accept equal large decimal", {"minimum": 1e308},
     [(1e308, True), (1e307, False)]),
    (D20, "exclusiveMinimum large", {"exclusiveMinimum": 100},
     [(100, False), (100.0, False), (100.5, True), (101, True)]),
    (D4, "d4 minimum + exclusiveMinimum false",
     {"minimum": 5, "exclusiveMinimum": False},
     [(5, True), (4.9, False)]),
    (D4, "d4 maximum + exclusiveMaximum true",
     {"maximum": 5, "exclusiveMaximum": True},
     [(5, False), (4.999, True), (5.001, False)]),
    (D3, "d3 minimum + exclusiveMinimum boolean",
     {"minimum": 2, "exclusiveMinimum": True},
     [(2, False), (2.1, True)]),
    (D20, "multipleOf one accepts any integer", {"multipleOf": 1},
     [(42, True), (42.0, True), (42.5, False), (-7, True), (0, True)]),
    (D20, "multipleOf negative value", {"multipleOf": 3},
     [(-9, True), (-10, False)]),
    (D20, "multipleOf 0.1 float trap", {"multipleOf": 0.1},
     [(0.3, True), (0.7, True), (1.0, True), (0.75, False)]),
    (D20, "multipleOf 0.0001 precision", {"multipleOf": 0.0001},
     [(12.3456, True), (12.34567, False)]),
    (D20, "multipleOf large divisor", {"multipleOf": 1000000},
     [(3000000, True), (3000001, False), (0, True)]),
    (D3, "divisibleBy fraction (draft3)", {"divisibleBy": 0.5},
     [(1.5, True), (1.75, False)]),
    (D20, "number keyword ignores strings", {"multipleOf": 2, "minimum": 10},
     [("3", True), (None, True), ([], True)]),

    # ------------------------------------------------------------- strings
    (D20, "minLength surrogate pairs count once", {"minLength": 3},
     [("\U0001F600ab", True), ("\U0001F600\U0001F600", False),
      ("abc", True)]),
    (D20, "maxLength combining characters count separately",
     {"maxLength": 2},
     [("é", True), ("é́", False)]),
    (D20, "minLength zero accepts empty", {"minLength": 0},
     [("", True), ("a", True)]),
    (D20, "pattern finds anywhere (not anchored)", {"pattern": "cat"},
     [("concatenate", True), ("cta", False), ("cat", True)]),
    (D20, "pattern with anchors and alternation", {"pattern": "^(a|b)+$"},
     [("abab", True), ("abc", False), ("", False)]),
    (D20, "pattern character class with dash", {"pattern": "^[a-c-]+$"},
     [("a-c", True), ("d", False)]),
    (D20, "pattern dot does not match newline", {"pattern": "^a.b$"},
     [("axb", True), ("a\nb", False)]),
    (D20, "pattern case sensitive", {"pattern": "^A$"},
     [("A", True), ("a", False)]),
    (D20, "pattern backreference", {"pattern": "^(ab)\\1$"},
     [("abab", True), ("abba", False)]),
    (D20, "pattern quantifier braces", {"pattern": "^a{2,3}$"},
     [("aa", True), ("aaa", True), ("a", False), ("aaaa", False)]),
    (D20, "pattern unicode escape \\u0041", {"pattern": "\\u0041"},
     [("A here", True), ("B", False)]),
    (D20, "pattern lookahead", {"pattern": "^(?=.*\\d).+$"},
     [("a1", True), ("ab", False)]),

    # ---------------------------------------------------------- enum/const
    (D20, "enum single value", {"enum": ["only"]},
     [("only", True), ("Only", False), (None, False)]),
    (D20, "enum numeric tolerance both ways", {"enum": [1.0, 2]},
     [(1, True), (1.0, True), (2.0, True), (2, True), (3, False)]),
    (D20, "enum deep array order matters", {"enum": [[1, 2]]},
     [([1, 2], True), ([2, 1], False), ([1, 2, 3], False)]),
    (D20, "enum object key order ignored", {"enum": [{"a": 1, "b": 2}]},
     [({"b": 2, "a": 1}, True), ({"a": 1}, False),
      ({"a": 1, "b": 2, "c": 3}, False)]),
    (D20, "const false is not zero", {"const": False},
     [(False, True), (0, False), ("", False), (None, False)]),
    (D20, "const zero is not false", {"const": 0},
     [(0, True), (0.0, True), (False, False), (-0.0, True)]),
    (D20, "const empty object", {"const": {}},
     [({}, True), ({"a": 1}, False), ([], False)]),
    (D20, "const nested numeric tolerance",
     {"const": {"xs": [1, 2.0], "n": 3}},
     [({"xs": [1.0, 2], "n": 3.0}, True), ({"xs": [1, 2], "n": 4}, False)]),
    (D20, "enum string vs number distinction", {"enum": ["1", 2]},
     [("1", True), (1, False), (2, True), ("2", False)]),

    # ------------------------------------------------------------- objects
    (D20, "properties empty object always passes", {"properties": {}},
     [({}, True), ({"a": 1}, True), (5, True)]),
    (D20, "nested properties two levels",
     {"properties": {"a": {"properties": {"b": {"type": "null"}}}}},
     [({"a": {"b": None}}, True), ({"a": {"b": 1}}, False),
      ({"a": {}}, True), ({"a": 5}, True)]),
    (D20, "patternProperties multiple patterns both apply",
     {"patternProperties": {"^x": {"minimum": 1}, "x$": {"maximum": 5}}},
     [({"xax": 3}, True), ({"xax": 0}, False), ({"xax": 6}, False),
      ({"xa": 0}, False), ({"ax": 9}, False)]),
    (D20, "properties and patternProperties both apply",
     {"properties": {"ab": {"minimum": 2}},
      "patternProperties": {"^a": {"maximum": 5}}},
     [({"ab": 3}, True), ({"ab": 1}, False), ({"ab": 6}, False)]),
    (D20, "additionalProperties sees through both",
     {"properties": {"p": True}, "patternProperties": {"^q": True},
      "additionalProperties": {"type": "null"}},
     [({"p": 1, "q1": 2, "other": None}, True), ({"other": 1}, False)]),
    (D20, "propertyNames pattern",
     {"propertyNames": {"pattern": "^[a-z]+$"}},
     [({"abc": 1}, True), ({"Abc": 1}, False), ({"a1": 1}, False)]),
    (D20, "minProperties boundary", {"minProperties": 2},
     [({"a": 1, "b": 2}, True), ({"a": 1}, False), ([1, 2, 3], True)]),
    (D20, "maxProperties zero means empty", {"maxProperties": 0},
     [({}, True), ({"a": 1}, False)]),
    (D19, "dependentRequired multiple deps",
     {"dependentRequired": {"a": ["b", "c"]}},
     [({"a": 1, "b": 2, "c": 3}, True), ({"a": 1, "b": 2}, False),
      ({"c": 3}, True)]),
    (D19, "dependentSchemas with type narrowing",
     {"dependentSchemas": {"credit": {"properties":
                                      {"billing": {"type": "string"}},
                                      "required": ["billing"]}}},
     [({"credit": 1, "billing": "x"}, True),
      ({"credit": 1, "billing": 2}, False),
      ({"credit": 1}, False), ({"billing": 2}, True)]),
    (D7, "dependencies mixed array and schema",
     {"dependencies": {"a": ["b"], "c": {"minProperties": 2}}},
     [({"a": 1, "b": 2}, True), ({"a": 1}, False),
      ({"c": 1, "d": 2}, True), ({"c": 1}, False)]),
    (D20, "required ignores non-objects", {"required": ["a"]},
     [([], True), ("a", True), (None, True), ({}, False)]),
    (D3, "draft3 optional by default",
     {"properties": {"a": {"type": "integer"}}},
     [({}, True), ({"a": 1}, True), ({"a": "s"}, False)]),
    (D3, "draft3 required true on two properties",
     {"properties": {"a": {"required": True}, "b": {"required": True}}},
     [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({}, False)]),
    (D20, "empty property name",
     {"properties": {"": {"type": "integer"}}, "required": [""]},
     [({"": 1}, True), ({"": "s"}, False), ({"a": 1}, False)]),
    (D20, "unicode property names",
     {"properties": {"é": {"const": 1}}, "required": ["é"]},
     [({"é": 1}, True), ({"é": 2}, False), ({}, False)]),

    # -------------------------------------------------------------- arrays
    (D4, "d4 items array (tuple) ignores extras",
     {"items": [{"type": "string"}, {"type": "integer"}]},
     [(["a", 1], True), (["a", 1, {"any": "thing"}], True),
      ([1, "a"], False), ([], True)]),
    (D6, "d6 tuple + additionalItems false",
     {"items": [{"type": "string"}], "additionalItems": False},
     [(["a"], True), (["a", "b"], False), ([], True)]),
    (D7, "d7 additionalItems ignored when items is schema",
     {"items": {"type": "integer"}, "additionalItems": False},
     [([1, 2, 3], True), (["a"], False)]),
    (D20, "prefixItems alone ignores extras",
     {"prefixItems": [{"type": "integer"}]},
     [([1, "anything"], True), (["a"], False), ([], True)]),
    (D20, "items false with prefixItems",
     {"prefixItems": [{"type": "integer"}], "items": False},
     [([1], True), ([1, 2], False), ([], True)]),
    (D20, "contains counts all matches",
     {"contains": {"minimum": 5}, "minContains": 2},
     [([5, 6], True), ([5, 1], False), ([7, 8, 9], True)]),
    (D19, "minContains 0 without contains is no-op",
     {"minContains": 0},
     [([], True), ([1], True)]),
    (D20, "uniqueItems false allows dups", {"uniqueItems": False},
     [([1, 1], True)]),
    (D20, "uniqueItems mixed types", {"uniqueItems": True},
     [([1, "1"], True), ([None, False, 0, ""], True),
      ([{"a": 1}, {"b": 1}], True), ([[], {}], True)]),
    (D20, "uniqueItems empty and singleton", {"uniqueItems": True},
     [([], True), ([1], True)]),
    (D20, "minItems ignores non-arrays", {"minItems": 2},
     [("ab", True), ({"a": 1, "b": 2}, True), ([1], False)]),
    (D20, "nested items",
     {"items": {"items": {"type": "integer"}}},
     [([[1], [2, 3]], True), ([[1], ["a"]], False), ([], True)]),

    # --------------------------------------------------------- combinators
    (D20, "allOf three branches",
     {"allOf": [{"minimum": 0}, {"maximum": 10}, {"multipleOf": 2}]},
     [(4, True), (3, False), (12, False), (-2, False)]),
    (D20, "allOf nested anyOf",
     {"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
                {"anyOf": [{"type": "number", "minimum": 5},
                           {"type": "string", "maxLength": 3}]}]},
     [(6, True), (2, False), ("ab", True), ("abcd", False)]),
    (D20, "anyOf first match short-circuits semantics only",
     {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
     [(1, True), (2.5, True), (1.5, False)]),
    (D20, "oneOf none match",
     {"oneOf": [{"type": "number", "minimum": 5}, {"type": "string"}]},
     [(1, False), (6, True), ("s", True)]),
    (D20, "oneOf match counting (bounds ignore non-numbers)",
     {"oneOf": [{"minimum": 0}, {"maximum": 10}, {"multipleOf": 1}]},
     # 5 matches all three -> invalid; -5 matches maximum+multipleOf ->
     # invalid; 11.5 matches only minimum -> valid; strings match all
     # three vacuously -> invalid
     [(5, False), (-5, False), (11, False), (11.5, True), ("s", False)]),
    (D20, "not object schema",
     {"not": {"properties": {"a": {"type": "integer"}}, "required": ["a"]}},
     [({"a": 1}, False), ({"a": "s"}, True), ({}, True)]),
    (D20, "double negation with constraints",
     {"not": {"not": {"minimum": 5}}},
     # strings satisfy {"minimum": 5} vacuously, so they survive the
     # double negation too
     [(6, True), (4, False), ("s", True)]),
    (D20, "if/then only", {"if": {"minimum": 5}, "then": {"multipleOf": 2}},
     [(6, True), (5, False), (4, True), ("s", True)]),
    (D20, "if/else only", {"if": {"minimum": 5}, "else": {"multipleOf": 2}},
     [(6, True), (4, True), (3, False)]),
    (D20, "chained conditionals via allOf",
     {"allOf": [{"if": {"type": "integer"}, "then": {"minimum": 0}},
                {"if": {"type": "string"}, "then": {"minLength": 2}}]},
     [(1, True), (-1, False), ("ab", True), ("a", False), (None, True)]),
    (D20, "then without if is ignored", {"then": {"type": "string"}},
     [(1, True), ("s", True)]),
    (D20, "else without if is ignored", {"else": {"type": "string"}},
     [(1, True)]),
    (D3, "extends array (draft3)",
     {"extends": [{"minimum": 1}, {"maximum": 5}]},
     [(3, True), (0, False), (6, False)]),
    (D3, "disallow schema form (draft3)",
     {"disallow": [{"type": "object", "properties":
                    {"bad": {"required": True}}}, "null"]},
     # only objects WITH "bad" match the disallowed schema
     [({"ok": 1}, True), (None, False), (1, True),
      ({"bad": 1}, False)]),

    # -------------------------------------------------------------- $ref
    (D20, "$ref pointer with %25 escape via anchor-less uri",
     {"$defs": {"a%b": {"type": "integer"}},
      "$ref": "#/$defs/a%25b"},
     [(1, True), ("x", False)]),
    (D20, "$ref into items",
     {"$defs": {"s": {"items": {"type": "integer"}}},
      "$ref": "#/$defs/s"},
     [([1], True), (["a"], False)]),
    (D20, "$ref chain of two",
     {"$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"type": "boolean"}},
      "$ref": "#/$defs/a"},
     [(True, True), (1, False)]),
    (D20, "$ref to numeric-string key",
     {"$defs": {"0": {"type": "string"}}, "$ref": "#/$defs/0"},
     [("x", True), (0, False)]),
    (D20, "$ref into array position of allOf",
     {"allOf": [{"type": ["integer", "string"]}],
      "$ref": "#/allOf/0"},
     [(1, True), (None, False)]),
    (D4, "draft4 definitions + ref replaces siblings entirely",
     {"definitions": {"pos": {"minimum": 0}},
      "$ref": "#/definitions/pos", "maximum": 1},
     [(5, True), (-1, False)]),
    (D20, "nested $id changes resolution base",
     {"$id": "https://ex.org/a.json",
      "properties": {
          "inner": {"$id": "https://ex.org/b.json",
                    "properties": {"x": {"$ref": "#/$defs/t"}},
                    "$defs": {"t": {"type": "integer"}}}}},
     [({"inner": {"x": 1}}, True), ({"inner": {"x": "s"}}, False)]),
    (D20, "$anchor inside embedded resource",
     {"$id": "https://ex.org/root",
      "$ref": "https://ex.org/sub#mark",
      "$defs": {"sub": {"$id": "https://ex.org/sub",
                        "$defs": {"m": {"$anchor": "mark",
                                        "type": "null"}}}}},
     [(None, True), (1, False)]),
    (D20, "$dynamicRef falls back to $dynamicAnchor in same resource",
     {"$id": "https://ex.org/main",
      "$dynamicAnchor": "node",
      "type": ["object", "integer"],
      "properties": {"next": {"$dynamicRef": "#node"}}},
     [({"next": 1}, True), ({"next": "s"}, False),
      ({"next": {"next": 2}}, True)]),
    (D20, "unknown keywords are ignored",
     {"wibble": 17, "x-vendor": {"anything": True}, "type": "integer"},
     [(1, True), ("x", False)]),

    # ---------------------------------------------------- formats (assertion)
    (D20, "format idn-email basic", {"format": "idn-email"},
     [("alice@example.com", True), ("no-at", False)]),
    (D20, "format iri", {"format": "iri"},
     [("https://例え.jp/パス", True), ("https://ex.com/ok", True),
      ("not a iri", False)]),
    (D20, "format iri-reference", {"format": "iri-reference"},
     [("/relative/パス", True), ("with space", False)]),
    (D20, "format email length/shape extras", {"format": "email"},
     [("a+tag@example.com", True), ("a_b@example.com", True),
      ("a b@example.com", False), ("a@b..com", False)]),
    (D20, "format date-time offset range", {"format": "date-time"},
     [("2024-01-01T00:00:00+23:59", True),
      ("2024-01-01T00:00:00+24:00", False),
      ("2024-02-30T00:00:00Z", False)]),
    (D20, "format date leap rules", {"format": "date"},
     [("2000-02-29", True), ("1900-02-28", True), ("1900-02-29", False),
      ("2400-02-29", True)]),
    (D20, "format json-pointer deep escapes", {"format": "json-pointer"},
     [("/~0~1", True), ("/~01", True), ("/~10", True), ("/~", False),
      ("/a~1b~0c", True)]),
    (D20, "format relative-json-pointer big index",
     {"format": "relative-json-pointer"},
     [("10#", True), ("0/", True), ("1//double", True), ("1 /sp", False)]),
    (D20, "format uri-template expressions", {"format": "uri-template"},
     [("{var}", True), ("{?q,lang}", True), ("{;x*}", True),
      ("{x:3}", True), ("{x:}", False), ("{}", False), ("}", False)]),
    (D20, "format regex constructs (ECMA semantics)", {"format": "regex"},
     [("a|b", True), ("(?<name>x)", True),    # ECMA named group
      ("(?P<name>x)", False),                 # Python-only form: invalid
      ("[]", True), ("[^]", True), ("\\u{1F600}", True),
      ("(", False), ("a{2,1}", False)]),
    (D7, "draft7 format is assertion by default", {"format": "ipv4"},
     [("1.2.3.4", True), ("999.1.1.1", False)]),
    # (2019+ format-as-annotation default is covered in
    # test_reference_parity; this corpus runs with format_assertion=True)
    (D3, "draft3 format is assertion", {"format": "ip-address"},
     [("1.2.3.4", True), ("999.1.1.1", False)]),
    (D20, "format ignores non-strings", {"format": "ipv4"},
     [(1234, True), (None, True), ([], True)]),

    # ------------------------------------------------------------ content
    (D7, "contentMediaType without encoding (draft7)",
     {"contentMediaType": "application/json"},
     [('{"a": 1}', True), ("not json", False), (5, True)]),
    (D19, "content is annotation in 2019+",
     {"contentEncoding": "base64", "contentMediaType": "application/json"},
     [("!!!", True), ("aGVsbG8=", True)]),
    (D19, "contentSchema annotation (2019+)",
     {"contentMediaType": "application/json",
      "contentSchema": {"type": "object"}},
     [("[1]", True)]),

    # ----------------------------------------------- unevaluated* deep cases
    (D20, "unevaluatedProperties with nested allOf chain",
     {"allOf": [{"allOf": [{"properties": {"a": True}}]},
                {"properties": {"b": True}}],
      "unevaluatedProperties": False},
     [({"a": 1, "b": 2}, True), ({"a": 1, "c": 3}, False)]),
    (D20, "unevaluatedProperties sees patternProperties",
     {"patternProperties": {"^x": True}, "unevaluatedProperties": False},
     [({"x1": 1}, True), ({"y1": 1}, False)]),
    (D20, "unevaluatedProperties with oneOf winner evaluation",
     {"oneOf": [{"required": ["a"], "properties": {"a": True}},
                {"required": ["b"], "properties": {"b": True}}],
      "unevaluatedProperties": False},
     [({"a": 1}, True), ({"b": 1}, True), ({"a": 1, "c": 2}, False)]),
    (D20, "unevaluatedProperties through $ref",
     {"$ref": "#/$defs/base", "unevaluatedProperties": False,
      "$defs": {"base": {"properties": {"a": True}}}},
     [({"a": 1}, True), ({"b": 1}, False)]),
    (D20, "unevaluatedItems sees items through allOf",
     {"allOf": [{"prefixItems": [True, True]}],
      "unevaluatedItems": False},
     [([1, 2], True), ([1, 2, 3], False)]),
    (D20, "unevaluatedItems schema applies to tail",
     {"prefixItems": [{"type": "string"}],
      "unevaluatedItems": {"type": "integer"}},
     [(["a", 1, 2], True), (["a", "b"], False)]),
    (D19, "unevaluatedProperties with additionalProperties upstream",
     {"allOf": [{"additionalProperties": True}],
      "unevaluatedProperties": False},
     [({"any": 1}, True)]),

    # -------------------------------------------- draft-next / misc parity
    (DN, "propertyDependencies two keys",
     {"propertyDependencies": {
         "a": {"x": {"required": ["ax"]}},
         "b": {"y": {"required": ["by"]}}}},
     [({"a": "x", "ax": 1}, True), ({"a": "x"}, False),
      ({"b": "y", "by": 1}, True), ({"b": "y"}, False),
      ({"a": "z", "b": "z"}, True)]),
    (D20, "deprecated is annotation only", {"deprecated": True,
                                            "type": "integer"},
     [(1, True), ("x", False)]),
    (D20, "readOnly/writeOnly are annotations",
     {"readOnly": True, "writeOnly": True, "type": "integer"},
     [(1, True), ("x", False)]),
    (D20, "title/description/examples/default ignored",
     {"title": "t", "description": "d", "examples": [1], "default": 5,
      "maximum": 10},
     [(3, True), (11, False)]),
    (D20, "integer-valued float bounds", {"minimum": 1.0, "maximum": 3.0},
     [(1, True), (3, True), (0, False), (4, False)]),
    (D6, "draft6 boolean schema in dependencies",
     {"dependencies": {"a": False}},
     [({"a": 1}, False), ({"b": 1}, True), ({}, True)]),
    (D6, "draft6 propertyNames introduced",
     {"propertyNames": {"minLength": 2}},
     [({"ab": 1}, True), ({"a": 1}, False)]),
    (D6, "draft6 const introduced", {"const": 3},
     [(3, True), (3.0, True), (4, False)]),
    (D6, "draft6 contains introduced", {"contains": {"const": 5}},
     [([5], True), ([4], False)]),
    (D20, "schema true at root", True,
     [(1, True), (None, True), ({"x": [1]}, True)]),
    (D20, "very deep valid nesting does not overflow",
     {"properties": {"n": {"$ref": "#"}}},
     [({"n": {"n": {"n": {"n": {"n": {"n": {"n": {}}}}}}}}, True)]),
]

# ---------------------------------------------------------------- generators


def _enum_matrix():
    """Cross-type enum membership matrix."""
    enum = [1, "1", [1], {"k": 1}, None, True, 2.5]
    members = [(1, True), (1.0, True), ("1", True), ([1], True),
               ([1.0], True), ({"k": 1}, True), ({"k": 1.0}, True),
               (None, True), (True, True), (2.5, True)]
    non_members = [(2, False), ("2", False), ([2], False), ([1, 1], False),
                   ({"k": 2}, False), ({"K": 1}, False), (False, False),
                   (2.6, False), ([], False), ({}, False)]
    return [(D20, "enum cross-type matrix", {"enum": enum},
             members + non_members)]


def _length_matrix():
    groups = []
    for n in (0, 1, 5):
        vals = [("x" * k, k >= n) for k in (0, 1, 4, 5, 6)]
        groups.append((D20, f"minLength {n} ladder", {"minLength": n}, vals))
        vals = [("x" * k, k <= n) for k in (0, 1, 4, 5, 6)]
        groups.append((D20, f"maxLength {n} ladder", {"maxLength": n}, vals))
    return groups


def _items_bounds_matrix():
    groups = []
    for n in (0, 2):
        groups.append((D20, f"minItems {n} ladder", {"minItems": n},
                       [([1] * k, k >= n) for k in (0, 1, 2, 3)]))
        groups.append((D20, f"maxItems {n} ladder", {"maxItems": n},
                       [([1] * k, k <= n) for k in (0, 1, 2, 3)]))
        groups.append((D20, f"minProperties {n} ladder",
                       {"minProperties": n},
                       [({f"k{i}": i for i in range(k)}, k >= n)
                        for k in (0, 1, 2, 3)]))
    return groups


CASES2 += [
    # --------------------------------------------- format batteries (rd 2)
    (D20, "format time second battery", {"format": "time"},
     [("00:00:00Z", True), ("23:59:59Z", True), ("23:59:59+00:00", True),
      ("23:59:59-00:30", True), ("23:59:59", False), ("9:00:00Z", False),
      ("23:5:59Z", False), ("23:59:5Z", False)]),
    (D20, "format date-time lowercase separators", {"format": "date-time"},
     [("2024-06-01t12:00:00z", True), ("2024-06-01T12:00:00+0200", False),
      ("2024-06-01T12:00Z", False), ("2024-06-01", False)]),
    (D20, "format duration designators", {"format": "duration"},
     [("P1Y", True), ("P1M", True), ("P1D", True), ("PT1H", True),
      ("PT1S", True), ("P1DT1H", True), ("P1Y2M", True),
      ("P1S", False), ("PT1Y", False), ("P1H", False), ("1Y", False)]),
    (D20, "format email ip-literal domains", {"format": "email"},
     [("a@[192.168.0.1]", True), ("a@[IPv6:::1]", True),
      ("a@[999.1.1.1]", False), ("a@[not-an-ip]", False)]),
    (D20, "format uuid variants", {"format": "uuid"},
     [("00000000-0000-4000-8000-000000000000", True),
      ("urn:uuid:1234-x", False),
      ("{123e4567-e89b-12d3-a456-426614174000}", False),
      ("123e4567-e89b-12d3-a456-4266141740000", False)]),
    (D20, "format uri fragments and queries", {"format": "uri"},
     [("https://a.example/p?q=1&r=%20x#frag", True),
      ("https://a.example/p#f#f", True),
      ("https://a.example/%zz", False),
      ("ldap://[2001:db8::7]/c=GB?objectClass?one", True)]),
    (D20, "format uri-reference structure", {"format": "uri-reference"},
     [("", True), ("../up", True), ("//host/path", True),
      ("?query-only", True), ("#frag-only", True),
      ("sch:emelike", True), ("1nvalid:path", False)]),
    (D20, "format ipv6 embedded v4 forms", {"format": "ipv6"},
     [("::ffff:255.255.255.255", True), ("64:ff9b::1.2.3.4", True),
      ("::ffff:256.1.1.1", False), ("1:2:3:4:5:6:1.2.3.4", True),
      ("1:2:3:4:5:6:7:1.2.3.4", False)]),
    (D20, "format idn-hostname reference corner", {"format": "idn-hostname"},
     [("실례.테스트", True), ("a·l", False), ("l·l", True),
      ("xn--X", False), ("hostname", True)]),
    (D3, "format color forms (draft3)", {"format": "color"},
     [("#abc", True), ("#aabbcc", True), ("#ab", False),
      ("rgb(1,2,3)", True), ("maroon", True), ("darkmaroon", False)]),

    # --------------------------------------------------- $ref / misc (rd 2)
    (D20, "$defs chain through anchors",
     {"$ref": "#a", "$defs": {"x": {"$anchor": "a", "$ref": "#b"},
                              "y": {"$anchor": "b", "type": "null"}}},
     [(None, True), (0, False)]),
    (D19, "$recursiveAnchor false behaves as plain ref",
     {"$id": "https://ex.com/plain", "$recursiveAnchor": False,
      "type": ["object", "integer"],
      "additionalProperties": {"$recursiveRef": "#"}},
     [({"a": 1}, True), ({"a": "s"}, False)]),
    (D20, "if/then/else inside properties",
     {"properties": {"x": {"if": {"minimum": 10}, "then": {"multipleOf": 5},
                           "else": {"multipleOf": 2}}}},
     [({"x": 15}, True), ({"x": 12}, False), ({"x": 4}, True),
      ({"x": 3}, False)]),
    (D20, "contains + unique + bounds combined",
     {"contains": {"type": "string"}, "uniqueItems": True, "maxItems": 3},
     [(["a", 1], True), ([1, 2], False), (["a", "a"], False),
      (["a", 1, 2, 3], False)]),
    (D20, "exclusive bounds both sides",
     {"exclusiveMinimum": 0, "exclusiveMaximum": 1},
     [(0.5, True), (0, False), (1, False), (0.999999, True)]),
    (D4, "draft4 type any via missing keyword", {},
     [(1, True), (None, True), ([], True)]),
    (D3, "draft3 type any", {"type": "any"},
     [(1, True), (None, True), ({}, True), ("s", True)]),
    (D20, "propertyNames + patternProperties interplay",
     {"propertyNames": {"pattern": "^[ab]"},
      "patternProperties": {"^a": {"type": "integer"}}},
     [({"a1": 1, "b1": "x"}, True), ({"a1": "s"}, False),
      ({"c1": 1}, False)]),
    (D20, "nested unevaluatedProperties scopes are independent",
     {"properties": {"outer": {
         "properties": {"a": True}, "unevaluatedProperties": False}},
      "unevaluatedProperties": False},
     [({"outer": {"a": 1}}, True), ({"outer": {"b": 1}}, False),
      ({"outer": {}, "stray": 1}, False)]),
    (D20, "allOf of refs with unevaluated",
     {"$defs": {"a": {"properties": {"x": True}},
                "b": {"properties": {"y": True}}},
      "allOf": [{"$ref": "#/$defs/a"}, {"$ref": "#/$defs/b"}],
      "unevaluatedProperties": False},
     [({"x": 1, "y": 2}, True), ({"x": 1, "z": 2}, False)]),
]

CASES2 += _enum_matrix() + _length_matrix() + _items_bounds_matrix()


# ------------------------------------------------------- cross-draft replay
# The official suite replays the same group under every draft where the
# keywords mean the same thing.  These keywords are semantically
# identical across draft-06/07/2019-09/2020-12 (format is excluded:
# newer drafts define formats — duration, uuid — that older drafts
# treat as unknown; $-keywords and draft-versioned applicators too).

_CROSS_DRAFT_SAFE = {
    "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "required", "properties", "patternProperties", "additionalProperties",
    "propertyNames", "minProperties", "maxProperties", "contains",
    "minItems", "maxItems", "uniqueItems", "allOf", "anyOf", "oneOf",
    "not", "title", "description", "default", "examples",
}


def _keywords_of(node):
    kws = set()
    if isinstance(node, dict):
        for k, v in node.items():
            kws.add(k)
            kws |= _keywords_of(v)
    elif isinstance(node, list):
        for v in node:
            kws |= _keywords_of(v)
    return kws


def _cross_draft_replay(cases):
    out = []
    for draft, desc, schema, tests in cases:
        if draft != D20 or not isinstance(schema, dict):
            continue
        if not _keywords_of(schema) <= _CROSS_DRAFT_SAFE:
            continue
        for other in (D6, D7, D19):
            out.append((other, f"{desc} [replay {other}]", schema, tests))
    return out


CASES2 += _cross_draft_replay(CASES2)

# replay corpus 1's draft-agnostic 2020-12 groups the same way
from corpus import CASES as _CASES1  # noqa: E402

CASES2 += _cross_draft_replay(_CASES1)
