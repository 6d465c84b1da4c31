"""$ref meld-semantics and $dynamicRef interaction matrices (§2.8).

- meld: in drafts ≤ 7 `$ref` REPLACES its siblings (they are ignored);
  from 2019-09 `$ref` is an in-place applicator whose siblings also
  apply (reference vocabulary.cljc:154,158 and property.cljc:268-293).
  The matrix sweeps drafts x sibling-keyword sets x documents with
  expectations computed from that one rule plus scalar-keyword truth.
- $dynamicRef: the bookending rule (2020-12: a $dynamicRef resolves
  dynamically only when it lands on a $dynamicAnchor; the dynamic
  target is the FIRST matching anchor on the dynamic scope) exercised
  over the spec's generic-tree/string-tree shape and degenerate forms.
"""

from __future__ import annotations

import itertools

import pytest

from m3spark.schema.core import compile_schema

D4 = "http://json-schema.org/draft-04/schema#"
D6 = "http://json-schema.org/draft-06/schema#"
D7 = "http://json-schema.org/draft-07/schema#"
D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"

OLD = (D4, D6, D7)
NEW = (D2019, D2020)


def _scalar_ok(kw, arg, value):
    if kw == "minimum":
        return not isinstance(value, (int, float)) \
            or isinstance(value, bool) or value >= arg
    if kw == "maximum":
        return not isinstance(value, (int, float)) \
            or isinstance(value, bool) or value <= arg
    if kw == "minLength":
        return not isinstance(value, str) or len(value) >= arg
    if kw == "pattern":
        import re
        return not isinstance(value, str) or bool(re.search(arg, value))
    if kw == "type":
        if arg == "integer":
            return isinstance(value, int) and not isinstance(value, bool)
        if arg == "string":
            return isinstance(value, str)
    raise AssertionError(kw)


_BASE = {"type": "integer"}          # the $ref target
_SIBLINGS = [
    {"minimum": 10},
    {"maximum": 3},
    {"minimum": 0, "maximum": 5},
    {"minLength": 3},                 # string-only: vacuous on ints
    {"pattern": "^a"},
    {"type": "string"},               # conflicts with the ref target
]
_DOCS = [0, 3, 5, 7, 10, 12, -1, True, "ab", "abc", "axx", 2.5, None,
         [1], {"x": 1}]

MELD_CASES = [(draft, i) for draft in OLD + NEW
              for i in range(len(_SIBLINGS))]


@pytest.mark.parametrize("draft,sib_i", MELD_CASES,
                         ids=[f"{d.split('/')[-2][:12]}-{i}"
                              for d, i in MELD_CASES])
def test_ref_meld_matrix(draft, sib_i):
    siblings = _SIBLINGS[sib_i]
    schema = {"$schema": draft,
              "definitions": {"base": _BASE},
              "properties": {"v": dict({"$ref": "#/definitions/base"},
                                       **siblings)}}
    cs = compile_schema(schema)
    mism = []
    for doc_v in _DOCS:
        base_ok = _scalar_ok("type", "integer", doc_v)
        sib_ok = all(_scalar_ok(k, a, doc_v) for k, a in siblings.items())
        expected = base_ok if draft in OLD else (base_ok and sib_ok)
        got = cs.validate({"v": doc_v}).valid
        if bool(got) != bool(expected):
            mism.append(f"v={doc_v!r}: interp={got} expected={expected}")
    assert not mism, f"{draft} siblings={siblings}:\n" + "\n".join(mism)


def test_meld_assertion_count():
    assert len(MELD_CASES) * len(_DOCS) >= 400


# ---------------------------------------------------------------------------
# $dynamicRef bookending matrix (2020-12)

# the spec's shape: a generic tree whose node anchor is overridden by a
# derived schema, so leaf data deep in the tree revalidates against the
# DERIVED element type even though the recursion lives in the base
_TREE = {
    "$schema": D2020,
    "$id": "https://example.test/strict-tree",
    "$dynamicAnchor": "node",
    "$ref": "https://example.test/tree",
    "properties": {"data": {"type": "string"}},
    "$defs": {
        "base-tree": {
            "$id": "https://example.test/tree",
            "$dynamicAnchor": "node",
            "type": "object",
            "properties": {
                "data": True,
                "children": {
                    "type": "array",
                    "items": {"$dynamicRef": "#node"},
                },
            },
        },
    },
}

_TREE_DOCS = [
    # (doc, valid): data must be a STRING at every depth — the derived
    # schema's anchor wins across the $ref into the base
    ({"data": "x"}, True),
    ({"data": 1}, False),
    ({"data": "x", "children": []}, True),
    ({"data": "x", "children": [{"data": "y"}]}, True),
    ({"data": "x", "children": [{"data": 2}]}, False),
    ({"data": "x", "children": [{"data": "y",
                                 "children": [{"data": 3}]}]}, False),
    ({"data": "x", "children": [{"data": "y",
                                 "children": [{"data": "z"}]}]}, True),
    ({"children": [{"children": [{"data": 4}]}]}, False),
    ({"children": [{"children": [{"data": "d"}]}]}, True),
]


@pytest.mark.parametrize("doc,expected", _TREE_DOCS,
                         ids=[str(i) for i in range(len(_TREE_DOCS))])
def test_dynamic_ref_overrides_across_resources(doc, expected):
    cs = compile_schema(_TREE)
    assert cs.validate(doc).valid is expected


def test_dynamic_ref_unbookended_acts_as_ref():
    """2020-12 bookending: if the TARGET of $dynamicRef is a plain
    $anchor (no $dynamicAnchor), resolution is static — the outer
    schema's same-named $dynamicAnchor must NOT hijack it."""
    schema = {
        "$schema": D2020,
        "$id": "https://example.test/unbookended",
        "$dynamicAnchor": "it",          # would make data integer-only
        "type": "object",
        "properties": {
            "data": {"$ref": "https://example.test/inner"},
        },
        "$defs": {
            "outer-it": {"type": "integer"},
            "inner": {
                "$id": "https://example.test/inner",
                "$dynamicRef": "#it",     # target below is STATIC $anchor
                "$defs": {
                    "leaf": {"$anchor": "it", "type": "string"},
                },
            },
        },
    }
    cs = compile_schema(schema)
    # static resolution -> string required; the outer integer anchor
    # must not win even though it is first on the dynamic scope
    assert cs.validate({"data": "s"}).valid is True
    assert cs.validate({"data": 5}).valid is False


def test_dynamic_ref_first_scope_wins():
    """The FIRST $dynamicAnchor on the dynamic scope wins — re-entering
    deeper resources with their own anchors does not re-bind."""
    schema = {
        "$schema": D2020,
        "$id": "https://example.test/outer2",
        "$dynamicAnchor": "slot",
        "type": "object",
        "properties": {"v": {"$ref": "https://example.test/mid"}},
        "$defs": {
            "outer-slot-constraint": True,
            "mid": {
                "$id": "https://example.test/mid",
                "$dynamicAnchor": "slot",  # later on scope: must NOT win
                "type": "string",
                "$defs": {"use": True},
            },
        },
    }
    # outer schema object IS the outer slot: object-typed
    cs = compile_schema(schema)
    # v must be a string (mid's own constraint applies statically)
    assert cs.validate({"v": "x"}).valid is True
    assert cs.validate({"v": 1}).valid is False
    # and the whole doc must be an object (outer constraint)
    assert cs.validate("not-an-object").valid is False


# ---------------------------------------------------------------------------
# json-equality edges (reference util json-= — drives enum/const/
# uniqueItems): numeric-kind-blind, bool-distinct, structural

_EQ_CASES = [
    # (a, b, equal?)
    (1, 1.0, True),
    (0, 0.0, True),
    (1, True, False),
    (0, False, False),
    (True, 1.0, False),
    ("1", 1, False),
    (None, False, False),
    (None, 0, False),
    ([1, 2], [1.0, 2.0], True),
    ([1, 2], [2, 1], False),
    ({"a": 1}, {"a": 1.0}, True),
    ({"a": 1}, {"a": 1, "b": 2}, False),
    ({"a": [True]}, {"a": [1]}, False),
    ({"a": {"b": 2}}, {"a": {"b": 2.0}}, True),
    (1.5, 1.5, True),
    (100000000000000000000, 1e20, True),  # bignum == float, same value
]

EQ_IDS = [str(i) for i in range(len(_EQ_CASES))]


@pytest.mark.parametrize("a,b,eq", _EQ_CASES, ids=EQ_IDS)
def test_json_equality_via_const(a, b, eq):
    for draft in (D6, D2020):
        cs = compile_schema({"$schema": draft, "const": a})
        assert cs.validate(b).valid is eq, (a, b, draft)


@pytest.mark.parametrize("a,b,eq", _EQ_CASES, ids=EQ_IDS)
def test_json_equality_via_unique_items(a, b, eq):
    for draft in (D4, D2020):
        cs = compile_schema({"$schema": draft, "uniqueItems": True})
        # duplicates iff json-equal
        assert cs.validate([a, b]).valid is (not eq), (a, b, draft)


@pytest.mark.parametrize("a,b,eq", _EQ_CASES, ids=EQ_IDS)
def test_json_equality_via_enum(a, b, eq):
    cs = compile_schema({"$schema": D7, "enum": [a]})
    assert cs.validate(b).valid is eq, (a, b)


# ---------------------------------------------------------------------------
# violation-shape parity with the reference's make-error
# (util_test.cljc test-make-error: schema-path, document-path, the
# offending document rendered into the message/value)


def test_violation_carries_paths_and_value():
    cs = compile_schema({"$schema": D7, "properties":
                         {"name": {"type": "string"}}})
    res = cs.validate({"name": 42})
    assert not res.valid
    v = res.errors[0]
    assert v.keyword == "type"
    assert v.schema_path == "/properties/name/type"
    assert v.doc_path == "/name"
    assert "42" in (v.value or "") or "42" in v.message


def test_absent_vs_null_distinction():
    """The reference's absent sentinel (util_test.cljc): an explicit
    null is PRESENT (fails a non-null type check) while a missing key
    passes everything except required."""
    cs = compile_schema({"$schema": D7,
                         "required": ["a"],
                         "properties": {"a": {"type": "string"}}})
    assert cs.validate({"a": "x"}).valid
    r_null = cs.validate({"a": None})
    assert not r_null.valid
    assert r_null.errors[0].keyword == "type"   # present but wrong type
    r_missing = cs.validate({})
    assert not r_missing.valid
    assert r_missing.errors[0].keyword == "required"
