"""Columnar unevaluatedProperties / unevaluatedItems (SURVEY §7
hard-part 1: static key-set algebra, `when(branch_ok, keys)` +
`array_except`) must agree with the Arrow interpreter on verdicts and
on unevaluated*-violation presence for every (shape x policy x doc)
cell — over struct columns, map columns, the flat root table, and
array columns.  Shapes mirror tests/test_unevaluated_matrix.py's
evaluator alphabet over the applicators the property-level compiler
supports (allOf/anyOf/oneOf, if/then/else, dependentSchemas, acyclic
$ref via eager inlining, draft-3 extends, draft-next
propertyDependencies, nested unevaluated*; only non-inlinable refs —
cycles, external, $dynamicRef/$recursiveRef — still route to the
interp via UnsupportedKeyword — pinned below).  Reference semantics:
property.cljc:268-293, 1083-1095."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from m3spark.columnar import ColumnarValidator, UnsupportedKeyword
from m3spark.schema.core import compile_schema

D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"
DRAFTS = [D2019, D2020]

# leaves discriminate by VALUE (bounds/length), not JSON type, so typed
# Spark columns can exercise both outcomes per leaf
_EVALUATORS = {
    "plain-props": {"properties": {"a": {}, "b": {"minLength": 2}}},
    "pattern": {"patternProperties": {"^a": {}}},
    "props+pattern": {"properties": {"b": {}},
                      "patternProperties": {"^a": {"minLength": 2}}},
    "props+ap": {"properties": {"a": {}},
                 "additionalProperties": {"minLength": 2}},
    "allOf": {"allOf": [{"properties": {"a": {}}},
                        {"properties": {"b": {"minLength": 2}}}]},
    "anyOf": {"anyOf": [{"properties": {"a": {"maxLength": 1}},
                         "required": ["a"]},
                        {"properties": {"b": {}}, "required": ["b"]}]},
    "oneOf": {"oneOf": [{"properties": {"a": {}}, "required": ["a"]},
                        {"properties": {"b": {}}, "required": ["b"]}]},
    "nested-combo": {"allOf": [{"anyOf": [
        {"properties": {"a": {}}, "required": ["a"]},
        {"properties": {"b": {}}, "required": ["b"]}]}],
        "properties": {"c": {"maxLength": 1}}},
}

_POLICIES = {"false": False, "true": True, "typed": {"minLength": 2}}

# docs over keys {a,b,c,d}: string values of length 1 or 2, or absent
_VALS = {None: None, "s": "ss", "x": "x"}
_DOCS = []
for a in (None, "ss", "x"):
    for b in (None, "ss", "x"):
        for c in (None, "ss", "x"):
            for d in (None, "ss"):
                _DOCS.append({"a": a, "b": b, "c": c, "d": d})

_STRUCT = T.StructType([T.StructField("obj", T.StructType(
    [T.StructField(k, T.StringType()) for k in "abcd"]))])
_MAP = T.StructType([T.StructField(
    "obj", T.MapType(T.StringType(), T.StringType()))])


def _interp_results(schema, docs):
    cs = compile_schema(schema)
    out = []
    for doc in docs:
        res = cs.validate(doc)
        # interp violations under uP/uI carry the VALUE schema's keyword
        # (e.g. "false"); identify them by schema path instead
        uv = any("unevaluated" in v.schema_path or
                 v.keyword.startswith("unevaluated")
                 for v in res.errors)
        out.append((bool(res.valid), uv))
    return out


def _cell_schema(draft, ev, pol):
    sub = dict(_EVALUATORS[ev])
    sub["unevaluatedProperties"] = _POLICIES[pol]
    return {"$schema": draft, "properties": {"obj": sub}}


CELLS = [(d, e, p) for d in DRAFTS for e in _EVALUATORS
         for p in _POLICIES]


@pytest.mark.parametrize("mode", ["struct", "map"])
def test_property_level_parity(spark, mode):
    mismatches = []
    for draft, ev, pol in CELLS:
        schema = _cell_schema(draft, ev, pol)
        cv = ColumnarValidator(schema)
        if mode == "struct":
            rows = [(tuple(doc[k] for k in "abcd"),) for doc in _DOCS]
            df = spark.createDataFrame(rows, _STRUCT)
        else:
            rows = [({k: v for k, v in doc.items() if v is not None},)
                    for doc in _DOCS]
            df = spark.createDataFrame(rows, _MAP)
        got = cv.apply(df).collect()
        docs = [{"obj": {k: v for k, v in doc.items() if v is not None}}
                for doc in _DOCS]
        exp = _interp_results(schema, docs)
        for doc, r, (evalid, euv) in zip(docs, got, exp):
            gvalid = bool(r["valid"])
            guv = any(v["keyword"].startswith("unevaluated")
                      for v in r["violations"])
            if gvalid != evalid or guv != euv:
                mismatches.append(
                    f"{ev}/{pol}/{draft[-18:-7]}/{mode} {doc['obj']}: "
                    f"columnar=({gvalid},{guv}) interp=({evalid},{euv})")
    assert not mismatches, f"{len(mismatches)}:\n" + \
        "\n".join(mismatches[:10])


def test_root_flat_table_parity(spark):
    """Root-level uP over the flat table: columns are the object keys
    (NULL = missing)."""
    mismatches = []
    for draft in DRAFTS:
        for ev in ("plain-props", "allOf", "anyOf", "oneOf",
                   "nested-combo"):
            for pol in _POLICIES:
                schema = dict(_EVALUATORS[ev])
                schema["$schema"] = draft
                schema["unevaluatedProperties"] = _POLICIES[pol]
                cv = ColumnarValidator(schema)
                rows = [tuple(doc[k] for k in "abcd") for doc in _DOCS]
                df = spark.createDataFrame(
                    rows, "a string, b string, c string, d string")
                got = cv.apply(df).collect()
                docs = [{k: v for k, v in doc.items() if v is not None}
                        for doc in _DOCS]
                exp = _interp_results(schema, docs)
                for doc, r, (evalid, euv) in zip(docs, got, exp):
                    gvalid = bool(r["valid"])
                    guv = any(v["keyword"].startswith("unevaluated")
                              for v in r["violations"])
                    if gvalid != evalid or guv != euv:
                        mismatches.append(
                            f"{ev}/{pol}/{draft[-18:-7]} {doc}: "
                            f"columnar=({gvalid},{guv}) "
                            f"interp=({evalid},{euv})")
    assert not mismatches, f"{len(mismatches)}:\n" + \
        "\n".join(mismatches[:10])


def test_root_if_then_else_claims(spark):
    """Root if/then/else claims: a successful `if` contributes its
    keys; the taken, successful arm contributes too."""
    mismatches = []
    for draft in DRAFTS:
        schema = {
            "$schema": draft,
            "if": {"properties": {"a": {"maxLength": 1}},
                   "required": ["a"]},
            "then": {"properties": {"b": {}}},
            "else": {"properties": {"c": {}}},
            "unevaluatedProperties": False,
        }
        cv = ColumnarValidator(schema)
        rows = [tuple(doc[k] for k in "abcd") for doc in _DOCS]
        df = spark.createDataFrame(
            rows, "a string, b string, c string, d string")
        got = cv.apply(df).collect()
        docs = [{k: v for k, v in doc.items() if v is not None}
                for doc in _DOCS]
        exp = _interp_results(schema, docs)
        for doc, r, (evalid, euv) in zip(docs, got, exp):
            if bool(r["valid"]) != evalid:
                mismatches.append(f"{draft[-18:-7]} {doc}: "
                                  f"columnar={bool(r['valid'])} "
                                  f"interp={evalid}")
    assert not mismatches, "\n".join(mismatches[:10])


# -- arrays ----------------------------------------------------------------

_ARR_SCHEMA = T.StructType([T.StructField(
    "arr", T.ArrayType(T.LongType()))])

_ARR_DOCS = [[], [1], [100], [1, 2], [1, 100], [100, 1], [1, 2, 3],
             [1, 100, 3], [100, 100], [1, 2, 100, 4], [5, 5, 5, 5, 5]]


def _arr_evaluators(draft):
    prefix_kw = "prefixItems" if draft == D2020 else "items"
    return {
        "prefix-only": {prefix_kw: [{}, {"maximum": 50}]},
        "prefix+branch": {prefix_kw: [{}],
                          "anyOf": [
                              {prefix_kw: [{}, {}, {"maximum": 50}],
                               "minItems": 3},
                              {prefix_kw: [{}, {"maximum": 50}],
                               "minItems": 2}]},
        "contains": {"contains": {"minimum": 100}},
        "allOf-prefix": {"allOf": [{prefix_kw: [{}]},
                                   {prefix_kw: [{}, {"maximum": 50}]}]},
    }


def test_unevaluated_items_parity(spark):
    mismatches = []
    for draft in DRAFTS:
        for ev, frag in _arr_evaluators(draft).items():
            for pol in ({"maximum": 10}, False, True):
                sub = dict(frag)
                sub["unevaluatedItems"] = pol
                schema = {"$schema": draft, "properties": {"arr": sub}}
                cv = ColumnarValidator(schema)
                df = spark.createDataFrame([(d,) for d in _ARR_DOCS],
                                           _ARR_SCHEMA)
                got = cv.apply(df).collect()
                docs = [{"arr": d} for d in _ARR_DOCS]
                exp = _interp_results(schema, docs)
                for doc, r, (evalid, euv) in zip(docs, got, exp):
                    gvalid = bool(r["valid"])
                    guv = any(v["keyword"] == "unevaluatedItems"
                              for v in r["violations"])
                    if gvalid != evalid or guv != euv:
                        mismatches.append(
                            f"{ev}/{pol}/{draft[-18:-7]} {doc['arr']}: "
                            f"columnar=({gvalid},{guv}) "
                            f"interp=({evalid},{euv})")
    assert not mismatches, f"{len(mismatches)}:\n" + \
        "\n".join(mismatches[:10])


def test_items_schema_claims_everything(spark):
    """Schema-form items (2020) / additionalItems (2019) evaluate every
    element, so unevaluatedItems never fires."""
    for draft in DRAFTS:
        if draft == D2020:
            sub = {"prefixItems": [{}], "items": {"maximum": 1000},
                   "unevaluatedItems": False}
        else:
            sub = {"items": [{}], "additionalItems": {"maximum": 1000},
                   "unevaluatedItems": False}
        cv = ColumnarValidator({"$schema": draft,
                                "properties": {"arr": sub}})
        df = spark.createDataFrame([([1, 2, 3],)], _ARR_SCHEMA)
        r = cv.apply(df).collect()[0]
        assert bool(r["valid"]), r


# -- routing + hygiene -----------------------------------------------------

@pytest.mark.parametrize("frag", [
    # a cyclic $ref survives inline_local_refs and stays interp-routed
    {"$ref": "#/$defs/cyc", "unevaluatedProperties": False},
    # $dynamicRef to an anchor that exists nowhere: plain-$ref fallback
    # is unresolvable, so the inliner gives up (r6 static scope-chain
    # simulation resolves the RESOLVABLE cases — test_ref_inline.py)
    {"$dynamicRef": "#meta", "unevaluatedProperties": False},
    # $dynamicRef to another resource can never be fixed statically
    {"$dynamicRef": "https://ex.example/s#m",
     "unevaluatedProperties": False},
])
def test_unsupported_claims_route_to_interp(frag):
    with pytest.raises(UnsupportedKeyword):
        ColumnarValidator({"$schema": D2020,
                           "$defs": {"x": {"properties": {"a": {}}},
                                     "cyc": {"$ref": "#/$defs/cyc"}},
                           "properties": {"obj": frag}})


def test_previously_unsafe_claims_now_lower(spark):
    """Round-5 lowering: $ref (acyclic), property-level dependentSchemas
    and nested unevaluated* all compile columnar now — verdict parity
    with the interpreter is pinned in test_ref_inline.py /
    test_dependent_columnar.py; here we pin that they no longer raise."""
    for frag in [
        {"$ref": "#/$defs/x", "unevaluatedProperties": False},
        {"dependentSchemas": {"a": {"properties": {"b": {}}}},
         "unevaluatedProperties": False},
        {"anyOf": [{"properties": {"a": {}},
                    "unevaluatedProperties": False}],
         "unevaluatedProperties": False},
    ]:
        cv = ColumnarValidator({"$schema": D2020,
                                "$defs": {"x": {"properties": {"a": {}}}},
                                "properties": {"obj": frag}})
        assert all(getattr(c.build, "_jvm", True) for c in cv.checks)


def test_property_if_then_else_parity(spark):
    """Property-level if/then/else is columnar-lowered since r4 —
    verdict parity with the interp over struct columns, including its
    claims feeding unevaluatedProperties."""
    mismatches = []
    for pol in _POLICIES:
        schema = {"$schema": D2020, "properties": {"obj": {
            "if": {"properties": {"a": {"maxLength": 1}},
                   "required": ["a"]},
            "then": {"properties": {"b": {}}},
            "else": {"properties": {"c": {}}},
            "unevaluatedProperties": _POLICIES[pol],
        }}}
        cv = ColumnarValidator(schema)
        rows = [(tuple(doc[k] for k in "abcd"),) for doc in _DOCS]
        df = spark.createDataFrame(rows, _STRUCT)
        got = cv.apply(df).collect()
        docs = [{"obj": {k: v for k, v in doc.items()
                         if v is not None}} for doc in _DOCS]
        exp = _interp_results(schema, docs)
        for doc, r, (evalid, _) in zip(docs, got, exp):
            if bool(r["valid"]) != evalid:
                mismatches.append(f"{pol} {doc['obj']}: "
                                  f"columnar={bool(r['valid'])} "
                                  f"interp={evalid}")
    assert not mismatches, "\n".join(mismatches[:10])


def test_root_dependent_schemas_parity(spark):
    """Root dependentSchemas is columnar-lowered since r4 — verdicts
    and its claims for root unevaluatedProperties match the interp."""
    mismatches = []
    for pol in _POLICIES:
        schema = {"$schema": D2020,
                  "properties": {"a": {"type": "string"}},
                  "dependentSchemas": {
                      "a": {"properties": {"b": {"minLength": 2}},
                            "required": ["b"]}},
                  "unevaluatedProperties": _POLICIES[pol]}
        cv = ColumnarValidator(schema)
        rows = [tuple(doc[k] for k in "abcd") for doc in _DOCS]
        df = spark.createDataFrame(
            rows, "a string, b string, c string, d string")
        got = cv.apply(df).collect()
        docs = [{k: v for k, v in doc.items() if v is not None}
                for doc in _DOCS]
        exp = _interp_results(schema, docs)
        for doc, r, (evalid, _) in zip(docs, got, exp):
            if bool(r["valid"]) != evalid:
                mismatches.append(f"{pol} {doc}: "
                                  f"columnar={bool(r['valid'])} "
                                  f"interp={evalid}")
    assert not mismatches, "\n".join(mismatches[:10])


def test_unevaluated_plan_is_jvm_only(spark):
    """The uP/uI lowering must add zero Python stages."""
    schema = _cell_schema(D2020, "nested-combo", "typed")
    schema["properties"]["obj"]["unevaluatedItems"] = False
    cv = ColumnarValidator(schema)
    df = spark.createDataFrame([(("ss", None, "x", "zz"),)], _STRUCT)
    plan = cv.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_old_drafts_ignore_unevaluated(spark):
    """Pre-2019 drafts treat unevaluated* as unknown annotations."""
    schema = {"$schema": "http://json-schema.org/draft-07/schema#",
              "properties": {"obj": {"properties": {"a": {}},
                                     "unevaluatedProperties": False}}}
    cv = ColumnarValidator(schema)
    df = spark.createDataFrame([(("ss", "ss", None, "zz"),)], _STRUCT)
    assert bool(cv.apply(df).collect()[0]["valid"])
    assert compile_schema(schema).validate(
        {"obj": {"a": "ss", "d": "zz"}}).valid
