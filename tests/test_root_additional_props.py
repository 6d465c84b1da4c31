"""Root-level additionalProperties over the flat table (columnar), and
its interaction with the root unevaluatedProperties claim algebra.

Round-5 review fixes pinned here:
- a branch like {"properties": {...}, "additionalProperties": false}
  must FAIL on rows with extra non-null columns, so it contributes no
  claims and root unevaluatedProperties fires (previously the branch
  predicate ignored additionalProperties: false-negative vs interp);
- warning-level checks inside dependentSchemas / schema-form
  dependencies must not fail the dependency (interp
  c_dependent_schemas propagates them as warnings).
"""

from __future__ import annotations

import json

import pytest

from m3spark.columnar import ColumnarValidator
from m3spark.sparkval import validate_json

D2019 = "https://json-schema.org/draft/2019-09/schema"


def _parity(spark, schema, rows, ddl, names, **kw):
    df = spark.createDataFrame(rows, ddl)
    cv = ColumnarValidator(schema, **kw)
    got_col = [r["valid"] for r in cv.apply(df).select("valid").collect()]
    docs = [json.dumps({k: v for k, v in zip(names, row) if v is not None})
            for row in rows]
    out = validate_json(
        spark.createDataFrame([(x,) for x in docs], "doc string"),
        schema, **kw)
    got_interp = [r["valid"] for r in out.select("valid").collect()]
    assert got_col == got_interp
    return got_col


def test_root_additional_properties_false(spark):
    schema = {"properties": {"a": {"type": "integer"}},
              "additionalProperties": False}
    rows = [(1, None), (1, "x"), (None, None), (None, "x")]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    assert got == [True, False, True, False]


def test_root_additional_properties_schema(spark):
    schema = {"properties": {"a": {"type": "integer"}},
              "additionalProperties": {"type": "string", "minLength": 2}}
    rows = [(1, "xy"), (1, "x"), (1, None)]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    assert got == [True, False, True]


def test_root_ap_in_allof_branch(spark):
    # flattened allOf recursion: each branch's AP sees only the branch's
    # own adjacent `properties`
    schema = {"allOf": [{"properties": {"a": {}},
                         "additionalProperties": {"maxLength": 1}}],
              "properties": {"b": {}}}
    rows = [(1, "xx"), (1, "x")]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    assert got == [False, True]


@pytest.mark.parametrize("extra_ok", [False, True])
def test_root_unevaluated_with_ap_branch(spark, extra_ok):
    """The round-5 false-negative: a oneOf branch carrying
    additionalProperties:false claims all_keys ONLY when it succeeds —
    a row with an extra non-null column must fail the branch, lose the
    claims, and trip unevaluatedProperties."""
    schema = {
        "$schema": D2019,
        "oneOf": [{"properties": {"a": {"type": "integer"}},
                   "required": ["a"],
                   "additionalProperties": True if extra_ok else False}],
        "unevaluatedProperties": False,
    }
    rows = [(1, None), (1, "x")]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    if extra_ok:
        # AP:true claims every key in the (successful) branch
        assert got == [True, True]
    else:
        # branch fails on the extra column -> oneOf itself fails
        assert got == [True, False]


def test_root_unevaluated_ap_schema_branch_claims(spark):
    """AP with a schema still claims all keys — but only on branch
    success, which now includes the AP value check."""
    schema = {
        "$schema": D2019,
        "anyOf": [{"properties": {"a": {}},
                   "additionalProperties": {"maxLength": 1}}],
        "unevaluatedProperties": {"minLength": 5},
    }
    #  b="x": branch ok -> claims all -> valid
    #  b="xx"/"xxxxx": branch fails (AP maxLength 1) -> anyOf itself
    #  fails the row, independent of the uP outcome
    rows = [(1, "x"), (1, "xx"), (1, "xxxxx")]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    assert got == [True, False, False]


def test_dependent_schemas_warning_does_not_fail(spark):
    # format is warning-level in 2019-09 (assertion off): the dependent
    # schema "fails" only on errors, so a bad-format value stays VALID
    schema = {
        "$schema": D2019,
        "dependentSchemas": {
            "a": {"properties": {"b": {"format": "email"}},
                  "required": ["b"]}},
    }
    rows = [(1, "not-an-email"), (1, None), (None, None)]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"))
    assert got == [True, False, True]  # fails only on missing required b


def test_dependencies_schema_form_warning_does_not_fail(spark):
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "dependencies": {
            "a": {"properties": {"b": {"format": "email"}},
                  "required": ["b"]}},
    }
    # draft-07: format IS an assertion by default in this engine when
    # format_assertion=True; use format_assertion=False so it's a warning
    rows = [(1, "not-an-email"), (1, None)]
    got = _parity(spark, schema, rows, "a int, b string", ("a", "b"),
                  format_assertion=False)
    assert got == [True, False]
