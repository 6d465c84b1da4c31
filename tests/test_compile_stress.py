"""Seeded compile-stress + engine-agreement fuzz — the in-repo analog of
the reference's SchemaStore stress test (schemastore_stress_test.clj:
69-85: every schema must compile with zero errors) plus an
interp==columnar verdict/violation agreement sweep the reference cannot
have (it has one engine).

All inputs are pure functions of their seed: a failure message carries
the seed and replays exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from m3spark.columnar import ColumnarValidator, UnsupportedKeyword
from m3spark.schema.core import (
    SchemaError, compile_schema, meta_validate_schema,
)
from tests.schema_fuzz import (
    deep_schema, random_instance, row_for, tabular_schema,
)

N_DEEP = 1000
N_TABULAR = 60
N_ROWS = 24


def test_deep_compile_stress_zero_errors():
    """1000 full-surface schemas: every one must meta-validate clean,
    compile, and validate arbitrary instances without raising — the
    'all schemas must compile (0 errors asserted)' bar."""
    failures = []
    for seed in range(N_DEEP):
        schema = deep_schema(seed)
        try:
            metas = meta_validate_schema(schema,
                                         schema["$schema"])
            if metas:
                failures.append(f"seed {seed}: meta-errors {metas[:1]}")
                continue
            cs = compile_schema(schema)
            for k in range(3):
                cs.validate(random_instance(seed * 7919 + k))
        except Exception as e:  # noqa: BLE001 — the assertion IS "no raise"
            failures.append(f"seed {seed}: {type(e).__name__}: {e}")
    assert not failures, (
        f"{len(failures)}/{N_DEEP} schemas failed to compile/run:\n"
        + "\n".join(failures[:10]))


def test_deep_columnar_never_crashes():
    """The columnar compiler over the deep family must either lower the
    schema or raise the typed UnsupportedKeyword escape — never any
    other exception (the routing contract sparkval relies on)."""
    lowered = 0
    for seed in range(0, N_DEEP, 5):
        schema = deep_schema(seed)
        try:
            ColumnarValidator(schema)
            lowered += 1
        except UnsupportedKeyword:
            pass
        except SchemaError:
            pass  # e.g. unresolvable $ref forms the interp also rejects
    # sanity: the family is not trivially all-unsupported
    assert lowered >= 5


_SPARK_TYPES = {"int": T.LongType(), "num": T.DoubleType(),
                "str": T.StringType(), "bool": T.BooleanType()}


def _interp_errors(schema, doc):
    res = compile_schema(schema, format_assertion=True).validate(doc)
    return bool(res.valid), sorted((v.keyword, v.schema_path)
                                   for v in res.errors)


@pytest.mark.parametrize("block", range(4))
def test_tabular_engine_agreement(spark, block):
    """Random scalar-keyword schemas over random typed rows: the interp
    and the columnar compiler must agree on every verdict and every
    error (keyword, schema_path) pair."""
    mismatches = []
    for i in range(block * N_TABULAR // 4, (block + 1) * N_TABULAR // 4):
        seed = 104729 + i
        schema, kinds = tabular_schema(seed)
        try:
            cv = ColumnarValidator(schema, format_assertion=True)
        except UnsupportedKeyword:
            continue  # routed to interp by design (e.g. py-only regex)
        rows = [row_for(seed * 31 + j, kinds) for j in range(N_ROWS)]
        fields = [T.StructField(n, _SPARK_TYPES[k], nullable=True)
                  for n, k in sorted(kinds.items())]
        fields.insert(0, T.StructField("_row", T.IntegerType()))
        data = []
        for j, row in enumerate(rows):
            rec = {"_row": j}
            for n, k in kinds.items():
                v = row[n]
                if v is not None and k == "num":
                    v = float(v)
                rec[n] = v
            data.append(rec)
        df = spark.createDataFrame(data, T.StructType(fields))
        got = {r["_row"]: r for r in cv.apply(df).collect()}
        for j, row in enumerate(rows):
            doc = {n: v for n, v in row.items() if v is not None}
            exp_valid, exp_errs = _interp_errors(schema, doc)
            r = got[j]
            col_errs = sorted((v["keyword"], v["schema_path"])
                              for v in r["violations"]
                              if v["level"] == "error")
            if bool(r["valid"]) != exp_valid or col_errs != exp_errs:
                mismatches.append(
                    f"schema seed {seed} row {j}: columnar "
                    f"valid={r['valid']} errs={col_errs}; interp "
                    f"valid={exp_valid} errs={exp_errs}; doc={doc}; "
                    f"schema={schema}")
    assert not mismatches, (
        f"{len(mismatches)} disagreements:\n" + "\n".join(mismatches[:5]))
