"""ECMA-262 regex layer: classification + translation divergence corpus
(reference semantics: ecma.cljc:27-38 GraalJS, format.cljc:239-249).

Two halves:
1. pure-Python: is_ecma_regex verdicts and compile_ecma match semantics
   on the documented Python-vs-ECMA divergences;
2. Spark: the JVM rlike path (java_pattern) and the Python path agree
   verdict-for-verdict over the divergence corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m3spark.schema.ecma import compile_ecma, is_ecma_regex, java_pattern

# (pattern, ecma_valid)
VALIDITY = [
    ("^a+$", True),
    ("(?<name>x)\\k<name>", True),     # ECMA named group + backref
    ("(?P<name>x)", False),            # Python-only named group
    ("(?P=name)", False),              # Python-only backref
    ("(?#comment)", False),            # Python-only comment group
    ("\\A x \\Z", False),              # Python/Java-only anchors
    ("\\cJ", True),                    # control escape
    ("\\u{1F600}", True),              # u-flag codepoint escape
    ("[]", True),                      # ECMA empty class (never matches)
    ("[^]", True),                     # ECMA negated-empty (any char)
    ("(", False),
    ("a{2,1}", False),
    ("(?<=look)behind", True),
    ("(?<!not)behind", True),
]

# (pattern, input, ecma_matches) — semantic divergences vs raw Python re
SEMANTICS = [
    ("^a$", "a\n", False),        # ECMA $ is absolute end (Python: True)
    ("^a$", "a", True),
    ("a.b", "a b", False),   # ECMA . excludes U+2028 (Python: True)
    ("a.b", "axb", True),
    ("a.b", "a\nb", False),
    ("\\d+", "١٢٣", False),       # ECMA \d is ASCII (Python unicode: True)
    ("\\d+", "123", True),
    ("\\w+", "变量", False),       # ECMA \w is ASCII
    ("(?<n>ab)\\k<n>", "abab", True),
    ("\\cJ", "\n", True),         # control-J is linefeed
    ("[^]", "\n", True),          # matches anything, even newline
    ("x[]y", "xzy", False),       # empty class never matches
    ("\\u{41}", "A", True),
]


@pytest.mark.parametrize("pattern,want", VALIDITY,
                         ids=[p for p, _ in VALIDITY])
def test_ecma_validity(pattern, want):
    assert is_ecma_regex(pattern) == want


@pytest.mark.parametrize("pattern,s,want", SEMANTICS,
                         ids=[f"{p}~{s!r}" for p, s, _ in SEMANTICS])
def test_ecma_match_semantics(pattern, s, want):
    rx = compile_ecma(pattern)
    assert (rx.search(s) is not None) == want


def test_java_and_python_paths_agree(spark):
    """Routed-set agreement: for every translatable divergence pattern,
    the JVM rlike plan and the Python compile_ecma verdicts must be
    identical over the probe inputs."""
    probes = ["a", "a\n", "axb", "a b", "abab", "123", "١٢٣",
              "xzy", "\n", "A", "x", "", "变量"]
    patterns = [p for p, _, _ in SEMANTICS]
    df = spark.createDataFrame([(s,) for s in probes], "s string")
    for pat in patterns:
        jp = java_pattern(pat)
        got_jvm = {r["s"]: bool(r["ok"]) for r in
                   df.select("s", F.col("s").rlike(jp).alias("ok"))
                     .collect()}
        rx = compile_ecma(pat)
        mism = [(s, got_jvm[s], rx.search(s) is not None) for s in probes
                if got_jvm[s] != (rx.search(s) is not None)]
        assert not mism, f"pattern {pat!r}: jvm/python disagree: {mism}"


def test_pattern_keyword_uses_ecma_semantics():
    """`pattern` through the interpreter gets ECMA $ and ASCII \\d."""
    from m3spark.schema import compile_schema
    cs = compile_schema({"pattern": "^a$"})
    assert cs.is_valid("a")
    assert not cs.is_valid("a\n")
    cs = compile_schema({"pattern": "^\\d+$"})
    assert not cs.is_valid("١٢٣")


def test_columnar_pattern_matches_interpreter(spark):
    """Columnar rlike fast path carries the same ECMA semantics."""
    from m3spark.columnar import ColumnarValidator
    data = [("a",), ("a\n",), ("123",), ("١٢٣",)]
    df = spark.createDataFrame(data, "x string")
    cv = ColumnarValidator({"properties": {"x": {"pattern": "^a$"}}})
    got = {r["x"]: r["valid"] for r in cv.apply(df).collect()}
    assert got["a"] is True and got["a\n"] is False
    cv2 = ColumnarValidator({"properties": {"x": {"pattern": "^\\d+$"}}})
    got2 = {r["x"]: r["valid"] for r in cv2.apply(df).collect()}
    assert got2["123"] is True and got2["١٢٣"] is False
