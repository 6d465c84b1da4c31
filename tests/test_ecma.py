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


# -- Annex B (web-legacy) closure battery (r4) ------------------------------
# Hand-derived V8/GraalJS web-compat behaviors (the reference compiles
# under GraalJS, which implements Annex B: ecma.cljc:27-38).

ANNEX_B_VALIDITY = [
    (r"\c1", True),        # \c no control letter: literal backslash-c
    (r"\c", True),
    (r"\8", True),         # identity escape
    (r"\12", True),        # legacy octal (no groups)
    (r"[\1]", True),       # in-class octal
    (r"\x", True),         # malformed hex: identity escape for x
    (r"\xzz", True),
    (r"\u", True),         # malformed unicode: identity escape for u
    (r"[\d-x]", True),     # legacy class: dash next to class escape
    (r"[a-\d]", True),
    (r"a{2", True),        # unclosed quantifier: literal
    (r"a{", True),
    (r"}", True),          # dangling } is literal
    (r"]", True),          # dangling ] is literal
]

ANNEX_B_SEMANTICS = [
    (r"\c1", "\\c1", True),
    (r"\c1", "c1", False),
    (r"(a)\1", "aa", True),          # true backref stays a backref
    (r"(a)\1", "a\x01", False),
    (r"\1", "\x01", True),           # no groups: octal 1
    (r"\12", "\n", True),            # octal 12 = LF
    (r"(a)\12", "a\n", True),        # 12 > 1 group: octal
    (r"(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)\11", "abcdefghijkk", True),
    (r"\8", "8", True),
    (r"\9x", "9x", True),
    (r"\012", "\n", True),
    (r"[\1]", "\x01", True),
    (r"[\8]", "8", True),
    (r"\x", "x", True),
    (r"\xzz", "xzz", True),
    (r"\x41", "A", True),            # well-formed hex still hex
    (r"A", "A", True),
    (r"\uzz", "uzz", True),
    (r"[\d-x]", "-", True),
    (r"[\d-x]", "5", True),
    (r"[\d-x]", "q", False),
    (r"[a-\d]", "-", True),
    (r"a{2", "a{2", True),
    (r"a{2", "aa", False),
    (r"x{1,2}", "x", True),          # real quantifiers untouched
    (r"x{1,2}", "{", False),
    # r6: in-class ClassControlLetter takes digits and _ too
    (r"[\c5]", "\x15", True),
    (r"[\c5]", "\\", False),
    (r"[\c5]", "5", False),
    (r"[\c_]", "\x1f", True),
    (r"[\c_]", "_", False),
    (r"\c5", "\\c5", True),          # OUTSIDE a class: still literal \c
    (r"\c5", "\x15", False),
    # r6: leading valid-shaped braced quantifier is literal text
    (r"{2}", "{2}", True),
    (r"{2}", "xx", False),
    (r"{2,3}", "{2,3}", True),
    (r"(?:{2})x", "{2}x", True),
    (r"a|{3}", "{3}", True),
    (r"({2})", "{2}", True),
    (r"\({2}", "((", True),          # escaped paren IS an atom
    (r"\({2}", "({2}", False),
]


@pytest.mark.parametrize("pattern,want", ANNEX_B_VALIDITY,
                         ids=[p for p, _ in ANNEX_B_VALIDITY])
def test_annex_b_validity(pattern, want):
    assert is_ecma_regex(pattern) == want


@pytest.mark.parametrize("pattern,s,want", ANNEX_B_SEMANTICS,
                         ids=[f"{p}~{s!r}" for p, s, _ in ANNEX_B_SEMANTICS])
def test_annex_b_semantics(pattern, s, want):
    rx = compile_ecma(pattern)
    assert (rx.search(s) is not None) == want


def test_annex_b_jvm_agreement(spark):
    """JVM rlike path agrees verdict-for-verdict with compile_ecma on
    every Annex-B probe."""
    probes = sorted({s for _, s, _ in ANNEX_B_SEMANTICS})
    patterns = sorted({p for p, _, _ in ANNEX_B_SEMANTICS})
    df = spark.createDataFrame([(s,) for s in probes], "s string")
    mism = []
    for pat in patterns:
        jp = java_pattern(pat)
        got_jvm = {r["s"]: bool(r["ok"]) for r in
                   df.select("s", F.col("s").rlike(jp).alias("ok"))
                     .collect()}
        rx = compile_ecma(pat)
        mism += [(pat, s, got_jvm[s], rx.search(s) is not None)
                 for s in probes
                 if got_jvm[s] != (rx.search(s) is not None)]
    assert not mism, mism


def test_lone_surrogate_escape():
    rx = compile_ecma(r"\ud800")
    assert rx.search("\ud800") is not None
    assert rx.search("a") is None


# ---- r7: astral literals under quantifiers (ECMA residual #3) ----
# ECMA non-u patterns are interpreted over UTF-16 units: a quantifier
# after an astral literal binds only the trailing LOW surrogate (the
# classic /💩{2}/ never matches "💩💩").  Expectations below are the
# spec unit semantics, hand-derived.

ASTRAL_SEMANTICS = [
    ("😀", "😀", True),
    ("😀", "x😀y", True),
    ("😀", "🙄", False),
    ("😀{2}", "😀😀", False),          # needs hi lo lo — not hi lo hi lo
    ("😀{1}", "😀", True),
    ("😀+", "😀😀", True),             # one rep of lo suffices
    ("^😀+$", "😀😀", False),
    ("^😀+$", "😀", True),
    ("😀?", "x", False),               # hi is NOT optional
    ("😀*", "abc", False),
    ("😀{2,}", "😀", False),
    ("😀{0,3}", "😀", True),
    ("a😀{1,2}b", "a😀b", True),
    ("a😀{1,2}b", "a😀😀b", False),
    ("😀{0}x", "😀x", False),          # zero reps leave a lone hi atom
    ("\\uD83D\\uDE00", "😀", True),    # escape pair == raw literal
    ("\\uD83D\\uDE00{2}", "😀😀", False),
    ("\\u{1F600}{2}", "😀😀", False),
    ("😀+?", "😀😀", True),            # lazy variant, same language
]


def test_astral_quantifier_python_semantics():
    """compile_ecma applies ECMA unit semantics, including on strings
    that really contain lone surrogates (JSON \\uD800 escapes)."""
    for pat, s, want in ASTRAL_SEMANTICS:
        rx = compile_ecma(pat)
        assert (rx.search(s) is not None) == want, (pat, s, want)
    # lone-surrogate inputs: hi lo lo maps to PAIR + lone-lo in Python
    assert compile_ecma("😀{2}").search("😀\ude00")
    assert compile_ecma("😀{0}x").search("\ud83dx")


def test_astral_quantifier_jvm_agreement(spark):
    """Java rlike on the translated pattern agrees with compile_ecma on
    every (well-formed) astral probe."""
    probes = sorted({s for _, s, _ in ASTRAL_SEMANTICS})
    df = spark.createDataFrame([(s,) for s in probes], "s string")
    mism = []
    for pat in sorted({p for p, _, _ in ASTRAL_SEMANTICS}):
        jp = java_pattern(pat)
        got = {r["s"]: bool(r["ok"]) for r in
               df.select("s", F.col("s").rlike(jp).alias("ok")).collect()}
        mism += [(pat, s, got[s]) for s in probes
                 if got[s] != (compile_ecma(pat).search(s) is not None)]
    assert not mism, mism


def test_astral_in_class_classified():
    """Astral code points inside a character class keep unit-level
    ECMA semantics no host engine can reproduce exactly — classified
    EcmaUnsupported (pattern ignored / format:regex invalid), never a
    silently wrong verdict."""
    from m3spark.schema.ecma import is_ecma_regex
    for pat in ("[😀]", "[\\uD83D\\uDE00]", "[\\u{1F600}]", "[a😀]"):
        assert not is_ecma_regex(pat), pat
    # BMP classes and standalone astral atoms are unaffected
    assert is_ecma_regex("[\\u0041-\\u005A]")
    assert is_ecma_regex("\\u{1F600}")
