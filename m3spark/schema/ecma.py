"""ECMA-262 regex semantics layer (reference: ecma.cljc:27-38 compiles
patterns under GraalJS; format.cljc:239-249 uses ECMA compilability).

JSON Schema `pattern`, `patternProperties` and `format: regex` are
defined over ECMA-262 regular expressions.  This engine executes them on
Python `re` (interpreter / Arrow UDFs) or Java regex (columnar rlike),
so this module does three jobs:

1. REJECT constructs that are Python/Java-only and not ECMA
   (`(?P<name>)`, `(?P=name)`, `(?#comment)`, conditionals `(?(..)`,
   `\\A`, `\\Z`, `\\z`) — GraalJS would refuse these, so `format: regex`
   must too.
2. TRANSLATE ECMA constructs the host engines lack or interpret
   differently:
     - named groups `(?<name>...)` -> `(?P<name>...)` (Python form)
     - named backrefs `\\k<name>`  -> `(?P=name)` (Python form)
     - `\\cX` control escapes      -> `\\xNN`
     - `\\u{XXXX}` (u-flag form)   -> `\\uXXXX` / `\\UXXXXXXXX`
     - `.`  (outside classes)      -> `[^\\n\\r\\u2028\\u2029]`
       (ECMA excludes all four line terminators; Python excludes only
       \\n, Java also excludes \\x85)
     - `$`  (outside classes)      -> `\\Z` (Python) / `\\z` (Java):
       ECMA `$` without the m-flag matches ONLY at the very end, while
       Python/Java also match before a trailing newline
     - `[]` (empty class)          -> `(?!)` (never matches)
     - `[^]`                       -> `[\\s\\S]` (matches anything)
3. CLASSIFY remaining divergences: anything the translation cannot make
   exact raises :class:`EcmaUnsupported`, and callers fall back to the
   documented behavior (pattern keyword: ignored, like the reference
   ignores uncompilable patterns; format regex: invalid).
"""

from __future__ import annotations

import re

_NAME = r"[A-Za-z_$][A-Za-z0-9_$]*"
_PY_ONLY = ("(?P", "(?#", "(?(")


class EcmaUnsupported(re.error):
    """Pattern uses a construct with no exact Python/Java equivalent."""


def translate(pattern: str, flavor: str = "python") -> str:
    """Translate an ECMA-262 pattern for the given engine flavor
    ('python' or 'java').  Raises ``re.error`` (or the
    :class:`EcmaUnsupported` subclass) for ECMA-invalid constructs."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    dollar = "\\Z" if flavor == "python" else "\\z"
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                raise re.error("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "c" and i + 2 < n and pattern[i + 2].isascii() \
                    and pattern[i + 2].isalpha():
                out.append("\\x%02x" % (ord(pattern[i + 2].upper()) - 64))
                i += 3
                continue
            if nxt == "u":
                m = re.match(r"\\u\{([0-9A-Fa-f]{1,6})\}", pattern[i:])
                if m:
                    cp = int(m.group(1), 16)
                    if flavor == "java":
                        out.append("\\x{%x}" % cp)
                    else:
                        out.append("\\U%08x" % cp if cp > 0xFFFF
                                   else "\\u%04x" % cp)
                    i += m.end()
                    continue
            if not in_class and nxt == "k":
                m = re.match(rf"\\k<({_NAME})>", pattern[i:])
                if m:
                    name = m.group(1)
                    if "$" in name:
                        raise EcmaUnsupported(
                            "group name with $ has no host equivalent")
                    out.append(f"(?P={name})" if flavor == "python"
                               else f"\\k<{name}>")
                    i += m.end()
                    continue
                raise re.error("\\k must be a named backreference in ECMA")
            if not in_class and nxt in "AZz":
                # Python/Java-only absolute anchors; ECMA has no \A/\Z/\z
                raise re.error(f"\\{nxt} is not ECMA-262")
            out.append(ch)
            out.append(nxt)
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            if pattern.startswith("[^]", i):
                out.append("[\\s\\S]")
                i += 3
                continue
            if pattern.startswith("[]", i):
                out.append("(?!)")  # ECMA empty class: never matches
                i += 2
                continue
            in_class = True
            out.append(ch)
            i += 1
            continue
        if ch == "(":
            for py_only in _PY_ONLY:
                if pattern.startswith(py_only, i):
                    raise re.error(f"{py_only}... is not ECMA-262")
            m = re.match(rf"\(\?<({_NAME})>", pattern[i:])
            if m:  # named group (not lookbehind: name can't start =/!)
                name = m.group(1)
                if "$" in name:
                    raise EcmaUnsupported(
                        "group name with $ has no host equivalent")
                out.append(f"(?P<{name}>" if flavor == "python"
                           else f"(?<{name}>")
                i += m.end()
                continue
            out.append(ch)
            i += 1
            continue
        if ch == ".":
            out.append("[^\\n\\r\\u2028\\u2029]")
            i += 1
            continue
        if ch == "$":
            out.append(dollar)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def compile_ecma(pattern: str) -> re.Pattern:
    """Compile an ECMA-262 pattern under Python re with ECMA semantics.
    ECMA \\d\\w\\s\\b are ASCII; Python defaults to unicode, so compile
    with re.ASCII (explicit \\uXXXX escapes are unaffected by the flag).
    Raises re.error for ECMA-invalid or untranslatable patterns."""
    return re.compile(translate(pattern, "python"), re.ASCII)


def java_pattern(pattern: str) -> str:
    """The Java-regex form for Spark ``rlike`` — raises re.error when
    the pattern can't be made exactly ECMA-equivalent on the JVM."""
    return translate(pattern, "java")


def is_ecma_regex(pattern: str) -> bool:
    """``format: regex`` semantics: compilable under ECMA-262."""
    try:
        compile_ecma(pattern)
        return True
    except re.error:
        return False
