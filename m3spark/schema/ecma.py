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


def _quant_at_atom_start(pattern: str, i: int) -> bool:
    """True when a braced quantifier at ``i`` has no preceding atom:
    pattern start, right after an (unescaped) group-open or
    alternation bar, or after a group prefix.  (Deeper cases — after
    ^, after another quantifier, after a named-group open — keep the
    classified-invalid route.)"""
    if i == 0:
        return True
    for pre in ("(?:", "(?=", "(?!", "(?<=", "(?<!"):
        if pattern.endswith(pre, 0, i):
            return True
    prev = pattern[i - 1]
    if prev not in "(|":
        return False
    # an ESCAPED '(' or '|' is a literal atom the quantifier can bind to
    nb = 0
    j = i - 2
    while j >= 0 and pattern[j] == "\\":
        nb += 1
        j -= 1
    return nb % 2 == 0


class EcmaUnsupported(re.error):
    """Pattern uses a construct with no exact Python/Java equivalent."""


_QUANT_RE = re.compile(r"([?*+]|\{\d+(?:,\d*)?\})(\??)")


def _read_quant(pattern: str, i: int):
    """Parse a quantifier at ``i`` -> (min, max, lazy, end) or None;
    max=None means unbounded.  Raises for min > max (ECMA error)."""
    m = _QUANT_RE.match(pattern, i)
    if not m:
        return None
    tok, lazy = m.group(1), bool(m.group(2))
    if tok == "?":
        lo, hi = 0, 1
    elif tok == "*":
        lo, hi = 0, None
    elif tok == "+":
        lo, hi = 1, None
    else:
        body = tok[1:-1]
        if "," in body:
            a, b = body.split(",")
            lo, hi = int(a), (int(b) if b else None)
        else:
            lo = hi = int(body)
    if hi is not None and hi < lo:
        raise re.error("min repeat greater than max repeat")
    return lo, hi, lazy, m.end()


def _astral_atom(pattern: str, i_after: int, cp: int, flavor: str):
    """(translated, new_index) for an astral LITERAL in concatenation
    position, including any quantifier that follows it.

    ECMA non-u patterns are interpreted over UTF-16 CODE UNITS: the
    literal is two unit atoms hi,lo and a quantifier binds only the
    trailing LOW surrogate (the classic `/💩{2}/` never matches
    "💩💩").  Python/Java both quantify the composed code point, so
    the unit language hi·lo{m,n} is rewritten explicitly:

        m == 0:  (?:HI|PAIR·LO{0,n-1})      (zero reps leave a lone hi)
        m >= 1:  PAIR·LO{m-1,n-1}

    where HI/LO are lone-surrogate atoms.  In Python, strings really
    can contain lone surrogates (JSON \\uD800 escapes), and a
    well-formed JS unit sequence hi lo lo... maps to the Python code
    points PAIR lo lo... — so the rewrite is exact there.  In Java,
    lone-surrogate atoms simply never match the well-formed UTF-16
    that Spark's UTF-8 data decodes to, which collapses the same
    rewrite to the exact verdict (pair present for m <= 1 <= n,
    unmatchable otherwise).  Closes enumerated ECMA residual #3."""
    if flavor == "java":
        pair, hi_e, lo_e = ("\\x{%x}" % cp,
                            "\\x{%x}" % (0xD800 + ((cp - 0x10000) >> 10)),
                            "\\x{%x}" % (0xDC00 + ((cp - 0x10000) & 0x3FF)))
    else:
        pair, hi_e, lo_e = ("\\U%08x" % cp,
                            "\\u%04x" % (0xD800 + ((cp - 0x10000) >> 10)),
                            "\\u%04x" % (0xDC00 + ((cp - 0x10000) & 0x3FF)))
    q = _read_quant(pattern, i_after)
    if q is None:
        return pair, i_after
    lo_n, hi_n, lazy, end = q
    laz = "?" if lazy else ""

    def lo_rep(mn: int, mx: int | None) -> str:
        # LO{mn,mx} suffix (already shifted by -1), simplified
        if mx == 0:
            return ""
        if mx is None:
            if mn == 0:
                return lo_e + "*" + laz
            if mn == 1:
                return lo_e + "+" + laz
            return lo_e + "{%d,}" % mn + laz
        if mn == mx:
            return lo_e if mn == 1 else lo_e + "{%d}" % mn
        if (mn, mx) == (0, 1):
            return lo_e + "?" + laz
        return lo_e + "{%d,%d}" % (mn, mx) + laz

    if lo_n == 0:
        if hi_n == 0:  # {0}: zero reps of the LOW unit — a lone hi
            return hi_e, end
        body = pair + lo_rep(0, None if hi_n is None else hi_n - 1)
        return "(?:%s|%s)" % (hi_e, body), end
    return pair + lo_rep(lo_n - 1, None if hi_n is None else hi_n - 1), end


_HI_SUR = re.compile(r"\\u([Dd][89AaBb][0-9A-Fa-f]{2})")
_LO_SUR = re.compile(r"\\u([Dd][C-Fc-f][0-9A-Fa-f]{2})")


def _count_captures(pattern: str) -> int:
    """Capturing-group count (plain ``(`` + named groups), class-aware —
    decides whether a decimal escape is a backreference or Annex-B
    legacy octal."""
    count = 0
    i, n = 0, len(pattern)
    in_cls = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_cls:
            if c == "]":
                in_cls = False
            i += 1
            continue
        if c == "[":
            in_cls = True
        elif c == "(":
            if not pattern.startswith("(?", i):
                count += 1
            elif re.match(rf"\(\?<{_NAME}>", pattern[i:]):
                count += 1  # named groups capture; (?<= (?<! do not
        i += 1
    return count


def _octal_escape(digits: str, flavor: str):
    """(translated, n_digits_consumed) for an Annex-B legacy octal /
    identity escape: longest <=3-digit octal prefix with value <= 0377;
    ``\\8``/``\\9`` are identity escapes (the digit itself)."""
    j, val = 0, 0
    while j < len(digits) and j < 3 and digits[j] in "01234567" \
            and val * 8 + int(digits[j]) <= 0o377:
        val = val * 8 + int(digits[j])
        j += 1
    if j == 0:  # \8 \9 -> the literal digit
        return digits[0], 1
    rep = ("\\x{%x}" % val) if flavor == "java" else ("\\x%02x" % val)
    return rep, j


def translate(pattern: str, flavor: str = "python") -> str:
    """Translate an ECMA-262 pattern for the given engine flavor
    ('python' or 'java').  Raises ``re.error`` (or the
    :class:`EcmaUnsupported` subclass) for ECMA-invalid constructs.

    Annex-B web-legacy forms are translated exactly (matching GraalJS,
    which compiles in web-compatibility mode — reference
    ecma.cljc:27-38): decimal escapes beyond the capture count are
    legacy octal, ``\\8``/``\\9`` are identity escapes, ``\\c`` with no
    control letter matches the two characters ``\\c``, and ``\\x``/
    ``\\u`` with malformed hex are identity escapes for ``x``/``u``."""
    out: list[str] = []
    i, n = 0, len(pattern)
    n_caps = _count_captures(pattern)
    in_class = False
    dollar = "\\Z" if flavor == "python" else "\\z"
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                raise re.error("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "c":
                if i + 2 < n and pattern[i + 2].isascii() \
                        and pattern[i + 2].isalpha():
                    out.append("\\x%02x"
                               % (ord(pattern[i + 2].upper()) - 64))
                    i += 3
                elif in_class and i + 2 < n \
                        and (pattern[i + 2].isdigit()
                             or pattern[i + 2] == "_"):
                    # Annex B ClassControlLetter: INSIDE a class \c also
                    # takes a decimal digit or _, mapping to the control
                    # char ord(ch) % 32 (GraalJS web-compat parity)
                    out.append("\\x%02x" % (ord(pattern[i + 2]) % 32))
                    i += 3
                else:
                    # Annex B: \c with no control letter matches the
                    # literal two characters backslash + c
                    out.append("\\\\c")
                    i += 2
                continue
            if nxt.isdigit():
                digits = re.match(r"[0-9]+", pattern[i + 1:]).group(0)
                if not in_class and nxt != "0" \
                        and int(digits) <= n_caps:
                    out.append("\\" + digits)  # true backreference
                    i += 1 + len(digits)
                    continue
                # Annex B legacy octal / identity escape (classes have
                # no backrefs: always octal there)
                rep, used = _octal_escape(digits, flavor)
                out.append(rep)
                i += 1 + used
                continue
            if nxt == "x" and not re.match(r"\\x[0-9A-Fa-f]{2}",
                                           pattern[i:]):
                out.append("x")  # Annex B identity escape
                i += 2
                continue
            if nxt == "u":
                m = re.match(r"\\u\{([0-9A-Fa-f]{1,6})\}", pattern[i:])
                if m:
                    cp = int(m.group(1), 16)
                    if cp > 0xFFFF:
                        if in_class:
                            raise EcmaUnsupported(
                                "astral code point in a character class "
                                "has unit-level ECMA semantics with no "
                                "exact host translation")
                        rep, ni = _astral_atom(pattern, i + m.end(),
                                               cp, flavor)
                        out.append(rep)
                        i = ni
                        continue
                    if flavor == "java":
                        out.append("\\x{%x}" % cp)
                    else:
                        out.append("\\u%04x" % cp)
                    i += m.end()
                    continue
                # adjacent surrogate-pair escapes 😀: two ECMA
                # unit atoms forming a pair — same unit language as a
                # raw astral literal, so route through _astral_atom
                # (hosts would otherwise compose or mis-quantify them)
                mh = _HI_SUR.match(pattern, i)
                if mh:
                    ml = _LO_SUR.match(pattern, i + 6)
                    if ml:
                        hi_v = int(mh.group(1), 16)
                        lo_v = int(ml.group(1), 16)
                        cp = (0x10000 + ((hi_v - 0xD800) << 10)
                              + (lo_v - 0xDC00))
                        if in_class:
                            raise EcmaUnsupported(
                                "astral code point in a character class "
                                "has unit-level ECMA semantics with no "
                                "exact host translation")
                        rep, ni = _astral_atom(pattern, i + 12, cp, flavor)
                        out.append(rep)
                        i = ni
                        continue
                if not re.match(r"\\u[0-9A-Fa-f]{4}", pattern[i:]):
                    out.append("u")  # Annex B identity escape
                    i += 2
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
            if in_class and nxt in "dDsSwW" and i < n \
                    and pattern[i] == "-" and not \
                    pattern.startswith("-]", i):
                # Annex B: dash AFTER a class escape is literal too
                out.append("\\-")
                i += 1
            continue
        if in_class:
            if ord(ch) > 0xFFFF:
                raise EcmaUnsupported(
                    "astral code point in a character class has "
                    "unit-level ECMA semantics with no exact host "
                    "translation")
            if ch == "]":
                in_class = False
            elif ch == "-" and re.match(r"\\[dDsSwW]",
                                        pattern[i + 1:i + 3]):
                # Annex B legacy class: a dash adjacent to a class
                # escape is a LITERAL dash (\d-x is not a range);
                # Python rejects the bare form, so escape it
                out.append("\\-")
                i += 1
                continue
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
        if ch == "{" and not re.match(r"\{\d+(,\d*)?\}", pattern[i:]):
            # Annex B: a '{' that opens no valid quantifier is a
            # literal (Python agrees; Java would reject it unescaped)
            out.append("\\{")
            i += 1
            continue
        if ch == "{" and _quant_at_atom_start(pattern, i):
            # Annex B web-compat (GraalJS/V8): a valid-shaped braced
            # quantifier with NO preceding atom — pattern start, right
            # after '(' / '(?:' / '(?=' / '(?!' / '|' — matches its
            # literal text (both host engines would reject it)
            out.append("\\{")
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
        if ord(ch) > 0xFFFF:
            # raw astral literal: two ECMA unit atoms (see _astral_atom)
            rep, ni = _astral_atom(pattern, i + 1, ord(ch), flavor)
            out.append(rep)
            i = ni
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
