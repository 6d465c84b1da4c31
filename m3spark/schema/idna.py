"""IDN hostname validation per IDNA2008/UTS#46 (reference:
idn_hostname.cljc — ICU4J UTS#46 with CHECK_BIDI / CHECK_CONTEXTJ /
CHECK_CONTEXTO / nontransitional, plus RFC 5892 §2.6 disallowed
exceptions the library doesn't enforce).

This container has no ICU, so the checks are implemented directly from
the RFCs over ``unicodedata``:

- label structure: dot variants mapped, empty/leading/trailing labels,
  hyphen rules (RFC 5891 4.2.3.1), leading-combining-mark rule
  (RFC 5891 4.2.3.2), ACE label <= 63 / domain <= 253 (verifyDNSLength)
- punycode: decode + canonical round-trip for xn-- labels
- RFC 5892 §2.6 disallowed exceptions (same ten code points the
  reference lists)
- CONTEXTJ (RFC 5892 A.1/A.2): ZWNJ/ZWJ after virama; ZWNJ joining-type
  rule with a compact Arabic joining-type table
- CONTEXTO (A.3-A.9): middle dot, Greek keraia, Hebrew geresh /
  gershayim, Katakana middle dot, Arabic-Indic vs Extended
  Arabic-Indic digit mixing
- RFC 5893 BiDi rule via ``unicodedata.bidirectional``

Verdict parity is pinned against the reference's own test list
(test/cljc/m3/idn_hostname_test.cljc:22-74) in
tests/test_idn_hostname.py.  The general-category screen is an
approximation of the full IDNA2008 derived table (documented
divergence: rare PVALID symbols outside the allow-list below would be
rejected)."""

from __future__ import annotations

import re
import unicodedata

_DOT_VARIANTS = re.compile("[。．｡]")

# RFC 5892 Section 2.6 (idn_hostname.cljc:60-71)
_DISALLOWED_EXCEPTIONS = {
    0x0640, 0x07FA, 0x302E, 0x302F, 0x3031, 0x3032, 0x3033, 0x3034,
    0x3035, 0x303B,
}

# PVALID/CONTEXTO code points whose general category would otherwise be
# screened out (punctuation/symbols)
_ALLOWED_PUNCT = {
    0x002D,  # hyphen-minus
    0x00B7,  # middle dot (CONTEXTO A.3)
    0x0375,  # Greek lower numeral sign / keraia (A.4)
    0x05F3,  # Hebrew geresh (A.5)
    0x05F4,  # Hebrew gershayim (A.6)
    0x30FB,  # Katakana middle dot (A.7)
    0x0F0B,  # Tibetan tsheg (PVALID)
    0x06FD, 0x06FE,  # Arabic Sindhi signs (PVALID, category So)
}

# Right-joining Arabic letters (for the ZWNJ rule A.1); everything else
# in the Arabic blocks with category L* is treated as dual-joining
_ARABIC_R = {0x0622, 0x0623, 0x0624, 0x0625, 0x0627, 0x0629, 0x062F,
             0x0630, 0x0631, 0x0632, 0x0648, 0x0671}
_ARABIC_R |= set(range(0x0688, 0x069A))  # dal/ra extensions
_ARABIC_R |= {0x06C0, 0x06C3, 0x06C4, 0x06C5, 0x06C6, 0x06C7, 0x06C8,
              0x06C9, 0x06CA, 0x06CB, 0x06CD, 0x06CF, 0x06D2, 0x06D3,
              0x06D5}

_ARABIC_BLOCKS = ((0x0600, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08FF),
                  (0xFB50, 0xFDFF), (0xFE70, 0xFEFF))


def _join_type(cp: int) -> str:
    ch = chr(cp)
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Me"):
        return "T"
    if cat == "Cf":
        return "T"
    if any(lo <= cp <= hi for lo, hi in _ARABIC_BLOCKS) and cat[0] == "L":
        return "R" if cp in _ARABIC_R else "D"
    return "U"


def _is_greek(cp: int) -> bool:
    return 0x0370 <= cp <= 0x03FF and cp != 0x0375 or 0x1F00 <= cp <= 0x1FFF


def _is_hebrew(cp: int) -> bool:
    return 0x0590 <= cp <= 0x05FF or 0xFB1D <= cp <= 0xFB4F


def _is_hkh(cp: int) -> bool:  # Hiragana / Katakana / Han
    # NB: U+30FB (the middle dot itself) and U+30A0 are script=Common,
    # not Katakana — they must not satisfy the A.7 "contains HKH" rule
    return (0x3041 <= cp <= 0x309F
            or (0x30A1 <= cp <= 0x30FF and cp != 0x30FB)
            or 0x31F0 <= cp <= 0x31FF or 0xFF66 <= cp <= 0xFF9F
            or 0x3400 <= cp <= 0x4DBF or 0x4E00 <= cp <= 0x9FFF
            or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2FA1F
            or cp in (0x3005, 0x3006, 0x3007))


def _contextj_ok(cp: int, cps: list[int], i: int) -> bool:
    # RFC 5892 A.1 (ZWNJ) / A.2 (ZWJ): preceding virama always suffices
    if i > 0 and unicodedata.combining(chr(cps[i - 1])) == 9:
        return True
    if cp == 0x200D:
        return False  # ZWJ strictly requires a preceding virama
    # ZWNJ: {L,D}(T)* ZWNJ (T)*{R,D}
    j = i - 1
    while j >= 0 and _join_type(cps[j]) == "T":
        j -= 1
    if j < 0 or _join_type(cps[j]) not in ("L", "D"):
        return False
    k = i + 1
    while k < len(cps) and _join_type(cps[k]) == "T":
        k += 1
    return k < len(cps) and _join_type(cps[k]) in ("R", "D")


def _contexto_ok(cp: int, cps: list[int], i: int) -> bool:
    if cp == 0x00B7:  # A.3: between two 'l'
        return (0 < i < len(cps) - 1 and cps[i - 1] == 0x6C
                and cps[i + 1] == 0x6C)
    if cp == 0x0375:  # A.4: followed by Greek
        return i < len(cps) - 1 and _is_greek(cps[i + 1])
    if cp in (0x05F3, 0x05F4):  # A.5/A.6: preceded by Hebrew
        return i > 0 and _is_hebrew(cps[i - 1])
    if cp == 0x30FB:  # A.7: label contains Hiragana/Katakana/Han
        return any(_is_hkh(c) for c in cps)
    return True


def _bidi_ok(label_cps: list[list[int]]) -> bool:
    """RFC 5893: in a BiDi domain every label must be a valid RTL or
    LTR label."""
    cats = [[unicodedata.bidirectional(chr(c)) for c in cps]
            for cps in label_cps]
    if not any(c in ("R", "AL", "AN") for lab in cats for c in lab):
        return True  # not a BiDi domain name
    for lab in cats:
        if not lab:
            continue
        if lab[0] in ("R", "AL"):
            if any(c not in ("R", "AL", "AN", "EN", "ES", "CS", "ET",
                             "ON", "BN", "NSM") for c in lab):
                return False
            tail = [c for c in lab if c != "NSM"]
            if not tail or tail[-1] not in ("R", "AL", "EN", "AN"):
                return False
            if "EN" in lab and "AN" in lab:
                return False
        elif lab[0] == "L":
            if any(c not in ("L", "EN", "ES", "CS", "ET", "ON", "BN",
                             "NSM") for c in lab):
                return False
            tail = [c for c in lab if c != "NSM"]
            if not tail or tail[-1] not in ("L", "EN"):
                return False
        else:
            return False
    return True


def _check_unicode_label(u: str) -> bool:
    if not u:
        return False
    if u.startswith("-") or u.endswith("-"):
        return False
    if len(u) >= 4 and u[2:4] == "--":
        return False
    if unicodedata.category(u[0]).startswith("M"):
        return False  # RFC 5891 4.2.3.2: no leading combining mark
    cps = [ord(c) for c in u]
    # A.8/A.9: Arabic-Indic and Extended Arabic-Indic digits can't mix
    if any(0x0660 <= c <= 0x0669 for c in cps) and \
            any(0x06F0 <= c <= 0x06F9 for c in cps):
        return False
    for i, cp in enumerate(cps):
        if cp in _DISALLOWED_EXCEPTIONS:
            return False
        if cp in (0x200C, 0x200D):
            if not _contextj_ok(cp, cps, i):
                return False
            continue
        if cp in _ALLOWED_PUNCT:
            if not _contexto_ok(cp, cps, i):
                return False
            continue
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if cat[0] in ("Z", "C", "P", "S"):
            return False  # spaces / controls / punctuation / symbols
        if cp <= 0x7F and not (ch.isalnum()):
            return False
    return True


def _check_label(label: str) -> tuple[bool, int, str]:
    """-> (ok, ace_length, unicode_form)"""
    low = label.lower()
    if low.startswith("xn--"):
        if not label.isascii():
            return False, 0, label
        ace = low[4:]
        try:
            u = ace.encode("ascii").decode("punycode")
            # canonical round-trip (catches junk like xn--X)
            if u.encode("punycode").decode("ascii") != ace:
                return False, 0, label
        except (UnicodeError, UnicodeDecodeError, ValueError):
            return False, 0, label
        if u.isascii():
            return False, 0, label  # ACE must encode non-ASCII
        return _check_unicode_label(u), len(label), u
    if label.isascii():
        return _check_unicode_label(low), len(label), label
    nfc = unicodedata.normalize("NFC", label)
    if nfc != label:
        return False, 0, label  # UTS#46 nontransitional: must be NFC
    try:
        ace_len = 4 + len(label.encode("punycode"))
    except (UnicodeError, ValueError):
        return False, 0, label
    return _check_unicode_label(label), ace_len, label


def check_idn_hostname(s: str) -> bool:
    """UTS#46/IDNA2008 hostname verdicts matching the reference's
    json-idn-hostname? (idn_hostname.cljc:173-196)."""
    s = _DOT_VARIANTS.sub(".", s)
    if not s or s.startswith(".") or s.endswith(".") or ".." in s:
        return False
    labels = s.split(".")
    total = len(labels) - 1  # dots
    unicode_labels = []
    for label in labels:
        ok, ace_len, u = _check_label(label)
        if not ok or ace_len > 63:
            return False
        total += ace_len
        unicode_labels.append([ord(c) for c in u])
    if total > 253:
        return False
    return _bidi_ok(unicode_labels)
