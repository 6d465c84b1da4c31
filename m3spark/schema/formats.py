"""Format validators (scalar string predicates).

From-scratch Python equivalents of the reference's format checkers
(m3: src/cljc/m3/format.cljc:90-314, regex table src/cljc/m3/pattern.cljc).
Regexes are written fresh from the RFCs (3339, 3986, 4122, 6570, 6901/6902).

Each validator is ``str -> bool``; non-string values are handled upstream
(format only constrains strings).  ``FORMATS[draft_family]`` maps format
name -> validator.  ``SPARK_RLIKE`` additionally exposes Java-regex-safe
anchored patterns for the columnar (JVM ``rlike``) fast path — only formats
whose full semantics survive a single Java regex appear there; the rest are
evaluated in Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import ipaddress
import re
from datetime import date


def _anchored(pattern: str) -> re.Pattern:
    return re.compile(r"\A(?:" + pattern + r")\Z")


# ---------------------------------------------------------------- date/time

_DATE_RE = _anchored(r"\d{4}-\d{2}-\d{2}")
_TIME_RE = _anchored(
    r"(?P<h>\d{2}):(?P<m>\d{2}):(?P<s>\d{2})(?:\.\d+)?"
    r"(?P<off>[zZ]|[+-]\d{2}:\d{2})"
)


def check_date(s: str) -> bool:
    if not _DATE_RE.match(s):
        return False
    try:
        date.fromisoformat(s)
        return True
    except ValueError:
        return False


def _check_time_parts(h: int, m: int, s: int, off: str) -> bool:
    if h > 23 or m > 59 or s > 60:
        return False
    if off in ("z", "Z"):
        oh, om, sign = 0, 0, 1
    else:
        sign = 1 if off[0] == "+" else -1
        oh, om = int(off[1:3]), int(off[4:6])
        if oh > 23 or om > 59:
            return False
    if s == 60:
        # leap second: only valid when the UTC-normalized time is 23:59:60
        # (reference handles leap seconds specially: format.cljc:65-83)
        total = (h * 60 + m) - sign * (oh * 60 + om)
        total %= 24 * 60
        return total == 23 * 60 + 59
    return True


def check_time(s: str) -> bool:
    m = _TIME_RE.match(s)
    if not m:
        return False
    return _check_time_parts(
        int(m.group("h")), int(m.group("m")), int(m.group("s")), m.group("off")
    )


def check_date_time(s: str) -> bool:
    # RFC 3339: date "T" time; 'T' may be lowercase
    for sep in ("T", "t"):
        if sep in s:
            d, _, t = s.partition(sep)
            return check_date(d) and check_time(t)
    return False


_DURATION_RE = _anchored(
    r"P(?:"
    r"(?:\d+D|\d+M(?:\d+D)?|\d+Y(?:\d+M(?:\d+D)?)?)"
    r"(?:T(?:\d+H(?:\d+M(?:\d+S)?)?|\d+M(?:\d+S)?|\d+S))?"
    r"|T(?:\d+H(?:\d+M(?:\d+S)?)?|\d+M(?:\d+S)?|\d+S)"
    r"|\d+W"
    r")"
)


def check_duration(s: str) -> bool:
    return _DURATION_RE.match(s) is not None


# ---------------------------------------------------------------- network

_HOSTNAME_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
_HOSTNAME_RE = _anchored(_HOSTNAME_LABEL + r"(?:\." + _HOSTNAME_LABEL + r")*")


def check_hostname(s: str) -> bool:
    if len(s) > 253 or not _HOSTNAME_RE.match(s):
        return False
    # A-label (punycode) labels must decode (reference: format.cljc:129-145)
    for label in s.split("."):
        if label.lower().startswith("xn--"):
            try:
                label[4:].encode("ascii").decode("punycode")
            except (UnicodeError, UnicodeDecodeError):
                return False
    return True


def check_idn_hostname(s: str) -> bool:
    """IDNA2008/UTS#46 verdicts matching the reference's ICU4J-backed
    json-idn-hostname? (format.cljc:220-223, idn_hostname.cljc) —
    CONTEXTJ/CONTEXTO/BiDi/disallowed-exception rules implemented from
    the RFCs in m3spark.schema.idna; verdict parity pinned against the
    reference's own test list in tests/test_idn_hostname.py."""
    from m3spark.schema.idna import check_idn_hostname as _impl
    try:
        return _impl(s)
    except Exception:
        return False


def check_ipv4(s: str) -> bool:
    # strict dotted quad, no leading zeros
    try:
        if not re.match(r"\A(\d{1,3}\.){3}\d{1,3}\Z", s):
            return False
        ipaddress.IPv4Address(s)
        return True
    except (ipaddress.AddressValueError, ValueError):
        return False


def check_ipv6(s: str) -> bool:
    # RFC 2373 grammar: no zone ids (Python's ipaddress accepts '%zone',
    # the reference's regex does not — pattern.cljc:25)
    if "%" in s:
        return False
    try:
        ipaddress.IPv6Address(s)
        return True
    except (ipaddress.AddressValueError, ValueError):
        return False


# ---------------------------------------------------------------- email

_ATEXT = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]"
_DOT_ATOM = rf"{_ATEXT}+(?:\.{_ATEXT}+)*"
_QUOTED = r'"(?:[^"\\\r\n]|\\.)*"'
# validates the LOCAL part alone (the address splits at the LAST '@',
# so an unquoted '@' inside the local part must fail)
_EMAIL_LOCAL_RE = _anchored(rf"(?:{_DOT_ATOM}|{_QUOTED})")


def _email_domain_ok(domain: str) -> bool:
    if domain.startswith("[") and domain.endswith("]"):
        inner = domain[1:-1]
        if inner.lower().startswith("ipv6:"):
            return check_ipv6(inner[5:])
        return check_ipv4(inner)
    return check_hostname(domain)


def check_email(s: str) -> bool:
    if "@" not in s:
        return False
    local, _, domain = s.rpartition("@")
    if not local or not domain:
        return False
    if not _EMAIL_LOCAL_RE.match(local):
        return False
    return _email_domain_ok(domain)


def check_idn_email(s: str) -> bool:
    if "@" not in s:
        return False
    local, _, domain = s.rpartition("@")
    if not local or not domain:
        return False
    if domain.startswith("["):
        return _email_domain_ok(domain)
    return check_idn_hostname(domain) or check_hostname(domain)


# ---------------------------------------------------------------- URI family

_URI_CHARS = r"[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]"
_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"
# structural: scheme ':' hier-part [?query] [#fragment], all-ASCII charset,
# valid %-escapes (reference adds authority checks: format.cljc:192-209)
_URI_RE = _anchored(rf"{_SCHEME}:{_URI_CHARS}*")
_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _authority_ok(uri: str) -> bool:
    m = re.match(rf"\A{_SCHEME}://([^/?#]*)", uri)
    if not m:
        return True  # no authority component
    auth = m.group(1)
    userinfo, _, hostport = auth.rpartition("@")
    if "[" in userinfo or "]" in userinfo:
        return False
    if hostport.startswith("["):
        host, _, rest = hostport[1:].partition("]")
        if not check_ipv6(host.split("%")[0]):
            # IPvFuture form: v<hex>.<chars>
            if not re.match(r"\Av[0-9A-Fa-f]+\..+\Z", host):
                return False
        if rest and not re.match(r"\A:\d*\Z", rest):
            return False
    else:
        host, _, port = hostport.partition(":")
        if port and not port.isdigit():
            return False
        if "[" in host or "]" in host:
            return False
    return True


def check_uri(s: str) -> bool:
    return (
        _URI_RE.match(s) is not None
        and _PCT_RE.search(s) is None
        and _authority_ok(s)
        and "\\" not in s
    )


def check_uri_reference(s: str) -> bool:
    if "\\" in s or _PCT_RE.search(s):
        return False
    if not re.match(rf"\A{_URI_CHARS}*\Z", s):
        return False
    # a reference with a colon in the first segment must have a valid scheme
    first = re.split(r"[/?#]", s, 1)[0]
    if ":" in first and not re.match(rf"\A{_SCHEME}:", first):
        return False
    return _authority_ok(s) if "//" in s.split("?")[0].split("#")[0][:8] or s.startswith("//") else True


def check_iri(s: str) -> bool:
    # IRI: URI grammar extended with non-ASCII (ucschar); approximate by
    # requiring a scheme and no forbidden ASCII
    if "\\" in s or " " in s or _PCT_RE.search(s):
        return False
    return re.match(rf"\A{_SCHEME}:", s) is not None and _authority_ok(s)


def check_iri_reference(s: str) -> bool:
    if "\\" in s or " " in s or _PCT_RE.search(s):
        return False
    first = re.split(r"[/?#]", s, 1)[0]
    if ":" in first and not re.match(rf"\A{_SCHEME}:", first):
        return False
    return True


_URI_TEMPLATE_RE = _anchored(
    r"(?:[^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}"
    r"|\{[+#./;?&=,!@|]?(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})+"
    r"(?:(?::[1-9][0-9]{0,3})|\*)?"
    r"(?:,(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})+(?:(?::[1-9][0-9]{0,3})|\*)?)*\})*"
)


def check_uri_template(s: str) -> bool:
    return _URI_TEMPLATE_RE.match(s) is not None


# ---------------------------------------------------------------- misc

_UUID_PATTERN = r"[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}"
_UUID_RE = _anchored(_UUID_PATTERN)

_JSON_POINTER_PATTERN = r"(?:/(?:[^~]|~[01])*)*"
_JSON_POINTER_RE = _anchored(_JSON_POINTER_PATTERN)
_REL_JSON_POINTER_PATTERN = r"(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~]|~[01])*)*)"
_REL_JSON_POINTER_RE = _anchored(_REL_JSON_POINTER_PATTERN)


def check_uuid(s: str) -> bool:
    return _UUID_RE.match(s) is not None


def check_json_pointer(s: str) -> bool:
    return _JSON_POINTER_RE.match(s) is not None


def check_relative_json_pointer(s: str) -> bool:
    return _REL_JSON_POINTER_RE.match(s) is not None


def check_regex(s: str) -> bool:
    """Compilability under ECMA-262 semantics (reference compiles under
    GraalJS: format.cljc:239-249).  m3spark.schema.ecma rejects
    Python-only constructs and translates ECMA-only ones, so e.g.
    '(?<name>x)' is valid and '(?P<name>x)' is not — matching GraalJS."""
    from m3spark.schema.ecma import is_ecma_regex
    return is_ecma_regex(s)


# draft-3 extras -------------------------------------------------------------

_CSS_COLORS = {
    "aqua", "black", "blue", "fuchsia", "gray", "green", "lime", "maroon",
    "navy", "olive", "orange", "purple", "red", "silver", "teal", "white",
    "yellow",
}
_HEX_COLOR_RE = _anchored(r"#(?:[0-9A-Fa-f]{3}|[0-9A-Fa-f]{6})")


_RGB_FUNC_RE = _anchored(
    r"rgb\(\s*(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\s*,\s*){2}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\s*\)")


def check_color(s: str) -> bool:
    """CSS2.1 color: named | #hex(3/6) | rgb(0-255,0-255,0-255)
    (reference: pattern.cljc:83 color-pattern + css-color-names)."""
    return (s.lower() in _CSS_COLORS
            or _HEX_COLOR_RE.match(s) is not None
            or _RGB_FUNC_RE.match(s) is not None)


def _always(s: str) -> bool:  # style / phone / utc-millisec: no-op pass
    return True


# RFC 3986 ABNF IPv6 as a single regex (for the JVM rlike fast path; the
# Python checker uses ipaddress, these agree on the RFC grammar)
_H16 = r"[0-9A-Fa-f]{1,4}"
_V4 = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
_LS32 = rf"({_H16}:{_H16}|{_V4})"
IPV6_PATTERN = (
    rf"(({_H16}:){{6}}{_LS32}"
    rf"|::({_H16}:){{5}}{_LS32}"
    rf"|({_H16})?::({_H16}:){{4}}{_LS32}"
    rf"|(({_H16}:)?{_H16})?::({_H16}:){{3}}{_LS32}"
    rf"|(({_H16}:){{0,2}}{_H16})?::({_H16}:){{2}}{_LS32}"
    rf"|(({_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(({_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(({_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(({_H16}:){{0,6}}{_H16})?::)"
)

# components reused by the columnar URI builder (m3spark.columnar)
URI_SCHEME_PATTERN = _SCHEME
URI_CHARSET_PATTERN = rf"{_SCHEME}:{_URI_CHARS}*"
URI_BAD_PCT_PATTERN = r"%(?![0-9A-Fa-f]{2})"


# ---------------------------------------------------------------- registries

FORMATS: dict[str, "callable"] = {
    "date-time": check_date_time,
    "date": check_date,
    "time": check_time,
    "duration": check_duration,
    "email": check_email,
    "idn-email": check_idn_email,
    "hostname": check_hostname,
    "idn-hostname": check_idn_hostname,
    "ipv4": check_ipv4,
    "ipv6": check_ipv6,
    "uri": check_uri,
    "uri-reference": check_uri_reference,
    "iri": check_iri,
    "iri-reference": check_iri_reference,
    "uri-template": check_uri_template,
    "uuid": check_uuid,
    "json-pointer": check_json_pointer,
    "relative-json-pointer": check_relative_json_pointer,
    "regex": check_regex,
    # draft-3 names
    "ip-address": check_ipv4,
    "host-name": check_hostname,
    "color": check_color,
    "style": _always,
    "phone": _always,
    "utc-millisec": _always,
}

# Formats whose semantics survive a single anchored Java regex — used by the
# columnar engine's JVM rlike fast path.  Anything not here goes through the
# Arrow-batched pandas-UDF path, EXCEPT `uri` and (since r7) `date`, which
# get dedicated multi-expression JVM builders in the columnar compiler
# (_uri_pred / _date_pred — a single regex can't express month lengths /
# leap years, but a closed-form days-in-month bound can).  Still
# checker-routed: `hostname` (253-char total limit + punycode label
# decode — legitimately non-regex).
SPARK_RLIKE: dict[str, str] = {
    "uuid": "^" + _UUID_PATTERN + "$",
    "json-pointer": "^" + _JSON_POINTER_PATTERN + "$",
    "relative-json-pointer": "^" + _REL_JSON_POINTER_PATTERN + "$",
    "ipv4": r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$",
    "ipv6": "^" + IPV6_PATTERN + "$",
}
