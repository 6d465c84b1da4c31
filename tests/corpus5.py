"""Corpus expansion (round 5), part 1: format vector batteries.

Each vector's expected verdict is derived from the governing spec (RFC
3339 date/time, RFC 1034/952 hostname grammar, RFC 2673/791 dotted
quads, RFC 4291 IPv6, RFC 3986/3987 URI/IRI, RFC 6570 templates, RFC
6901/draft relative JSON pointers, RFC 4122 UUID, ISO 8601 durations,
ECMA-262 regexes) — not from running an engine.  Vectors whose verdict
is genuinely implementation-defined territory (address literals in
email, IPv6 zone ids, leap-second plausibility beyond the 23:59:60
form) are deliberately left out.

Groups replay with format_assertion=True (draft<=7 default), so a
failing format is a hard invalid.  Same group shape as tests/corpus.py:
    (draft, description, schema, [(data, expected_valid), ...])
"""

from __future__ import annotations

D3, D4, D6, D7 = "draft3", "draft4", "draft6", "draft7"
D19, D20 = "draft2019-09", "draft2020-12"

MODERN = (D7, D19, D20)          # full format set
PRE7 = (D4, D6)                  # the pre-draft-7 subset

# format -> (drafts, [(value, valid), ...])
FORMAT_VECTORS = {
    "date": (MODERN + (D3,), [
        ("2024-01-01", True),
        ("2024-02-29", True),        # leap year
        ("2023-02-29", False),       # not a leap year
        ("1900-02-29", False),       # century non-leap
        ("2000-02-29", True),        # 400-year leap
        ("2024-06-31", False),       # June has 30 days
        ("2024-12-31", True),
        ("2024-13-01", False),
        ("2024-00-10", False),
        ("2024-01-00", False),
        ("2024-01-32", False),
        ("24-01-01", False),
        ("2024-1-01", False),
        ("2024/01/01", False),
        ("2024-01-01T00:00:00Z", False),  # full-date only
    ]),
    "time": (MODERN, [
        ("23:59:59Z", True),
        ("00:00:00Z", True),
        ("12:00:00+01:00", True),
        ("12:00:00-23:59", True),
        ("12:00:00.123Z", True),
        ("12:00:00", False),          # offset required (RFC 3339 full-time)
        ("24:00:00Z", False),
        ("12:60:00Z", False),
        ("12:00:61Z", False),
        ("12:00:00+24:00", False),
        ("12:00:00+01:60", False),
        ("1:00:00Z", False),
        ("12:00Z", False),
    ]),
    "date-time": (MODERN + PRE7 + (D3,), [
        ("2024-02-29T23:59:59Z", True),
        ("2023-02-29T00:00:00Z", False),
        ("2024-01-01t12:00:00z", True),    # T/Z case-insensitive
        ("2024-01-01T12:00:00.999Z", True),
        ("2024-01-01T12:00:00+05:30", True),
        ("2024-01-01T12:00:00", False),
        ("2024-01-01 12:00:00Z", False),   # space separator
        ("2024-01-01T12:00:00+25:00", False),
        ("2024-01-01", False),
        ("not-a-date", False),
    ]),
    "duration": ((D19, D20), [
        ("P1Y", True),
        ("P1M", True),
        ("P1W", True),
        ("P1D", True),
        ("PT1H", True),
        ("PT1M", True),
        ("PT1S", True),
        ("P1Y2M3DT4H5M6S", True),
        ("P1DT12H", True),
        ("PT25H", True),             # no magnitude bound in the grammar
        ("P", False),
        ("PT", False),
        ("1Y", False),
        ("P1S", False),              # seconds need the T designator
        ("PT1D", False),             # days cannot follow T
        ("P1DT", False),             # dangling T
        ("P-1D", False),
    ]),
    "email": (MODERN + PRE7 + (D3,), [
        ("a@example.com", True),
        ("first.last@sub.example.com", True),
        ("a+tag@example.com", True),
        ("a_b-c@example.com", True),
        ("@example.com", False),
        ("a@", False),
        ("a b@example.com", False),
        ("a@@example.com", False),
        ("plainaddress", False),
        ("a@exa mple.com", False),
    ]),
    "hostname": (MODERN + PRE7, [
        ("example.com", True),
        ("EXAMPLE.COM", True),
        ("a.b-c.d0", True),
        ("xn--nxasmq6b.example", True),
        ("a" * 63 + ".example", True),
        ("a" * 64 + ".example", False),   # label > 63 octets
        ("ex_ample.com", False),          # underscore outside grammar
        ("-example.com", False),
        ("example-.com", False),
        ("example..com", False),
        ("", False),
        ("exa mple.com", False),
    ]),
    "ipv4": (MODERN + PRE7, [
        ("192.168.0.1", True),
        ("0.0.0.0", True),
        ("255.255.255.255", True),
        ("256.0.0.1", False),
        ("1.2.3", False),
        ("1.2.3.4.5", False),
        ("01.2.3.4", False),           # leading zero (ambiguous octal)
        ("1.2.3.a", False),
        ("1.2.3.-4", False),
        ("...", False),
    ]),
    "ipv6": (MODERN + PRE7 + (D3,), [
        ("::1", True),
        ("::", True),
        ("1:2:3:4:5:6:7:8", True),
        ("2001:db8::8:800:200c:417a", True),
        ("::ffff:192.168.0.1", True),
        ("1:2:3:4:5:6:7:8:9", False),
        ("1::2::3", False),             # two double-colons
        ("g::1", False),
        ("1:2", False),
        ("12345::", False),
        (":1:2:3:4:5:6:7", False),
    ]),
    "uri": (MODERN + PRE7 + (D3,), [
        ("https://example.com/a?b=c#d", True),
        ("http://[::1]:8080/", True),
        ("ftp://user@host/path", True),
        ("urn:isbn:0451450523", True),
        ("a:b", True),                  # minimal scheme:path
        ("mailto:a@example.com", True),
        ("/relative", False),           # uri must be absolute
        ("example.com", False),
        ("http://exa mple.com", False),
        ("http://example.com/%zz", False),  # bad pct-escape
        ("", False),
    ]),
    "uri-reference": (MODERN + (D6,), [
        ("/relative/path", True),
        ("#frag", True),
        ("", True),
        ("?query", True),
        ("https://example.com/", True),
        ("http://exa mple.com", False),
        ("%zz", False),
        ("a b", False),
    ]),
    "uri-template": (MODERN + (D6,), [
        ("http://example.com/{id}", True),
        ("{/id*}", True),
        ("{?q,lang}", True),
        ("http://example.com/plain", True),
        ("http://example.com/{id", False),
        ("{}", False),                  # empty expression
        ("{a}{", False),
    ]),
    "json-pointer": (MODERN + (D6,), [
        ("", True),
        ("/a/b", True),
        ("/a~0b", True),
        ("/a~1b", True),
        ("/ ", True),                   # space is a legal token char
        ("/a/0/b", True),
        ("/a~2", False),                # ~ must be ~0 or ~1
        ("/a~", False),
        ("a/b", False),                 # must start with /
        ("#/a", False),                 # fragment form is not a pointer
    ]),
    "relative-json-pointer": (MODERN, [
        ("0", True),
        ("1/a", True),
        ("0#", True),
        ("10/a~0b", True),
        ("-1/a", False),
        ("01", False),                  # leading zero
        ("", False),
        ("1.5", False),
        ("a", False),
        ("0#/a", False),                # # must be terminal
    ]),
    "uuid": ((D19, D20), [
        ("123e4567-e89b-12d3-a456-426614174000", True),
        ("123E4567-E89B-12D3-A456-426614174000", True),
        ("00000000-0000-0000-0000-000000000000", True),
        ("123e4567-e89b-12d3-a456-42661417400", False),   # short
        ("123e4567-e89b-12d3-a456-4266141740000", False),  # long
        ("123e4567e89b12d3a456426614174000", False),      # no dashes
        ("123e4567-e89b-12d3-a456_426614174000", False),
        ("g23e4567-e89b-12d3-a456-426614174000", False),
        ("urn:uuid:123e4567-e89b-12d3-a456-426614174000", False),
    ]),
    "regex": (MODERN, [
        ("^a+$", True),
        ("[a-z]+", True),
        ("a|b", True),
        ("(?<year>[0-9]{4})", True),    # ECMA named group
        ("a{2,4}", True),
        ("a(b", False),
        ("[a-", False),
        ("a**", False),
        ("(?P<y>x)", False),            # Python-only named group syntax
    ]),
    "idn-email": (MODERN, [
        ("a@example.com", True),
        ("실례@실례.테스트", True),
        ("a@b c", False),
        ("@example.com", False),
    ]),
    "iri": (MODERN, [
        ("https://example.com/", True),
        ("https://例え.jp/パス?q=1", True),
        ("/relative", False),
        ("https://exa mple.com", False),
    ]),
    "iri-reference": (MODERN, [
        ("/relative", True),
        ("#frag", True),
        ("パス/a", True),
        ("a b", False),
    ]),
    # draft-3 alias spellings
    "ip-address": ((D3,), [
        ("192.168.0.1", True),
        ("256.0.0.1", False),
        ("1.2.3", False),
    ]),
    "host-name": ((D3,), [
        ("example.com", True),
        ("-example.com", False),
        ("ex_ample.com", False),
    ]),
    "color": ((D3,), [
        ("#ff0000", True),
        ("#FF0000", True),
        ("#f00", True),
        ("red", True),
        ("blue", True),
        ("#gg0000", False),
        ("#ff00", False),
    ]),
}

CASES5 = []
for fmt, (drafts, vectors) in FORMAT_VECTORS.items():
    for draft in drafts:
        CASES5.append((
            draft, f"format {fmt} vectors",
            {"type": "string", "format": fmt},
            list(vectors),
        ))

# non-string values are never constrained by format (format applies to
# strings only) — one group per modern draft over several formats
for draft in (D4, D7, D20):
    for fmt in ("date-time", "email", "ipv4", "uri"):
        CASES5.append((
            draft, f"format {fmt} ignores non-strings",
            {"format": fmt},
            [(12, True), (12.5, True), (True, True), ([], True),
             ({}, True), (None, True)],
        ))

# unknown format names never fail (they warn): spec-mandated leniency
for draft in (D7, D20):
    CASES5.append((
        draft, "unknown format is an annotation",
        {"format": "definitely-not-a-format"},
        [("anything", True), ("", True), (3, True)],
    ))
