"""Corpus expansion (round 3): the unevaluated*/\\$ref-meld interaction
matrices materialized as counted corpus groups (expected verdicts come
from the independent mini-models in test_unevaluated_matrix /
test_ref_meld_matrix — spec-derived, not engine-derived), plus direct
ports of the reference's format edge-case regressions
(format_test.cljc:80-147) and draft-03 never-validated formats
(format_test.cljc:41-75).

Same group shape as tests/corpus.py:
    (draft, description, schema, [(data, expected_valid), ...])
"""

from __future__ import annotations

from test_ref_meld_matrix import (
    _BASE as MELD_BASE,
    _DOCS as MELD_DOCS,
    _EQ_CASES,
    _SIBLINGS as MELD_SIBLINGS,
    MELD_CASES,
    OLD as MELD_OLD,
    _scalar_ok,
)
from test_unevaluated_matrix import (
    _ARR_DOCS, _DEFS, _DOCS, ARRAY_CASES, OBJECT_CASES,
    _model_array, _model_object,
)

_URI2LABEL = {
    "http://json-schema.org/draft-04/schema#": "draft4",
    "http://json-schema.org/draft-06/schema#": "draft6",
    "http://json-schema.org/draft-07/schema#": "draft7",
    "https://json-schema.org/draft/2019-09/schema": "draft2019-09",
    "https://json-schema.org/draft/2020-12/schema": "draft2020-12",
}


def _strip(schema):
    return {k: v for k, v in schema.items() if k not in ("$schema",
                                                         "$defs")}


CASES3 = []

for ev_name, pol_name, draft_uri, schema in OBJECT_CASES:
    tests = [(doc, _model_object(_strip(schema), doc, _DEFS)[0])
             for doc in _DOCS]
    CASES3.append((_URI2LABEL[draft_uri],
                   f"unevaluatedProperties matrix {ev_name}/{pol_name}",
                   schema, tests))

for ev_name, pol_name, draft_uri, schema, defs in ARRAY_CASES:
    tests = [(doc, _model_array(_strip(schema), doc, defs, draft_uri)[0])
             for doc in _ARR_DOCS]
    CASES3.append((_URI2LABEL[draft_uri],
                   f"unevaluatedItems matrix {ev_name}/{pol_name}",
                   schema, tests))

for draft_uri, sib_i in MELD_CASES:
    siblings = MELD_SIBLINGS[sib_i]
    schema = {"$schema": draft_uri,
              "definitions": {"base": MELD_BASE},
              "properties": {"v": dict({"$ref": "#/definitions/base"},
                                       **siblings)}}
    tests = []
    for doc_v in MELD_DOCS:
        base_ok = _scalar_ok("type", "integer", doc_v)
        sib_ok = all(_scalar_ok(k, a, doc_v) for k, a in siblings.items())
        tests.append(({"v": doc_v},
                      base_ok if draft_uri in MELD_OLD
                      else (base_ok and sib_ok)))
    CASES3.append((_URI2LABEL[draft_uri],
                   f"$ref meld siblings={sorted(siblings)}",
                   schema, tests))

# json-equality edges through const / enum / uniqueItems (reference
# util json-= semantics: numeric-kind-blind, bool-distinct, structural)
for draft in ("draft6", "draft2020-12"):
    for a, b, eq in _EQ_CASES:
        CASES3.append((draft, f"const json-eq {a!r} vs {b!r}",
                       {"const": a}, [(b, eq)]))
        CASES3.append((draft, f"uniqueItems json-eq {a!r} vs {b!r}",
                       {"uniqueItems": True}, [([a, b], not eq)]))

# --------------------------------------------------------------------------
# reference format_test.cljc ports (exact reference verdicts, cited)

CASES3 += [
    # draft-03 style/phone/utc-millisec are never validated
    # (format_test.cljc:41-75: checkers always pass, even on non-strings)
    ("draft3", "format style never validated (ref format_test.cljc:41)",
     {"format": "style"},
     [("color: red;", True), ("not-really-css", True), (123, True)]),
    ("draft3", "format phone never validated (ref format_test.cljc:53)",
     {"format": "phone"},
     [("+1-555-555-5555", True), ("not-a-phone", True),
      (5555555555, True)]),
    ("draft3", "format utc-millisec never validated "
     "(ref format_test.cljc:65)",
     {"format": "utc-millisec"},
     [("1234567890123", True), ("not-a-timestamp", True),
      (1234567890123, True)]),
    # email edge cases (format_test.cljc:80-89)
    ("draft7", "email single-char local + dot boundaries "
     "(ref format_test.cljc:80)",
     {"format": "email"},
     [("a@b.com", True), ("x@example.org", True),
      (".a@b.com", False), ("a.@b.com", False), ("a..b@c.com", False),
      ("joe.bloggs@example.com", True), ("te~st@example.com", True)]),
    # ipv6 case-insensitivity + structure (format_test.cljc:91-104)
    ("draft7", "ipv6 uppercase/mixed hex (ref format_test.cljc:91)",
     {"format": "ipv6"},
     [("::ABEF", True), ("FE80::1", True),
      ("2001:DB8::FF00:42:8329", True), ("2001:db8::Ff00:42:8329", True),
      ("::1", True), ("::", True), ("1:2:3:4:5:6:7:8", True),
      ("12345::", False), ("::laptop", False), ("1::2::3", False)]),
    # ipv4 (format_test.cljc:106-115)
    ("draft7", "ipv4 octet ranges (ref format_test.cljc:106)",
     {"format": "ipv4"},
     [("192.168.1.1", True), ("0.0.0.0", True),
      ("255.255.255.255", True), ("256.0.0.0", False),
      ("192.168.1.999", False), ("192.168.1", False),
      ("192.168.1.1.1", False)]),
    # hostname hyphens (format_test.cljc:117-125)
    ("draft7", "hostname hyphen boundaries (ref format_test.cljc:117)",
     {"format": "hostname"},
     [("example.com", True), ("sub.example.com", True), ("a", True),
      ("my-host.example.com", True), ("-starts-with-hyphen", False),
      ("ends-with-hyphen-", False)]),
    # json-pointer (format_test.cljc:127-137)
    ("draft7", "json-pointer escapes (ref format_test.cljc:127)",
     {"format": "json-pointer"},
     [("", True), ("/foo", True), ("/foo/bar", True), ("/foo/0", True),
      ("/~0", True), ("/~1", True), ("foo", False), ("/foo/bar~", False)]),
    # uuid (format_test.cljc:139-147)
    ("draft7", "uuid shape (ref format_test.cljc:139)",
     {"format": "uuid"},
     [("2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
      ("00000000-0000-0000-0000-000000000000", True),
      ("2eb8aa08-aa98-11ea-b4aa-73b441d1638", False),
      ("not-a-uuid", False)]),
]


def total_assertions():
    return sum(len(t) for _, _, _, t in CASES3)
