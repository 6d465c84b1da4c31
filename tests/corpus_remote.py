"""Corpus expansion (round 5), part 3: remote-reference families.

Cross-resource $id-URI references served from tests/remotes/ via the
``uri_dirs`` loader (reference validate.cljc:237-258 uri-base->dir),
mirroring the shape of the official suite's remotes/ directory with
freshly-authored resources: direct refs, fragment pointers into remote
$defs/definitions, remote anchors, cross-file relative refs resolved
against the remote's own $id, nested $id scope changes inside a remote,
self-recursive remotes, and a draft-4 resource whose OWN $schema
governs its semantics (boolean exclusiveMinimum) regardless of the
referring document's dialect.

These groups need the uri_dirs loader, so they replay through
test_schema_core.test_remote_corpus_group rather than the plain corpus
loop.  Group shape: (draft, description, schema, tests).
"""

from __future__ import annotations

import os

D4, D7 = "draft4", "draft7"
D19, D20 = "draft2019-09", "draft2020-12"

REMOTE_URI = "https://remote.test"
REMOTE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "remotes")


def remote_uri_dirs():
    return {REMOTE_URI: REMOTE_DIR}


R = f"{REMOTE_URI}"

CASES_REMOTE = [
    (D20, "direct remote ref",
     {"$ref": f"{R}/int.json"},
     [(3, True), (-7, True), (3.5, False), ("3", False), (True, False)]),

    (D20, "remote ref without .json suffix",
     {"$ref": f"{R}/int"},
     [(3, True), ("x", False)]),

    (D20, "fragment pointer into remote $defs",
     {"$ref": f"{R}/sub/defs.json#/$defs/pos"},
     [(1, True), (0, True), (-1, False), ("x", False)]),

    (D20, "fragment pointer into remote definitions",
     {"$ref": f"{R}/sub/defs.json#/definitions/neg"},
     [(-1, True), (0, True), (2, False)]),

    (D20, "remote internal chain ref",
     {"$ref": f"{R}/sub/defs.json#/$defs/chain"},
     [(5, True), (-5, False)]),

    (D20, "remote anchor fragment",
     {"$ref": f"{R}/anchor.json#big"},
     [(150, True), (100, True), (99, False)]),

    (D20, "two remote anchors in branches",
     {"anyOf": [{"$ref": f"{R}/anchor.json#big"},
                {"$ref": f"{R}/anchor.json#tiny"}]},
     [(150, True), (2, True), (50, False)]),

    (D20, "cross-file relative ref via remote $id",
     {"$ref": f"{R}/person.json"},
     [({"name": "A", "age": 3}, True),
      ({"name": "A"}, True),
      ({"name": ""}, False),
      ({"age": 3}, False),
      ({"name": "A", "age": 3.5}, False)]),

    (D20, "remote used from local properties",
     {"properties": {"n": {"$ref": f"{R}/name.json"},
                     "k": {"$ref": f"{R}/int.json"}},
      "required": ["n"]},
     [({"n": "x", "k": 1}, True), ({"n": "x"}, True),
      ({"n": "", "k": 1}, False), ({"n": "x", "k": "1"}, False),
      ({"k": 1}, False)]),

    (D20, "remote in allOf with local constraint",
     {"allOf": [{"$ref": f"{R}/int.json"}, {"minimum": 10}]},
     [(12, True), (5, False), (12.5, False)]),

    (D20, "self-recursive remote tree",
     {"$ref": f"{R}/tree.json"},
     [({"value": 1}, True),
      ({"value": 1, "left": {"value": 2}}, True),
      ({"value": 1, "right": {"value": 2,
                              "left": {"value": 3}}}, True),
      ({"value": 1, "left": {}}, False),
      ({"value": "x"}, False),
      ({"value": 1, "right": {"value": 2, "left": {"value": "x"}}},
       False)]),

    (D20, "remote array items ref",
     {"$ref": f"{R}/list.json"},
     [([1, 2, 3], True), ([], True), ([1, "x"], False), ("no", False)]),

    (D20, "nested $id scope change inside remote",
     {"$ref": f"{R}/deep/scoped.json"},
     [({"flag": True}, True), ({"flag": False}, True),
      ({"flag": 1}, False), ({}, True)]),

    (D20, "remote resource keeps its own draft-4 dialect",
     # draft4res.json declares draft-04 with boolean exclusiveMinimum:
     # the remote's OWN $schema governs, so 3 is excluded even though
     # the referring document is 2020-12
     {"$ref": f"{R}/draft4res.json"},
     [(4, True), (3, False), (2, False)]),

    (D19, "remote ref melds with siblings (2019+)",
     {"$ref": f"{R}/int.json", "minimum": 5},
     [(7, True), (3, False), (7.5, False)]),

    (D7, "remote ref replaces siblings (draft-7)",
     {"$ref": f"{R}/int.json", "minimum": 5},
     [(7, True), (3, True), (7.5, False)]),

    (D7, "draft-7 remote ref from properties",
     {"properties": {"k": {"$ref": f"{R}/int.json"}}},
     [({"k": 2}, True), ({"k": "x"}, False), ({}, True)]),

    (D4, "draft-4 remote ref",
     {"properties": {"k": {"$ref": f"{R}/name.json"}}},
     [({"k": "ab"}, True), ({"k": ""}, False), ({"k": 7}, False)]),

    (D20, "unresolvable remote pointer member",
     # the pointer targets a member that exists — control group for the
     # SchemaError test in test_remote_and_format_ext
     {"$ref": f"{R}/sub/defs.json#/$defs/shortName"},
     [("abc", True), ("abcde", False), (5, False)]),
]
