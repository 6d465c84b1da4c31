"""URI resolution parity: RFC 3986 §5.4 reference-resolution examples
(normal + abnormal) against resolve_uri, plus the urn / fragment /
pointer behaviors the reference's uri layer implements
(uri.cljc:22-104, uri_test.cljc — the observable resolution outcomes,
not m3's internal uri-map representation)."""

from __future__ import annotations

import pytest

from m3spark.schema.uris import (
    join_pointer, pointer_escape, pointer_get, pointer_tokens,
    pointer_unescape, resolve_uri, split_fragment,
)

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal examples
RFC_NORMAL = [
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

# §5.4.2 abnormal examples (the ones urljoin implements faithfully)
RFC_ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    # RFC 3986 §5.4.2 allows both answers for "http:g"; urllib implements
    # the backward-compatible variant (merge with base), which is what a
    # legacy-schema $ref would expect
    ("http:g", "http://a/b/c/g"),
]


@pytest.mark.parametrize("ref,want", RFC_NORMAL + RFC_ABNORMAL,
                         ids=[r or "<empty>" for r, _ in
                              RFC_NORMAL + RFC_ABNORMAL])
def test_rfc3986_reference_resolution(ref, want):
    assert resolve_uri(BASE, ref) == want


def test_urn_bases():
    # non-hierarchical scheme: only fragments / absolute refs make sense
    urn = "urn:uuid:deadbeef-1234-0000-0000-4321feebdaed"
    assert resolve_uri(urn, "#/bar") == urn + "#/bar"
    assert resolve_uri(urn + "#old", "#/new") == urn + "#/new"
    assert resolve_uri(urn, "http://x/y") == "http://x/y"
    assert resolve_uri(urn, "urn:other:thing") == "urn:other:thing"


def test_empty_base_passthrough():
    assert resolve_uri("", "whatever#/f") == "whatever#/f"


def test_split_fragment():
    assert split_fragment("http://x/y#/a/b") == ("http://x/y", "/a/b")
    assert split_fragment("http://x/y#") == ("http://x/y", "")
    assert split_fragment("http://x/y") == ("http://x/y", None)


def test_pointer_escapes_roundtrip():
    # RFC 6901: ~0 -> ~, ~1 -> /; order matters ("~01" is "~1" literal)
    assert pointer_unescape("~01") == "~1"
    assert pointer_unescape("~10") == "/0"
    for raw in ("a/b", "a~b", "~/", "~~11", ""):
        assert pointer_unescape(pointer_escape(raw)) == raw


def test_pointer_get_and_tokens():
    doc = {"a": [{"b/c": {"~": 42}}], "": {"x": 1}}
    assert pointer_get(doc, "/a/0/b~1c/~0") == 42
    assert pointer_get(doc, "//x") == 1
    assert pointer_get(doc, "") is doc
    assert pointer_tokens("/a/0") == ["a", "0"]
    with pytest.raises((KeyError, IndexError)):
        pointer_get(doc, "/a/5")
    with pytest.raises(ValueError):
        pointer_tokens("no-leading-slash")


def test_join_pointer_escapes():
    assert join_pointer("", "a/b", "c~d") == "/a~1b/c~0d"
    assert join_pointer("/x", 0) == "/x/0"
