"""Exact warning/info-count regression, mirroring the reference's
annotation-count assertions (m3: testsuite_test.cljc:109-116 pins 12/31
warnings and 16/41/69 infos per draft).  Any engine change that shifts
these counts must update the pins deliberately (FIXTURES.md §6)."""

from __future__ import annotations

from m3spark.schema import compile_schema

ANNOTATION_DOCS = [
    {"ip": "999.0.0.1", "note": 1},          # format warning (annotation mode)
    {"ip": "10.0.0.1", "old": True},          # deprecated warning
    {"ip": "not-an-ip", "old": True},          # both
    {"weird": "x"},                            # unknown-format warning
]

SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$comment": "annotation-count fixture",     # info per validation
    "properties": {
        "ip": {"format": "ipv4"},               # warning in 2020-12 default
        "old": {"deprecated": True},
        "weird": {"format": "no-such-format"},  # warning, never error
    },
}

# pinned expectations: (errors, warnings, infos) per document
EXPECTED = [(0, 1, 1), (0, 1, 1), (0, 2, 1), (0, 1, 1)]


def test_annotation_counts_pinned():
    cs = compile_schema(SCHEMA)  # 2020-12: format is annotation by default
    got = []
    for doc in ANNOTATION_DOCS:
        r = cs.validate(doc)
        got.append((len(r.errors), len(r.warnings), len(r.infos)))
    assert got == EXPECTED
    totals = tuple(sum(x[i] for x in got) for i in range(3))
    assert totals == (0, 5, 4)


def test_corpus_wide_annotation_counts_pinned():
    """Suite-scale analog of the reference's per-draft annotation-count
    pins (testsuite_test.cljc:109-116): replay the ENTIRE corpus and pin
    total warning/info counts per draft.  Any change that silently adds
    or drops annotations anywhere in the engine trips this."""
    import sys
    from collections import defaultdict
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from corpus import CASES
    from corpus2 import CASES2

    warn = defaultdict(int)
    info = defaultdict(int)
    for draft, _desc, schema, tests in CASES + CASES2:
        cs = compile_schema(schema, draft=draft, format_assertion=True)
        for data, _expected in tests:
            r = cs.validate(data)
            warn[draft] += len(r.warnings)
            info[draft] += len(r.infos)
    # 2019-09: content-annotation warnings (3); 2020-12: content (2);
    # the corpus plants no $comment/deprecated docs -> zero infos
    assert dict(warn) == {"draft3": 0, "draft4": 0, "draft6": 0,
                          "draft7": 0, "draft2019-09": 3,
                          "draft2020-12": 2, "draft-next": 0}, dict(warn)
    assert all(v == 0 for v in info.values()), dict(info)


def test_assertion_mode_flips_warnings_to_errors():
    cs = compile_schema(SCHEMA, format_assertion=True)
    r = cs.validate({"ip": "999.0.0.1"})
    assert not r.valid and len(r.errors) == 1
    # unknown format still warns, never errors (m3: property.cljc:696-697)
    r2 = cs.validate({"weird": "x"})
    assert r2.valid and len(r2.warnings) == 1
