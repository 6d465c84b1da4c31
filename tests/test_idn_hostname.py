"""idn-hostname verdict parity with the reference's own test list
(/root/reference/test/cljc/m3/idn_hostname_test.cljc:22-74, which is in
turn distilled from the official JSON-Schema-Test-Suite optional
idn-hostname file).  Every (input, verdict) pair below is copied from
that deftest."""

from __future__ import annotations

import pytest

from m3spark.schema.formats import check_idn_hostname

REFERENCE_VERDICTS = [
    ("〱〲〳〴〵〮〯〻", False),
    ("-> $1.00 <--", False),
    ("۰0", True),
    ("1host", True),
    ("a·l", False),
    ("A׳ב", False),
    ("A״ב", False),
    ("def・abc", False),
    ("실" * 52 + "례례테스트" + "례" * 17 +
     "테스트" + "례" * 19 + "테스트" +
     "례" * 12 + "테스트례례실례" +
     ".테스트", False),  # single label far over 63 ACE bytes
    ("", False),
    (".", False),
    ("ـߺ", False),
    ("・", False),
    ("실〮례.테스트", False),
    ("〮실례.테스트", False),
    ("h0stn4me", True),
    ("-hello", False),
    ("-hello-", False),
    ("҈hello", False),
    ("hello-", False),
    ("̀hello", False),
    ("ःhello", False),
    ("hostnam3", True),
    ("host-name", True),
    ("hostname", True),
    ("l·a", False),
    ("·l", False),
    ("l·", False),
    ("l·l", True),
    ("ßς་〇", True),
    ("실례.테스트", True),
    ("XN--aa---o47jg78q", False),
    ("xn--ihqwcrb4cv8a8dqg056pqjye", True),
    ("xn--X", False),
    ("α͵", False),
    ("α͵S", False),
    ("α͵β", True),
    ("א׳ב", True),
    ("א״ב", True),
    ("׳ב", False),
    ("״ב", False),
    ("۽۾", True),
    ("ب٠۰", False),
    ("ب٠ب", True),
    ("بي‌بي", True),
    ("क‍ष", False),
    ("क्‌ष", True),
    ("क्‍ष", True),
    ("‍ष", False),
    ("・ぁ", True),
    ("・ァ", True),
    ("・丈", True),
]


@pytest.mark.parametrize("s,want", REFERENCE_VERDICTS,
                         ids=[repr(s)[:40] for s, _ in REFERENCE_VERDICTS])
def test_reference_idn_verdicts(s, want):
    assert check_idn_hostname(s) == want


def test_dot_variants_mapped():
    # U+3002 ideographic full stop splits labels like '.'
    assert check_idn_hostname("실례。테스트")
    assert not check_idn_hostname("hostname。")  # trailing dot
