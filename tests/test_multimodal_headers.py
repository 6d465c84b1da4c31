"""Unit battery for the dependency-free container-header parsers
(ops.multimodal): real byte layouts per the public specs, including the
marker-walk corners the oracle battery's fixed layouts don't reach
(APP segments before SOF, progressive SOF2, restart markers, palette
PNG, truncated payloads, EOI-before-SOF)."""

import struct

from m3spark.ops.multimodal import _decode_payload


def png(w, h, color_type, bit_depth=8):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h)
            + bytes([bit_depth, color_type, 0, 0, 0]))


def jpeg(w, h, ncomp, sof=0xC0, pre_segments=b""):
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    seg = struct.pack(">H", 8 + 3 * ncomp) + bytes([8]) \
        + struct.pack(">HH", h, w) + bytes([ncomp]) + comp
    return b"\xff\xd8" + pre_segments + bytes([0xFF, sof]) + seg \
        + b"\xff\xd9"


def wav(channels, rate):
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * channels * 2, channels * 2, 16)
            + b"data" + struct.pack("<I", 0))


def test_png_rgb():
    d = _decode_payload(png(640, 480, 2))
    assert (d["media_type"], d["width"], d["height"], d["channels"]) == \
        ("image/png", 640, 480, 3)


def test_png_channel_map():
    for ct, ch in [(0, 1), (2, 3), (3, 1), (4, 2), (6, 4)]:
        assert _decode_payload(png(5, 7, ct))["channels"] == ch


def test_png_large_dims_big_endian():
    d = _decode_payload(png(70000, 1, 6))
    assert (d["width"], d["height"], d["channels"]) == (70000, 1, 4)


def test_png_truncated_is_sniffed_but_unparsed():
    d = _decode_payload(b"\x89PNG\r\n\x1a\n\x00\x00")
    assert d["media_type"] == "image/png"
    assert d["width"] is None and d["channels"] is None


def test_jpeg_baseline():
    d = _decode_payload(jpeg(1920, 1080, 3))
    assert (d["media_type"], d["width"], d["height"], d["channels"]) == \
        ("image/jpeg", 1920, 1080, 3)


def test_jpeg_app0_before_sof():
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    d = _decode_payload(jpeg(64, 32, 1, pre_segments=app0))
    assert (d["width"], d["height"], d["channels"]) == (64, 32, 1)


def test_jpeg_progressive_sof2_and_exif():
    exif = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00\x00\x00"
    d = _decode_payload(jpeg(800, 600, 3, sof=0xC2, pre_segments=exif))
    assert (d["width"], d["height"], d["channels"]) == (800, 600, 3)


def test_jpeg_sof_after_restart_marker():
    # standalone RST markers carry no length field — the walk must not
    # read a bogus length from the entropy bytes that follow
    d = _decode_payload(jpeg(10, 20, 3, pre_segments=b"\xff\xd0"))
    assert (d["width"], d["height"]) == (10, 20)


def test_jpeg_eoi_before_sof():
    d = _decode_payload(b"\xff\xd8\xff\xd9")
    assert d["media_type"] == "image/jpeg"
    assert d["width"] is None


def test_jpeg_dqt_skipped_c4_not_sof():
    # 0xC4 (DHT) and 0xCC (DAC) are NOT SOF markers despite the range
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    dac = b"\xff\xcc" + struct.pack(">H", 4) + b"\x00\x00"
    d = _decode_payload(jpeg(33, 44, 3, pre_segments=dht + dac))
    assert (d["width"], d["height"]) == (33, 44)


def test_wav_stereo():
    d = _decode_payload(wav(2, 44100))
    assert (d["media_type"], d["channels"]) == ("audio/wav", 2)
    assert d["width"] is None


def test_wav_mono_8k():
    assert _decode_payload(wav(1, 8000))["channels"] == 1


def test_riff_non_wave_unparsed():
    d = _decode_payload(b"RIFF\x00\x00\x00\x00AVI LIST")
    assert d["media_type"] == "audio/wav"  # sniffed by RIFF magic
    assert d["channels"] is None           # but not a WAVE form


def test_octet_stream_fallback():
    d = _decode_payload(b"hello world")
    assert d["media_type"] == "application/octet-stream"
    assert d["width"] is None and d["channels"] is None
    assert d["n_bytes"] == 11


def test_jpeg_fill_bytes_before_marker():
    """ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; the walk must skip them, not read a bogus segment length."""
    d = _decode_payload(jpeg(320, 240, 3, pre_segments=b"\xff\xff\xff"))
    assert (d["width"], d["height"], d["channels"]) == (320, 240, 3)
    # fill bytes directly before the SOF marker itself
    raw = jpeg(64, 32, 1)
    sof_at = raw.index(b"\xff\xc0")
    padded = raw[:sof_at] + b"\xff\xff" + raw[sof_at:]
    d = _decode_payload(padded)
    assert (d["width"], d["height"], d["channels"]) == (64, 32, 1)


def test_jpeg_fill_bytes_inside_segment_chain():
    """Fill bytes between an APP segment and the SOF marker."""
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    d = _decode_payload(jpeg(10, 20, 3, pre_segments=app0 + b"\xff" * 5))
    assert (d["width"], d["height"]) == (10, 20)
