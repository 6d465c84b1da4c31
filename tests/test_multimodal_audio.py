"""WAV PCM sample decode (ops/multimodal.py _wav_samples): round-trip
against the STDLIB ``wave`` writer (an independent encoder) for 8/16-bit,
hand-built 24/32-bit and chunk-walk forms, the declared-unsupported
rejects, exact-division stats, and the Arrow mapInPandas op."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from m3spark.ops.multimodal import (
    _wav_samples, decode_audio_samples, wav_sample_stats,
)


def make_wav(frames: np.ndarray, rate: int, bits: int,
             extra_chunks=(), riff_size=None, afmt=1) -> bytes:
    """Hand-built canonical WAV: frames is (n, ch) of decoded amplitude
    values (8-bit: -128..127, stored +128 unsigned)."""
    n, ch = frames.shape
    if bits == 8:
        data = (frames + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = frames.astype("<i2").tobytes()
    elif bits == 32:
        data = frames.astype("<i4").tobytes()
    else:  # 24
        u = (frames.astype(np.int64) % (1 << 24)).reshape(-1)
        data = b"".join(struct.pack("<I", int(v))[:3] for v in u)
    fmt = struct.pack("<HHIIHH", afmt, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, cdata in extra_chunks:
        body += cid + struct.pack("<I", len(cdata)) + cdata
        if len(cdata) & 1:
            body += b"\x00"  # RIFF word alignment
    body += b"data" + struct.pack("<I", len(data)) + data
    size = len(body) if riff_size is None else riff_size
    return b"RIFF" + struct.pack("<I", size) + body


def _stdlib_wav(frames: np.ndarray, rate: int, sampwidth: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(frames.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            w.writeframes((frames + 128).astype(np.uint8).tobytes())
        else:
            w.writeframes(frames.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("sampwidth", [1, 2])
def test_roundtrip_stdlib_wave(ch, sampwidth):
    rng = np.random.default_rng(7 + ch + sampwidth)
    lo, hi = (-128, 128) if sampwidth == 1 else (-32768, 32768)
    frames = rng.integers(lo, hi, (17, ch), dtype=np.int64)
    raw = _stdlib_wav(frames, 8000, sampwidth)
    got = _wav_samples(raw)
    assert got is not None
    gch, grate, gbits, smp = got
    assert (gch, grate, gbits) == (ch, 8000, sampwidth * 8)
    np.testing.assert_array_equal(smp, frames)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_roundtrip_handbuilt(bits):
    rng = np.random.default_rng(bits)
    lo, hi = {8: (-128, 128), 16: (-32768, 32768),
              24: (-(1 << 23), 1 << 23),
              32: (-(1 << 31), 1 << 31)}[bits]
    frames = rng.integers(lo, hi, (9, 2), dtype=np.int64)
    got = _wav_samples(make_wav(frames, 44100, bits))
    assert got is not None
    ch, rate, gbits, smp = got
    assert (ch, rate, gbits) == (2, 44100, bits)
    np.testing.assert_array_equal(smp, frames)


def test_chunk_walk_and_padding():
    """Non-canonical chunk order with an ODD-length LIST chunk before
    data: the word-alignment pad must be skipped to find data."""
    frames = np.array([[-3], [5], [7]], dtype=np.int64)
    raw = make_wav(frames, 16000, 16,
                   extra_chunks=[(b"LIST", b"abc"), (b"junk", b"1234")])
    got = _wav_samples(raw)
    assert got is not None
    np.testing.assert_array_equal(got[3], frames)


def test_untrusted_riff_size_and_partial_frame():
    frames = np.array([[1, 2], [3, 4]], dtype=np.int64)
    raw = make_wav(frames, 8000, 16, riff_size=4)  # lying RIFF size
    assert _wav_samples(raw) is not None
    # trailing partial frame (3 bytes of a 4-byte block) is dropped
    raw2 = make_wav(frames, 8000, 16)
    raw2 = raw2[:-4] + raw2[-4:-1]  # shrink data by one byte
    # fix the data chunk length to the shrunken payload
    i = raw2.rindex(b"data")
    raw2 = (raw2[:i + 4] + struct.pack("<I", len(raw2) - i - 8)
            + raw2[i + 8:])
    got = _wav_samples(raw2)
    assert got is not None and got[3].shape == (1, 2)


@pytest.mark.parametrize("mutate", [
    lambda r: r[:11],                       # truncated header
    lambda r: b"RIFX" + r[4:],              # wrong magic
    lambda r: r.replace(b"WAVE", b"AVI "),  # wrong form type
    lambda r: r.replace(b"fmt ", b"fmtX"),  # no fmt chunk
    lambda r: r.replace(b"data", b"datx"),  # no data chunk
    lambda r: r.replace(struct.pack("<HH", 1, 1),
                        struct.pack("<HH", 3, 1), 1),  # float PCM
])
def test_rejects(mutate):
    raw = make_wav(np.array([[1], [2]], dtype=np.int64), 8000, 16)
    assert _wav_samples(bytes(mutate(raw))) is None


def test_rejects_bad_bits_and_zero():
    raw = bytearray(make_wav(np.array([[1], [2]], dtype=np.int64),
                             8000, 16))
    i = raw.index(b"fmt ") + 8
    raw[i + 14:i + 16] = struct.pack("<H", 12)  # bits=12 unsupported
    assert _wav_samples(bytes(raw)) is None
    raw[i + 14:i + 16] = struct.pack("<H", 16)
    raw[i + 4:i + 8] = struct.pack("<I", 0)     # rate=0
    assert _wav_samples(bytes(raw)) is None


def test_stats_exact_division():
    frames = np.array([[-5, 10], [7, -2], [3, 4]], dtype=np.int64)
    st = wav_sample_stats(make_wav(frames, 12000, 16))
    assert st["n_frames"] == 3 and st["channels"] == 2
    assert st["sample_rate"] == 12000 and st["bits"] == 16
    assert st["smp_min"] == -5 and st["smp_max"] == 10
    assert st["smp_mean"] == 17 / 6
    assert st["ch0_mean"] == 5 / 3 and st["ch1_mean"] == 12 / 3
    assert st["duration_sec"] == 3 / 12000


def test_stats_mono_ch1_null_and_bad():
    st = wav_sample_stats(make_wav(
        np.array([[2], [4]], dtype=np.int64), 8000, 8))
    assert st["ch0_mean"] == 3.0 and st["ch1_mean"] is None
    assert wav_sample_stats(b"RIFF\x00\x00")["n_frames"] is None


def test_decode_audio_samples_op(spark):
    rng = np.random.default_rng(23)
    rows, expected = [], {}
    for i in range(6):
        bits = [8, 16, 24][i % 3]
        ch = [1, 2][i % 2]
        lo, hi = {8: (-128, 128), 16: (-32768, 32768),
                  24: (-(1 << 23), 1 << 23)}[bits]
        frames = rng.integers(lo, hi, (4 + i, ch), dtype=np.int64)
        raw = make_wav(frames, 8000 + 1000 * i, bits)
        rows.append((i, bytearray(raw)))
        expected[i] = wav_sample_stats(raw)
    rows.append((6, None))
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r["id"]: r.asDict()
           for r in decode_audio_samples(df, "payload", "id").collect()}
    assert out[6]["n_frames"] is None
    for i in range(6):
        for k, v in expected[i].items():
            got = out[i][k]
            assert (got == pytest.approx(v) if isinstance(v, float)
                    else got == v), (i, k, got, v)


def test_wav_extensible_pcm():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping PCM: the SubFormat
    GUID's leading format code selects PCM; decode matches the plain
    fmt-1 file with the same frames."""
    import struct

    from m3spark.ops.multimodal import wav_sample_stats

    frames = [(-300, 500), (1200, -1), (7, 7)]
    data = b"".join(struct.pack("<hh", a, b) for a, b in frames)

    def riff(fmt_chunk):
        chunks = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        if len(fmt_chunk) & 1:
            chunks += b"\x00"
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" \
            + chunks

    plain = riff(struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16))
    guid_pcm = struct.pack("<H", 1) + bytes(14)
    ext = riff(struct.pack("<HHIIHH", 0xFFFE, 2, 8000, 32000, 4, 16)
               + struct.pack("<HHI", 22, 16, 0x3) + guid_pcm)
    sp, se = wav_sample_stats(plain), wav_sample_stats(ext)
    assert sp == se
    assert se["n_frames"] == 3 and se["smp_min"] == -300 \
        and se["smp_max"] == 1200


def test_wav_extensible_float_declared_out():
    """Extensible wrapping IEEE float (SubFormat code 3) stays the
    declared-unsupported path (NULL stats)."""
    import struct

    from m3spark.ops.multimodal import wav_sample_stats

    data = struct.pack("<ff", 0.5, -0.5)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32) \
        + struct.pack("<HHI", 22, 32, 0x3) \
        + struct.pack("<H", 3) + bytes(14)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    st = wav_sample_stats(raw)
    assert st["n_frames"] is None
