"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The decode step is a REAL dependency-free container-header parser for
PNG / JPEG / WAV (magic bytes, dimensions, channel count — the metadata
a training-data pipeline filters on before any pixel decode), behind the
``_decode_payload`` seam.  Full pixel/sample decode (PIL/librosa/ffmpeg
are not in this container) would replace only the marked tail of
``_decode_payload``; the Spark-side contract — schema, Arrow batching
over ``mapInPandas``, partition behavior — is identical either way.

Header layouts parsed (public specs):
- PNG (RFC 2083 / W3C): 8-byte signature, IHDR chunk at fixed offset 8 —
  width/height as 4-byte big-endian at 16/20, bit depth at 24, color
  type at 25 (0 gray=1ch, 2 rgb=3, 3 palette=1, 4 gray+a=2, 6 rgba=4).
- JPEG (ITU T.81): marker walk from SOI; any SOFn marker (C0-C3, C5-C7,
  C9-CB, CD-CF) carries precision(1), height(2 BE), width(2 BE),
  component count(1).
- WAV (RIFF): 'RIFF'+size+'WAVE', then 'fmt ' chunk: channels as LE16
  at byte 22, sample rate LE32 at 24 (canonical layout).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("media_type", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", StringType()),
    StructField("feature_mean", DoubleType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
])

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _be16(b: bytes, i: int) -> int:
    return (b[i] << 8) | b[i + 1]


def _parse_png(raw: bytes):
    # signature already matched; IHDR must be the first chunk (spec)
    if len(raw) < 26 or raw[12:16] != b"IHDR":
        return None, None, None
    w = int.from_bytes(raw[16:20], "big")
    h = int.from_bytes(raw[20:24], "big")
    return w, h, _PNG_CHANNELS.get(raw[25])


def _parse_jpeg(raw: bytes):
    i = 2
    n = len(raw)
    while i + 4 <= n:
        if raw[i] != 0xFF:
            return None, None, None
        # ITU T.81 B.1.1.2: markers may be preceded by any number of
        # 0xFF fill bytes — skip them before reading the marker byte.
        while i + 1 < n and raw[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = raw[i + 1]
        if marker in _JPEG_SOF:
            if i + 10 > n:
                return None, None, None
            h = _be16(raw, i + 5)
            w = _be16(raw, i + 7)
            return w, h, raw[i + 9]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2          # standalone markers carry no length
        elif marker == 0xD9:
            break           # EOI before any SOF
        else:
            i += 2 + _be16(raw, i + 2)
    return None, None, None


def _parse_wav(raw: bytes):
    # canonical layout: 'fmt ' chunk directly after the WAVE form type
    if len(raw) < 28 or raw[8:12] != b"WAVE" or raw[12:16] != b"fmt ":
        return None
    return int.from_bytes(raw[22:24], "little")


def _decode_payload(raw: bytes) -> dict:
    """Container-header decode: media type sniff + real dimension /
    channel parsing.  Pixel/sample decode would extend the tail."""
    import hashlib
    w = h = ch = None
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        mt = "image/png"
        w, h, ch = _parse_png(raw)
    elif raw[:3] == b"\xff\xd8\xff":
        mt = "image/jpeg"
        w, h, ch = _parse_jpeg(raw)
    elif raw[:4] == b"RIFF":
        mt = "audio/wav"
        ch = _parse_wav(raw)
    else:
        mt = "application/octet-stream"
    # unrounded: callers choose presentation rounding (Spark F.round's
    # HALF_UP matches DuckDB ROUND; Python's banker's round does not)
    mean = (sum(raw) / len(raw)) if raw else 0.0
    return {"media_type": mt, "n_bytes": len(raw),
            "checksum": hashlib.md5(raw).hexdigest()[:16],
            "feature_mean": mean, "width": w, "height": h, "channels": ch}


_NULL_FEATURES = {f.name: None for f in FEATURE_SCHEMA.fields}


# ---------------------------------------------------------------------------
# PNG pixel decode — dependency-free (stdlib zlib inflate + scanline
# unfiltering per the W3C PNG spec §6/§9): ALL spec depths — 1/2/4-bit
# (gray and palette, MSB-first bit-packed scanlines, r7), 8- and
# 16-bit — over color types 0 (gray) / 2 (rgb) / 3 (palette via PLTE)
# / 4 (gray+alpha) / 6 (rgba), non-interlaced AND Adam7-interlaced
# (seven independently-filtered sub-images re-strided into place,
# §8.2).  Sub-byte gray samples are returned RAW (0..2^d-1), not
# rescaled.  Chunk CRCs and the zlib adler32 trailer are NOT verified
# (tolerant decode: a corpus crawl keeps partially-damaged files
# decodable; the inflate itself still fails closed on garbage).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(raw: bytes):
    i = 8
    n = len(raw)
    while i + 8 <= n:
        ln = int.from_bytes(raw[i:i + 4], "big")
        typ = raw[i + 4:i + 8]
        data = raw[i + 8:i + 8 + ln]
        if len(data) < ln:
            return  # truncated chunk
        yield typ, data
        if typ == b"IEND":
            return
        i += 12 + ln  # length + type + data + (unverified) CRC


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(rawdat: bytes, pos: int, row_bytes: int, hpx: int,
                  bpp: int):
    """Reverse the per-scanline filters of one (sub-)image starting at
    byte ``pos``: returns (unfiltered bytes, next pos) or None.
    ``row_bytes`` is the packed scanline width (ceil(w*bits/8));
    ``bpp`` is the filter distance (§9.2) — bytes per pixel, rounded
    up to 1 for sub-byte depths, widened for 16-bit samples."""
    stride = 1 + row_bytes
    if len(rawdat) < pos + stride * hpx:
        return None
    out = bytearray(row_bytes * hpx)
    prev = bytearray(row_bytes)
    for r in range(hpx):
        f = rawdat[pos + r * stride]
        line = bytearray(rawdat[pos + r * stride + 1:
                                pos + (r + 1) * stride])
        if f == 1:      # Sub
            for x in range(bpp, len(line)):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:    # Up
            for x in range(len(line)):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:    # Average
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif f != 0:    # None
            return None
        out[r * row_bytes:(r + 1) * row_bytes] = line
        prev = line
    return bytes(out), pos + stride * hpx


def _unpack_bits(data: bytes, wpx: int, hpx: int, depth: int, np):
    """MSB-first sub-byte sample unpacking (§7.2): ``hpx`` scanlines of
    ``wpx`` samples at 1/2/4 bits, padding bits at each row end
    ignored.  Returns an (hpx, wpx) uint8 array of RAW sample values."""
    row_bytes = (wpx * depth + 7) // 8
    arr = np.frombuffer(data, dtype=np.uint8).reshape(hpx, row_bytes)
    bits = np.unpackbits(arr, axis=1)[:, :wpx * depth]
    bits = bits.reshape(hpx, wpx, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def _png_pixels(raw: bytes):
    """(width, height, channels, HxWxC uint8/uint16 ndarray) or None."""
    import zlib

    import numpy as np

    if raw[:8] != _PNG_SIG:
        return None
    ihdr = None
    plte = None
    idat = []
    for typ, data in _png_chunks(raw):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ct, comp, filt, interlace = ihdr[8:13]
    if depth not in (1, 2, 4, 8, 16) or comp != 0 or filt != 0 \
            or interlace not in (0, 1) or ct not in _PNG_CHANNELS \
            or w == 0 or h == 0:
        return None
    if depth < 8 and ct not in (0, 3):
        return None  # sub-byte depths: gray + palette only (§11.2.2)
    if ct == 3 and depth == 16:
        return None  # palette is 8-bit-max per spec §11.2.2
    ch = _PNG_CHANNELS[ct]
    bpp = max(1, ch * (depth // 8))  # filter distance (§9.2)
    dtype = ">u2" if depth == 16 else np.uint8

    def row_bytes(wpx):
        return (wpx * ch * depth + 7) // 8

    stream = b"".join(idat)
    if len(stream) < 3:
        return None
    try:
        # skip the 2-byte zlib header; raw-deflate inflate ignores the
        # adler32 trailer (tolerant decode, see module note)
        rawdat = zlib.decompressobj(-15).decompress(stream[2:])
    except zlib.error:
        return None

    def subimage(data, wp, hp):
        if depth < 8:
            return _unpack_bits(data, wp, hp, depth, np) \
                .reshape(hp, wp, 1)
        return np.frombuffer(data, dtype=dtype).reshape(hp, wp, ch)

    if interlace == 0:
        res = _png_unfilter(rawdat, 0, row_bytes(w), h, bpp)
        if res is None:
            return None
        px = subimage(res[0], w, h)
        if depth == 16:
            px = px.astype(np.uint16)  # native order for callers
    else:
        # Adam7: seven independently-filtered sub-images, re-strided
        # into the full grid; empty passes contribute no scanlines
        px = np.zeros((h, w, ch),
                      dtype=np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            res = _png_unfilter(rawdat, pos, row_bytes(wp), hp, bpp)
            if res is None:
                return None
            data, pos = res
            px[y0::dy, x0::dx, :] = subimage(data, wp, hp)
    if ct == 3:
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px.reshape(-1)
        if int(idx.max(initial=0)) >= len(pal):
            return None
        return w, h, 3, pal[idx].reshape(h, w, 3)
    return w, h, ch, px


PIXEL_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("px_min", IntegerType()),
    StructField("px_max", IntegerType()),
    StructField("px_mean", DoubleType()),
    StructField("ch0_mean", DoubleType()),
    StructField("ch1_mean", DoubleType()),
    StructField("ch2_mean", DoubleType()),
    StructField("ch3_mean", DoubleType()),
])

_NULL_PIXELS = {f.name: None for f in PIXEL_SCHEMA.fields}


def _image_pixels(raw: bytes):
    """Magic-dispatched full pixel decode: PNG (this module) or
    sequential/progressive JPEG (ops/jpeg.py).  Returns
    (w, h, ch, ndarray) or None."""
    if not raw:
        return None
    if raw[:8] == _PNG_SIG:
        return _png_pixels(raw)
    if raw[:2] == b"\xff\xd8":
        from m3spark.ops.jpeg import jpeg_pixel_stats_input
        return jpeg_pixel_stats_input(raw)
    return None


def image_pixel_stats(raw: bytes) -> dict:
    """Per-image pixel statistics from the full decode (PNG or
    sequential/progressive JPEG).  Means are one exact-integer-sum / exact-integer-count IEEE
    division, so a SQL oracle computing the same two integers predicts
    them bit-for-bit."""
    dec = _image_pixels(raw) if raw else None
    if dec is None:
        return dict(_NULL_PIXELS)
    w, h, ch, px = dec
    flat = px.reshape(-1)
    total = int(flat.sum(dtype="int64"))
    stats = {
        "width": w, "height": h, "channels": ch,
        "px_min": int(flat.min()), "px_max": int(flat.max()),
        "px_mean": total / (w * h * ch),
    }
    for c in range(4):
        stats[f"ch{c}_mean"] = (
            int(px[:, :, c].sum(dtype="int64")) / (w * h)
            if c < ch else None)
    return stats


def png_pixel_stats(raw: bytes) -> dict:
    """PNG-era name kept for callers/tests; dispatch is now shared."""
    return image_pixel_stats(raw)


def decode_image_pixels(df: DataFrame, binary_col: str,
                        id_col: str) -> DataFrame:
    """(id, width, height, channels, px_min, px_max, px_mean,
    ch0..ch3_mean) via the same Arrow mapInPandas shape as
    decode_binary_features — the real pixel path, not a stub."""
    return _binary_stats_op(df, binary_col, id_col, PIXEL_SCHEMA,
                            image_pixel_stats, _NULL_PIXELS)


# ---------------------------------------------------------------------------
# WAV PCM sample decode — dependency-free RIFF chunk walk (word-aligned
# chunk skipping per the RIFF spec) + PCM sample widening: 8-bit
# unsigned (decoded to centered amplitude, value-128, the format's
# canonical interpretation), 16-bit signed LE, 24-bit signed LE packed
# (manual 3-byte widening), 32-bit signed LE.  audio_format must be 1
# (integer PCM); float/extensible/compressed forms return None
# (declared unsupported).  The RIFF size field and fmt byte-rate /
# block-align are NOT trusted (tolerant decode, same stance as the PNG
# path): frame layout derives from bits-per-sample x channels, and a
# trailing partial frame is dropped.


def _wav_chunks(raw: bytes):
    i = 12
    n = len(raw)
    while i + 8 <= n:
        cid = raw[i:i + 4]
        ln = int.from_bytes(raw[i + 4:i + 8], "little")
        data = raw[i + 8:i + 8 + ln]
        if len(data) < ln:
            # declared length exceeds the bytes present (streaming-style
            # WAVs write a placeholder size): clamp the final chunk to
            # what is actually there — size fields are NOT trusted
            # (tolerant decode, r6 advice), truncation never drops the
            # whole chunk
            yield cid, data
            return
        yield cid, data
        i += 8 + ln + (ln & 1)  # chunks are word-aligned (RIFF spec)


def _wav_samples(raw: bytes):
    """(channels, sample_rate, bits, n_frames x channels int ndarray)
    or None."""
    import numpy as np

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    fmt = data = None
    for cid, d in _wav_chunks(raw):
        if cid == b"fmt " and fmt is None:
            fmt = d
        elif cid == b"data" and data is None:
            data = d
    if fmt is None or data is None or len(fmt) < 16:
        return None
    afmt = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if afmt == 0xFFFE and len(fmt) >= 40:
        # WAVE_FORMAT_EXTENSIBLE: the real format code is the first
        # two bytes of the SubFormat GUID; samples fill the container
        # width declared at fmt[14:16]
        afmt = int.from_bytes(fmt[24:26], "little")
    if afmt != 1 or ch == 0 or rate == 0 or bits not in (8, 16, 24, 32):
        return None  # non-PCM (incl. IEEE float) stays declared-out
    block = (bits // 8) * ch
    nfr = len(data) // block
    if nfr == 0:
        return None
    buf = data[:nfr * block]
    if bits == 8:
        smp = np.frombuffer(buf, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        smp = np.frombuffer(buf, dtype="<i2").astype(np.int64)
    elif bits == 32:
        smp = np.frombuffer(buf, dtype="<i4").astype(np.int64)
    else:  # 24-bit: widen 3-byte little-endian groups with sign
        b = (np.frombuffer(buf, dtype=np.uint8)
             .reshape(-1, 3).astype(np.int64))
        smp = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        smp = smp - ((smp >> 23) & 1) * (1 << 24)
    return ch, rate, bits, smp.reshape(nfr, ch)


AUDIO_SCHEMA = StructType([
    StructField("n_frames", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("smp_min", LongType()),
    StructField("smp_max", LongType()),
    StructField("smp_mean", DoubleType()),
    StructField("ch0_mean", DoubleType()),
    StructField("ch1_mean", DoubleType()),
    StructField("duration_sec", DoubleType()),
])

_NULL_AUDIO = {f.name: None for f in AUDIO_SCHEMA.fields}


def wav_sample_stats(raw: bytes) -> dict:
    """Per-file PCM sample statistics from the full decode.  Means and
    duration are one exact-integer-sum / exact-integer-count IEEE
    division each, so a SQL oracle computing the same integers predicts
    them bit-for-bit (same convention as png_pixel_stats)."""
    dec = _wav_samples(raw) if raw else None
    if dec is None:
        return dict(_NULL_AUDIO)
    ch, rate, bits, smp = dec
    nfr = smp.shape[0]
    flat = smp.reshape(-1)
    out = {
        "n_frames": nfr, "channels": ch, "sample_rate": rate,
        "bits": bits, "smp_min": int(flat.min()),
        "smp_max": int(flat.max()),
        "smp_mean": int(flat.sum()) / (nfr * ch),
        "duration_sec": nfr / rate,
    }
    for c in range(2):
        out[f"ch{c}_mean"] = (int(smp[:, c].sum()) / nfr
                              if c < ch else None)
    return out


def _binary_stats_op(df: DataFrame, binary_col: str, id_col: str,
                     schema: StructType, stats_fn,
                     null_row: dict) -> DataFrame:
    """Shared Arrow mapInPandas scaffolding for per-blob stats
    decoders: (id, *schema fields), NULL row for NULL payloads,
    nullable integer dtypes preserved."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name == id_col]
        + list(schema.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[binary_col].map(
                lambda b: stats_fn(bytes(b)) if b is not None
                else dict(null_row))
            out = pd.DataFrame({id_col: pdf[id_col]})
            for f in schema.fields:
                col = feats.map(lambda d, _k=f.name: d[_k])
                if isinstance(f.dataType, IntegerType):
                    col = col.astype("Int32")
                elif isinstance(f.dataType, LongType):
                    col = col.astype("Int64")
                out[f.name] = col
            yield out

    from m3spark.ops.repart import widen_partitions

    return widen_partitions(df.select(id_col, binary_col)) \
        .mapInPandas(run, out_schema)


def decode_audio_samples(df: DataFrame, binary_col: str,
                         id_col: str) -> DataFrame:
    """(id, n_frames, channels, sample_rate, bits, smp_min, smp_max,
    smp_mean, ch0_mean, ch1_mean, duration_sec) via the same Arrow
    mapInPandas shape as decode_image_pixels — the real PCM path."""
    return _binary_stats_op(df, binary_col, id_col, AUDIO_SCHEMA,
                            wav_sample_stats, _NULL_AUDIO)


def decode_binary_features(df: DataFrame, binary_col: str,
                           id_col: str) -> DataFrame:
    """(id, media_type, n_bytes, checksum, feature_mean, width, height,
    channels) via Arrow-batched mapInPandas — the hot-path shape for real
    decoders: one Python process per task, one Arrow batch per ~10k rows,
    columnar in/out."""
    return _binary_stats_op(df, binary_col, id_col, FEATURE_SCHEMA,
                            _decode_payload, _NULL_FEATURES)
