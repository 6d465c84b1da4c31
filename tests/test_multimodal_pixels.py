"""Full PNG pixel decode (ops/multimodal.py _png_pixels): round-trip
against a reference encoder (REAL zlib compression, all five scanline
filters, every 8-bit color type incl. palette, multi-chunk IDAT), the
declared-unsupported rejects, and the Arrow mapInPandas op."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from m3spark.ops.multimodal import (
    _png_pixels, decode_image_pixels, png_pixel_stats,
)


def _chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """MSB-first sub-byte packing of one scanline (zero padding)."""
    bits = ((samples.reshape(-1)[:, None]
             >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
    return np.packbits(bits.astype(np.uint8)).tobytes()


def _filter_subimage(arr: np.ndarray, filters, bpp: int,
                     depth: int = 8) -> bytes:
    """Forward-filter one (sub-)image's scanlines with the given
    per-row filter cycle."""
    hh = arr.shape[0]
    raw = b""
    if depth < 8:
        prev = bytes(len(_pack_row(arr[0], depth)))
    else:
        prev = bytes(arr.shape[1] * bpp)
    for r in range(hh):
        line = (_pack_row(arr[r], depth) if depth < 8
                else arr[r].reshape(-1).astype(">u2").tobytes()
                if arr.dtype == np.uint16
                else arr[r].reshape(-1).tobytes())
        f = filters[r % len(filters)]
        enc = bytearray(line)
        if f == 1:
            for x in range(len(line) - 1, bpp - 1, -1):
                enc[x] = (line[x] - line[x - bpp]) & 0xFF
        elif f == 2:
            for x in range(len(line)):
                enc[x] = (line[x] - prev[x]) & 0xFF
        elif f == 3:
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line
    return raw


def make_png(px: np.ndarray, ct: int, filters, plte=None,
             split_idat=True, interlace=0, depth=None):
    """Reference encoder: forward-filters each scanline with the given
    per-row filter cycle and deflates for real; 16-bit when ``px`` is
    uint16; sub-byte MSB-first packing when ``depth`` is 1/2/4; Adam7
    sub-image splitting when ``interlace=1``."""
    h, w, ch = px.shape
    if depth is None:
        depth = 16 if px.dtype == np.uint16 else 8
    bpp = max(1, ch * (depth // 8))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
    if interlace:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _filter_subimage(sub, filters, bpp, depth)
    else:
        raw = _filter_subimage(px, filters, bpp, depth)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    comp = zlib.compress(raw)
    if split_idat and len(comp) > 7:
        out += _chunk(b"IDAT", comp[:7]) + _chunk(b"IDAT", comp[7:])
    else:
        out += _chunk(b"IDAT", comp)
    return out + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filters",
                         [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_all_filters(ct, ch, filters):
    rng = np.random.default_rng(ct * 10 + filters[0])
    px = rng.integers(0, 256, (5, 4, ch), dtype=np.uint8)
    got = _png_pixels(make_png(px, ct, filters))
    assert got is not None
    w, h, c, arr = got
    assert (w, h, c) == (4, 5, ch)
    assert (arr == px).all()


def test_palette_lookup():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 5, (3, 4, 1), dtype=np.uint8)
    plte = bytes(rng.integers(0, 256, 15, dtype=np.uint8))
    got = _png_pixels(make_png(idx, 3, [0, 4], plte=plte))
    assert got is not None
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert (got[3] == pal[idx.reshape(-1)].reshape(3, 4, 3)).all()


def test_palette_out_of_range_rejected():
    idx = np.full((2, 2, 1), 9, dtype=np.uint8)
    plte = bytes(9)  # 3 entries
    assert _png_pixels(make_png(idx, 3, [0], plte=plte)) is None


def test_stats_exact_division():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[:, :, 0] = 10
    px[:, :, 1] = 20
    px[:, :, 2] = 250
    s = png_pixel_stats(make_png(px, 2, [1]))
    assert (s["px_min"], s["px_max"]) == (10, 250)
    assert s["px_mean"] == (6 * (10 + 20 + 250)) / 18
    assert (s["ch0_mean"], s["ch1_mean"], s["ch2_mean"]) == \
        (10.0, 20.0, 250.0)
    assert s["ch3_mean"] is None


@pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_roundtrip_16bit_all_filters(ct, ch, filters):
    """r6: 16-bit samples widen the filter distance (bpp = 2*ch) but
    reverse byte-exactly — values above 255 must survive."""
    rng = np.random.default_rng(ct * 10 + filters[0] + 1)
    px = rng.integers(0, 65536, (5, 4, ch), dtype=np.uint16)
    got = _png_pixels(make_png(px, ct, filters))
    assert got is not None
    w, h, c, arr = got
    assert (w, h, c) == (4, 5, ch)
    assert arr.dtype == np.uint16 and (arr == px).all()


@pytest.mark.parametrize("size", [(1, 1), (3, 3), (8, 8), (9, 10),
                                  (2, 13), (16, 5)])
@pytest.mark.parametrize("depth", [8, 16])
def test_roundtrip_adam7(size, depth):
    """r6: Adam7 — seven independently-filtered sub-images re-strided
    into place; odd sizes exercise the empty-pass arithmetic."""
    w, h = size
    rng = np.random.default_rng(w * 100 + h + depth)
    px = (rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
          if depth == 16
          else rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    got = _png_pixels(make_png(px, 2, [0, 1, 2, 3, 4], interlace=1))
    assert got is not None
    assert (got[0], got[1], got[2]) == (w, h, 3)
    assert (got[3] == px).all()


def test_roundtrip_adam7_palette():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 6, (9, 9, 1), dtype=np.uint8)
    plte = bytes(rng.integers(0, 256, 18, dtype=np.uint8))
    got = _png_pixels(make_png(idx, 3, [0, 2], plte=plte, interlace=1))
    assert got is not None
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert (got[3] == pal[idx.reshape(-1)].reshape(9, 9, 3)).all()


def test_16bit_palette_rejected():
    """Palette color type is 8-bit-max per spec §11.2.2."""
    idx = np.zeros((2, 2, 1), dtype=np.uint16)
    plte = bytes(9)
    assert _png_pixels(make_png(idx, 3, [0], plte=plte)) is None


def test_16bit_stats_exact_division():
    px = np.zeros((2, 3, 1), dtype=np.uint16)
    px[:, :, 0] = 40000
    s = png_pixel_stats(make_png(px, 0, [2]))
    assert (s["px_min"], s["px_max"], s["px_mean"]) == \
        (40000, 40000, 40000.0)
    assert s["ch0_mean"] == 40000.0 and s["ch1_mean"] is None


@pytest.mark.parametrize("mutate", [
    "depth4_rgb", "depth3", "interlace2", "truncated", "bad_deflate",
    "not_png"])
def test_rejects(mutate):
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    raw = make_png(px, 0, [0])
    if mutate == "depth4_rgb":
        # sub-byte depths are gray/palette only (§11.2.2)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
        raw = raw[:8] + _chunk(b"IHDR", ihdr) + raw[8 + 25:]
    elif mutate == "depth3":
        ihdr = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
        raw = raw[:8] + _chunk(b"IHDR", ihdr) + raw[8 + 25:]
    elif mutate == "interlace2":
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
        raw = raw[:8] + _chunk(b"IHDR", ihdr) + raw[8 + 25:]
    elif mutate == "truncated":
        raw = raw[:30]
    elif mutate == "bad_deflate":
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        raw = (raw[:8] + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", b"\x78\x01\xff\xff\xff\xff")
               + _chunk(b"IEND", b""))
    elif mutate == "not_png":
        raw = b"GIF89a" + raw[6:]
    assert _png_pixels(raw) is None
    stats = png_pixel_stats(raw)
    assert all(v is None for v in stats.values())


def test_stored_deflate_with_dummy_adler():
    """The driver query's closed form: stored deflate block + dummy
    adler/CRCs must decode (tolerant mode)."""
    w, h, v = 3, 2, 77
    line = bytes([0]) + bytes([v]) * w
    raw_data = line * h
    stored = (b"\x01" + len(raw_data).to_bytes(2, "little")
              + (65535 - len(raw_data)).to_bytes(2, "little") + raw_data)
    idat = b"\x78\x01" + stored + b"\x00\x00\x00\x00"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
           + struct.pack(">I", len(idat)) + b"IDAT" + idat + b"\x00" * 4
           + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4)
    got = _png_pixels(png)
    assert got is not None
    assert got[:3] == (w, h, 1)
    assert (got[3] == v).all()


def test_decode_image_pixels_op(spark):
    rng = np.random.default_rng(11)
    rows = []
    expected = {}
    for i in range(6):
        ch = [1, 3][i % 2]
        px = rng.integers(0, 256, (3, 4, ch), dtype=np.uint8)
        raw = make_png(px, 0 if ch == 1 else 2, [i % 5])
        rows.append((i, bytearray(raw)))
        expected[i] = png_pixel_stats(raw)
    rows.append((6, None))
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r["id"]: r.asDict()
           for r in decode_image_pixels(df, "payload", "id").collect()}
    assert out[6]["width"] is None
    for i in range(6):
        for k, v in expected[i].items():
            got = out[i][k]
            assert (got == pytest.approx(v) if isinstance(v, float)
                    else got == v), (i, k, got, v)


# ---- r7: sub-byte depths (1/2/4-bit gray + palette, §7.2) ----


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filters",
                         [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_subbyte_gray(depth, filters):
    """Raw sub-byte samples round-trip bit-exactly through real zlib,
    every filter, odd widths (row-end padding bits exercised)."""
    rng = np.random.default_rng(depth * 10 + filters[0])
    for w, h in [(1, 1), (3, 2), (5, 4), (8, 3), (13, 5)]:
        px = rng.integers(0, 1 << depth, (h, w, 1), dtype=np.uint8)
        got = _png_pixels(make_png(px, 0, filters, depth=depth))
        assert got is not None, (depth, w, h)
        gw, gh, gch, arr = got
        assert (gw, gh, gch) == (w, h, 1)
        assert np.array_equal(arr, px), (depth, w, h)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_subbyte_palette(depth):
    n = 1 << depth
    plte = bytes(v for j in range(n) for v in (j * 15, j * 15 + 1,
                                               j * 15 + 2))
    rng = np.random.default_rng(depth)
    idx = rng.integers(0, n, (4, 7, 1), dtype=np.uint8)
    got = _png_pixels(make_png(idx, 3, [0, 2], plte=plte, depth=depth))
    assert got is not None
    gw, gh, gch, arr = got
    assert (gw, gh, gch) == (7, 4, 3)
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(arr, pal[idx.reshape(4, 7)])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_subbyte_adam7(depth):
    """Adam7 sub-images are bit-packed independently per pass."""
    rng = np.random.default_rng(100 + depth)
    for w, h in [(9, 10), (5, 3), (16, 16)]:
        px = rng.integers(0, 1 << depth, (h, w, 1), dtype=np.uint8)
        got = _png_pixels(make_png(px, 0, [0, 1, 2, 3, 4],
                                   depth=depth, interlace=1))
        assert got is not None, (depth, w, h)
        assert np.array_equal(got[3], px), (depth, w, h)


def test_subbyte_padding_bits_ignored():
    """Nonzero garbage in row-end padding bits must not leak into
    samples (spec: padding content is arbitrary)."""
    # depth 4, w=3 -> 2 bytes/row; low nibble of byte 2 is padding
    raw_rows = bytes([0, 0xAB, 0xCF]) + bytes([0, 0x12, 0x39])
    import zlib as _z
    comp = _z.compress(raw_rows)
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 4, 0, 0, 0, 0))
           + _chunk(b"IDAT", comp) + _chunk(b"IEND", b""))
    got = _png_pixels(png)
    assert got is not None
    assert got[3].reshape(2, 3).tolist() == [[0xA, 0xB, 0xC],
                                             [0x1, 0x2, 0x3]]
