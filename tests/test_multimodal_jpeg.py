"""Baseline JPEG decode (ops/jpeg.py): decoded output is checked
against an INDEPENDENT direct-formula IDCT pipeline (naive quadruple
loop straight from T.81 A.3.3, no shared code with the decoder's
basis-matrix path), over files built by a self-contained encoder
(forward DCT + canonical Huffman + byte stuffing).  Plus analytic
DC-only fixtures whose pixel values follow from the spec alone, the
declared-unsupported rejects, and the stats/mapInPandas integration."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from m3spark.ops.jpeg import _jpeg_pixels
from m3spark.ops.multimodal import (
    decode_image_pixels, image_pixel_stats,
)

# --- reference pipeline: direct-formula IDCT (independent of ops/jpeg) ---

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_direct(F):
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * F[u, v]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            out[y, x] = s / 4.0
    return out


def _scan_comps(comps):
    """T.81 A.2: single-component scans are non-interleaved — one data
    unit per MCU; sampling factors shape only multi-component scans."""
    return [dict(comps[0], h=1, v=1)] if len(comps) == 1 else comps


def _reference_decode(coeff_blocks, q, w, h, comps):
    """coeff_blocks[ci] = list of 8x8 quantized-coeff blocks in MCU
    order; rebuild pixels with the direct-formula pipeline."""
    comps = _scan_comps(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci, c in enumerate(comps):
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        k = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        spatial = _idct_direct(
                            coeff_blocks[ci][k] * q[ci])
                        y0, x0 = (my * c["v"] + by) * 8, \
                            (mx * c["h"] + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = spatial
                        k += 1
        p = np.clip(np.round(plane) + 128, 0, 255)
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1),
                      vmax // c["v"], axis=0)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8).reshape(h, w, 1)
    y, cb, cr = planes
    rgb = np.stack([y + 1.402 * (cr - 128.0),
                    y - 0.344136 * (cb - 128.0)
                    - 0.714136 * (cr - 128.0),
                    y + 1.772 * (cb - 128.0)], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- minimal encoder (canonical Huffman, byte stuffing, markers) ---

class _W:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)


def _codes(counts, values):
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lut[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return lut


# simple complete tables: categories 0..11 for DC, a working AC set
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = ([0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0] * 16
_AC_COUNTS[7] = len(_AC_VALS)  # all codes length 8: 162 <= 255, complete


def _cat(v):
    return v.bit_length() if v > 0 else (-v).bit_length()


def _emit_block(w, blk, dc_lut, ac_lut, pred, ci):
    diff = int(blk[0, 0]) - pred[ci]
    pred[ci] = int(blk[0, 0])
    t = _cat(diff)
    c, ln = dc_lut[t]
    w.bits(c, ln)
    if t:
        w.bits(diff if diff > 0 else diff + (1 << t) - 1, t)
    flat = [int(blk[_ZZ[k] // 8, _ZZ[k] % 8]) for k in range(64)]
    k = 1
    while k < 64:
        run = 0
        while k < 64 and flat[k] == 0:
            run += 1
            k += 1
        if k == 64:
            c, ln = ac_lut[0x00]
            w.bits(c, ln)
            return
        while run > 15:
            c, ln = ac_lut[0xF0]
            w.bits(c, ln)
            run -= 16
        v = flat[k]
        s = _cat(v)
        c, ln = ac_lut[(run << 4) | s]
        w.bits(c, ln)
        w.bits(v if v > 0 else v + (1 << s) - 1, s)
        k += 1


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def make_jpeg(coeff_blocks, qtabs, w, h, comps, restart=0,
              q16bit=False):
    """Build a baseline JPEG from quantized coefficient blocks."""
    dc_lut = _codes(_DC_COUNTS, _DC_VALS)
    ac_lut = _codes(_AC_COUNTS, _AC_VALS)
    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qtabs):
        zz = bytes(int(q[_ZZ[k] // 8, _ZZ[k] % 8]) for k in range(64)) \
            if not q16bit else b"".join(
                struct.pack(">H", int(q[_ZZ[k] // 8, _ZZ[k] % 8]))
                for k in range(64))
        out += _seg(0xDB, bytes([(0x10 if q16bit else 0) | tid]) + zz)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS)
                + bytes(_AC_VALS))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    comps = _scan_comps(comps)  # SOF keeps the declared factors
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    wtr = _W()
    pred = [0] * len(comps)
    idx = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            wtr.flush()
            out += wtr.out
            wtr = _W()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(comps)
        for ci, c in enumerate(comps):
            for _ in range(c["h"] * c["v"]):
                _emit_block(wtr, coeff_blocks[ci][idx[ci]], dc_lut,
                            ac_lut, pred, ci)
                idx[ci] += 1
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def _rand_blocks(rng, n, lo=-40, hi=40, sparse=0.8):
    blocks = []
    for _ in range(n):
        b = rng.integers(lo, hi + 1, (8, 8)).astype(np.float64)
        mask = rng.random((8, 8)) < sparse
        b[mask] = 0
        b[0, 0] = rng.integers(-80, 81)
        blocks.append(b)
    return blocks


def _n_blocks(w, h, comps):
    comps = _scan_comps(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [mcux * mcuy * c["h"] * c["v"] for c in comps]


# --- analytic DC-only fixture (spec math alone, no reference decode) ---

def _dc_only_gray(v, w, h):
    """Hand-layout file: flat q=8 table, 1-bit Huffman codes, one
    entropy byte 2*v.  Decoded pixel must be exactly 128+v."""
    assert 32 <= v <= 63
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([8] * 64))
    out += _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [6]))
    out += _seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0]))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([1, 1, 0x11, 0]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([2 * v]) + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("v,w,h", [(32, 8, 8), (63, 3, 5), (40, 1, 1)])
def test_dc_only_analytic(v, w, h):
    got = _jpeg_pixels(_dc_only_gray(v, w, h))
    assert got is not None
    gw, gh, ch, px = got
    assert (gw, gh, ch) == (w, h, 1)
    assert (px == 128 + v).all()


@pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (13, 11), (24, 17)])
def test_gray_vs_direct_formula(w, h):
    rng = np.random.default_rng(w * 100 + h)
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 4
    q[0, 0] = 8
    blocks = [_rand_blocks(rng, _n_blocks(w, h, comps)[0])]
    raw = make_jpeg(blocks, [q], w, h, comps)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 1)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [q], w, h, comps))


@pytest.mark.parametrize("sub,restart", [
    ((1, 1), 0), ((2, 2), 0), ((2, 1), 0), ((1, 2), 0), ((2, 2), 2),
])
def test_color_vs_direct_formula(sub, restart):
    w, h = 19, 14
    rng = np.random.default_rng(sum(sub) * 7 + restart)
    sh, sv = sub
    comps = [{"id": 1, "h": sh, "v": sv, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 1},
             {"id": 3, "h": 1, "v": 1, "tq": 1}]
    qy = np.ones((8, 8)) * 3
    qc = np.ones((8, 8)) * 5
    nb = _n_blocks(w, h, comps)
    blocks = [_rand_blocks(rng, nb[ci]) for ci in range(3)]
    raw = make_jpeg(blocks, [qy, qc], w, h, comps, restart=restart)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 3)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [qy, qc, qc], w, h, comps))


def test_gray_declared_2x2_noninterleaved():
    """A single-component scan with DECLARED h=v=2 sampling must decode
    identically to the same blocks declared 1x1 (T.81 A.2: one data
    unit per MCU, raster order of the component's own grid)."""
    w, h = 24, 16
    rng = np.random.default_rng(99)
    c22 = [{"id": 1, "h": 2, "v": 2, "tq": 0}]
    c11 = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 4
    blocks = [_rand_blocks(rng, _n_blocks(w, h, c11)[0])]
    got22 = _jpeg_pixels(make_jpeg(blocks, [q], w, h, c22))
    got11 = _jpeg_pixels(make_jpeg(blocks, [q], w, h, c11))
    assert got22 is not None and got11 is not None
    np.testing.assert_array_equal(got22[3], got11[3])
    np.testing.assert_array_equal(
        got22[3], _reference_decode(blocks, [q], w, h, c22))


def test_absurd_dimensions_rejected():
    raw = bytearray(_dc_only_gray(40, 8, 8))
    i = raw.index(b"\xff\xc0")
    raw[i + 5:i + 9] = struct.pack(">HH", 65535, 65535)
    assert _jpeg_pixels(bytes(raw)) is None


def test_16bit_dqt():
    w = h = 8
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 300.0  # needs 16-bit entries
    blocks = [[np.zeros((8, 8))]]
    blocks[0][0][0, 0] = 2  # DC 2 * 300 / 8 = 75 -> pixel 203
    raw = make_jpeg(blocks, [q], w, h, comps, q16bit=True)
    got = _jpeg_pixels(raw)
    assert got is not None and (got[3] == 203).all()


@pytest.mark.parametrize("mutate", [
    lambda r: r[:20],                                    # truncated
    lambda r: r.replace(b"\xff\xc0", b"\xff\xc2", 1),    # progressive
    lambda r: b"\x89P" + r[2:],                          # not a JPEG
])
def test_rejects(mutate):
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    raw = make_jpeg([[np.zeros((8, 8))]], [np.ones((8, 8))], 8, 8,
                    comps)
    assert _jpeg_pixels(bytes(mutate(raw))) is None


def test_rejects_12bit_and_4comp():
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    raw = bytearray(make_jpeg([[np.zeros((8, 8))]],
                              [np.ones((8, 8))], 8, 8, comps))
    i = raw.index(b"\xff\xc0")
    raw[i + 4] = 12  # precision
    assert _jpeg_pixels(bytes(raw)) is None
    raw[i + 4] = 8
    raw[i + 9] = 4   # component count (frame now malformed -> None)
    assert _jpeg_pixels(bytes(raw)) is None


def test_image_pixel_stats_dispatch():
    st = image_pixel_stats(_dc_only_gray(40, 4, 2))
    assert st["width"] == 4 and st["height"] == 2
    assert st["px_min"] == st["px_max"] == 168
    assert st["px_mean"] == 168.0 and st["ch0_mean"] == 168.0
    assert st["ch1_mean"] is None


def test_dc_only_oracle_parity_duckdb():
    """The driver-oracle closed form (entry JPEG_PIXEL_HEX_SQL /
    multimodal_jpeg_stats SQL) is replayed for every doc_id residue
    class THROUGH DUCKDB and compared field-by-field against the real
    decoder — incl. the round-then-clamp YCbCr path, where numpy's
    banker's rounding could diverge from SQL rounding at exact .5
    (none of the 64 residues may produce one)."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS "
            "SELECT UNNEST(range(0, 64)) AS doc_id")
    hexes = con.sql(
        "SELECT doc_id, " + e.JPEG_PIXEL_HEX_SQL.replace(
            "if(", "IF(") + " AS hx FROM documents ORDER BY doc_id"
    ).fetchall()
    predicted = con.sql(
        e.oracle_sql()["multimodal_jpeg_stats"] + " ORDER BY doc_id"
    ).df().to_dict("records")
    for (d, hx), pred in zip(hexes, predicted):
        st = image_pixel_stats(bytes.fromhex(hx))
        for k, v in st.items():
            if k not in pred:   # ch3_mean is not part of the query
                continue
            want = pred[k]
            want = None if want is None or want != want else \
                (round(float(want), 6) if isinstance(v, float) else
                 int(want))
            got = round(v, 6) if isinstance(v, float) else v
            assert got == want, (d, k, got, want)


def test_decode_image_pixels_op_jpeg(spark):
    rows = [(i, bytearray(_dc_only_gray(32 + i, 5, 3)))
            for i in range(4)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r["id"]: r.asDict()
           for r in decode_image_pixels(df, "payload", "id").collect()}
    for i in range(4):
        assert out[i]["px_mean"] == float(160 + i)
        assert out[i]["channels"] == 1


# --- progressive encoder (T.81 Annex G scan scripts) -------------------

# AC table for progressive scans: adds the EOBn symbols (r<<4, r>=1)
_AC_VALS_PROG = ([r << 4 for r in range(15)] + [0xF0]
                 + [(r << 4) | s for r in range(16)
                    for s in range(1, 11)])
_AC_COUNTS_PROG = [0] * 16
_AC_COUNTS_PROG[7] = len(_AC_VALS_PROG)  # 176 codes, all length 8


def _flatzz(blk):
    return [int(blk[_ZZ[k] // 8, _ZZ[k] % 8]) for k in range(64)]


def _ac_level(v, al):
    """T.81 G.1.2.2 point transform for AC: signed magnitude shift."""
    return (abs(v) >> al) * (1 if v > 0 else -1)


def _emit_ac_first_block(w, flat, ss, se, al, ac_lut, pend):
    """One block of an AC first scan; `pend` carries the cross-block
    EOB run counter.  Returns nothing; flushes the pending run before
    this block's symbols when the block is non-empty."""
    band = [(k, _ac_level(flat[k], al)) for k in range(ss, se + 1)]
    if all(v == 0 for _, v in band):
        pend[0] += 1
        return
    _flush_eobrun(w, ac_lut, pend)
    run = 0
    last_nz = max(i for i, (_, v) in enumerate(band) if v != 0)
    for i, (_, v) in enumerate(band):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_lut[0xF0]
            w.bits(c, ln)
            run -= 16
        s = _cat(v)
        c, ln = ac_lut[(run << 4) | s]
        w.bits(c, ln)
        w.bits(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(band) - 1:
        pend[0] += 1  # this block's EOB starts a fresh run


def _flush_eobrun(w, ac_lut, pend):
    run = pend[0]
    pend[0] = 0
    while run > 0:
        r = min(14, run.bit_length() - 1)
        chunk = min(run, (1 << (r + 1)) - 1)
        c, ln = ac_lut[r << 4]
        w.bits(c, ln)
        if r:
            w.bits(chunk - (1 << r), r)
        run -= chunk


def _refine_block_parts(flat, ss, se, a):
    """Classify one block's refinement band: -> (seq, last_new) where
    seq is [('h', bit) | ('n', sign) | ('z', 0)] and last_new is the
    band index of the last newly-nonzero coefficient (or None)."""
    seq = []
    last_new = None
    for k in range(ss, se + 1):
        v = flat[k]
        hist = abs(v) >> (a + 1)
        lvl = abs(v) >> a
        if hist:
            seq.append(("h", lvl & 1))
        elif lvl:
            seq.append(("n", 1 if v > 0 else 0))
            last_new = len(seq) - 1
        else:
            seq.append(("z", 0))
    return seq, last_new


def _emit_refine_symbols(w, seq, upto, ac_lut):
    """Emit the (r,1)/ZRL symbol stream covering seq[:upto+1],
    mirroring the decoder's walk order (symbol, sign, then the
    correction bits of positions passed by that symbol's window)."""
    i = 0
    while i <= upto:
        j, zc, nxt = i, 0, None
        while j <= upto:
            t = seq[j][0]
            if t == "n":
                nxt = j
                break
            if t == "z":
                zc += 1
            j += 1
        while zc > 15:
            c, ln = ac_lut[0xF0]
            w.bits(c, ln)
            passed = 0
            while passed < 16:
                t, b = seq[i]
                if t == "h":
                    w.bits(b, 1)
                else:
                    passed += 1
                i += 1
            zc -= 16
        c, ln = ac_lut[(zc << 4) | 1]
        w.bits(c, ln)
        w.bits(seq[nxt][1], 1)
        while i < nxt:
            t, b = seq[i]
            if t == "h":
                w.bits(b, 1)
            i += 1
        i = nxt + 1


def _flush_refine_eobrun(w, ac_lut, pending):
    """Emit EOBn covering len(pending) blocks, then each covered
    block's correction bits in block order (the decoder reads them in
    its per-block tail loops).  Chunks runs beyond 2^15-1."""
    blocks = pending[:]
    del pending[:]
    n = len(blocks)
    start = 0
    while n > 0:
        r = min(14, n.bit_length() - 1)
        chunk = min(n, (1 << (r + 1)) - 1)
        c, ln = ac_lut[r << 4]
        w.bits(c, ln)
        if r:
            w.bits(chunk - (1 << r), r)
        for hbits in blocks[start:start + chunk]:
            for b in hbits:
                w.bits(b, 1)
        start += chunk
        n -= chunk


def _emit_ac_refine_scan(w, flats, ss, se, a, ac_lut):
    """A whole AC refinement scan with TRUE cross-block EOB runs:
    blocks with no newly-nonzero coefficient join the pending run;
    a block with new coefficients flushes the run, emits its symbol
    walk, and its trailing band (if any) starts the next run."""
    pending = []  # per-covered-block correction-bit lists
    for flat in flats:
        seq, last_new = _refine_block_parts(flat, ss, se, a)
        if last_new is None:
            pending.append([b for t, b in seq if t == "h"])
            continue
        _flush_refine_eobrun(w, ac_lut, pending)
        _emit_refine_symbols(w, seq, last_new, ac_lut)
        if last_new < len(seq) - 1:
            pending.append([b for t, b in seq[last_new + 1:]
                            if t == "h"])
    _flush_refine_eobrun(w, ac_lut, pending)


def _comp_grids(coeff_blocks, w, h, comps):
    """MCU-ordered block lists -> per-comp dict (by,bx) -> block, plus
    (padded grid, unpadded grid) dims per comp."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for ci, c in enumerate(comps):
        g = {}
        k = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        g[(my * c["v"] + by, mx * c["h"] + bx)] = \
                            coeff_blocks[ci][k]
                        k += 1
        bw = (-(-(w * c["h"]) // hmax) + 7) // 8
        bh = (-(-(h * c["v"]) // vmax) + 7) // 8
        grids.append((g, bw, bh))
    return grids, mcux, mcuy


def make_progressive_jpeg(coeff_blocks, qtabs, w, h, comps,
                          al_dc=1, al_ac=1, bands=((1, 5), (6, 63)),
                          restart=0):
    """Build a progressive JPEG (SOF2) from the same quantized
    coefficient blocks make_jpeg consumes: DC first at Al=al_dc +
    successive DC refinements to 0; per-component spectral-selection
    AC first scans at Al=al_ac + successive AC refinements to 0."""
    dc_lut = _codes(_DC_COUNTS, _DC_VALS)
    ac_lut = _codes(_AC_COUNTS_PROG, _AC_VALS_PROG)
    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qtabs):
        zz = bytes(int(q[_ZZ[k] // 8, _ZZ[k] % 8]) for k in range(64))
        out += _seg(0xDB, bytes([tid]) + zz)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS_PROG)
                + bytes(_AC_VALS_PROG))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC2, sof)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    grids, mcux, mcuy = _comp_grids(coeff_blocks, w, h, comps)
    rstno = [0]

    def maybe_rst(wtr, m, pred=None):
        """Emit RSTn between restart intervals (m = 1-based unit count
        already emitted); returns a fresh writer."""
        if not restart or m % restart or m == 0:
            return wtr
        wtr.flush()
        nonlocal_out = wtr.out
        out.extend(nonlocal_out)
        out.extend(bytes([0xFF, 0xD0 + (rstno[0] % 8)]))
        rstno[0] += 1
        if pred is not None:
            for i_ in range(len(pred)):
                pred[i_] = 0
        return _W()

    def sos_hdr(ids, ss, se, ah, al):
        seg = bytes([len(ids)])
        for cid in ids:
            seg += bytes([cid, 0x00])  # Td=0, Ta=0 (single table pair)
        return _seg(0xDA, seg + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved over all components, Al=al_dc
    out += sos_hdr([c["id"] for c in comps], 0, 0, 0, al_dc)
    wtr = _W()
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            wtr = maybe_rst(wtr, my * mcux + mx, pred)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = grids[ci][0][(my * c["v"] + by,
                                            mx * c["h"] + bx)]
                        lvl = int(blk[0, 0]) >> al_dc
                        diff = lvl - pred[ci]
                        pred[ci] = lvl
                        t = _cat(diff)
                        cde, ln = dc_lut[t]
                        wtr.bits(cde, ln)
                        if t:
                            wtr.bits(diff if diff > 0
                                     else diff + (1 << t) - 1, t)
    wtr.flush()
    out += wtr.out
    # DC refinement scans down to Al=0
    for a in range(al_dc - 1, -1, -1):
        out += sos_hdr([c["id"] for c in comps], 0, 0, a + 1, a)
        wtr = _W()
        for my in range(mcuy):
            for mx in range(mcux):
                wtr = maybe_rst(wtr, my * mcux + mx)
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = grids[ci][0][(my * c["v"] + by,
                                                mx * c["h"] + bx)]
                            wtr.bits((int(blk[0, 0]) >> a) & 1, 1)
        wtr.flush()
        out += wtr.out
    # AC scans: per component, per spectral band
    for ci, c in enumerate(comps):
        g, bw, bh = grids[ci]
        for (ss, se) in bands:
            out += sos_hdr([c["id"]], ss, se, 0, al_ac)
            wtr = _W()
            pend = [0]
            for by in range(bh):
                for bx in range(bw):
                    m = by * bw + bx
                    if restart and m and m % restart == 0:
                        _flush_eobrun(wtr, ac_lut, pend)
                        wtr = maybe_rst(wtr, m)
                    _emit_ac_first_block(wtr, _flatzz(g[(by, bx)]),
                                         ss, se, al_ac, ac_lut, pend)
            _flush_eobrun(wtr, ac_lut, pend)
            wtr.flush()
            out += wtr.out
            for a in range(al_ac - 1, -1, -1):
                out += sos_hdr([c["id"]], ss, se, a + 1, a)
                wtr = _W()
                flats = [_flatzz(g[(by, bx)]) for by in range(bh)
                         for bx in range(bw)]
                if restart:
                    # EOB runs cannot cross restart intervals
                    for st in range(0, len(flats), restart):
                        if st:
                            wtr = maybe_rst(wtr, st)
                        _emit_ac_refine_scan(wtr, flats[st:st + restart],
                                             ss, se, a, ac_lut)
                else:
                    _emit_ac_refine_scan(wtr, flats, ss, se, a, ac_lut)
                wtr.flush()
                out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("w,h,al_dc,al_ac,bands", [
    (16, 16, 1, 1, ((1, 5), (6, 63))),
    (16, 16, 0, 0, ((1, 63),)),
    (24, 17, 2, 1, ((1, 10), (11, 63))),
    (13, 11, 1, 2, ((1, 63),)),
])
def test_progressive_gray_vs_direct_formula(w, h, al_dc, al_ac, bands):
    """Progressive scan scripts (DC successive approximation + AC
    spectral selection with refinement) must reconstruct EXACTLY the
    pixels of the direct-formula pipeline on the same coefficients —
    the scan structure is pure re-ordering."""
    rng = np.random.default_rng(w * 1000 + h + al_dc * 7 + al_ac)
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 4
    q[0, 0] = 8
    blocks = [_rand_blocks(rng, _n_blocks(w, h, comps)[0])]
    raw = make_progressive_jpeg(blocks, [q], w, h, comps,
                                al_dc=al_dc, al_ac=al_ac, bands=bands)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 1)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [q], w, h, comps))


@pytest.mark.parametrize("sub", [(1, 1), (2, 2), (2, 1), (1, 2)])
def test_progressive_color_vs_direct_formula(sub):
    w, h = 32, 16
    rng = np.random.default_rng(sum(sub) * 13)
    sh, sv = sub
    comps = [{"id": 1, "h": sh, "v": sv, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 1},
             {"id": 3, "h": 1, "v": 1, "tq": 1}]
    qy = np.ones((8, 8)) * 3
    qc = np.ones((8, 8)) * 5
    nb = _n_blocks(w, h, comps)
    blocks = [_rand_blocks(rng, nb[ci]) for ci in range(3)]
    raw = make_progressive_jpeg(blocks, [qy, qc], w, h, comps)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 3)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [qy, qc, qc], w, h, comps))


def test_progressive_color_odd_dims_padding():
    """Odd dimensions with 4:2:0 luma: the padded MCU grid exceeds the
    unpadded block grid; AC scans cover only the unpadded grid, and
    the padding blocks' pixels are cropped before comparison, so the
    decode still matches the reference on the visible region."""
    w, h = 19, 14
    rng = np.random.default_rng(4242)
    comps = [{"id": 1, "h": 2, "v": 2, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 1},
             {"id": 3, "h": 1, "v": 1, "tq": 1}]
    qy = np.ones((8, 8)) * 3
    qc = np.ones((8, 8)) * 5
    nb = _n_blocks(w, h, comps)
    blocks = [_rand_blocks(rng, nb[ci]) for ci in range(3)]
    # zero the AC of luma padding blocks (outside the unpadded grid):
    # the progressive AC scans never code them, so the reference must
    # agree on what the decoder reconstructs there (DC only)
    grids, mcux, mcuy = _comp_grids(blocks, w, h, comps)
    g, bw, bh = grids[0]
    for (by, bx), blk in g.items():
        if by >= bh or bx >= bw:
            dc = blk[0, 0]
            blk[:] = 0
            blk[0, 0] = dc
    raw = make_progressive_jpeg(blocks, [qy, qc], w, h, comps)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 3)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [qy, qc, qc], w, h, comps))


def test_progressive_header_stats_dispatch():
    """ops.multimodal image_pixel_stats now covers progressive input
    (previously the declared-unsupported path)."""
    from m3spark.ops.multimodal import image_pixel_stats

    w, h = 16, 16
    rng = np.random.default_rng(7)
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 4
    blocks = [_rand_blocks(rng, _n_blocks(w, h, comps)[0])]
    raw = make_progressive_jpeg(blocks, [q], w, h, comps)
    st = image_pixel_stats(raw)
    ref = _reference_decode(blocks, [q], w, h, comps)
    assert st["width"] == w and st["height"] == h
    assert st["px_mean"] == pytest.approx(float(ref.mean()), abs=1e-9)


@pytest.mark.parametrize("restart", [1, 2, 3])
def test_progressive_restart_markers(restart):
    """RSTn inside progressive scans: DC predictors and EOB runs reset
    at every interval, in every scan kind (DC first/refine, AC
    first/refine)."""
    w, h = 32, 24
    rng = np.random.default_rng(restart * 31)
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
    q = np.ones((8, 8)) * 4
    blocks = [_rand_blocks(rng, _n_blocks(w, h, comps)[0])]
    raw = make_progressive_jpeg(blocks, [q], w, h, comps,
                                restart=restart)
    assert b"\xff\xd0" in raw or b"\xff\xd1" in raw
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 1)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [q], w, h, comps))


def test_progressive_restart_color():
    w, h = 32, 32
    rng = np.random.default_rng(88)
    comps = [{"id": 1, "h": 2, "v": 2, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 1},
             {"id": 3, "h": 1, "v": 1, "tq": 1}]
    qy = np.ones((8, 8)) * 3
    qc = np.ones((8, 8)) * 5
    nb = _n_blocks(w, h, comps)
    blocks = [_rand_blocks(rng, nb[ci]) for ci in range(3)]
    raw = make_progressive_jpeg(blocks, [qy, qc], w, h, comps,
                                restart=2)
    got = _jpeg_pixels(raw)
    assert got is not None and got[:3] == (w, h, 3)
    np.testing.assert_array_equal(
        got[3], _reference_decode(blocks, [qy, qc, qc], w, h, comps))
