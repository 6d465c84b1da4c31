"""Dependency-free baseline JPEG full-pixel decode (ITU T.81).

Scope (declared): baseline + extended-sequential + PROGRESSIVE
HUFFMAN processes (SOF0/SOF1/SOF2), 8-bit samples, grayscale or
3-component YCbCr with any h/v subsampling factors <= 2 (4:4:4,
4:2:2, 4:2:0, 4:4:0), restart markers, multi-table DQT/DHT, 16-bit
quantizer entries.  Progressive streams (T.81 Annex G) accumulate
DCT coefficients across scans — DC first/refine (successive
approximation), AC first/refine per spectral band with EOB-run
coding — and reconstruct once at EOI.  Arithmetic coding (SOF9+),
12-bit precision, 4-component (CMYK) streams, and frames over 64M
pixels (an allocation bound against crafted headers) return None —
the callers' declared-unsupported path, same stance as the PNG
decoder's sub-byte depths.
Single-component scans decode NON-interleaved (one data unit per MCU,
T.81 A.2) regardless of the declared sampling factors.

Pipeline per the spec: marker walk -> entropy decode (byte-unstuffed
bitstream, per-component DC predictors reset at RSTn) -> dequantize ->
de-zigzag -> 2-D IDCT (separable 8x8 basis-matrix multiply, float64,
T.81 A.3.3) -> level shift + clamp -> chroma replication upsample
(nearest, the T.81 box recommendation) -> JFIF YCbCr->RGB.

Reference parity note: the m3 reference has no media decoding at all —
this module exists for the graft's training-data-pipeline mandate; the
JFIF color transform and Annex-K-style tables come from the public
specs (ITU T.81, JFIF 1.02).
"""

from __future__ import annotations

_SOF_BASELINE = {0xC0, 0xC1}          # huffman sequential
_SOF_PROGRESSIVE = {0xC2}             # huffman progressive
_SOF_UNSUPPORTED = {0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

# zigzag order: _ZIGZAG[k] = raster index of the k-th zigzagged coeff
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


class _Huff:
    """Canonical JPEG Huffman table: (code-length histogram, values) ->
    a flat lookup usable by the bit reader."""

    def __init__(self, counts, values):
        self.lut = {}  # (length, code) -> value
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any real marker (which the caller
    handles: RSTn resets, EOI/next-scan ends)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        while self.nbits <= 24:
            if self.i >= len(self.d):
                self.bits = (self.bits << 8) | 0xFF  # pad per F.2.2.5
                self.nbits += 8
                continue
            b = self.d[self.i]
            if b == 0xFF:
                nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) \
                    else 0xD9
                if nxt == 0x00:
                    self.i += 2
                else:
                    # any real marker (RSTn handled by the caller's
                    # restart(); everything else ends the scan): stop
                    # consuming and pad with 1-bits per F.2.2.5
                    self.marker = nxt
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.i += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def huff(self, table: _Huff) -> int | None:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            v = table.lut.get((ln, code))
            if v is not None:
                return v
        return None

    def restart(self):
        """Byte-align and consume the RSTn marker just hit."""
        self.bits = 0
        self.nbits = 0
        self.marker = None
        # skip fill bytes then the marker pair
        while self.i + 1 < len(self.d) and self.d[self.i] == 0xFF \
                and self.d[self.i + 1] == 0xFF:
            self.i += 1
        if self.i + 1 < len(self.d) and self.d[self.i] == 0xFF \
                and 0xD0 <= self.d[self.i + 1] <= 0xD7:
            self.i += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t read bits to the signed coefficient diff."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_matrix():
    import numpy as np

    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a  # A[u, x]; spatial = A.T @ F @ A


def _jpeg_pixels(raw: bytes):
    """(width, height, channels, HxWxC uint8 ndarray) or None."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        return None
    qt = {}          # id -> 64 ints (raster order)
    huff_dc = {}
    huff_ac = {}
    frame = None
    progressive = False
    coefs = None     # progressive: per-comp (bh, bw, 64) zigzag coeffs
    restart_interval = 0
    i = 2
    n = len(raw)
    while i + 4 <= n:
        if raw[i] != 0xFF:
            return None
        while i + 1 < n and raw[i + 1] == 0xFF:
            i += 1
        marker = raw[i + 1]
        if marker == 0xD9:
            if progressive and coefs is not None:
                return _prog_reconstruct(frame, coefs, qt, np,
                                         _idct_matrix())
            return None  # EOI before SOS
        if marker in _SOF_UNSUPPORTED:
            return None
        seg_len = (raw[i + 2] << 8) | raw[i + 3] if i + 4 <= n else 0
        seg = raw[i + 4:i + 2 + seg_len]
        if marker == 0xDB:   # DQT: one or more tables
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                width = 2 if prec else 1
                vals = seg[j + 1:j + 1 + 64 * width]
                if len(vals) < 64 * width:
                    return None
                tbl = [0] * 64
                for k in range(64):
                    v = (vals[2 * k] << 8) | vals[2 * k + 1] \
                        if prec else vals[k]
                    tbl[_ZIGZAG[k]] = v
                qt[tid] = tbl
                j += 1 + 64 * width
        elif marker == 0xC4:  # DHT: one or more tables
            j = 0
            while j + 17 <= len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1:j + 17])
                nv = sum(counts)
                values = list(seg[j + 17:j + 17 + nv])
                if len(values) < nv:
                    return None
                (huff_ac if cls else huff_dc)[tid] = _Huff(counts,
                                                           values)
                j += 17 + nv
        elif marker in _SOF_BASELINE or marker in _SOF_PROGRESSIVE:
            progressive = marker in _SOF_PROGRESSIVE
            if len(seg) < 6 or seg[0] != 8:
                return None  # 12-bit precision unsupported
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            if nc not in (1, 3) or len(seg) < 6 + 3 * nc or not w \
                    or not h:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                return None
            frame = (w, h, comps)
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None or len(seg) < 1:
                return None
            ns = seg[0]
            w, h, comps = frame
            if len(seg) < 1 + 2 * ns:
                return None
            sel = {}
            scan_ids = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
                scan_ids.append(cs)
            if progressive:
                if len(seg) < 4 + 2 * ns:
                    return None
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                if coefs is None:
                    coefs = _prog_alloc(frame, np)
                    if coefs is None:
                        return None
                end = _prog_scan(raw, i + 2 + seg_len, frame, coefs,
                                 scan_ids, sel, huff_dc, huff_ac,
                                 ss, se, ah, al, restart_interval, np)
                if end is None:
                    return None
                i = end
                continue
            if ns != len(comps):
                return None
            return _decode_scan(raw, i + 2 + seg_len, w, h, comps,
                                sel, qt, huff_dc, huff_ac,
                                restart_interval, np,
                                _idct_matrix())
        elif marker == 0xD8 or marker == 0x01 \
                or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        i += 2 + seg_len
    if progressive and coefs is not None:
        # stream ended (EOI may sit in the final <4 bytes the loop
        # guard does not enter): reconstruct what the scans built
        return _prog_reconstruct(frame, coefs, qt, np, _idct_matrix())
    return None


def _decode_scan(raw, pos, w, h, comps, sel, qt, huff_dc, huff_ac,
                 restart_interval, np, A):
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU in raster order of the component's own
        # grid; the declared sampling factors do not shape the scan.
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if w * h > (1 << 26):
        return None  # declared bound: refuse >64M-pixel allocations
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        if c["tq"] not in qt or c["id"] not in sel:
            return None
        td, ta = sel[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            return None
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(raw, pos)
    pred = [0] * len(comps)
    q_arr = [np.array(qt[c["tq"]], dtype=np.float64).reshape(8, 8)
             for c in comps]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, huff_dc[td],
                                            huff_ac[ta], pred, ci, np)
                        if blk is None:
                            return None
                        spatial = A.T @ (blk * q_arr[ci]) @ A
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_count += 1
    return _finish(planes, comps, w, h, hmax, vmax, np)


def _finish(planes, comps, w, h, hmax, vmax, np):
    """Level shift, clamp, replicate-upsample, crop, JFIF color."""
    out = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci]) + 128, 0, 255)
        # replicate-upsample to full grid, then crop
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1),
                      vmax // c["v"], axis=0)
        out.append(p[:h, :w])
    if len(out) == 1:
        return w, h, 1, out[0].astype(np.uint8).reshape(h, w, 1)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _prog_alloc(frame, np):
    """Per-component (block-rows, block-cols, 64) int32 zigzag-order
    coefficient arrays, padded to whole MCUs for interleaved scans."""
    w, h, comps = frame
    if not w or not h or w * h > (1 << 26):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
            for c in comps]


def _prog_scan(raw, pos, frame, coefs, scan_ids, sel, huff_dc, huff_ac,
               ss, se, ah, al, restart_interval, np):
    """One progressive scan (T.81 Annex G): update the coefficient
    arrays in place, return the stream index of the next marker (the
    0xFF byte), or None on malformed data.

    DC scans (Ss=0) may be interleaved over any component subset; AC
    scans cover one component's own (unpadded) block grid.  Successive
    approximation: first scans (Ah=0) code values at precision Al,
    refinement scans (Ah=Al+1) append one magnitude bit — two's-
    complement identities make the DC `|=` and the AC ±(1<<Al)
    corrections exact for negative coefficients."""
    w, h, comps = frame
    if ss > se or se > 63 or al > 13 or (ss == 0) != (se == 0):
        return None
    if ah and ah != al + 1:
        # successive approximation requires Ah == Al + 1 for refinement
        # scans (T.81 G.1.1.1.2) — anything else is malformed and must
        # take the declared-unsupported None path, not decode wrongly
        return None
    byid = {c["id"]: ci for ci, c in enumerate(comps)}
    idxs = []
    for cid in scan_ids:
        ci = byid.get(cid)
        if ci is None:
            return None
        idxs.append(ci)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(raw, pos)
    state = {"eobrun": 0}
    pred = dict.fromkeys(idxs, 0)

    def dc_first(ci, by, bx):
        tbl = huff_dc.get(sel[comps[ci]["id"]][0])
        if tbl is None:
            return False
        t = br.huff(tbl)
        if t is None or t > 15:
            return False
        pred[ci] += _extend(br.read(t), t)
        coefs[ci][by, bx, 0] = pred[ci] << al
        return True

    def dc_refine(ci, by, bx):
        if br.read(1):
            coefs[ci][by, bx, 0] |= 1 << al
        return True

    def ac_first(ci, by, bx):
        tbl = huff_ac.get(sel[comps[ci]["id"]][1])
        if tbl is None:
            return False
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return True
        blk = coefs[ci][by, bx]
        k = ss
        while k <= se:
            rs = br.huff(tbl)
            if rs is None:
                return False
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + br.read(r)
                break
            k += r
            if k > se:
                return False
            blk[k] = _extend(br.read(sz), sz) << al
            k += 1
        return True

    def ac_refine(ci, by, bx):
        tbl = huff_ac.get(sel[comps[ci]["id"]][1])
        if tbl is None:
            return False
        p1 = 1 << al
        m1 = -1 << al
        blk = coefs[ci][by, bx]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = br.huff(tbl)
                if rs is None:
                    return False
                r, sz = rs >> 4, rs & 0xF
                newval = 0
                if sz == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + br.read(r)
                        break
                    # ZRL: pass 16 zero-HISTORY positions
                else:
                    if sz != 1:
                        return False
                    newval = p1 if br.read(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.read(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            state["eobrun"] -= 1
        return True

    if ss == 0:
        fn = dc_first if ah == 0 else dc_refine
    else:
        if len(idxs) != 1:
            return None  # AC scans are single-component (G.1.1.1.1)
        fn = ac_first if ah == 0 else ac_refine

    count = 0

    def unit_done():
        nonlocal count
        count += 1
        if restart_interval and count % restart_interval == 0:
            br.restart()
            state["eobrun"] = 0
            for k_ in pred:
                pred[k_] = 0

    ok = True
    if len(idxs) == 1:
        ci = idxs[0]
        c = comps[ci]
        # non-interleaved: the component's own (unpadded) block grid
        bw = (-(-(w * c["h"]) // hmax) + 7) // 8
        bh = (-(-(h * c["v"]) // vmax) + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                if not fn(ci, by, bx):
                    ok = False
                    break
                unit_done()
            if not ok:
                break
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in idxs:
                    c = comps[ci]
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            if not fn(ci, my * c["v"] + byy,
                                      mx * c["h"] + bxx):
                                ok = False
                                break
                        if not ok:
                            break
                    if not ok:
                        break
                if not ok:
                    break
                unit_done()
            if not ok:
                break
    if not ok:
        return None
    j = br.i
    while j + 1 < len(raw) and raw[j] != 0xFF:
        j += 1
    return j


def _prog_reconstruct(frame, coefs, qt, np, A):
    """Dequantize + de-zigzag + IDCT every accumulated block, then the
    shared level-shift/upsample/color tail."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    zig = np.array(_ZIGZAG)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = np.array(qt[c["tq"]], dtype=np.float64).reshape(8, 8)
        bh, bw = coefs[ci].shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64, dtype=np.float64)
                blk[zig] = coefs[ci][by, bx]
                spatial = A.T @ (blk.reshape(8, 8) * q) @ A
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = spatial
        planes.append(plane)
    return _finish(planes, comps, w, h, hmax, vmax, np)


def _decode_block(br, hdc, hac, pred, ci, np):
    t = br.huff(hdc)
    if t is None or t > 15:
        return None
    diff = _extend(br.read(t), t)
    pred[ci] += diff
    blk = np.zeros((8, 8), dtype=np.float64)
    blk[0, 0] = pred[ci]
    k = 1
    while k < 64:
        rs = br.huff(hac)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:   # ZRL: skip 16 zeros
                k += 16
                continue
            break         # EOB
        k += r
        if k > 63:
            return None
        idx = _ZIGZAG[k]
        blk[idx // 8, idx % 8] = _extend(br.read(s), s)
        k += 1
    return blk


def jpeg_pixel_stats_input(raw: bytes):
    """(w, h, ch, ndarray) or None — the decode entry used by
    multimodal.image_pixels dispatch."""
    try:
        return _jpeg_pixels(raw)
    except (IndexError, ValueError, MemoryError):
        return None
