"""Baseline JPEG (ITU-T T.81) codec, from scratch in pure numpy.

Fills the compressed-image slot of the multimodal decode stage
(``operators/multimodal.py``): round 2 declared JPEG a PIL plug-in
slot; this module makes baseline sequential JPEG decode native so a
compressed payload column runs end-to-end with zero codec libraries.
The reference stores post media as compressed web formats
(media/MediaManager.java — download + thumbnail of remote post media),
so a faithful training-data pipeline must ingest compressed images,
not just raw bitmaps.

Decoder scope (``decode_jpeg``): baseline sequential DCT, 8-bit,
1- or 3-component, arbitrary DQT/DHT tables (8- or 16-bit quant),
any sampling factors (4:4:4 / 4:2:2 / 4:2:0 …), restart intervals,
APPn/COM skip, 0xFF00 byte stuffing.  Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ``NotImplementedError`` — those
remain the declared library slots.

Encoder scope (``encode_jpeg``): the test/synthesis path — baseline,
3-component YCbCr, 4:4:4 or 4:2:0, optional restart intervals,
per-image canonical Huffman tables (uniform code length over the
symbols actually emitted — valid per T.81 since tables travel in
DHT; no Annex K dependence).  It exists so tests can round-trip the
decoder without any external codec, and doubles as the deterministic
compressed-payload synthesizer for the multimodal column.

Everything here derives from the public T.81 spec text (marker
layout, zigzag, EXTEND, canonical Huffman from BITS/HUFFVAL) — no
library code consulted.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag index -> raster index within an 8x8 block (T.81 Figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16).
# Forward: F = A @ f @ A.T ; inverse: f = A.T @ F @ A.
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])

# A quality-50 luminance/chrominance quant pair (flat-ish, derived from
# the usual visually-weighted shape; any table is valid — it travels in
# DQT).  Scaled by the encoder's quality parameter.
QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QCHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public formula:
    q<50 → 5000/q, else 200-2q percent), clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255)


# ------------------------------------------------------------- bit I/O

class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    de-stuffed: 0xFF00 → 0xFF handled by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("entropy segment exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF → 0xFF 0x00)
    and 1-padding on flush."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


# -------------------------------------------------------- Huffman code

def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """BITS/HUFFVAL → {(length, code): symbol} (T.81 Annex C order)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s received bits to the signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    """Bit category of a signed coefficient (SSSS)."""
    return int(abs(v)).bit_length()


# -------------------------------------------------------------- decode

def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded data beginning at ``start`` into
    de-stuffed segments split at RSTn markers; return (segments,
    offset of the terminating marker's 0xFF)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:                      # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:            # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                              # real marker: scan ends
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (h, w, 3) uint8 RGB
    (grayscale replicated across channels).  Pure numpy + python;
    raises NotImplementedError on progressive/arithmetic/12-bit
    streams (the declared library slots)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("marker expected")
        # markers may be preceded by any number of 0xFF fill bytes
        # (T.81 B.1.1.2)
        while i + 4 <= len(buf) and buf[i + 1] == 0xFF:
            i += 1
        marker = buf[i + 1]
        if marker == 0xD9:                 # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        body = buf[i + 4: i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:                 # DQT (may hold several)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    t = np.frombuffer(body, np.uint8, 64, p) \
                        .astype(np.int64)
                    p += 64
                else:
                    t = np.frombuffer(body, ">u2", 64, p) \
                        .astype(np.int64)
                    p += 128
                qtables[tq] = t
        elif marker == 0xC4:               # DHT (may hold several)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = list(body[p + 1: p + 17])
                nsym = sum(counts)
                symbols = list(body[p + 17: p + 17 + nsym])
                htables[(tc, th)] = _canonical_codes(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:               # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG — plug a library "
                "decoder in here (baseline SOF0/SOF1 decodes natively)")
        elif marker == 0xDA:               # SOS → entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 15))
            # non-interleaved scans (ns < frame components, or a
            # single subsampled component) use per-component MCU
            # geometry (T.81 A.2: MCU = one data unit) that the
            # interleaved grid below would silently mis-decode
            if len(scan) != len(frame["comps"]) or (
                    len(scan) == 1
                    and (scan[0][0]["h"], scan[0][0]["v"]) != (1, 1)):
                raise NotImplementedError(
                    "multi-scan / non-interleaved baseline JPEG — "
                    "plug a library decoder in here (single fully-"
                    "interleaved scans decode natively)")
            segs, i = _split_entropy(buf, i)
            return _decode_scan(frame, scan, qtables, htables,
                                restart_interval, segs)
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qtables, htables, ri, segs) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8))
    dc_pred = {comp["id"]: 0 for comp, _, _ in scan}
    seg_idx = 0
    reader = _BitReader(segs[0])
    for mcu in range(mcus_x * mcus_y):
        if ri and mcu and mcu % ri == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            dc_pred = {k: 0 for k in dc_pred}
        my, mx = divmod(mcu, mcus_x)
        for comp, td, ta in scan:
            q = qtables[comp["tq"]]
            dct = htables[(0, td)]
            act = htables[(1, ta)]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64)
                    s = _decode_symbol(reader, dct)
                    dc_pred[comp["id"]] += _extend(reader.read_bits(s), s)
                    zz[0] = dc_pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(reader, act)
                        r, ssss = rs >> 4, rs & 15
                        if ssss == 0:
                            if r == 15:
                                k += 16
                                continue
                            break          # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(ssss), ssss)
                        k += 1
                    block = np.zeros(64)
                    block[ZIGZAG] = zz * q
                    pix = _A.T @ block.reshape(8, 8) @ _A + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample each component to full MCU-grid resolution, crop, convert
    full = []
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------------------- encode

def _uniform_huffman(used: set[int]) -> tuple[list[int], list[int], dict]:
    """A valid T.81 Huffman spec giving every used symbol the same
    canonical code length L (n_used < 2^L keeps the all-ones code
    unused, as the spec requires).  Returns (BITS, HUFFVAL, encode
    map symbol → (code, length))."""
    symbols = sorted(used) if used else [0]
    L = max(1, (len(symbols)).bit_length())  # 2^L > n_used
    counts = [0] * 16
    counts[L - 1] = len(symbols)
    enc = {s: (idx, L) for idx, s in enumerate(symbols)}
    return counts, symbols, enc


def _forward_blocks(plane: np.ndarray, q_raster: np.ndarray) -> np.ndarray:
    """Level-shift → 8×8 DCT → quantize (raster-order divisor) →
    zigzag for every block of a (H, W) plane with H, W multiples of 8.
    Returns (n_blocks, 64) int64 zigzag coefficients in raster block
    order."""
    hh, ww = plane.shape
    blocks = (plane.reshape(hh // 8, 8, ww // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    qz = np.round(coef.reshape(-1, 64) / q_raster).astype(np.int64)
    return qz[:, ZIGZAG]


def _pad_to(img: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = img.shape[:2]
    return np.pad(img, [(0, (-h) % my), (0, (-w) % mx)] +
                  [(0, 0)] * (img.ndim - 2), mode="edge")


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JPEG.  ``subsampling``
    is '444' or '420'; ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (exercises the decoder's restart path)."""
    if subsampling not in ("444", "420"):
        raise NotImplementedError("subsampling must be '444' or '420'")
    h, w = pixels.shape[:2]
    sub = 2 if subsampling == "420" else 1
    rgb = pixels.astype(np.float64)
    y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
         + 0.114 * rgb[..., 2])
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
        + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
        - 0.081312 * rgb[..., 2]
    mcu = 8 * sub
    y = _pad_to(y, mcu, mcu)
    cb = _pad_to(cb, mcu, mcu)
    cr = _pad_to(cr, mcu, mcu)
    if sub == 2:                           # 2×2 block-mean chroma
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
    qlum = _scale_qtable(QLUM, quality)
    qchr = _scale_qtable(QCHROMA, quality)
    comps = [  # (plane, h_samp, v_samp, qtable id, raster-order qtable)
        (y, sub, sub, 0, qlum),
        (cb, 1, 1, 1, qchr),
        (cr, 1, 1, 1, qchr)]
    coefs = [_forward_blocks(c[0], c[4]) for c in comps]
    mcus_x = y.shape[1] // mcu
    mcus_y = y.shape[0] // mcu
    blocks_x = [c[0].shape[1] // 8 for c in comps]

    def mcu_blocks():
        """Yield (comp_idx, zigzag_coeffs) in interleaved MCU order,
        with None sentinels at restart boundaries."""
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                yield None, m // restart_interval - 1
            my, mx = divmod(m, mcus_x)
            for ci, (_, ch, cv, _, _) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * blocks_x[ci] \
                            + (mx * ch + bx)
                        yield ci, coefs[ci][bi]

    # pass 1: symbol statistics (DC and AC classes; id 0 = luma,
    # id 1 = chroma — matching the two table slots we emit)
    used_dc = [set(), set()]
    used_ac = [set(), set()]
    dc_pred = [0, 0, 0]
    for item in mcu_blocks():
        ci, zz = item
        if ci is None:
            dc_pred = [0, 0, 0]
            continue
        tid = 0 if ci == 0 else 1
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        used_dc[tid].add(_category(diff))
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                used_ac[tid].add(0xF0)
                run -= 16
            used_ac[tid].add((run << 4) | _category(v))
            run = 0
        if run:
            used_ac[tid].add(0x00)
    for tid in (0, 1):
        used_ac[tid].add(0x00)             # EOB always encodable
    hdc = [_uniform_huffman(u) for u in used_dc]
    hac = [_uniform_huffman(u) for u in used_ac]

    # pass 2: emit
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    seg(0xDB, bytes([0x01]) + bytes(qchr[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (_, ch, cv, tq, _) in enumerate(comps):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, tq)
    seg(0xC0, sof)
    for tid in (0, 1):
        for tc, (counts, symbols, _) in ((0, hdc[tid]), (1, hac[tid])):
            seg(0xC4, bytes([(tc << 4) | tid]) + bytes(counts)
                + bytes(symbols))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        tid = 0 if ci == 0 else 1
        sos += struct.pack(">BB", ci + 1, (tid << 4) | tid)
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    dc_pred = [0, 0, 0]
    for item in mcu_blocks():
        ci, zz = item
        if ci is None:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + (zz % 8)]))
            dc_pred = [0, 0, 0]
            continue
        tid = 0 if ci == 0 else 1
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        s = _category(diff)
        code, ln = hdc[tid][2][s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = hac[tid][2][0xF0]
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = hac[tid][2][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = hac[tid][2][0x00]
            bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
