"""Baseline JPEG (ITU-T T.81) codec, from scratch in pure numpy.

Fills the compressed-image slot of the multimodal decode stage
(``operators/multimodal.py``): round 2 declared JPEG a PIL plug-in
slot; this module makes baseline sequential JPEG decode native so a
compressed payload column runs end-to-end with zero codec libraries.
The reference stores post media as compressed web formats
(media/MediaManager.java — download + thumbnail of remote post media),
so a faithful training-data pipeline must ingest compressed images,
not just raw bitmaps.

Decoder scope (``decode_jpeg``): baseline sequential DCT (SOF0/1)
AND progressive DCT (SOF2, T.81 Annex G: spectral selection +
successive approximation, DC/AC first and refinement scans, EOB
runs, correction bits), 8-bit, 1- or 3-component, arbitrary DQT/DHT
tables (8- or 16-bit quant), any sampling factors (4:4:4 / 4:2:2 /
4:2:0 …), restart intervals, APPn/COM skip, 0xFF00 byte stuffing.
Arithmetic coding and 12-bit precision raise ``NotImplementedError``
— those remain the declared library slots.

Encoder scope (``encode_jpeg`` / ``encode_jpeg_progressive``): the
test/synthesis path — baseline or progressive (any valid scan
script; the default is the libjpeg-shaped spectral-selection +
successive-approximation script), 3-component YCbCr, 4:4:4 or
4:2:0, optional restart intervals, per-image canonical Huffman
tables (uniform code length over the symbols actually emitted —
valid per T.81 since tables travel in DHT; no Annex K dependence).
It exists so tests can round-trip the decoder without any external
codec, and doubles as the deterministic compressed-payload
synthesizer for the multimodal column.  Both encoders quantize the
same coefficients, so progressive and baseline encodings of one
image decode to bit-identical pixels — the tests' oracle.

Everything here derives from the public T.81 spec text (marker
layout, zigzag, EXTEND, canonical Huffman from BITS/HUFFVAL) — no
library code consulted.
"""

from __future__ import annotations

import array
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

# LUT cache keyed by the DHT payload (counts, symbols): real-world
# JPEGs overwhelmingly ship the Annex K default tables, so across a
# crawl the build cost amortizes to ~zero per image.
_LUT_CACHE: dict[tuple, tuple] = {}
_LUT_CACHE_MAX = 64


def _huffman_lut(counts: list[int], symbols: list[int]) -> tuple:
    """16-bit-peek decode LUTs replacing the per-bit tree walk
    (T.81 F.2.2.3 DECODE / F.2.2.2 DECODE_AC vectorized ahead of
    time).  Returns (len_lut, sym_lut, kadv_lut, tot_lut, val_lut):

    * ``len_lut[peek]`` — code length in bits (0 = invalid prefix)
    * ``sym_lut[peek]`` — decoded symbol
    * AC fast path, valid when the code AND its SSSS value bits fit
      the same 16-bit window: ``kadv_lut[peek]`` is run+1 (the k
      advance; sentinels 255 = EOB, 254 = ZRL, 0 = fall back to
      two-step decode), ``tot_lut[peek]`` the total bits consumed,
      ``val_lut[peek]`` the already-EXTENDed coefficient value —
      one lookup resolves symbol, run and signed value together.

    Built vectorized over all 65536 windows from the canonical
    BITS/HUFFVAL spec (Annex C code assignment)."""
    key = (tuple(counts), tuple(symbols))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    len16 = np.zeros(65536, np.int64)
    sym16 = np.zeros(65536, np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            len16[base: base + span] = length
            sym16[base: base + span] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    peek = np.arange(65536, dtype=np.int64)
    s = sym16 & 15
    tot = len16 + s
    normal = (len16 > 0) & (s > 0) & (tot <= 16)
    tot_c = np.where(normal, tot, len16)
    v = (peek >> np.where(normal, 16 - tot, 0)) & ((1 << s) - 1)
    sm = np.maximum(s, 1)
    ext = np.where(v >= (1 << (sm - 1)), v, v - (1 << sm) + 1)
    kadv = np.where(normal, (sym16 >> 4) + 1, 0)
    kadv[(len16 > 0) & (sym16 == 0)] = 255          # EOB
    kadv[(len16 > 0) & (sym16 == 0xF0)] = 254       # ZRL
    vals = array.array("h")
    vals.frombytes(np.where(normal, ext, 0).astype(np.int16).tobytes())
    out = (len16.astype(np.uint8).tobytes(),
           sym16.astype(np.uint8).tobytes(),
           kadv.astype(np.uint8).tobytes(),
           tot_c.astype(np.uint8).tobytes(),
           vals)
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


def _category(v: int) -> int:
    """Bit category of a signed coefficient (SSSS)."""
    return int(abs(v)).bit_length()


# -------------------------------------------------------------- decode

def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded data beginning at ``start`` into
    de-stuffed segments split at RSTn markers; return (segments,
    offset of the terminating marker's 0xFF).  Vectorized: classify
    every 0xFF once, drop stuffing/restart bytes with one boolean
    mask, split at the restart positions."""
    arr = np.frombuffer(buf, np.uint8, len(buf) - start, start)
    ffs = np.flatnonzero(arr == 0xFF)
    ffs = ffs[ffs + 1 < len(arr)]          # trailing lone 0xFF: drop
    nxt = arr[ffs + 1]
    stuffed = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    term = np.flatnonzero(~stuffed & ~rst)
    if len(term):
        end = int(ffs[term[0]])
        keep_ff = ffs[:term[0]]
        stuffed, rst = stuffed[:term[0]], rst[:term[0]]
    else:
        # no terminating marker: consume to the end (a trailing lone
        # 0xFF, like the byte-loop it replaces, is left unread)
        end = len(arr) if not len(arr) or arr[-1] != 0xFF \
            else len(arr) - 1
        keep_ff = ffs
    drop = np.zeros(end, bool)
    drop[keep_ff[stuffed] + 1] = True      # the 0x00 of a stuffed FF
    rst_pos = keep_ff[rst]
    drop[rst_pos] = True                   # both marker bytes
    drop[rst_pos + 1] = True
    data = arr[:end][~drop]
    # split points in post-drop coordinates: bytes kept before each RST
    cuts = (np.searchsorted(np.flatnonzero(~drop), rst_pos)
            if len(rst_pos) else np.array([], np.int64))
    segs = [s.tobytes() for s in np.split(data, cuts)]
    return segs, start + end


class _SegReader:
    """MSB-first bit reader over de-stuffed entropy segments with
    restart-boundary resets and overrun detection — the progressive
    twin of the inline bit buffer in ``_decode_entropy`` (same 3-byte
    refill, same 16-byte over-read pad discipline)."""

    def __init__(self, segs: list[bytes]):
        self.blob = b"".join(segs) + b"\x00" * 16
        ends = []
        off = 0
        for s in segs:
            off += len(s)
            ends.append(off)
        self.seg_ends = ends
        self.seg = 0
        self.pos = 0
        self.cnt = 0
        self.buf = 0

    def _refill(self):
        b, p = self.blob, self.pos
        self.buf = (((self.buf & ((1 << self.cnt) - 1)) << 24)
                    | (b[p] << 16) | (b[p + 1] << 8) | b[p + 2])
        self.pos = p + 3
        self.cnt += 24

    def decode(self, lut) -> int:
        """One Huffman symbol via the 16-bit-peek len/sym LUTs."""
        if self.cnt < 16:
            self._refill()
        peek = (self.buf >> (self.cnt - 16)) & 0xFFFF
        ln = lut[0][peek]
        if ln == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.cnt -= ln
        return lut[1][peek]

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.cnt < n:
            self._refill()
        self.cnt -= n
        return (self.buf >> self.cnt) & ((1 << n) - 1)

    def receive_bits(self, n: int) -> np.ndarray:
        """``n`` individual bits in stream order as a uint8 array —
        the batch form of ``receive(1)`` for AC-refinement correction
        bits (same bits, same order, one refill per 16)."""
        out = np.empty(n, np.uint8)
        i = 0
        while i < n:
            c = min(16, n - i)
            v = self.receive(c)
            out[i:i + c] = (v >> np.arange(c - 1, -1, -1)) & 1
            i += c
        return out

    @staticmethod
    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def next_segment(self):
        """Cross an RSTn boundary: verify the finished segment was not
        overrun, restart bit buffering at the next one."""
        if (self.pos << 3) - self.cnt > (self.seg_ends[self.seg] << 3):
            raise EOFError("entropy segment exhausted")
        self.seg += 1
        if self.seg >= len(self.seg_ends):
            raise EOFError("missing restart segment")
        self.pos = self.seg_ends[self.seg - 1]
        self.cnt = 0
        self.buf = 0

    def finish(self):
        if (self.pos << 3) - self.cnt > (self.seg_ends[self.seg] << 3):
            raise EOFError("entropy segment exhausted")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive JPEG to (h, w, 3)
    uint8 RGB (grayscale replicated across channels).  Pure numpy +
    python; raises NotImplementedError on arithmetic/12-bit streams
    (the declared library slots)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}   # (cls,id) -> _huffman_lut 5-tuple
    restart_interval = 0
    frame = None
    prog_coefs = None
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
                htables[(tc, th)] = _huffman_lut(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:               # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/extended/arithmetic JPEG — plug a library "
                "decoder in here (baseline SOF0/SOF1 and progressive "
                "SOF2 decode natively)")
        elif marker == 0xDA:               # SOS → entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 15))
            if frame.get("progressive"):
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if prog_coefs is None:
                    prog_coefs = _alloc_prog_coefs(frame)
                segs, i = _split_entropy(buf, i)
                _decode_prog_scan(frame, scan, ss, se,
                                  ahal >> 4, ahal & 15, htables,
                                  restart_interval, segs, prog_coefs)
                continue
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
    if prog_coefs is not None:
        return _reconstruct_progressive(frame, prog_coefs, qtables)
    raise ValueError("no SOS marker found")


def _decode_entropy(segs, tmpl_tabs, n_mcus, ri):
    """Phase 1: the bit-serial Huffman pass — the only part of the
    decoder that cannot vectorize (every symbol's position depends on
    the previous symbol's length).  Cost per coefficient is one
    Python-int peek + one combined-LUT lookup: ``kadv/tot/val`` LUTs
    resolve (run, bits consumed, EXTENDed value) together whenever
    code+value fit the 16-bit window (they almost always do); the
    two-step fall-back handles the rest.  Returns (dc_diffs, ac_blk,
    ac_k, ac_val) as plain Python lists (block and k packed as
    blk << 6 | k so phase 2 converts ONE list per channel)."""
    # 16 pad bytes: refills read up to 3 bytes ahead of consumption
    # whenever fewer than 32 bits are buffered, so a valid stream can
    # over-READ (never over-consume) past its last real byte
    blob = b"".join(segs) + b"\x00" * 16
    seg_ends = []
    off = 0
    for s in segs:
        off += len(s)
        seg_ends.append(off)
    dc_diffs = []
    ac_bk, ac_val = [], []        # (blk << 6 | k) packed, value
    dda = dc_diffs.append
    abk, ava = ac_bk.append, ac_val.append
    pos = 0          # next unread byte in blob
    cnt = 0          # bits buffered in buf
    buf = 0
    seg = 0
    blk6 = 0         # current block index << 6
    try:
        for m in range(n_mcus):
            if ri and m and m % ri == 0:
                # segment boundary: verify the finished segment was not
                # overrun, then restart the bit buffer at the next one
                if (pos << 3) - cnt > (seg_ends[seg] << 3):
                    raise EOFError("entropy segment exhausted")
                seg += 1
                if seg >= len(segs):
                    raise EOFError("missing restart segment")
                pos = seg_ends[seg - 1]
                cnt = 0
                buf = 0
            for dlen, dsym, alen, asym, akadv, atot, aval in tmpl_tabs:
                # ---- DC: code via LUT, value bits received inline
                if cnt < 16:
                    buf = (((buf & ((1 << cnt) - 1)) << 24)
                           | (blob[pos] << 16) | (blob[pos + 1] << 8)
                           | blob[pos + 2])
                    pos += 3
                    cnt += 24
                peek = (buf >> (cnt - 16)) & 0xFFFF
                ln = dlen[peek]
                if ln == 0:
                    raise ValueError("invalid Huffman code in "
                                     "entropy stream")
                cnt -= ln
                s = dsym[peek]
                if s:
                    if cnt < s:
                        buf = (((buf & ((1 << cnt) - 1)) << 24)
                               | (blob[pos] << 16) | (blob[pos + 1] << 8)
                               | blob[pos + 2])
                        pos += 3
                        cnt += 24
                    cnt -= s
                    v = (buf >> cnt) & ((1 << s) - 1)
                    dda(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                else:
                    dda(0)
                # ---- AC: combined LUT fast path
                k = 1
                while k < 64:
                    if cnt < 32:
                        buf = (((buf & ((1 << cnt) - 1)) << 24)
                               | (blob[pos] << 16) | (blob[pos + 1] << 8)
                               | blob[pos + 2])
                        pos += 3
                        cnt += 24
                    peek = (buf >> (cnt - 16)) & 0xFFFF
                    ka = akadv[peek]
                    if ka == 255:              # EOB
                        cnt -= atot[peek]
                        break
                    if 0 < ka < 254:           # coefficient, inline value
                        cnt -= atot[peek]
                        k += ka
                        if k > 64:
                            raise ValueError("AC run past block end")
                        abk(blk6 | (k - 1))
                        ava(aval[peek])
                        continue
                    if ka == 254:              # ZRL
                        cnt -= atot[peek]
                        k += 16
                        continue
                    # two-step fall-back: a code whose value bits
                    # spill past the 16-bit window
                    ln = alen[peek]
                    if ln == 0:
                        raise ValueError("invalid Huffman code in "
                                         "entropy stream")
                    cnt -= ln
                    rs = asym[peek]
                    s = rs & 15
                    if s == 0:
                        if rs == 0xF0:
                            k += 16
                            continue
                        break              # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past block end")
                    if cnt < s:
                        buf = (((buf & ((1 << cnt) - 1)) << 24)
                               | (blob[pos] << 16) | (blob[pos + 1] << 8)
                               | blob[pos + 2])
                        pos += 3
                        cnt += 24
                    cnt -= s
                    v = (buf >> cnt) & ((1 << s) - 1)
                    abk(blk6 | k)
                    ava(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                    k += 1
                blk6 += 64
    except IndexError:
        raise EOFError("entropy segment exhausted") from None
    if (pos << 3) - cnt > (seg_ends[seg] << 3):
        raise EOFError("entropy segment exhausted")
    return dc_diffs, ac_bk, ac_val


def _decode_scan(frame, scan, qtables, htables, ri, segs) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # interleaved per-MCU block template (T.81 A.2.3 ordering)
    tmpl = [(si, by, bx)
            for si, (comp, _, _) in enumerate(scan)
            for by in range(comp["v"]) for bx in range(comp["h"])]
    B = len(tmpl)
    nblk = n_mcus * B
    tmpl_tabs = []
    for si, by, bx in tmpl:
        comp, td, ta = scan[si]
        dc = htables[(0, td)]
        ac = htables[(1, ta)]
        tmpl_tabs.append((dc[0], dc[1], ac[0], ac[1],
                          ac[2], ac[3], ac[4]))

    dc_diffs, ac_bk, ac_val = _decode_entropy(
        segs, tmpl_tabs, n_mcus, ri)

    # ---- phase 2: everything below is whole-image vectorized numpy
    comp_seq = np.tile(np.array([si for si, _, _ in tmpl], np.int64),
                       n_mcus)
    # DC: per-component prefix sums of the diffs, reset per restart
    # segment (T.81 F.2.1.3.1 PRED)
    diffs = np.asarray(dc_diffs, np.int64)
    seg_of_blk = ((np.arange(nblk, dtype=np.int64) // B) // ri
                  if ri else np.zeros(nblk, np.int64))
    dc_abs = np.empty(nblk, np.int64)
    for si in range(len(scan)):
        mask = comp_seq == si
        d = diffs[mask]
        cs = np.cumsum(d)
        sg = seg_of_blk[mask]
        starts = np.flatnonzero(np.diff(sg)) + 1
        firsts = np.r_[0, starts]
        segix = np.searchsorted(firsts, np.arange(len(d)),
                                side="right") - 1
        subs = np.r_[0, cs[starts - 1]][segix]
        dc_abs[mask] = cs - subs

    coefs = np.zeros((nblk, 64), np.int64)
    if ac_bk:
        bk = np.asarray(ac_bk, np.int64)
        coefs[bk >> 6, bk & 63] = np.asarray(ac_val, np.int64)
    coefs[:, 0] = dc_abs

    # dequantize (tables are zigzag-ordered as parsed from DQT),
    # de-zigzag, then ONE batched IDCT over every block
    q_zz = np.stack([qtables[comp["tq"]] for comp, _, _ in scan])
    deq = coefs * q_zz[comp_seq]
    blocks = np.zeros((nblk, 64))
    blocks[:, ZIGZAG] = deq
    pix = np.einsum("ux,nuv,vy->nxy", _A, blocks.reshape(nblk, 8, 8),
                    _A, optimize=True) + 128.0

    # scatter blocks into component planes (vectorized placement)
    mcu_of = np.arange(nblk, dtype=np.int64) // B
    my, mx = mcu_of // mcus_x, mcu_of % mcus_x
    tby = np.tile(np.array([by for _, by, _ in tmpl], np.int64), n_mcus)
    tbx = np.tile(np.array([bx for _, _, bx in tmpl], np.int64), n_mcus)
    planes = {}
    for si, (comp, _, _) in enumerate(scan):
        mask = comp_seq == si
        nby, nbx = mcus_y * comp["v"], mcus_x * comp["h"]
        brow = my[mask] * comp["v"] + tby[mask]
        bcol = mx[mask] * comp["h"] + tbx[mask]
        pb = np.empty((nby * nbx, 8, 8))
        pb[brow * nbx + bcol] = pix[mask]
        planes[comp["id"]] = (pb.reshape(nby, nbx, 8, 8)
                              .transpose(0, 2, 1, 3)
                              .reshape(nby * 8, nbx * 8))
    # upsample each component to full MCU-grid resolution, crop, convert
    full = []
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        if vmax != comp["v"]:
            p = np.repeat(p, vmax // comp["v"], axis=0)
        if hmax != comp["h"]:
            p = np.repeat(p, hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    return _to_rgb(full)


def _to_rgb(full: list[np.ndarray]) -> np.ndarray:
    """Color-convert decoded component planes (1 = grayscale, 3 =
    YCbCr BT.601) to (h, w, 3) uint8 RGB — shared by the baseline and
    progressive reconstruction paths."""
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive decode

def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y) of a frame (T.81 A.1.1)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _noninterleaved_grid(frame, comp):
    """Block-grid dims of a component in a non-interleaved scan
    (T.81 A.2.2: ceil of the component's own downsampled pixel dims,
    NOT the padded interleaved MCU grid)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    chh = -(-frame["h"] * comp["v"] // vmax)
    return -(-chh // 8), -(-cw // 8)


def _alloc_prog_coefs(frame) -> dict[int, np.ndarray]:
    """Per-component coefficient accumulators sized to the interleaved
    MCU grid (always >= the non-interleaved grid; pad blocks stay zero
    and crop away), zigzag order, accumulated across scans."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    return {c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                              np.int64)
            for c in frame["comps"]}


def _refine_ac_block(rdr, blk, ss, se, al, ac_lut, eobrun) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / Figure G.7): new ±1<<Al coefficients interleaved with
    correction bits for every already-nonzero coefficient passed."""
    p1, m1 = 1 << al, -(1 << al)
    # One bulk numpy->list conversion per block: the walk below touches
    # up to 63 coefficients per Huffman symbol, and per-element numpy
    # scalar indexing is ~10x a Python list access (this function is
    # the progressive decoder's hot loop — 65% of decode time before
    # this change).  Mutations write back vectorized at the end.
    vals = blk.tolist()
    dirty = False
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode(ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:            # EOBn: run of all-done blocks
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.receive(r)
                    break
                val = 0                # ZRL: 16 zero-history skips
            else:
                if s != 1:
                    raise ValueError("refinement scan size != 1")
                val = p1 if rdr.receive(1) else m1
            # advance r zero-history positions, appending one
            # correction bit per nonzero-history coefficient passed
            while k <= se:
                c = vals[k]
                if c:
                    if rdr.receive(1) and (abs(c) & p1) == 0:
                        vals[k] = c + (p1 if c > 0 else m1)
                        dirty = True
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                vals[k] = val
                dirty = True
            k += 1
    if eobrun:
        # block inside an EOB run: only correction bits remain
        while k <= se:
            c = vals[k]
            if c and rdr.receive(1) and (abs(c) & p1) == 0:
                vals[k] = c + (p1 if c > 0 else m1)
                dirty = True
            k += 1
        eobrun -= 1
    if dirty:
        blk[:] = vals
    return eobrun


def _decode_prog_scan(frame, scan, ss, se, ah, al, htables, ri, segs,
                      coefs):
    """Decode one progressive scan into the per-component coefficient
    accumulators.  Four regimes per T.81 Annex G: DC first (Ss=0,
    Ah=0, interleaved MCU order when ns>1), DC refine (one bit/block),
    AC first (non-interleaved, EOB-run coded), AC refine
    (correction-bit algorithm above).  Restart markers reset the bit
    buffer, DC predictors and the EOB run."""
    rdr = _SegReader(segs)
    _, _, mcus_x, mcus_y = _frame_geometry(frame)
    try:
        if ss == 0:                    # ---- DC scan
            if se != 0:
                raise ValueError("DC scan must have Se == 0")
            preds = {c["id"]: 0 for c, _, _ in scan}
            dc_luts = {c["id"]: (htables[(0, td)] if ah == 0 else None)
                       for c, td, _ in scan}
            if len(scan) > 1:          # interleaved MCU order
                units = mcus_y * mcus_x

                def blocks_of(u):
                    my, mx = divmod(u, mcus_x)
                    for comp, _, _ in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                yield (comp["id"], my * comp["v"] + by,
                                       mx * comp["h"] + bx)
            else:                      # single component: one block/MCU
                comp0 = scan[0][0]
                bh, bwd = _noninterleaved_grid(frame, comp0)
                units = bh * bwd

                def blocks_of(u):
                    yield comp0["id"], u // bwd, u % bwd

            for u in range(units):
                if ri and u and u % ri == 0:
                    rdr.next_segment()
                    preds = {k: 0 for k in preds}
                for cid, by, bx in blocks_of(u):
                    blk = coefs[cid]
                    if ah == 0:
                        s = rdr.decode(dc_luts[cid])
                        diff = rdr.extend(rdr.receive(s), s) if s else 0
                        preds[cid] += diff
                        blk[by, bx, 0] = preds[cid] << al
                    elif rdr.receive(1):
                        blk[by, bx, 0] = int(blk[by, bx, 0]) | (1 << al)
        else:                          # ---- AC scan (non-interleaved)
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be "
                                 "non-interleaved")
            comp0, _, ta = scan[0]
            ac_lut = htables[(1, ta)]
            bh, bwd = _noninterleaved_grid(frame, comp0)
            arr = coefs[comp0["id"]]
            eobrun = 0
            for u in range(bh * bwd):
                if ri and u and u % ri == 0:
                    rdr.next_segment()
                    eobrun = 0
                blk = arr[u // bwd, u % bwd]
                if ah:
                    eobrun = _refine_ac_block(rdr, blk, ss, se, al,
                                              ac_lut, eobrun)
                    continue
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = rdr.decode(ac_lut)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rdr.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[k] = rdr.extend(rdr.receive(s), s) << al
                    k += 1
    except IndexError:
        raise EOFError("entropy segment exhausted") from None
    rdr.finish()


def _reconstruct_progressive(frame, coefs, qtables) -> np.ndarray:
    """Final IDCT + plane assembly once every scan has been folded
    into the coefficient accumulators — whole-image vectorized, same
    einsum/upsample/color path as the baseline decoder."""
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    full = []
    for comp in frame["comps"]:
        arr = coefs[comp["id"]]
        nby, nbx = arr.shape[:2]
        deq = arr.reshape(-1, 64) * qtables[comp["tq"]]
        blocks = np.zeros((nby * nbx, 64))
        blocks[:, ZIGZAG] = deq
        pix = np.einsum("ux,nuv,vy->nxy", _A,
                        blocks.reshape(-1, 8, 8), _A,
                        optimize=True) + 128.0
        p = (pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
             .reshape(nby * 8, nbx * 8))
        if vmax != comp["v"]:
            p = np.repeat(p, vmax // comp["v"], axis=0)
        if hmax != comp["h"]:
            p = np.repeat(p, hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    return _to_rgb(full)


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


def _prep_components(pixels: np.ndarray, quality: int,
                     subsampling: str):
    """RGB → padded YCbCr planes → quantized zigzag coefficients:
    the shared front half of the baseline and progressive encoders
    (identical coefficients ⇒ bit-identical decoded pixels)."""
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
    return h, w, qlum, qchr, comps, coefs, mcus_x, mcus_y, blocks_x


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JPEG.  ``subsampling``
    is '444' or '420'; ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (exercises the decoder's restart path)."""
    (h, w, qlum, qchr, comps, coefs,
     mcus_x, mcus_y, blocks_x) = _prep_components(
         pixels, quality, subsampling)

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


# -------------------------------------------------- progressive encode

# libjpeg-shaped default scan script: (component indices, Ss, Se, Ah,
# Al).  Exercises every progressive regime the decoder implements —
# interleaved DC first, spectral-selection AC bands at two precisions,
# AC successive-approximation refinement, DC refinement.
DEFAULT_PROGRESSIVE_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
)

# spectral-selection-only script (no successive approximation):
# progressive organization with first-scan semantics throughout
SPECTRAL_ONLY_SCANS = (
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 63, 0, 0),
    ((1,), 1, 63, 0, 0),
    ((2,), 1, 63, 0, 0),
)


class _ScanStats:
    """Pass-1 emitter: records which Huffman symbols a scan will emit
    (the table-building statistics pass)."""

    def __init__(self):
        self.used: set[int] = set()

    def sym(self, s: int):
        self.used.add(s)

    def bits(self, v: int, n: int):
        pass

    def restart(self, n: int):
        pass


class _ScanWriter:
    """Pass-2 emitter: writes the entropy-coded bytes, byte-aligning
    and inserting RSTn at restart boundaries."""

    def __init__(self, out: bytearray, enc: dict):
        self.out = out
        self.enc = enc
        self.bw = _BitWriter()

    def sym(self, s: int):
        code, ln = self.enc[s]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int):
        if n:
            self.bw.write(v, n)

    def restart(self, n: int):
        self.bw.flush()
        self.out.extend(self.bw.out)
        self.bw = _BitWriter()
        self.out.extend(bytes([0xFF, 0xD0 + (n % 8)]))

    def finish(self):
        self.bw.flush()
        self.out.extend(self.bw.out)


def _enc_dc_scan(em, segments, al: int, refine: bool):
    """DC scan entropy (T.81 G.1.2.1): first pass codes point-
    transformed diffs (arithmetic shift), refinement sends bit Al of
    each block's DC verbatim.  Predictors reset per restart segment."""
    for si, seg_units in enumerate(segments):
        if si:
            em.restart(si - 1)
        preds: dict[int, int] = {}
        for ci, zz in seg_units:
            v = int(zz[0]) >> al
            if refine:
                em.bits(v & 1, 1)
                continue
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            s = _category(diff)
            em.sym(s)
            if s:
                em.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_ac_first(em, segments, ss: int, se: int, al: int):
    """AC first-scan entropy (T.81 G.1.2.2): sign-magnitude point
    transform, zero runs, ZRL, and cross-block EOB runs (EOBn)."""
    for si, seg_units in enumerate(segments):
        if si:
            em.restart(si - 1)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                em.sym(r << 4)
                em.bits(eobrun - (1 << r), r)
                eobrun = 0

        for zz in seg_units:
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    em.sym(0xF0)
                    run -= 16
                s = t.bit_length()
                em.sym((run << 4) | s)
                em.bits(t if v > 0 else (1 << s) - 1 - t, s)
                run = 0
            if run:                    # trailing zeros → EOB this block
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()


def _enc_ac_refine(em, segments, ss: int, se: int, al: int):
    """AC refinement entropy (T.81 G.1.2.3): newly-nonzero
    coefficients code as (run<<4)|1 + sign bit; already-nonzero
    coefficients buffer one correction bit each.  Two buffers, as in
    the decoder's read order: ``be`` holds bits owned by the pending
    EOB run (read right after the EOBn symbol, block by block) and
    ``br`` holds the current block's bits since its last symbol
    (read after the NEXT run/ZRL symbol's payload).  Mixing them
    desyncs the decoder whenever an EOB run breaks mid-block."""
    for si, seg_units in enumerate(segments):
        if si:
            em.restart(si - 1)
        eobrun = 0
        be: list[int] = []             # bits of EOB-run-covered blocks
        br: list[int] = []             # current block, since last symbol

        def emit_br():
            for b in br:
                em.bits(b, 1)
            del br[:]

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                em.sym(r << 4)
                em.bits(eobrun - (1 << r), r)
                eobrun = 0
                for b in be:
                    em.bits(b, 1)
                del be[:]

        for zz in seg_units:
            band = [int(zz[k]) for k in range(ss, se + 1)]
            absv = [abs(v) >> al for v in band]
            eobpos = -1
            for j in range(len(absv) - 1, -1, -1):
                if absv[j] == 1:
                    eobpos = j
                    break
            r = 0
            for j, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                # ZRLs not foldable into the EOB must flush first
                while r > 15 and j <= eobpos:
                    flush_eob()
                    em.sym(0xF0)
                    r -= 16
                    emit_br()
                if t > 1:              # history coefficient: 1 bit
                    br.append(t & 1)
                    continue
                flush_eob()
                em.sym((r << 4) | 1)
                r = 0
                em.bits(1 if band[j] > 0 else 0, 1)
                emit_br()
            if r > 0 or br:
                eobrun += 1
                be.extend(br)          # bits now belong to the run
                del br[:]
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsampling: str = "444",
                            scans=DEFAULT_PROGRESSIVE_SCANS,
                            restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as progressive JPEG (SOF2) with the
    given scan script — tuples of (component indices, Ss, Se, Ah,
    Al).  Same coefficients as :func:`encode_jpeg` at equal quality/
    subsampling, so both decode to bit-identical pixels.  Each scan
    redefines Huffman table 0 of its class from that scan's own
    symbol statistics; restart_interval > 0 emits DRI + RSTn every
    that many MCUs (interleaved DC scans) / blocks (all others)."""
    (h, w, qlum, qchr, comps, coefs,
     mcus_x, mcus_y, blocks_x) = _prep_components(
         pixels, quality, subsampling)

    def dc_units(comp_ids):
        """Interleaved MCU units (lists of (ci, zz)) or single-block
        units for a one-component DC scan."""
        if len(comp_ids) > 1:
            units = []
            for m in range(mcus_y * mcus_x):
                my, mx = divmod(m, mcus_x)
                blks = []
                for ci in comp_ids:
                    _, ch, cv, _, _ = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            bi = ((my * cv + by) * blocks_x[ci]
                                  + mx * ch + bx)
                            blks.append((ci, coefs[ci][bi]))
                units.append(blks)
            return units
        return [[u] for u in ac_units(comp_ids[0], with_ci=True)]

    def ac_units(ci, with_ci=False):
        """Non-interleaved block units over the component's TRUE
        ceil-dim grid (pad blocks of the padded plane are skipped —
        they never appear in a non-interleaved scan)."""
        _, ch, cv, _, _ = comps[ci]
        hmax = comps[0][1]             # luma carries the max factors
        vmax = comps[0][2]
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        tw, th = -(-cw // 8), -(-chh // 8)
        out = []
        for u in range(th * tw):
            bi = (u // tw) * blocks_x[ci] + u % tw
            out.append((ci, coefs[ci][bi]) if with_ci else coefs[ci][bi])
        return out

    def segmented(units):
        if not restart_interval:
            return [units]
        return [units[p: p + restart_interval]
                for p in range(0, len(units), restart_interval)]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    seg(0xDB, bytes([0x01]) + bytes(qchr[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (_, ch, cv, tq, _) in enumerate(comps):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, tq)
    seg(0xC2, sof)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    for comp_ids, ss, se, ah, al in scans:
        if ss == 0:
            units = dc_units(comp_ids)
            segments = [[b for unit in chunk for b in unit]
                        for chunk in segmented(units)]
            refine = ah > 0
            enc: dict = {}
            if not refine:
                st = _ScanStats()
                _enc_dc_scan(st, segments, al, False)
                counts, symbols, enc = _uniform_huffman(st.used)
                seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
            sos = bytes([len(comp_ids)])
            for ci in comp_ids:
                sos += struct.pack(">BB", ci + 1, 0x00)
            sos += bytes([ss, se, (ah << 4) | al])
            seg(0xDA, sos)
            wr = _ScanWriter(out, enc)
            _enc_dc_scan(wr, segments, al, refine)
            wr.finish()
        else:
            if len(comp_ids) != 1:
                raise ValueError("progressive AC scan must cover "
                                 "exactly one component")
            ci = comp_ids[0]
            segments = segmented(ac_units(ci))
            fn = _enc_ac_refine if ah else _enc_ac_first
            st = _ScanStats()
            fn(st, segments, ss, se, al)
            counts, symbols, enc = _uniform_huffman(st.used)
            seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(symbols))
            sos = bytes([1]) + struct.pack(">BB", ci + 1, 0x00) \
                + bytes([ss, se, (ah << 4) | al])
            seg(0xDA, sos)
            wr = _ScanWriter(out, enc)
            fn(wr, segments, ss, se, al)
            wr.finish()

    out.extend(b"\xff\xd9")
    return bytes(out)
