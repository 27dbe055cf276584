"""FLAC lossless audio codec, from scratch (RFC 9639 / the public
flac format spec).

Fills the LOSSLESS compressed-audio slot of the multimodal decode
stage the way ``png.py`` fills the lossless image slot: the reference
stores post media by MIME type (`media/MediaManager.java:1`,
`MediaOperations.java:1`), and an audio crawl is dominated by
FLAC/MP3 — FLAC is the one that decodes bit-exactly, so a compressed
audio payload column can be oracle-verified end-to-end (features of
decode(encode(x)) == features of x, exactly), with zero codec
libraries.  MP3/AAC stay the declared perceptual library slots.

Decoder scope (``decode_flac``): all four channel assignments
(independent, left/side, right/side, mid/side), CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32) subframes, wasted bits, Rice + Rice2 residual
partitions including escaped (raw) partitions, all block-size and
sample-rate header codes, UTF-8-coded frame/sample numbers, CRC-8
header and CRC-16 frame verification, 8/16/24/32-bit samples.

Performance shape: the stream is unpacked ONCE into a bit array +
one-positions index; Rice decoding then walks terminators over a
Python list (amortized O(total ones), the CPython floor) while
quotients, remainders (40-bit byte-window gather), zigzag, raw
partitions, VERBATIM blocks and fixed-predictor reconstruction
(m-fold seeded cumsum) are all whole-block numpy.  General LPC is a
per-sample recurrence by nature (each prediction needs the previous
reconstruction) and runs as a Python loop — our encoder emits FIXED
only, so LPC is the external-payload slow path, disclosed in
SCALE.md.  The transient bit array costs 8x the payload, fine for
payload-column blobs (MBs); a constant-memory streaming reader is
the obvious refactor if ever needed.

Encoder scope (``encode_flac``): the test/synthesis path — fixed
4096-sample blocks, per-subframe exact-size choice among CONSTANT /
VERBATIM / FIXED 0-4 (Rice partition order 0, escape when the
parameter range runs out), stereo decorrelation selectable
(independent / left-side / right-side / mid-side), 8/16/24-bit,
STREAMINFO with true MD5 of the unencoded samples.  Everything the
encoder writes, the decoder round-trips bit-identically — the tests'
oracle — and the MD5 gives an independent whole-stream check.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# ------------------------------------------------------------- CRCs
# CRC-8 poly x^8+x^2+x+1 (0x07), CRC-16 poly x^16+x^15+x^2+1
# (0x8005), both MSB-first, init 0 (spec section 9.1/9.2).


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    t = _CRC8
    for b in data:
        r = t[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    t = _CRC16
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ t[(r >> 8) ^ b]
    return r


# ------------------------------------------------------- bit reader

class _Bits:
    """Whole-stream bit reader: scalar reads off the raw bytes,
    block reads (Rice runs, raw sample blocks) off a one-time
    unpackbits + one-positions index + 40-bit byte windows."""

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.n = len(buf) * 8
        self.pos = pos_bits
        arr = np.frombuffer(buf, np.uint8)
        self.ones = np.flatnonzero(np.unpackbits(arr)).astype(np.int64)
        self.ones_l = self.ones.tolist()
        pad = np.concatenate([arr, np.zeros(8, np.uint8)]).astype(
            np.uint64)
        # 40-bit big-endian window starting at every byte: supports
        # field widths up to 33 bits at any bit offset (Rice k <= 30,
        # raw bps <= 32).
        self.win = ((pad[:-4] << np.uint64(32))
                    | (pad[1:-3] << np.uint64(24))
                    | (pad[2:-2] << np.uint64(16))
                    | (pad[3:-1] << np.uint64(8)) | pad[4:])

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        p, end = self.pos, self.pos + nbits
        if end > self.n:
            raise EOFError("flac bitstream exhausted")
        b0 = p >> 3
        width = ((end + 7) >> 3) - b0
        val = int.from_bytes(self.buf[b0:b0 + width], "big")
        self.pos = end
        return (val >> ((b0 + width) * 8 - end)) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        j = int(np.searchsorted(self.ones, self.pos))
        if j >= len(self.ones_l):
            raise EOFError("flac bitstream exhausted")
        t = self.ones_l[j]
        q = t - self.pos
        self.pos = t + 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def read_signed_block(self, n: int, nbits: int) -> np.ndarray:
        """n signed nbits-wide fields (nbits <= 32), vectorized via
        the 40-bit windows."""
        if n == 0 or nbits == 0:
            self.pos += n * nbits
            return np.zeros(n, np.int64)
        pos = self.pos + np.arange(n, dtype=np.int64) * nbits
        if int(pos[-1]) + nbits > self.n:
            raise EOFError("flac bitstream exhausted")
        sh = (40 - nbits - (pos & 7)).astype(np.uint64)
        v = ((self.win[pos >> 3] >> sh)
             & np.uint64((1 << nbits) - 1)).astype(np.int64)
        self.pos = int(pos[-1]) + nbits
        return v - ((v >> (nbits - 1)) << nbits)

    def read_rice_block(self, n: int, k: int) -> np.ndarray:
        """n Rice(k)-coded signed residuals: serial terminator walk
        over the ones list (amortized O(ones consumed)), everything
        else — quotients, remainder gather, zigzag — whole-block
        numpy."""
        if n == 0:
            return np.zeros(0, np.int64)
        ol = self.ones_l
        ln = len(ol)
        j = int(np.searchsorted(self.ones, self.pos))
        start = self.pos
        try:
            if k == 0:
                if j + n > ln:
                    raise EOFError("flac bitstream exhausted")
                t = self.ones[j:j + n]
                self.pos = int(t[-1]) + 1
            else:
                ts = []
                append = ts.append
                p = start
                for _ in range(n):
                    ti = ol[j]          # first one >= p (invariant)
                    append(ti)
                    p = ti + 1 + k
                    j += 1
                    while j < ln and ol[j] < p:
                        j += 1
                if p > self.n:
                    raise EOFError("flac bitstream exhausted")
                t = np.array(ts, np.int64)
                self.pos = p
        except IndexError:
            raise EOFError("flac bitstream exhausted") from None
        prev_end = np.empty(n, np.int64)
        prev_end[0] = start
        prev_end[1:] = t[:-1] + 1 + k
        u = (t - prev_end).astype(np.int64)
        if k:
            rpos = t + 1
            sh = (40 - k - (rpos & 7)).astype(np.uint64)
            rem = ((self.win[rpos >> 3] >> sh)
                   & np.uint64((1 << k) - 1)).astype(np.int64)
            u = (u << k) | rem
        return (u >> 1) ^ -(u & 1)


# -------------------------------------------------- decoder helpers

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_FIXED = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_num(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_ext = 0
    probe = b0
    while probe & 0x40:
        n_ext += 1
        probe <<= 1
    if n_ext == 0 or n_ext > 6:
        raise ValueError("invalid UTF-8-coded frame number")
    val = b0 & (0x7F >> n_ext)
    for _ in range(n_ext):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded frame number")
        val = (val << 6) | (b & 0x3F)
    return val


def _restore_fixed(order: int, warmup: np.ndarray,
                   residual: np.ndarray) -> np.ndarray:
    """Fixed-predictor reconstruction: residual[i] = backward
    difference of order m at i, so restoration is m seeded cumsums
    (whole-block numpy), seeds = the backward-difference pyramid of
    the warmup evaluated at its last sample."""
    n = order + len(residual)
    out = np.empty(n, np.int64)
    out[:order] = warmup
    cur = residual.astype(np.int64)
    for level in range(order, 0, -1):
        seed = int(np.diff(warmup, level - 1)[-1]) if level > 1 \
            else int(warmup[-1])
        cur = seed + np.cumsum(cur)
    out[order:] = cur if order else residual
    return out


def _restore_lpc(warmup: np.ndarray, coefs: list[int], shift: int,
                 residual: np.ndarray) -> np.ndarray:
    """General LPC reconstruction — a true per-sample recurrence
    (each prediction consumes the previous output), Python loop; the
    disclosed external-payload slow path."""
    order = len(coefs)
    out = warmup.astype(np.int64).tolist()
    append = out.append
    rev = coefs[::-1]
    for r in residual.tolist():
        hist = out[-order:]
        pred = sum(c * h for c, h in zip(rev, hist)) >> shift
        append(r + pred)
    return np.array(out, np.int64)


def _read_residual(bits: _Bits, blocksize: int, order: int) \
        -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("block size not divisible by partitions")
    out = []
    for pi in range(nparts):
        cnt = blocksize >> porder
        if pi == 0:
            cnt -= order
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            out.append(bits.read_signed_block(cnt, raw))
        else:
            out.append(bits.read_rice_block(cnt, param))
    return np.concatenate(out) if len(out) > 1 else out[0]


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("subframe header padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:                                # CONSTANT
        out = np.full(blocksize, bits.read_signed(bps), np.int64)
    elif stype == 1:                              # VERBATIM
        out = bits.read_signed_block(blocksize, bps)
    elif 8 <= stype <= 12:                        # FIXED order 0-4
        order = stype - 8
        warmup = bits.read_signed_block(order, bps)
        residual = _read_residual(bits, blocksize, order)
        out = _restore_fixed(order, warmup, residual)
    elif stype >= 32:                             # LPC order 1-32
        order = (stype & 31) + 1
        warmup = bits.read_signed_block(order, bps)
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        residual = _read_residual(bits, blocksize, order)
        out = _restore_lpc(warmup, coefs, shift, residual)
    else:
        raise ValueError("reserved subframe type")
    return out << wasted if wasted else out


def parse_streaminfo(buf: bytes) -> dict:
    """Parse the fLaC magic + metadata blocks; return STREAMINFO
    fields + the bit offset where frames start."""
    if buf[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    off = 4
    info = None
    while True:
        hdr = buf[off]
        btype, last = hdr & 0x7F, hdr & 0x80
        (blen,) = struct.unpack(">I", b"\x00" + buf[off + 1:off + 4])
        body = buf[off + 4:off + 4 + blen]
        if btype == 0:
            bits = int.from_bytes(body, "big")
            total_bits = blen * 8
            # field ends from the MSB: min_bs 16, max_bs 32, then the
            # two 24-bit frame sizes end at 80, rate 100, ch 103,
            # bps 108, total 144, md5 = trailing 128
            info = {
                "min_blocksize": (bits >> (total_bits - 16)) & 0xFFFF,
                "max_blocksize": (bits >> (total_bits - 32)) & 0xFFFF,
                "sample_rate": (bits >> (total_bits - 100)) & 0xFFFFF,
                "channels": ((bits >> (total_bits - 103)) & 0x7) + 1,
                "bps": ((bits >> (total_bits - 108)) & 0x1F) + 1,
                "total_samples": (bits >> (total_bits - 144))
                & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        off += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO block")
    info["frame_start_bit"] = off * 8
    return info


def decode_flac(buf: bytes, verify_md5: bool = False) \
        -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to (channels, n_samples) int32 + rate.
    CRC-8 (header) and CRC-16 (frame) always verified; the
    STREAMINFO MD5 of the unencoded samples optionally too."""
    info = parse_streaminfo(buf)
    bits = _Bits(buf, info["frame_start_bit"])
    nch, bps_si = info["channels"], info["bps"]
    total = info["total_samples"]
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    rate = info["sample_rate"]
    while bits.pos + 16 <= bits.n and (total == 0 or got < total):
        fstart_byte = bits.pos >> 3
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        if bits.read(1):
            raise ValueError("frame header reserved bit set")
        bits.read(1)                       # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        if bits.read(1):
            raise ValueError("frame header reserved bit set")
        _read_utf8_num(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code == 12:
            rate = bits.read(8) * 1000
        elif sr_code == 13:
            rate = bits.read(16)
        elif sr_code == 14:
            rate = bits.read(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        else:
            rate = _RATE_FIXED[sr_code]
        if bps_code == 0:
            bps = bps_si
        elif bps_code == 3:
            raise ValueError("reserved sample size code")
        else:
            bps = _BPS_FIXED[bps_code]
        hdr_end = bits.pos
        if hdr_end % 8:
            raise ValueError("frame header not byte aligned")
        if crc8(buf[fstart_byte:hdr_end >> 3]) != bits.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("frame/streaminfo channel mismatch")
            sub = [_read_subframe(bits, blocksize, bps)
                   for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation needs 2 ch")
            extra0 = 1 if ch_code == 9 else 0
            extra1 = 1 if ch_code in (8, 10) else 0
            c0 = _read_subframe(bits, blocksize, bps + extra0)
            c1 = _read_subframe(bits, blocksize, bps + extra1)
            if ch_code == 8:               # left/side
                sub = [c0, c0 - c1]
            elif ch_code == 9:             # right/side
                sub = [c1 + c0, c1]
            else:                          # mid/side
                mid = (c0 << 1) | (c1 & 1)
                sub = [(mid + c1) >> 1, (mid - c1) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        bits.align()
        if crc16(buf[fstart_byte:bits.pos >> 3]) != bits.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for ci in range(nch):
            chans[ci].append(sub[ci])
        got += blocksize
    if got == 0:
        raise ValueError("FLAC stream contains no frames")
    if total and got < total:
        # clean truncation at a frame boundary passes every CRC yet
        # delivers fewer samples than STREAMINFO promises — surface
        # it loudly like every other corruption instead of silently
        # computing features over the wrong duration
        raise ValueError(
            f"truncated FLAC stream: decoded {got} of {total} samples")
    out = np.stack([np.concatenate(c) if len(c) > 1 else c[0]
                    for c in chans])
    if total:
        out = out[:, :total]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _samples_md5(out.astype(np.int64), bps_si) != info["md5"]:
            raise ValueError("decoded samples fail STREAMINFO MD5")
    return out.astype(np.int32), rate


# ----------------------------------------------------------- encoder

def _samples_md5(pcm: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded audio: interleaved channels,
    little-endian, bps/8 bytes per sample (spec section 8.2)."""
    nbytes = bps // 8
    inter = pcm.T.reshape(-1).astype(np.int64)
    le = np.zeros((len(inter), nbytes), np.uint8)
    u = inter & ((1 << bps) - 1)
    for i in range(nbytes):
        le[:, i] = (u >> (8 * i)) & 0xFF
    return hashlib.md5(le.tobytes()).digest()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, val: int, nbits: int):
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.cnt += nbits
        while self.cnt >= 8:
            self.cnt -= 8
            self.out.append((self.acc >> self.cnt) & 0xFF)
        self.acc &= (1 << self.cnt) - 1

    def write_unary(self, q: int):
        self.write(1, q + 1)

    def align(self):
        if self.cnt:
            self.write(0, 8 - self.cnt)


def _zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> tuple[int, int]:
    """Exact best Rice parameter in [0, 14] and its bit cost."""
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 15):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
    return best_k, best_c


def _plan_subframe(sig: np.ndarray, bps: int) -> tuple:
    """Pick the smallest encoding among CONSTANT / FIXED 0-4 (Rice,
    partition order 0, escape if residuals outgrow Rice) / VERBATIM.
    Returns (kind, order, k, residual, cost_bits)."""
    n = len(sig)
    if n and (sig == sig[0]).all():
        return ("constant", 0, 0, None, bps)
    best = ("verbatim", 0, 0, None, n * bps)
    for order in range(0, 5):
        if order >= n:
            break
        res = (np.diff(sig, order) if order else sig).astype(np.int64)
        u = _zigzag(res)
        k, rice_bits = _best_rice_k(u)
        rice_cost = order * bps + 2 + 4 + 4 + rice_bits
        # escape alternative: raw signed residuals at the narrowest
        # two's-complement width that holds them (<= 31 per spec)
        m = int(max(res.max(initial=0), -res.min(initial=-1) - 1))
        raw_w = max(m.bit_length() + 1, 1)
        esc_cost = order * bps + 2 + 4 + 4 + 5 + len(res) * raw_w
        if raw_w <= 31 and esc_cost < rice_cost:
            if esc_cost < best[4]:
                best = ("fixed_esc", order, raw_w, res, esc_cost)
        elif rice_cost < best[4]:
            best = ("fixed", order, k, res, rice_cost)
    return best


def _write_subframe(w: _BitWriter, sig: np.ndarray, bps: int):
    kind, order, k, res, _ = _plan_subframe(sig, bps)
    if kind == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(int(sig[0]), bps)
        return
    if kind == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in sig.tolist():
            w.write(v, bps)
        return
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in sig[:order].tolist():
        w.write(v, bps)
    w.write(0, 2)                      # Rice method 0 (4-bit params)
    w.write(0, 4)                      # partition order 0
    residual = res                     # np.diff already dropped order
    if kind == "fixed_esc":
        w.write(15, 4)
        w.write(k, 5)                  # k carries the raw width here
        for v in residual.tolist():
            w.write(v, k)
        return
    w.write(k, 4)
    u = _zigzag(residual.astype(np.int64))
    for q, r in zip((u >> k).tolist(), (u & ((1 << k) - 1)).tolist()):
        w.write_unary(q)
        if k:
            w.write(r, k)


def _write_utf8_num(w: _BitWriter, val: int):
    if val < 0x80:
        w.write(val, 8)
        return
    seq = []
    nbits = val.bit_length()
    n_ext = 1
    while nbits > 6 * n_ext + (6 - n_ext):
        n_ext += 1
    for i in range(n_ext):
        seq.append(0x80 | ((val >> (6 * i)) & 0x3F))
    lead_mask = (0xFF << (7 - n_ext)) & 0xFF
    w.write(lead_mask | (val >> (6 * n_ext)), 8)
    for b in reversed(seq):
        w.write(b, 8)


_STEREO_CODES = {"indep": 1, "left_side": 8, "right_side": 9,
                 "mid_side": 10}


def encode_flac(pcm: np.ndarray, rate: int, bps: int = 16,
                blocksize: int = 4096,
                stereo_mode: str = "indep") -> bytes:
    """Encode (channels, n) integer samples as a FLAC stream.
    1 or 2 channels; ``stereo_mode`` picks the decorrelation the
    decoder must undo (tests exercise all four)."""
    pcm = np.atleast_2d(np.asarray(pcm)).astype(np.int64)
    nch, n = pcm.shape
    if nch not in (1, 2):
        raise ValueError("encoder supports 1 or 2 channels")
    if nch == 1:
        stereo_mode = "indep"
    frames = bytearray()
    for fi, s0 in enumerate(range(0, n, blocksize)):
        blk = pcm[:, s0:s0 + blocksize]
        bs = blk.shape[1]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                  # fixed blocking strategy
        if bs == blocksize and bs in (256, 512, 1024, 2048, 4096,
                                      8192, 16384, 32768):
            w.write(8 + (bs.bit_length() - 9), 4)
            bs_extra = None
        elif bs <= 256:
            w.write(6, 4)
            bs_extra = (bs - 1, 8)
        else:
            w.write(7, 4)
            bs_extra = (bs - 1, 16)
        w.write(0, 4)                  # sample rate: from STREAMINFO
        if nch == 1:
            w.write(0, 4)
        else:
            w.write(_STEREO_CODES[stereo_mode], 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.write(0, 1)
        _write_utf8_num(w, fi)
        if bs_extra:
            w.write(*bs_extra)
        hdr = bytes(w.out)
        w.write(crc8(hdr), 8)
        if nch == 1 or stereo_mode == "indep":
            for ci in range(nch):
                _write_subframe(w, blk[ci], bps)
        else:
            left, right = blk[0], blk[1]
            side = left - right
            if stereo_mode == "left_side":
                _write_subframe(w, left, bps)
                _write_subframe(w, side, bps + 1)
            elif stereo_mode == "right_side":
                _write_subframe(w, side, bps + 1)
                _write_subframe(w, right, bps)
            else:
                mid = (left + right) >> 1
                _write_subframe(w, mid, bps)
                _write_subframe(w, side, bps + 1)
        w.align()
        body = bytes(w.out)
        frames += body + struct.pack(">H", crc16(body))
    # STREAMINFO
    si = 0
    si = (si << 16) | blocksize
    si = (si << 16) | blocksize
    si = (si << 24) | 0
    si = (si << 24) | 0
    si = (si << 20) | rate
    si = (si << 3) | (nch - 1)
    si = (si << 5) | (bps - 1)
    si = (si << 36) | n
    meta = si.to_bytes(18, "big") + _samples_md5(pcm, bps)
    return (FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + meta + frames)
