"""PNG codec (RFC 2083 / ISO 15948), from scratch over stdlib zlib.

The third compressed-image format of the multimodal decode stage,
alongside ``jpeg.py``: PNG's container is chunked (length / type /
data / CRC32), the pixel stream is zlib-deflate over per-scanline
filtered bytes, and losslessness makes round trips byte-exact —
which gives the Spark pipeline a compressed format whose features
can still be verified bit-for-bit against the uncompressed source.

Decoder scope (``decode_png``): greyscale / RGB / RGBA /
greyscale+alpha (color types 0/2/4/6) at 8- and 16-bit depth,
palette (type 3) at depths 1/2/4/8 via PLTE, all five scanline
filters (None/Sub/Up/Average/Paeth), sequential and Adam7-interlaced
streams (each interlace pass is an independently-filtered sub-image,
decoded and scattered into the full grid), multiple IDAT chunks,
CRC validation.  PNG has no remaining library slot.

Encoder scope (``encode_png``): 8-bit RGB, one IDAT, per-scanline
filter choice of None or Sub (enough to exercise both the filtered
and unfiltered decode paths); exists for tests and payload synthesis.

Everything derives from the public PNG spec (chunk layout, filter
math, Paeth predictor); zlib is the Python standard library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (spec §6.6); int16 in, int16 out.
    With p = a+b-c, |p-a| = |b-c|, |p-b| = |a-c|, |p-c| = |a+b-2c| —
    p itself never needs materializing."""
    pa, pb, pc = np.abs(b - c), np.abs(a - c), np.abs(a + b - 2 * c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


# Adam7 pass geometry (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG to (h, w, 3) uint8 RGB (alpha dropped, grey
    replicated, 16-bit reduced to the high byte, palette resolved
    through PLTE).  Supported: bit depths 8 and 16 for grey/RGB/
    RGBA/grey+alpha (color types 0/2/4/6), palette (type 3) at
    depths 1/2/4/8, sequential AND Adam7-interlaced streams."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (clen,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4: pos + 8]
        data = buf[pos + 8: pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + clen)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + clen
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            if color == 3:
                if depth not in (1, 2, 4, 8):
                    raise ValueError(f"bad palette bit depth {depth}")
            elif color not in _CHANNELS or depth not in (8, 16):
                raise ValueError(
                    f"invalid IHDR color/depth {color}/{depth}")
            ihdr = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, interlace = ihdr
    nch = 1 if color == 3 else _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    if interlace:
        # each Adam7 pass is an independently-filtered sub-image;
        # decode each and scatter into the full sample grid
        samples = np.zeros((h, w, nch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = -(-(w - x0) // dx) if w > x0 else 0
            hp = -(-(h - y0) // dy) if h > y0 else 0
            if wp == 0 or hp == 0:
                continue          # empty pass contributes no bytes
            n = hp * ((wp * depth * nch + 7) // 8 + 1)
            samples[y0::dy, x0::dx] = _decode_subimage(
                raw[off: off + n], wp, hp, depth, nch)
            off += n
        if off != len(raw):
            raise ValueError("IDAT length mismatch")
    else:
        samples = _decode_subimage(raw, w, h, depth, nch)
    if color == 3:                           # palette indices → RGB
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        if int(samples.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[samples.reshape(h, w)]
    if nch == 1:
        return np.repeat(samples, 3, axis=2)
    if nch == 2:                             # grey + alpha
        return np.repeat(samples[:, :, :1], 3, axis=2)
    return samples[:, :, :3].copy()          # RGB / RGBA → RGB


def _decode_subimage(raw: bytes, w: int, h: int, depth: int,
                     nch: int) -> np.ndarray:
    """Defilter + unpack one (sub-)image's scanlines to a per-pixel
    sample array (h, w, nch) uint8: sub-byte palette indices unpacked
    from their bit packing, 16-bit samples reduced to the
    network-order high byte."""
    # scanline byte geometry (spec §7.2): filters act on BYTES with
    # the left neighbour one pixel-unit (bpp bytes, min 1) back
    stride = (w * depth * nch + 7) // 8
    unit = max(1, depth // 8) * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    if ftypes.max(initial=0) > 4:
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"unknown filter type {bad}")
    if not np.isin(ftypes, (3, 4)).any():
        out = _defilter_rowwise(raw, stride // unit, unit)
    else:
        out = _defilter_wavefront(raw, stride // unit, unit)
    if depth < 8:                            # sub-byte palette indices
        bits = np.unpackbits(out, axis=1)[:, :w * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        return (bits.reshape(h, w, depth) * weights).sum(
            axis=2, dtype=np.uint8).reshape(h, w, 1)
    if depth == 16:                          # network order: MSB first
        return out.reshape(h, w, nch, 2)[:, :, :, 0]
    return out.reshape(h, w, nch)


def _defilter_rowwise(raw: np.ndarray, w: int, ch: int) -> np.ndarray:
    """Reconstruct scanlines using only None/Sub/Up filters — each row
    is one vectorized expression (Sub is a per-channel prefix sum, Up
    a wrapping uint8 add), so the Python loop is per ROW, not per
    pixel."""
    h = raw.shape[0]
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:]
        if ftype == 0:                       # None
            out[y] = line
        elif ftype == 2:                     # Up: uint8 add wraps mod 256
            out[y] = line + prev
        else:                                # Sub: per-channel cumsum
            out[y] = (line.reshape(w, ch).astype(np.int64)
                      .cumsum(axis=0) % 256).reshape(stride)
        prev = out[y]
    return out


def _defilter_wavefront(raw: np.ndarray, w: int, ch: int) -> np.ndarray:
    """Exact anti-diagonal reconstruction for images containing
    Average/Paeth scanlines.

    Every filter's data dependence is confined to {left (y, x-1),
    up (y-1, x), upper-left (y-1, x-1)}, so all pixels on an
    anti-diagonal d = y + x depend only on diagonals d-1 and d-2:
    the image reconstructs in h + w vectorized steps instead of h·w
    per-pixel Python steps (the x-recurrence of Average/Paeth makes
    per-row vectorization impossible, but the diagonal order is a
    legal topological schedule of the same exact computation).
    Channels ride along as a trailing vector dimension."""
    h = raw.shape[0]
    f = np.ascontiguousarray(
        raw[:, 1:]).reshape(h * w, ch).astype(np.int16)
    ftypes = raw[:, 0].astype(np.int64)
    # rec is padded by one row (the spec's zero row above y=0) and one
    # column (zero left/upper-left of x=0); in FLAT index space over
    # the padded (h+1, w+1) grid, an anti-diagonal's cells sit at an
    # arithmetic sequence of stride w — every gather/scatter below is
    # a basic strided slice, no fancy-index copies
    rec = np.zeros(((h + 1) * (w + 1), ch), np.int16)
    # per-diagonal uniform-filter fast dispatch: a run of rows with
    # one filter type (the overwhelmingly common encoder output)
    # computes only that predictor
    for d in range(h + w - 1):
        lo = max(0, d - w + 1)
        hi = min(h - 1, d)
        n = hi - lo + 1
        # cell (row r, col x=d-r) -> padded flat (r+1)*(w+1)+(x+1)
        o = lo * w + d + 1
        dst = rec[o + w + 1: o + w + 1 + n * w: w]
        a = rec[o + w: o + w + n * w: w]          # left
        b = rec[o: o + n * w: w]                  # up
        if w > 1:   # unpadded flat (r, x=d-r) -> r*(w-1) + d, stride w-1
            fo = lo * (w - 1) + d
            fd = f[fo: fo + n * (w - 1): w - 1]
        else:       # single column: one cell per diagonal
            fd = f[d: d + 1]
        ft = ftypes[lo:hi + 1]
        t0 = ft[0]
        if (ft == t0).all():
            if t0 == 0:
                np.copyto(dst, fd)
                continue
            if t0 == 1:
                pred = a
            elif t0 == 2:
                pred = b
            elif t0 == 3:
                pred = (a + b) >> 1
            else:
                c = rec[o - 1: o - 1 + n * w: w]  # upper-left
                pred = _paeth_pred(a, b, c)
        else:
            c = rec[o - 1: o - 1 + n * w: w]
            ftc = ft[:, None]
            pred = np.select(
                [ftc == 1, ftc == 2, ftc == 3, ftc == 4],
                [a, b, (a + b) >> 1, _paeth_pred(a, b, c)], default=0)
        np.copyto(dst, (fd + pred) & 255)
    return (rec.reshape(h + 1, w + 1, ch)[1:, 1:]
            .reshape(h, w * ch).astype(np.uint8))


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data \
        + struct.pack(">I", zlib.crc32(ctype + data))


def encode_png(pixels: np.ndarray, filter_type: int = 1,
               level: int = 6) -> bytes:
    """Encode (h, w, 3) uint8 RGB as an 8-bit truecolor PNG.
    ``filter_type`` 0 (None) or 1 (Sub) applies to every scanline."""
    if filter_type not in (0, 1):
        raise NotImplementedError("encoder emits filter None or Sub")
    h, w, _ = pixels.shape
    stride = w * 3
    flat = pixels.reshape(h, stride)
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        if filter_type == 0:
            lines += flat[y].tobytes()
        else:                                # Sub: delta vs left pixel
            row = flat[y].astype(np.int32)
            sub = row.copy()
            sub[3:] = (row[3:] - row[:-3]) % 256
            lines += sub.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
            + _chunk(b"IEND", b""))
