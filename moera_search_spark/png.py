"""PNG codec (RFC 2083 / ISO 15948), from scratch over stdlib zlib.

The third compressed-image format of the multimodal decode stage,
alongside ``jpeg.py``: PNG's container is chunked (length / type /
data / CRC32), the pixel stream is zlib-deflate over per-scanline
filtered bytes, and losslessness makes round trips byte-exact —
which gives the Spark pipeline a compressed format whose features
can still be verified bit-for-bit against the uncompressed source.

Decoder scope (``decode_png``): 8-bit greyscale / RGB / RGBA /
greyscale+alpha (color types 0/2/4/6), all five scanline filters
(None/Sub/Up/Average/Paeth), multiple IDAT chunks, CRC validation.
Palette (type 3), 16-bit, interlaced (Adam7) raise
``NotImplementedError`` — the declared library slots.

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


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (spec §6.6)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to (h, w, 3) uint8 RGB (alpha dropped,
    grey replicated).  Raises NotImplementedError on palette/16-bit/
    interlaced streams."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
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
            if depth != 8 or color not in _CHANNELS or interlace:
                raise NotImplementedError(
                    "8-bit non-interlaced grey/RGB/RGBA decodes "
                    "natively; palette/16-bit/Adam7 plug in PIL here")
            ihdr = (w, h, _CHANNELS[color])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, ch = ihdr
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].copy()
        if ftype == 0:                       # None
            pass
        elif ftype == 2:                     # Up
            line = (line.astype(np.int32) + prev) % 256
        elif ftype == 1:                     # Sub: per-channel cumsum
            # rec[x] = Σ deltas mod 256 — a prefix sum per channel
            line = (line.reshape(w, ch).astype(np.int64)
                    .cumsum(axis=0) % 256).reshape(stride)
        elif ftype in (3, 4):                # Average / Paeth
            # sequential in x (each pixel needs the reconstructed
            # left neighbour) but vectorized across channels
            rec = np.zeros(stride, np.int32)
            for x in range(0, stride, ch):
                left = rec[x - ch: x] if x else np.zeros(ch, np.int32)
                up = prev[x: x + ch].astype(np.int32)
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = (prev[x - ch: x].astype(np.int32)
                          if x else np.zeros(ch, np.int32))
                    pred = _paeth(left.astype(np.uint8),
                                  up.astype(np.uint8),
                                  ul.astype(np.uint8)).astype(np.int32)
                rec[x: x + ch] = (line[x: x + ch] + pred) % 256
            line = rec
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = line.astype(np.uint8)
        prev = out[y]
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:                              # grey + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()               # RGB / RGBA → RGB


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
